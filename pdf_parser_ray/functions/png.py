"""From-scratch baseline PNG codec (stdlib zlib only — no Pillow).

Decodes non-interlaced 8-bit-per-sample PNGs (color types 0 gray, 2 RGB,
4 gray+alpha, 6 RGBA) per the public PNG specification (RFC 2083 /
ISO 15948): chunk walk → IDAT concat → zlib inflate → per-scanline
unfilter (None/Sub/Up/Average/Paeth) → HxWxC uint8 tensor. Also provides
a minimal encoder (any of the five filter types, applied uniformly) so
tests can round-trip real encoded bytes without external fixtures.

This is the real-codec backend for stages/media.ImageDecode
(``decoder="png"``); the deterministic ``fake`` backend remains for
schema/determinism tests. Scope is honest: no interlace, no palette, no
16-bit, no ancillary-chunk handling beyond skipping — out-of-scope inputs
raise ``PngFormatError`` loudly rather than mis-decoding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples per pixel


class PngFormatError(ValueError):
    """Raised for malformed or out-of-scope (interlaced/palette/16-bit) PNGs."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array. C per _CHANNELS."""
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise PngFormatError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise PngFormatError("truncated chunk body")
        pos += 12 + length  # length + type + body + crc (crc not verified)
        if ctype == b"IHDR":
            try:
                width, height, bit_depth, color_type, _comp, _filt, interlace = \
                    struct.unpack(">IIBBBBB", body)
            except struct.error as e:
                raise PngFormatError(f"malformed IHDR: {e}") from e
            if bit_depth != 8:
                raise PngFormatError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise PngFormatError("interlaced PNGs not supported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngFormatError("missing IHDR")
    if not idat:
        raise PngFormatError("missing IDAT")
    channels = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # keep the documented PngFormatError contract
        raise PngFormatError(f"corrupt IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PngFormatError(
            f"decompressed size {len(raw)} != expected {height * (stride + 1)}")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel (8-bit samples)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            # per residue class the recurrence is a plain cumulative sum
            rec = line.astype(np.uint64).reshape(-1, bpp)
            out[y] = (rec.cumsum(axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = line + prev  # uint8 wraparound is the spec's mod 256
        elif ftype == 3:  # Average
            row = out[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype}")
    return out.reshape(height, width, channels)


def encode_png(pixels: np.ndarray, *, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 array → PNG bytes, one uniform scanline
    filter (0–4). Gray=1ch, gray+alpha=2ch, RGB=3ch, RGBA=4ch."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise PngFormatError(f"unsupported channel count {channels}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise PngFormatError(f"unknown filter type {filter_type}")
    flat = px.reshape(h, w * channels).astype(np.int64)
    bpp = channels
    lines = bytearray()
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros_like(cur)
        left = np.zeros_like(cur)
        left[bpp:] = cur[:-bpp]
        up_left = np.zeros_like(cur)
        up_left[bpp:] = prev[:-bpp]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth
            filt = cur.copy()
            for x in range(len(cur)):
                filt[x] = cur[x] - _paeth(int(left[x]), int(prev[x]),
                                          int(up_left[x]))
        lines.append(filter_type)
        lines.extend((filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(lines), compress_level)
    return (_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
