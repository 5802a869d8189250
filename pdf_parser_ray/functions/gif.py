"""From-scratch animated-GIF codec — stdlib struct only, no Pillow/ffmpeg.

Mirrors functions/png.py (image) and functions/wav.py (audio) for the video
modality: a REAL container format decoded without external dependencies, so
FrameSample in stages/media.py can sample genuinely encoded frames instead
of a stub. Implements the public GIF87a/89a specification (CompuServe 1989,
also W3C's reference): logical screen descriptor, global/local color
tables, graphic-control extensions (frame delay, transparency, disposal),
interlaced and non-interlaced image data, and the full GIF-variant LZW —
variable code width, table growth to 4096, clear/EOI codes, deferred-clear
tolerance.

Scope is honest: disposal method 3 (restore-previous) and sub-8x8 edge
cases the spec leaves ambiguous raise ``GifFormatError`` loudly rather
than mis-decoding. The encoder exists so tests and synth fixtures can
round-trip real encoded bytes; it performs true LZW compression (the
decoder's growth/clear paths are exercised, not just root codes).
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    """Raised for malformed or out-of-scope GIF payloads."""


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable width 3..12 bits)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF LZW codestream → index bytes.

    Implements the spec's decoder: width starts at min_code_size+1, grows
    when the next table slot reaches 2**width, caps at 12 bits; a full
    table (4096) with no clear code is tolerated (deferred clear)."""
    if not 2 <= min_code_size <= 8:
        raise GifFormatError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    table: list[bytes] = []
    width = next_code = 0

    def reset() -> None:
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    reset()
    prev: int | None = None
    acc = nbits = pos = 0
    end = len(data)
    while True:
        while nbits < width:
            if pos >= end:
                return out  # missing EOI: tolerate, like most readers
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                raise GifFormatError(f"first code {code} is not a root")
            out += table[code]
            prev = code
            continue
        if code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
        else:
            raise GifFormatError(f"LZW code {code} out of range {next_code}")
        out += entry
        if next_code < 4096:
            table.append(table[prev] + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Index bytes → GIF LZW codestream (true compression).

    The emitter simulates the decoder's (next_code, width) state so the
    variable code width stays bit-exact in sync; a clear code is emitted
    whenever the table would pass 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = nbits = 0

    # decoder-state simulation: width/next as the DECODER has them right
    # before reading the next emitted code (it adds entries one code late)
    width = min_code_size + 1
    dec_next = eoi + 1
    n_emitted = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def after_data_code() -> None:
        nonlocal n_emitted, dec_next, width
        n_emitted += 1
        if n_emitted >= 2 and dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1

    emit(clear)
    if indices:
        codes: dict[tuple[int, int], int] = {}
        enc_next = eoi + 1
        w = indices[0]
        for c in indices[1:]:
            key = (w, c)
            nxt = codes.get(key)
            if nxt is not None:
                w = nxt
                continue
            emit(w)
            after_data_code()
            if enc_next >= 4095:  # next registration would hit 4096: clear
                emit(clear)
                codes.clear()
                enc_next = eoi + 1
                width = min_code_size + 1
                dec_next = eoi + 1
                n_emitted = 0
            else:
                codes[key] = enc_next
                enc_next += 1
            w = c
        emit(w)
        after_data_code()
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start_row, step)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; return (bytes, new_pos)."""
    chunks = []
    end = len(data)
    while True:
        if pos >= end:
            raise GifFormatError("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        block = data[pos:pos + size]
        if len(block) < size:
            raise GifFormatError("truncated sub-block body")
        chunks.append(block)
        pos += size


def _emit_sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → (frames uint8 (n, H, W, 3), per-frame delay in ms).

    Frames are composited onto the logical screen: transparency and
    disposal methods 0/1 (leave) and 2 (restore-to-background) per the
    89a spec. Disposal 3 (restore-previous) raises ``GifFormatError``."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise GifFormatError("not a GIF87a/89a payload")
    width, height, packed, bg_index, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if width == 0 or height == 0:
        raise GifFormatError("zero logical screen size")
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = payload[pos:pos + 3 * n]
        if len(raw) < 3 * n:
            raise GifFormatError("truncated global color table")
        global_table = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    if global_table is not None:
        background = global_table[min(bg_index, len(global_table) - 1)]
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(background, (height, width, 3)).copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the next image descriptor
    delay_ms, transparent_idx, disposal = 0, None, 0

    end = len(payload)
    while pos < end:
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos + 1 > end:
                raise GifFormatError("truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                body, pos = _sub_blocks(payload, pos)
                if len(body) < 4:
                    raise GifFormatError("short graphic control extension")
                flags, delay_cs, t_idx = struct.unpack_from("<BHB", body, 0)
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise GifFormatError(
                        "disposal method 3 (restore previous) is out of scope")
                delay_ms = delay_cs * 10
                transparent_idx = t_idx if flags & 0x01 else None
            else:  # comment / plain text / application: skip
                _, pos = _sub_blocks(payload, pos)
            continue
        if marker != 0x2C:
            raise GifFormatError(f"unexpected block marker 0x{marker:02x}")

        # image descriptor
        if pos + 9 > end:
            raise GifFormatError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + w > width or top + h > height or w == 0 or h == 0:
            raise GifFormatError("frame rect outside logical screen")
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            raw = payload[pos:pos + 3 * n]
            if len(raw) < 3 * n:
                raise GifFormatError("truncated local color table")
            table = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise GifFormatError("frame has no color table")
        if pos >= end:
            raise GifFormatError("missing LZW min code size")
        min_code_size = payload[pos]
        pos += 1
        codestream, pos = _sub_blocks(payload, pos)
        idx = np.frombuffer(lzw_decode(codestream, min_code_size), dtype=np.uint8)
        if len(idx) < w * h:
            raise GifFormatError(f"frame data short: {len(idx)} < {w * h}")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            deinter = np.empty((h, w), dtype=np.uint8)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                deinter[start:h:step] = idx[src:src + n_rows]
                src += n_rows
            idx = deinter
        if int(idx.max(initial=0)) >= len(table):
            raise GifFormatError("pixel index outside color table")

        rect = canvas[top:top + h, left:left + w]
        rgb = table[idx]
        if transparent_idx is not None:
            mask = idx != transparent_idx
            rect[mask] = rgb[mask]
        else:
            rect[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:
            canvas[top:top + h, left:left + w] = background
        delay_ms, transparent_idx, disposal = 0, None, 0

    if not frames:
        raise GifFormatError("no image frames in GIF")
    return np.stack(frames), delays


def encode_gif(
    frames: np.ndarray,
    delays_ms: list[int] | None = None,
    *,
    interlace: bool = False,
) -> bytes:
    """uint8 frames (n, H, W, 3) → animated GIF89a bytes.

    Builds one global color table from the distinct colors across all
    frames (must be ≤ 256 — synth fixtures are drawn from small palettes;
    no quantizer here by design) and LZW-compresses each full-screen frame."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise GifFormatError(f"frames must be (n, H, W, 3) uint8, got {arr.shape}")
    n, h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise GifFormatError(f"{len(palette)} distinct colors > 256; "
                             "pre-quantize before encoding")
    # pad palette to a power of two ≥ 4 (GIF table sizes are 2^(k+1))
    size_exp = max(2, int(np.ceil(np.log2(len(palette)))))
    table = np.zeros((1 << size_exp, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    indices = inverse.astype(np.uint8).reshape(n, h, w)
    min_code_size = size_exp

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_exp - 1) & 0x07), 0, 0)
    out += table.tobytes()
    delays = list(delays_ms or [100] * n)
    if len(delays) != n:
        raise GifFormatError("delays_ms length != frame count")
    for i in range(n):
        out += b"\x21\xf9"  # graphic control: delay only, no transparency
        out += _emit_sub_blocks(struct.pack("<BHB", 0, max(0, delays[i]) // 10, 0))
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0x00)
        rows = indices[i]
        if interlace:
            parts = [rows[start::step] for start, step in _INTERLACE_PASSES]
            rows = np.concatenate(parts, axis=0)
        out.append(min_code_size)
        out += _emit_sub_blocks(lzw_encode(rows.tobytes(), min_code_size))
    out += b"\x3b"
    return bytes(out)
