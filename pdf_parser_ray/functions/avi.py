"""From-scratch MJPEG-in-AVI (RIFF) container codec.

Closes the last honestly-gated media path: compressed VIDEO. The two
public pieces are both fully specified in open documents — the RIFF/AVI
container layout (Microsoft "AVI RIFF File Reference"; fourccs ``avih``
``strh`` ``strf`` ``movi`` ``idx1``) and Motion-JPEG, which is simply
one baseline/progressive JPEG per frame; each frame here round-trips
through the repo's own from-scratch JPEG codec (functions/jpeg.py).

Reference parity: the reference repo (iWhyDuck/pdf-parser) has no video
support at all — this module belongs to the beyond-reference multimodal
suite (media_ref plumbing per SURVEY.md §2.5) and follows the same
pattern as functions/gif.py: a deterministic ``encode_*`` used only to
build test/bench fixtures, and a strict ``decode_*`` used by the actor
pool stages (stages/media.py FrameSample/SceneCuts), which fail-soft
per row around it.

Scale note: nothing here is distributed — decode is invoked per row
inside ``map_batches`` actor pools, so multi-GB corpora stream through
without any pixel data crossing the shuffle boundary.
"""
from __future__ import annotations

import struct

import numpy as np

# avih flags: we always write an idx1 chunk
_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010  # every MJPEG frame is independently decodable


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc + LE size + payload + pad byte to WORD."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: np.ndarray, *, fps: int = 10,
                     quality: int = 85, subsampling: str = "444",
                     progressive_every: int = 0) -> bytes:
    """uint8 RGB frames (n, h, w, 3) → MJPEG AVI bytes (fourcc 'MJPG',
    one ``00dc`` chunk per frame, ``idx1`` index). Deterministic for a
    given input — fixture generation only, mirroring encode_gif.

    ``progressive_every``: if > 0, every k-th frame is encoded as a
    progressive (SOF2) JPEG instead of baseline, so AVI fixtures also
    exercise the progressive decode path end to end.
    """
    from .jpeg import encode_jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi_mjpeg expects (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    if n == 0:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")

    jpegs = [
        encode_jpeg(
            frames[i], quality=quality, subsampling=subsampling,
            progressive=bool(progressive_every and i % progressive_every == 0),
        )
        for i in range(n)
    ]
    max_bytes = max(len(j) for j in jpegs)

    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        max_bytes * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        _AVIF_HASINDEX,          # dwFlags
        n,                       # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,              # flags, priority, language, initialframes
        1, fps,                  # dwScale / dwRate → frame duration = scale/rate s
        0, n,                    # dwStart, dwLength (in frames)
        max_bytes,               # dwSuggestedBufferSize
        0xFFFFFFFF,              # dwQuality (default)
        0,                       # dwSampleSize (0 = variable, one sample/chunk)
        0, 0, w, h,              # rcFrame
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", h * w * 3, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_payload = bytearray()
    idx_entries = []
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_payload) + 4, len(j)))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_payload))

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
        for off, size in idx_entries)

    riff_payload = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in [pos, end)."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at {pos} overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size & 1)  # WORD alignment


def decode_avi(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """MJPEG AVI bytes → (frames uint8 (n, h, w, 3), per-frame delays ms).

    Strict where it matters, tolerant where real muxers vary: requires
    RIFF/'AVI ' magic and at least one video frame; accepts ``00db``
    (uncompressed-named but MJPEG in practice) alongside ``00dc``;
    unwraps ``LIST rec `` groupings inside ``movi``; ignores ``idx1``
    (frames are recovered by a linear chunk walk, which also survives a
    truncated/absent index); skips zero-length padding chunks. Frame
    duration comes from the video ``strh`` dwScale/dwRate when present,
    else from ``avih`` dwMicroSecPerFrame — integer ms, deterministic.

    Grayscale JPEG frames are broadcast to 3 channels so the output
    shape is uniform; mixed frame geometries raise (a corrupt stream,
    not a resize request — the stage layer fails soft per row).
    """
    from .jpeg import decode_jpeg

    data = bytes(payload or b"")
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/'AVI ' magic)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    usec_per_frame = 0
    scale_rate: tuple[int, int] | None = None
    jpeg_blobs: list[bytes] = []

    def scan_movi(pos: int, stop: int) -> None:
        for fcc, body, size in _walk_chunks(data, pos, stop):
            if fcc == b"LIST" and data[body:body + 4] == b"rec ":
                scan_movi(body + 4, body + size)
            elif fcc in (b"00dc", b"00db") and size > 0:
                jpeg_blobs.append(data[body:body + size])

    for fcc, body, size in _walk_chunks(data, 12, end):
        if fcc != b"LIST":
            continue
        ltype = data[body:body + 4]
        if ltype == b"hdrl":
            for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if f2 == b"avih" and s2 >= 4:
                    (usec_per_frame,) = struct.unpack_from("<I", data, b2)
                elif f2 == b"LIST" and data[b2:b2 + 4] == b"strl":
                    for f3, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                        if (f3 == b"strh" and s3 >= 28
                                and data[b3:b3 + 4] == b"vids"):
                            scale, rate = struct.unpack_from(
                                "<II", data, b3 + 20)
                            if rate > 0:
                                scale_rate = (scale, rate)
        elif ltype == b"movi":
            scan_movi(body + 4, body + size)

    if not jpeg_blobs:
        raise ValueError("AVI contains no video frames")

    decoded = []
    for blob in jpeg_blobs:
        px = decode_jpeg(blob)
        if px.ndim == 3 and px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        decoded.append(px)
    shape = decoded[0].shape
    if any(f.shape != shape for f in decoded):
        raise ValueError("inconsistent frame geometry across MJPEG stream")
    frames = np.stack(decoded, axis=0)

    if scale_rate is not None:
        delay_ms = (1000 * scale_rate[0]) // scale_rate[1]
    else:
        delay_ms = usec_per_frame // 1000
    delay_ms = max(int(delay_ms), 1)
    return frames, [delay_ms] * len(decoded)
