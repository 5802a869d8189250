"""From-scratch WAV (RIFF/PCM) codec — stdlib struct only, no audio libs.

Mirrors functions/png.py's role for the audio modality: a REAL container
format decoded without external dependencies, so the audio stages in
stages/media.py run on genuinely encoded bytes instead of a stub.
Supports the dominant training-data case: PCM integer (16-bit) and
8-bit unsigned, mono or interleaved multi-channel. Compressed codecs
(MP3/AAC/…) stay honestly out of scope — the container parser rejects
them loudly (format tag != 1).

Format reference: the public RIFF/WAVE layout (Microsoft/IBM 1991):
  'RIFF' <u32 size> 'WAVE' then chunks; 'fmt ' carries
  (u16 audio_format, u16 channels, u32 sample_rate, u32 byte_rate,
   u16 block_align, u16 bits_per_sample); 'data' carries the samples.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 samples of shape (n,) or (n, channels) → PCM WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise WavError(f"samples must be (n,) or (n, ch), got {arr.shape}")
    n, ch = arr.shape
    bits = 16
    block_align = ch * bits // 8
    data = arr.tobytes()  # row-major == interleaved channels
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (int16 samples of shape (n, channels), sample_rate).

    8-bit unsigned PCM is widened to int16 (centered, ×256); 16-bit PCM is
    returned as-is. Anything else (float, compressed, 24-bit) raises
    ``WavError`` — the per-row fail-soft in AudioDecode records it.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1:
        raise WavError(f"non-PCM format tag {audio_format} (compressed?)")
    if ch < 1:
        raise WavError("zero channels")
    if bits == 16:
        arr = np.frombuffer(data[: (len(data) // (2 * ch)) * 2 * ch],
                            dtype="<i2").reshape(-1, ch)
    elif bits == 8:
        raw = np.frombuffer(data[: (len(data) // ch) * ch], dtype=np.uint8)
        arr = ((raw.astype(np.int16) - 128) * 256).reshape(-1, ch)
    else:
        raise WavError(f"unsupported bits_per_sample {bits}")
    return np.ascontiguousarray(arr), int(sample_rate)
