"""Multimodal stages: opaque binary media columns with typed metadata.

The Ray-side plumbing is REAL (schemas, actor-pool signatures, batch sizing,
output tensor layout). Decode backends:
  - image ``decoder="png"``: REAL baseline-PNG decode via the from-scratch
    stdlib-zlib codec (functions/png.py);
  - image ``decoder="jpeg"``: REAL baseline-JPEG decode via the
    from-scratch huffman+IDCT codec (functions/jpeg.py);
  - audio ``decoder="wav"``: REAL RIFF/PCM WAV decode via the from-scratch
    stdlib-struct codec (functions/wav.py);
  - video ``decoder="gif"``: REAL animated-GIF decode via the from-scratch
    LZW codec (functions/gif.py);
  - video ``decoder="avi"``: REAL compressed video — MJPEG-in-AVI demux
    (functions/avi.py) with each frame decoded by the from-scratch
    baseline+progressive JPEG codec (functions/jpeg.py);
  - ``decoder="fake"``: deterministic sha256-seeded stand-in for tests;
  - ``decoder="pillow"`` / ``"ffmpeg"``-class codecs beyond these: those
    libraries are not installed here — honestly ``NotImplementedError``.
    Swap the kernel, keep the stage.

Batch sizing: media rows are large — callers should pass small
``batch_size`` (8-32) so batch × concurrency fits the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),      # opaque encoded bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decode: sha256-seeded uint8 tensor."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class ImageDecode:
    """Actor-pool stage: encoded image payload → fixed-size uint8 tensor.

    Output column ``pixels``: FixedShapeTensor-compatible flat binary of
    shape (out_h, out_w, 3) per row (resize is part of decode so the full-
    resolution tensor never enters the object store).

    Backends:
      - ``"png"``: REAL decode of baseline PNGs via the from-scratch
        stdlib-zlib codec (functions/png.py) + nearest-neighbor resize +
        RGB normalization. Undecodable payloads yield null pixels plus a
        ``decode_error`` string (per-row fail-soft, B2-style).
      - ``"jpeg"``: REAL decode of baseline AND progressive (SOF2)
        JPEG/JFIF (the dominant web image format) via the from-scratch
        huffman+IDCT codec (functions/jpeg.py) — 4:4:4 / 4:2:2 / 4:2:0,
        grayscale, restart intervals, multi-scan successive
        approximation; same fail-soft contract.
      - ``"fake"``: deterministic sha256-seeded tensor (schema/determinism
        tests, other media types).
      - anything else (``"pillow"``...): NotImplementedError — those
        libraries are not installed here.
    """

    def __init__(self, out_h: int = 64, out_w: int = 64, decoder: str = "fake"):
        if decoder not in ("fake", "png", "jpeg"):
            raise NotImplementedError(
                f"decoder={decoder!r}: real image codecs are not installed in "
                "this environment; use the from-scratch 'png'/'jpeg' backends "
                "or the deterministic 'fake' backend"
            )
        self.out_h, self.out_w = out_h, out_w
        self.decoder = decoder

    def _decode_png(self, payload: bytes) -> np.ndarray:
        from ..functions.png import decode_png

        return self._resize_rgb(decode_png(payload))

    def _decode_jpeg(self, payload: bytes) -> np.ndarray:
        from ..functions.jpeg import decode_jpeg

        return self._resize_rgb(decode_jpeg(payload))

    def _resize_rgb(self, arr: np.ndarray) -> np.ndarray:
        h, w, c = arr.shape
        # nearest-neighbor resize via index maps (no deps)
        ys = (np.arange(self.out_h) * h) // self.out_h
        xs = (np.arange(self.out_w) * w) // self.out_w
        arr = arr[ys][:, xs]
        if c == 1:  # gray → RGB
            arr = np.repeat(arr, 3, axis=2)
        elif c == 2:  # gray+alpha → RGB (alpha dropped)
            arr = np.repeat(arr[:, :, :1], 3, axis=2)
        elif c == 4:  # RGBA → RGB
            arr = arr[:, :, :3]
        return np.ascontiguousarray(arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels, errors = [], []
        real = {"png": self._decode_png, "jpeg": self._decode_jpeg}.get(
            self.decoder)
        for payload in batch.column("payload").to_pylist():
            if real is not None:
                try:
                    pixels.append(real(payload or b"").tobytes())
                    errors.append(None)
                except Exception as e:  # fail-soft per row, like DocParse
                    pixels.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            else:
                pixels.append(
                    _fake_pixels(payload or b"", self.out_h, self.out_w).tobytes())
                errors.append(None)
        batch = batch.append_column("pixels", pa.array(pixels, type=pa.binary()))
        batch = batch.append_column("pixels_shape", pa.array(
            [[self.out_h, self.out_w, 3]] * batch.num_rows, type=pa.list_(pa.int32())))
        if self.decoder in ("png", "jpeg"):
            batch = batch.append_column(
                "decode_error", pa.array(errors, type=pa.string()))
        return batch


class ImageFeatures:
    """Actor-pool stage: pixel tensor → deterministic feature vector.

    Stands in for batched model inference (the model-load slot is
    ``__init__``; the per-batch matmul shape is real).
    """

    def __init__(self, dim: int = 32, seed: int = 42, input_size: int = 32 * 32 * 3):
        # the "model" (projection matrix) is built ONCE per actor here —
        # actor-pool state belongs in __init__, not lazily in __call__.
        # Cached per input size: a mixed-size batch must not regenerate the
        # matrix on every size alternation (O(rows) RNG rebuilds otherwise).
        self.dim = dim
        self.seed = seed
        self._proj_by_size: dict[int, np.ndarray] = {
            input_size: self._make_proj(input_size)}

    def _make_proj(self, size: int) -> np.ndarray:
        return np.random.default_rng(self.seed).standard_normal(
            (size, self.dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob in batch.column("pixels").to_pylist():
            if blob is None:  # upstream decode_error row rides through
                feats.append(None)
                continue
            arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
            proj = self._proj_by_size.get(arr.size)
            if proj is None:  # fail-soft on odd shapes, cached thereafter
                proj = self._proj_by_size[arr.size] = self._make_proj(arr.size)
            feats.append((arr @ proj / arr.size).tolist())
        return batch.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32())))


class AudioDecode:
    """Actor-pool stage: encoded audio payload → PCM samples + rate.

    Backends:
      - ``"wav"``: REAL decode of RIFF/PCM WAV via the from-scratch
        stdlib-struct codec (functions/wav.py). Undecodable payloads yield
        null samples plus a ``decode_error`` string (per-row fail-soft).
      - ``"fake"``: deterministic sha256-seeded int16 mono second.
      - anything else (``"ffmpeg"``-class compressed codecs): honestly
        NotImplementedError — those libraries are not installed here.

    Output columns: ``samples`` (binary int16 interleaved), ``n_samples``,
    ``n_channels``, ``sample_rate`` (+ ``decode_error`` for "wav").
    """

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "wav"):
            raise NotImplementedError(
                f"decoder={decoder!r}: compressed audio codecs are not "
                "installed; use the from-scratch 'wav' backend or 'fake'")
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.wav import decode_wav

        blobs, counts, chans, rates, errors = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            if self.decoder == "wav":
                try:
                    arr, rate = decode_wav(payload or b"")
                    blobs.append(arr.tobytes())
                    counts.append(arr.shape[0])
                    chans.append(arr.shape[1])
                    rates.append(rate)
                    errors.append(None)
                except Exception as e:  # fail-soft per row, like ImageDecode
                    blobs.append(None)
                    counts.append(None)
                    chans.append(None)
                    rates.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            else:
                seed = int.from_bytes(
                    hashlib.sha256(payload or b"").digest()[:8], "little")
                rng = np.random.default_rng(seed)
                arr = rng.integers(-2**15, 2**15, size=(16_000, 1),
                                   dtype=np.int16)
                blobs.append(arr.tobytes())
                counts.append(16_000)
                chans.append(1)
                rates.append(16_000)
                errors.append(None)
        batch = batch.append_column("samples", pa.array(blobs, type=pa.binary()))
        batch = batch.append_column("n_samples", pa.array(counts, type=pa.int64()))
        batch = batch.append_column("n_channels", pa.array(chans, type=pa.int32()))
        batch = batch.append_column("sample_rate", pa.array(rates, type=pa.int32()))
        if self.decoder == "wav":
            batch = batch.append_column(
                "decode_error", pa.array(errors, type=pa.string()))
        return batch


class AudioFeatures:
    """Actor-pool stage: PCM samples → quality/statistics features, the
    audio analogue of the text quality scorer: duration_s, rms (loudness),
    zero-crossing rate (noisiness proxy), peak amplitude, clipping ratio.
    All vectorized numpy over the channel-mean signal; null sample rows
    (upstream decode_error) ride through as null features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zcr, peak, clip = [], [], [], [], []
        for blob, ch, rate in zip(batch.column("samples").to_pylist(),
                                  batch.column("n_channels").to_pylist(),
                                  batch.column("sample_rate").to_pylist()):
            if blob is None or not ch or not rate:
                dur.append(None); rms.append(None); zcr.append(None)
                peak.append(None); clip.append(None)
                continue
            arr = np.frombuffer(blob, dtype="<i2").reshape(-1, ch)
            x = arr.mean(axis=1).astype(np.float64) / 32768.0
            n = len(x)
            dur.append(n / rate)
            rms.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
            zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                       if n > 1 else 0.0)
            peak.append(float(np.abs(x).max()) if n else 0.0)
            # np.abs(int16 -32768) wraps back to -32768 — test both rails
            # directly so negative-rail clipping counts too
            clip.append(float(np.mean((arr >= 32767) | (arr <= -32768)))
                        if n else 0.0)
        for name, vals in (("duration_s", dur), ("rms", rms), ("zcr", zcr),
                           ("peak", peak), ("clip_ratio", clip)):
            batch = batch.append_column(name, pa.array(vals, type=pa.float64()))
        return batch.drop_columns(["samples"])


def _decode_video(payload: bytes, decoder: str):
    """Shared video-decode dispatch → (frames (n,h,w,3) uint8, delays ms).
    Callers (FrameSample/SceneCuts) wrap this in per-row fail-soft."""
    if decoder == "gif":
        from ..functions.gif import decode_gif
        return decode_gif(payload or b"")
    from ..functions.avi import decode_avi
    return decode_avi(payload or b"")


class FrameSample:
    """Actor-pool stage: 'video' payload → every-nth-frame sampling.

    Emits one row per sampled frame (flat_map-shaped: output rows ≥ input
    rows), preserving (media_ref, frame_index) identity.

    Backends:
      - ``"gif"``: REAL decode of animated GIF87a/89a via the from-scratch
        LZW codec (functions/gif.py); frames are composited, then sampled
        at every_ms boundaries against the stream's own frame timestamps.
        Undecodable payloads yield one null row plus ``decode_error``.
      - ``"avi"``: REAL compressed video — MJPEG-in-AVI demux
        (functions/avi.py) + the from-scratch JPEG codec per frame; the
        same tick-sampling and fail-soft semantics as ``"gif"``.
      - ``"fake"``: deterministic sha256 frame stand-ins sized by
        ``duration_ms`` (schema/determinism tests).
      - anything else (``"ffmpeg"``-class inter-frame codecs): honestly
        NotImplementedError — those libraries are not installed here.
    """

    def __init__(self, every_ms: int = 1000, decoder: str = "fake"):
        if decoder not in ("fake", "gif", "avi"):
            raise NotImplementedError(
                f"decoder={decoder!r}: inter-frame video codecs are not "
                "installed; use the from-scratch 'gif'/'avi' backends "
                "or 'fake'")
        self.every_ms = every_ms
        self.decoder = decoder

    def _sample_video(self, payload: bytes):
        """Decode one stream and pick the frame on screen at each tick."""
        frames, delays = _decode_video(payload, self.decoder)
        starts = np.concatenate([[0], np.cumsum(delays)[:-1]])
        total = int(starts[-1]) + int(delays[-1]) if delays else 0
        ticks = np.arange(0, max(total, 1), self.every_ms)
        picked = np.unique(np.searchsorted(starts, ticks, side="right") - 1)
        return [(int(i), int(starts[i]), frames[i]) for i in picked]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, payloads = [], [], []
        ts, hs, ws, errors = [], [], [], []
        for ref, payload, dur in zip(batch.column("media_ref").to_pylist(),
                                     batch.column("payload").to_pylist(),
                                     batch.column("duration_ms").to_pylist()):
            if self.decoder in ("gif", "avi"):
                try:
                    for i, start, frame in self._sample_video(payload):
                        refs.append(ref)
                        idxs.append(i)
                        payloads.append(frame.tobytes())
                        ts.append(start)
                        hs.append(frame.shape[0])
                        ws.append(frame.shape[1])
                        errors.append(None)
                except Exception as e:  # fail-soft per row, like AudioDecode
                    refs.append(ref)
                    idxs.append(None)
                    payloads.append(None)
                    ts.append(None)
                    hs.append(None)
                    ws.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
                continue
            n_frames = max(1, (dur or 0) // self.every_ms)
            for f in range(n_frames):
                refs.append(ref)
                idxs.append(f)
                payloads.append(hashlib.sha256((payload or b"") + f.to_bytes(4, "little")).digest())
        out = {
            "media_ref": pa.array(refs, type=pa.string()),
            "frame_index": pa.array(idxs, type=pa.int32()),
            "frame_payload": pa.array(payloads, type=pa.binary()),
        }
        if self.decoder in ("gif", "avi"):
            out["frame_ts_ms"] = pa.array(ts, type=pa.int32())
            out["frame_h"] = pa.array(hs, type=pa.int32())
            out["frame_w"] = pa.array(ws, type=pa.int32())
            out["decode_error"] = pa.array(errors, type=pa.string())
        return pa.table(out)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media sidecar table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = {
        "media_ref": [f"media://synth/{i}" for i in range(n)],
        "media_type": [("image", "audio", "video")[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                                 dtype=np.uint8).tobytes() for _ in range(n)],
        "width": [int(rng.integers(16, 512)) for _ in range(n)],
        "height": [int(rng.integers(16, 512)) for _ in range(n)],
        "duration_ms": [int(rng.integers(0, 10_000)) for _ in range(n)],
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def synth_wav_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic table of REAL encoded PCM WAVs (via the from-scratch
    codec's encoder): sine tones + noise at varying rates/lengths/channel
    counts, plus every 8th row deliberately undecodable garbage so the
    fail-soft path is exercised."""
    from ..functions.wav import encode_wav

    rng = np.random.default_rng(seed)
    refs, payloads, durs = [], [], []
    for i in range(n):
        rate = (8_000, 16_000, 44_100)[i % 3]
        secs = float(rng.uniform(0.05, 0.5))
        t = np.arange(int(rate * secs)) / rate
        ch = 1 + (i % 2)
        freq = float(rng.uniform(100, 2000))
        amp = float(rng.uniform(0.1, 0.9))
        wave = amp * np.sin(2 * np.pi * freq * t) \
            + 0.05 * rng.standard_normal(len(t))
        pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        pcm = np.stack([pcm] * ch, axis=1)
        payload = (rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
                   if i % 8 == 7 else encode_wav(pcm, rate))
        refs.append(f"wav://synth/{i}")
        payloads.append(payload)
        durs.append(int(secs * 1000))
    return pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "media_type": pa.array(["audio"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([0] * n, type=pa.int32()),
        "height": pa.array([0] * n, type=pa.int32()),
        "duration_ms": pa.array(durs, type=pa.int32()),
    })


def synth_gif_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic table of REAL encoded animated GIFs (via the
    from-scratch codec's encoder): small-palette multi-frame animations at
    varying sizes/frame counts/delays (multiples of 10 ms — GIF delay
    resolution is centiseconds), every 4th one interlaced, plus every 8th
    row deliberately undecodable garbage so the fail-soft path is
    exercised."""
    from ..functions.gif import encode_gif

    rng = np.random.default_rng(seed)
    refs, payloads, durs = [], [], []
    for i in range(n):
        h = int(rng.integers(6, 24))
        w = int(rng.integers(6, 24))
        n_frames = int(rng.integers(2, 7))
        palette = rng.integers(0, 256, size=(int(rng.integers(2, 9)), 3),
                               dtype=np.uint8)
        idx = rng.integers(0, len(palette), size=(n_frames, h, w))
        delays = (rng.integers(2, 30, size=n_frames) * 10).tolist()
        payload = (rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
                   if i % 8 == 7 else
                   encode_gif(palette[idx], delays, interlace=(i % 4 == 3)))
        refs.append(f"gif://synth/{i}")
        payloads.append(payload)
        durs.append(int(sum(delays)))
    return pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "media_type": pa.array(["video"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([0] * n, type=pa.int32()),
        "height": pa.array([0] * n, type=pa.int32()),
        "duration_ms": pa.array(durs, type=pa.int32()),
    })


def synth_avi_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic table of REAL MJPEG AVIs (via the from-scratch
    RIFF muxer + JPEG encoder): smooth gradient 'shots' with a PLANTED
    hard scene cut mid-stream (gradient orientation flips), so scene-cut
    tests have a known boundary; every 3rd file mixes progressive (SOF2)
    frames in, every 8th row is deliberately undecodable garbage so the
    fail-soft path is exercised."""
    from ..functions.avi import encode_avi_mjpeg

    rng = np.random.default_rng(seed)
    refs, payloads, durs, cuts = [], [], [], []
    for i in range(n):
        h = int(rng.integers(3, 8)) * 8
        w = int(rng.integers(3, 8)) * 8
        n_frames = int(rng.integers(4, 9))
        cut_at = n_frames // 2
        fps = int(rng.integers(5, 31))
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.zeros((n_frames, h, w, 3), np.uint8)
        base = int(rng.integers(0, 64))
        for f in range(n_frames):
            # within a shot: a slowly drifting gradient (tiny diffs);
            # at the cut: orientation flips AND channels swap (huge diff)
            g = (xx if f < cut_at else yy)
            span = w if f < cut_at else h
            ch = (0, 1) if f < cut_at else (2, 0)
            drift = (f % cut_at if cut_at else 0) * 2
            frames[f, :, :, ch[0]] = ((g * 255 // max(span - 1, 1))
                                      + drift).clip(0, 255).astype(np.uint8)
            frames[f, :, :, ch[1]] = 255 - frames[f, :, :, ch[0]]
            frames[f, :, :, 3 - ch[0] - ch[1]] = base
        payload = (rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
                   if i % 8 == 7 else
                   encode_avi_mjpeg(frames, fps=fps, quality=90,
                                    progressive_every=3 if i % 3 == 0 else 0))
        refs.append(f"avi://synth/{i}")
        payloads.append(payload)
        durs.append(n_frames * 1000 // fps)
        cuts.append(cut_at)
    t = pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "media_type": pa.array(["video"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([0] * n, type=pa.int32()),
        "height": pa.array([0] * n, type=pa.int32()),
        "duration_ms": pa.array(durs, type=pa.int32()),
    })
    # planted ground truth rides along for tests (dropped by stages,
    # which select their own columns)
    return t.append_column("planted_cut", pa.array(cuts, type=pa.int32()))


def synth_png_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic table of REAL encoded baseline PNGs (via the
    from-scratch codec's encoder) — the real-decode benchmark/test input.
    Sizes, channel counts and filter types vary per row so the decode path
    is exercised across the full supported matrix."""
    from ..functions.png import encode_png

    rng = np.random.default_rng(seed)
    refs, payloads, widths, heights = [], [], [], []
    for i in range(n):
        h = int(rng.integers(8, 48))
        w = int(rng.integers(8, 48))
        c = (1, 2, 3, 4)[i % 4]
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        refs.append(f"png://synth/{i}")
        payloads.append(encode_png(px, filter_type=i % 5))
        widths.append(w)
        heights.append(h)
    return pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "media_type": pa.array(["image"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "duration_ms": pa.array([0] * n, type=pa.int32()),
    })


def synth_jpeg_table(n: int = 32, seed: int = 43) -> pa.Table:
    """Deterministic table of REAL baseline JPEGs (via the from-scratch
    encoder) — subsampling, grayscale/color, quality and restart
    intervals vary per row so the decode path covers the supported
    matrix."""
    from ..functions.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    refs, payloads, widths, heights = [], [], [], []
    for i in range(n):
        h = int(rng.integers(8, 48))
        w = int(rng.integers(8, 48))
        gray = i % 4 == 3
        px = rng.integers(0, 256, size=(h, w) if gray else (h, w, 3),
                          dtype=np.uint8)
        payloads.append(encode_jpeg(
            px, quality=(70, 85, 95)[i % 3],
            subsampling="420" if i % 2 else "444",
            restart_interval=(0, 0, 2, 5)[i % 4]))
        refs.append(f"jpeg://synth/{i}")
        widths.append(w)
        heights.append(h)
    return pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "media_type": pa.array(["image"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "duration_ms": pa.array([0] * n, type=pa.int32()),
    })


class MediaResolve:
    """media_ref → payload resolution (SURVEY.md §2.5): broadcast-small-side
    hash join. The media sidecar table is ``ray.put`` once on the driver;
    each actor reads it in ``__init__`` and does a dict lookup per batch —
    no shuffle. For media tables too large to broadcast, fall back to a
    key-partitioned merge (bucket both sides on hash(media_ref) % B).
    """

    def __init__(self, media_ref_obj, ref_col: str = "media_ref"):
        import ray

        table = ray.get(media_ref_obj)  # once per actor
        self.lookup: dict[str, tuple[bytes, str]] = {
            r: (p, t) for r, p, t in zip(table.column("media_ref").to_pylist(),
                                         table.column("payload").to_pylist(),
                                         table.column("media_type").to_pylist())
        }
        self.ref_col = ref_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, types = [], []
        for ref in batch.column(self.ref_col).to_pylist():
            hit = self.lookup.get(ref or "")
            payloads.append(hit[0] if hit else None)
            types.append(hit[1] if hit else None)
        batch = batch.append_column("payload", pa.array(payloads, type=pa.binary()))
        batch = batch.append_column("media_type", pa.array(types, type=pa.string()))
        return batch


def media_context(ds, *, spans_col: str = "spans", id_col: str = "doc_id",
                  max_chars: int = 200):
    """Caption-candidate mining over INTERLEAVED span sequences: for every
    media span (``media_ref`` non-empty), the tail of the nearest
    preceding text span and the head of the nearest following one — the
    standard alt-text/caption harvesting step of image-text pair
    pipelines (public practice: LAION-style alt-text mining), expressed
    over this engine's north-rule span contract (kind, text, media_ref,
    order).

    Shuffle-free by construction: a document's spans live in ONE nested
    list cell, so the whole operator is an embarrassingly parallel
    ``map_batches`` — context never crosses documents. Emits one row per
    media span: (id_col, media_ref, span_order, kind, before_text,
    after_text), contexts clipped to ``max_chars`` characters (tail of
    the preceding span, head of the following — the caption-proximal
    ends). Spans are processed in list order, which the extraction
    contract guarantees is reading order. The id column keeps the INPUT
    column's Arrow type (int ids stay ints — a str() coercion would make
    the output silently unjoinable back to its corpus)."""

    def fn(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        out_schema = pa.schema([
            (id_col, id_type), ("media_ref", pa.string()),
            ("span_order", pa.int32()), ("kind", pa.string()),
            ("before_text", pa.string()), ("after_text", pa.string())])
        ids, refs, orders, kinds, before, after = [], [], [], [], [], []
        for did, spans in zip(batch.column(id_col).to_pylist(),
                              batch.column(spans_col).to_pylist()):
            spans = spans or []
            prev_text = ""
            # pending media spans waiting for their following text span
            pending: list[int] = []
            for idx, s in enumerate(spans):
                if s.get("media_ref"):
                    ids.append(did)
                    refs.append(s["media_ref"])
                    # offset can be PRESENT but null (nullable int32
                    # struct field) — fall back to position either way
                    off = s.get("offset")
                    orders.append(int(off) if off is not None else idx)
                    kinds.append(s.get("kind") or "")
                    before.append(prev_text[-max_chars:])
                    after.append("")          # patched when text arrives
                    pending.append(len(after) - 1)
                elif (s.get("kind") == "text") and (s.get("text") or ""):
                    t = s["text"]
                    for j in pending:
                        after[j] = t[:max_chars]
                    pending.clear()
                    prev_text = t
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "media_ref": pa.array(refs, type=pa.string()),
                         "span_order": pa.array(orders, type=pa.int32()),
                         "kind": pa.array(kinds, type=pa.string()),
                         "before_text": pa.array(before, type=pa.string()),
                         "after_text": pa.array(after, type=pa.string())},
                        schema=out_schema)

    return ds.map_batches(fn, batch_format="pyarrow")


class ImagePHash:
    """Actor-pool stage: encoded image payload → 64-bit perceptual hash
    (average-hash/aHash — public algorithm: 8×8 grayscale thumbnail,
    bit i = pixel_i > image mean). Decoding reuses :class:`ImageDecode`
    (real from-scratch PNG/JPEG codecs or the deterministic fake), with
    the resize-to-8×8 folded INTO decode so the full-resolution tensor
    never exists; undecodable payloads yield a null hash (fail-soft).
    Integer-exact: grayscale = (r+g+b)//3, mean = sum//64, strict '>' —
    bit-reproducible anywhere. Constant / near-constant thumbnails
    (gray range ≤ 2) also yield a NULL hash: strict '>' maps every flat
    image to hash 0 regardless of color, which would cross-link
    solid-color images of different colors as mutual near-duplicates.
    The payload and pixel columns are DROPPED on output: what leaves
    the stage is one uint64 per image."""

    def __init__(self, decoder: str = "fake"):
        self._decode = ImageDecode(out_h=8, out_w=8, decoder=decoder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._decode(batch)
        hashes = []
        for buf in out.column("pixels").to_pylist():
            if buf is None:
                hashes.append(None)
                continue
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(8, 8, 3)
            gray = arr.astype(np.int64).sum(axis=2) // 3
            if int(gray.max()) - int(gray.min()) <= 2:
                hashes.append(None)   # flat image: no structure to hash
                continue
            bits = (gray > (int(gray.sum()) // 64)).flatten()
            hashes.append(int.from_bytes(np.packbits(bits).tobytes(), "big"))
        keep = [c for c in out.column_names
                if c not in ("payload", "pixels", "pixels_shape")]
        return out.select(keep).append_column(
            "phash", pa.array(hashes, type=pa.uint64()))


def phash_dup_edges(media_ds, *, decoder: str = "fake",
                    ref_col: str = "media_ref", max_hamming: int = 3,
                    concurrency: int = 2, nrows: int | None = None):
    """Image near-duplicate edges by perceptual hash: decode+hash in an
    actor pool (codec state warm per actor), then the SHARED 4×16-bit
    hamming band LSH (stages/dedup.hamming_band_edges — the simhash
    machinery, signatures swapped for aHashes). Returns (media_ref,
    dup_of) pairs with hamming(phash) ≤ max_hamming; undecodable images
    drop out before banding. The exchange carries (band_key, ref, u64)
    rows only — pixels never shuffle."""
    from .dedup import hamming_band_edges

    sketched = media_ds.map_batches(
        ImagePHash, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", concurrency=concurrency)
    edges = hamming_band_edges(sketched, id_col=ref_col, sig_col="phash",
                               max_hamming=max_hamming, nrows=nrows)
    if ref_col != "doc_id":
        edges = edges.map_batches(
            lambda b: b.rename_columns(
                [ref_col if c == "doc_id" else c for c in b.column_names]),
            batch_format="pyarrow")
    return edges


class AudioFingerprint:
    """Actor-pool stage: encoded audio payload → 64-bit energy-contour
    fingerprint (a chromaprint-style reduction — public idea: coarse
    time-bucketed energy shape, hashed to bits). Decode reuses
    :class:`AudioDecode`; per row: channel-mean mono (int64) → 64 equal
    time buckets → bucket energy = Σ|x| → bit i = energy_i > total//64.
    The comparison is scale-covariant, so uniform volume changes leave
    the fingerprint (nearly) unchanged — the property that makes it
    PERCEPTUAL rather than byte identity. Undecodable rows yield a null
    fingerprint; sample/payload columns are dropped (slim output)."""

    def __init__(self, decoder: str = "fake"):
        self._decode = AudioDecode(decoder=decoder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._decode(batch)
        prints = []
        for blob, nch in zip(out.column("samples").to_pylist(),
                             out.column("n_channels").to_pylist()):
            if blob is None:
                prints.append(None)
                continue
            arr = np.frombuffer(blob, dtype=np.int16).astype(np.int64)
            if nch and nch > 1:
                arr = arr.reshape(-1, nch).sum(axis=1) // nch
            n = len(arr)
            if n == 0:
                prints.append(0)
                continue
            mag = np.abs(arr)
            bucket = (np.arange(n, dtype=np.int64) * 64) // n
            energy = np.bincount(bucket, weights=mag, minlength=64)
            energy = energy.astype(np.int64)
            bits = energy > (int(energy.sum()) // 64)
            prints.append(int.from_bytes(np.packbits(bits).tobytes(), "big"))
        keep = [c for c in out.column_names
                if c not in ("payload", "samples")]
        return out.select(keep).append_column(
            "afp", pa.array(prints, type=pa.uint64()))


def audio_dup_edges(media_ds, *, decoder: str = "fake",
                    ref_col: str = "media_ref", max_hamming: int = 3,
                    concurrency: int = 2, nrows: int | None = None):
    """Audio near-duplicate edges by energy-contour fingerprint — the
    audio sibling of :func:`phash_dup_edges`, on the same shared 4×16-bit
    hamming band LSH (stages/dedup.hamming_band_edges). Volume-rescaled
    copies land within the hamming budget (the fingerprint is
    scale-covariant); PCM payloads never shuffle."""
    from .dedup import hamming_band_edges

    sketched = media_ds.map_batches(
        AudioFingerprint, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", concurrency=concurrency)
    edges = hamming_band_edges(sketched, id_col=ref_col, sig_col="afp",
                               max_hamming=max_hamming, nrows=nrows)
    if ref_col != "doc_id":
        edges = edges.map_batches(
            lambda b: b.rename_columns(
                [ref_col if c == "doc_id" else c for c in b.column_names]),
            batch_format="pyarrow")
    return edges


class SceneCuts:
    """Actor-pool stage: animated-'video' payload → shot-boundary rows
    (scene-cut detection — the classic frame-differencing algorithm,
    public since the earliest shot-segmentation literature). Per stream
    (``decoder="gif"``: from-scratch LZW codec; ``decoder="avi"``:
    MJPEG-in-AVI demux + from-scratch JPEG codec): decode all frames,
    score every consecutive pair with the INTEGER per-mille mean
    absolute pixel difference
    ``diff = (Σ|a−b| · 1000) // (h·w·3·255)``, and emit one row per
    boundary whose score exceeds ``threshold_permille``.

    Output (flat_map-shaped): (media_ref, frame_index, frame_ts_ms,
    diff_permille) — frame_index is the FIRST frame of the new scene.
    Undecodable payloads yield one null row + ``decode_error``
    (fail-soft, the FrameSample convention). Integer arithmetic end to
    end — bit-reproducible on any worker (MJPEG decode itself is the
    repo's own integer-deterministic IDCT path)."""

    def __init__(self, threshold_permille: int = 120, decoder: str = "gif"):
        if decoder not in ("gif", "avi"):
            raise NotImplementedError(
                f"decoder={decoder!r}: inter-frame video codecs are not "
                "installed; use the from-scratch 'gif'/'avi' backends")
        self.threshold = threshold_permille
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, ts, diffs, errors = [], [], [], [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            try:
                frames, delays = _decode_video(payload, self.decoder)
            except Exception as e:
                refs.append(ref); idxs.append(None); ts.append(None)
                diffs.append(None)
                errors.append(f"{type(e).__name__}: {e}")
                continue
            starts = np.concatenate([[0], np.cumsum(delays)[:-1]]) \
                if len(delays) else np.zeros(0, dtype=np.int64)
            arr = frames.astype(np.int64)
            denom = arr.shape[1] * arr.shape[2] * arr.shape[3] * 255
            for i in range(1, arr.shape[0]):
                d = int(np.abs(arr[i] - arr[i - 1]).sum()) * 1000 // denom
                if d > self.threshold:
                    refs.append(ref); idxs.append(i)
                    ts.append(int(starts[i])); diffs.append(d)
                    errors.append(None)
        return pa.table({
            "media_ref": pa.array(refs, type=pa.string()),
            "frame_index": pa.array(idxs, type=pa.int32()),
            "frame_ts_ms": pa.array(ts, type=pa.int32()),
            "diff_permille": pa.array(diffs, type=pa.int64()),
            "decode_error": pa.array(errors, type=pa.string()),
        })


def scene_cuts(media_ds, *, threshold_permille: int = 120,
               decoder: str = "gif",
               concurrency: int = 2, batch_size: int = 16):
    """Shot-boundary detection over a video (GIF or MJPEG-AVI) table —
    an actor-pool ``map_batches`` of :class:`SceneCuts`; embarrassingly
    parallel, the payload never shuffles, output is slim boundary rows."""
    return media_ds.map_batches(
        SceneCuts, fn_constructor_kwargs={
            "threshold_permille": threshold_permille, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
