"""From-scratch WAV/PCM codec: decode correctness on real encoded bytes,
round-trips across bit depths and channel counts, loud failures on
out-of-scope inputs, and the AudioDecode('wav') + AudioFeatures stages."""

import struct

import numpy as np
import pytest

from pdf_parser_ray.functions.wav import WavError, decode_wav, encode_wav
from pdf_parser_ray.stages.media import AudioDecode, AudioFeatures, synth_wav_table


def _pcm(n, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**15), 2**15, size=(n, ch), dtype=np.int16)


class TestRoundTrip:
    @pytest.mark.parametrize("ch", [1, 2, 4])
    def test_channels(self, ch):
        pcm = _pcm(777, ch, seed=ch)
        arr, rate = decode_wav(encode_wav(pcm, 22_050))
        assert np.array_equal(arr, pcm)
        assert rate == 22_050

    def test_mono_1d_input(self):
        pcm = _pcm(100, 1, seed=9)[:, 0]
        arr, rate = decode_wav(encode_wav(pcm, 8_000))
        assert arr.shape == (100, 1)
        assert np.array_equal(arr[:, 0], pcm)

    def test_known_samples(self):
        """A hand-built 3-sample mono WAV decodes to exactly those samples."""
        pcm = np.array([[-32768], [0], [32767]], dtype=np.int16)
        arr, rate = decode_wav(encode_wav(pcm, 16_000))
        assert arr.tolist() == [[-32768], [0], [32767]]
        assert rate == 16_000


class TestEightBit:
    def test_u8_widened_centered(self):
        """8-bit unsigned PCM decodes widened: (x-128)*256, hand-built RIFF."""
        raw = bytes([0, 128, 255])
        fmt = struct.pack("<HHIIHH", 1, 1, 8_000, 8_000, 1, 8)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw
                + b"\x00")  # word-align pad
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        arr, rate = decode_wav(payload)
        assert arr[:, 0].tolist() == [-32768, 0, 32512]
        assert rate == 8_000


class TestLoudFailures:
    def test_not_riff(self):
        with pytest.raises(WavError, match="RIFF"):
            decode_wav(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)

    def test_truncated_chunk(self):
        good = encode_wav(_pcm(64, 1), 16_000)
        with pytest.raises(WavError):
            decode_wav(good[:40])

    def test_non_pcm_format_tag(self):
        good = bytearray(encode_wav(_pcm(8, 1), 16_000))
        good[20:22] = struct.pack("<H", 3)  # IEEE float tag
        with pytest.raises(WavError, match="non-PCM"):
            decode_wav(bytes(good))

    def test_unsupported_bits(self):
        good = bytearray(encode_wav(_pcm(8, 1), 16_000))
        good[34:36] = struct.pack("<H", 24)
        with pytest.raises(WavError, match="bits_per_sample"):
            decode_wav(bytes(good))

    def test_missing_data_chunk(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8_000, 16_000, 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        with pytest.raises(WavError, match="missing"):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


class TestAudioStages:
    def test_compressed_backend_not_implemented(self):
        with pytest.raises(NotImplementedError):
            AudioDecode(decoder="ffmpeg")

    def test_wav_decode_failsoft(self):
        t = synth_wav_table(16)
        out = AudioDecode(decoder="wav")(t)
        errs = out.column("decode_error").to_pylist()
        # every 8th synth row is garbage → rows 7 and 15 fail, rest decode
        assert [e is not None for e in errs] == [(i % 8 == 7) for i in range(16)]
        samp = out.column("samples").to_pylist()
        assert all((samp[i] is None) == (i % 8 == 7) for i in range(16))

    def test_fake_deterministic(self):
        t = synth_wav_table(4)
        a = AudioDecode(decoder="fake")(t).column("samples").to_pylist()
        b = AudioDecode(decoder="fake")(t).column("samples").to_pylist()
        assert a == b

    def test_features_known_signal(self):
        """Pure full-scale sine: rms≈1/√2, zcr≈2f/rate, peak≈1, no clip
        (scaled to 32000 < 32767)."""
        import pyarrow as pa

        rate, freq, n = 16_000, 440.0, 16_000
        t = np.arange(n) / rate
        pcm = (np.sin(2 * np.pi * freq * t) * 32000).astype(np.int16)
        tbl = pa.table({"media_ref": ["a"], "payload": [encode_wav(pcm, rate)]})
        out = AudioFeatures()(AudioDecode(decoder="wav")(tbl))
        row = {c: out.column(c).to_pylist()[0] for c in out.column_names}
        assert row["duration_s"] == pytest.approx(1.0)
        assert row["rms"] == pytest.approx((32000 / 32768) / np.sqrt(2), rel=1e-3)
        assert row["zcr"] == pytest.approx(2 * freq / rate, rel=0.02)
        assert row["peak"] == pytest.approx(32000 / 32768, rel=1e-3)
        assert row["clip_ratio"] == 0.0

    def test_features_clipping_and_silence(self):
        import pyarrow as pa

        silent = np.zeros(1000, dtype=np.int16)
        clipped = np.full(1000, 32767, dtype=np.int16)
        neg_rail = np.full(1000, -32768, dtype=np.int16)
        square = np.tile(np.array([32767, -32768], dtype=np.int16), 500)
        tbl = pa.table({
            "media_ref": ["s", "c", "n", "q"],
            "payload": [encode_wav(silent, 8_000), encode_wav(clipped, 8_000),
                        encode_wav(neg_rail, 8_000), encode_wav(square, 8_000)],
        })
        out = AudioFeatures()(AudioDecode(decoder="wav")(tbl))
        rms = out.column("rms").to_pylist()
        clip = out.column("clip_ratio").to_pylist()
        assert rms[0] == 0.0 and clip[0] == 0.0
        assert clip[1] == 1.0
        # int16 abs overflow regression: negative-rail clipping must count
        assert clip[2] == 1.0
        assert clip[3] == 1.0

    def test_null_rows_ride_through(self):
        t = synth_wav_table(8)
        out = AudioFeatures()(AudioDecode(decoder="wav")(t))
        rms = out.column("rms").to_pylist()
        assert rms[7] is None and all(v is not None for v in rms[:7])
        assert "samples" not in out.column_names


class TestPipelinePlumbing:
    def test_actor_pool_stage_under_ray(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(synth_wav_table(32))
        ds = ds.map_batches(AudioDecode, fn_constructor_kwargs={"decoder": "wav"},
                            batch_format="pyarrow", batch_size=8, concurrency=2)
        ds = ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8,
                            concurrency=2)
        df = ds.to_pandas()
        assert len(df) == 32
        assert df["rms"].notna().sum() == 28  # 4 garbage rows fail soft
