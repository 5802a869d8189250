"""MJPEG-in-AVI container codec + video stages over it.

The container layer (functions/avi.py) is from-scratch RIFF parsing;
frames go through the repo's own from-scratch JPEG codec, so these
tests close the loop on the last honestly-gated media path (compressed
video). The reference repo has no video support — this is part of the
beyond-reference multimodal suite.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from pdf_parser_ray.functions.avi import decode_avi, encode_avi_mjpeg
from pdf_parser_ray.stages.media import (
    FrameSample,
    SceneCuts,
    synth_avi_table,
)


def _gradient_frames(n=5, h=48, w=64):
    """JPEG-friendly smooth frames with a moving block."""
    frames = np.zeros((n, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        frames[i, :, :, 0] = (xx * 255 // (w - 1)).astype(np.uint8)
        frames[i, :, :, 1] = (yy * 255 // (h - 1)).astype(np.uint8)
        frames[i, :, :, 2] = 60
        x0 = 5 + i * 8
        frames[i, 10:30, x0:x0 + 12] = (200, 30, 30)
    return frames


def _psnr(a, b):
    mse = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    return 10 * np.log10(255 ** 2 / mse) if mse else np.inf


class TestCodecRoundTrip:
    def test_baseline_round_trip(self):
        frames = _gradient_frames()
        payload = encode_avi_mjpeg(frames, fps=25, quality=92)
        dec, delays = decode_avi(payload)
        assert dec.shape == frames.shape
        assert delays == [40] * len(frames)  # 1000/25 ms, integer-exact
        assert _psnr(dec, frames) > 30

    def test_progressive_frames_round_trip(self):
        """progressive_every mixes SOF2 frames into the stream."""
        frames = _gradient_frames(n=4)
        payload = encode_avi_mjpeg(frames, fps=10, quality=90,
                                   progressive_every=2)
        dec, delays = decode_avi(payload)
        assert dec.shape == frames.shape
        assert delays == [100] * 4
        assert _psnr(dec, frames) > 30

    def test_420_subsampled_round_trip(self):
        frames = _gradient_frames(n=3, h=32, w=32)
        payload = encode_avi_mjpeg(frames, fps=5, quality=85,
                                   subsampling="420")
        dec, _ = decode_avi(payload)
        # 4:2:0 smears the saturated sharp-edged block — ~25.5 dB here;
        # the bound asserts a real decode, not chroma-full fidelity
        assert _psnr(dec, frames) > 24

    def test_deterministic_encode(self):
        frames = _gradient_frames(n=3)
        assert encode_avi_mjpeg(frames) == encode_avi_mjpeg(frames)


class TestDecodeRobustness:
    def test_not_riff_raises(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_avi(b"garbage bytes that are not an avi")
        with pytest.raises(ValueError):
            decode_avi(b"")
        with pytest.raises(ValueError):
            decode_avi(None)

    def test_no_frames_raises(self):
        # structurally valid RIFF/AVI with an empty movi list
        movi = b"LIST" + struct.pack("<I", 4) + b"movi"
        payload = b"AVI " + movi
        data = b"RIFF" + struct.pack("<I", len(payload)) + payload
        with pytest.raises(ValueError, match="no video frames"):
            decode_avi(data)

    def test_truncated_chunk_raises(self):
        frames = _gradient_frames(n=2)
        payload = encode_avi_mjpeg(frames)
        with pytest.raises(ValueError):
            decode_avi(payload[:len(payload) // 2])

    def test_00db_and_rec_list_accepted(self):
        """Real muxers emit 00db frame ids and LIST 'rec ' groupings —
        rebuild the movi body both ways and expect identical frames."""
        frames = _gradient_frames(n=2)
        orig = encode_avi_mjpeg(frames, fps=10)
        ref, _ = decode_avi(orig)

        movi_at = orig.find(b"LIST", 12)
        while orig[movi_at + 8:movi_at + 12] != b"movi":
            (sz,) = struct.unpack_from("<I", orig, movi_at + 4)
            movi_at += 8 + sz + (sz & 1)
        (movi_sz,) = struct.unpack_from("<I", orig, movi_at + 4)
        head = orig[:movi_at]
        body = orig[movi_at + 12:movi_at + 8 + movi_sz]
        tail = orig[movi_at + 8 + movi_sz:]

        renamed = body.replace(b"00dc", b"00db")
        wrapped = b"rec " + renamed
        rec = b"LIST" + struct.pack("<I", len(wrapped)) + wrapped
        new_movi_payload = b"movi" + rec
        new_movi = b"LIST" + struct.pack(
            "<I", len(new_movi_payload)) + new_movi_payload
        rebuilt = head + new_movi + tail
        rebuilt = (b"RIFF" + struct.pack("<I", len(rebuilt) - 8)
                   + rebuilt[8:])
        dec, _ = decode_avi(rebuilt)
        assert np.array_equal(dec, ref)

    def test_strh_rate_wins_over_avih(self):
        """Frame duration must come from dwScale/dwRate (25 fps → 40 ms),
        which encode_avi_mjpeg keeps consistent with avih."""
        frames = _gradient_frames(n=2)
        _, delays = decode_avi(encode_avi_mjpeg(frames, fps=25))
        assert delays == [40, 40]


class TestVideoStagesOverAvi:
    def test_scene_cuts_find_planted_boundaries(self):
        t = synth_avi_table(16)
        out = SceneCuts(decoder="avi")(t)
        found = {}
        for ref, idx, err in zip(out.column("media_ref").to_pylist(),
                                 out.column("frame_index").to_pylist(),
                                 out.column("decode_error").to_pylist()):
            found.setdefault(ref, []).append((idx, err))
        planted = dict(zip(t.column("media_ref").to_pylist(),
                           t.column("planted_cut").to_pylist()))
        for i, (ref, cut) in enumerate(planted.items()):
            if i % 8 == 7:  # deliberately undecodable row → fail-soft
                assert found[ref] == [(None, found[ref][0][1])]
                assert "ValueError" in found[ref][0][1]
            else:
                # exactly the planted boundary, no intra-shot false hits
                assert found[ref] == [(cut, None)], ref

    def test_frame_sample_avi(self):
        t = synth_avi_table(8)
        out = FrameSample(every_ms=50, decoder="avi")(t)
        assert out.num_rows > 0
        errs = [e for e in out.column("decode_error").to_pylist() if e]
        assert len(errs) == 1  # the single garbage row in n=8
        ok = out.filter(pa.compute.is_null(out.column("decode_error")))
        # sampled payloads are raw RGB frames: len == h*w*3
        for blob, h, w in zip(ok.column("frame_payload").to_pylist(),
                              ok.column("frame_h").to_pylist(),
                              ok.column("frame_w").to_pylist()):
            assert len(blob) == h * w * 3

    def test_unknown_decoder_still_gated(self):
        with pytest.raises(NotImplementedError):
            SceneCuts(decoder="h264")
        with pytest.raises(NotImplementedError):
            FrameSample(decoder="mp4")

    def test_under_ray(self, ray_session):
        """Actor-pool plumbing end to end under Ray."""
        import ray

        t = synth_avi_table(8).drop_columns(["planted_cut"])
        ds = ray.data.from_arrow(t)
        out = ds.map_batches(
            SceneCuts, fn_constructor_kwargs={"decoder": "avi"},
            batch_format="pyarrow", batch_size=4, concurrency=2,
        ).take_all()
        cuts = [r for r in out if r["decode_error"] is None]
        assert len(cuts) == 7  # one planted cut per decodable file
