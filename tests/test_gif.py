"""From-scratch animated-GIF codec: LZW round trips (table growth, clear
codes), container round trips (multi-frame, interlace, 256-color), hand-built
transparency/disposal compositing, loud failures on out-of-scope inputs, and
the FrameSample('gif') stage."""

import struct

import numpy as np
import pytest

from pdf_parser_ray.functions.gif import (
    GifFormatError,
    _emit_sub_blocks,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from pdf_parser_ray.stages.media import FrameSample, synth_gif_table


class TestLzw:
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_roundtrip_random(self, mcs):
        rng = np.random.default_rng(mcs)
        data = rng.integers(0, 1 << mcs, size=5000, dtype=np.uint8).tobytes()
        assert bytes(lzw_decode(lzw_encode(data, mcs), mcs)) == data

    def test_roundtrip_runs(self):
        """Long runs drive the KwKwK (code == next_code) decoder branch."""
        data = (b"\x00" * 500 + b"\x01" * 500) * 4
        assert bytes(lzw_decode(lzw_encode(data, 2), 2)) == data

    def test_table_growth_past_4096(self):
        """Enough 8-bit entropy to fill the 4096 table → clear-code path."""
        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, size=60_000, dtype=np.uint8).tobytes()
        enc = lzw_encode(data, 8)
        assert bytes(lzw_decode(enc, 8)) == data

    def test_empty(self):
        assert bytes(lzw_decode(lzw_encode(b"", 2), 2)) == b""

    def test_compresses(self):
        data = b"\x03" * 10_000
        assert len(lzw_encode(data, 2)) < len(data) // 10

    def test_garbage_code_raises(self):
        # width starts at 3 for mcs=2; feed a code far beyond next_code
        with pytest.raises(GifFormatError):
            lzw_decode(b"\xff\xff\xff\xff", 2)


class TestContainerRoundTrip:
    def _rgb(self, n, h, w, colors, seed=0):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
        return pal[rng.integers(0, colors, size=(n, h, w))]

    def test_multi_frame(self):
        rgb = self._rgb(5, 17, 23, 6)
        frames, delays = decode_gif(encode_gif(rgb, [30, 40, 50, 60, 70]))
        assert np.array_equal(frames, rgb)
        assert delays == [30, 40, 50, 60, 70]

    def test_single_frame_3d_input(self):
        rgb = self._rgb(1, 9, 9, 4)[0]
        frames, _ = decode_gif(encode_gif(rgb))
        assert np.array_equal(frames[0], rgb)

    def test_interlaced(self):
        rgb = self._rgb(2, 19, 11, 5, seed=3)
        frames, _ = decode_gif(encode_gif(rgb, interlace=True))
        assert np.array_equal(frames, rgb)

    def test_256_colors_table_growth(self):
        pal = np.array([[i, 255 - i, (i * 7) % 256] for i in range(256)],
                       dtype=np.uint8)
        rng = np.random.default_rng(1)
        rgb = pal[rng.integers(0, 256, size=(2, 64, 64))]
        frames, _ = decode_gif(encode_gif(rgb))
        assert np.array_equal(frames, rgb)

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(2)
        rgb = rng.integers(0, 256, size=(1, 32, 32, 3), dtype=np.uint8)
        with pytest.raises(GifFormatError, match="256"):
            encode_gif(rgb)


def _hand_built(frames_spec, screen_wh, palette, bg_index=0):
    """Assemble GIF bytes directly so transparency/disposal (which the
    encoder deliberately doesn't emit) are exercised.

    frames_spec: list of (left, top, idx2d, transparent_idx|None, disposal)
    """
    w, h = screen_wh
    size_exp = max(2, int(np.ceil(np.log2(len(palette)))))
    table = np.zeros((1 << size_exp, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp - 1), bg_index, 0)
    out += table.tobytes()
    for left, top, idx, t_idx, disposal in frames_spec:
        flags = (disposal & 7) << 2 | (1 if t_idx is not None else 0)
        out += b"\x21\xf9" + _emit_sub_blocks(
            struct.pack("<BHB", flags, 5, t_idx or 0))
        fh, fw = idx.shape
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        out.append(size_exp)
        out += _emit_sub_blocks(
            lzw_encode(idx.astype(np.uint8).tobytes(), size_exp))
    out += b"\x3b"
    return bytes(out)


PAL = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
               dtype=np.uint8)


class TestCompositing:
    def test_transparency_keeps_prior_pixels(self):
        f1 = np.array([[1, 2]], dtype=np.uint8)          # red, green
        f2 = np.array([[3, 3]], dtype=np.uint8)          # blue, blue
        # frame 2: index 3 transparent → nothing drawn, frame 1 shows through
        gif = _hand_built([(0, 0, f1, None, 0), (0, 0, f2, 3, 0)],
                          (2, 1), PAL)
        frames, delays = decode_gif(gif)
        assert np.array_equal(frames[0], PAL[[1, 2]][None])
        assert np.array_equal(frames[1], frames[0])
        assert delays == [50, 50]

    def test_partial_transparency_mask(self):
        f1 = np.array([[1, 1]], dtype=np.uint8)
        f2 = np.array([[3, 2]], dtype=np.uint8)  # left transparent(3), right green
        gif = _hand_built([(0, 0, f1, None, 0), (0, 0, f2, 3, 0)], (2, 1), PAL)
        frames, _ = decode_gif(gif)
        assert np.array_equal(frames[1][0, 0], PAL[1])  # shows through
        assert np.array_equal(frames[1][0, 1], PAL[2])  # drawn

    def test_disposal_2_restores_background(self):
        full = np.full((2, 2), 1, dtype=np.uint8)        # all red, disposal 2
        dot = np.array([[2]], dtype=np.uint8)            # 1x1 green at (0,0)
        gif = _hand_built([(0, 0, full, None, 2), (0, 0, dot, None, 0)],
                          (2, 2), PAL, bg_index=0)
        frames, _ = decode_gif(gif)
        assert (frames[0] == PAL[1]).all()
        expect = np.zeros((2, 2, 3), dtype=np.uint8)     # bg black
        expect[0, 0] = PAL[2]
        assert np.array_equal(frames[1], expect)

    def test_subrect_placement(self):
        dot = np.array([[2]], dtype=np.uint8)
        gif = _hand_built([(1, 1, dot, None, 0)], (3, 2), PAL, bg_index=1)
        frames, _ = decode_gif(gif)
        assert np.array_equal(frames[0][1, 1], PAL[2])
        assert np.array_equal(frames[0][0, 0], PAL[1])  # bg red elsewhere


class TestLoudFailures:
    def test_not_gif(self):
        with pytest.raises(GifFormatError, match="GIF87a/89a"):
            decode_gif(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)

    def test_disposal_3_out_of_scope(self):
        f = np.array([[1]], dtype=np.uint8)
        gif = _hand_built([(0, 0, f, None, 3)], (1, 1), PAL)
        with pytest.raises(GifFormatError, match="disposal"):
            decode_gif(gif)

    def test_truncated(self):
        rgb = PAL[np.ones((1, 4, 4), dtype=np.uint8)]
        with pytest.raises(GifFormatError):
            decode_gif(encode_gif(rgb)[:20])

    def test_frame_rect_outside_screen(self):
        f = np.array([[1, 1]], dtype=np.uint8)
        gif = _hand_built([(2, 0, f, None, 0)], (3, 1), PAL)  # 2+2 > 3
        with pytest.raises(GifFormatError, match="rect"):
            decode_gif(gif)

    def test_no_frames(self):
        gif = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b"
        with pytest.raises(GifFormatError, match="no image frames"):
            decode_gif(gif)


class TestFrameSampleGif:
    def test_compressed_backend_not_implemented(self):
        with pytest.raises(NotImplementedError):
            FrameSample(decoder="ffmpeg")

    def test_failsoft_rows(self):
        t = synth_gif_table(16)
        out = FrameSample(every_ms=100, decoder="gif")(t)
        errs = {}
        for ref, e in zip(out.column("media_ref").to_pylist(),
                          out.column("decode_error").to_pylist()):
            errs.setdefault(ref, e)
        # every 8th synth row is garbage → exactly refs 7 and 15 error
        bad = {r for r, e in errs.items() if e is not None}
        assert bad == {"gif://synth/7", "gif://synth/15"}

    def test_sampling_picks_frame_on_screen_at_tick(self):
        import pyarrow as pa

        rgb = PAL[np.zeros((3, 4, 4), dtype=np.uint8)]
        payload = encode_gif(rgb, [100, 100, 300])  # starts at 0, 100, 200
        tbl = pa.table({"media_ref": ["v"], "payload": [payload],
                        "duration_ms": [500]})
        out = FrameSample(every_ms=200, decoder="gif")(tbl)
        # ticks 0, 200, 400 → frames 0, 2 (frame 2 spans 200-500)
        assert out.column("frame_index").to_pylist() == [0, 2]
        assert out.column("frame_ts_ms").to_pylist() == [0, 200]

    def test_frame_payload_is_decoded_pixels(self):
        import pyarrow as pa

        rgb = PAL[np.full((1, 2, 2), 2, dtype=np.uint8)]  # all green
        tbl = pa.table({"media_ref": ["v"], "payload": [encode_gif(rgb)],
                        "duration_ms": [100]})
        out = FrameSample(every_ms=50, decoder="gif")(tbl)
        px = np.frombuffer(out.column("frame_payload").to_pylist()[0],
                           dtype=np.uint8).reshape(2, 2, 3)
        assert (px == PAL[2]).all()

    def test_fake_backend_unchanged(self):
        t = synth_gif_table(4)
        out = FrameSample(every_ms=100, decoder="fake")(t)
        assert out.column_names == ["media_ref", "frame_index", "frame_payload"]

    def test_deterministic(self):
        t = synth_gif_table(8)
        a = FrameSample(every_ms=100, decoder="gif")(t)
        b = FrameSample(every_ms=100, decoder="gif")(t)
        assert a.equals(b)


class TestPipelinePlumbing:
    def test_actor_pool_stage_under_ray(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(synth_gif_table(24))
        ds = ds.map_batches(FrameSample,
                            fn_constructor_kwargs={"decoder": "gif",
                                                   "every_ms": 100},
                            batch_format="pyarrow", batch_size=8,
                            concurrency=2)
        df = ds.to_pandas()
        assert df["decode_error"].isna().sum() > 0  # real frames sampled
        assert df["decode_error"].notna().sum() == 3  # garbage rows 7,15,23
        good = df[df["decode_error"].isna()]
        assert (good["frame_h"] * good["frame_w"] * 3
                == good["frame_payload"].str.len()).all()
