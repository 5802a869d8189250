"""From-scratch baseline PNG codec: decode correctness on real encoded
bytes, round-trips across every scanline filter and color type, loud
failures on out-of-scope inputs, and the ImageDecode('png') stage."""

import numpy as np
import pytest

from pdf_parser_ray.functions.png import PngFormatError, decode_png, encode_png


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_all_filters(self, filter_type):
        px = _img(13, 17, 3, seed=filter_type)
        out = decode_png(encode_png(px, filter_type=filter_type))
        assert np.array_equal(out, px)

    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_all_color_types(self, channels):
        px = _img(9, 7, channels, seed=channels)
        out = decode_png(encode_png(px, filter_type=4))
        assert np.array_equal(out, px)

    def test_known_pixels(self):
        """A hand-built 2x2 RGB image decodes to exactly those pixels."""
        px = np.array([[[255, 0, 0], [0, 255, 0]],
                       [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == (2, 2, 3)
        assert np.array_equal(out, px)

    def test_gradient_sub_filter_wraps(self):
        """Sub-filter path exercises the mod-256 cumulative recurrence."""
        px = (np.arange(64 * 64 * 3, dtype=np.int64) % 256).astype(
            np.uint8).reshape(64, 64, 3)
        assert np.array_equal(decode_png(encode_png(px, filter_type=1)), px)


class TestFormatErrors:
    def test_not_a_png(self):
        with pytest.raises(PngFormatError, match="signature"):
            decode_png(b"GIF89a....")

    def test_truncated(self):
        data = encode_png(_img(8, 8, 3))
        with pytest.raises((PngFormatError, Exception)):
            decode_png(data[:20])

    def test_interlaced_rejected(self):
        data = bytearray(encode_png(_img(4, 4, 3)))
        # IHDR body starts at offset 16; interlace byte is its 13th byte
        data[16 + 12] = 1
        with pytest.raises(PngFormatError, match="interlaced"):
            decode_png(bytes(data))


@pytest.mark.usefixtures("ray_session")
class TestImageDecodePngStage:
    def test_real_decode_through_stage(self):
        import pyarrow as pa
        import ray.data
        from pdf_parser_ray.stages.media import ImageDecode

        imgs = [_img(16, 16, 3, seed=i) for i in range(4)]
        t = pa.table({
            "media_ref": [f"m{i}" for i in range(4)],
            "payload": [encode_png(im) for im in imgs],
        })
        ds = ray.data.from_arrow(t).map_batches(
            ImageDecode, fn_constructor_kwargs={
                "out_h": 16, "out_w": 16, "decoder": "png"},
            batch_format="pyarrow", batch_size=4, concurrency=1)
        out = ds.to_pandas().sort_values("media_ref", ignore_index=True)
        assert out["decode_error"].isna().all()
        got = np.frombuffer(out["pixels"][0], dtype=np.uint8).reshape(16, 16, 3)
        assert np.array_equal(got, imgs[0])  # same size → resize is identity

    def test_bad_payload_fails_soft(self):
        import pyarrow as pa
        import ray.data
        from pdf_parser_ray.stages.media import ImageDecode, ImageFeatures

        t = pa.table({
            "media_ref": ["good", "bad"],
            "payload": [encode_png(_img(8, 8, 3)), b"not a png"],
        })
        ds = ray.data.from_arrow(t).map_batches(
            ImageDecode, fn_constructor_kwargs={"decoder": "png"},
            batch_format="pyarrow", batch_size=2, concurrency=1)
        ds = ds.map_batches(ImageFeatures, batch_format="pyarrow",
                            batch_size=2, concurrency=1)
        # consume as Arrow: a null-bearing list column trips Ray's pandas
        # TensorArray conversion, and nulls are the point of this test
        tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        rows = {r["media_ref"]: r for r in tbl.to_pylist()}
        bad, good = rows["bad"], rows["good"]
        assert bad["pixels"] is None and bad["decode_error"]
        assert bad["features"] is None
        assert good["decode_error"] is None and len(good["features"]) == 32

    def test_resize_downsamples(self):
        from pdf_parser_ray.stages.media import ImageDecode

        stage = ImageDecode(out_h=4, out_w=4, decoder="png")
        px = _img(32, 32, 3, seed=9)
        small = stage._decode_png(encode_png(px))
        assert small.shape == (4, 4, 3)
        # nearest-neighbor: each output pixel equals a source pixel
        assert np.array_equal(small[0, 0], px[0, 0])


class TestErrorContract:
    def test_short_ihdr_raises_pngformaterror(self):
        import struct, zlib
        sig = b"\x89PNG\r\n\x1a\n"
        body = b"\x00" * 4  # IHDR too short for the 13-byte layout
        chunk = struct.pack(">I", len(body)) + b"IHDR" + body + b"\x00" * 4
        with pytest.raises(PngFormatError, match="IHDR"):
            decode_png(sig + chunk)

    def test_corrupt_idat_raises_pngformaterror(self):
        data = bytearray(encode_png(_img(8, 8, 3)))
        # flip bytes inside the IDAT payload
        i = bytes(data).find(b"IDAT") + 8
        data[i] ^= 0xFF
        data[i + 1] ^= 0xFF
        with pytest.raises(PngFormatError):
            decode_png(bytes(data))
