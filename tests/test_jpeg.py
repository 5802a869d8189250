"""From-scratch baseline JPEG codec (functions/jpeg.py): exact DC-only
cases, tolerance round-trips across the sampling/quality/restart matrix,
marker/structure errors, and the ImageDecode('jpeg') stage."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_parser_ray.functions.jpeg import (ZIGZAG, _canonical_codes,
                                           decode_jpeg, encode_jpeg)


class TestExact:
    def test_flat_color_is_exact(self):
        # a uniform image quantizes to a DC-only block: the round-trip is
        # exact (DC survives quantization of a flat field at q95)
        img = np.full((16, 24, 3), [200, 64, 32], dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (16, 24, 3)
        assert np.array_equal(out, img)

    def test_flat_gray_exact_all_subsamplings(self):
        img = np.full((24, 16, 3), 128, dtype=np.uint8)
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
            assert np.array_equal(out, img), sub

    def test_zigzag_is_a_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))

    def test_canonical_codes_annex_k_dc_lum(self):
        # T.81 Table K.3: first codes are 00, 010, 011, 100 ... (category
        # 0 gets the single 2-bit code, categories 1-5 are 3-bit)
        from pdf_parser_ray.functions.jpeg import K_DC_LUM

        t = _canonical_codes(*K_DC_LUM)
        assert t[(2, 0b00)] == 0
        assert t[(3, 0b010)] == 1
        assert t[(3, 0b110)] == 5
        assert t[(4, 0b1110)] == 6
        assert t[(9, 0b111111110)] == 11


class TestRoundTrip:
    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("rst", [0, 3])
    def test_gradient(self, sub, rst):
        g = np.linspace(0, 255, 64 * 48 * 3).reshape(64, 48, 3).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=92, subsampling=sub,
                                      restart_interval=rst))
        assert out.shape == g.shape
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 4

    def test_restart_matches_unrestarted(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, quality=88))
        rsts = decode_jpeg(encode_jpeg(img, quality=88, restart_interval=2))
        assert np.array_equal(plain, rsts)  # same coefficients, same pixels

    def test_noise_psnr(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) > 30

    def test_grayscale(self):
        img = (np.arange(40 * 56).reshape(40, 56) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (40, 56, 1)
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2

    @pytest.mark.parametrize("shape", [(8, 8), (33, 29), (9, 17), (48, 8)])
    def test_odd_dimensions(self, shape):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
            assert out.shape == (*shape, 3)

    def test_quality_monotone(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        errs = []
        for q in (30, 60, 95):
            out = decode_jpeg(encode_jpeg(img, quality=q))
            errs.append(np.mean((out.astype(float) - img.astype(float)) ** 2))
        assert errs[0] > errs[1] > errs[2]


class TestErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")
        with pytest.raises(ValueError):
            decode_jpeg(b"")

    def test_truncated_scan(self):
        img = np.full((16, 16, 3), 77, dtype=np.uint8)
        data = encode_jpeg(img, quality=90)
        with pytest.raises(ValueError):
            decode_jpeg(data[: len(data) // 2])

    def test_progressive_rejected(self):
        img = np.full((8, 8, 3), 10, dtype=np.uint8)
        data = bytearray(encode_jpeg(img))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(bytes(data))

    def test_bad_encoder_args(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        with pytest.raises(ValueError):
            encode_jpeg(img, subsampling="422")
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((8, 8, 2), dtype=np.uint8))


class TestImageDecodeStage:
    def test_jpeg_backend_e2e(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.media import ImageDecode, synth_jpeg_table

        t = synth_jpeg_table(n=12)
        out = (ray.data.from_arrow(t)
               .map_batches(ImageDecode,
                            fn_constructor_kwargs={"decoder": "jpeg"},
                            batch_format="pyarrow", batch_size=4,
                            concurrency=2)
               .to_pandas())
        assert len(out) == 12
        assert out["decode_error"].isna().all()
        assert out["pixels"].notna().all()
        assert all(len(p) == 64 * 64 * 3 for p in out["pixels"])

    def test_fail_soft_row(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.media import ImageDecode, synth_jpeg_table

        t = synth_jpeg_table(n=3).set_column(
            2, "payload", pa.array([b"junk", None,
                                    synth_jpeg_table(n=1)["payload"][0].as_py()],
                                   type=pa.binary()))
        out = (ray.data.from_arrow(t)
               .map_batches(ImageDecode,
                            fn_constructor_kwargs={"decoder": "jpeg"},
                            batch_format="pyarrow", batch_size=4,
                            concurrency=1)
               .to_pandas())
        assert out["pixels"].isna().tolist() == [True, True, False]
        assert out["decode_error"].notna().tolist() == [True, True, False]

    def test_fill_bytes_before_marker(self):
        # T.81 B.1.1.2: 0xFF fill bytes may pad before any marker
        img = np.full((16, 16, 3), 99, dtype=np.uint8)
        data = bytearray(encode_jpeg(img, quality=95))
        i = data.find(b"\xff\xdb")
        data[i:i] = b"\xff\xff"
        out = decode_jpeg(bytes(data))
        assert np.array_equal(out, img)
