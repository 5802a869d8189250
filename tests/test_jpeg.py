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

    def test_invalid_progressive_script_in_stream(self):
        # a baseline full-band scan relabeled SOF2 is an invalid
        # progressive stream (a DC scan must have Se=0)
        img = np.full((8, 8, 3), 10, dtype=np.uint8)
        data = bytearray(encode_jpeg(img))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError, match="DC scan"):
            decode_jpeg(bytes(data))

    def test_arithmetic_rejected(self):
        img = np.full((8, 8, 3), 10, dtype=np.uint8)
        data = bytearray(encode_jpeg(img))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC9  # SOF9: arithmetic-coded sequential
        with pytest.raises(ValueError, match="SOF9"):
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


def _fixture_images(seed: int = 7):
    """Deterministic image zoo: dense-spectrum noise, smooth gradient
    (long zero runs → ZRL/EOB paths), and a flat field with one patch
    (EOB runs spanning many blocks)."""
    rng = np.random.default_rng(seed)
    noise = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    gradient = (np.add.outer(np.arange(40) * 3, np.arange(64) * 2)[..., None]
                .repeat(3, axis=2) % 256).astype(np.uint8)
    flat_patch = np.full((48, 48, 3), 200, np.uint8)
    flat_patch[20:24, 20:24] = [10, 250, 30]
    return {"noise": noise, "gradient": gradient, "flat_patch": flat_patch}


class TestProgressive:
    """SOF2 multi-scan decode (spectral selection + successive
    approximation). The anchor invariant: baseline and progressive
    encodes share the exact same quantized coefficients, so their
    decodes must be IDENTICAL uint8 arrays — any drift in the scan
    accumulation (DC/AC first/refine, EOB runs, correction bits) breaks
    equality against the independent sequential decode path."""

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("quality", [50, 90])
    def test_matches_baseline_decode_exactly(self, sub, quality):
        for name, img in _fixture_images().items():
            base = decode_jpeg(encode_jpeg(img, quality=quality,
                                           subsampling=sub))
            prog = decode_jpeg(encode_jpeg(img, quality=quality,
                                           subsampling=sub,
                                           progressive=True))
            assert np.array_equal(base, prog), (name, sub, quality)

    def test_grayscale(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=75))
        prog = decode_jpeg(encode_jpeg(img, quality=75, progressive=True))
        assert prog.shape == (33, 41, 1)
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("rst", [1, 3, 7])
    def test_restart_intervals(self, rst):
        img = _fixture_images()["noise"]
        base = decode_jpeg(encode_jpeg(img, quality=80))
        prog = decode_jpeg(encode_jpeg(img, quality=80, progressive=True,
                                       restart_interval=rst))
        assert np.array_equal(base, prog)

    def test_eob_run_spans_blocks(self):
        # flat field: every AC-first block is an immediate EOB, so the
        # encoder accumulates one EOBn run across ALL blocks of the scan
        # — the stream must actually contain an EOBn symbol with r > 0,
        # proving the cross-block run path ran (not just per-block EOB0)
        img = _fixture_images()["flat_patch"]
        data = encode_jpeg(img, quality=50, progressive=True)
        base = decode_jpeg(encode_jpeg(img, quality=50))
        assert np.array_equal(base, decode_jpeg(data))
        # 36 blocks/component at 48x48: a full-scan EOB run needs r >= 5
        assert len(data) < len(encode_jpeg(img, quality=50,
                                           progressive=True,
                                           restart_interval=1))

    def test_spectral_selection_only_script(self):
        # no successive approximation at all: DC scan then per-component
        # band splits at Ah=Al=0
        script = (
            ((0, 1, 2), 0, 0, 0, 0),
            ((0,), 1, 9, 0, 0),
            ((0,), 10, 63, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
        )
        for name, img in _fixture_images().items():
            base = decode_jpeg(encode_jpeg(img, quality=85))
            prog = decode_jpeg(encode_jpeg(img, quality=85,
                                           progressive=True,
                                           scan_script=script))
            assert np.array_equal(base, prog), name

    def test_deep_refinement_script(self):
        # three AC refinement levels for luma (Al 3→0) exercises repeated
        # correction-bit passes over the same coefficients
        script = (
            ((0, 1, 2), 0, 0, 0, 1),
            ((0, 1, 2), 0, 0, 1, 0),
            ((0,), 1, 63, 0, 3),
            ((0,), 1, 63, 3, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 1, 63, 1, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
        )
        img = _fixture_images()["noise"]
        base = decode_jpeg(encode_jpeg(img, quality=90))
        prog = decode_jpeg(encode_jpeg(img, quality=90, progressive=True,
                                       scan_script=script))
        assert np.array_equal(base, prog)

    def test_invalid_scan_scripts(self):
        img = np.full((8, 8, 3), 10, dtype=np.uint8)
        bad = [
            (((0,), 1, 63, 0, 14),),      # Al too deep
            (((0, 1), 1, 63, 0, 0),),     # multi-component AC scan
            (((0,), 0, 5, 0, 0),),        # DC scan with Se != 0
            (((0,), 5, 2, 0, 0),),        # Ss > Se
            (((0,), 1, 63, 2, 0),),       # Ah != Al + 1
            (((3,), 1, 63, 0, 0),),       # unknown component
        ]
        for script in bad:
            with pytest.raises(ValueError):
                encode_jpeg(img, progressive=True, scan_script=script)

    def test_progressive_through_image_decode_stage(self):
        # the media ImageDecode backend (no Ray needed: call the stage
        # object directly) now handles SOF2 payloads
        from pdf_parser_ray.stages.media import ImageDecode

        img = _fixture_images()["gradient"]
        t = pa.table({
            "media_ref": pa.array(["m0"], type=pa.string()),
            "media_type": pa.array(["jpeg"], type=pa.string()),
            "payload": pa.array([encode_jpeg(img, quality=90,
                                             progressive=True)],
                                type=pa.binary()),
        })
        out = ImageDecode(decoder="jpeg")(t)
        assert out.column("decode_error").to_pylist() == [None]
        assert out.column("pixels").to_pylist()[0] is not None

    def test_truncated_progressive(self):
        img = _fixture_images()["noise"]
        data = encode_jpeg(img, quality=80, progressive=True)
        with pytest.raises(ValueError):
            decode_jpeg(data[: int(len(data) * 0.4)])
