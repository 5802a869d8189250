"""Multimodal stub stages: real Ray plumbing, deterministic fake decode."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_parser_ray.stages.media import (
    FrameSample,
    ImageDecode,
    ImageFeatures,
    synth_media_table,
)


class TestImageDecode:
    def test_real_backend_not_implemented(self):
        with pytest.raises(NotImplementedError):
            ImageDecode(decoder="pillow")

    def test_fake_decode_shapes(self):
        t = synth_media_table(8)
        out = ImageDecode(out_h=32, out_w=32)(t)
        assert "pixels" in out.column_names
        blob = out.column("pixels").to_pylist()[0]
        assert len(blob) == 32 * 32 * 3
        assert out.column("pixels_shape").to_pylist()[0] == [32, 32, 3]

    def test_deterministic(self):
        t = synth_media_table(4)
        a = ImageDecode()(t).column("pixels").to_pylist()
        b = ImageDecode()(t).column("pixels").to_pylist()
        assert a == b


class TestFeatures:
    def test_fixed_dim(self):
        t = ImageDecode(out_h=16, out_w=16)(synth_media_table(4))
        out = ImageFeatures(dim=8)(t)
        feats = out.column("features").to_pylist()
        assert all(len(f) == 8 for f in feats)


class TestFrameSample:
    def test_row_expansion(self):
        t = synth_media_table(12)
        video = t.filter(pa.compute.equal(t.column("media_type"), "video"))
        out = FrameSample(every_ms=1000)(video)
        assert out.num_rows >= video.num_rows
        # frame indices contiguous per ref
        import collections
        per_ref = collections.defaultdict(list)
        for ref, idx in zip(out.column("media_ref").to_pylist(),
                            out.column("frame_index").to_pylist()):
            per_ref[ref].append(idx)
        for idxs in per_ref.values():
            assert idxs == list(range(len(idxs)))


class TestPipelinePlumbing:
    def test_actor_pool_stage_under_ray(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(synth_media_table(32))
        out = ds.map_batches(ImageDecode, batch_format="pyarrow", batch_size=8,
                             concurrency=2)
        out = out.map_batches(ImageFeatures, batch_format="pyarrow", batch_size=8,
                              concurrency=2)
        tbl = out.to_pandas()
        assert len(tbl) == 32
        assert all(len(f) == 32 for f in tbl["features"])
