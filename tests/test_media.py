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


# ---------------------------------------------------------------------------
# media_context (caption-candidate mining over interleaved spans)
# ---------------------------------------------------------------------------


def _ctx_rows(docs, **kw):
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.media import media_context

    span_t = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                 ("media_ref", pa.string()),
                                 ("offset", pa.int32())]))
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.string()),
                    "spans": pa.array([s for _, s in docs], type=span_t)})
    out = media_context(ray.data.from_arrow(tbl), **kw)
    return sorted((r["doc_id"], r["media_ref"], r["span_order"], r["kind"],
                   r["before_text"], r["after_text"]) for r in out.take_all())


def _s(kind, text="", ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_media_context_adjacency(ray_session):
    docs = [
        ("a", [_s("text", "intro words"), _s("image", "", "m://1", 1),
               _s("text", "caption below"), _s("image", "", "m://2", 3),
               _s("text", "tail")]),
        ("b", [_s("image", "", "m://3", 0)]),          # no context at all
        ("c", [_s("text", "only text")]),              # no media → no rows
    ]
    rows = _ctx_rows(docs)
    assert rows == [
        ("a", "m://1", 1, "image", "intro words", "caption below"),
        ("a", "m://2", 3, "image", "caption below", "tail"),
        ("b", "m://3", 0, "image", "", ""),
    ]


def test_media_context_consecutive_media_share_following_text(ray_session):
    docs = [("d", [_s("image", "", "m://1", 0), _s("image", "", "m://2", 1),
                   _s("text", "shared caption")])]
    rows = _ctx_rows(docs)
    assert [r[5] for r in rows] == ["shared caption", "shared caption"]
    assert [r[4] for r in rows] == ["", ""]


def test_media_context_clipping(ray_session):
    long = "x" * 500 + "END"
    docs = [("e", [_s("text", long), _s("image", "", "m://1", 1),
                   _s("text", "BEGIN" + "y" * 500)])]
    (row,) = _ctx_rows(docs, max_chars=10)
    assert row[4] == ("x" * 500 + "END")[-10:]   # tail of preceding
    assert row[5] == "BEGINyyyyy"                # head of following
    # empty text spans are not context
    docs = [("f", [_s("text", ""), _s("image", "", "m://2", 1)])]
    (row,) = _ctx_rows(docs)
    assert row[4] == "" and row[5] == ""


# ---------------------------------------------------------------------------
# ImagePHash / phash_dup_edges (perceptual image dedup)
# ---------------------------------------------------------------------------


def test_phash_links_reencoded_pixels_not_bytes(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.functions.png import encode_png
    from pdf_parser_ray.stages.media import phash_dup_edges

    rng = np.random.default_rng(7)
    px_a = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    px_b = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        ("a0", encode_png(px_a, filter_type=0)),
        ("a1", encode_png(px_a, filter_type=2)),   # same pixels, new bytes
        ("b0", encode_png(px_b, filter_type=1)),
        ("bad", b"not a png"),                      # fail-soft: null hash
    ]
    assert rows[0][1] != rows[1][1]                 # bytes really differ
    tbl = pa.table({"media_ref": [r for r, _ in rows],
                    "payload": pa.array([p for _, p in rows],
                                        type=pa.binary())})
    edges = phash_dup_edges(ray.data.from_arrow(tbl), decoder="png",
                            nrows=len(rows))
    got = sorted((r["media_ref"], r["dup_of"]) for r in edges.take_all())
    assert got == [("a1", "a0")] or got == [("a0", "a1")]


def test_imagephash_deterministic_and_null_on_error(ray_session):
    import numpy as np
    import pyarrow as pa

    from pdf_parser_ray.functions.png import encode_png
    from pdf_parser_ray.stages.media import ImagePHash

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[0, 0] = 255                                  # one bright pixel
    tbl = pa.table({"media_ref": ["x", "y"],
                    "payload": pa.array([encode_png(px), b"junk"],
                                        type=pa.binary())})
    out = ImagePHash(decoder="png")(tbl)
    h = out.column("phash").to_pylist()
    # only the bright pixel exceeds the mean → exactly bit 63 set
    assert h[0] == 1 << 63
    assert h[1] is None
    assert "payload" not in out.column_names        # slim output


def test_audio_fingerprint_volume_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.functions.wav import encode_wav
    from pdf_parser_ray.stages.media import AudioFingerprint, audio_dup_edges

    rng = np.random.default_rng(11)
    t = np.arange(4000) / 8000
    tone = np.clip(0.8 * np.sin(2 * np.pi * 440 * t) * 32767,
                   -32768, 32767).astype(np.int16).reshape(-1, 1)
    other = np.clip(0.8 * np.sin(2 * np.pi * 1700 * t ** 2) * 32767,
                    -32768, 32767).astype(np.int16).reshape(-1, 1)
    rows = [("a0", encode_wav(tone, 8000)),
            ("a1", encode_wav(tone // 2, 8000)),     # half volume
            ("b0", encode_wav(other, 8000)),
            ("bad", b"junk")]
    tbl = pa.table({"media_ref": [r for r, _ in rows],
                    "payload": pa.array([p for _, p in rows],
                                        type=pa.binary())})
    out = AudioFingerprint(decoder="wav")(tbl)
    h = dict(zip(out.column("media_ref").to_pylist(),
                 out.column("afp").to_pylist()))
    assert h["bad"] is None
    assert bin(h["a0"] ^ h["a1"]).count("1") <= 3    # scale-covariant
    assert "payload" not in out.column_names and \
        "samples" not in out.column_names            # slim output
    edges = audio_dup_edges(ray.data.from_arrow(tbl), decoder="wav",
                            nrows=len(rows))
    got = sorted((r["media_ref"], r["dup_of"]) for r in edges.take_all())
    assert ("a0", "a1") in got or ("a1", "a0") in got
    assert all({a[:1], b[:1]} != {"a", "b"} for a, b in got)


def test_scene_cuts_exact_boundary(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.functions.gif import encode_gif
    from pdf_parser_ray.stages.media import scene_cuts

    a = np.full((3, 8, 8, 3), 10, dtype=np.uint8)
    b = np.full((2, 8, 8, 3), 200, dtype=np.uint8)
    two_scene = encode_gif(np.concatenate([a, b]), [50, 50, 50, 50, 50])
    flat = encode_gif(np.full((4, 8, 8, 3), 99, dtype=np.uint8),
                      [50, 50, 50, 50])
    tbl = pa.table({
        "media_ref": ["cut", "flat", "bad"],
        "payload": pa.array([two_scene, flat, b"nope"], type=pa.binary())})
    df = scene_cuts(ray.data.from_arrow(tbl)).to_pandas()
    cut = df[df["media_ref"] == "cut"]
    assert list(cut["frame_index"]) == [3]          # first frame of scene B
    assert list(cut["frame_ts_ms"]) == [150]
    # |200-10|·1000 // 255 = 745 per mille, every pixel
    assert list(cut["diff_permille"]) == [745]
    assert len(df[df["media_ref"] == "flat"]) == 0  # no cut in a still clip
    bad = df[df["media_ref"] == "bad"]
    assert len(bad) == 1 and bad["decode_error"].notna().all()
