"""repetition_stats + bigram_commonness (stages/textstage.py): hand-computed
reference values, edge cases, and broadcast-vs-distributed path equality."""

import pyarrow as pa
import pytest


def _ds(docs, ids=None):
    import ray.data

    tbl = pa.table({"doc_id": pa.array(ids or [str(i) for i in range(len(docs))],
                                       type=pa.string()),
                    "text": pa.array(docs, type=pa.string())})
    return ray.data.from_arrow(tbl).repartition(3)


@pytest.mark.usefixtures("ray_session")
class TestRepetitionStats:
    def test_hand_computed(self, ray_session):
        from pdf_parser_ray.stages.textstage import repetition_stats

        # "a b a b a": tokens=5 distinct=2 → ttr=400; bigrams = ab,ba,ab,ba
        # → n_bg=4 distinct=2 dup=2 → 500; top count 2 → 500
        out = repetition_stats(_ds(["a b a b a"])).to_pandas().iloc[0]
        assert out["n_tokens"] == 5
        assert out["distinct_token_milli"] == 400
        assert out["dup_bigram_milli"] == 500
        assert out["top_bigram_milli"] == 500
        assert not out["repetition_keep"]

    def test_all_distinct_keeps(self, ray_session):
        from pdf_parser_ray.stages.textstage import repetition_stats

        out = repetition_stats(_ds(["one two three four five"])).to_pandas().iloc[0]
        assert out["distinct_token_milli"] == 1000
        assert out["dup_bigram_milli"] == 0
        assert out["top_bigram_milli"] == 250  # each of 4 bigrams count 1
        # short docs trip the top-bigram threshold (250 > 60) by design:
        # the thresholds target corpus-scale docs where top ~ 1/n_bg
        assert not out["repetition_keep"]

    def test_degenerate_docs(self, ray_session):
        from pdf_parser_ray.stages.textstage import repetition_stats

        out = repetition_stats(_ds(["", "solo", "  \t "])).to_pandas()
        out = out.set_index("doc_id").sort_index()
        assert out["n_tokens"].tolist() == [0, 1, 0]
        # no bigrams anywhere → zeros, keep decided by ttr alone
        assert out["dup_bigram_milli"].tolist() == [0, 0, 0]
        assert out["top_bigram_milli"].tolist() == [0, 0, 0]
        assert out.loc["1", "distinct_token_milli"] == 1000
        assert out.loc["1", "repetition_keep"]  # solo token passes all
        assert not out.loc["0", "repetition_keep"]  # ttr 0 < 400

    def test_case_folding(self, ray_session):
        from pdf_parser_ray.stages.textstage import repetition_stats

        # "A a": lowercased → 1 distinct token of 2 → ttr 500
        out = repetition_stats(_ds(["A a"])).to_pandas().iloc[0]
        assert out["distinct_token_milli"] == 500


@pytest.mark.usefixtures("ray_session")
class TestBigramCommonness:
    DOCS = ["x y x y", "x y z", "p q", "solo", ""]
    # global bigram counts: "x y"=3, "y x"=1, "y z"=1, "p q"=1

    EXPECT = {
        # doc 0: occurrences x y, y x, x y → 3+1+3=7, n_bg=3 → 2333
        "0": (3, 7, 2333),
        # doc 1: x y, y z → 3+1=4, n_bg=2 → 2000
        "1": (2, 4, 2000),
        "2": (1, 1, 1000),
        "3": (0, 0, 0),
        "4": (0, 0, 0),
    }

    def _check(self, out):
        got = {r["doc_id"]: (r["n_bigrams"], r["sum_count"], r["mean_count_milli"])
               for _, r in out.iterrows()}
        assert {k: tuple(int(x) for x in v) for k, v in got.items()} == self.EXPECT

    def test_broadcast_path(self, ray_session):
        from pdf_parser_ray.stages.textstage import bigram_commonness

        self._check(bigram_commonness(_ds(self.DOCS)).to_pandas())

    def test_distributed_path_matches(self, ray_session):
        from pdf_parser_ray.stages.textstage import bigram_commonness

        # broadcast_limit=0 forces the explode → hash_join → group-sum path
        self._check(bigram_commonness(
            _ds(self.DOCS), broadcast_limit=0).to_pandas())


@pytest.mark.usefixtures("ray_session")
class TestRepetitionFilter:
    def test_filter_matches_stats_keep(self, ray_session):
        from pdf_parser_ray.stages.textstage import (repetition_filter,
                                                     repetition_stats)

        docs = ["a b a b a", "one two three four five", "solo",
                "x " * 200 + "y", " ".join(f"w{i}" for i in range(100))]
        stats = repetition_stats(_ds(docs)).to_pandas()
        kept = repetition_filter(_ds(docs)).to_pandas()
        expect = set(stats.loc[stats["repetition_keep"], "doc_id"])
        assert set(kept["doc_id"]) == expect
        assert list(kept.columns) == ["doc_id", "text"]  # columns preserved


@pytest.mark.usefixtures("ray_session")
class TestDropContaminated:
    def test_drops_only_overlapping(self, ray_session):
        from pdf_parser_ray.stages.dedup import drop_contaminated

        shared = " ".join(f"s{i}" for i in range(8))
        train = ["clean doc " + " ".join(f"t{i}" for i in range(10)),
                 "leaky prefix " + shared + " suffix here now",
                 "tiny"]
        test = ["the test set contains " + shared + " verbatim"]
        out = drop_contaminated(_ds(train), _ds(test, ids=["t0"]),
                                width=8).to_pandas()
        assert sorted(out["doc_id"]) == ["0", "2"]  # leaky doc 1 dropped
        assert list(out.columns) == ["doc_id", "text"]


@pytest.mark.usefixtures("ray_session")
class TestChunkDocuments:
    def test_explode_shape_and_text(self, ray_session):
        from pdf_parser_ray.stages.textstage import chunk_documents

        docs = ["a b c d e", "x", ""]  # 5 toks → 2+3 split, 1 tok, none
        out = chunk_documents(_ds(docs), chunk_tokens=2).to_pandas()
        out = out.sort_values(["doc_id", "chunk_idx"], ignore_index=True)
        assert out["doc_id"].tolist() == ["0", "0", "0", "1"]
        assert out["chunk_idx"].tolist() == [0, 1, 2, 0]
        assert out["n_chunk_tokens"].tolist() == [2, 2, 1, 1]
        assert out["chunk_text"].tolist() == ["a b", "c d", "e", "x"]

    def test_whitespace_collapse_contract(self, ray_session):
        from pdf_parser_ray.stages.textstage import chunk_documents

        out = chunk_documents(_ds(["a\t\tb \n c"]), chunk_tokens=10).to_pandas()
        assert out["chunk_text"].tolist() == ["a b c"]  # re-joined, case kept

    def test_bad_chunk_size_raises(self, ray_session):
        from pdf_parser_ray.stages.textstage import chunk_documents

        with pytest.raises(ValueError):
            chunk_documents(_ds(["a"]), chunk_tokens=0)


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingCentroids:
    def test_hand_computed_with_negatives(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.similarity import embedding_centroids

        tbl = pa.table({
            "label": pa.array([0, 0, 1], type=pa.int32()),
            "embedding": pa.array([[1.0, -0.5], [2.0, -0.25], [0.1, 0.2]],
                                  type=pa.list_(pa.float32())),
        })
        out = embedding_centroids(
            ray.data.from_arrow(tbl).repartition(2)).to_pandas()
        out = out.set_index(["label", "dim"]).sort_index()
        # label 0 dim 0: floor(1000)+floor(2000)=3000 → //2 = 1500
        assert out.loc[(0, 0), "centroid_milli"] == 1500
        # label 0 dim 1: floor(-500)+floor(-250) = -750 → floor(-375)
        assert out.loc[(0, 1), "sum_milli"] == -750
        assert out.loc[(0, 1), "centroid_milli"] == -375
        # float32(0.1)*1000 ≈ 100.00000149 → floor 100
        assert out.loc[(1, 0), "centroid_milli"] == 100
        assert (out["n_vecs"] == [2, 2, 1, 1]).all()


@pytest.mark.usefixtures("ray_session")
class TestSourceMix:
    def test_rates_respected(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import source_mix

        tbl = pa.table({
            "doc_id": pa.array([str(i) for i in range(300)]),
            "source": pa.array(["keep_all", "drop_all", "half"] * 100),
            "text": pa.array(["t"] * 300),
            "lang": pa.array(["en"] * 300),
            "n_chars": pa.array([1] * 300, type=pa.int64()),
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        out = source_mix(str(tmp_path),
                         rates={"keep_all": 100, "drop_all": 0, "half": 50}
                         ).to_pandas()
        by_src = out.groupby("source").size()
        assert by_src.get("keep_all", 0) == 100
        assert by_src.get("drop_all", 0) == 0
        assert 20 < by_src.get("half", 0) < 80  # md5 bucket ~50%

    def test_unknown_source_default_drops(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import source_mix

        tbl = pa.table({"doc_id": pa.array(["1", "2"]),
                        "source": pa.array(["mystery", "mystery"])})
        pq.write_table(tbl, tmp_path / "documents.parquet")
        assert source_mix(str(tmp_path), rates={}).count() == 0


# ---------------------------------------------------------------------------
# perplexity_buckets (CCNet head/middle/tail ntile binning)
# ---------------------------------------------------------------------------


def _pb(docs, k=3):
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.textstage import perplexity_buckets

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _, _ in docs],
        "text": [t for _, t, _ in docs],
        "lang": [lg for _, _, lg in docs]}))
    return sorted((r["doc_id"], r["avg_nll_micro"], r["bucket"])
                  for r in perplexity_buckets(ds, k=k).take_all())


def test_perplexity_buckets_order_and_split(ray_session):
    # 'en' docs define the LM; the reference-like doc gets bucket 1, the
    # out-of-distribution doc bucket k. 7 scored docs at k=3 → 3/2/2.
    ref = "the quick brown fox jumps over the lazy dog and runs away"
    docs = [(i, ref, "en") for i in range(5)] + [
        (5, "zzq xvw qqj zzq xvw", "de"),
        (6, "the quick brown fox", "fr")]
    rows = _pb(docs)
    assert len(rows) == 7
    sizes = {}
    for _d, _a, b in rows:
        sizes[b] = sizes.get(b, 0) + 1
    assert sizes == {1: 3, 2: 2, 3: 2}   # DuckDB larger-buckets-first
    by_doc = {d: (a, b) for d, a, b in rows}
    assert by_doc[5][1] == 3             # OOD text lands in the tail
    assert by_doc[6][1] <= 2             # reference-like text stays ahead
    # identical texts tie on score; doc_id breaks the tie deterministically
    ref_docs = sorted(d for d in range(5))
    buckets = [by_doc[d][1] for d in ref_docs]
    assert buckets == sorted(buckets)


def test_perplexity_buckets_fewer_rows_than_k(ray_session):
    docs = [(0, "abcabc", "en"), (1, "abcabc", "en")]
    rows = _pb(docs, k=3)
    assert [b for _d, _a, b in rows] == [1, 2]


@pytest.mark.usefixtures("ray_session")
class TestGopherQuality:
    def test_hand_computed_signals(self, ray_session):
        from pdf_parser_ray.stages.textstage import gopher_quality

        # 20 words, Σlen=56 → mwl 2800; all 8 stopwords present; all alpha
        doc = ("the cat sat on the mat with a hat and that is all of it "
               "to be done have fun")
        out = gopher_quality(_ds([doc])).to_pandas().iloc[0]
        assert out["n_words"] == 20
        assert out["mean_word_len_milli"] == 2800
        assert out["symbol_word_milli"] == 0
        assert out["bullet_line_milli"] == 0
        assert out["ellipsis_line_milli"] == 0
        assert out["alpha_word_milli"] == 1000
        assert out["stop_hits"] == 8
        assert not out["gopher_keep"]  # 20 < 50 words

    def test_keep_true_document(self, ray_session):
        from pdf_parser_ray.stages.textstage import gopher_quality

        # 60 words of mean length exactly 3.000 — every threshold passes
        doc = ("the cat and dog ran " * 12).strip()
        out = gopher_quality(_ds([doc])).to_pandas().iloc[0]
        assert out["n_words"] == 60
        assert out["mean_word_len_milli"] == 3000
        assert out["stop_hits"] == 2  # the, and
        assert out["gopher_keep"]

    def test_lines_symbols_and_alpha(self, ray_session):
        from pdf_parser_ray.stages.textstage import gopher_quality

        # 3 lines: 2 bullets (666), 1 '...'-terminated (333); 7 tokens of
        # which 5 alphabetic (714); one '...' occurrence (142); Σlen 28
        doc = "- bullet one\n- bullet two\nplain..."
        out = gopher_quality(_ds([doc])).to_pandas().iloc[0]
        assert out["n_words"] == 7
        assert out["mean_word_len_milli"] == 4000
        assert out["symbol_word_milli"] == 142
        assert out["bullet_line_milli"] == 666
        assert out["ellipsis_line_milli"] == 333
        assert out["alpha_word_milli"] == 714
        assert out["stop_hits"] == 0
        assert not out["gopher_keep"]

    def test_empty_doc_zeros(self, ray_session):
        from pdf_parser_ray.stages.textstage import gopher_quality

        out = gopher_quality(_ds([""])).to_pandas().iloc[0]
        for c in ("n_words", "mean_word_len_milli", "symbol_word_milli",
                  "bullet_line_milli", "ellipsis_line_milli",
                  "alpha_word_milli", "stop_hits"):
            assert out[c] == 0, c
        assert not out["gopher_keep"]

    def test_filter_matches_stats_keep(self, ray_session):
        from pdf_parser_ray.stages.textstage import (gopher_filter,
                                                     gopher_quality)

        docs = [("the cat and dog ran " * 12).strip(), "short doc", "",
                "- a\n- b\n- c...", ("word " * 60).strip()]
        stats = gopher_quality(_ds(docs)).to_pandas()
        kept = gopher_filter(_ds(docs)).to_pandas()
        expect = set(stats.loc[stats["gopher_keep"], "doc_id"])
        assert set(kept["doc_id"]) == expect
        assert expect  # at least the keep-true doc survives
        assert list(kept.columns) == ["doc_id", "text"]  # columns preserved

    def test_hash_and_ellipsis_counting(self, ray_session):
        from pdf_parser_ray.stages.textstage import gopher_quality

        # '#' ×2 and non-overlapping '...' ×2 (the '....' counts once)
        # over 4 words → 1000*4//4 = 1000
        out = gopher_quality(_ds(["a# b# c.... d..."])).to_pandas().iloc[0]
        assert out["n_words"] == 4
        assert out["symbol_word_milli"] == 1000


@pytest.mark.usefixtures("ray_session")
class TestSourceDivergence:
    def test_hand_computed_l1(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.textstage import source_divergence

        # A: x2 y1 (tot 3), B: x1 z1 (tot 2); global x3 y1 z1 (tot 5)
        # q_milli: x 600, y 200, z 200
        # A: |666-600| + |333-200| + |0-200| = 399
        # B: |500-600| + |0-200| + |500-200| = 600
        tbl = pa.table({
            "source": pa.array(["A", "A", "B"], type=pa.string()),
            "text": pa.array(["x x", "y", "x z"], type=pa.string()),
        })
        out = source_divergence(
            ray.data.from_arrow(tbl).repartition(2)).to_pandas()
        assert out["source"].tolist() == ["A", "B"]
        assert out["n_tokens"].tolist() == [3, 2]
        assert out["l1_milli"].tolist() == [399, 600]

    def test_zero_token_source_dropped(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.textstage import source_divergence

        tbl = pa.table({
            "source": pa.array(["A", "empty"], type=pa.string()),
            "text": pa.array(["x y", "   "], type=pa.string()),
        })
        out = source_divergence(ray.data.from_arrow(tbl)).to_pandas()
        assert out["source"].tolist() == ["A"]
        # identical to the corpus → zero divergence
        assert out["l1_milli"].tolist() == [0]
