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
