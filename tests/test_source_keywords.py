"""Per-source distinctive terms (stages/textstage.py source_keywords):
exact-integer lift, both join tiers, determinism."""

from __future__ import annotations

import pandas as pd


def _run(rows, **kwargs) -> pd.DataFrame:
    import ray.data

    from pdf_parser_ray.stages.textstage import source_keywords

    ds = ray.data.from_items(rows)
    df = source_keywords(ds, **kwargs).to_pandas()
    return df.sort_values(["source", "rnk"]).reset_index(drop=True)


class TestSourceKeywords:
    def test_planted_lift_both_tiers(self, ray_session):
        # source a: 'apple' dominates; source b: 'beta' dominates; 'common'
        # is everywhere (lift ~1e9 → never the top term)
        rows = []
        for i in range(6):
            rows.append({"source": "a", "text": "apple common"})
            rows.append({"source": "b", "text": "beta common"})
        got = _run(rows, k=1, min_count=5)
        assert got[["source", "term"]].values.tolist() == [["a", "apple"],
                                                           ["b", "beta"]]
        # exact integer lift: n_st=6, N=24, S_s=12, C_t=6 → 6*24e9/72 = 2e9
        assert got["lift_e9"].tolist() == [2_000_000_000, 2_000_000_000]
        # forced hash-join tier is value-identical
        got_j = _run(rows, k=1, min_count=5, broadcast_limit=0)
        pd.testing.assert_frame_equal(got, got_j)

    def test_min_count_excludes_rare(self, ray_session):
        rows = [{"source": "a", "text": "rare " + "filler " * 9}] * 1
        rows += [{"source": "a", "text": "filler " * 10}] * 9
        got = _run(rows, k=3, min_count=5)
        assert "rare" not in set(got["term"])

    def test_common_term_lift_is_unit(self, ray_session):
        rows = [{"source": s, "text": "same same same same same"}
                for s in ("a", "b")]
        got = _run(rows, k=1, min_count=5)
        # identical distribution in every source → lift exactly 1e9
        assert set(got["lift_e9"]) == {1_000_000_000}
