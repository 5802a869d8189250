"""Bucket-partitioned hash join: equivalence with a pandas merge oracle."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
class TestHashJoin:
    def test_inner_join_equivalence(self):
        import ray.data
        from pdf_parser_ray.pipelines.relational import hash_join

        left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
        right = pd.DataFrame({"k": [2, 2, 3, 4], "rv": [10, 20, 30, 40]})
        got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                        key="k", num_buckets=4).to_pandas()
        want = left.merge(right, on="k", how="inner")
        got_s = got.sort_values(["k", "lv", "rv"], ignore_index=True)[["k", "lv", "rv"]]
        want_s = want.sort_values(["k", "lv", "rv"], ignore_index=True)[["k", "lv", "rv"]]
        pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)

    def test_overlapping_column_suffixed(self):
        import ray.data
        from pdf_parser_ray.pipelines.relational import hash_join

        left = pd.DataFrame({"k": [1, 2], "v": ["l1", "l2"]})
        right = pd.DataFrame({"k": [1, 2], "v": ["r1", "r2"]})
        got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                        key="k", num_buckets=2).to_pandas()
        assert {"k", "v", "v_r"} <= set(got.columns)
        row = got[got["k"] == 1].iloc[0]
        assert row["v"] == "l1" and row["v_r"] == "r1"

    def test_disjoint_keys_empty(self):
        import ray.data
        from pdf_parser_ray.pipelines.relational import hash_join

        left = pd.DataFrame({"k": [1], "lv": ["a"]})
        right = pd.DataFrame({"k": [9], "rv": [1]})
        got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                        key="k", num_buckets=2).to_pandas()
        assert len(got) == 0
