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


@pytest.mark.usefixtures("ray_session")
class TestSemiAntiJoin:
    def _frames(self):
        left = pd.DataFrame({"k": [1, 2, 2, 3, 5, 7], "lv": list("abcdef")})
        right = pd.DataFrame({"rk": [2, 2, 3, 4, 9], "rv": [10, 20, 30, 40, 50]})
        return left, right

    def test_anti_join(self):
        import ray.data
        from pdf_parser_ray.pipelines.relational import semi_anti_join

        left, right = self._frames()
        got = semi_anti_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                             left_key="k", right_key="rk", anti=True).to_pandas()
        want = left[~left["k"].isin(right["rk"])]
        assert sorted(got["lv"]) == sorted(want["lv"])
        assert got["k"].dtype.kind == "i"  # int dtype survives the union nulls

    def test_semi_join(self):
        import ray.data
        from pdf_parser_ray.pipelines.relational import semi_anti_join

        left, right = self._frames()
        got = semi_anti_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                             left_key="k", right_key="rk", anti=False).to_pandas()
        want = left[left["k"].isin(right["rk"])]
        assert sorted(got["lv"]) == sorted(want["lv"])

    def test_string_keys(self):
        import ray.data
        from pdf_parser_ray.pipelines.relational import semi_anti_join

        left = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
        right = pd.DataFrame({"k": ["b"]})
        got = semi_anti_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                             left_key="k", anti=True).to_pandas()
        assert sorted(got["k"]) == ["a", "c"]


@pytest.mark.usefixtures("ray_session")
class TestBloomAntiJoinPipeline:
    def test_bloom_prefilter_exact_on_synthetic(self, tmp_path):
        """customers_without_orders over a fixture where some customers
        genuinely lack orders (sf0.01 testdata has none) — bloom FPs must
        not leak wrong rows in either direction."""
        import numpy as np
        import pyarrow.parquet as pq
        import pyarrow as pa
        from pdf_parser_ray.pipelines.relational import customers_without_orders

        rng = np.random.default_rng(3)
        cust = pa.table({"c_custkey": pa.array(range(200), type=pa.int64()),
                         "c_name": [f"cust-{i}" for i in range(200)]})
        with_orders = sorted(rng.choice(200, size=120, replace=False).tolist())
        orders = pa.table({
            "o_custkey": pa.array(with_orders * 3, type=pa.int64()),
            "o_orderkey": pa.array(range(len(with_orders) * 3), type=pa.int64()),
        })
        pq.write_table(cust, str(tmp_path / "customer.parquet"))
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = customers_without_orders(str(tmp_path)).to_pandas()
        want = sorted(set(range(200)) - set(with_orders))
        assert sorted(got["c_custkey"].tolist()) == want


class TestDistributedBloom:
    def test_matches_driver_build(self, ray_session):
        import ray.data
        from pdf_parser_ray.functions.bloom import (BloomFilter,
                                                    build_bloom_distributed)

        keys = [f"key-{i}" for i in range(5000)]
        ds = ray.data.from_items([{"k": k} for k in keys]).repartition(8)
        bf = build_bloom_distributed(ds, "k", capacity=5000)
        ref = BloomFilter(5000)
        ref.add_many(keys)
        assert (bf.bits == ref.bits).all()
        assert all(bf.might_contain(k) for k in keys)


@pytest.mark.usefixtures("ray_session")
class TestLeftJoin:
    def test_left_join_equivalence(self):
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
        right = pd.DataFrame({"k": [2, 2, 3, 4], "rv": [10, 20, 30, 40]})
        got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                        key="k", how="left", num_buckets=4).to_pandas()
        want = left.merge(right, on="k", how="left")
        cols = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols, ignore_index=True),
            want[cols].sort_values(cols, ignore_index=True), check_dtype=False)
        # unmatched left rows survive with null right values
        assert got.loc[got["k"].isin([1, 5]), "rv"].isna().all()

    def test_left_join_consistent_right_dtype_across_buckets(self):
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        # bucket of k=1 has no right rows (NaN), bucket of k=2 matches —
        # the column must come back one dtype, not int64/float64 mixed
        left = pd.DataFrame({"k": [1, 2], "lv": ["a", "b"]})
        right = pd.DataFrame({"k": [2], "rv": [7]})
        got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                        key="k", how="left", num_buckets=8).to_pandas()
        assert len(got) == 2
        assert got["rv"].dtype.kind == "f"

    def test_left_join_schemaless_right_raises_without_types(self):
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        left = ray.data.from_pandas(pd.DataFrame({"k": [1], "lv": ["a"]}))
        empty = ray.data.from_pandas(pd.DataFrame({"k": [], "rv": []})).filter(
            lambda r: False)
        with pytest.raises(ValueError, match="right_types"):
            hash_join(left, empty.materialize(), key="k", how="left")

    def test_how_validation(self):
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        ds = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
        with pytest.raises(ValueError, match="how"):
            hash_join(ds, ds, key="k", how="right")


@pytest.mark.usefixtures("ray_session")
class TestLeftJoinSchemaConsistency:
    def test_string_right_column_unmatched_buckets(self):
        """Buckets with zero matches must still emit a STRING-typed right
        column (all-None object would infer Arrow null type → mixed block
        schemas)."""
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        left = pd.DataFrame({"k": list(range(16)),
                             "lv": [f"l{i}" for i in range(16)]})
        right = pd.DataFrame({"k": [3], "rname": ["hit"]})
        out = hash_join(ray.data.from_pandas(left).repartition(4),
                        ray.data.from_pandas(right),
                        key="k", how="left", num_buckets=8)
        # schema must unify across buckets; write+read exercises it hardest
        df = out.to_pandas()
        assert len(df) == 16
        assert df.loc[df["k"] == 3, "rname"].iloc[0] == "hit"
        assert df.loc[df["k"] != 3, "rname"].isna().all()

    def test_left_int_key_with_null_left_values(self):
        """A LEFT int column containing real nulls must come out one dtype
        across buckets (nullable Int64 → Arrow int64-with-nulls)."""
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        left = pd.DataFrame({"k": [1, 2, 3, 4],
                             "lval": pd.array([10, None, 30, None],
                                              dtype="Int64")})
        right = pd.DataFrame({"k": [1, 3], "rv": [7.0, 9.0]})
        df = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                       key="k", how="left", num_buckets=8).to_pandas()
        assert len(df) == 4
        assert df["lval"].dtype.kind == "f"  # nulls present → float64
        assert df.loc[df["k"] == 3, "lval"].iloc[0] == 30


@pytest.mark.usefixtures("ray_session")
class TestOuterJoin:
    def test_outer_join_equivalence(self):
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        left = pd.DataFrame({"k": [1, 2, 2, 5], "lv": [10, 20, 21, 50]})
        right = pd.DataFrame({"k": [2, 3], "rv": ["x", "y"]})
        got = hash_join(ray.data.from_pandas(left).repartition(2),
                        ray.data.from_pandas(right),
                        key="k", how="outer", num_buckets=4).to_pandas()
        want = left.merge(right, on="k", how="outer")
        cols = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols, ignore_index=True),
            want[cols].sort_values(cols, ignore_index=True),
            check_dtype=False)
        # right-only row kept with null left values
        r3 = got[got["k"] == 3]
        assert len(r3) == 1 and r3["lv"].isna().all()

    def test_outer_schemaless_side_raises(self):
        import ray.data

        from pdf_parser_ray.pipelines.relational import hash_join

        left = ray.data.from_pandas(pd.DataFrame({"k": [1], "lv": ["a"]}))
        empty = ray.data.from_pandas(
            pd.DataFrame({"k": [], "rv": []})).filter(
            lambda r: False).materialize()
        with pytest.raises(ValueError, match="outer"):
            hash_join(left, empty, key="k", how="outer")
