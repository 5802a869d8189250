"""KMV approximate-distinct sketch (stages/sketch.py)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_parser_ray.functions.hashing import md5_u64
from pdf_parser_ray.stages.sketch import (kmv_distinct, kmv_distinct_sql,
                                          kmv_estimate)


def _h(v) -> int:
    return int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")


class TestMd5U64:
    def test_matches_hashlib_and_duckdb_idiom(self):
        import duckdb

        vals = ["a", "7", "", "héllo"]
        got = md5_u64(vals)
        assert got.dtype == np.uint64
        assert [int(x) for x in got] == [_h(v) for v in vals]
        sql = duckdb.sql(
            "SELECT CAST(concat('0x', substr(md5(v), 1, 16)) AS UBIGINT) "
            "FROM (SELECT unnest(['a', '7', '', 'héllo']) AS v)"
        ).fetchall()
        assert [r[0] for r in sql] == [int(x) for x in got]


class TestKmvEstimate:
    def test_exact_below_k(self):
        kept = np.array([5, 9, 12], dtype=np.uint64)
        assert kmv_estimate(kept, k=8) == 3

    def test_estimator_formula_at_k(self):
        # h_k = 2^62 → estimate = (k-1) * 2^64 // 2^62 = (k-1) * 4
        kept = np.array([1, 2, 1 << 62], dtype=np.uint64)
        assert kmv_estimate(kept, k=3) == 8

    def test_big_int_no_overflow(self):
        kept = np.array([1, 2, 3], dtype=np.uint64)  # h_k = 3 → huge estimate
        assert kmv_estimate(kept, k=3) == 2 * (1 << 64) // 3


@pytest.mark.usefixtures("ray_session")
class TestKmvDistinct:
    def _run(self, values, k, parts=3):
        import ray.data

        ds = ray.data.from_arrow(pa.table({"v": values})).repartition(parts)
        df = kmv_distinct(ds, "v", k=k).to_pandas()
        assert len(df) == 1 and str(df["kth_min"].dtype) == "uint64"
        # NOTE: df.iloc[0] would promote the mixed int64/uint64 row to
        # float64 and corrupt kth_min — read columns individually.
        return {c: df[c].iloc[0] for c in df.columns}

    def test_exact_when_cardinality_below_k(self):
        row = self._run(pa.array(list(range(10)) * 5, type=pa.int64()), k=64)
        assert row["estimate"] == 10 == row["n_kept"]
        assert row["kth_min"] == max(_h(v) for v in
                                     sorted(range(10), key=_h)[:64])

    def test_estimate_matches_hand_merge(self):
        vals = [f"u{i}" for i in range(500)]
        row = self._run(pa.array(vals * 2), k=32, parts=7)
        kept = sorted({_h(v) for v in vals})[:32]
        assert row["n_kept"] == 32
        assert int(row["kth_min"]) == kept[-1]
        assert row["estimate"] == 31 * (1 << 64) // kept[-1]
        # k=32 → ~18 % stderr; this seed-free check is structural, not tuned
        assert 250 <= row["estimate"] <= 1000

    def test_nulls_skipped(self):
        row = self._run(pa.array([1, None, 2, None, 1], type=pa.int64()), k=8)
        assert row["estimate"] == 2

    def test_partition_shape_independent(self):
        vals = pa.array([f"d{i}" for i in range(200)])
        a = self._run(vals, k=16, parts=1)
        b = self._run(vals, k=16, parts=11)
        assert a == b

    def test_k_validation(self):
        import ray.data

        with pytest.raises(ValueError):
            kmv_distinct(ray.data.from_items([{"v": 1}]), "v", k=1)

    def test_sql_replay_matches(self, tmp_path):
        import duckdb

        import ray.data

        vals = pa.table({"v": pa.array([i % 97 for i in range(400)],
                                       type=pa.int64())})
        p = str(tmp_path / "t.parquet")
        import pyarrow.parquet as pq

        pq.write_table(vals, p)
        got = kmv_distinct(ray.data.read_parquet(p), "v", k=48).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
        want = con.execute(kmv_distinct_sql("t", "v", k=48)).fetchdf()
        pd.testing.assert_frame_equal(
            got.sort_index(axis=1), want.sort_index(axis=1))


@pytest.mark.usefixtures("ray_session")
class TestKmvDistinctBy:
    def _ds(self, df, parts=5):
        import ray.data

        return ray.data.from_pandas(df).repartition(parts)

    def test_per_group_matches_global_sketch_rule(self):
        from pdf_parser_ray.stages.sketch import kmv_distinct_by

        df = pd.DataFrame({
            "g": (["a"] * 300) + (["b"] * 40),
            "v": [f"u{i % 120}" for i in range(300)] + [f"w{i}" for i in range(40)],
        })
        out = (kmv_distinct_by(self._ds(df), "v", group_col="g", k=16,
                               nrows=340)
               .to_pandas().set_index("g").sort_index())
        # group a: 120 distinct > k → estimator
        kept_a = sorted({_h(f"u{i}") for i in range(120)})[:16]
        assert out.loc["a", "n_kept"] == 16
        assert int(out.loc["a", "kth_min"]) == kept_a[-1]
        assert out.loc["a", "estimate"] == 15 * (1 << 64) // kept_a[-1]
        # group b: 40 distinct > 16 too — check exact path with tiny group
        kept_b = sorted({_h(f"w{i}") for i in range(40)})[:16]
        assert out.loc["b", "estimate"] == 15 * (1 << 64) // kept_b[-1]

    def test_exact_small_groups_and_shuffle_vs_coalesce(self):
        from pdf_parser_ray.stages.sketch import kmv_distinct_by

        df = pd.DataFrame({"g": ["x", "x", "y"], "v": [1, 1, 2]})
        for nrows in (3, None):  # coalesce gate vs shuffle path
            out = (kmv_distinct_by(self._ds(df, parts=2), "v", group_col="g",
                                   k=8, nrows=nrows)
                   .to_pandas().set_index("g").sort_index())
            assert list(out["estimate"]) == [1, 1]
            assert list(out["n_kept"]) == [1, 1]

    def test_sql_replay_matches(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        import ray.data

        from pdf_parser_ray.stages.sketch import (kmv_distinct_by,
                                                  kmv_distinct_by_sql)

        tbl = pa.table({
            "g": pa.array([f"t{i % 3}" for i in range(600)]),
            "v": pa.array([(i * 7) % 100 for i in range(600)], type=pa.int64()),
        })
        p = str(tmp_path / "t.parquet")
        pq.write_table(tbl, p)
        got = kmv_distinct_by(ray.data.read_parquet(p), "v", group_col="g",
                              k=24, nrows=600).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
        want = con.execute(
            kmv_distinct_by_sql("t", "v", group_col="g", k=24)).fetchdf()
        key = sorted(got.columns)
        pd.testing.assert_frame_equal(
            got[key].sort_values(key, ignore_index=True),
            want[key].sort_values(key, ignore_index=True))


@pytest.mark.usefixtures("ray_session")
class TestReviewRegressions:
    def test_grouped_sketch_hashes_ints_not_floats(self, tmp_path):
        """An int64 column CONTAINING NULLS must hash '7', not '7.0'
        (a pandas batch would dilute to float64) — replay vs DuckDB."""
        import duckdb
        import pyarrow.parquet as pq

        import ray.data

        from pdf_parser_ray.stages.sketch import (kmv_distinct_by,
                                                  kmv_distinct_by_sql)

        tbl = pa.table({
            "g": pa.array(["a"] * 6 + ["b"] * 3),
            "v": pa.array([7, 8, None, 7, 9, 10, None, 1, 2],
                          type=pa.int64()),
        })
        p = str(tmp_path / "t.parquet")
        pq.write_table(tbl, p)
        got = kmv_distinct_by(ray.data.read_parquet(p), "v", group_col="g",
                              k=8, nrows=9).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
        want = con.execute(
            kmv_distinct_by_sql("t", "v", group_col="g", k=8)).fetchdf()
        key = sorted(got.columns)
        pd.testing.assert_frame_equal(
            got[key].sort_values(key, ignore_index=True),
            want[key].sort_values(key, ignore_index=True))
        # direct check too: group a kept hashes of 7,8,9,10 as INTS
        a = got[got["g"] == "a"].iloc[0]
        assert a["n_kept"] == 4
        assert int(got[got["g"] == "a"]["kth_min"].iloc[0]) == \
            max(sorted(_h(v) for v in [7, 8, 9, 10])[:8])

    def test_grouped_sketch_null_group_is_a_group(self):
        import ray.data

        from pdf_parser_ray.stages.sketch import kmv_distinct_by

        tbl = pa.table({
            "g": pa.array(["x", None, None], type=pa.string()),
            "v": pa.array([1, 2, 3], type=pa.int64()),
        })
        out = kmv_distinct_by(ray.data.from_arrow(tbl), "v", group_col="g",
                              k=8, nrows=3).to_pandas()
        assert len(out) == 2
        null_row = out[out["g"].isna()]
        assert null_row["estimate"].iloc[0] == 2

    def test_tree_merge_equals_flat_merge(self):
        import ray.data

        from pdf_parser_ray.stages.sketch import kmv_distinct

        vals = pa.array([f"v{i % 300}" for i in range(900)])
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(9)
        flat = kmv_distinct(ds, "v", k=32).to_pandas()
        tree = kmv_distinct(ds, "v", k=32, intermediate_parts=4).to_pandas()
        pd.testing.assert_frame_equal(flat, tree)


class TestCountMin:
    """Count-Min sketch: one-sided error, partition invariance, collision
    behavior at tiny w, DuckDB replay parity."""

    def test_overestimate_and_exact_small(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import count_min_term_counts

        rows = [{"text": "a b a c"}, {"text": "b a"}, {"text": ""},
                {"text": None}, {"text": "A a"}]
        # generous width: no collisions → est == exact
        out = count_min_term_counts(
            ray.data.from_items(rows), ["a", "b", "z"], w=1024)
        got = out.set_index("term")
        assert got.loc["a", "exact_count"] == 5  # case-folded
        assert got.loc["b", "exact_count"] == 2
        assert got.loc["z", "exact_count"] == 0
        assert (got["est_count"] == got["exact_count"]).all()

    def test_partition_invariant_and_one_sided(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import count_min_term_counts

        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(200)]
        rows = [{"text": " ".join(rng.choice(vocab, size=30))}
                for _ in range(40)]
        terms = vocab[:10]
        # w=16 forces collisions → strictly one-sided overestimates
        a = count_min_term_counts(ray.data.from_items(rows), terms, w=16)
        b = count_min_term_counts(
            ray.data.from_items(rows).repartition(7), terms, w=16)
        pd.testing.assert_frame_equal(a, b)
        assert (a["est_count"] >= a["exact_count"]).all()
        assert (a["est_count"] > a["exact_count"]).any()  # collisions real

    def test_sql_parity(self, ray_session):
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        got = entry._q_count_min(sf).sort_values("term", ignore_index=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(entry._count_min_sql(sf)).fetchdf().sort_values(
            "term", ignore_index=True)
        pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
        assert (got["est_count"] >= got["exact_count"]).all()


class TestHllRegisters:
    def test_partial_rank_rule(self):
        from pdf_parser_ray.stages.sketch import _hll_partial

        p = 8
        # hash with register 3 and suffix 2^55 (bit_length 56) → rank 1
        h1 = (np.uint64(3) << np.uint64(56)) | np.uint64(1 << 55)
        # suffix 1 → bit_length 1 → rank 56; suffix 0 → rank 57
        h2 = (np.uint64(5) << np.uint64(56)) | np.uint64(1)
        h3 = np.uint64(7) << np.uint64(56)
        regs = _hll_partial(np.array([h1, h2, h3], dtype=np.uint64), p)
        assert regs[3] == 1 and regs[5] == 56 and regs[7] == 57
        assert regs.sum() == 1 + 56 + 57  # everything else zero

    def test_partition_invariant_and_estimate(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import hll_estimate, hll_registers

        rows = [{"v": f"user-{i % 500}"} for i in range(3000)]
        a = hll_registers(ray.data.from_items(rows), "v")
        b = hll_registers(ray.data.from_items(rows).repartition(11), "v")
        pd.testing.assert_frame_equal(a, b)
        est = hll_estimate(a["max_rank"].to_numpy())
        # p=8 → sigma ~6.5%; allow 4 sigma
        assert abs(est - 500) / 500 < 0.26

    def test_nulls_skipped(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import hll_registers

        with_null = hll_registers(
            ray.data.from_items([{"v": "a"}, {"v": None}, {"v": "b"}]), "v")
        without = hll_registers(
            ray.data.from_items([{"v": "a"}, {"v": "b"}]), "v")
        pd.testing.assert_frame_equal(with_null, without)

    def test_sql_parity(self, ray_session):
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        got = entry._q_hll_distinct_users(sf)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        exp = con.execute(
            entry.oracle_sql()["hll_distinct_users"]).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                      check_dtype=False)


class TestHeavyHitters:
    def _mk(self, ray_session):
        import ray.data

        # 'hot' 60x, 'warm' 20x, tail 1x each over 100 docs
        rows = ([{"text": "hot hot hot warm"}] * 20
                + [{"text": f"tail{i}"} for i in range(40)])
        return lambda: ray.data.from_items(rows)

    def test_exact_counts_and_threshold(self, ray_session):
        from pdf_parser_ray.stages.sketch import heavy_hitters

        f = self._mk(ray_session)
        # N = 20*4 + 40 = 120; phi=1/10 → threshold 12 → hot(60), warm(20)
        out = heavy_hitters(f, phi_num=1, phi_den=10)
        assert out.values.tolist() == [["hot", 60], ["warm", 20]]

    def test_partition_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import heavy_hitters

        rows = ([{"text": "hot hot hot warm"}] * 20
                + [{"text": f"tail{i}"} for i in range(40)])
        a = heavy_hitters(lambda: ray.data.from_items(rows), phi_den=10)
        b = heavy_hitters(
            lambda: ray.data.from_items(rows).repartition(13), phi_den=10)
        pd.testing.assert_frame_equal(a, b)

    def test_tail_included_at_loose_phi(self, ray_session):
        from pdf_parser_ray.stages.sketch import heavy_hitters

        f = self._mk(ray_session)
        # threshold 1 → every token qualifies
        out = heavy_hitters(f, phi_num=1, phi_den=1000)
        assert len(out) == 42 and out.iloc[0]["term"] == "hot"

    def test_sql_parity(self, ray_session):
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        got = entry._q_heavy_hitters(sf)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(entry.oracle_sql()["heavy_hitters"]).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                      check_dtype=False)


class TestValueHistogram:
    def test_bins_underflow_overflow_nulls(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import value_histogram

        rows = [{"v": x} for x in
                [-3.0, 0.0, 49.9, 50.0, 120.0, 1e9, None, 799.99]]
        out = value_histogram(ray.data.from_items(rows), "v",
                              lo=0.0, width=50.0, n_bins=16).to_pandas()
        assert out["bucket"].tolist() == list(range(-1, 17))
        got = dict(zip(out["bucket"], out["n"]))
        assert got[-1] == 1          # -3.0 underflows
        assert got[0] == 2           # 0.0, 49.9
        assert got[1] == 1           # 50.0 (boundary goes up)
        assert got[2] == 1           # 120.0
        assert got[15] == 1          # 799.99 → floor(15.9998)
        assert got[16] == 1          # 1e9 overflows
        assert out["n"].sum() == 7   # null skipped

    def test_partition_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import value_histogram

        rng = np.random.default_rng(17)
        rows = [{"v": float(x)} for x in rng.uniform(-10, 900, 500)]
        a = value_histogram(ray.data.from_items(rows), "v").to_pandas()
        b = value_histogram(ray.data.from_items(rows).repartition(9),
                            "v").to_pandas()
        pd.testing.assert_frame_equal(a, b)
        assert a["n"].sum() == 500


class TestKeySkewProfile:
    def test_exact_buckets(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import key_skew_profile

        # key sizes: a→1 (bucket 0), b→3 (bucket 1), c→8 (bucket 3)
        rows = ([{"k": "a"}] + [{"k": "b"}] * 3 + [{"k": "c"}] * 8)
        out = key_skew_profile(
            ray.data.from_items(rows), "k").to_pandas().sort_values(
            "gs_log2", ignore_index=True)
        assert out.values.tolist() == [[0, 1, 1], [1, 1, 3], [3, 1, 8]]

    def test_partition_invariant_and_null_group(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import key_skew_profile

        rows = ([{"k": None}] * 4 + [{"k": "x"}] * 4
                + [{"k": f"t{i}"} for i in range(5)])
        a = key_skew_profile(ray.data.from_items(rows),
                             "k").to_pandas().sort_values(
            "gs_log2", ignore_index=True)
        b = key_skew_profile(ray.data.from_items(rows).repartition(5),
                             "k").to_pandas().sort_values(
            "gs_log2", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        # null is a real group of 4 → bucket 2 holds null + 'x'
        assert a.set_index("gs_log2").loc[2, "n_keys"] == 2
        assert a["n_rows"].sum() == 13

    def test_sql_parity_both(self, ray_session):
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        for name in ("value_histogram", "key_skew_profile"):
            got = entry.queries()[name](sf).to_pandas()
            exp = con.execute(entry.oracle_sql()[name]).fetchdf()
            cols = sorted(got.columns)
            a = got[cols].sort_values(cols, ignore_index=True)
            b = exp[cols].sort_values(cols, ignore_index=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestHeavyHittersBy:
    def test_per_group_thresholds_independent(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import heavy_hitters_by

        # group A: 'hot' 9/12 tokens; group B: 'hot' 1/12 tokens — the
        # same token passes in A and fails in B
        rows = ([{"g": "A", "text": "hot hot hot"}] * 3
                + [{"g": "A", "text": "a b c"}]
                + [{"g": "B", "text": "hot"}]
                + [{"g": "B", "text": f"x{i} y{i} z{i}"} for i in range(4)])
        out = heavy_hitters_by(lambda: ray.data.from_items(rows),
                               group_col="g", phi_num=1, phi_den=3)
        assert out.values.tolist() == [["A", "hot", 9]]

    def test_partition_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.sketch import heavy_hitters_by

        rng = np.random.default_rng(23)
        rows = [{"g": f"s{int(i % 3)}",
                 "text": " ".join(f"w{int(x)}"
                                  for x in rng.integers(0, 12, 20))}
                for i in range(60)]
        a = heavy_hitters_by(lambda: ray.data.from_items(rows),
                             group_col="g", phi_den=12)
        b = heavy_hitters_by(
            lambda: ray.data.from_items(rows).repartition(9),
            group_col="g", phi_den=12)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0

    def test_sql_parity(self, ray_session):
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        got = entry._q_heavy_hitters_by_source(sf)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(
            entry.oracle_sql()["heavy_hitters_by_source"]).fetchdf()
        cols = sorted(got.columns)
        a = got[cols].sort_values(cols, ignore_index=True)
        b = exp[cols].sort_values(cols, ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
