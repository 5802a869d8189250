"""Relational pipelines vs DuckDB oracles at sf0.001 (fast in-test check;
the driver re-verifies at sf0.01 via __ray_entry__.oracle_sql)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _cmp(ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    a = ray_df[sorted(ray_df.columns)].sort_values(
        sorted(ray_df.columns), ignore_index=True)
    b = sql_df[sorted(sql_df.columns)].sort_values(
        sorted(sql_df.columns), ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestOracleParity:
    @pytest.mark.parametrize("name", [
        "pricing_summary", "region_customer_count", "supplier_nation_acctbal",
        "top_revenue_orders", "orders_filter_topk", "events_hourly",
        "events_top_users", "events_sessions", "token_counts", "quality",
        "lang_id", "hash_docs", "dedup_exact",
        # round-5 continuation operators
        "zorder_layout", "event_anomalies", "dup_stats", "snapshot_diff",
        "kmeans", "editdist_neardup", "tar_ingest", "source_keywords",
        "event_throttle", "order_skyline", "customer_order_trend",
        "user_activity_coverage", "event_type_affinity",
    ])
    def test_query_matches_oracle(self, con, name):
        import __ray_entry__ as m

        result = m.queries()[name](SF_DIR)
        ray_df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
        sql_df = con.execute(m.oracle_sql()[name]).df()
        assert len(ray_df) == len(sql_df)
        _cmp(ray_df, sql_df)


@pytest.mark.usefixtures("ray_session")
class TestCustomerOrderRevenuePaths:
    def test_broadcast_and_bucket_join_paths_agree(self):
        """The broadcast fast path (orders small enough to ray.put) and the
        bucket-hash-join fallback (10^12-row path) must return identical
        top-k rows."""
        from pdf_parser_ray.pipelines.relational import customer_order_revenue

        fast = customer_order_revenue(SF_DIR).to_pandas()
        slow = customer_order_revenue(SF_DIR, broadcast_limit=0).to_pandas()
        pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                      slow.reset_index(drop=True),
                                      check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestReviewRegressions:
    def test_events_hourly_subus_ns_truncates(self, tmp_path):
        """timestamp[ns] values with sub-microsecond remainders must
        truncate (like ts_int_us), not raise ArrowInvalid."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pdf_parser_ray.pipelines.relational import events_hourly

        t = pa.table({
            "ts": pa.array([1_500_000_123_456_789, 3_600_000_000_000_000_123],
                           type=pa.timestamp("ns")),
            "event_type": ["a", "a"],
            "value": [1.0, 2.0],
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = events_hourly(str(tmp_path)).to_pandas()
        # 1.5e15 ns = 1.5e12 µs → hour 416; 3.6e18 ns → hour 10^6.
        # The point: sub-µs remainders truncate instead of raising.
        assert sorted(out["hour_bucket"]) == [416, 1_000_000]

    def test_customer_order_revenue_empty_orders(self, tmp_path):
        """Broadcast fast path with an empty orders side returns the empty
        inner-join result instead of IndexError."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pdf_parser_ray.pipelines.relational import customer_order_revenue

        pq.write_table(pa.table({
            "o_orderkey": pa.array([], type=pa.int64()),
            "o_custkey": pa.array([], type=pa.int64())}),
            str(tmp_path / "orders.parquet"))
        pq.write_table(pa.table({
            "l_orderkey": [1], "l_extendedprice": [10.0], "l_discount": [0.0]}),
            str(tmp_path / "lineitem.parquet"))
        out = customer_order_revenue(str(tmp_path)).to_pandas()
        assert len(out) == 0


class TestEventsRangeJoin:
    """Hand-built edge cases for the composite-key range join: window
    boundary semantics, same-ts ties, and user-band isolation when a
    probe's lower bound underflows its own user's time range."""

    def _write(self, tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        us = pa.timestamp("us")
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([r[2] for r in rows], type=us),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        }), str(tmp_path / "events.parquet"))

    def test_boundaries_ties_and_user_isolation(self, ray_session, tmp_path):
        from pdf_parser_ray.pipelines.relational import events_range_join

        H = 3_600_000_000  # 1h in µs
        base = 1_700_000_000_000_000
        rows = [
            # user 1: purchase at base+2H; events exactly at the window
            # edges — base+H is INCLUDED (>= p.ts - 1h), base+2H (same ts)
            # is EXCLUDED (< p.ts strict), base+H-1 is OUTSIDE
            (10, 1, base + H - 1, "view"),
            (11, 1, base + H, "view"),
            (12, 1, base + H + 5, "view"),
            (13, 1, base + 2 * H, "purchase"),
            (14, 1, base + 2 * H, "view"),        # same-ts tie: excluded
            # user 2: purchase whose window starts BEFORE any of user 2's
            # events and before user 1's band ends — must not leak user 1
            (20, 2, base + 10, "purchase"),
            (21, 2, base + 20, "purchase"),       # 1 prior (the purchase at +10)
            # user 3: no purchase → contributes no output rows
            (30, 3, base, "view"),
        ]
        self._write(tmp_path, rows)
        out = events_range_join(str(tmp_path)).to_pandas()
        got = dict(zip(out["event_id"], out["n_prior_events"]))
        assert got == {13: 2, 20: 0, 21: 1}
        assert set(out.columns) == {"event_id", "user_id", "n_prior_events"}

    def test_wide_span_many_users_no_overflow(self, ray_session, tmp_path):
        """A timestamp span wide enough that codes*span would overflow
        int64 forces the user-slice path; counts must stay exact (the
        pre-fix kernel silently wrapped and returned garbage)."""
        from pdf_parser_ray.pipelines.relational import events_range_join

        H = 3_600_000_000
        WIDE = 2_400_000_000_000_000_000  # 2.4e18 µs — span ≈ 0.26×2^63
        rows = []
        eid = 0
        for u in range(1, 5):  # 4 users → ≥2 slices at this span
            rows += [(eid, u, 100, "view"), (eid + 1, u, 150, "purchase"),
                     (eid + 2, u, WIDE, "purchase")]
            eid += 3
        self._write(tmp_path, rows)
        out = events_range_join(str(tmp_path)).to_pandas()
        # per user: purchase@150 has 1 prior (view@100); purchase@WIDE has 0
        got = out.set_index("event_id")["n_prior_events"].to_dict()
        for u in range(4):
            assert got[3 * u + 1] == 1
            assert got[3 * u + 2] == 0


class TestStratifiedSample:
    def test_k_per_group_deterministic(self, ray_session):
        from pdf_parser_ray.pipelines.relational import stratified_sample

        a = stratified_sample(SF_DIR, k=5).to_pandas()
        b = stratified_sample(SF_DIR, k=5).to_pandas()
        counts = a.groupby("lang")["doc_id"].count()
        assert (counts <= 5).all() and counts.sum() == len(a)
        sa = a.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        sb = b.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        assert sa.equals(sb)

    def test_matches_global_rank(self, ray_session):
        """Two-level combine must equal the single-pass global rank."""
        import hashlib

        import duckdb

        from pdf_parser_ray.pipelines.relational import stratified_sample

        got = stratified_sample(SF_DIR, k=3).to_pandas()
        docs = duckdb.connect().execute(
            f"SELECT doc_id, lang FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).df()
        docs["rank"] = [int(hashlib.md5(str(i).encode()).hexdigest()[:16], 16)
                        for i in docs["doc_id"]]
        want = (docs.sort_values(["lang", "rank", "doc_id"])
                .groupby("lang").head(3)[["doc_id", "lang"]])
        assert (sorted(map(tuple, got.itertuples(index=False)))
                == sorted(map(tuple, want.itertuples(index=False))))


@pytest.mark.usefixtures("ray_session")
class TestTopNPerGroup:
    def test_oracle_parity_sf0001(self, ray_session, con):
        from pdf_parser_ray.pipelines.relational import orders_top_per_customer

        got = orders_top_per_customer(SF_DIR, n=3).to_pandas()
        want = con.execute(
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "CAST(row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk "
            "FROM orders QUALIFY rnk <= 3").fetchdf()
        _cmp(got[sorted(got.columns)], want)

    def test_rank_and_ties(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import top_n_per_group

        df = pd.DataFrame({
            "g": [1, 1, 1, 2, 2],
            "id": [10, 11, 12, 20, 21],
            "v": [5.0, 5.0, 9.0, 1.0, 1.0],  # ties → id ascending breaks
        })
        out = top_n_per_group(
            ray.data.from_pandas(df).repartition(3), group_col="g",
            order_cols=["v", "id"], descending=[True, False], n=2,
            nrows=None).to_pandas().sort_values(["g", "rnk"],
                                                ignore_index=True)
        assert list(out["id"]) == [12, 10, 20, 21]
        assert list(out["rnk"]) == [1, 2, 1, 2]

    def test_coalesce_gate_equals_shuffle_path(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import top_n_per_group

        df = pd.DataFrame({"g": [i % 7 for i in range(100)],
                           "id": range(100),
                           "v": [float((i * 37) % 13) for i in range(100)]})
        kw = dict(group_col="g", order_cols=["v", "id"],
                  descending=[True, False], n=3)
        ds = ray.data.from_pandas(df).repartition(4)
        a = top_n_per_group(ds, nrows=100, **kw).to_pandas()
        b = top_n_per_group(ds, nrows=None, **kw).to_pandas()
        key = ["g", "rnk"]
        pd.testing.assert_frame_equal(
            a.sort_values(key, ignore_index=True)[sorted(a.columns)],
            b.sort_values(key, ignore_index=True)[sorted(b.columns)])


@pytest.mark.usefixtures("ray_session")
class TestEventsValuePercentiles:
    def test_oracle_parity_sf0001(self, ray_session, con):
        from pdf_parser_ray.pipelines.relational import events_value_percentiles

        got = events_value_percentiles(SF_DIR).to_pandas()
        want = con.execute(
            "WITH m AS (SELECT event_type, "
            "CAST(floor(1000 * value) AS BIGINT) AS v "
            "FROM events WHERE value IS NOT NULL) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "min(v) AS min_milli, quantile_disc(v, 0.25) AS p25_milli, "
            "quantile_disc(v, 0.50) AS p50_milli, "
            "quantile_disc(v, 0.75) AS p75_milli, "
            "quantile_disc(v, 0.90) AS p90_milli, max(v) AS max_milli "
            "FROM m GROUP BY event_type").fetchdf()
        _cmp(got, want)

    def test_tiny_hand_case_both_paths(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import events_value_percentiles

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({
            "event_type": pa.array(["a"] * 4 + ["b"]),
            "value": pa.array([0.001, 0.002, 0.003, 0.004, -0.0015],
                              type=pa.float64()),
        }), str(d / "events.parquet"))
        out = events_value_percentiles(str(d)).to_pandas().set_index(
            "event_type").sort_index()
        # a: milli values [1,2,3,4]; p50 idx=ceil(.5*4)-1=1 → 2; p25 → 1
        assert out.loc["a", "p50_milli"] == 2
        assert out.loc["a", "p25_milli"] == 1
        assert out.loc["a", "p90_milli"] == 4
        # b: floor(-1.5) = -2
        assert out.loc["b", "min_milli"] == -2 == out.loc["b", "max_milli"]
        assert out.loc["b", "n_events"] == 1


@pytest.mark.usefixtures("ray_session")
class TestPivotCounts:
    def test_hand_case_other_and_drop(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import pivot_counts

        df = pd.DataFrame({"u": [1, 1, 1, 2, 2],
                           "t": ["a", "a", "b", "zz", "a"]})
        ds = ray.data.from_pandas(df).repartition(3)
        # other bucket
        out = pivot_counts(ds, key="u", pivot_col="t", categories=["a", "b"],
                           other="other", nrows=5).to_pandas().set_index("u").sort_index()
        assert list(out.loc[1]) == [2, 1, 0]
        assert list(out.loc[2]) == [1, 0, 1]
        # drop unlisted
        out2 = pivot_counts(ds, key="u", pivot_col="t", categories=["a", "b"],
                            nrows=5).to_pandas().set_index("u").sort_index()
        assert list(out2.columns) == ["n_a", "n_b"]
        assert list(out2.loc[2]) == [1, 0]

    def test_shuffle_path_equals_gate_path(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import pivot_counts

        df = pd.DataFrame({"u": [i % 13 for i in range(200)],
                           "t": [["a", "b", "c"][i % 3] for i in range(200)]})
        ds = ray.data.from_pandas(df).repartition(5)
        kw = dict(key="u", pivot_col="t", categories=["a", "b", "c"])
        a = pivot_counts(ds, nrows=200, **kw).to_pandas()
        b = pivot_counts(ds, nrows=None, **kw).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("u", ignore_index=True),
            b.sort_values("u", ignore_index=True))

    def test_oracle_parity_sf0001(self, ray_session, con):
        from pdf_parser_ray.pipelines.relational import user_event_pivot

        got = user_event_pivot(SF_DIR).to_pandas()
        want = con.execute(
            "SELECT user_id, "
            + ", ".join(
                f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
                for t in ["click", "view", "purchase", "signup", "error"])
            + " FROM events GROUP BY user_id").fetchdf()
        _cmp(got, want)


@pytest.mark.usefixtures("ray_session")
class TestPricingRollup:
    def test_oracle_parity_sf0001(self, ray_session, con):
        from pdf_parser_ray.pipelines.relational import pricing_rollup

        got = pricing_rollup(SF_DIR).to_pandas()
        want = con.execute(
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n_rows "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ).fetchdf()
        _cmp(got, want)

    def test_levels_consistent(self, ray_session):
        from pdf_parser_ray.pipelines.relational import pricing_rollup

        df = pricing_rollup(SF_DIR).to_pandas()
        total = df[df["l_returnflag"].isna()]
        lvl1 = df[df["l_returnflag"].notna() & df["l_linestatus"].isna()]
        base = df[df["l_linestatus"].notna()]
        assert len(total) == 1
        assert total["n_rows"].iloc[0] == lvl1["n_rows"].sum() == base["n_rows"].sum()
        assert total["sum_qty"].iloc[0] == base["sum_qty"].sum()


@pytest.mark.usefixtures("ray_session")
class TestUnpivot:
    def test_melt_shape_and_roundtrip(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import unpivot

        wide = pd.DataFrame({"u": [1, 2], "n_a": [3, 0], "n_b": [1, 5]})
        out = unpivot(ray.data.from_pandas(wide).repartition(2),
                      id_cols=["u"], value_cols=["n_a", "n_b"],
                      var_col="cat", value_col="n").to_pandas()
        assert len(out) == 4
        assert set(out.columns) == {"u", "cat", "n"}
        assert out.set_index(["u", "cat"])["n"].to_dict() == {
            (1, "n_a"): 3, (2, "n_a"): 0, (1, "n_b"): 1, (2, "n_b"): 5}

    def test_oracle_parity_sf0001(self, ray_session, con):
        from pdf_parser_ray.pipelines.relational import user_event_unpivot

        got = user_event_unpivot(SF_DIR).to_pandas()
        types = ["click", "view", "purchase", "signup", "error"]
        want = con.execute(
            "WITH p AS (SELECT user_id, "
            + ", ".join(
                f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
                for t in types)
            + " FROM events GROUP BY user_id) "
            + " UNION ALL ".join(
                f"SELECT user_id, 'n_{t}' AS cat, n_{t} AS n FROM p"
                for t in types)).fetchdf()
        _cmp(got, want)


@pytest.mark.usefixtures("ray_session")
class TestTopNPerGroupPrePrune:
    def test_hot_key_single_group(self, ray_session):
        """All rows one key across many blocks — pre-prune must still yield
        the exact global top-n."""
        import ray.data

        from pdf_parser_ray.pipelines.relational import top_n_per_group

        df = pd.DataFrame({"g": [1] * 500, "id": range(500),
                           "v": [float((i * 7919) % 997) for i in range(500)]})
        out = top_n_per_group(
            ray.data.from_pandas(df).repartition(8), group_col="g",
            order_cols=["v", "id"], descending=[True, False], n=4,
            nrows=None).to_pandas().sort_values("rnk", ignore_index=True)
        want = df.sort_values(["v", "id"], ascending=[False, True]).head(4)
        assert list(out["id"]) == list(want["id"])
        assert list(out["rnk"]) == [1, 2, 3, 4]


@pytest.mark.usefixtures("ray_session")
class TestTokenBudgetMix:
    def test_oracle_parity_sf0001(self, ray_session, con):
        from pdf_parser_ray.pipelines.relational import token_budget_mix

        got = token_budget_mix(SF_DIR, budget_tokens=2000).to_pandas()
        want = con.execute(
            "WITH t AS (SELECT doc_id, source, "
            "length(regexp_extract_all(text, '\\S+')) AS n_tokens, "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) "
            "AS UBIGINT) AS rank FROM documents), "
            "c AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(sum(n_tokens) OVER (PARTITION BY source "
            "ORDER BY rank, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS cum_tokens FROM t) "
            "SELECT doc_id, source, n_tokens, cum_tokens FROM c "
            "WHERE cum_tokens <= 2000").fetchdf()
        _cmp(got, want)
        assert len(got) > 0

    def test_prefix_property(self, ray_session):
        """Per source the kept set is a RANK-ORDER PREFIX and the budget
        is never exceeded."""
        import hashlib

        import duckdb

        from pdf_parser_ray.pipelines.relational import token_budget_mix

        got = token_budget_mix(SF_DIR, budget_tokens=2000).to_pandas()
        assert (got.groupby("source")["cum_tokens"].max() <= 2000).all()
        docs = duckdb.connect().execute(
            f"SELECT doc_id, source FROM read_parquet('{SF_DIR}/documents.parquet')").df()
        docs["rank"] = [int(hashlib.md5(str(i).encode()).hexdigest()[:16], 16)
                        for i in docs["doc_id"]]
        for src, sub in got.groupby("source"):
            ranked = docs[docs["source"] == src].sort_values(
                ["rank", "doc_id"])["doc_id"].tolist()
            kept = set(sub["doc_id"])
            # kept ids must be exactly the first len(kept) in rank order
            assert kept == set(ranked[:len(kept)])


@pytest.mark.usefixtures("ray_session")
class TestNullDilutedKeyBucketing:
    """A null in an int64 key column makes pandas stages deliver SOME
    blocks as float64 — the same logical key must still land in ONE
    bucket (was: duplicate per-group ranks / split pivot counts)."""

    def test_top_n_per_group_int_key_with_nulls(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import top_n_per_group

        df = pd.DataFrame({
            "g": pd.array([8] * 6 + [None] + [8] * 5, dtype="Int64"),
            "id": range(12),
            "v": [float(i) for i in range(12)],
        })
        out = top_n_per_group(
            ray.data.from_pandas(df).repartition(4), group_col="g",
            order_cols=["v", "id"], descending=[True, False], n=2,
            nrows=None).to_pandas()
        g8 = out[out["g"] == 8]
        assert len(g8) == 2
        assert sorted(g8["rnk"]) == [1, 2]
        assert sorted(g8["id"]) == [10, 11]  # global top-2 by v
        null_rows = out[out["g"].isna()]
        assert len(null_rows) == 1 and null_rows["rnk"].iloc[0] == 1

    def test_pivot_counts_int_key_with_nulls(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import pivot_counts

        df = pd.DataFrame({
            "u": pd.array([8] * 6 + [None] + [8] * 5, dtype="Int64"),
            "t": ["a", "b"] * 6,
        })
        out = pivot_counts(ray.data.from_pandas(df).repartition(4),
                           key="u", pivot_col="t", categories=["a", "b"],
                           nrows=None).to_pandas()
        r8 = out[out["u"] == 8]
        assert len(r8) == 1
        assert int(r8["n_a"].iloc[0]) + int(r8["n_b"].iloc[0]) == 11

    def test_bucket_array_int_float_agree(self):
        import pyarrow as pa

        from pdf_parser_ray.pipelines.relational import _bucket_array

        ints = pa.chunked_array([pa.array([0, 8, 123456, 2**52],
                                          type=pa.int64())])
        floats = pa.chunked_array([pa.array([0.0, 8.0, 123456.0, float(2**52)],
                                            type=pa.float64())])
        a = _bucket_array(ints, 64).to_pylist()
        b = _bucket_array(floats, 64).to_pylist()
        assert a == b
        # NaN (diluted null) → bucket 0, deterministic
        nan = pa.chunked_array([pa.array([float("nan"), 3.5],
                                         type=pa.float64())])
        got = _bucket_array(nan, 64).to_pylist()
        assert got[0] == 0 and 0 <= got[1] < 64


@pytest.mark.usefixtures("ray_session")
class TestCollectDistinctSorted:
    def test_hand_case_both_paths(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines.relational import collect_distinct_sorted

        df = pd.DataFrame({"u": [1, 1, 1, 2], "t": ["b", "a", "b", "z"]})
        ds = ray.data.from_pandas(df).repartition(3)
        for nrows in (4, None):
            out = collect_distinct_sorted(
                ds, key="u", value_col="t", out_col="csv",
                nrows=nrows).to_pandas().set_index("u").sort_index()
            assert list(out["csv"]) == ["a,b", "z"]

    def test_oracle_parity_sf0001(self, ray_session, con):
        from pdf_parser_ray.pipelines.relational import user_event_types

        got = user_event_types(SF_DIR).to_pandas()
        want = con.execute(
            "SELECT user_id, "
            "string_agg(DISTINCT event_type, ',' ORDER BY event_type) "
            "AS types_csv FROM events GROUP BY user_id").fetchdf()
        _cmp(got, want)


class TestExchangeSizing:
    """choose_partitions / vec_str_buckets — the shared shuffle-shape rules."""

    def test_choose_partitions_two_sizes(self, ray_session):
        from pdf_parser_ray.pipelines.relational import choose_partitions

        # unknown size keeps the caller's default
        assert choose_partitions(None, default=64) == 64
        small = choose_partitions(10_000, default=64)
        big = choose_partitions(50_000_000, default=64)
        assert small < big, (small, big)
        assert small >= 2
        assert big <= 512
        # a cluster-width input spreads at least CPU-wide
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 0))
        assert choose_partitions(5_000_000, default=8) >= min(cpus, 512)

    def test_vec_str_buckets_deterministic_and_complete(self):
        import numpy as np

        from pdf_parser_ray.pipelines.relational import vec_str_buckets

        ids = [f"doc-{i}" for i in range(5000)] + [None]
        a = vec_str_buckets(ids, 64)
        b = vec_str_buckets(pd.Series(ids, dtype="object"), 64)
        assert (a == b).all()                      # list vs Series agree
        assert a.dtype == np.int64
        assert a.min() >= 0 and a.max() < 64
        # near-uniform spread (the reason this replaced crc32 listcomps)
        counts = np.bincount(a, minlength=64)
        assert counts.min() > 0.5 * counts.mean()

    def test_bucket_array_string_path_vectorized_consistent(self):
        import pyarrow as pa

        from pdf_parser_ray.pipelines.relational import (_bucket_array,
                                                         vec_str_buckets)

        vals = ["a", "bb", None, "ccc", "a"]
        arr = _bucket_array(pa.chunked_array([pa.array(vals)]), 16)
        assert arr.to_pylist() == list(vec_str_buckets(vals, 16))
        # same value → same bucket across blocks
        assert arr.to_pylist()[0] == arr.to_pylist()[4]


def test_funnel_ordering_and_ties(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import funnel

    t = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # u1: full ordered funnel
        (1, t, "view"), (1, t + s, "click"), (1, t + 2 * s, "purchase"),
        # u2: purchase BEFORE click → stage 2 only
        (2, t, "view"), (2, t + s, "purchase"), (2, t + 2 * s, "click"),
        # u3: click at the SAME ts as view (strict '>' blocks) → stage 1
        (3, t, "view"), (3, t, "click"),
        # u4: no view at all → absent from the output
        (4, t, "click"), (4, t + s, "purchase"),
        # u5: second click after a too-early first → purchase still counts
        (5, t + s, "view"), (5, t, "click"), (5, t + 2 * s, "click"),
        (5, t + 3 * s, "purchase"),
        # noise types are ignored
        (1, t + 3 * s, "error"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["event_id"] = range(len(df))
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = {r["user_id"]: r["funnel_stage"]
           for r in funnel(str(tmp_path)).take_all()}
    assert out == {1: 3, 2: 2, 3: 1, 5: 3}


def test_retention_cohort_matrix(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import retention

    d = lambda day, h=0: pd.Timestamp("2026-01-01") + pd.Timedelta(days=day,
                                                                   hours=h)
    rows = [
        # cohort day 0: users 1, 2. u1 active days 0,1; u2 days 0,2
        (1, d(0)), (1, d(0, 5)), (1, d(1)),       # same-day dup collapses
        (2, d(0)), (2, d(2)),
        # cohort day 1: user 3, active days 1 and 3
        (3, d(1)), (3, d(3)),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = range(len(df))
    df["event_type"] = "view"
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in retention(str(tmp_path)).take_all()}
    epoch0 = (pd.Timestamp("2026-01-01") - pd.Timestamp("1970-01-01")).days
    assert out == {(epoch0, 0): 2, (epoch0, 1): 1, (epoch0, 2): 1,
                   (epoch0 + 1, 0): 1, (epoch0 + 1, 2): 1}


def test_event_transitions_order_and_ties(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import event_transitions

    t = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    # u1: A B A; u2: A B with a TIE on ts broken by event_id (10 < 11)
    rows = [
        (1, t, 0, "A"), (1, t + s, 1, "B"), (1, t + 2 * s, 2, "A"),
        (2, t, 10, "A"), (2, t, 11, "B"),
        (3, t, 20, "C"),                      # singleton: no transition
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = {(r["src_type"], r["dst_type"]): r["n"]
           for r in event_transitions(str(tmp_path)).take_all()}
    assert out == {("A", "B"): 2, ("B", "A"): 1}


def test_shipping_priority_paths_equal(ray_session):
    # TPC-H Q3: the broadcast fast path and the above-gate slim-join
    # composition must produce identical top-10 rows on real sf data
    from pdf_parser_ray.pipelines.relational import shipping_priority

    sf = "/root/testdata/sf0.001"
    cols = ["l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"]

    def norm(ds):
        df = ds.to_pandas()
        if df.empty:
            return []
        return [tuple(r) for r in
                df[cols].sort_values(cols).itertuples(index=False)]

    fast = norm(shipping_priority(sf))
    slow = norm(shipping_priority(sf, broadcast_limit=0))
    assert fast == slow and len(fast) > 0


def test_local_supplier_volume_paths_equal(ray_session):
    # TPC-H Q5: broadcast searchsorted-probe path vs the above-gate
    # three-hash-join composition — identical per-nation revenue
    from pdf_parser_ray.pipelines.relational import local_supplier_volume

    sf = "/root/testdata/sf0.001"

    def norm(ds):
        return [tuple(r) for r in ds.to_pandas().itertuples(index=False)]

    fast = norm(local_supplier_volume(sf))
    slow = norm(local_supplier_volume(sf, broadcast_limit=0))
    assert fast == slow and len(fast) > 0
    # revenue-desc contract
    revs = [r[1] for r in fast]
    assert revs == sorted(revs, reverse=True)


def test_local_supplier_volume_empty_region(ray_session):
    # a region filter that matches nothing must yield a typed empty
    # result on BOTH tiers, not a schema error
    from pdf_parser_ray.pipelines.relational import local_supplier_volume

    sf = "/root/testdata/sf0.001"
    for lim in (2_000_000, 0):
        ds = local_supplier_volume(sf, region="ATLANTIS",
                                   broadcast_limit=lim)
        # Dataset-level schema stays typed (ray's to_pandas() drops
        # columns on a fully-empty dataset, so assert on the Dataset)
        assert ds.schema().names == ["n_name", "revenue_cents"]
        assert ds.count() == 0


def test_volume_shipping_paths_equal(ray_session):
    # TPC-H Q7: broadcast vs above-gate composition — identical
    # per-(supp_nation, cust_nation, year) revenue; both directions of
    # the pair present; the same-nation rows (Q5's keep set) excluded
    from pdf_parser_ray.pipelines.relational import volume_shipping

    sf = "/root/testdata/sf0.001"

    def norm(df):
        return [tuple(r) for r in df.itertuples(index=False)]

    # the default NATION_2/7 pair is empty at sf0.001 (10 suppliers);
    # pick a pair with traffic in the window
    kw = dict(nation_a="NATION_12", nation_b="NATION_10")
    fast = norm(volume_shipping(sf, **kw))
    slow = norm(volume_shipping(sf, broadcast_limit=0, **kw))
    assert fast == slow and len(fast) > 0
    dirs = {(r[0], r[1]) for r in fast}
    assert all(a != b for a, b in dirs)  # anti-correlation held

    # unknown nation pair → typed empty frame; an EMPTY populated-pair
    # result (both tiers) keeps its columns too
    for empty in (volume_shipping(sf, nation_a="NOPE"),
                  volume_shipping(sf),
                  volume_shipping(sf, broadcast_limit=0)):
        assert list(empty.columns) == ["supp_nation", "cust_nation",
                                       "l_year", "revenue_cents"]
        assert len(empty) == 0


def test_promo_revenue_tiers_and_planted_mix(ray_session, tmp_path):
    # TPC-H Q14 on a planted mix: 2 promo + 1 regular part, hand-computed
    # cents and permille; both tiers equal; zero-revenue month → NULL ratio
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import promo_revenue

    pd.DataFrame({"p_partkey": [1, 2, 3],
                  "p_type": ["PROMO", "PROMO", "STANDARD"]}).to_parquet(
        tmp_path / "part.parquet")
    us = pa.timestamp("us")
    in_win = pd.Timestamp("1996-03-15").to_pydatetime()
    out_win = pd.Timestamp("1996-05-01").to_pydatetime()
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 9, 1], type=pa.int64()),
        "l_extendedprice": [10.0, 20.0, 30.0, 40.0, 50.0],
        "l_discount": [0.0, 0.5, 0.0, 0.0, 0.0],
        "l_shipdate": pa.array([in_win, in_win, in_win, in_win, out_win],
                               type=us),
    }), str(tmp_path / "lineitem.parquet"))
    # in-window matched rows: part1 1000c (promo), part2 1000c (promo),
    # part3 3000c (std); part 9 is an orphan (inner join drops it);
    # the 5000c row is outside the window
    for lim in (2_000_000, 0):
        df = promo_revenue(str(tmp_path), broadcast_limit=lim)
        assert df.iloc[0].tolist() == [2000, 5000, 400]

    # empty month → NULL permille, zeros, schema intact (both tiers)
    for lim in (2_000_000, 0):
        df = promo_revenue(str(tmp_path), date_from="2011-01-01",
                           date_to="2011-02-01", broadcast_limit=lim)
        assert df["promo_revenue_cents"].tolist() == [0]
        assert df["total_revenue_cents"].tolist() == [0]
        assert pd.isna(df["promo_permille"].iloc[0])


def test_fk_orphans_planted(ray_session, tmp_path):
    # plant known referential violations in a scratch table set: the
    # counts must be exact and identical on both tiers, including a NULL
    # foreign key (null never matches → orphan)
    import pandas as pd

    from pdf_parser_ray.pipelines.relational import fk_orphans

    t = {
        "region": pd.DataFrame({"r_regionkey": [0], "r_name": ["R0"]}),
        "nation": pd.DataFrame({"n_nationkey": [0, 1],
                                "n_name": ["N0", "N1"],
                                "n_regionkey": [0, 7]}),      # 1 orphan
        "customer": pd.DataFrame({"c_custkey": [10, 11],
                                  "c_nationkey": [0, 1]}),
        "supplier": pd.DataFrame({"s_suppkey": [5],
                                  "s_nationkey": [9]}),       # 1 orphan
        "orders": pd.DataFrame({"o_orderkey": [100, 101, 102],
                                "o_custkey": [10, 99, None]}),  # 2 orphans
        "lineitem": pd.DataFrame({"l_orderkey": [100, 100, 777]}),  # 1
        "events": pd.DataFrame({"user_id": [10, 10, 11]}),    # 0 orphans
    }
    for name, df in t.items():
        df.to_parquet(tmp_path / f"{name}.parquet")

    want = {
        "customer.c_nationkey->nation.n_nationkey": 0,
        "events.user_id->customer.c_custkey": 0,
        "lineitem.l_orderkey->orders.o_orderkey": 1,
        "nation.n_regionkey->region.r_regionkey": 1,
        "orders.o_custkey->customer.c_custkey": 2,
        "supplier.s_nationkey->nation.n_nationkey": 1,
    }
    fast = fk_orphans(str(tmp_path))
    slow = fk_orphans(str(tmp_path), broadcast_limit=0)
    assert dict(zip(fast["relation"], fast["n_orphans"])) == want
    assert fast.equals(slow)
    assert dict(zip(fast["relation"], fast["n_left"]))[
        "orders.o_custkey->customer.c_custkey"] == 3


def test_returned_item_report_paths_equal(ray_session):
    # TPC-H Q10: broadcast path vs the above-gate hash-join + k-row
    # attribute-probe composition — identical top-20 reports
    from pdf_parser_ray.pipelines.relational import returned_item_report

    sf = "/root/testdata/sf0.001"
    cols = ["c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name"]

    def norm(ds):
        df = ds.to_pandas()
        return [tuple(r) for r in df[cols].itertuples(index=False)]

    fast = norm(returned_item_report(sf))
    slow = norm(returned_item_report(sf, broadcast_limit=0))
    assert fast == slow and len(fast) > 0
    revs = [r[2] for r in fast]
    assert revs == sorted(revs, reverse=True)
    # attributes really attached: no null names on either side
    assert all(r[1] and r[4] for r in fast)


def test_temperature_mix_brute_force_and_flattening(ray_session):
    # α=1/2 mixture: exact brute-force equivalence of quotas + selection,
    # and the defining property — the dominant group's mix share must be
    # BELOW its natural share (temperature < 1 flattens)
    import hashlib

    import numpy as np
    import pandas as pd

    from pdf_parser_ray.pipelines.relational import temperature_mix

    sf = "/root/testdata/sf0.001"
    budget = 120
    got = (temperature_mix(sf, budget_docs=budget).to_pandas()
           .sort_values("doc_id", ignore_index=True))

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang"])
    docs = docs[docs["doc_id"].notna()].copy()
    n = docs.groupby("lang").size().sort_index()
    w = np.sqrt(n.to_numpy(np.float64))
    tot = 0.0
    for x in w:
        tot += float(x)
    quota = dict(zip(n.index, np.floor((budget * w) / tot).astype(int)))
    docs["rank"] = [int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[:8], "big")
        for i in docs["doc_id"]]
    docs = docs.sort_values(["lang", "rank", "doc_id"])
    docs["rn"] = docs.groupby("lang").cumcount()
    want = (docs[docs["rn"] < docs["lang"].map(quota)]
            [["doc_id", "lang"]].sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(got, want)

    # flattening: every group got a quota, and the biggest group's share
    # of the mix is strictly below its share of the corpus
    mix = got.groupby("lang").size()
    big = n.idxmax()
    assert set(mix.index) == set(n.index)
    assert mix[big] / mix.sum() < n[big] / n.sum()


def test_weighted_sample_brute_force_and_bias(ray_session, tmp_path):
    # priority sampling: top-k of w/(md5_u64(id)+1) — exact brute-force
    # equivalence, and heavier docs must dominate the selection
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import weighted_sample

    n = 400
    # ids < 200 are light (weight 1), ids >= 200 heavy (weight 1000)
    weights = [1] * 200 + [1000] * 200
    tbl = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                    "n_chars": pa.array(weights, type=pa.int64())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    out = weighted_sample(str(tmp_path), k=50).to_pandas()
    assert len(out) == 50
    assert list(out.columns) == ["doc_id", "n_chars"]

    def pr(i, w):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
        # round h to double BEFORE +1.0 — the exact op order of both the
        # numpy kernel and the DuckDB oracle
        return float(w) / (float(h) + 1.0)

    brute = sorted(range(n), key=lambda i: (-pr(i, weights[i]), i))[:50]
    assert sorted(out["doc_id"]) == sorted(brute)
    # 1000x weight → the heavy half should take nearly every slot
    assert (out["doc_id"] >= 200).sum() >= 45


def test_customer_distribution_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q13: both tiers equal at sf0.001 and the distribution must
    # account for every customer; planted case exercises the
    # footer-derived zero bucket and orphan-order exclusion
    import pandas as pd
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import customer_distribution

    sf = "/root/testdata/sf0.001"
    fast = customer_distribution(sf)
    slow = customer_distribution(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0
    n_cust = pq.read_metadata(f"{sf}/customer.parquet").num_rows
    assert int(fast["custdist"].sum()) == n_cust
    # sorted custdist DESC then c_count DESC
    keys = list(zip(-fast["custdist"], -fast["c_count"]))
    assert keys == sorted(keys)

    # planted: cust1 has 2 orders, cust2 has 1, cust3 none; custkey 99
    # is an orphan (no customer row) and must not create a bucket
    pd.DataFrame({"c_custkey": [1, 2, 3]}).to_parquet(
        tmp_path / "customer.parquet")
    pd.DataFrame({"o_custkey": [1, 1, 2, 99, 99, 99]}).to_parquet(
        tmp_path / "orders.parquet")
    for lim in (2_000_000, 0):
        df = customer_distribution(str(tmp_path), broadcast_limit=lim)
        assert df.values.tolist() == [[2, 1], [1, 1], [0, 1]]


def test_order_priority_check_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q4 shape: tier equality at sf0.001; planted case pins the
    # strict > deadline (order date + 90 days, exact µs arithmetic)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import order_priority_check

    sf = "/root/testdata/sf0.001"
    fast = order_priority_check(sf)
    slow = order_priority_check(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0

    us = pa.timestamp("us")

    def ts(s):
        return pd.Timestamp(s).to_pydatetime()

    # 1996-02-01 + 90 days = 1996-05-01 (leap year): a line shipped
    # exactly ON the deadline is NOT late; one day past is
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_orderdate": pa.array([ts("1996-02-01"), ts("1996-03-01"),
                                 ts("1995-01-01"), ts("1996-01-15")],
                                type=us),
        "o_orderpriority": ["A", "B", "A", "A"],
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
        "l_shipdate": pa.array([ts("1996-04-01"), ts("1996-05-01"),
                                ts("1996-09-01"), ts("1999-01-01"),
                                ts("1996-12-01")], type=us),
    }), str(tmp_path / "lineitem.parquet"))
    # order 1: on-deadline only → not late; order 3: late line but the
    # order is outside the window; orders 2 and 4: late
    for lim in (2_000_000, 0):
        df = order_priority_check(str(tmp_path), broadcast_limit=lim)
        assert df.values.tolist() == [["A", 1], ["B", 1]]


def test_large_volume_customers_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q18: tier equality at sf0.001; planted case pins the strict
    # > threshold and the cents/qty arithmetic end to end
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import large_volume_customers

    sf = "/root/testdata/sf0.001"
    fast = large_volume_customers(sf)
    slow = large_volume_customers(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0
    assert (fast["sum_qty"] > 250).all()

    us = pa.timestamp("us")
    d1 = pd.Timestamp("1996-01-01").to_pydatetime()
    d2 = pd.Timestamp("1997-06-15").to_pydatetime()
    pd.DataFrame({"c_custkey": [10, 20],
                  "c_name": ["X", "Y"]}).to_parquet(
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_custkey": pa.array([10, 20], type=pa.int64()),
        "o_orderdate": pa.array([d1, d2], type=us),
        "o_totalprice": [10.0, 55.55],
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], type=pa.int64()),
        "l_quantity": [100.0, 150.0, 200.0, 51.0],
    }), str(tmp_path / "lineitem.parquet"))
    # order 1 sums to exactly 250 → excluded (strict >); order 2 → 251
    for lim in (2_000_000, 0):
        df = large_volume_customers(str(tmp_path), broadcast_limit=lim)
        assert df.drop(columns="o_orderdate").values.tolist() == [
            ["Y", 20, 2, 5555, 251]]
        assert df["o_orderdate"].iloc[0] == pd.Timestamp("1997-06-15")

    # raising the bar past every order → typed empty frame, both tiers
    for lim in (2_000_000, 0):
        df = large_volume_customers(str(tmp_path), min_qty=1000,
                                    broadcast_limit=lim)
        assert len(df) == 0
        assert list(df.columns) == ["c_name", "c_custkey", "o_orderkey",
                                    "o_orderdate", "o_totalprice_cents",
                                    "sum_qty"]


def test_global_sales_opportunity_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q22 shape: tier equality at sf0.001; planted case pins the
    # exact integer average predicate (cents ≥ tot//n + 1) and the
    # recent-order anti-join
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import global_sales_opportunity

    sf = "/root/testdata/sf0.001"
    fast = global_sales_opportunity(sf)
    slow = global_sales_opportunity(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0

    us = pa.timestamp("us")
    old = pd.Timestamp("2000-01-01").to_pydatetime()
    new = pd.Timestamp("2001-06-01").to_pydatetime()
    # positive cents: 10000, 5000, 8000 → tot 23000, n 3, threshold
    # 23000//3+1 = 7667; rich = c1 (10000) and c5 (8000); c5 ordered
    # recently → only c1 survives. Negative/zero balances never count.
    pd.DataFrame({"c_custkey": [1, 2, 3, 5],
                  "c_mktsegment": ["S1", "S1", "S2", "S2"],
                  "c_acctbal": [100.0, 50.0, -10.0, 80.0]}).to_parquet(
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 5], type=pa.int64()),
        "o_orderdate": pa.array([old, new], type=us),
    }), str(tmp_path / "orders.parquet"))
    for lim in (2_000_000, 0):
        df = global_sales_opportunity(str(tmp_path), broadcast_limit=lim)
        assert df.values.tolist() == [["S1", 1, 10000]]

    # no positive balance anywhere → NULL average → typed empty frame
    pd.DataFrame({"c_custkey": [1], "c_mktsegment": ["S1"],
                  "c_acctbal": [-5.0]}).to_parquet(
        tmp_path / "customer.parquet")
    df = global_sales_opportunity(str(tmp_path))
    assert len(df) == 0
    assert list(df.columns) == ["c_mktsegment", "n_customers",
                                "acctbal_cents"]


def test_supplier_nation_share_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q11 shape: tier equality at sf0.001; planted case pins the
    # STRICT > fraction boundary and the integer permille
    import pandas as pd

    from pdf_parser_ray.pipelines.relational import supplier_nation_share

    sf = "/root/testdata/sf0.001"
    fast = supplier_nation_share(sf)
    slow = supplier_nation_share(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0

    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["NA", "NB"]}).to_parquet(
        tmp_path / "nation.parquet")
    pd.DataFrame({"s_suppkey": [1, 2],
                  "s_nationkey": [0, 1]}).to_parquet(
        tmp_path / "supplier.parquet")
    # NA: 75.00 → 7500c; NB: 25.00 → 2500c; total 10000c. At 1/4, NB is
    # exactly AT the fraction (4·2500 = 10000) → strict > excludes it
    pd.DataFrame({"l_suppkey": [1, 1, 2],
                  "l_extendedprice": [50.0, 25.0, 25.0],
                  "l_discount": [0.0, 0.0, 0.0]}).to_parquet(
        tmp_path / "lineitem.parquet")
    for lim in (2_000_000, 0):
        df = supplier_nation_share(str(tmp_path), frac_num=1, frac_den=4,
                                   broadcast_limit=lim)
        assert df.values.tolist() == [["NA", 7500, 750]]


def test_top_supplier_ties_and_window(ray_session, tmp_path):
    # TPC-H Q15: planted two-way tie at the max — BOTH winners kept —
    # and an out-of-window line that must not count
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import top_supplier

    sf = "/root/testdata/sf0.001"
    live = top_supplier(sf)
    assert len(live) >= 1
    assert list(live.columns) == ["s_suppkey", "s_name", "revenue_cents"]
    assert live["revenue_cents"].nunique() == 1  # ties all at the max

    us = pa.timestamp("us")
    inside = pd.Timestamp("1996-02-01").to_pydatetime()
    outside = pd.Timestamp("1996-05-01").to_pydatetime()
    pd.DataFrame({"s_suppkey": [1, 2, 3],
                  "s_name": ["SA", "SB", "SC"]}).to_parquet(
        tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3, 1], type=pa.int64()),
        "l_extendedprice": [100.0, 60.0, 40.0, 10.0, 500.0],
        "l_discount": [0.0] * 5,
        "l_shipdate": pa.array([inside, inside, inside, inside, outside],
                               type=us),
    }), str(tmp_path / "lineitem.parquet"))
    # in-window: s1=10000c, s2=6000+4000=10000c (tie), s3=1000c; the
    # 500.0 line is outside the window
    df = top_supplier(str(tmp_path))
    assert df.values.tolist() == [[1, "SA", 10000], [2, "SB", 10000]]

    # empty window → typed empty frame
    df = top_supplier(str(tmp_path), date_from="2050-01-01",
                      date_to="2050-02-01")
    assert len(df) == 0
    assert list(df.columns) == ["s_suppkey", "s_name", "revenue_cents"]


def test_brand_supplier_count_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q16 shape: tier equality at sf0.001; planted case pins the
    # pair dedup (repeat lines count once) and the >= qty boundary
    import pandas as pd

    from pdf_parser_ray.pipelines.relational import brand_supplier_count

    sf = "/root/testdata/sf0.001"
    fast = brand_supplier_count(sf)
    slow = brand_supplier_count(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0

    pd.DataFrame({"p_partkey": [1, 2, 3],
                  "p_brand": ["B1", "B1", "B2"]}).to_parquet(
        tmp_path / "part.parquet")
    # B1 sees suppliers {7, 8} (supplier 7 twice, via parts 1 AND 2 —
    # still one distinct); B2 sees {7} but only via a qty-47.9 line
    # (excluded: >= 48) plus one exactly-48 line (included)
    pd.DataFrame({"l_partkey": [1, 1, 2, 2, 3, 3],
                  "l_suppkey": [7, 7, 7, 8, 7, 9],
                  "l_quantity": [48.0, 50.0, 49.0, 48.0, 47.9, 48.0],
                  }).to_parquet(tmp_path / "lineitem.parquet")
    for lim in (2_000_000, 0):
        df = brand_supplier_count(str(tmp_path), broadcast_limit=lim)
        assert df.values.tolist() == [["B1", 2], ["B2", 1]]


def test_small_qty_revenue_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q17 shape: tier equality at sf0.001; planted case pins the
    # STRICT < boundary of the integer threshold and the //7 division
    import pandas as pd

    from pdf_parser_ray.pipelines.relational import small_qty_revenue

    sf = "/root/testdata/sf0.001"
    fast = small_qty_revenue(sf)
    slow = small_qty_revenue(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0

    pd.DataFrame({"p_partkey": [1, 2, 3],
                  "p_brand": ["B1", "B1", "B9"]}).to_parquet(
        tmp_path / "part.parquet")
    # part 1: q=[3,27] → sum 30, cnt 2 → 5*2*3 = 30 NOT < 30: boundary
    #   line excluded (strict <)
    # part 2: q=[1,30] → sum 31, cnt 2 → 5*2*1 = 10 < 31: the q=1 line
    #   (price 140.00 → 14000c) qualifies; 14000 // 7 = 2000
    # part 3: brand B9 not in the filter → dropped at the read
    pd.DataFrame({"l_partkey": [1, 1, 2, 2, 3],
                  "l_quantity": [3.0, 27.0, 1.0, 30.0, 1.0],
                  "l_extendedprice": [10.0, 10.0, 140.0, 10.0, 10.0],
                  }).to_parquet(tmp_path / "lineitem.parquet")
    for lim in (2_000_000, 0):
        df = small_qty_revenue(str(tmp_path), brands=("B1", "B2"),
                               broadcast_limit=lim)
        assert df.values.tolist() == [["B1", 2000, 1]]


def test_disjunctive_revenue_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q19 shape: tier equality at sf0.001; planted case pins the
    # inclusive BETWEEN bounds on qty AND size and the brand partition
    import pandas as pd

    from pdf_parser_ray.pipelines.relational import disjunctive_revenue

    sf = "/root/testdata/sf0.001"
    fast = disjunctive_revenue(sf)
    slow = disjunctive_revenue(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0

    clauses = (("B1", 5, 10, 1, 3), ("B2", 20, 30, 2, 4))
    pd.DataFrame({"p_partkey": [1, 2, 3, 4],
                  "p_brand": ["B1", "B1", "B2", "B9"],
                  "p_size": [3, 4, 2, 2]}).to_parquet(
        tmp_path / "part.parquet")
    # part 1 (B1, size 3 = hi bound, in): qty 5 (lo bound, in → 100c),
    #   qty 10 (hi bound, in → 200c), qty 11 (out)
    # part 2 (B1, size 4 > 3): excluded entirely despite qty in range
    # part 3 (B2, size 2): qty 20 (in → 400c), qty 19 (out)
    # part 4 (B9): no clause
    pd.DataFrame({"l_partkey": [1, 1, 1, 2, 3, 3, 4],
                  "l_quantity": [5.0, 10.0, 11.0, 7.0, 20.0, 19.0, 25.0],
                  "l_extendedprice": [1.0, 2.0, 9.0, 9.0, 4.0, 9.0, 9.0],
                  "l_discount": [0.0] * 7}).to_parquet(
        tmp_path / "lineitem.parquet")
    for lim in (2_000_000, 0):
        df = disjunctive_revenue(str(tmp_path), clauses=clauses,
                                 broadcast_limit=lim)
        assert df.values.tolist() == [["B1", 300, 2], ["B2", 400, 1]]


def test_market_share_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q8 shape: tier equality at sf0.001; planted case pins the
    # region filter on CUSTOMER nation, the numerator on SUPPLIER
    # nation, the window bound, and the integer permille
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import market_share

    sf = "/root/testdata/sf0.001"
    fast = market_share(sf)
    slow = market_share(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0
    assert list(fast.columns) == ["o_year", "total_cents", "nation_cents",
                                  "share_permille"]

    pd.DataFrame({"r_regionkey": [0, 1],
                  "r_name": ["R_IN", "R_OUT"]}).to_parquet(
        tmp_path / "region.parquet")
    pd.DataFrame({"n_nationkey": [0, 1, 2],
                  "n_name": ["N_TGT", "N_OTH", "N_FAR"],
                  "n_regionkey": [0, 0, 1]}).to_parquet(
        tmp_path / "nation.parquet")
    # customers: c1 in-region (nation N_TGT), c2 in-region (N_OTH),
    # c3 out-of-region
    pd.DataFrame({"c_custkey": [1, 2, 3],
                  "c_nationkey": [0, 1, 2]}).to_parquet(
        tmp_path / "customer.parquet")
    # suppliers: s1 target nation, s2 other
    pd.DataFrame({"s_suppkey": [1, 2],
                  "s_nationkey": [0, 1]}).to_parquet(
        tmp_path / "supplier.parquet")
    us = pa.timestamp("us")
    d96 = pd.Timestamp("1996-06-01").to_pydatetime()
    d97 = pd.Timestamp("1997-06-01").to_pydatetime()
    dout = pd.Timestamp("1998-01-01").to_pydatetime()  # = hi, excluded
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20, 30, 40], type=pa.int64()),
        "o_custkey": pa.array([1, 2, 3, 1], type=pa.int64()),
        "o_orderdate": pa.array([d96, d97, d96, dout], type=us)}),
        str(tmp_path / "orders.parquet"))
    # o10 (1996, in-region): s1 30.00 target + s2 10.00 → 4000c/3000c
    #   → permille 750
    # o20 (1997, in-region): s2 20.00 → 2000c/0c → permille 0
    # o30: out-of-region customer, excluded; o40: at hi bound, excluded
    pd.DataFrame({"l_orderkey": [10, 10, 20, 30, 40],
                  "l_suppkey": [1, 2, 2, 1, 1],
                  "l_extendedprice": [30.0, 10.0, 20.0, 99.0, 99.0],
                  "l_discount": [0.0] * 5}).to_parquet(
        tmp_path / "lineitem.parquet")
    for lim in (2_000_000, 0):
        df = market_share(str(tmp_path), region="R_IN", nation="N_TGT",
                          broadcast_limit=lim)
        assert df.values.tolist() == [[1996, 4000, 3000, 750],
                                      [1997, 2000, 0, 0]]

    # unknown region/nation → typed empty
    df = market_share(str(tmp_path), region="NOPE", nation="N_TGT")
    assert len(df) == 0 and list(df.columns) == [
        "o_year", "total_cents", "nation_cents", "share_permille"]


def test_late_shipments_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q12 shape (adapted): tier equality at sf0.001; planted case
    # pins the STRICT > lateness boundary and the priority split
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import late_shipments

    sf = "/root/testdata/sf0.001"
    fast = late_shipments(sf)
    slow = late_shipments(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0
    assert list(fast.columns) == ["l_returnflag", "high_line_count",
                                  "low_line_count"]

    us = pa.timestamp("us")
    base = pd.Timestamp("1996-01-01")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_orderdate": pa.array([base.to_pydatetime()] * 2, type=us),
        "o_orderpriority": ["1-URGENT", "5-LOW"]}),
        str(tmp_path / "orders.parquet"))
    # lag 10 days: +10d is NOT late (strict >), +10d+1µs IS
    at10 = (base + pd.Timedelta(days=10)).to_pydatetime()
    late = (base + pd.Timedelta(days=10, microseconds=1)).to_pydatetime()
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], type=pa.int64()),
        "l_shipdate": pa.array([at10, late, late, late], type=us),
        "l_returnflag": ["A", "A", "A", "B"]}),
        str(tmp_path / "lineitem.parquet"))
    for lim in (2_000_000, 0):
        df = late_shipments(str(tmp_path), lag_days=10,
                            broadcast_limit=lim)
        # A: one late high (o1) + one late low (o2); B: one late low
        assert df.values.tolist() == [["A", 1, 1], ["B", 0, 1]]


def test_product_type_profit_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q9 shape (adapted): tier equality at sf0.001; planted case
    # pins the substring match and the two-dimension group keys
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import product_type_profit

    sf = "/root/testdata/sf0.001"
    fast = product_type_profit(sf)
    slow = product_type_profit(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0
    assert list(fast.columns) == ["n_name", "o_year", "profit_cents"]

    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["NA", "NB"]}).to_parquet(
        tmp_path / "nation.parquet")
    pd.DataFrame({"s_suppkey": [1, 2],
                  "s_nationkey": [0, 1]}).to_parquet(
        tmp_path / "supplier.parquet")
    # 'red widget' and 'bored bolt' both contain 'red' (substring, not
    # word); 'blue bolt' does not
    pd.DataFrame({"p_partkey": [1, 2, 3],
                  "p_name": ["red widget", "bored bolt", "blue bolt"],
                  }).to_parquet(tmp_path / "part.parquet")
    us = pa.timestamp("us")
    d96 = pd.Timestamp("1996-06-01").to_pydatetime()
    d97 = pd.Timestamp("1997-06-01").to_pydatetime()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20], type=pa.int64()),
        "o_orderdate": pa.array([d96, d97], type=us)}),
        str(tmp_path / "orders.parquet"))
    # (NA,1996): part1 via s1 on o10 → 1000c; (NB,1996): part2 via s2
    # on o10 → 2000c; (NA,1997): part2 via s1 on o20 → 400c;
    # part3 line excluded by the name filter
    pd.DataFrame({"l_orderkey": [10, 10, 20, 10],
                  "l_partkey": [1, 2, 2, 3],
                  "l_suppkey": [1, 2, 1, 1],
                  "l_extendedprice": [10.0, 20.0, 4.0, 99.0],
                  "l_discount": [0.0] * 4}).to_parquet(
        tmp_path / "lineitem.parquet")
    for lim in (2_000_000, 0):
        df = product_type_profit(str(tmp_path), name_contains="red",
                                 broadcast_limit=lim)
        assert df.values.tolist() == [["NA", 1996, 1000],
                                      ["NA", 1997, 400],
                                      ["NB", 1996, 2000]]


def test_forecast_revenue_planted(ray_session, tmp_path):
    # TPC-H Q6: planted case pins the inclusive pct band, the exclusive
    # qty bound, and the date window half-open interval
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import forecast_revenue

    sf = "/root/testdata/sf0.001"
    live = forecast_revenue(sf)
    assert len(live) > 0
    assert list(live.columns) == ["discount_pct", "revenue_cents",
                                  "n_lines"]

    us = pa.timestamp("us")
    d_in = pd.Timestamp("1996-06-01").to_pydatetime()
    d_out = pd.Timestamp("1997-01-01").to_pydatetime()  # = hi, excluded
    pq.write_table(pa.table({
        "l_shipdate": pa.array([d_in] * 5 + [d_out], type=us),
        # pct 4 (lo bound, in), 6 (hi bound, in), 7 (out), 5 with qty at
        # the exclusive bound (out), 5 in, then a date-excluded 5
        "l_discount": [0.04, 0.06, 0.07, 0.05, 0.05, 0.05],
        "l_quantity": [10.0, 10.0, 10.0, 24.0, 23.0, 10.0],
        "l_extendedprice": [100.0, 200.0, 999.0, 999.0, 40.0, 999.0]}),
        str(tmp_path / "lineitem.parquet"))
    df = forecast_revenue(str(tmp_path))
    # pct4: 100*0.04 = 4.00 → 400c; pct5: 40*0.05 = 2.00 → 200c;
    # pct6: 200*0.06 = 12.00 → 1200c
    assert df.values.tolist() == [[4, 400, 1], [5, 200, 1], [6, 1200, 1]]


def test_best_supplier_per_part_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q2 shape (adapted): tier equality at sf0.001; planted case
    # pins the argmax tie-break (min suppkey), the region filter, and
    # pair dedup through the supply relation
    import pandas as pd

    from pdf_parser_ray.pipelines.relational import best_supplier_per_part

    sf = "/root/testdata/sf0.001"
    fast = best_supplier_per_part(sf)
    slow = best_supplier_per_part(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist() and len(fast) > 0

    pd.DataFrame({"r_regionkey": [0, 1],
                  "r_name": ["R_IN", "R_OUT"]}).to_parquet(
        tmp_path / "region.parquet")
    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["NA", "NB"],
                  "n_regionkey": [0, 1]}).to_parquet(
        tmp_path / "nation.parquet")
    # s1/s2 in-region with EQUAL acctbal (tie → s1); s3 out-of-region
    # with the highest acctbal (must not win); s4 in-region lower
    pd.DataFrame({"s_suppkey": [1, 2, 3, 4],
                  "s_name": ["SA", "SB", "SC", "SD"],
                  "s_nationkey": [0, 0, 1, 0],
                  "s_acctbal": [50.0, 50.0, 99.0, 10.0]}).to_parquet(
        tmp_path / "supplier.parquet")
    pd.DataFrame({"p_partkey": [1, 2, 3],
                  "p_size": [7, 7, 8]}).to_parquet(
        tmp_path / "part.parquet")
    # part1 shipped by s1 (twice: dedup), s2, s3; part2 by s4 only;
    # part3 wrong size
    pd.DataFrame({"l_partkey": [1, 1, 1, 1, 2, 3],
                  "l_suppkey": [1, 1, 2, 3, 4, 1]}).to_parquet(
        tmp_path / "lineitem.parquet")
    for lim in (2_000_000, 0):
        df = best_supplier_per_part(str(tmp_path), size=7, region="R_IN",
                                    broadcast_limit=lim)
        assert df.values.tolist() == [[1, 1, "SA", "NA", 5000],
                                      [2, 4, "SD", "NA", 1000]]


def test_waiting_suppliers_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q21 shape (adapted): tier equality at sf0.001; planted case
    # pins the sole-late verdict, the >=2-supplier requirement, the
    # any-line-late pair semantics, and the winner-only nation filter
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import waiting_suppliers

    sf = "/root/testdata/sf0.001"
    fast = waiting_suppliers(sf)
    slow = waiting_suppliers(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist()

    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["N_TGT", "N_OTH"]}).to_parquet(
        tmp_path / "nation.parquet")
    pd.DataFrame({"s_suppkey": [1, 2, 3],
                  "s_name": ["SA", "SB", "SC"],
                  "s_nationkey": [0, 0, 1]}).to_parquet(
        tmp_path / "supplier.parquet")
    us = pa.timestamp("us")
    base = pd.Timestamp("1996-01-01")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_orderdate": pa.array([base.to_pydatetime()] * 4, type=us)}),
        str(tmp_path / "orders.parquet"))
    ok = (base + pd.Timedelta(days=5)).to_pydatetime()
    late = (base + pd.Timedelta(days=11)).to_pydatetime()
    # o1: s1 has an on-time AND a late line (pair late), s2 on time →
    #   s1 sole late on a 2-supplier order → counts
    # o2: s1 late, s2 late → two late suppliers → nobody counts
    # o3: s1 late alone on a 1-supplier order → fails ns>=2
    # o4: s3 sole late (2 suppliers) but s3 is out-of-nation → filtered
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 4, 4], type=pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 1, 2, 1, 3, 1], type=pa.int64()),
        "l_shipdate": pa.array([ok, late, ok, late, late, late, late, ok],
                               type=us)}),
        str(tmp_path / "lineitem.parquet"))
    for lim in (2_000_000, 0):
        df = waiting_suppliers(str(tmp_path), nation="N_TGT", lag_days=10,
                               broadcast_limit=lim)
        assert df.values.tolist() == [[1, "SA", 1]]


def test_part_promotion_suppliers_tiers_and_planted(ray_session, tmp_path):
    # TPC-H Q20 shape (adapted): tier equality at sf0.001; planted case
    # pins the PER-PART threshold (sums must not pool across parts),
    # the strict >, the prefix match, and the window
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_ray.pipelines.relational import part_promotion_suppliers

    sf = "/root/testdata/sf0.001"
    fast = part_promotion_suppliers(sf)
    slow = part_promotion_suppliers(sf, broadcast_limit=0)
    assert fast.values.tolist() == slow.values.tolist()

    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["N_TGT", "N_OTH"]}).to_parquet(
        tmp_path / "nation.parquet")
    pd.DataFrame({"s_suppkey": [1, 2, 3, 4],
                  "s_name": ["SA", "SB", "SC", "SD"],
                  "s_nationkey": [0, 0, 0, 1]}).to_parquet(
        tmp_path / "supplier.parquet")
    # 'smallish bolt' matches prefix 'small'; 'big small' does NOT
    pd.DataFrame({"p_partkey": [1, 2, 3],
                  "p_name": ["small ring", "smallish bolt", "big small"],
                  }).to_parquet(tmp_path / "part.parquet")
    us = pa.timestamp("us")
    d_in = pd.Timestamp("1996-06-01").to_pydatetime()
    d_out = pd.Timestamp("1997-06-01").to_pydatetime()
    pq.write_table(pa.table({
        # s1: 30+31=61 of part1 → qualifies (61 > 50 on ONE part)
        # s2: 40 of part1 + 40 of part2 → 80 pooled but ≤50 per part
        # s3: 60 of part1 but out of window
        # s4: 70 of part2 (qualifies) but wrong nation
        "l_partkey": pa.array([1, 1, 1, 2, 1, 2], type=pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 2, 3, 4], type=pa.int64()),
        "l_quantity": [30.0, 31.0, 40.0, 40.0, 60.0, 70.0],
        "l_shipdate": pa.array([d_in, d_in, d_in, d_in, d_out, d_in],
                               type=us)}),
        str(tmp_path / "lineitem.parquet"))
    for lim in (2_000_000, 0):
        df = part_promotion_suppliers(str(tmp_path), name_prefix="small",
                                      nation="N_TGT", min_qty=50,
                                      broadcast_limit=lim)
        assert df.values.tolist() == [[1, "SA"]]


class TestZOrder:
    def test_spread_reference(self):
        import numpy as np

        from pdf_parser_ray.pipelines.relational import zorder_key_u32

        def slow_interleave(x, y):
            out = 0
            for b in range(16):
                out |= ((x >> b) & 1) << (2 * b)
                out |= ((y >> b) & 1) << (2 * b + 1)
            return out

        rng = np.random.default_rng(3)
        xs = rng.integers(0, 1 << 16, 200).astype(np.uint64)
        ys = rng.integers(0, 1 << 16, 200).astype(np.uint64)
        got = zorder_key_u32(xs, ys)
        want = [slow_interleave(int(x), int(y)) for x, y in zip(xs, ys)]
        assert got.tolist() == want

    def test_locality(self):
        # neighbouring 2-D points share the high z-key bits (tile) far more
        # often than distant points — the layout-pruning property
        import numpy as np

        from pdf_parser_ray.pipelines.relational import zorder_key_u32

        base = zorder_key_u32(np.array([1000], dtype=np.uint64),
                              np.array([2000], dtype=np.uint64))[0]
        near = zorder_key_u32(np.array([1001], dtype=np.uint64),
                              np.array([2001], dtype=np.uint64))[0]
        far = zorder_key_u32(np.array([60000], dtype=np.uint64),
                             np.array([60000], dtype=np.uint64))[0]
        assert (base >> 20) == (near >> 20)
        assert (base >> 28) != (far >> 28)


class TestEventAnomalies:
    def test_planted_spike(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import event_anomalies

        # user 1: hours 0..19 have 2 events each, hour 20 has 30 — a z>3
        # spike needs enough flat hours since the spike inflates sigma
        # itself (a single outlier's z^2 is bounded by n-1);
        # user 2: flat (never flagged); user 3: only 2 hours (< min_hours)
        rows_u, rows_t = [], []
        hour_us = 3_600_000_000
        for h in range(20):
            rows_u += [1, 1]
            rows_t += [h * hour_us, h * hour_us + 1]
        rows_u += [1] * 30
        rows_t += [20 * hour_us + i for i in range(30)]
        for h in range(6):
            rows_u.append(2)
            rows_t.append(h * hour_us)
        rows_u += [3, 3]
        rows_t += [0, hour_us]
        pq.write_table(pa.table({
            "user_id": pa.array(rows_u, type=pa.int64()),
            "ts": pa.array(rows_t, type=pa.timestamp("us"))}),
            str(tmp_path / "events.parquet"))
        df = event_anomalies(str(tmp_path)).to_pandas()
        assert df.values.tolist() == [[1, 20, 30]]


class TestEventThrottle:
    def test_planted_debounce(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import event_throttle

        hour_us = 3_600_000_000
        # user 1 / click / hour 0: three events → first (id 11) kept, 2
        # suppressed; user 1 / view / hour 0: one event; user 2 / click /
        # hour 1: tie on ts → lower event_id wins
        pq.write_table(pa.table({
            "user_id": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
            "event_type": ["click", "click", "click", "view",
                           "click", "click"],
            "ts": pa.array([5, 9, 2, 7, hour_us + 4, hour_us + 4],
                           type=pa.timestamp("us")),
            "event_id": pa.array([12, 13, 11, 14, 22, 21],
                                 type=pa.int64())}),
            str(tmp_path / "events.parquet"))
        df = (event_throttle(str(tmp_path)).to_pandas()
              .sort_values(["user_id", "event_type", "hour"])
              .reset_index(drop=True))
        assert df.values.tolist() == [
            [1, "click", 0, 11, 2],
            [1, "view", 0, 14, 0],
            [2, "click", 1, 21, 1],
        ]


class TestOrderSkyline:
    def test_kernel_vs_bruteforce(self):
        import numpy as np

        from pdf_parser_ray.pipelines.relational import skyline2d_max

        rng = np.random.default_rng(11)
        for _ in range(150):
            n = int(rng.integers(1, 50))
            a = rng.integers(0, 5, n).astype(float)  # dense ties
            b = rng.integers(0, 5, n).astype(np.int64)
            got = skyline2d_max(a, b)
            want = np.ones(n, dtype=bool)
            for i in range(n):
                for j in range(n):
                    if (a[j] >= a[i] and b[j] >= b[i]
                            and (a[j] > a[i] or b[j] > b[i])):
                        want[i] = False
                        break
            assert (got == want).all()

    def test_local_prune_is_lossless(self, ray_session, tmp_path):
        """Splitting the table into many tiny blocks (forcing heavy local
        pruning) must not change the frontier — dominance transitivity in
        practice, not just in the docstring."""
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import order_skyline

        src = pq.read_table(SF_DIR + "/orders.parquet")
        out = tmp_path / "orders.parquet"
        out.mkdir()
        step = max(1, len(src) // 37)
        for i, lo in enumerate(range(0, len(src), step)):
            pq.write_table(src.slice(lo, step), str(out / f"p{i:03d}.parquet"))
        whole = (order_skyline(SF_DIR).to_pandas()
                 .sort_values(["o_orderpriority", "o_orderkey"],
                              ignore_index=True))
        shredded = (order_skyline(str(tmp_path)).to_pandas()
                    .sort_values(["o_orderpriority", "o_orderkey"],
                                 ignore_index=True))
        pd.testing.assert_frame_equal(whole, shredded)

    def test_planted_frontier(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import order_skyline

        day_us = 86_400_000_000
        # group U: (100, d0) dominated by (200, d1); (200, d1) and
        # (150, d2) incomparable; exact duplicate of the (200, d1) point
        # also survives. group V: single row survives trivially.
        pq.write_table(pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "o_orderpriority": ["U", "U", "U", "U", "V"],
            "o_totalprice": [100.0, 200.0, 150.0, 200.0, 1.0],
            "o_orderdate": pa.array([0, day_us, 2 * day_us, day_us, 0],
                                    type=pa.timestamp("us"))}),
            str(tmp_path / "orders.parquet"))
        df = (order_skyline(str(tmp_path)).to_pandas()
              .sort_values("o_orderkey").reset_index(drop=True))
        assert df["o_orderkey"].tolist() == [2, 3, 4, 5]


class TestCustomerOrderTrend:
    def test_planted_slopes(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import customer_order_trend

        day_us = 86_400_000_000
        # cust 1: (day 0, $1), (day 1, $2), (day 2, $3) → slope 100¢/day
        #   num=600, den=6; cust 2: single order → dropped;
        # cust 3: two same-day orders → den=0 → dropped
        pq.write_table(pa.table({
            "o_custkey": pa.array([1, 1, 1, 2, 3, 3], type=pa.int64()),
            "o_totalprice": [1.0, 2.0, 3.0, 9.0, 5.0, 7.0],
            "o_orderdate": pa.array(
                [0, day_us, 2 * day_us, 0, 5 * day_us, 5 * day_us],
                type=pa.timestamp("us"))}),
            str(tmp_path / "orders.parquet"))
        df = customer_order_trend(str(tmp_path)).to_pandas()
        assert df.values.tolist() == [[1, 3, 600, 6]]


class TestUserActivityCoverage:
    def test_planted_islands(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import user_activity_coverage

        m = 60_000_000  # one minute in µs
        # span = 15 min. user 1: events at 0, 10m (overlap → one island
        # 0..25m), 60m (second island 60..75m) → 2 islands, 40m covered.
        # user 2: events at 0 and EXACTLY 15m — touching intervals merge
        # (closed-open abutment) → 1 island, 30m.
        pq.write_table(pa.table({
            "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "ts": pa.array([0, 10 * m, 60 * m, 0, 15 * m],
                           type=pa.timestamp("us"))}),
            str(tmp_path / "events.parquet"))
        df = (user_activity_coverage(str(tmp_path)).to_pandas()
              .sort_values("user_id").reset_index(drop=True))
        assert df.values.tolist() == [[1, 2, 40 * m], [2, 1, 30 * m]]


class TestEventTypeAffinity:
    def test_planted_baskets(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.relational import event_type_affinity

        # user 1: {a,b,c} → ab, ac, bc; user 2: {a,b} (b twice — distinct
        # per user) → ab; user 3: {c} alone → nothing
        pq.write_table(pa.table({
            "user_id": pa.array([1, 1, 1, 2, 2, 2, 3], type=pa.int64()),
            "event_type": ["a", "b", "c", "a", "b", "b", "c"]}),
            str(tmp_path / "events.parquet"))
        df = (event_type_affinity(str(tmp_path)).to_pandas()
              .sort_values(["type_a", "type_b"]).reset_index(drop=True))
        assert df.values.tolist() == [
            ["a", "b", 2], ["a", "c", 1], ["b", "c", 1]]
