"""Every queries() entry runs; every oracle_sql() entry matches DuckDB —
the full driver contract under `python -m pytest -x -q` (input_hint gate),
at sf0.001 for speed (the driver re-verifies at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _names():
    # subset: queries not already exercised by test_relational /
    # test_pipeline_e2e / test_dedup_similarity / test_media (running all 32
    # pipelines in the 4-CPU test session costs >10 min; the driver and
    # tools/check_oracles.py cover the full set at sf0.01)
    return [
        "distinct_flags", "corpus_prep", "customer_order_revenue",
        "customers_without_orders", "events_running_total",
        "event_type_distinct", "embedding_neardup", "validate_docs",
        "classic_fields", "events_props", "text_normalize",
        "token_percentiles", "hash_sample", "events_sliding_window",
        "dedup_semi", "customers_with_orders",
        # round-3 oracles (knn_ivf is excluded here: its oracle inlines
        # centroid literals derived at the sf0.01 gate scale)
        "fingerprint_set", "neardup_clusters",
        "ngram_jaccard", "events_asof", "events_sessions_stream",
        "corpus_prep_neardup", "events_range_join",
        # knn_lsh's oracle inlines the FIXED deterministic plane bank
        # (unlike knn_ivf's sf0.01-derived centroids), so it gates here too
        "knn_lsh",
        # round-3 curation ops (knn_pq is excluded like knn_ivf: its oracle
        # inlines codebooks trained at the sf0.01 gate scale)
        "dup_spans", "strip_dup_spans", "bm25", "contamination",
        "stratified_sample", "pack_sequences", "top_terms",
        "repetition_stats", "bigram_commonness",
        "chunk_documents", "source_mix", "corpus_curate",
        "embedding_centroids", "approx_distinct_users",
        "orders_top_per_customer", "approx_distinct_users_by_type",
        "events_value_percentiles", "customer_orders_left",
        "user_event_pivot", "pricing_rollup", "user_event_unpivot",
        "token_budget_mix", "user_event_types", "events_customers_full",
        # round-3 set-op / lag-window family
        "events_gaps", "custkeys_f_and_o", "custkeys_f_not_o",
        "nation_revenue", "orders_price_rank", "pricing_cube",
        "shuffle_shards", "events_moving_range", "events_median_cont",
        "doc_ntile", "table_profile", "orders_price_dense_rank",
        "perplexity", "custkeys_f_or_o",
        # round-4 oracles
        "minhash_dedup", "embedding_neardup", "domain_cap",
        "perplexity_backoff",
        # round-4 rows-only (graph ANN; recall-gated in test_dedup_similarity)
        "knn_hnsw",
        # round-5 oracle: full BPE train+encode SQL replay (corpus-trained,
        # no inlined literals — gates at ANY scale, unlike knn_ivf/knn_pq)
        "bpe_tokens",
        # round-5 quality/mixing oracles
        "gopher_quality", "gopher_filter", "source_divergence",
        # round-5 interchange source (value-gated deterministic export)
        "csv_ingest",
        # round-5 priority sampling (IEEE-double parity oracle)
        "weighted_sample",
        # round-5 joins/mixing/audit oracles
        "local_supplier_volume", "returned_item_report", "temperature_mix",
        "fk_orphans", "volume_shipping", "promo_revenue",
        # round-5 rows-only: compressed video + checkpoint lineage
        "scene_cuts_avi", "extraction_manifest",
        # model_filter is excluded like knn_ivf/knn_pq: its oracle inlines
        # weights trained at the sf0.01 gate scale (test_classifier gates
        # the matched-scale parity)
    ]


@pytest.mark.usefixtures("ray_session")
class TestDriverContract:
    @pytest.mark.parametrize("name", _names())
    def test_query_runs_and_matches_oracle(self, entrymod, con, name):
        result = entrymod.queries()[name](SF_DIR)
        ray_df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
        assert len(ray_df.columns) > 0, "query lost its schema"
        sql = entrymod.oracle_sql().get(name)
        if sql is None:
            assert len(ray_df) >= 0  # rows-only contract
            return
        sql_df = con.execute(sql).df()
        assert len(ray_df) == len(sql_df), f"rowcount ray={len(ray_df)} sql={len(sql_df)}"
        assert sorted(ray_df.columns) == sorted(sql_df.columns)
        a = ray_df[sorted(ray_df.columns)].sort_values(
            sorted(ray_df.columns), ignore_index=True)
        b = sql_df[sorted(sql_df.columns)].sort_values(
            sorted(sql_df.columns), ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_extraction_manifest_invariants(self, entrymod):
        # the lineage/metrics table must reconcile: measured docs equal
        # footer-planned docs per partition, every partition committed,
        # and two fresh runs produce identical rows (timing dropped)
        q = entrymod.queries()["extraction_manifest"]
        df = q(SF_DIR)
        # splitting is bounded by row-group granularity: the sf0.001
        # corpus is one row group → one partition here; at the driver's
        # sf0.01 the 128 KiB budget yields 4 (verified by hand)
        assert len(df) >= 1
        assert (df["docs"] == df["n_docs_planned"]).all()
        assert (df["status"] == "committed").all()
        assert df["partition_id"].tolist() == list(range(len(df)))
        pd.testing.assert_frame_equal(df, q(SF_DIR))

    def test_every_oracle_has_a_query(self, entrymod):
        assert set(entrymod.oracle_sql()) <= set(entrymod.queries())

    def test_readme_registry_counts_match(self, entrymod):
        """README's registry counts are generated claims, not prose: both
        places that state them must equal the LIVE queries()/oracle_sql()
        registries (the r4 verdict found them drifted; this pins them)."""
        import re
        from pathlib import Path

        n_q = len(entrymod.queries())
        n_o = len(set(entrymod.oracle_sql()) & set(entrymod.queries()))
        text = Path(__file__).resolve().parents[1].joinpath(
            "README.md").read_text()
        m1 = re.search(r"(\d+) driver-contract queries cover the operator "
                       r"inventory, (\d+) of them value-gated", text)
        assert m1, "README line-22-style count sentence missing"
        assert (int(m1.group(1)), int(m1.group(2))) == (n_q, n_o)
        m2 = re.search(r"(\d+) driver queries, (\d+) DuckDB-oracle-gated",
                       text)
        assert m2, "README summary-bullet count sentence missing"
        assert (int(m2.group(1)), int(m2.group(2))) == (n_q, n_o)
        n_rows_only = n_q - n_o
        m3 = re.search(r"the (\d+) rows-only queries", text)
        assert m3 and int(m3.group(1)) == n_rows_only
