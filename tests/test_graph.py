"""Integer-exact PageRank (stages/graph.py): Ray loop == unrolled-SQL
oracle == literal python replay; dangling/sink semantics; partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _replay(edges, iters=10):
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, vs in out.items():
            c = pr[u] // len(vs)
            for v in vs:
                s[v] += c
        pr = {n: 150_000 + (850 * s[n]) // 1000 for n in nodes}
    return pr


EDGES = [(2, 1), (3, 1), (4, 1), (1, 2), (3, 2), (2, 4)]


class TestPagerank:
    def test_matches_replay_and_sql(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.graph import pagerank, pagerank_sql

        ds = ray.data.from_items([{"src": a, "dst": b} for a, b in EDGES])
        got = pagerank(ds, iters=10).to_pandas().sort_values(
            "node", ignore_index=True)
        assert got.set_index("node")["rank_micro"].to_dict() == _replay(EDGES)
        con = duckdb.connect()
        con.register("E", pd.DataFrame(EDGES, columns=["src", "dst"]))
        exp = con.execute(pagerank_sql(
            "SELECT DISTINCT src, dst FROM E")).fetchdf().sort_values(
            "node", ignore_index=True)
        pd.testing.assert_frame_equal(got, exp[got.columns],
                                      check_dtype=False)
        # structure: hub (node 1, 3 in-edges) outranks everything; a node
        # with no in-edges sits at the damping floor
        r = got.set_index("node")["rank_micro"]
        assert r[1] == r.max() and r[3] == 150_000

    def test_partition_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.graph import pagerank

        rng = np.random.default_rng(11)
        edges = {(int(a), int(b)) for a, b in
                 rng.integers(0, 40, size=(300, 2)) if a != b}
        rows = [{"src": a, "dst": b} for a, b in sorted(edges)]
        a = pagerank(ray.data.from_items(rows), iters=6).to_pandas()
        b = pagerank(ray.data.from_items(rows).repartition(9),
                     iters=6).to_pandas()
        key = lambda df: df.sort_values("node", ignore_index=True)
        pd.testing.assert_frame_equal(key(a), key(b))
        assert key(a).set_index("node")["rank_micro"].to_dict() == \
            _replay(sorted(edges), iters=6)

    def test_query_oracle_matched_scale(self, ray_session):
        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        got = entry._q_pagerank(sf).to_pandas().sort_values(
            "node", ignore_index=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        from pdf_parser_ray.stages.graph import pagerank_sql
        exp = con.execute(pagerank_sql(
            entry._PAGERANK_EDGES_SQL)).fetchdf().sort_values(
            "node", ignore_index=True)
        pd.testing.assert_frame_equal(got, exp[got.columns],
                                      check_dtype=False)


# ---------------------------------------------------------------------------
# triangle_count (ordered-wedge enumeration)
# ---------------------------------------------------------------------------


def _tri(pairs):
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.graph import triangle_count

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([a for a, _ in pairs], type=pa.int64()),
        "dup_of": pa.array([b for _, b in pairs], type=pa.int64())}))
    return sorted((r["a"], r["b"], r["c"])
                  for r in triangle_count(ds).take_all())


def test_triangle_k4_and_square(ray_session):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert _tri(k4) == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]
    square = [(1, 2), (2, 3), (3, 4), (4, 1)]   # cycle, no chord
    assert _tri(square) == []


def test_triangle_dedup_and_degenerate_edges(ray_session):
    # reversed duplicates, repeated edges, and self-loops collapse/drop
    noisy = [(2, 1), (1, 2), (3, 1), (2, 3), (3, 2), (1, 1)]
    assert _tri(noisy) == [(1, 2, 3)]
    assert _tri([(5, 5)]) == []
