"""Iterative graph algorithms over edge Datasets.

PageRank (Brin & Page 1998, public) is the canonical web-corpus quality
signal — Common-Crawl-style pipelines rank hosts/pages by link centrality
to pick what to keep. This implementation is INTEGER-EXACT so the whole
10-iteration fixpoint replays bit-for-bit in SQL:

  pr_0[v]   = 1_000_000                      (micro fixed-point, rank 1.0)
  contrib_k[u] = pr_k[u] // outdeg[u]        (floor; dangling u emits none)
  pr_{k+1}[v]  = 150_000 + (850 * Σ_{u→v} contrib_k[u]) // 1000

Every operation is int64 floor arithmetic and the per-node Σ is an
integer sum (order-free), so any partitioning gives the identical result
and the oracle is ``iters`` unrolled plain-SQL CTEs — no float
accumulation-order caveats anywhere. The dangling-mass drop (sinks simply
don't contribute) is the documented variant; the 0.15/0.85 damping split
is the classic constant, in milli.

Distributed shape (the connected_components lessons, dedup.py):
  - edges materialize ONCE, repartitioned to a width chosen from the
    measured edge count (``choose_partitions``);
  - each round is: hash-join ranks onto edges by src (slim (node, v)
    rows — never payload), one coarse-partition group-sum of
    contributions by dst, a left fill against the node set, then
    repartition + materialize so block counts don't compound round over
    round (unmaterialized: 1 s → 112 s/round measured on CC).
"""

from __future__ import annotations

import pandas as pd

_MICRO = 1_000_000
_BASE_MICRO = 150_000   # (1 - damping) * 1e6 with damping = 0.85
_DAMPING_MILLI = 850


def pagerank(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 10, nrows: int | None = None):
    """Integer-exact PageRank over a directed edge Dataset → Dataset of
    (node, rank_micro) after exactly ``iters`` rounds. Duplicate edges
    are NOT collapsed here — pass a distinct edge set (the SQL oracle
    contract); parallel edges would double-count contributions.
    """
    from ..pipelines.relational import (choose_partitions, hash_join,
                                        partitioned_group_sum)

    edges = edges_ds.materialize()
    n_edges = nrows if nrows is not None else edges.count()
    # lo=1: below one block's worth of edges the whole loop runs single-
    # block — a 2-range sort over a 2-value bucket key lands BOTH values
    # in one range whenever the sampled median hits the min, leaving the
    # other range an empty schemaless block (10 iterations × 3 joins of
    # warning noise at test scale); one block → one range → never empty
    width = choose_partitions(n_edges, default=8, lo=1, hi=256)
    edges = edges.repartition(width).materialize()

    # node set + out-degrees: slim (node, d) rows via the house group-sum
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(src_col, as_index=False).agg(d=(dst_col, "size"))
        return g.rename(columns={src_col: "node"})

    outdeg = partitioned_group_sum(
        edges.map_batches(deg_partial, batch_format="pandas"),
        key="node", sum_cols={"d": "d"}, num_parts=width,
        nrows=n_edges).materialize()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.unique(pd.concat([df[src_col], df[dst_col]],
                                        ignore_index=True))})

    def node_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])[["node"]]

    from ..pipelines.relational import coarse_partition_apply

    nodes = coarse_partition_apply(
        edges.map_batches(node_partial, batch_format="pandas"), node_dedup,
        key_col="node", part_col="pr_part", num_parts=width,
        nrows=n_edges * 2).repartition(width).materialize()

    # schema types for the per-round joins (Dataset.schema() on these
    # materialized slim tables is metadata-only). _arrow_type: pandas
    # blocks report numpy dtypes (object for strings) — hash_join's
    # typed-null fill needs real Arrow types
    from ..pipelines.relational import _arrow_type

    ntype = _arrow_type(
        dict(zip(nodes.schema().names, nodes.schema().types))["node"])
    import pyarrow as pa
    v_t, d_t = pa.int64(), pa.int64()

    # out-degree is STATIC: fold it into the rank table ONCE (dangling
    # nodes carry a null d) so each round runs 2 exchanges-with-joins
    # instead of 3 — the per-round ranks⋈outdeg join would re-ship the
    # same (node, d) pairs every iteration
    nodes_d = hash_join(nodes, outdeg, key="node", how="left",
                        num_buckets=width,
                        left_types={"node": ntype},
                        right_types={"node": ntype, "d": d_t},
                        coalesce_blocks=width).materialize()

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "v": pd.Series([_MICRO] * len(df),
                                            dtype="int64"),
                             "d": df["d"]})

    ranks = nodes_d.map_batches(init_rank,
                                batch_format="pandas").materialize()

    for _ in range(iters):
        # contrib[u] = v // d, computed in place (d rides with the rank)
        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            df = df.loc[df["d"].notna()]
            d = df["d"].astype("int64")
            return pd.DataFrame({src_col: df["node"],
                                 "c": (df["v"] // d).astype("int64")})

        je = hash_join(edges,
                       ranks.map_batches(contrib, batch_format="pandas"),
                       key=src_col, num_buckets=width,
                       left_types={src_col: ntype, dst_col: ntype},
                       right_types={src_col: ntype, "c": v_t},
                       coalesce_blocks=width)

        def to_dst(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df[dst_col],
                                 "c": df["c"].astype("int64")})

        sums = partitioned_group_sum(
            je.map_batches(to_dst, batch_format="pandas"),
            key="node", sum_cols={"c": "c"}, num_parts=width,
            nrows=n_edges)
        filled = hash_join(nodes_d, sums, key="node", how="left",
                           num_buckets=width,
                           left_types={"node": ntype, "d": d_t},
                           right_types={"node": ntype, "c": v_t},
                           coalesce_blocks=width)

        def step(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].fillna(0).astype("int64")
            return pd.DataFrame({
                "node": df["node"],
                "v": (_BASE_MICRO
                      + (_DAMPING_MILLI * c) // 1000).astype("int64"),
                "d": df["d"]})

        ranks = filled.map_batches(step, batch_format="pandas").repartition(
            width).materialize()

    return ranks.map_batches(
        lambda df: df[["node", "v"]].rename(columns={"v": "rank_micro"}),
        batch_format="pandas")


def pagerank_sql(edges_sql: str, *, iters: int = 10) -> str:
    """The full :func:`pagerank` fixpoint as ``iters`` unrolled CTEs over
    ``edges_sql`` (a query producing DISTINCT (src, dst)). All-integer
    floor arithmetic — bit-identical to the Ray loop on any engine."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst AS node FROM edges)",
        "outdeg AS (SELECT src AS node, count(*) AS d "
        "FROM edges GROUP BY src)",
        f"pr0 AS (SELECT node, CAST({_MICRO} AS BIGINT) AS v FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"pr{k} AS (SELECT n.node, CAST({_BASE_MICRO} + "
            f"({_DAMPING_MILLI} * COALESCE(c.s, 0)) // 1000 AS BIGINT) AS v "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(p.v // o.d) AS s "
            f"FROM pr{k - 1} p JOIN outdeg o ON o.node = p.node "
            f"JOIN edges e ON e.src = p.node GROUP BY e.dst"
            f") c ON c.node = n.node)")
    return (", ".join(parts)
            + f" SELECT node, v AS rank_micro FROM pr{iters}")


def triangle_count(edges_ds, *, a_col: str = "doc_id", b_col: str = "dup_of",
                   nrows: int | None = None):
    """Distributed triangle enumeration over an undirected edge set — the
    classic graph clustering-signal (and the standard distributed-graph
    benchmark): emit one row (a, b, c), a < b < c, per triangle.

    The ordered-wedge shape (public algorithm family, cf. node-iterator
    with vertex ordering): canonicalize every edge to (min, max) and
    de-dup; join E with itself on the middle vertex — because BOTH sides
    are low-to-high ordered, each wedge (a < b < c) materializes exactly
    once; close the wedge with one more join against E on the (a, c)
    pair. Every exchange ships slim id pairs/triples, never payload; the
    wedge set is Σ deg(v)² — the algorithm's inherent cost — so hub
    vertices dominate, which the ordering halves but cannot remove
    (split hot vertices upstream if a social-scale graph ever lands
    here; duplicate-cluster graphs are shallow and near-linear).

    Integer ids only (the repo's dup graphs). All joins SQL-replayable.
    """
    import pyarrow as pa

    from ..pipelines.relational import (choose_partitions,
                                        coarse_partition_apply, hash_join)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[[a_col, b_col]].min(axis=1).astype("int64")
        b = df[[a_col, b_col]].max(axis=1).astype("int64")
        out = pd.DataFrame({"a": a, "b": b})
        out = out[out["a"] != out["b"]].drop_duplicates()
        out["ab"] = out["a"].astype(str) + ":" + out["b"].astype(str)
        return out

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["ab"])

    edges = edges_ds.map_batches(canon, batch_format="pandas").materialize()
    n_edges = nrows if nrows is not None else edges.count()
    width = choose_partitions(n_edges, default=8, lo=1, hi=256)
    e = coarse_partition_apply(edges, distinct, key_col="ab",
                               part_col="tc_part", num_parts=width,
                               nrows=n_edges).materialize()

    i64, s = pa.int64(), pa.string()
    mid = e.map_batches(
        lambda df: pd.DataFrame({"b": df["a"].astype("int64"),
                                 "c": df["b"].astype("int64")}),
        batch_format="pandas")
    wedges = hash_join(
        e.map_batches(lambda df: df[["a", "b"]], batch_format="pandas"),
        mid, key="b", num_buckets=width, coalesce_blocks=width,
        left_types={"a": i64, "b": i64},
        right_types={"b": i64, "c": i64})

    def wedge_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["a", "b", "c"]].copy()
        out["ab"] = out["a"].astype(str) + ":" + out["c"].astype(str)
        return out

    closing = e.map_batches(lambda df: df[["ab"]], batch_format="pandas")
    # no coalesce on the closure join: its left side is the WEDGE set
    # (Σ deg² — potentially far larger than the edge count the width was
    # sized from); funneling it through an edge-sized block count would
    # concentrate the quadratic exchange (hash_join's own wide-side rule)
    tri = hash_join(wedges.map_batches(wedge_key, batch_format="pandas"),
                    closing, key="ab", num_buckets=width,
                    left_types={"a": i64, "b": i64, "c": i64, "ab": s},
                    right_types={"ab": s})
    return tri.map_batches(lambda df: df[["a", "b", "c"]],
                           batch_format="pandas")
