"""Distributed cardinality sketches.

KMV (k-minimum-values) approximate-distinct: hash every value to a uniform
uint64, keep only the k smallest DISTINCT hashes, and estimate the global
cardinality from the k-th smallest — ``(k-1) * 2^64 // h_k`` (Bar-Yossef et
al. 2002, "Counting distinct elements in a data stream"). Unlike HLL the
whole sketch state is an explicit ordered set of hashes, which makes it
bit-replayable in SQL (a ``row_number() OVER (ORDER BY h) <= k`` window).

Scale shape: each input block independently reduces to ≤ k rows (one uint64
per kept hash), so the exchange moving to the single merge task is
``k × n_blocks`` rows regardless of input size — 100 TB of values becomes a
few MB of partials. The merge is the house zero-sort coalesce
(``repartition(1)`` split/merge + one vectorized kernel, no key exchange;
see pipelines/relational.py:coarse_partition_apply for the rationale).

The reference engine has no sketch counterpart (its dedup is an exact
sha256 key — src/pdf_parser/processors/pdf_processor.py:65); this is one of
the large-corpus additions the engine needs at 10^12-document scale, where
an exact distinct over a groupby shuffle is an all-to-all exchange but a
KMV union is a constant-size reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import md5_u64

_TWO64 = 1 << 64


def _k_smallest_distinct(hashes: np.ndarray, k: int) -> np.ndarray:
    """The ≤ k smallest distinct values of a uint64 array, ascending."""
    uniq = np.unique(hashes)  # sorted ascending, distinct
    return uniq[:k]


def kmv_estimate(kept: np.ndarray, k: int) -> int:
    """Cardinality estimate from a merged KMV sketch.

    If fewer than k distinct hashes exist the sketch IS the distinct set
    (exact count); otherwise the classic unbiased estimator
    ``(k-1) * 2^64 // h_k`` with h_k the k-th smallest hash, computed in
    exact big-int arithmetic so a DuckDB HUGEINT replay matches bit-for-bit.
    """
    n_kept = len(kept)
    if n_kept < k:
        return n_kept
    return (k - 1) * _TWO64 // int(kept[-1])


def kmv_distinct(ds, col: str, *, k: int = 256,
                 intermediate_parts: int | None = None):
    """Approximate COUNT(DISTINCT col) via a distributed KMV sketch.

    Returns a one-row Dataset ``(k, n_kept, kth_min, estimate)``:
    ``kth_min`` is the largest kept hash (uint64), ``estimate`` the
    cardinality estimate (exact when the true cardinality is below k).
    Standard error ≈ 1/sqrt(k-2) — k=256 gives ~6 %.

    The final merge task sees ``k × n_blocks`` uint64 rows. That is fine
    up to ~10^5 blocks (k=256 → 200 MB); for a 100-TB input (~10^6
    128-MB blocks) set ``intermediate_parts`` (e.g. 64) to insert a tree
    level — sketch union is associative, so each intermediate partition
    re-reduces to ≤ k rows and the final task sees ``k × parts`` instead.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        hs = md5_u64([v for v in vals if v is not None])
        if len(hs) == 0:
            return pa.table({"h": pa.array([], type=pa.uint64())})
        return pa.table({"h": pa.array(_k_smallest_distinct(hs, k),
                                       type=pa.uint64())})

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        kept = _k_smallest_distinct(
            part["h"].to_numpy(dtype=np.uint64), k)
        n_kept = len(kept)
        kth = int(kept[-1]) if n_kept else 0
        return pd.DataFrame({
            "k": pd.array([k], dtype="int64"),
            "n_kept": pd.array([n_kept], dtype="int64"),
            "kth_min": pd.array([kth], dtype="uint64"),
            "estimate": pd.array([kmv_estimate(kept, k)], dtype="int64"),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if intermediate_parts:
        def re_reduce(part: pd.DataFrame) -> pd.DataFrame:
            kept = _k_smallest_distinct(
                part["h"].to_numpy(dtype=np.uint64), k)
            return pd.DataFrame({"h": pd.array(kept, dtype="uint64")})

        partials = partials.repartition(intermediate_parts).map_batches(
            re_reduce, batch_format="pandas", batch_size=None)
    # partials are ≤ k rows per input block — tiny; coalesce without a key
    # exchange and reduce once (same shape as relational.topk merge).
    return partials.repartition(1).map_batches(merge, batch_format="pandas",
                                               batch_size=None)


def kmv_distinct_by(ds, col: str, *, group_col: str, k: int = 256,
                    num_parts: int = 64, nrows: int | None = None):
    """Per-group approximate COUNT(DISTINCT col): one KMV sketch per group.

    The point at scale: COUNT(DISTINCT x) GROUP BY g normally shuffles
    every (g, x) pair; here each block reduces to ≤ k hashes PER GROUP
    SEEN IN THAT BLOCK, so the exchange carries ``k × groups-per-block``
    uint64 rows — independent of row count. Sketches merge per group
    (KMV union = k smallest of the union) with the house coarse-partition
    kernel. Output: (group_col, k, n_kept, kth_min, estimate).

    Null VALUES are skipped (as in the SQL replay); null GROUP keys are a
    real group (pandas ``dropna=False`` — matches SQL GROUP BY NULL).
    """
    from ..pipelines.relational import coarse_partition_apply

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        # Hash from the ARROW column: a pandas round-trip would turn an
        # int64-with-nulls column into float64 and hash '7.0' != md5('7')
        vals = batch.column(col).to_pylist()
        mask = np.array([v is not None for v in vals], dtype=bool)
        hs = md5_u64([v for v, m in zip(vals, mask) if m])
        g = pd.DataFrame({group_col: np.asarray(
                              batch.column(group_col).to_pylist(),
                              dtype=object)[mask],
                          "h": pd.array(hs, dtype="uint64")})
        kept = (g.drop_duplicates()
                 .sort_values("h", kind="mergesort")
                 .groupby(group_col, sort=False, dropna=False).head(k))
        return pa.Table.from_pandas(kept, preserve_index=False,
                                    schema=pa.schema([
                                        (group_col, batch.schema.field(
                                            group_col).type),
                                        ("h", pa.uint64())]))

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in part.groupby(group_col, sort=False, dropna=False):
            kept = _k_smallest_distinct(
                sub["h"].to_numpy(dtype=np.uint64), k)
            rows.append((g, len(kept), int(kept[-1]) if len(kept) else 0,
                         kmv_estimate(kept, k)))
        out = pd.DataFrame(rows, columns=[group_col, "n_kept", "kth_min",
                                          "estimate"])
        out.insert(1, "k", k)
        for c, dt in (("k", "int64"), ("n_kept", "int64"),
                      ("kth_min", "uint64"), ("estimate", "int64")):
            out[c] = out[c].astype(dt)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # partials are ≤ k rows per group per block — a group-keyed merge over
    # slim uint64 rows; the value column itself never enters the exchange.
    # nrows (the INPUT row count, free from parquet footers) is a sound
    # upper bound on the partial row count, so the coalesce gate applies.
    return coarse_partition_apply(partials, merge, key_col=group_col,
                                  part_col="kmv_part", num_parts=num_parts,
                                  nrows=nrows)


def kmv_distinct_by_sql(table: str, col: str, *, group_col: str,
                        k: int = 256) -> str:
    """DuckDB replay of :func:`kmv_distinct_by` — the keep-k window runs
    PARTITION BY group, estimator identical to the global sketch."""
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col},
         CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 16))
              AS UBIGINT) AS h
  FROM {table} WHERE {col} IS NOT NULL),
kept AS (
  SELECT {group_col}, h FROM (
    SELECT {group_col}, h,
           row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS r
    FROM h)
  WHERE r <= {k})
SELECT {group_col},
       CAST({k} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(max(h) AS UBIGINT) AS kth_min,
       CAST(CASE WHEN count(*) < {k} THEN CAST(count(*) AS HUGEINT)
                 ELSE CAST({k - 1} AS HUGEINT)
                      * CAST('18446744073709551616' AS HUGEINT)
                      // CAST(max(h) AS HUGEINT)
            END AS BIGINT) AS estimate
FROM kept GROUP BY {group_col}
"""


def kmv_distinct_sql(table: str, col: str, *, k: int = 256) -> str:
    """DuckDB replay of :func:`kmv_distinct` over ``table.col`` — same
    hash rule (md5 first-16-hex as UBIGINT), same keep-k window, same
    exact-integer estimator (HUGEINT ``//``)."""
    return f"""
WITH h AS (
  SELECT DISTINCT CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 16))
                       AS UBIGINT) AS h
  FROM {table} WHERE {col} IS NOT NULL),
kept AS (
  SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM h)
  WHERE r <= {k})
SELECT CAST({k} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(coalesce(max(h), 0) AS UBIGINT) AS kth_min,
       CAST(CASE WHEN count(*) < {k} THEN CAST(count(*) AS HUGEINT)
                 ELSE CAST({k - 1} AS HUGEINT)
                      * CAST('18446744073709551616' AS HUGEINT)
                      // CAST(max(h) AS HUGEINT)
            END AS BIGINT) AS estimate
FROM kept
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# estimation. Each block reduces to ONE constant-size (d × w) int64 grid
# regardless of input size; grids add associatively, so 100 TB of tokens
# becomes n_blocks tiny partials and the estimate is min over d hash rows
# of the queried cell — always >= the true count, never under.
# ---------------------------------------------------------------------------

def _cm_cell(row: int, gram: str, w: int) -> int:
    """Row-salted md5 bucket. SQL replay: ``CAST(concat('0x',
    substr(md5(CAST(r AS VARCHAR) || ':' || g), 1, 16)) AS UBIGINT) % w``."""
    import hashlib

    return int(hashlib.md5(f"{row}:{gram}".encode()).hexdigest()[:16], 16) % w


def count_min_term_counts(ds, terms: list[str], *, text_col: str = "text",
                          d: int = 4, w: int = 64) -> pd.DataFrame:
    """Estimated corpus frequency of each query term from ONE streaming
    pass: per-batch (d, w) count grids (np.add.at over the house-tokenizer
    stream) fold on the driver — a bounded scalar collect like
    bm25_score's idf fold, ≤ n_blocks rows of d·w ints, never the tokens.
    Exact per-term counts ride the same partials (len(terms) ints) so the
    output exhibits the sketch's one-sided error: est_count >= exact_count
    with equality unless the cell collides.

    Output (small — one row per query term): (term, est_count,
    exact_count). Deterministic for any partitioning: integer grid
    addition is associative-commutative.
    """
    from ..functions.minhash import _ASCII_WS

    terms = list(terms)
    t_idx = {t: i for i, t in enumerate(terms)}

    def partial(batch: pa.Table) -> pa.Table:
        import collections

        grid = np.zeros((d, w), dtype=np.int64)
        exact = np.zeros(len(terms), dtype=np.int64)
        # count first, hash each DISTINCT token once: tokens are Zipfian,
        # so d md5 calls per occurrence would be ~occurrences/distinct
        # times the needed work (grid addition is commutative — identical
        # output)
        cnt: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            cnt.update(t for t in _ASCII_WS.split((text or "").lower()) if t)
        for tok, c in cnt.items():
            for r in range(d):
                grid[r, _cm_cell(r, tok, w)] += c
            i = t_idx.get(tok)
            if i is not None:
                exact[i] += c
        return pa.table({
            "grid": pa.array([grid.ravel().tolist()],
                             type=pa.list_(pa.int64())),
            "exact": pa.array([exact.tolist()], type=pa.list_(pa.int64()))})

    grid = np.zeros(d * w, dtype=np.int64)
    exact = np.zeros(len(terms), dtype=np.int64)
    for part in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for g in part.column("grid").to_pylist():
            grid += np.asarray(g, dtype=np.int64)
        for e in part.column("exact").to_pylist():
            exact += np.asarray(e, dtype=np.int64)

    grid = grid.reshape(d, w)
    est = [int(min(grid[r, _cm_cell(r, t, w)] for r in range(d)))
           for t in terms]
    return pd.DataFrame({"term": terms,
                         "est_count": pd.Series(est, dtype="int64"),
                         "exact_count": pd.Series(exact, dtype="int64")})


def count_min_sql(table: str, terms: list[str], *, text_col: str = "text",
                  d: int = 4, w: int = 64) -> str:
    """Full SQL replay of :func:`count_min_term_counts`: explode tokens,
    count every (row, cell), estimate = min over rows of the queried cell
    (COALESCE 0 when the cell is empty), exact = plain token equality."""
    terms_values = ", ".join("({})".format(
        "'" + t.replace("'", "''") + "'") for t in terms)
    rows_values = ", ".join(f"({r})" for r in range(d))
    cell = ("CAST(concat('0x', substr(md5(CAST({r} AS VARCHAR) || ':' || {g}),"
            " 1, 16)) AS UBIGINT) % {w}")
    return f"""
WITH toks AS (
  SELECT list_filter(
    string_split_regex(lower({text_col}), '[ \t\n\r\f]+'), x -> x <> '') AS t
  FROM {table}),
occ AS (SELECT unnest(t) AS g FROM toks),
rows_(r) AS (VALUES {rows_values}),
terms_(term) AS (VALUES {terms_values}),
cells AS (
  SELECT r, {cell.format(r='r', g='g', w=w)} AS cell, count(*) AS c
  FROM occ CROSS JOIN rows_ GROUP BY r, cell),
est AS (
  SELECT t.term, CAST(min(COALESCE(c.c, 0)) AS BIGINT) AS est_count
  FROM terms_ t CROSS JOIN rows_ r
  LEFT JOIN cells c ON c.r = r.r
    AND c.cell = {cell.format(r='r.r', g='t.term', w=w)}
  GROUP BY t.term),
exact AS (SELECT g AS term, count(*) AS c FROM occ GROUP BY g)
SELECT t.term, e.est_count,
       CAST(COALESCE(x.c, 0) AS BIGINT) AS exact_count
FROM terms_ t JOIN est e ON e.term = t.term
LEFT JOIN exact x ON x.term = t.term
"""
