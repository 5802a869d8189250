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


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007): the industry-standard mergeable
# cardinality sketch. Each block reduces to ONE constant-size register
# vector (2^p small ints) regardless of input size; vectors merge with an
# elementwise max — idempotent, commutative, associative — so re-executed
# blocks and arbitrary merge trees cannot change the answer. Complements
# the KMV sketch above: KMV state is k hashes (k × 8 B, estimate exact in
# integer arithmetic), HLL state is 2^p ranks (256 B at p=8) with a lower
# relative error per byte (~1.04/sqrt(2^p)).
# ---------------------------------------------------------------------------

def _hll_partial(hashes: np.ndarray, p: int) -> np.ndarray:
    """Register vector (len 2^p) of max ranks for a uint64 hash batch.

    register = top ``p`` hash bits; rank = 1 + leading-zero count of the
    remaining ``64-p`` bits (all-zero suffix → rank ``64-p+1``). bit_length
    is computed by searchsorted against exact power-of-two boundaries —
    integer comparisons only, no float log2 (exact above 2^53 too).
    """
    q = 64 - p
    regs = (hashes >> np.uint64(q)).astype(np.int64)
    sfx = hashes & np.uint64((1 << q) - 1)
    pows = (np.uint64(1) << np.arange(q, dtype=np.uint64))  # 2^0 .. 2^(q-1)
    ranks = q + 1 - np.searchsorted(pows, sfx, side="right")
    out = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(out, regs, ranks)
    return out


def hll_estimate(registers: np.ndarray) -> float:
    """Raw HLL estimate ``alpha_m * m^2 / sum(2^-r)`` with the standard
    small-range (linear counting) correction. Float output — tests bound
    its relative error; the value-gated query returns the integer
    register table instead, which is exact and order-free."""
    m = len(registers)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def hll_registers(ds, col: str, *, p: int = 8) -> pd.DataFrame:
    """Distributed HyperLogLog over ``col``: one streaming pass, per-batch
    constant-size register partials (2^p int64s as a single list row),
    elementwise-max fold on the driver — a bounded scalar collect exactly
    like count_min's grid fold (≤ n_blocks rows of 2^p ints; the values
    themselves never leave their block). Nulls are skipped, matching the
    SQL replay's ``WHERE col IS NOT NULL``.

    Output (exact, deterministic for ANY partitioning): the full register
    table ``(register, max_rank)`` — 2^p rows of integers, including
    zero registers. The float estimate is a driver-side view of this
    table (:func:`hll_estimate`); gating the integer registers instead of
    the float keeps the oracle comparison exact (no cross-engine libm /
    summation-order drift).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")

    def partial(batch: pa.Table) -> pa.Table:
        vals = [v for v in batch.column(col).to_pylist() if v is not None]
        regs = (_hll_partial(md5_u64(vals), p) if vals
                else np.zeros(1 << p, dtype=np.int64))
        return pa.table({"regs": pa.array([regs.tolist()],
                                          type=pa.list_(pa.int64()))})

    merged = np.zeros(1 << p, dtype=np.int64)
    for part in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for r in part.column("regs").to_pylist():
            np.maximum(merged, np.asarray(r, dtype=np.int64), out=merged)
    return pd.DataFrame({
        "register": pd.Series(np.arange(1 << p), dtype="int64"),
        "max_rank": pd.Series(merged, dtype="int64")})


def hll_registers_sql(table: str, col: str, *, p: int = 8) -> str:
    """DuckDB replay of :func:`hll_registers`: same md5-uint64 hash rule,
    register = ``h // 2^(64-p)``, rank via ``length(bin(suffix))`` (bin()
    prints UBIGINTs unpadded, so its length IS bit_length for x > 0),
    zero registers restored by a LEFT JOIN against ``range(0, 2^p)``."""
    q = 64 - p
    two_q = 1 << q
    return f"""
WITH h AS (
  SELECT CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 16))
              AS UBIGINT) AS h
  FROM {table} WHERE {col} IS NOT NULL),
rr AS (
  SELECT CAST(h // {two_q} AS BIGINT) AS register, h % {two_q} AS sfx
  FROM h),
ranks AS (
  SELECT register,
         max(CASE WHEN sfx = 0 THEN {q + 1}
                  ELSE {q + 1} - length(bin(sfx)) END) AS max_rank
  FROM rr GROUP BY register)
SELECT g.register, CAST(COALESCE(r.max_rank, 0) AS BIGINT) AS max_rank
FROM (SELECT unnest(range(0, {1 << p})) AS register) g
LEFT JOIN ranks r ON r.register = g.register
ORDER BY g.register
"""


# ---------------------------------------------------------------------------
# Exact phi-heavy hitters with a pigeonhole prefilter (the two-pass exact
# variant of Misra-Gries / SpaceSaving): any token with global count
# >= phi * N must have local count >= phi * N_b in at least one block
# (otherwise summing the strict inequalities contradicts the global
# bound), so the union of per-block phi-heavy tokens is a guaranteed
# superset of the true heavy hitters. Pass 1 ships only that bounded
# candidate set (<= phi_den/phi_num tokens per block) plus block token
# totals; pass 2 counts ONLY the candidates exactly. The output is the
# EXACT answer — the sketch bounds the exchange, it never approximates.
# ---------------------------------------------------------------------------

def heavy_hitters(ds_factory, *, text_col: str = "text",
                  phi_num: int = 1, phi_den: int = 1000) -> pd.DataFrame:
    """All tokens whose corpus frequency is >= phi = phi_num/phi_den of the
    total token count, with their EXACT counts — deterministic for any
    partitioning (the prefilter only bounds what is shipped, the final
    threshold test uses exact global integers throughout; no floats).

    ``ds_factory`` is a zero-arg callable returning a fresh Dataset over
    the same input — the canonical two-pass stream shape (pass 1 candidate
    discovery, pass 2 candidate counting; perplexity_buckets' two-pass
    ntile has the same contract). Each pass tokenizes once; at 100 TB
    that is the textbook trade for never shuffling the token stream:
    pass-1 partials are <= phi_den/phi_num candidate strings + one int64
    per block, pass-2 partials are |candidates| ints per block, both
    driver-foldable like count_min's grids. The candidate set broadcasts
    into pass 2 as a frozenset in the closure (a few KB at phi=1/1000;
    the ray.put handle variant applies above ~10^6 candidates).

    Output: (term, cnt) sorted by cnt desc, term asc.
    """
    from ..functions.minhash import _ASCII_WS

    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be a positive rational")

    def _tokens(text: str):
        return [t for t in _ASCII_WS.split((text or "").lower()) if t]

    def pass1(batch: pa.Table) -> pa.Table:
        import collections

        cnt: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            cnt.update(_tokens(text))
        n_b = sum(cnt.values())
        cands = [t for t, c in cnt.items() if c * phi_den >= phi_num * n_b]
        return pa.table({
            "cand": pa.array([cands], type=pa.list_(pa.string())),
            "n_tokens": pa.array([n_b], type=pa.int64())})

    candidates: set = set()
    n_total = 0
    for part in (ds_factory().map_batches(pass1, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")):
        for cs in part.column("cand").to_pylist():
            candidates.update(cs)
        n_total += int(pa.compute.sum(part.column("n_tokens")).as_py() or 0)

    cand_list = sorted(candidates)
    cand_idx = {t: i for i, t in enumerate(cand_list)}

    def pass2(batch: pa.Table) -> pa.Table:
        import collections

        cnt: collections.Counter = collections.Counter()
        for text in batch.column(text_col).to_pylist():
            cnt.update(t for t in _tokens(text) if t in cand_idx)
        vec = np.zeros(len(cand_list), dtype=np.int64)
        for t, c in cnt.items():
            vec[cand_idx[t]] = c
        return pa.table({"cnts": pa.array([vec.tolist()],
                                          type=pa.list_(pa.int64()))})

    totals = np.zeros(len(cand_list), dtype=np.int64)
    if cand_list:
        for part in (ds_factory().map_batches(pass2, batch_format="pyarrow")
                     .iter_batches(batch_format="pyarrow")):
            for v in part.column("cnts").to_pylist():
                totals += np.asarray(v, dtype=np.int64)

    keep = [(t, int(c)) for t, c in zip(cand_list, totals)
            if c * phi_den >= phi_num * n_total]
    keep.sort(key=lambda tc: (-tc[1], tc[0]))
    return pd.DataFrame({
        "term": pd.Series([t for t, _ in keep], dtype="object"),
        "cnt": pd.Series([c for _, c in keep], dtype="int64")})


def heavy_hitters_sql(table: str, *, text_col: str = "text",
                      phi_num: int = 1, phi_den: int = 1000) -> str:
    """DuckDB replay of :func:`heavy_hitters` — the oracle needs no
    sketch: exact counts, same house tokenizer, same integer-rational
    threshold (``cnt * phi_den >= phi_num * N``)."""
    return f"""
WITH occ AS (
  SELECT unnest(list_filter(
    string_split_regex(lower({text_col}), '[ \t\n\r\f]+'),
    x -> x <> '')) AS g
  FROM {table}),
tot AS (SELECT count(*) AS n FROM occ),
c AS (SELECT g AS term, count(*) AS cnt FROM occ GROUP BY g)
SELECT term, CAST(cnt AS BIGINT) AS cnt FROM c, tot
WHERE cnt * {phi_den} >= {phi_num} * n
ORDER BY cnt DESC, term ASC
"""


# ---------------------------------------------------------------------------
# Fixed-bin histogram: the practical distributed quantile path. Mergeable
# sketches with provable quantile error (GK, KLL, t-digest) are
# merge-order-dependent, so their outputs are not reproducible across
# partitionings; a FIXED binning is — each block reduces to one constant-
# size int64 count vector, vectors add associatively, and any quantile is
# then bounded to one bin width. (The repo's exact-percentile queries do
# a second pass instead; this is the one-pass bounded-state alternative.)
# ---------------------------------------------------------------------------

def value_histogram(ds, col: str, *, lo: float = 0.0, width: float = 50.0,
                    n_bins: int = 16):
    """Fixed-bin histogram of a numeric column: bucket = floor((v-lo)/width)
    clamped to [-1, n_bins] (one underflow and one overflow bucket), nulls
    skipped. Per-batch partial = ONE (n_bins+2)-long int64 count vector
    (np.bincount), folded by a single zero-key coalesce merge — 100 TB of
    values becomes n_blocks tiny rows, and the result is identical for any
    partitioning (integer vector addition is associative-commutative).
    The float bin rule is one correctly-rounded IEEE divide + floor,
    identical in numpy and the SQL replay.

    Output: (bucket, n) for every bucket in [-1, n_bins], zeros included.
    """
    n_slots = n_bins + 2  # [-1 .. n_bins] shifted by +1

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / width), -1, n_bins).astype(np.int64)
        counts = np.bincount(b + 1, minlength=n_slots).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tolist()],
                                            type=pa.list_(pa.int64()))})

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        total = np.zeros(n_slots, dtype=np.int64)
        for row in part["counts"]:
            total += np.asarray(row, dtype=np.int64)
        return pd.DataFrame({
            "bucket": pd.Series(np.arange(-1, n_bins + 1), dtype="int64"),
            "n": pd.Series(total, dtype="int64")})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None))


def value_histogram_sql(table: str, col: str, *, lo: float = 0.0,
                        width: float = 50.0, n_bins: int = 16) -> str:
    """DuckDB replay of :func:`value_histogram` — same IEEE bin rule,
    zero bins restored via a range() LEFT JOIN."""
    return f"""
WITH b AS (
  SELECT CAST(least(greatest(floor(({col} - {lo!r}) / {width!r}), -1),
              {n_bins}) AS BIGINT) AS bucket
  FROM {table} WHERE {col} IS NOT NULL),
c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
SELECT g.bucket, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM (SELECT unnest(range(-1, {n_bins + 1})) AS bucket) g
LEFT JOIN c ON c.bucket = g.bucket
ORDER BY g.bucket
"""


# ---------------------------------------------------------------------------
# Key-skew profile: the diagnostic run BEFORE choosing a shuffle plan.
# groupby/sort/join cost at scale is set by the heaviest keys; this
# reports the group-size distribution as a log2 histogram — exact
# integers, bounded output (<= 64 buckets), computed with the same
# exchange a pre-aggregated groupby would use (per-batch (key, count)
# partials; values never move).
# ---------------------------------------------------------------------------

def key_skew_profile(ds, col: str, *, num_parts: int = 32,
                     nrows: int | None = None):
    """Group-size distribution of ``col`` as a log2 histogram: for each
    bucket ``gs_log2 = bit_length(group_size) - 1`` the number of
    distinct keys and total rows in groups of that size. A hot key shows
    up as a lone high bucket; a uniform key as one tight band — exactly
    the signal choose_partitions/salting decisions need. Null keys count
    as a real group (SQL GROUP BY semantics).

    Exchange shape: per-batch (key, partial_count) rows (the standard
    combiner — this is what any pre-aggregated groupby ships), then
    per-partition constant-size (bucket, n_keys, n_rows) partials into
    one tiny coalesce merge. bit_length is searchsorted against exact
    power-of-two boundaries — no float log2.

    Output: (gs_log2, n_keys, n_rows) sorted by gs_log2, nonzero
    buckets only.
    """
    from ..pipelines.relational import coarse_partition_apply

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": batch.column(col).to_pylist()})
        g = df.groupby("k", sort=False, dropna=False).size().reset_index(
            name="c")
        # pandas surfaces the null GROUP as NaN; normalize back to None
        # before retyping to the input's Arrow type
        keys = [None if (v is None or (isinstance(v, float)
                                       and np.isnan(v))) else v
                for v in g["k"]]
        return pa.table({
            "k": pa.array(keys, type=batch.schema.field(col).type),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64))})

    pows = (np.uint64(1) << np.arange(63, dtype=np.uint64))

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        tot = part.groupby("k", sort=False, dropna=False)["c"].sum()
        sizes = tot.to_numpy(dtype=np.uint64)
        buckets = np.searchsorted(pows, sizes, side="right") - 1
        out = pd.DataFrame({"gs_log2": buckets.astype(np.int64),
                            "c": sizes.astype(np.int64)})
        g = out.groupby("gs_log2", sort=True).agg(
            n_keys=("c", "size"), n_rows=("c", "sum")).reset_index()
        return g.astype({"gs_log2": "int64", "n_keys": "int64",
                         "n_rows": "int64"})

    per_key = coarse_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"), per_part,
        key_col="k", part_col="skew_part", num_parts=num_parts,
        nrows=nrows)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("gs_log2", sort=True).agg(
            n_keys=("n_keys", "sum"), n_rows=("n_rows", "sum")).reset_index()
        return g.astype({"gs_log2": "int64", "n_keys": "int64",
                         "n_rows": "int64"})

    # per-partition partials are <= 64 rows each — coalesce and fold once
    return per_key.repartition(1).map_batches(final, batch_format="pandas",
                                              batch_size=None)


def key_skew_profile_sql(table: str, col: str) -> str:
    """DuckDB replay of :func:`key_skew_profile`: exact group sizes,
    bucket via length(bin(size)) - 1 == bit_length - 1."""
    return f"""
WITH c AS (SELECT {col} AS k, count(*) AS c FROM {table} GROUP BY {col}),
b AS (SELECT CAST(length(bin(CAST(c AS UBIGINT))) - 1 AS BIGINT)
               AS gs_log2, c
      FROM c)
SELECT gs_log2, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows
FROM b GROUP BY gs_log2 ORDER BY gs_log2
"""


def heavy_hitters_by(ds_factory, *, group_col: str, text_col: str = "text",
                     phi_num: int = 1, phi_den: int = 1000) -> pd.DataFrame:
    """Per-group exact phi-heavy hitters: for every group (e.g. source
    domain), all tokens with >= phi of THAT group's token count — the
    per-domain hot-term report. The pigeonhole guarantee holds per group
    (a group-wise heavy token must be phi-heavy in at least one block's
    slice of that group), so pass 1 ships <= phi_den/phi_num candidates
    per (block, group) plus one total per (block, group), and pass 2
    ships (group, term, count) partials for candidates only. Exact
    integer output for any partitioning, like :func:`heavy_hitters`.
    Null group keys form a real group (SQL GROUP BY semantics).

    Output: (group_col, term, cnt) sorted by (group, cnt desc, term).
    """
    from ..functions.minhash import _ASCII_WS

    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be a positive rational")

    def _tokens(text: str):
        return [t for t in _ASCII_WS.split((text or "").lower()) if t]

    def pass1(batch: pa.Table) -> pa.Table:
        import collections

        per_group: dict = {}
        for g, text in zip(batch.column(group_col).to_pylist(),
                           batch.column(text_col).to_pylist()):
            per_group.setdefault(g, collections.Counter()).update(
                _tokens(text))
        groups, cands, totals = [], [], []
        for g, cnt in per_group.items():
            n_b = sum(cnt.values())
            groups.append(g)
            totals.append(n_b)
            cands.append([t for t, c in cnt.items()
                          if c * phi_den >= phi_num * n_b])
        return pa.table({
            "g": pa.array(groups, type=batch.schema.field(group_col).type),
            "cand": pa.array(cands, type=pa.list_(pa.string())),
            "n_tokens": pa.array(totals, type=pa.int64())})

    cand_by_group: dict = {}
    total_by_group: dict = {}
    for part in (ds_factory().map_batches(pass1, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")):
        for g, cs, n in zip(part.column("g").to_pylist(),
                            part.column("cand").to_pylist(),
                            part.column("n_tokens").to_pylist()):
            cand_by_group.setdefault(g, set()).update(cs)
            total_by_group[g] = total_by_group.get(g, 0) + int(n)

    def pass2(batch: pa.Table) -> pa.Table:
        import collections

        cnt: collections.Counter = collections.Counter()
        for g, text in zip(batch.column(group_col).to_pylist(),
                           batch.column(text_col).to_pylist()):
            cset = cand_by_group.get(g)
            if not cset:
                continue
            cnt.update((g, t) for t in _tokens(text) if t in cset)
        groups = [g for g, _ in cnt]
        return pa.table({
            "g": pa.array(groups, type=batch.schema.field(group_col).type),
            "term": pa.array([t for _, t in cnt], type=pa.string()),
            "c": pa.array(list(cnt.values()), type=pa.int64())})

    agg: dict = {}
    if cand_by_group:
        for part in (ds_factory().map_batches(pass2, batch_format="pyarrow")
                     .iter_batches(batch_format="pyarrow")):
            for g, t, c in zip(part.column("g").to_pylist(),
                               part.column("term").to_pylist(),
                               part.column("c").to_pylist()):
                agg[(g, t)] = agg.get((g, t), 0) + int(c)

    rows = [(g, t, c) for (g, t), c in agg.items()
            if c * phi_den >= phi_num * total_by_group[g]]
    rows.sort(key=lambda r: (str(r[0]), -r[2], r[1]))
    return pd.DataFrame({
        group_col: pd.Series([r[0] for r in rows], dtype="object"),
        "term": pd.Series([r[1] for r in rows], dtype="object"),
        "cnt": pd.Series([r[2] for r in rows], dtype="int64")})


def heavy_hitters_by_sql(table: str, *, group_col: str,
                         text_col: str = "text", phi_num: int = 1,
                         phi_den: int = 1000) -> str:
    """DuckDB replay of :func:`heavy_hitters_by` — exact group counts,
    same tokenizer, same integer-rational per-group threshold."""
    return f"""
WITH occ AS (
  SELECT {group_col} AS g, unnest(list_filter(
    string_split_regex(lower({text_col}), '[ \t\n\r\f]+'),
    x -> x <> '')) AS tok
  FROM {table}),
tot AS (SELECT g, count(*) AS n FROM occ GROUP BY g),
c AS (SELECT g, tok AS term, count(*) AS cnt FROM occ GROUP BY g, tok)
SELECT c.g AS {group_col}, c.term, CAST(c.cnt AS BIGINT) AS cnt
FROM c JOIN tot ON tot.g = c.g
WHERE c.cnt * {phi_den} >= {phi_num} * tot.n
ORDER BY c.g, c.cnt DESC, c.term ASC
"""
