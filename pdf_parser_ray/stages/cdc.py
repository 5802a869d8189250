"""Content-defined chunking (CDC) and chunk-level duplicate detection.

Chunk boundaries are decided by the CONTENT of a sliding window — a cut
falls after every position whose window hash lands in a fixed residue
class — so an insertion or deletion only re-chunks its local
neighbourhood while every downstream chunk realigns (the property that
makes CDC the standard storage/dedup chunker: Muthitacharoen et al. 2001
"A low-bandwidth network file system"; FastCDC, Xia et al. 2016).

This variant is deliberately STATELESS per position: every window-end
position is tested independently (no min/max chunk-size carry-over), so
the cut set of a document is a pure function of its text — trivially
vectorizable inside ``map_batches``, restartable anywhere, and exactly
replayable in SQL with a per-position list comprehension. Production
FastCDC adds min/max bounds and a gear table for speed; the docstring of
:func:`cdc_chunks` records that as the known delta — the Ray-side
plumbing (schema, batch shape, downstream dedup) is identical.

Scale shape: chunking is embarrassingly parallel (each document is one
row; nothing leaves the block but the emitted chunk rows, which carry
hashes and offsets, never the chunk text unless asked). The duplicate
consumer exchanges only slim ``(chunk_hash u64, partial counts)`` rows —
a document's chunks never span batches (a doc is one row), so per-batch
doc counts sum exactly.

The reference engine has no chunking counterpart (its unit is the whole
file — src/pdf_parser/processors/batch_processor.py); this is one of the
large-corpus additions: at 10^12 documents, chunk-level exact dedup
catches shared boilerplate regions that document-level hashing misses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import md5_u64

#: Window length (codepoints), polynomial base, and cut mask. The hash of
#: the window ending at position i is sum_j c[i-W+1+j] * BASE^(W-1-j)
#: mod 2^64 (numpy uint64 wraparound == the SQL HUGEINT % 2^64 replay);
#: a cut falls after i when the low MASK_BITS bits are zero → expected
#: chunk length 2^MASK_BITS codepoints.
CDC_WINDOW = 8
CDC_BASE = 131
CDC_MASK_BITS = 5

_TWO64_STR = "18446744073709551616"


def _cdc_weights(window: int = CDC_WINDOW,
                 base: int = CDC_BASE) -> np.ndarray:
    """BASE^(W-1-j) mod 2^64 for j = 0..W-1."""
    w = np.empty(window, dtype=np.uint64)
    acc = 1
    for j in range(window - 1, -1, -1):
        w[j] = acc % (1 << 64)
        acc *= base
    return w


_WEIGHTS = _cdc_weights()


def cdc_cut_positions(text: str, *, window: int = CDC_WINDOW,
                      mask_bits: int = CDC_MASK_BITS) -> np.ndarray:
    """0-based positions AFTER which a cut falls (window-end index i in
    [window-1, n-2]; the document end is always a boundary and never
    listed). Vectorized: codepoints via a utf-32 view, the polynomial
    window hash as ``window`` shifted multiply-adds over the whole doc
    (uint64 wraparound is the mod-2^64 arithmetic, by construction)."""
    n = len(text)
    if n < window + 1:
        return np.empty(0, dtype=np.int64)
    codes = np.frombuffer(text.encode("utf-32-le"),
                          dtype=np.uint32).astype(np.uint64)
    m = n - window + 1  # number of windows; window t ends at t+window-1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(window):
        acc += codes[j:j + m] * _WEIGHTS[j]
    mask = np.uint64((1 << mask_bits) - 1)
    hit = (acc & mask) == 0
    ends = np.nonzero(hit)[0] + (window - 1)  # window-end positions
    return ends[ends < n - 1].astype(np.int64)


def cdc_chunk_rows(text: str) -> list[tuple[int, int, str]]:
    """(start, n_chars, chunk_text) triples covering ``text`` exactly,
    split at :func:`cdc_cut_positions`. Empty text yields one empty
    chunk (mirrors the SQL replay's one-row-per-doc guarantee)."""
    cuts = cdc_cut_positions(text)
    bounds = [0] + [int(c) + 1 for c in cuts] + [len(text)]
    return [(bounds[i], bounds[i + 1] - bounds[i],
             text[bounds[i]:bounds[i + 1]])
            for i in range(len(bounds) - 1)]


def cdc_chunks(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Explode each document into content-defined chunks: one output row
    per chunk — ``(doc_id, chunk_idx, start, n_chars, chunk_hash)`` with
    ``chunk_hash`` the house md5-uint64 of the chunk text. Stateless
    per-row kernel, zero exchange; chunk text itself is NOT emitted
    (downstream dedup needs only hashes + offsets — at 10^12 docs the
    text would multiply the output by the payload size for nothing).

    Known delta vs production FastCDC: no min/max chunk-size bounds and
    a plain polynomial window hash instead of a gear table — chosen so
    the cut set is position-independent (exact SQL replay, exact
    restartability); the bounds would make each cut depend on the
    previous one and push the oracle into a recursive CTE.
    """
    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, starts, lens, texts = [], [], [], [], []
        id_vals = batch.column(id_col).to_pylist()
        for did, text in zip(id_vals, batch.column(text_col).to_pylist()):
            for ci, (start, n_chars, chunk) in enumerate(
                    cdc_chunk_rows(text or "")):
                ids.append(did)
                idxs.append(ci)
                starts.append(start)
                lens.append(n_chars)
                texts.append(chunk)
        return pa.table({
            id_col: pa.array(ids, type=batch.schema.field(id_col).type),
            "chunk_idx": pa.array(idxs, type=pa.int64()),
            "start": pa.array(starts, type=pa.int64()),
            "n_chars": pa.array(lens, type=pa.int64()),
            "chunk_hash": pa.array(md5_u64(texts) if texts
                                   else np.empty(0, dtype=np.uint64),
                                   type=pa.uint64())})

    return ds.map_batches(explode, batch_format="pyarrow")


def cdc_dup_chunks(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   min_docs: int = 2, num_parts: int = 32,
                   nrows: int | None = None):
    """Chunk hashes shared by >= ``min_docs`` distinct documents, with
    exact doc and occurrence counts — the chunk-level exact-dedup signal
    (document-level hashing misses shared boilerplate REGIONS; this
    finds them). Exchange: per-batch ``(chunk_hash, n_docs, n_occ)``
    partials only — a document is one input row, so its chunks never
    span batches and partial doc counts sum exactly; the merge is the
    house hash-partitioned kernel (coarse_partition_apply), never a
    driver collect. ``nrows``, when known, must upper-bound the PARTIAL
    row count (chunk text length, not doc count — usually unknown, so
    the merge defaults to the shuffle path). Output: a Dataset of
    (chunk_hash, n_docs, n_occ); row order is not defined.
    """
    from ..pipelines.relational import coarse_partition_apply

    chunks = cdc_chunks(ds, text_col=text_col, id_col=id_col)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "chunk_hash": batch.column("chunk_hash").to_numpy(
                zero_copy_only=False),
            "d": batch.column(id_col).to_pylist()})
        g = df.groupby("chunk_hash", sort=False).agg(
            n_docs=("d", "nunique"), n_occ=("d", "size")).reset_index()
        return pa.table({
            "chunk_hash": pa.array(
                g["chunk_hash"].to_numpy(dtype=np.uint64),
                type=pa.uint64()),
            "n_docs": pa.array(g["n_docs"].to_numpy(dtype=np.int64)),
            "n_occ": pa.array(g["n_occ"].to_numpy(dtype=np.int64))})

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        tot = part.groupby("chunk_hash", sort=True).agg(
            n_docs=("n_docs", "sum"), n_occ=("n_occ", "sum")).reset_index()
        out = tot[tot["n_docs"] >= min_docs]
        return pd.DataFrame({
            "chunk_hash": out["chunk_hash"].astype("uint64"),
            "n_docs": out["n_docs"].astype("int64"),
            "n_occ": out["n_occ"].astype("int64")})

    partials = chunks.map_batches(partial, batch_format="pyarrow")
    # nrows is unknowable from footers (chunk count tracks text length,
    # not doc count), so the merge always shuffles; at small SF Ray's
    # sampled sort over the low-cardinality part key leaves some ranges
    # empty and logs a cosmetic schemaless-empty-block warning (values
    # unaffected — oracle-gated; see BASELINE.md bench-hygiene note)
    return coarse_partition_apply(partials, merge, key_col="chunk_hash",
                                  part_col="cdc_part",
                                  num_parts=num_parts, nrows=nrows)


def _chunks_cte(table: str, text_col: str, id_col: str,
                window: int, base: int, mask_bits: int) -> str:
    """Shared SQL CTE chain replaying the chunker: per-position window
    hash (HUGEINT per-term mod 2^64 == numpy uint64 wraparound), cut
    filter, boundary assembly, chunk explode."""
    weights = [int(w) for w in _cdc_weights(window, base)]
    terms = " + ".join(
        f"CAST(unicode(substr(t, i - {window - 1} + {j}, 1)) AS HUGEINT)"
        f" * {weights[j]} % {_TWO64_STR}" for j in range(window))
    return f"""
d AS (SELECT {id_col} AS doc_id, coalesce({text_col}, '') AS t,
             length(coalesce({text_col}, '')) AS n FROM {table}),
cuts AS (
  -- i = 1-based window-END char position; cut after i, never at doc end
  SELECT doc_id, t, n,
         list_filter(range({window}, n),
           i -> ({terms}) % {_TWO64_STR} % {1 << mask_bits} = 0) AS cl
  FROM d),
bounds AS (
  SELECT doc_id, t, list_prepend(0, list_append(cl, n)) AS b FROM cuts),
chunks AS (
  SELECT doc_id, ci - 1 AS chunk_idx, b[ci] AS start,
         b[ci + 1] - b[ci] AS n_chars,
         substr(t, b[ci] + 1, b[ci + 1] - b[ci]) AS chunk
  FROM bounds CROSS JOIN unnest(range(1, len(b) + 1)) AS u(ci)
  WHERE ci < len(b))"""


def cdc_chunks_sql(table: str, *, text_col: str = "text",
                   id_col: str = "doc_id", window: int = CDC_WINDOW,
                   base: int = CDC_BASE,
                   mask_bits: int = CDC_MASK_BITS) -> str:
    """DuckDB replay of :func:`cdc_chunks`."""
    cte = _chunks_cte(table, text_col, id_col, window, base, mask_bits)
    return f"""
WITH {cte}
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(concat('0x', substr(md5(chunk), 1, 16)) AS UBIGINT)
         AS chunk_hash
FROM chunks
ORDER BY doc_id, chunk_idx
"""


def cdc_dup_chunks_sql(table: str, *, text_col: str = "text",
                       id_col: str = "doc_id", min_docs: int = 2,
                       window: int = CDC_WINDOW, base: int = CDC_BASE,
                       mask_bits: int = CDC_MASK_BITS) -> str:
    """DuckDB replay of :func:`cdc_dup_chunks`."""
    cte = _chunks_cte(table, text_col, id_col, window, base, mask_bits)
    return f"""
WITH {cte}
SELECT CAST(concat('0x', substr(md5(chunk), 1, 16)) AS UBIGINT)
         AS chunk_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM chunks
GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
ORDER BY n_docs DESC, chunk_hash ASC
"""


def cdc_neardup_edges(ds, *, text_col: str = "text",
                      id_col: str = "doc_id", min_len: int = 16,
                      max_bucket: int = 64, min_shared: int = 2,
                      num_parts: int = 32):
    """Chunk-overlap near-duplicate candidates — the CDC-family sibling
    of the MinHash/SimHash/n-gram/embedding near-dup paths: doc pairs
    sharing >= ``min_shared`` distinct content-defined chunks (chunks
    shorter than ``min_len`` codepoints are ignored as trivia). Because
    CDC boundaries realign after local edits, two documents differing by
    an insertion still share every chunk outside the edit neighbourhood
    — overlap count is a direct containment signal, no sketch error.

    Hot-bucket handling, the same policy as the LSH families: a chunk
    shared by k docs yields k² pairs, so each chunk's doc list is capped
    at the ``max_bucket`` SMALLEST doc ids — deterministic, so the SQL
    replay applies the identical cap (row_number over doc_id). Exchanges
    are slim throughout: distinct (chunk_hash, doc_id) pairs bucket by
    hash (a chunk's docs land in one partition), emitted pair rows
    bucket by their first doc id for the exact shared-count fold.

    Output: (a, b, n_shared) with a < b, n_shared >= min_shared.
    """
    from ..pipelines.relational import coarse_partition_apply

    chunks = cdc_chunks(ds, text_col=text_col, id_col=id_col)

    def hash_doc_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.greater_equal(batch.column("n_chars"),
                                pa.scalar(min_len))
        kept = batch.filter(keep)
        df = pd.DataFrame({
            "h": kept.column("chunk_hash").to_numpy(zero_copy_only=False),
            "d": kept.column(id_col).to_pylist()}).drop_duplicates()
        # a doc is one input row, so batch-distinct IS global-distinct
        return pa.table({
            "h": pa.array(df["h"].to_numpy(dtype=np.uint64),
                          type=pa.uint64()),
            "d": pa.array(df["d"].tolist(),
                          type=kept.schema.field(id_col).type)})

    def emit_pairs(part: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        for _, sub in part.groupby("h", sort=False):
            docs = sorted(sub["d"].tolist())[:max_bucket]
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    rows_a.append(docs[i])
                    rows_b.append(docs[j])
        return pd.DataFrame({"a": pd.Series(rows_a, dtype="int64"),
                             "b": pd.Series(rows_b, dtype="int64")})

    def count_pairs(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["a", "b"], sort=True).size().reset_index(
            name="n_shared")
        out = g[g["n_shared"] >= min_shared]
        return out.astype({"a": "int64", "b": "int64",
                           "n_shared": "int64"})

    # both exchanges carry SLIM rows ((h, d) hash-doc pairs, then (a, b)
    # id pairs), so materialize+count is cheap at any scale and lets
    # coarse_partition_apply size its exchange (and collapse its blocks)
    # from the data instead of running blind
    hd = chunks.map_batches(hash_doc_pairs,
                            batch_format="pyarrow").materialize()
    pairs = coarse_partition_apply(
        hd, emit_pairs, key_col="h", part_col="cdc_nd_part",
        num_parts=num_parts, nrows=hd.count())
    # (a, b) groups co-locate on a alone — b rides along, the per-
    # partition groupby keys on both
    pairs = pairs.materialize()
    return coarse_partition_apply(
        pairs, count_pairs, key_col="a", part_col="cdc_pair_part",
        num_parts=num_parts, nrows=pairs.count())


def cdc_neardup_edges_sql(table: str, *, text_col: str = "text",
                          id_col: str = "doc_id", min_len: int = 16,
                          max_bucket: int = 64, min_shared: int = 2,
                          window: int = CDC_WINDOW, base: int = CDC_BASE,
                          mask_bits: int = CDC_MASK_BITS) -> str:
    """DuckDB replay of :func:`cdc_neardup_edges` — same chunker CTE,
    same min-length filter, the identical deterministic hot-bucket cap
    (row_number over doc_id), exact pair counts."""
    cte = _chunks_cte(table, text_col, id_col, window, base, mask_bits)
    return f"""
WITH {cte},
hd AS (
  SELECT DISTINCT doc_id,
         CAST(concat('0x', substr(md5(chunk), 1, 16)) AS UBIGINT) AS h
  FROM chunks WHERE n_chars >= {min_len}),
kept AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h,
           row_number() OVER (PARTITION BY h ORDER BY doc_id) AS r
    FROM hd)
  WHERE r <= {max_bucket}),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM kept x JOIN kept y ON x.h = y.h AND x.doc_id < y.doc_id)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM p GROUP BY a, b HAVING count(*) >= {min_shared}
ORDER BY a, b
"""
