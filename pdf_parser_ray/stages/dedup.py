"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (SURVEY.md §2.6 + north rule):
  - exact dedup shuffles only (hash, id) pairs after a vectorized hashing
    map — never the payload; the groupby key is the FULL sha256 (the
    reference's 6-char prefix collides at corpus scale).
  - near-dup stages emit fixed-width sketches per doc, explode to
    (band_key, doc_id, sketch) rows, and groupby band buckets — documents
    themselves never move. Salting: band keys already distribute uniformly
    (md5 of band bytes); a hot bucket means genuinely-identical content,
    which the per-bucket combiner reduces to one survivor row.
  - duplicate resolution: the edge queries emit one round of min-label
    propagation inside each bucket (doc marked dup iff some bucket links
    it to a smaller-id doc at ≥ threshold similarity) — the common LSH
    dedup contract at web scale. For exact cluster resolution of chains
    A~B~C where A!~C, ``connected_components`` iterates min-label
    propagation over the edge set to fixpoint.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import COALESCE_ROW_LIMIT as _COALESCE_BAND_LIMIT
from ..functions.minhash import MinHasher, SimHasher, char_ngrams, jaccard



def _add_pair_part(df: pd.DataFrame, col: str = "doc_id",
                   num_parts: int = 64) -> pd.DataFrame:
    """Coarse partition key for pair-distinct passes: a (col, dup_of) pair
    always lands in one partition (keyed by col only)."""
    from ..pipelines.relational import vec_str_buckets

    df = df.copy()
    df["pair_part"] = vec_str_buckets(df[col], num_parts)
    return df


def _distinct_edges(edges, *, id_col: str = "doc_id",
                    small_limit: int = 200_000):
    """Exact distinct over (id_col, dup_of) edge rows, size-gated.

    Below ``small_limit`` pre-distinct rows the edges coalesce into ONE
    block (``repartition(1)`` is a split/merge, not a key exchange) and
    dedup locally — Ray's sort-based groupby carries ~2 s of fixed
    planner/barrier overhead regardless of row count (BENCH/TUNING.md),
    which dominated every near-dup query's candidate-distinct pass.
    Above the gate, the scale path is unchanged: coarse pair-hash
    partition + per-partition vectorized drop_duplicates (a pair always
    lands in one partition, keyed by ``id_col``). Returns a materialized
    Dataset (every caller feeds multiple consumers)."""
    edges = edges.materialize()
    if edges.count() == 0:
        return edges
    if edges.count() <= small_limit:
        return edges.repartition(1).map_batches(
            lambda g: g.drop_duplicates([id_col, "dup_of"]),
            batch_format="pandas", batch_size=None).materialize()
    # stamp cardinality AND block count sized from the known edge count
    # (the _keyed_groups/choose_partitions rule): sort ranges equal input
    # blocks, so a fixed 64-value stamp over many small blocks leaves
    # schemaless empty ranges; repartition is a split/merge, not a shuffle
    from ..pipelines.relational import choose_partitions

    npart = choose_partitions(edges.count(), default=64)
    blocks = npart if npart > 64 else max(2, -(-npart // 8))
    return edges.map_batches(
        _add_pair_part, batch_format="pandas",
        fn_kwargs={"col": id_col, "num_parts": npart},
    ).repartition(blocks).groupby("pair_part").map_groups(
        lambda g: g.drop_duplicates([id_col, "dup_of"]).drop(columns=["pair_part"]),
        batch_format="pandas").materialize()


@functools.lru_cache(maxsize=8)
def _cached_minhasher(num_perm: int, shingle_width: int = 5) -> MinHasher:
    """Per-worker warm MinHasher for task-mode map_batches (same
    amortization as an actor pool, no actor-spawn latency — the pattern
    measured in stages/doc_parse.py)."""
    return MinHasher(num_perm=num_perm, shingle_width=shingle_width)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, *, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    """Vectorized-enough sha256 over the text column (C-speed per row)."""
    vals = batch.column(text_col).to_pylist()
    hashes = [hashlib.sha256((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column(out_col, pa.array(hashes, type=pa.string()))


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                num_parts: int = 64):
    """Keep the min-id row of each identical-content group (full rows).

    hash → coarse crc32(hash) partition → ONE vectorized sort +
    drop_duplicates per partition (a per-hash map_groups would cost ~ms
    of Python per group — the repo's standard coarse-partition pattern).
    The shuffle moves full rows — fine for narrow tables; for wide
    payloads use ``exact_dedup_ids`` (survivor ids with an ids-only
    shuffle) or ``exact_dedup_semi`` (full survivor rows via semi-join,
    payload never enters a groupby shuffle).
    """
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})

    def add_part(batch: pa.Table) -> pa.Table:
        from ..pipelines.relational import vec_str_buckets

        parts = vec_str_buckets(batch.column("content_hash").to_pandas(),
                                num_parts)
        return batch.append_column("dedup_part", pa.array(parts, type=pa.int64()))

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_hash", id_col], kind="mergesort")
        return g.drop_duplicates("content_hash", keep="first").drop(
            columns=["dedup_part"])

    return hashed.map_batches(add_part, batch_format="pyarrow").groupby(
        "dedup_part").map_groups(keep_min, batch_format="pandas")


def _slim_hash_parts(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     keep_cols: tuple = (), num_parts: int = 64):
    """Pre-shuffle stage of the ids-only dedup: hash the payload, DROP it,
    pre-combine per batch (one row per hash per batch), coarse-partition by
    crc32(hash). The returned dataset — the only thing that shuffles —
    carries (id, content_hash, *keep_cols, dedup_part); no payload column.
    """
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})
    slim_cols = [id_col, "content_hash", *keep_cols]

    def slim(batch: pa.Table) -> pa.Table:
        df = batch.select(slim_cols).to_pandas()
        # per-batch combiner: keep only each hash's min-id row before the
        # exchange (an all-identical batch collapses to one row)
        df = df.sort_values(["content_hash", id_col], kind="mergesort")
        df = df.drop_duplicates("content_hash", keep="first")
        from ..pipelines.relational import vec_str_buckets

        df["dedup_part"] = vec_str_buckets(df["content_hash"], num_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    return hashed.map_batches(slim, batch_format="pyarrow")


def exact_dedup_ids(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    keep_cols: tuple = (), num_parts: int = 64,
                    nrows: int | None = None):
    """Survivor (min-id) rows of each identical-content group, shuffling
    ONLY (id, content_hash, *keep_cols) — never the payload.

    The groupby key is a coarse crc32(hash) partition; the min-id pick is a
    vectorized sort + drop_duplicates within each partition (a per-hash
    map_groups would cost milliseconds of Python per tiny group).
    Output columns: (id_col, content_hash, *keep_cols).

    ``nrows`` (an upper bound is fine — e.g. the parquet footer count of a
    pre-filter table) gates the zero-sort coalesce path: the shuffled rows
    are SLIM (~100 B), so below the limit they coalesce into one block and
    the same kernel runs once with no sort exchange (~2 s fixed cost).
    """
    parts = _slim_hash_parts(ds, text_col=text_col, id_col=id_col,
                             keep_cols=keep_cols, num_parts=num_parts)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_hash", id_col], kind="mergesort")
        return g.drop_duplicates("content_hash", keep="first").drop(columns=["dedup_part"])

    if nrows is not None and 0 < nrows <= _COALESCE_BAND_LIMIT:
        return parts.repartition(1).map_batches(
            keep_min, batch_format="pandas", batch_size=None)
    return parts.groupby("dedup_part").map_groups(keep_min, batch_format="pandas")


def exact_dedup_semi(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     num_parts: int = 64, nrows: int | None = None):
    """Full-row exact dedup for WIDE payloads: pick survivor ids with the
    ids-only shuffle, then semi-join the original dataset on id to recover
    full rows. The payload crosses the wire exactly once, through a bucket
    partition exchange — never through a sort/groupby of wide rows.
    (The input is consumed twice — hashing pass + semi-join pass — which at
    scale is two pruned streaming reads, the standard trade for not
    shuffling payloads.)
    """
    from ..pipelines.relational import semi_anti_join

    survivors = exact_dedup_ids(ds, text_col=text_col, id_col=id_col,
                                num_parts=num_parts, nrows=nrows)
    survivor_ids = survivors.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow")
    return semi_anti_join(ds, survivor_ids, left_key=id_col, anti=False)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHashSketch:
    """Actor-pool form of ``minhash_sketch_batch`` (same kernel; use the
    class when sketching rides in a pool with other heavy state)."""

    def __init__(self, num_perm: int = 128, shingle_width: int = 5,
                 text_col: str = "text"):
        self.num_perm = num_perm
        self.shingle_width = shingle_width
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return minhash_sketch_batch(batch, num_perm=self.num_perm,
                                    shingle_width=self.shingle_width,
                                    text_col=self.text_col)


class BandExplode:
    """Actor-pool form of ``band_explode_batch``: signature → one SLIM row
    per LSH band (band_key, doc_id); see the function for the shuffle
    rationale."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16, id_col: str = "doc_id"):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return band_explode_batch(batch, num_perm=self.num_perm,
                                  num_bands=self.num_bands, id_col=self.id_col)



def minhash_sketch_batch(batch: pa.Table, *, num_perm: int = 128,
                         shingle_width: int = 5,
                         text_col: str = "text") -> pa.Table:
    """Task-mode sketch stage (warm per-worker hasher via lru_cache)."""
    hasher = _cached_minhasher(num_perm, shingle_width)
    sigs = [s.astype(np.uint64).tobytes() for s in
            hasher.signatures(batch.column(text_col).to_pylist())]
    return batch.append_column("minhash_sig", pa.array(sigs, type=pa.binary()))


def minhash_sketch_md5_batch(batch: pa.Table, *, num_perm: int = 32,
                             shingle_width: int = 5,
                             text_col: str = "text") -> pa.Table:
    """SQL-reproducible sketch variant (functions.minhash.
    minhash_signature_md5): md5 shingle hashes + exact modular
    permutations. Slower than the crc32 production sketch; exists so the
    MinHash dedup pipeline has a DuckDB-oracle-gated configuration."""
    from ..functions.minhash import minhash_signature_md5

    sigs = [np.array(minhash_signature_md5(t or "", num_perm, shingle_width),
                     dtype=np.uint64).tobytes()
            for t in batch.column(text_col).to_pylist()]
    return batch.append_column("minhash_sig", pa.array(sigs, type=pa.binary()))


def band_explode_batch(batch: pa.Table, *, num_perm: int = 128,
                       num_bands: int = 16, id_col: str = "doc_id") -> pa.Table:
    """Task-mode slim band explode: (band_key, doc_id) rows only — the
    ~1 KB signature does NOT ride in the band rows (it would 16× the
    exchange; measured to dominate the dedup wall time). Candidates are
    verified afterwards against the bloom-prefiltered signature pool."""
    hasher = _cached_minhasher(num_perm)
    ids, keys = [], []
    for doc_id, sig_bytes in zip(
        batch.column(id_col).to_pylist(), batch.column("minhash_sig").to_pylist()
    ):
        sig = np.frombuffer(sig_bytes, dtype=np.uint64)
        for key in hasher.band_keys(sig, num_bands):
            ids.append(doc_id)
            keys.append(key)
    return pa.table({"band_key": pa.array(keys, type=pa.string()),
                     id_col: pa.array(ids, type=batch.column(id_col).type)})


def _bucket_candidates(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized within-PARTITION candidate finder (a partition holds many
    band buckets — coarse crc32(band_key) groupby, fine grouping done here
    with numpy instead of a per-bucket Python callback).

    Within each band bucket: pair every doc with the bucket's min-id doc.
    Emits unverified (doc_id, dup_of) candidates."""
    if len(g) < 2:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=g["doc_id"].dtype),
                             "dup_of": pd.Series([], dtype=g["doc_id"].dtype)})
    g = g.sort_values(["band_key", "doc_id"], kind="mergesort").reset_index(drop=True)
    n = len(g)
    keys = g["band_key"].to_numpy()
    change = np.r_[True, keys[1:] != keys[:-1]]
    anchor_idx = np.flatnonzero(change)[np.cumsum(change) - 1]
    mask = np.arange(n) != anchor_idx
    ids = g["doc_id"].to_numpy()
    return pd.DataFrame({"doc_id": pd.Series(ids[mask], dtype=g["doc_id"].dtype),
                         "dup_of": pd.Series(ids[anchor_idx[mask]], dtype=g["doc_id"].dtype)})


def _sketch_slim(ds, *, text_col: str, id_col: str, num_perm: int,
                 concurrency, sketch: str):
    """Sketch every doc and pin ONLY the slim (id, minhash_sig) pair.

    Both downstream consumers (band explode, sig filter) need exactly these
    two columns; projecting before the materialize keeps the object-store
    pin at ~1 KB/doc independent of payload width — the text column never
    enters the pin."""
    sketch_kwargs = {"concurrency": concurrency} if concurrency else {}
    sketch_fn = (minhash_sketch_md5_batch if sketch == "md5"
                 else minhash_sketch_batch)
    return ds.map_batches(
        sketch_fn,
        fn_kwargs={"num_perm": num_perm, "text_col": text_col},
        batch_format="pyarrow", **sketch_kwargs,
    ).select_columns([id_col, "minhash_sig"]).materialize()


def _bloom_filtered_pool(source_ds, cands, *, id_col: str, value_col: str,
                         pair_col: str = "doc_id"):
    """Bloom-prefiltered (id, value) pool restricted to candidate-pair
    endpoints — the shared verify plumbing of the near-dup family.

    Builds a distributed Bloom filter over BOTH endpoints of ``cands``
    (columns ``pair_col``/``dup_of``) and filters ``source_ds`` down to
    rows whose id might be an endpoint. No false negatives, so every
    candidate's value survives; a false positive only adds a row the
    verify/join then drops — exactness preserved. The surviving pool is
    candidate-scale and materialized once for all downstream consumers."""
    import ray as _ray

    from ..functions.bloom import BloomFilter, build_bloom_distributed

    both = cands.map_batches(
        lambda df: pd.DataFrame(
            {"cid": pd.concat([df[pair_col], df["dup_of"]], ignore_index=True)}),
        batch_format="pandas")
    bloom = build_bloom_distributed(both, "cid", capacity=2 * cands.count())
    bloom_ref = _ray.put(bloom)

    # NOTE: the kernel stays a PANDAS batch deliberately — an Arrow
    # list<double> pool block breaks Ray's sort in the hash-join fallback
    # (blocks mix ArrowTensorType with plain list types and
    # merge_sorted_blocks refuses); the pandas round-trip keeps every
    # downstream block in the tensor representation Ray expects.
    def pool_filter(batch: pd.DataFrame) -> pd.DataFrame:
        bf: BloomFilter = _ray.get(bloom_ref)
        keep = bf.contains_many(batch[id_col].tolist())
        return batch.loc[keep, [id_col, value_col]]

    return source_ds.map_batches(pool_filter, batch_format="pandas").materialize()


def _lsh_candidate_pairs(sketched, *, num_perm: int, num_bands: int,
                         id_col: str):
    """Banded-LSH candidate generation over pinned slim sketches: SLIM band
    explode (band_key, id) → coarse crc32(band_key) partition (one task
    handles MANY buckets with the vectorized kernel — a per-bucket
    map_groups callback costs milliseconds of Python per tiny group,
    measured 8 s vs 0.5 s at sf0.1) → bucket min-id anchor pairs →
    distinct. Returns (materialized distinct pairs, id arrow type); the
    pairs are tiny and feed several consumers (joins, bloom prefilters).

    Size gate (the sketch is pinned, so the band-row count is FREE:
    count × num_bands): below ``_COALESCE_BAND_LIMIT`` slim rows the bands
    coalesce into one block and the SAME vectorized kernel runs once,
    deduping in place — zero sort shuffles (each Ray sort costs ~2 s of
    fixed planner/barrier overhead; two of them dominated every near-dup
    query at bench scale). Above the gate: unchanged coarse-partition
    exchange + distinct."""
    from ..pipelines.relational import _arrow_type

    id_type = _arrow_type(dict(zip(sketched.schema().names,
                                   sketched.schema().types))[id_col])
    bands = sketched.map_batches(
        band_explode_batch,
        fn_kwargs={"num_perm": num_perm, "num_bands": num_bands, "id_col": id_col},
        batch_format="pyarrow",
    )

    if sketched.count() * num_bands <= _COALESCE_BAND_LIMIT:
        def whole(g: pd.DataFrame) -> pd.DataFrame:
            return _bucket_candidates(g).drop_duplicates(["doc_id", "dup_of"])

        cands = bands.repartition(1).map_batches(
            whole, batch_format="pandas", batch_size=None).materialize()
        return cands, id_type

    def add_part(batch: pa.Table) -> pa.Table:
        from ..pipelines.relational import vec_str_buckets

        parts = vec_str_buckets(batch.column("band_key").to_pandas(), 64)
        return batch.append_column("band_part", pa.array(parts, type=pa.int64()))

    parts = bands.map_batches(add_part, batch_format="pyarrow")
    cands = parts.groupby("band_part").map_groups(_bucket_candidates,
                                                  batch_format="pandas")
    # distinct (doc_id, dup_of): same pair may surface from several bands
    # (size-gated coalesce vs coarse-partition — _distinct_edges)
    return _distinct_edges(cands), id_type


def minhash_dedup_edges(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 128, num_bands: int = 16,
                        threshold: float = 0.8, concurrency=None,
                        broadcast_limit: int = 500_000,
                        sketch: str = "crc32"):
    """Dataset of verified (doc_id, dup_of) near-duplicate edges.

    Candidates-then-verify architecture (sketch shuffle minimized):
      1. shingle→minhash (actor pool) → SLIM band explode (band_key, id) →
         coarse band-bucket groupby → candidate pairs (bucket min-id anchor);
      2. distinct candidates;
      3. signatures joined back onto the candidate pairs (bucket hash join
         on each endpoint) → full-signature agreement ≥ threshold.
    The band exchange carries ~30 B/doc/band instead of the full ~1 KB
    signature (16× lighter); signatures cross the wire twice total (once
    per join side), only where candidates exist. The sketch stage feeds
    both the band path and the sig joins — at corpus scale persist the
    sketches (sketch once → parquet) instead of recomputing.
    Edge semantics identical to verifying inside the buckets.
    """
    from ..pipelines.relational import hash_join

    # pinned slim: see _sketch_slim — without pinning every schema probe /
    # consumer re-runs shingle+minhash (measured 6× re-execution)
    sketched = _sketch_slim(ds, text_col=text_col, id_col=id_col,
                            num_perm=num_perm, concurrency=concurrency,
                            sketch=sketch)
    cands, id_type = _lsh_candidate_pairs(
        sketched, num_perm=num_perm, num_bands=num_bands, id_col=id_col)

    if cands.count() == 0:
        return cands  # no candidate pairs anywhere → no edges

    # Bloom-prefilter the signature side: candidates are a small minority
    # of the corpus, so most signatures never enter the join exchange
    # (shared plumbing: _bloom_filtered_pool)
    import ray as _ray

    sig_pool = _bloom_filtered_pool(sketched, cands, id_col=id_col,
                                    value_col="minhash_sig")

    if sig_pool.count() <= broadcast_limit:
        # the filtered sig pool is candidate-scale: broadcast it once and
        # verify inside map_batches over the candidate pairs — no join
        # exchange at all (Ray's sort-shuffle costs ~10 s of fixed
        # overhead even on a few hundred rows spread over small blocks)
        sig_df = sig_pool.to_pandas()
        lookup_ref = _ray.put(dict(zip(sig_df[id_col], sig_df["minhash_sig"])))

        def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df.reindex(columns=["doc_id", "dup_of"])
            lk = _ray.get(lookup_ref)
            n = len(df)
            # every candidate endpoint is in the pool (Bloom has no false
            # negatives), so the maps are total
            a = np.frombuffer(b"".join(df["doc_id"].map(lk)),
                              dtype=np.uint64).reshape(n, -1)
            b_ = np.frombuffer(b"".join(df["dup_of"].map(lk)),
                               dtype=np.uint64).reshape(n, -1)
            agree = (a == b_).mean(axis=1)
            return df.loc[agree >= threshold, ["doc_id", "dup_of"]]

        return cands.map_batches(verify_broadcast, batch_format="pandas")

    # huge candidate set (dup-heavy corpus): bucket-partitioned sig joins.
    # Explicit types keep the joins lazy (schema probes would re-execute
    # the whole candidate pipeline).
    sigs = sig_pool.map_batches(
        lambda b: b.rename_columns(["doc_id", "minhash_sig"]),
        batch_format="pyarrow")
    sigs_b = sig_pool.map_batches(
        lambda b: b.rename_columns(["dup_of", "sig_b"]), batch_format="pyarrow")
    cand_types = {"doc_id": id_type, "dup_of": id_type}
    sig_types = {"doc_id": id_type, "minhash_sig": pa.binary()}
    j1 = hash_join(cands, sigs, key="doc_id", num_buckets=16,
                   left_types=cand_types, right_types=sig_types)
    j2 = hash_join(j1, sigs_b, key="dup_of", num_buckets=16,
                   left_types={**cand_types, "minhash_sig": pa.binary()},
                   right_types={"dup_of": id_type, "sig_b": pa.binary()})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=batch["doc_id"].dtype),
                                 "dup_of": pd.Series([], dtype=batch["dup_of"].dtype)})
        n = len(batch)
        a = np.frombuffer(b"".join(batch["minhash_sig"]), dtype=np.uint64).reshape(n, -1)
        b_ = np.frombuffer(b"".join(batch["sig_b"]), dtype=np.uint64).reshape(n, -1)
        agree = (a == b_).mean(axis=1)
        return batch.loc[agree >= threshold, ["doc_id", "dup_of"]]

    return j2.map_batches(verify, batch_format="pandas")


def ngram_jaccard_dedup_edges(ds, *, text_col: str = "text",
                              id_col: str = "doc_id", threshold: float = 0.5,
                              ngram: int = 5, num_perm: int = 32,
                              num_bands: int = 8, concurrency=None,
                              broadcast_limit: int = 200_000):
    """(doc_id, dup_of) edges where EXACT char-n-gram Jaccard ≥ threshold,
    candidate-bucketed by the md5 MinHash bands (SURVEY §2.9 "n-gram
    Jaccard" dedup as a first-class pipeline).

    Same candidates-then-verify shape as minhash_dedup_edges — banded LSH
    proposes, exact set Jaccard disposes — so no all-pairs comparison ever
    runs; recall is the LSH's (band agreement), precision is exact. The
    verify pool carries TEXT, so it is Bloom-prefiltered to candidate
    endpoints and broadcast only when small; above ``broadcast_limit``
    rows it falls back to bucket hash joins (payload crosses the wire
    once per endpoint side, only where candidates exist).
    """
    from ..functions.minhash import char_ngrams, jaccard
    from ..pipelines.relational import hash_join

    sketched = _sketch_slim(ds, text_col=text_col, id_col=id_col,
                            num_perm=num_perm, concurrency=concurrency,
                            sketch="md5")
    cands, id_type = _lsh_candidate_pairs(
        sketched, num_perm=num_perm, num_bands=num_bands, id_col=id_col)
    if cands.count() == 0:
        return cands

    import ray as _ray

    text_pool = _bloom_filtered_pool(ds, cands, id_col=id_col,
                                     value_col=text_col)

    if text_pool.count() <= broadcast_limit:
        tdf = text_pool.to_pandas()
        lookup_ref = _ray.put(dict(zip(tdf[id_col], tdf[text_col])))

        def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df.reindex(columns=["doc_id", "dup_of"])
            lk = _ray.get(lookup_ref)
            keep = [jaccard(char_ngrams(lk[a] or "", ngram),
                            char_ngrams(lk[b] or "", ngram)) >= threshold
                    for a, b in zip(df["doc_id"], df["dup_of"])]
            return df.loc[keep, ["doc_id", "dup_of"]]

        return cands.map_batches(verify_broadcast, batch_format="pandas")

    texts_a = text_pool.map_batches(
        lambda b: b.rename_columns(["doc_id", "text_a"]), batch_format="pyarrow")
    texts_b = text_pool.map_batches(
        lambda b: b.rename_columns(["dup_of", "text_b"]), batch_format="pyarrow")
    cand_types = {"doc_id": id_type, "dup_of": id_type}
    j1 = hash_join(cands, texts_a, key="doc_id", num_buckets=16,
                   left_types=cand_types,
                   right_types={"doc_id": id_type, "text_a": pa.string()})
    j2 = hash_join(j1, texts_b, key="dup_of", num_buckets=16,
                   left_types={**cand_types, "text_a": pa.string()},
                   right_types={"dup_of": id_type, "text_b": pa.string()})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.reindex(columns=["doc_id", "dup_of"])
        keep = [jaccard(char_ngrams(a or "", ngram), char_ngrams(b or "", ngram))
                >= threshold for a, b in zip(df["text_a"], df["text_b"])]
        return df.loc[keep, ["doc_id", "dup_of"]]

    return j2.map_batches(verify, batch_format="pandas")


def dup_cluster_stats(ds, *, text_col: str = "text", num_parts: int = 64,
                      nrows: int | None = None):
    """Exact-duplicate cluster-size distribution — the standard curation
    report ("how much of the corpus is copies"): one row per cluster size
    with (cluster_size, n_clusters, n_docs).

    Two bounded reduces, payload never shuffles: per-batch (hash, n)
    partial counts → house partitioned group-sum on the hash (slim rows,
    one per distinct hash per batch) → per-block size-histogram partials
    coalesced to one block (distinct sizes are at most the max cluster
    size — a handful of rows at any corpus scale)."""
    from ..pipelines.relational import partitioned_group_sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        vals = batch.column(text_col).to_pylist()
        c = Counter(hashlib.sha256((v or "").encode("utf-8")).hexdigest()
                    for v in vals)
        return pa.table({
            "content_hash": pa.array(list(c.keys()), type=pa.string()),
            "n": pa.array(list(c.values()), type=pa.int64())})

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow")
    sizes = partitioned_group_sum(partials, key="content_hash",
                                  sum_cols={"cluster_size": "n"},
                                  num_parts=num_parts, nrows=nrows)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"cluster_size": pd.Series(dtype="int64"),
                                 "n_clusters": pd.Series(dtype="int64")})
        agg = df.groupby("cluster_size", as_index=False).agg(
            n_clusters=("cluster_size", "size"))
        return agg.astype({"cluster_size": "int64", "n_clusters": "int64"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"cluster_size": pd.Series(dtype="int64"),
                                 "n_clusters": pd.Series(dtype="int64"),
                                 "n_docs": pd.Series(dtype="int64")})
        agg = df.groupby("cluster_size", as_index=False).agg(
            n_clusters=("n_clusters", "sum"))
        agg["n_docs"] = agg["cluster_size"] * agg["n_clusters"]
        return agg.astype("int64")

    return (sizes.map_batches(hist_partial, batch_format="pandas")
            .repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None))


def snapshot_diff(ds_old, ds_new, *, id_col: str = "doc_id",
                  text_col: str = "text", id_type=None,
                  num_buckets: int = 32, nrows: int | None = None):
    """Crawl-to-crawl corpus delta: one (id, status) row per id that is
    ``added`` (only in new), ``removed`` (only in old) or ``changed``
    (in both, different content); unchanged ids are dropped. Assumes
    ``id_col`` is unique within each snapshot (the corpus-table contract).

    Both snapshots slim to (id, sha256) before the ONE bucketed outer
    exchange — payload text never shuffles, so diffing two 100-TB crawls
    moves ~50 bytes/doc. This is the set-level companion of
    ``incremental_dedup`` (content-level novelty): diff answers "what
    happened to each id", incremental answers "which content is new"."""
    from ..pipelines.relational import choose_partitions, hash_join

    # nrows (combined snapshot row bound, e.g. from parquet footers) sizes
    # the exchange so a small diff doesn't scatter into empty range blocks
    num_buckets = choose_partitions(nrows, default=num_buckets)
    if id_type is None:
        id_type = dict(zip(ds_old.schema().names, ds_old.schema().types))[id_col]

    def make_slim(out_col: str):
        def slim(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            hs = [hashlib.sha256((t or "").encode("utf-8")).hexdigest()
                  for t in texts]
            return pa.table({id_col: batch.column(id_col),
                             out_col: pa.array(hs, type=pa.string())})
        return slim

    old = ds_old.map_batches(make_slim("h_old"), batch_format="pyarrow")
    new = ds_new.map_batches(make_slim("h_new"), batch_format="pyarrow")
    # both sides are slim (id, hash) — coalesce the union to the exchange
    # width so the sort never plans empty (schemaless) range blocks
    j = hash_join(old, new, key=id_col, how="outer",
                  num_buckets=num_buckets, coalesce_blocks=num_buckets,
                  left_types={id_col: id_type, "h_old": pa.string()},
                  right_types={id_col: id_type, "h_new": pa.string()})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype="object"),
                                 "status": pd.Series(dtype="object")})
        status = np.where(
            df["h_old"].isna(), "added",
            np.where(df["h_new"].isna(), "removed",
                     np.where(df["h_old"] != df["h_new"], "changed",
                              "unchanged")))
        out = pd.DataFrame({id_col: df[id_col], "status": status})
        return out.loc[out["status"] != "unchanged"]

    return j.map_batches(classify, batch_format="pandas")


# ---------------------------------------------------------------------------
# Edit-distance near-dup (PassJoin)
# ---------------------------------------------------------------------------

def _bucket_role_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """INDEX × PROBE pairs within each band bucket of a coarse partition —
    the PassJoin candidate step (unlike the LSH families' min-id-anchor
    pairing, whose missing pairs are recovered by connected components
    downstream, the output contract here is the full ed≤d pair set, so
    candidates must be complete — which index×probe is, by pigeonhole).
    Emits canonical (min, max) pairs; duplicates are dropped downstream."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=g["doc_id"].dtype),
                          "dup_of": pd.Series([], dtype=g["doc_id"].dtype)})
    if len(g) < 2:
        return empty
    g = g.sort_values(["band_key", "role", "doc_id"],
                      kind="mergesort").reset_index(drop=True)
    keys = g["band_key"].to_numpy()
    ids = g["doc_id"].to_numpy()
    roles = g["role"].to_numpy()
    change = np.r_[True, keys[1:] != keys[:-1]]
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], len(g)]
    a_parts, b_parts = [], []
    for st, en in zip(starts, ends):
        r = roles[st:en]
        n_idx = int(np.searchsorted(r, 1))  # roles sorted: 0=index first
        if n_idx == 0 or n_idx == en - st:
            continue
        idx_ids = ids[st:st + n_idx]
        probe_ids = ids[st + n_idx:en]
        a = np.repeat(idx_ids, len(probe_ids))
        b = np.tile(probe_ids, len(idx_ids))
        mask = a != b
        if not mask.any():
            continue
        a, b = a[mask], b[mask]
        a_parts.append(np.minimum(a, b))
        b_parts.append(np.maximum(a, b))
    if not a_parts:
        return empty
    return pd.DataFrame(
        {"doc_id": pd.Series(np.concatenate(a_parts), dtype=g["doc_id"].dtype),
         "dup_of": pd.Series(np.concatenate(b_parts), dtype=g["doc_id"].dtype)})


def editdist_dedup_edges(ds, *, key_col: str = "text", id_col: str = "doc_id",
                         max_dist: int = 2, concurrency=None,
                         broadcast_limit: int = 200_000):
    """ALL (doc_id, dup_of) pairs (doc_id < dup_of) whose ``key_col``
    strings are within Levenshtein distance ``max_dist`` — the sixth
    near-dup family (typo-level key dedup), PassJoin-style.

    Candidates-then-verify like the LSH families, but the candidate step
    is EXACT-COMPLETE, not probabilistic: ``passjoin_keys`` pigeonhole
    keys guarantee any pair within distance d meets index×probe in some
    bucket (functions/editdist.py), so the output equals the brute-force
    all-pairs answer — which is exactly what the DuckDB
    ``levenshtein()`` oracle replays. No all-pairs comparison ever runs:
    candidates are index×probe cross products confined to co-bucketed
    docs (same substring, same position class, tightened shift window).
    Verify pool carries only the short keys and is
    Bloom-prefiltered + broadcast under ``broadcast_limit``, bucket
    hash-joins above it (the ngram_jaccard two-tier shape)."""
    from ..functions.editdist import (char_matrix, levenshtein_leq_pairs,
                                      passjoin_keys)
    from ..pipelines.relational import hash_join

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        out_ids, out_keys, out_roles = [], [], []
        for i, s in zip(ids, keys):
            idx_keys, probe_keys = passjoin_keys(s or "", max_dist)
            for bk in idx_keys:
                out_ids.append(i)
                out_keys.append(bk)
                out_roles.append(0)
            for bk in probe_keys:
                out_ids.append(i)
                out_keys.append(bk)
                out_roles.append(1)
        return pa.table({id_col: pa.array(out_ids, type=batch.column(id_col).type),
                         "band_key": pa.array(out_keys, type=pa.string()),
                         "role": pa.array(out_roles, type=pa.int8())})

    kw = {"concurrency": concurrency} if concurrency else {}
    bands = ds.select_columns([id_col, key_col]).map_batches(
        explode, batch_format="pyarrow", **kw).materialize()

    if bands.count() == 0:
        return bands
    if bands.count() <= _COALESCE_BAND_LIMIT:
        cands = bands.repartition(1).map_batches(
            lambda g: _bucket_role_pairs(g).drop_duplicates(["doc_id", "dup_of"]),
            batch_format="pandas", batch_size=None).materialize()
    else:
        def add_part(batch: pa.Table) -> pa.Table:
            from ..pipelines.relational import vec_str_buckets

            parts = vec_str_buckets(batch.column("band_key").to_pandas(), 64)
            return batch.append_column("band_part",
                                       pa.array(parts, type=pa.int64()))

        parts = bands.map_batches(add_part, batch_format="pyarrow")
        cands = _distinct_edges(
            parts.groupby("band_part").map_groups(
                lambda g: _bucket_role_pairs(g), batch_format="pandas"),
            id_col="doc_id")
    if cands.count() == 0:
        return cands

    import ray as _ray

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    key_pool = _bloom_filtered_pool(ds, cands, id_col=id_col,
                                    value_col=key_col)

    if key_pool.count() <= broadcast_limit:
        # columnar broadcast: sorted ids + codepoint matrix; each verify
        # batch is ONE vectorized banded-DP call, not a per-pair loop
        kdf = key_pool.to_pandas().sort_values(id_col)
        mat, lens = char_matrix(kdf[key_col].tolist())
        lookup_ref = _ray.put((kdf[id_col].to_numpy(), mat, lens))

        def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df.reindex(columns=["doc_id", "dup_of"])
            ids_sorted, mat, lens = _ray.get(lookup_ref)
            ia = np.searchsorted(ids_sorted, df["doc_id"].to_numpy())
            ib = np.searchsorted(ids_sorted, df["dup_of"].to_numpy())
            keep = levenshtein_leq_pairs(mat[ia], lens[ia],
                                         mat[ib], lens[ib], max_dist)
            return df.loc[keep, ["doc_id", "dup_of"]]

        return cands.map_batches(verify_broadcast, batch_format="pandas",
                                 batch_size=None)

    keys_a = key_pool.map_batches(
        lambda b: b.rename_columns(["doc_id", "key_a"]), batch_format="pyarrow")
    keys_b = key_pool.map_batches(
        lambda b: b.rename_columns(["dup_of", "key_b"]), batch_format="pyarrow")
    cand_types = {"doc_id": id_type, "dup_of": id_type}
    j1 = hash_join(cands, keys_a, key="doc_id", num_buckets=16,
                   left_types=cand_types,
                   right_types={"doc_id": id_type, "key_a": pa.string()})
    j2 = hash_join(j1, keys_b, key="dup_of", num_buckets=16,
                   left_types={**cand_types, "key_a": pa.string()},
                   right_types={"dup_of": id_type, "key_b": pa.string()})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.reindex(columns=["doc_id", "dup_of"])
        mat_a, la = char_matrix(df["key_a"].tolist())
        mat_b, lb = char_matrix(df["key_b"].tolist())
        keep = levenshtein_leq_pairs(mat_a, la, mat_b, lb, max_dist)
        return df.loc[keep, ["doc_id", "dup_of"]]

    return j2.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHashSketch:
    """Actor-pool stage: text → 64-bit SimHash + 4×16-bit band keys."""

    def __init__(self, text_col: str = "text"):
        self.hasher = SimHasher()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.hasher.signatures(batch.column(self.text_col).to_pylist())
        return batch.append_column("simhash", pa.array(sigs, type=pa.uint64()))


def simhash_band_explode(batch: pa.Table, *, id_col: str = "doc_id") -> pa.Table:
    ids, keys, sigs = [], [], []
    for doc_id, sig in zip(batch.column(id_col).to_pylist(), batch.column("simhash").to_pylist()):
        for b in range(4):
            ids.append(doc_id)
            keys.append(f"{b}:{(sig >> (16 * b)) & 0xFFFF:04x}")
            sigs.append(sig)
    return pa.table({"band_key": pa.array(keys, type=pa.string()),
                     "doc_id": pa.array(ids, type=batch.column(id_col).type),
                     "simhash": pa.array(sigs, type=pa.uint64())})


def simhash_dedup_edges(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        max_hamming: int = 3, nrows: int | None = None):
    """(doc_id, dup_of) edges where hamming(simhash) ≤ max_hamming, found via
    4-band 16-bit LSH (any duplicate within distance 3 shares ≥1 band)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        # task-mode (SimHasher is stateless-cheap; no actor pool needed)
        hasher = SimHasher()
        sigs = hasher.signatures(batch.column(text_col).to_pylist())
        return batch.append_column("simhash", pa.array(sigs, type=pa.uint64()))

    return hamming_band_edges(
        ds.map_batches(sketch_batch, batch_format="pyarrow"),
        id_col=id_col, max_hamming=max_hamming, nrows=nrows)


def hamming_band_edges(sketched, *, id_col: str = "doc_id",
                       sig_col: str = "simhash", max_hamming: int = 3,
                       nrows: int | None = None):
    """Generic 64-bit-signature near-dup edges via 4×16-bit band LSH +
    vectorized hamming verify — the shared back half of
    ``simhash_dedup_edges`` (text) and image perceptual-hash dedup
    (stages/media.phash_dup_edges): any pair within hamming distance 3
    shares at least one of the 4 bands (pigeonhole). ``sketched`` must
    already carry the uint64 signature in ``sig_col``; rows with a null
    signature (e.g. undecodable images) are dropped before banding."""
    if sig_col != "simhash":
        sketched = sketched.map_batches(
            lambda b: b.rename_columns(
                ["simhash" if c == sig_col else c for c in b.column_names]),
            batch_format="pyarrow")
    sketched = sketched.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("simhash"))),
        batch_format="pyarrow")

    def partition_edges(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within-partition (coarse crc32 groupby; see minhash note)
        if len(g) < 2:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=g["doc_id"].dtype),
                                 "dup_of": pd.Series([], dtype=g["doc_id"].dtype)})
        g = g.sort_values(["band_key", "doc_id"], kind="mergesort").reset_index(drop=True)
        n = len(g)
        sigs = g["simhash"].to_numpy().astype(np.uint64)
        keys = g["band_key"].to_numpy()
        change = np.r_[True, keys[1:] != keys[:-1]]
        anchor_idx = np.flatnonzero(change)[np.cumsum(change) - 1]
        xor = (sigs ^ sigs[anchor_idx]).view(np.uint8).reshape(n, 8)
        hamming = np.unpackbits(xor, axis=1).sum(axis=1)
        mask = (hamming <= max_hamming) & (np.arange(n) != anchor_idx)
        ids = g["doc_id"].to_numpy()
        return pd.DataFrame({"doc_id": pd.Series(ids[mask], dtype=g["doc_id"].dtype),
                             "dup_of": pd.Series(ids[anchor_idx[mask]], dtype=g["doc_id"].dtype)})

    def add_part(batch: pa.Table) -> pa.Table:
        from ..pipelines.relational import vec_str_buckets

        parts = vec_str_buckets(batch.column("band_key").to_pandas(), 64)
        return batch.append_column("band_part", pa.array(parts, type=pa.int64()))

    bands = sketched.map_batches(simhash_band_explode, batch_format="pyarrow",
                                 fn_kwargs={"id_col": id_col})
    # zero-sort coalesce gate (see _lsh_candidate_pairs). With ``nrows``
    # (e.g. a parquet footer count — an upper bound is fine) the decision
    # is free; without it the SLIM band rows (band_key, id, sig ≈ 50 B —
    # never the payload) are materialized once to learn the count, which
    # is a sketch-scale pin the known-size scale path never pays.
    n_band_rows = nrows * 4 if nrows is not None else None
    if n_band_rows is None:
        bands = bands.materialize()
        n_band_rows = bands.count()
    if 0 < n_band_rows <= _COALESCE_BAND_LIMIT:
        return bands.repartition(1).map_batches(
            lambda g: partition_edges(g).drop_duplicates(["doc_id", "dup_of"]),
            batch_format="pandas", batch_size=None).materialize()
    parts = bands.map_batches(add_part, batch_format="pyarrow")
    edges = parts.groupby("band_part").map_groups(partition_edges, batch_format="pandas")
    # vectorized distinct (see minhash_dedup_edges)
    return _distinct_edges(edges)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (pairwise, for candidate pairs)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(texts_a: list[str], texts_b: list[str], n: int = 5) -> list[float]:
    """Exact character-n-gram Jaccard for aligned candidate pairs."""
    return [jaccard(char_ngrams(a or "", n), char_ngrams(b or "", n))
            for a, b in zip(texts_a, texts_b)]


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_edges(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                            threshold: float = 0.95, num_planes: int = 8,
                            num_bands: int = 4, seed: int = 42,
                            broadcast_limit: int = 200_000,
                            nrows: int | None = None):
    """Near-duplicate edges by cosine ≥ threshold, bucketed by BANDED
    random-hyperplane LSH: ``num_bands`` independent banks of
    ``num_planes`` hyperplanes each; vectors sharing ANY band's full sign
    pattern are compared (multi-band OR — recall 1-(1-p^r)^b instead of a
    single bank's p^r, fixing the near-plane recall loss of one bucket
    set).

    Same candidates-then-verify shape as ``minhash_dedup_edges``: band
    rows are SLIM (id, bucket) — an embedding is KBs and replicating it
    into every band would multiply the exchange num_bands× — candidates
    link to their bucket's min-id anchor, and exact cosine verification
    runs against a Bloom-prefiltered (candidate-scale) vector pool,
    broadcast when small, bucket-joined above ``broadcast_limit``.
    """
    import ray as _ray

    from ..pipelines.relational import _arrow_type, hash_join

    def add_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        # SLIM band rows: (id, bucket) only — no vector payload
        mat = np.stack(batch[vec_col].to_numpy())
        dim = mat.shape[1]
        planes = np.random.default_rng(seed).standard_normal(
            (dim, num_bands * num_planes))
        signs = (mat @ planes) >= 0
        ids, keys = [], []
        for b in range(num_bands):
            sl = signs[:, b * num_planes:(b + 1) * num_planes]
            ids.extend(batch[id_col].tolist())
            keys.extend(f"{b}:" + "".join("1" if x else "0" for x in row)
                        for row in sl)
        return pd.DataFrame({id_col: ids, "band_key": keys})

    def add_parts(df: pd.DataFrame) -> pd.DataFrame:
        from ..pipelines.relational import vec_str_buckets

        df = df.copy()
        df["band_part"] = vec_str_buckets(df["band_key"], 64)
        return df

    def partition_candidates(g: pd.DataFrame) -> pd.DataFrame:
        # per-bucket min-id anchor pairing, vectorized per coarse partition
        if len(g) < 2:
            return pd.DataFrame({id_col: pd.Series([], dtype=g[id_col].dtype),
                                 "dup_of": pd.Series([], dtype=g[id_col].dtype)})
        g = g.sort_values(["band_key", id_col], kind="mergesort").reset_index(drop=True)
        keys = g["band_key"].to_numpy()
        change = np.r_[True, keys[1:] != keys[:-1]]
        anchor_idx = np.flatnonzero(change)[np.cumsum(change) - 1]
        mask = np.arange(len(g)) != anchor_idx
        ids = g[id_col].to_numpy()
        return pd.DataFrame({id_col: pd.Series(ids[mask], dtype=g[id_col].dtype),
                             "dup_of": pd.Series(ids[anchor_idx[mask]],
                                                 dtype=g[id_col].dtype)})

    # zero-sort coalesce gate over the SLIM (id, band_key) rows (≈ 50
    # B/row, never the KB-scale vector). With ``nrows`` (footer count;
    # upper bound fine) the decision is free; otherwise materialize the
    # slim bands once to learn it — the known-size scale path skips that
    bands = ds.map_batches(add_buckets, batch_format="pandas")
    n_band_rows = nrows * num_bands if nrows is not None else None
    if n_band_rows is None:
        bands = bands.materialize()
        n_band_rows = bands.count()
    if 0 < n_band_rows <= _COALESCE_BAND_LIMIT:
        cands = bands.repartition(1).map_batches(
            lambda g: partition_candidates(g).drop_duplicates([id_col, "dup_of"]),
            batch_format="pandas", batch_size=None).materialize()
    else:
        parted = bands.map_batches(add_parts, batch_format="pandas")
        cands = parted.groupby("band_part").map_groups(partition_candidates,
                                                       batch_format="pandas")
        cands = _distinct_edges(cands, id_col=id_col)

    if cands.count() == 0:
        return cands

    # candidate-scale vector pool via the shared Bloom plumbing
    vec_pool = _bloom_filtered_pool(ds, cands, id_col=id_col,
                                    value_col=vec_col, pair_col=id_col)

    def _unit(v) -> np.ndarray:
        a = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(a)
        return a / n if n else a

    if vec_pool.count() <= broadcast_limit:
        pool_df = vec_pool.to_pandas()
        lookup_ref = _ray.put({i: _unit(v) for i, v in
                               zip(pool_df[id_col], pool_df[vec_col])})

        def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df.reindex(columns=[id_col, "dup_of"])
            lk = _ray.get(lookup_ref)
            a = np.stack([lk[i] for i in df[id_col]])
            b = np.stack([lk[i] for i in df["dup_of"]])
            sims = np.einsum("ij,ij->i", a, b)
            return df.loc[sims >= threshold, [id_col, "dup_of"]]

        return cands.map_batches(verify_broadcast, batch_format="pandas")

    # huge candidate set: bucket-join the vectors back onto the pairs
    lschema = ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    id_type = _arrow_type(ltypes[id_col])
    # derive the vector type from the source (list<float32> vs float64
    # matters: a hardcoded type would make the join union's typed-null
    # fill conflict with the pool's native blocks)
    vec_type = _arrow_type(ltypes[vec_col])
    if not pa.types.is_list(vec_type) and not pa.types.is_fixed_size_list(vec_type):
        vec_type = pa.list_(pa.float64())
    vecs_a = vec_pool.map_batches(
        lambda df: df.rename(columns={vec_col: "vec_a"}), batch_format="pandas")
    vecs_b = vec_pool.map_batches(
        lambda df: df.rename(columns={id_col: "dup_of", vec_col: "vec_b"}),
        batch_format="pandas")
    j1 = hash_join(cands, vecs_a, key=id_col, num_buckets=16,
                   left_types={id_col: id_type, "dup_of": id_type},
                   right_types={id_col: id_type, "vec_a": vec_type})
    j2 = hash_join(j1, vecs_b, key="dup_of", num_buckets=16,
                   left_types={id_col: id_type, "dup_of": id_type, "vec_a": vec_type},
                   right_types={"dup_of": id_type, "vec_b": vec_type})

    def verify_joined(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.reindex(columns=[id_col, "dup_of"])
        a = np.stack([_unit(v) for v in df["vec_a"]])
        b = np.stack([_unit(v) for v in df["vec_b"]])
        sims = np.einsum("ij,ij->i", a, b)
        return df.loc[sims >= threshold, [id_col, "dup_of"]]

    return j2.map_batches(verify_joined, batch_format="pandas")


def semdedup(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
             id_col: str = "vec_id", tau: float = 0.32,
             nrows: int | None = None):
    """SemDeDup (Abbas et al. 2023, public): semantic dedup by k-means
    clustering + within-cluster cosine pruning. A row is DROPPED iff some
    other row in the SAME cluster has cosine ≥ ``tau`` and a smaller id
    (the deterministic keep-lowest-id rule every near-dup stage here
    uses). Returns (id_col, cluster:int64, semdedup_keep:bool) per row.

    Distributed shape — this is the point of the algorithm: the quadratic
    all-pairs pass is confined to one cluster at a time. Vectors are
    exchanged exactly ONCE, partitioned by cluster id (the
    ``coarse_partition_apply`` gate coalesces tiny inputs to a single
    block with no key exchange); centroids ride in the task closure (a
    handful of float rows, never re-shipped per batch). Cluster sizes are
    bounded by choosing n_centroids ∝ corpus size (the paper's recipe —
    the query wrapper derives ``max(8, nrows // 4096)`` from the footer
    row count so clusters target ~4k vectors); the within-cluster pass is
    row-chunked so a hot cluster costs time, never worker memory. A
    pathologically hot cluster would LSH-band within the cluster —
    ``embedding_neardup_edges`` is exactly that machinery.

    Assignment is arg-max cosine against unit centroids, FIRST max on
    ties (numpy argmax) — replayed in SQL as ``row_number() OVER (ORDER
    BY list_cosine_similarity DESC, cid ASC) = 1`` like the knn_ivf
    oracle. ``centroids`` come from the deterministic driver-side
    ``similarity.kmeans_centroids`` on a bounded sample.
    """
    from ..pipelines.relational import coarse_partition_apply

    cent = np.asarray(centroids, dtype=np.float64)
    cn = np.linalg.norm(cent, axis=1)
    cn[cn == 0] = 1.0
    cent_unit = cent / cn[:, None]

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({id_col: batch[id_col],
                                 "cluster": pd.Series([], dtype="int64"),
                                 vec_col: batch[vec_col]})
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        cl = np.argmax((mat / n[:, None]) @ cent_unit.T, axis=1)
        return pd.DataFrame({id_col: batch[id_col],
                             "cluster": cl.astype("int64"),
                             vec_col: batch[vec_col]})

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        # partition-shape-independent: groups by the real cluster key
        # internally (coarse_partition_apply contract)
        if not len(g):
            return pd.DataFrame({id_col: g[id_col] if id_col in g else
                                 pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64"),
                                 "semdedup_keep": pd.Series([], dtype=bool)})
        parts = []
        for cl, sub in g.groupby("cluster", sort=True):
            mat = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(mat, axis=1)
            n[n == 0] = 1.0
            u = mat / n[:, None]
            ids = sub[id_col].to_numpy()
            # row-chunked dense blocks: the pairwise pass is O(n_c^2)
            # flops by design (SemDeDup's premise is that n_c is bounded
            # by centroid sizing), but memory must stay O(chunk × n_c),
            # not O(n_c^2) — a hot cluster would otherwise OOM the worker
            dup = np.zeros(len(u), dtype=bool)
            chunk = max(1, (1 << 22) // max(len(u), 1))
            for lo in range(0, len(u), chunk):
                hi = lo + chunk
                blk = u[lo:hi] @ u.T
                dup[lo:hi] = ((blk >= tau)
                              & (ids[None, :] < ids[lo:hi, None])).any(axis=1)
            parts.append(pd.DataFrame({
                id_col: ids, "cluster": np.full(len(ids), cl, dtype="int64"),
                "semdedup_keep": ~dup}))
        return pd.concat(parts, ignore_index=True)

    assigned = ds.map_batches(assign, batch_format="pandas")
    return coarse_partition_apply(assigned, prune, key_col="cluster",
                                  part_col="sd_part", num_parts=16,
                                  nrows=nrows)


# ---------------------------------------------------------------------------
# Connected components: exact duplicate-cluster resolution over an edge set
# ---------------------------------------------------------------------------

def connected_components(edges_ds, *, a_col: str = "doc_id", b_col: str = "dup_of",
                         max_rounds: int = 25, num_blocks: int | None = None):
    """Exact connected components over an undirected edge set: returns a
    Dataset of (doc_id, component_id) where component_id is the MIN doc id
    in the component — fixing the one-round min-label under-merge on chains
    A~B~C (module docstring): iterate label propagation to fixpoint.

    Distributed shape: the edge set (duplicate pairs — a small fraction of
    the corpus) stays in the cluster; each round is one hash-join of labels
    onto edges + a groupby-min, with labels REPARTITIONED to a fixed block
    count and materialized per round — without the repartition the block
    count compounds each round and the join's sort degrades quadratically
    (measured: 1 s → 112 s/round on a 13-node graph). Self-loop edges make
    each node its own label carrier, so no per-round union is needed.
    Rounds needed = graph diameter (duplicate clusters are shallow in
    practice); bounded by ``max_rounds``.

    ``num_blocks`` (the per-round label width), the per-round join's
    bucket count, and the min-label partition width all derive from the
    MEASURED symmetric-edge count (the edge set is materialized anyway,
    so ``count()`` is metadata-free) via the shared
    ``choose_partitions`` rule — a fixed width would concentrate the
    per-round exchange on one reducer at 100-TB edge sets.
    """
    from ..pipelines.relational import (choose_partitions, hash_join,
                                        vec_str_buckets)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        # both directions + self-loops (self-loop = label retention)
        src = pd.concat([df[a_col], df[b_col], df[a_col], df[b_col]],
                        ignore_index=True)
        dst = pd.concat([df[b_col], df[a_col], df[a_col], df[b_col]],
                        ignore_index=True)
        return pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()

    sym_edges = edges_ds.map_batches(sym, batch_format="pandas").materialize()
    n_edges = sym_edges.count()
    # lo=1 (was 8): a sub-block-size edge set runs single-block rounds —
    # forcing 8 buckets over a handful of keys guarantees empty sort
    # ranges (schemaless blocks + wasted reduce tasks) every round
    if num_blocks is None:
        num_blocks = choose_partitions(n_edges, default=8, lo=1, hi=256)
    join_buckets = choose_partitions(n_edges, default=8, lo=1, hi=256)
    part_width = 2 * num_blocks
    sym_edges = sym_edges.repartition(num_blocks).materialize()

    def group_min_labels(pairs_ds):
        """(node, label) pairs → per-node min label via the coarse-partition
        vectorized kernel (Ray's per-key aggregate fold costs ~ms of Python
        per node — prohibitive for per-round use on large dup graphs)."""

        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["cc_part"] = vec_str_buckets(df["node"], part_width)
            return df

        def kmin(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False).agg(label=("label", "min"))

        # coalesce to the partition width before the sort: one output
        # range per input block, so surplus blocks over ≤part_width
        # distinct cc_part values become empty schemaless ranges
        return (pairs_ds.map_batches(add_part, batch_format="pandas")
                .repartition(part_width)
                .groupby("cc_part").map_groups(kmin, batch_format="pandas"))

    # init: label(node) = min(node, min direct neighbor)
    def init_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["src"], "label": df[["src", "dst"]].min(axis=1)})

    labels = group_min_labels(
        sym_edges.map_batches(init_pairs, batch_format="pandas")).repartition(
        num_blocks).materialize()

    for _ in range(max_rounds):
        lab_src = labels.map_batches(
            lambda df: df.rename(columns={"node": "src", "label": "cand"}),
            batch_format="pandas")
        j = hash_join(sym_edges, lab_src, key="src", num_buckets=join_buckets,
                      coalesce_blocks=join_buckets)
        new_labels = group_min_labels(j.map_batches(
            lambda df: pd.DataFrame({"node": df["dst"], "label": df["cand"]}),
            batch_format="pandas")).repartition(num_blocks).materialize()
        # converged when no label changed (labels only ever decrease)
        cmp = hash_join(labels, new_labels, key="node",
                        num_buckets=join_buckets,
                        coalesce_blocks=join_buckets)
        changed = cmp.map_batches(
            lambda df: pd.DataFrame({"n": [int((df["label"] != df["label_r"]).sum())]}),
            batch_format="pandas").sum("n")
        labels = new_labels
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} rounds "
            "(component diameter exceeds the cap); raise max_rounds — "
            "returning unconverged labels would silently split real clusters")

    return labels.map_batches(
        lambda df: df.rename(columns={"node": a_col, "label": "component_id"}),
        batch_format="pandas")


def exact_dedup_salted(ds, *, text_col: str = "text", id_col: str = "doc_id",
                       num_salts: int = 16):
    """Two-phase salted exact dedup for hot-key robustness (north rule).

    Phase 1 groups by (salt, content_hash) — a pathologically common payload
    (e.g. an empty doc repeated 10^9 times) splits across ``num_salts``
    buckets instead of landing on one reducer; each bucket keeps its min-id
    row. Phase 2 groups the ≤num_salts survivors per hash and keeps the
    global min-id row. Output equals exact_dedup() on any input.
    """
    import pyarrow.compute as pc

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})

    def add_salt(batch: pa.Table) -> pa.Table:
        from ..pipelines.relational import vec_str_buckets

        # a fixed-key vectorized hash, not builtin hash(): Python's str
        # hash is per-process randomized
        salts = vec_str_buckets(batch.column(id_col).to_pandas(), num_salts)
        return batch.append_column("dedup_salt", pa.array(salts, type=pa.int64()))

    # both phases use the coarse-partition vectorized kernel (per-key
    # map_groups costs ~ms of Python per group). Phase 1 partitions by
    # hash(content_hash ∥ salt) so a hot hash's salted buckets spread
    # across partitions; phase 2 by hash(content_hash) alone — both via
    # the deterministic vectorized composite hash.
    def add_part(cols):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.select(list(cols)).to_pandas()
            parts = (pd.util.hash_pandas_object(df, index=False).to_numpy()
                     % 64).astype("int64")
            return batch.append_column("sd_part", pa.array(parts, type=pa.int64()))
        return fn

    def keep_min(group_cols):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values([*group_cols, id_col], kind="mergesort")
            return g.drop_duplicates(group_cols, keep="first").drop(
                columns=["sd_part"])
        return fn

    salted = hashed.map_batches(add_salt, batch_format="pyarrow")
    phase1 = salted.map_batches(add_part(["content_hash", "dedup_salt"]),
                                batch_format="pyarrow").groupby(
        "sd_part").map_groups(keep_min(["dedup_salt", "content_hash"]),
                              batch_format="pandas")
    phase2 = phase1.map_batches(add_part(["content_hash"]),
                                batch_format="pyarrow").groupby(
        "sd_part").map_groups(keep_min(["content_hash"]), batch_format="pandas")
    return phase2.map_batches(lambda b: b.drop_columns(["dedup_salt"]),
                              batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (token-window granularity)
# ---------------------------------------------------------------------------


def _window_partial_counts(batch: pa.Table, *, text_col: str, width: int) -> pa.Table:
    """Per-batch combiner for pass A: distinct window hashes + local counts.

    The exchange downstream carries one (hash, count) pair per distinct
    window per batch — never a row per occurrence, never any text."""
    from ..functions.minhash import token_window_hashes

    parts = [token_window_hashes(t, width)
             for t in batch.column(text_col).to_pylist()]
    allh = np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint64)
    vals, counts = np.unique(allh, return_counts=True)
    return pa.table({"h": pa.array(vals, type=pa.uint64()),
                     "cnt": pa.array(counts, type=pa.int64())})


def _dup_hash_set(ds, *, text_col: str, width: int, min_count: int):
    """Pass A: global window-hash counts → materialized slim Dataset of
    hashes occurring ≥ min_count times corpus-wide. The gate/exchange
    shape is the shared house pattern (coarse_partition_apply): zero-sort
    coalesce below COALESCE_ROW_LIMIT partial rows, coarse key-hash
    partitions above."""
    from ..pipelines.relational import coarse_partition_apply

    partials = ds.map_batches(
        _window_partial_counts, fn_kwargs={"text_col": text_col, "width": width},
        batch_format="pyarrow").materialize()  # slim (h, cnt) only

    def count_kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("h", as_index=False)["cnt"].sum()
        return agg.loc[agg["cnt"] >= min_count, ["h", "cnt"]]

    return coarse_partition_apply(partials, count_kernel, key_col="h",
                                  part_col="h_part", num_parts=64,
                                  nrows=partials.count()).materialize()


def _exchange_parts(n_est: int) -> int:
    """Exchange width for an above-gate slim semi-join, sized from a
    driver-side count estimate (the shared ``choose_partitions`` rule)
    instead of the historical fixed 64 — 64 ranges over a small forced
    run scatter the sort into empty partitions and ~7 s of pure task
    scheduling (measured in the round-5 gates-forced bench), while 64
    over 100 TB under-spreads. Estimates may undershoot on pathological
    hot-key corpora (one window duplicated millions of times); those skew
    ANY hash partitioning and are the documented limitation of the
    h-partition family, not of the sizing."""
    from ..pipelines.relational import choose_partitions

    return choose_partitions(max(n_est, 1), default=64, lo=1)


def _keyed_groups(both, kernel, part_col: str, npart: int):
    """``groupby(part_col).map_groups(kernel)`` with the zero-sort
    coalesce when the exchange is single-partition: kernels passed here
    are partition-shape-independent (coarse_partition_apply contract),
    so one coalesced block through one kernel call replaces a sort
    barrier whose every range but one would be empty.

    Every caller's input is SLIM by contract (ids/hashes/positions —
    never text), so above one partition the union first coalesces to
    ``npart`` blocks: the sort emits one range per input block, and N
    tiny blocks over npart bucket values would otherwise yield N−npart
    schemaless empties (the RefBundle schema-drift warning — the r3
    mechanism, BENCH/TUNING.md)."""
    if npart <= 1:
        return both.repartition(1).map_batches(kernel, batch_format="pandas",
                                               batch_size=None)
    # small exchanges collapse to ~8 buckets per sort range (the
    # collapse_partials rule): ranges == input blocks, and with one range
    # per bucket the sampled quantiles on duplicated int keys routinely
    # leave ranges empty (schema-drift warnings); big exchanges keep full
    # width — dense keys populate every range
    blocks = npart if npart > 64 else max(2, -(-npart // 8))
    return (both.repartition(blocks)
            .groupby(part_col).map_groups(kernel, batch_format="pandas"))


def _broadcast_sorted_hashes(dup_ds):
    """Collect a slim hash Dataset's ``h`` column to the driver as a sorted
    uint64 array and pin it once via ray.put — the shared broadcast step of
    duplicate_spans / strip_duplicate_spans / contamination. Callers gate
    the collect size before calling."""
    import ray as _ray

    arrs = [b.column("h").to_numpy(zero_copy_only=False)
            for b in dup_ds.select_columns(["h"]).iter_batches(
                batch_format="pyarrow")]
    dup_sorted = (np.sort(np.concatenate(arrs)) if arrs
                  else np.zeros(0, dtype=np.uint64))
    return dup_sorted, _ray.put(dup_sorted)


def _mark_spans(hs: np.ndarray, dup_sorted: np.ndarray, width: int):
    """Positions whose window hash is duplicated → merged maximal token
    intervals. Windows are equal-width, so two marked positions merge iff
    their gap is ≤ width (interval overlap-or-adjacency)."""
    if len(hs) == 0 or len(dup_sorted) == 0:
        return []
    idx = np.searchsorted(dup_sorted, hs)
    hit = np.flatnonzero((idx < len(dup_sorted)) & (dup_sorted[np.minimum(idx, len(dup_sorted) - 1)] == hs))
    if len(hit) == 0:
        return []
    breaks = np.flatnonzero(np.diff(hit) > width)
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [len(hit) - 1]])
    return [(int(hit[s]), int(hit[e]) + width - 1, int(e - s + 1))
            for s, e in zip(starts, ends)]


def duplicate_spans(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    width: int = 8, min_count: int = 2,
                    broadcast_limit: int = 2_000_000):
    """Exact-substring duplicate-span detection: every ``width``-token
    window whose exact text occurs ≥ ``min_count`` times corpus-wide marks
    its token interval; overlapping/adjacent marked intervals merge into
    maximal per-doc spans (the span-granular exact dedup of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better" —
    public algorithm family, re-expressed over window hashes instead of a
    suffix array so it fits a two-pass Ray Data shape).

    Scale design: pass A ships only per-batch-combined (uint64 hash,
    count) pairs — no positions, no text; pass B re-derives window hashes
    locally (recompute beats shipping one row per token position through
    a shuffle) and checks membership against the duplicated-hash set,
    broadcast once via ray.put as a sorted array when ≤ broadcast_limit.
    Above the limit, batches semi-join the pinned dup set per
    hash-partition slice instead (no driver materialization).

    Returns one row per maximal span: (id_col, span_start, span_end,
    span_tokens, n_dup_windows) — token indices, 0-based inclusive.
    Window hash is DuckDB-reproducible md5 (functions/minhash.py:
    token_window_hashes), so the whole operator is SQL-oracle-checkable.
    """
    dup_ds = _dup_hash_set(ds, text_col=text_col, width=width,
                           min_count=min_count)
    return _span_rows(ds, dup_ds, text_col=text_col, id_col=id_col,
                      width=width, broadcast_limit=broadcast_limit)


def _span_rows(ds, dup_ds, *, text_col: str, id_col: str, width: int,
               broadcast_limit: int):
    """Span detection against a PRECOMPUTED duplicated-hash Dataset — the
    shared back half of ``duplicate_spans`` and the above-gate path of
    ``strip_duplicate_spans`` (which already holds the dup set and must
    not recompute the corpus-wide hash-count pass)."""
    import ray as _ray

    from ..functions.minhash import token_window_hashes

    n_dup = dup_ds.count()

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([
        (id_col, id_type), ("span_start", pa.int64()), ("span_end", pa.int64()),
        ("span_tokens", pa.int64()), ("n_dup_windows", pa.int64()),
    ])

    if n_dup <= broadcast_limit:
        _, dup_ref = _broadcast_sorted_hashes(dup_ds)

        def mark(batch: pa.Table) -> pa.Table:
            dup: np.ndarray = _ray.get(dup_ref)  # plasma zero-copy after first
            ids, ss, ee, tt, nn = [], [], [], [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                for s, e, n_w in _mark_spans(
                        token_window_hashes(t or "", width), dup, width):
                    ids.append(i); ss.append(s); ee.append(e)
                    tt.append(e - s + 1); nn.append(n_w)
            return pa.table({id_col: pa.array(ids, type=id_type),
                             "span_start": pa.array(ss, type=pa.int64()),
                             "span_end": pa.array(ee, type=pa.int64()),
                             "span_tokens": pa.array(tt, type=pa.int64()),
                             "n_dup_windows": pa.array(nn, type=pa.int64())},
                            schema=out_schema)

        return ds.map_batches(mark, batch_format="pyarrow")

    # Above the broadcast gate: the dup set itself stays distributed, but a
    # FIXED-SIZE Bloom filter over it broadcasts cheaply (bit-array size is
    # set by (capacity, fp_rate), not by shipping the hashes), so each batch
    # probes BEFORE the exchange and ships only (id, pos, h) rows whose
    # window might be duplicated. Bloom false positives survive to the
    # exact per-partition semi-join below — exactness preserved; the same
    # prefilter-then-verify shape as the minhash verify pool.
    from ..functions.bloom import build_bloom_distributed

    bloom = build_bloom_distributed(dup_ds, "h", capacity=2 * max(n_dup, 1))
    bloom_ref = _ray.put(bloom)
    # exchange width from the known dup-hash count: position rows ≈
    # occurrences of duplicated windows ≈ a small multiple of n_dup
    npart = _exchange_parts(4 * n_dup)

    def add_hpart_rows(batch: pa.Table) -> pa.Table:
        bf = _ray.get(bloom_ref)
        ids, poss, hss = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            hs = token_window_hashes(t or "", width)
            keep = np.flatnonzero(bf.contains_many(hs)) if len(hs) else []
            ids.extend([i] * len(keep))
            poss.extend(int(p) for p in keep)
            hss.append(hs[keep])
        h = (np.concatenate(hss) if hss else np.zeros(0, dtype=np.uint64))
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "pos": pa.array(poss, type=pa.int64()),
                         "h": pa.array(h, type=pa.uint64()),
                         "h_part": pa.array((h % np.uint64(npart)).astype(np.int64))})

    def add_hpart_dups(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.nulls(len(h), type=id_type),
                         "pos": pa.nulls(len(h), type=pa.int64()),
                         "h": batch.column("h"),
                         "h_part": pa.array((h % np.uint64(npart)).astype(np.int64))})

    positions = ds.map_batches(add_hpart_rows, batch_format="pyarrow")
    dups = dup_ds.select_columns(["h"]).map_batches(add_hpart_dups,
                                                    batch_format="pyarrow")

    id_is_int = pa.types.is_integer(id_type)

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        dup_h = g.loc[g["pos"].isna(), "h"].unique()
        rows = g.loc[g["pos"].notna() & g["h"].isin(dup_h),
                     [id_col, "pos"]].copy()
        # the union's typed nulls dilute int64 → float64 in pandas blocks;
        # restore exact dtypes (same fix as hash_join — BENCH/TUNING.md)
        rows["pos"] = rows["pos"].astype("int64")
        if id_is_int:
            rows[id_col] = rows[id_col].astype("int64")
        return rows

    marked = _keyed_groups(positions.union(dups), semi, "h_part", npart)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in (id_col, "span_start", "span_end",
                               "span_tokens", "n_dup_windows")}
        for i, sub in g.groupby(id_col, sort=True):
            pos = np.sort(sub["pos"].to_numpy(dtype=np.int64))
            breaks = np.flatnonzero(np.diff(pos) > width)
            starts = np.concatenate([[0], breaks + 1])
            ends = np.concatenate([breaks, [len(pos) - 1]])
            for s, e in zip(starts, ends):
                out[id_col].append(i)
                out["span_start"].append(int(pos[s]))
                out["span_end"].append(int(pos[e]) + width - 1)
                out["span_tokens"].append(int(pos[e]) + width - int(pos[s]))
                out["n_dup_windows"].append(int(e - s + 1))
        return pd.DataFrame(out)

    from ..pipelines.relational import coarse_partition_apply

    # marked rows ≤ the position rows the same estimate sized above; the
    # fold kernel is partition-shape-independent, so the estimate only
    # steers exchange width / coalesce, never the answer
    return coarse_partition_apply(marked, fold, key_col=id_col,
                                  part_col="id_part", num_parts=npart,
                                  nrows=4 * n_dup)


def strip_duplicate_spans(ds, *, text_col: str = "text", id_col: str = "doc_id",
                          width: int = 8, min_count: int = 2,
                          broadcast_limit: int = 2_000_000):
    """Corpus rewrite that REMOVES every token covered by a duplicated
    window (the consumption side of ``duplicate_spans`` — Lee et al.
    2022's span-granular dedup applied to the text itself).

    Deliberately aggressive: ALL occurrences of duplicated material are
    stripped, not all-but-one. Keeping one survivor occurrence requires a
    global (doc, position) order tie-break — another corpus-wide exchange
    for a policy the paper itself treats as a free choice; the all-strip
    contract is order-free, one broadcast cheaper, and exactly
    SQL-replayable. Rebuilt text joins surviving tokens with single
    spaces (original whitespace runs are not preserved — tokens are the
    unit of this operator).

    Returns one row per input doc: (id_col, clean_text, n_tokens_kept,
    n_tokens_removed)."""
    import ray as _ray

    from ..functions.minhash import _ASCII_WS, token_window_hashes

    dup_ds = _dup_hash_set(ds, text_col=text_col, width=width,
                           min_count=min_count)
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([
        (id_col, id_type), ("clean_text", pa.string()),
        ("n_tokens_kept", pa.int64()), ("n_tokens_removed", pa.int64())])

    def _rebuild_row(t: str, intervals) -> tuple[str, int, int]:
        toks = [tok for tok in _ASCII_WS.split(t or "") if tok]
        cover = np.zeros(len(toks), dtype=bool)
        for s, e in intervals:
            cover[s:e + 1] = True
        kept = [tok for tok, c in zip(toks, cover) if not c]
        return " ".join(kept), len(kept), len(toks) - len(kept)

    if dup_ds.count() <= broadcast_limit:
        _, dup_ref = _broadcast_sorted_hashes(dup_ds)

        def strip(batch: pa.Table) -> pa.Table:
            dup: np.ndarray = _ray.get(dup_ref)
            ids, texts, kept_n, removed_n = [], [], [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                spans = [(s, e) for s, e, _nw in _mark_spans(
                    token_window_hashes(t or "", width), dup, width)]
                clean, k, r = _rebuild_row(t, spans)
                ids.append(i); texts.append(clean)
                kept_n.append(k); removed_n.append(r)
            return pa.table({id_col: pa.array(ids, type=id_type),
                             "clean_text": pa.array(texts, type=pa.string()),
                             "n_tokens_kept": pa.array(kept_n, type=pa.int64()),
                             "n_tokens_removed": pa.array(removed_n, type=pa.int64())},
                            schema=out_schema)

        return ds.map_batches(strip, batch_format="pyarrow")

    # ABOVE THE GATE — two tiers, neither materializes the dup set on the
    # driver. Tier 1: the dup HASHES exceed the gate but the maximal SPAN
    # rows (far fewer: runs of windows collapse) usually don't — compute
    # spans via the shared semi-join machinery (_span_rows, no recompute
    # of the hash-count pass) and broadcast the slim (id, start, end)
    # rows; text still never shuffles.
    spans = _span_rows(ds, dup_ds, text_col=text_col, id_col=id_col,
                       width=width, broadcast_limit=broadcast_limit
                       ).materialize()
    if spans.count() <= broadcast_limit:
        sdf = (spans.select_columns([id_col, "span_start", "span_end"])
               .to_pandas().sort_values([id_col, "span_start"]))
        ids_sorted = sdf[id_col].to_numpy()
        bounds_ref = _ray.put((ids_sorted,
                               sdf["span_start"].to_numpy(np.int64),
                               sdf["span_end"].to_numpy(np.int64)))

        def strip_bcast(batch: pa.Table) -> pa.Table:
            ids_s, st, en = _ray.get(bounds_ref)
            ids, texts, kept_n, removed_n = [], [], [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                lo = np.searchsorted(ids_s, i, side="left")
                hi = np.searchsorted(ids_s, i, side="right")
                clean, k, r = _rebuild_row(t, zip(st[lo:hi], en[lo:hi]))
                ids.append(i); texts.append(clean)
                kept_n.append(k); removed_n.append(r)
            return pa.table({id_col: pa.array(ids, type=id_type),
                             "clean_text": pa.array(texts, type=pa.string()),
                             "n_tokens_kept": pa.array(kept_n, type=pa.int64()),
                             "n_tokens_removed": pa.array(removed_n, type=pa.int64())},
                            schema=out_schema)

        return ds.map_batches(strip_bcast, batch_format="pyarrow")

    # Tier 2: even the span rows exceed the gate (dup-saturated corpus) —
    # ONE text exchange, co-partitioned with the span rows by doc id (the
    # only path that ever moves text; documented partitioning assumption:
    # a doc's text row and all its span rows share an id-hash partition).
    from ..pipelines.relational import coarse_partition_apply

    def doc_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({id_col: batch.column(id_col),
                         "strip_text": pc.cast(batch.column(text_col),
                                               pa.string()),
                         "span_start": pa.nulls(n, type=pa.int64()),
                         "span_end": pa.nulls(n, type=pa.int64()),
                         "strip_side": pa.array(np.zeros(n, dtype=np.int64))})

    def span_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({id_col: batch.column(id_col),
                         "strip_text": pa.nulls(n, type=pa.string()),
                         "span_start": pc.cast(batch.column("span_start"),
                                               pa.int64()),
                         "span_end": pc.cast(batch.column("span_end"),
                                             pa.int64()),
                         "strip_side": pa.array(np.ones(n, dtype=np.int64))})

    both = ds.map_batches(doc_side, batch_format="pyarrow").union(
        spans.map_batches(span_side, batch_format="pyarrow"))
    id_is_int = pa.types.is_integer(id_type)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["strip_side"] == 0]
        sp = g[g["strip_side"] == 1]
        by_id: dict = {}
        if len(sp):
            st = sp["span_start"].to_numpy(dtype=np.int64)
            en = sp["span_end"].to_numpy(dtype=np.int64)
            for j, i in enumerate(sp[id_col].to_numpy()):
                by_id.setdefault(i, []).append((int(st[j]), int(en[j])))
        out = {id_col: [], "clean_text": [], "n_tokens_kept": [],
               "n_tokens_removed": []}
        for i, t in zip(docs[id_col].to_numpy(), docs["strip_text"]):
            clean, k, r = _rebuild_row(t, by_id.get(i, ()))
            out[id_col].append(i); out["clean_text"].append(clean)
            out["n_tokens_kept"].append(k); out["n_tokens_removed"].append(r)
        df = pd.DataFrame(out)
        if id_is_int and len(df):  # union nulls never touch the id column,
            df[id_col] = df[id_col].astype("int64")  # but be explicit
        return df

    # num_parts from the known span count; nrows stays None — text rides
    # this exchange, so the slim-row coalesce gate must NOT collapse it
    return coarse_partition_apply(both, rebuild, key_col=id_col,
                                  part_col="strip_part",
                                  num_parts=_exchange_parts(2 * spans.count()),
                                  nrows=None)


def contamination(train_ds, test_ds, *, text_col: str = "text",
                  id_col: str = "doc_id", width: int = 8,
                  broadcast_limit: int = 2_000_000):
    """Train/test contamination (decontamination) check: for every TRAIN
    document, how many of its ``width``-token windows also occur anywhere
    in the TEST set — the n-gram-overlap test used to decontaminate
    benchmark sets from training corpora (public practice, e.g. the
    GPT-3/C4 appendix methodology).

    The test side reduces to its distinct window-hash set via the same
    slim (hash, count) partial pass as ``duplicate_spans`` and broadcasts
    once as a sorted uint64 array when ≤ ``broadcast_limit`` (a benchmark
    set is normally the small side); the train corpus is then scanned
    locally — no shuffle at any size. Above the gate a fixed-size Bloom
    filter over the test hashes broadcasts instead, each train batch
    ships only (id, hash) rows whose window MIGHT be contaminated
    (plus one slim per-doc anchor row carrying n_windows), and a
    per-hash-partition semi-join confirms exactly — the same
    prefilter-then-verify shape as ``duplicate_spans``' above-gate path;
    train text never shuffles on either path.

    Returns one row per train doc: (id_col, n_windows, n_contaminated,
    contaminated)."""
    import ray as _ray

    from ..functions.minhash import token_window_hashes

    test_hashes = _dup_hash_set(test_ds, text_col=text_col, width=width,
                                min_count=1)
    n_test = test_hashes.count()
    id_type = dict(zip(train_ds.schema().names, train_ds.schema().types))[id_col]

    if n_test <= broadcast_limit:
        _, test_ref = _broadcast_sorted_hashes(test_hashes)

        def mark(batch: pa.Table) -> pa.Table:
            tset: np.ndarray = _ray.get(test_ref)
            ids, n_win, n_cont = [], [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                hs = token_window_hashes(t or "", width)
                ids.append(i)
                n_win.append(len(hs))
                n_cont.append(_sorted_hits(hs, tset))
            return pa.table({
                id_col: pa.array(ids, type=id_type),
                "n_windows": pa.array(n_win, type=pa.int64()),
                "n_contaminated": pa.array(n_cont, type=pa.int64()),
                "contaminated": pa.array([c > 0 for c in n_cont], type=pa.bool_()),
            })

        return train_ds.map_batches(mark, batch_format="pyarrow")

    # ABOVE THE GATE: Bloom prefilter → per-slice exact semi-join →
    # one slim (id, n_windows, n_cont) group-sum. One scan of train.
    from ..functions.bloom import build_bloom_distributed
    from ..pipelines.relational import partitioned_group_sum, vec_str_buckets

    bloom_ref = _ray.put(build_bloom_distributed(
        test_hashes, "h", capacity=2 * max(n_test, 1)))
    # exchange width from the known test-hash count (candidate rows ≈ a
    # small multiple of the test windows they must meet)
    npart = _exchange_parts(4 * n_test)

    def emit(batch: pa.Table) -> pa.Table:
        """Per doc: ONE anchor row (side=1, n_windows; h=0 is inert — the
        slice kernel selects by side, never by hash value) plus one
        candidate row per bloom-hit window POSITION (side=0)."""
        bf = _ray.get(bloom_ref)
        ids, sides, nwins, hss = [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            hs = token_window_hashes(t or "", width)
            ids.append(i); sides.append(1); nwins.append(len(hs))
            if len(hs):
                hit = hs[bf.contains_many(hs)]
                ids.extend([i] * len(hit))
                sides.extend([0] * len(hit))
                nwins.extend([0] * len(hit))
                hss.append(hit)
        h = np.concatenate(hss) if hss else np.zeros(0, dtype=np.uint64)
        full_h = np.zeros(len(ids), dtype=np.uint64)
        cand = np.asarray(sides) == 0
        full_h[cand] = h
        # anchors spread by id hash; candidates co-partition with the
        # test hashes they must meet
        part = vec_str_buckets([str(v) for v in ids], npart)
        part[cand] = (h % np.uint64(npart)).astype(np.int64)
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "side": pa.array(sides, type=pa.int64()),
                         "n_windows": pa.array(nwins, type=pa.int64()),
                         "h": pa.array(full_h, type=pa.uint64()),
                         "c_part": pa.array(part, type=pa.int64())})

    def test_side(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        n = len(h)
        return pa.table({id_col: pa.nulls(n, type=id_type),
                         "side": pa.array(np.full(n, 2, dtype=np.int64)),
                         "n_windows": pa.array(np.zeros(n, dtype=np.int64)),
                         "h": batch.column("h"),
                         "c_part": pa.array((h % np.uint64(npart)).astype(np.int64))})

    both = train_ds.map_batches(emit, batch_format="pyarrow").union(
        test_hashes.select_columns(["h"]).map_batches(
            test_side, batch_format="pyarrow"))
    id_is_int = pa.types.is_integer(id_type)

    def slice_kernel(g: pd.DataFrame) -> pd.DataFrame:
        th = g.loc[g["side"] == 2, "h"].unique()
        anchors = g[g["side"] == 1]
        cands = g[g["side"] == 0]
        hits = cands[cands["h"].isin(th)]
        cnt = hits.groupby(id_col, dropna=False).size()
        out = pd.DataFrame({
            id_col: pd.concat([anchors[id_col],
                               cnt.index.to_series()], ignore_index=True),
            "n_windows": pd.concat(
                [anchors["n_windows"],
                 pd.Series(0, index=range(len(cnt)))], ignore_index=True),
            "n_cont": pd.concat(
                [pd.Series(0, index=range(len(anchors))),
                 pd.Series(cnt.to_numpy())], ignore_index=True)})
        # the union's typed nulls dilute ints to float64 — restore
        out["n_windows"] = out["n_windows"].fillna(0).astype("int64")
        out["n_cont"] = out["n_cont"].astype("int64")
        if id_is_int and len(out):
            out[id_col] = out[id_col].astype("int64")
        return out

    # materialize the slim partials so the group-sum exchange can be
    # sized from the real row count (anchors + hit groups) instead of the
    # fixed default — the same materialize+count pattern as _dup_hash_set
    partials = _keyed_groups(both, slice_kernel, "c_part", npart).materialize()
    n_partials = partials.count()
    summed = partitioned_group_sum(
        partials, key=id_col,
        sum_cols={"n_windows": "n_windows", "n_contaminated": "n_cont"},
        num_parts=_exchange_parts(n_partials), nrows=n_partials)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["contaminated"] = df["n_contaminated"] > 0
        if id_is_int and len(df):
            df[id_col] = df[id_col].astype("int64")
        return df[[id_col, "n_windows", "n_contaminated", "contaminated"]]

    return summed.map_batches(finish, batch_format="pandas")


def _sorted_hits(hs: np.ndarray, tset: np.ndarray) -> int:
    """How many of ``hs`` occur in the SORTED uint64 array ``tset``
    (searchsorted membership — the shared probe of contamination /
    drop_contaminated)."""
    if not (len(hs) and len(tset)):
        return 0
    idx = np.searchsorted(tset, hs)
    return int(((idx < len(tset))
                & (tset[np.minimum(idx, len(tset) - 1)] == hs)).sum())


def drop_contaminated(train_ds, test_ds, *, text_col: str = "text",
                      width: int = 8, broadcast_limit: int = 2_000_000):
    """Decontamination as a FILTER: drop every train row that shares at
    least one ``width``-token window with the test set, keeping all input
    columns (``contamination`` reports; this enforces).

    Below the gate the test set's distinct window hashes broadcast once
    as a sorted uint64 array and the train side is scanned locally — no
    shuffle at any size. Above it: Bloom prefilter → per-slice exact
    semi-join keyed by a TEXT hash (rows with identical text are
    contamination-equivalent, so text-hash identity is exact for this
    predicate — no synthetic row id needed, which would not survive lazy
    re-execution) → one anti-join of the train rows against the confirmed
    contaminated text-hash set; train payloads shuffle once, in that
    anti-join only."""
    import ray as _ray

    from ..functions.minhash import token_window_hashes

    test_hashes = _dup_hash_set(test_ds, text_col=text_col, width=width,
                                min_count=1)
    n_test = test_hashes.count()

    if n_test <= broadcast_limit:
        _, test_ref = _broadcast_sorted_hashes(test_hashes)

        def keep(batch: pa.Table) -> pa.Table:
            tset: np.ndarray = _ray.get(test_ref)
            mask = [_sorted_hits(token_window_hashes(t or "", width), tset) == 0
                    for t in batch.column(text_col).to_pylist()]
            return batch.filter(pa.array(mask))

        return train_ds.map_batches(keep, batch_format="pyarrow")

    # ABOVE THE GATE
    from ..functions.bloom import build_bloom_distributed
    from ..functions.hashing import md5_u64
    from ..pipelines.relational import semi_anti_join

    bloom_ref = _ray.put(build_bloom_distributed(
        test_hashes, "h", capacity=2 * max(n_test, 1)))
    npart = _exchange_parts(4 * n_test)

    def cand_rows(batch: pa.Table) -> pa.Table:
        """(text_hash, window_hash, slice) per bloom-hit window — slim,
        per-batch distinct."""
        bf = _ray.get(bloom_ref)
        ths, hss = [], []
        for t in batch.column(text_col).to_pylist():
            hs = token_window_hashes(t or "", width)
            if len(hs) == 0:
                continue
            hit = np.unique(hs[bf.contains_many(hs)])
            if len(hit):
                ths.extend([t] * len(hit))
                hss.append(hit)
        h = np.concatenate(hss) if hss else np.zeros(0, dtype=np.uint64)
        th = md5_u64(ths)
        return pa.table({"th": pa.array(th, type=pa.uint64()),
                         "h": pa.array(h, type=pa.uint64()),
                         "side": pa.array(np.zeros(len(th), dtype=np.int64)),
                         "dc_part": pa.array((h % np.uint64(npart)).astype(np.int64))})

    def test_side(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        n = len(h)
        return pa.table({"th": pa.array(np.zeros(n, dtype=np.uint64)),
                         "h": batch.column("h"),
                         "side": pa.array(np.ones(n, dtype=np.int64)),
                         "dc_part": pa.array((h % np.uint64(npart)).astype(np.int64))})

    both = train_ds.map_batches(cand_rows, batch_format="pyarrow").union(
        test_hashes.select_columns(["h"]).map_batches(
            test_side, batch_format="pyarrow"))

    def confirmed(g: pd.DataFrame) -> pd.DataFrame:
        th_hit = g.loc[(g["side"] == 0)
                       & g["h"].isin(g.loc[g["side"] == 1, "h"]), "th"]
        return pd.DataFrame({"th": th_hit.unique().astype("uint64")})

    bad_th = _keyed_groups(both, confirmed, "dc_part", npart)

    def add_th(batch: pa.Table) -> pa.Table:
        th = md5_u64(batch.column(text_col).to_pylist())
        return batch.append_column("__th", pa.array(th, type=pa.uint64()))

    lschema = train_ds.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    ltypes["__th"] = pa.uint64()
    out = semi_anti_join(
        train_ds.map_batches(add_th, batch_format="pyarrow"), bad_th,
        left_key="__th", right_key="th", anti=True, left_types=ltypes)
    return out.map_batches(lambda b: b.drop_columns(["__th"]),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-document common-segment removal (CCNet paragraph-dedup analog)
# ---------------------------------------------------------------------------


def _segment_partial_dfs(batch: pa.Table, *, text_col: str,
                         width: int) -> pa.Table:
    """Per-batch combiner for the segment DOCUMENT-FREQUENCY pass: each
    document contributes every distinct segment hash ONCE (np.unique per
    doc), so the per-batch counts sum to exact corpus-wide distinct-doc
    counts — a document is one row, so its segments never span batches.
    The exchange downstream carries one (hash, partial df) pair per
    distinct segment per batch — never positions, never text."""
    from ..functions.minhash import segment_hashes

    parts = [np.unique(segment_hashes(t, width))
             for t in batch.column(text_col).to_pylist()]
    allh = np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint64)
    vals, counts = np.unique(allh, return_counts=True)
    return pa.table({"h": pa.array(vals, type=pa.uint64()),
                     "cnt": pa.array(counts, type=pa.int64())})


def common_segment_hashes(ds, *, text_col: str = "text", width: int = 4,
                          max_df: int = 3):
    """Pass A of :func:`strip_common_segments`: materialized slim Dataset
    of segment hashes whose document frequency EXCEEDS ``max_df`` —
    boilerplate by the CCNet rule (a paragraph repeated across many
    documents is template chrome, not content). Same gate/exchange shape
    as ``_dup_hash_set``; the only difference is counting distinct DOCS
    per hash instead of occurrences."""
    from ..pipelines.relational import coarse_partition_apply

    partials = ds.map_batches(
        _segment_partial_dfs, fn_kwargs={"text_col": text_col, "width": width},
        batch_format="pyarrow").materialize()

    def df_kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("h", as_index=False)["cnt"].sum()
        return agg.loc[agg["cnt"] > max_df, ["h", "cnt"]]

    return coarse_partition_apply(partials, df_kernel, key_col="h",
                                  part_col="h_part", num_parts=64,
                                  nrows=partials.count()).materialize()


def _rebuild_segments(t: str, removed_segs, width: int):
    """Drop the listed 0-based segment indices from ``t``; surviving
    segments re-join with single spaces in order (segment-internal token
    joins are single spaces too, so the result equals the space-join of
    all kept tokens). Returns (clean_text, n_seg_kept, n_seg_removed)."""
    from ..functions.minhash import _ASCII_WS

    toks = [tok for tok in _ASCII_WS.split(t or "") if tok]
    n_seg = (len(toks) + width - 1) // width
    rm = set(int(s) for s in removed_segs)
    kept = [" ".join(toks[i * width:(i + 1) * width])
            for i in range(n_seg) if i not in rm]
    return " ".join(kept), n_seg - len(rm), len(rm)


def strip_common_segments(ds, *, text_col: str = "text",
                          id_col: str = "doc_id", width: int = 4,
                          max_df: int = 3,
                          broadcast_limit: int = 2_000_000):
    """Cross-document boilerplate-segment removal: every non-overlapping
    ``width``-token segment whose exact text occurs in MORE than
    ``max_df`` distinct documents is removed from every document that
    contains it — the fixed-width re-expression of CCNet's
    paragraph-level dedup (Wenzek et al. 2020, public; reference has no
    counterpart — this is the LLM-pipeline suite). Differs from
    ``strip_duplicate_spans`` on all three axes: non-overlapping segments
    (not sliding windows), distinct-document frequency (not occurrence
    count), threshold > max_df (tolerates organic repetition, strips
    template chrome).

    Scale shape (the dup_spans lessons): pass A ships per-batch-combined
    (uint64 hash, partial df) pairs only; pass B re-derives segment
    hashes locally. Below the gate the dup set broadcasts once via
    ray.put as a sorted array — no shuffle at any corpus size. Above it:
    fixed-size Bloom prefilter → slim (id, seg_no) removal rows via
    per-slice exact semi-join → ONE text exchange co-partitioned with
    the removal rows by id hash (the only path that ever moves text).
    No intermediate removal-row broadcast tier, unlike
    ``strip_duplicate_spans``: removals number ≥ (max_df+1) × |dup set|
    by construction (every dup segment sits in > max_df docs), so they
    can never fit a gate the dup set itself exceeded.

    Returns one row per input doc: (id_col, clean_text, n_seg_kept,
    n_seg_removed). Hashes are md5-prefix uint64 (functions/minhash.py:
    segment_hashes), so the whole operator is SQL-oracle-checkable.
    """
    import ray as _ray

    from ..functions.minhash import segment_hashes

    dup_ds = common_segment_hashes(ds, text_col=text_col, width=width,
                                   max_df=max_df)
    n_dup = dup_ds.count()
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([
        (id_col, id_type), ("clean_text", pa.string()),
        ("n_seg_kept", pa.int64()), ("n_seg_removed", pa.int64())])

    def _emit(ids, texts, kept_n, removed_n):
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "clean_text": pa.array(texts, type=pa.string()),
                         "n_seg_kept": pa.array(kept_n, type=pa.int64()),
                         "n_seg_removed": pa.array(removed_n, type=pa.int64())},
                        schema=out_schema)

    if n_dup <= broadcast_limit:
        _, dup_ref = _broadcast_sorted_hashes(dup_ds)

        def strip(batch: pa.Table) -> pa.Table:
            dup: np.ndarray = _ray.get(dup_ref)
            ids, texts, kept_n, removed_n = [], [], [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                hs = segment_hashes(t or "", width)
                if len(hs) and len(dup):
                    idx = np.searchsorted(dup, hs)
                    rm = np.flatnonzero(
                        (idx < len(dup))
                        & (dup[np.minimum(idx, len(dup) - 1)] == hs))
                else:
                    rm = np.zeros(0, dtype=np.int64)
                clean, k, r = _rebuild_segments(t, rm, width)
                ids.append(i); texts.append(clean)
                kept_n.append(k); removed_n.append(r)
            return _emit(ids, texts, kept_n, removed_n)

        return ds.map_batches(strip, batch_format="pyarrow")

    # ABOVE THE GATE: Bloom-prefiltered slim (id, seg_no, h) rows,
    # confirmed against the distributed dup set per hash slice.
    from ..functions.bloom import build_bloom_distributed

    bloom_ref = _ray.put(build_bloom_distributed(
        dup_ds, "h", capacity=2 * max(n_dup, 1)))
    npart = _exchange_parts(4 * n_dup)

    def cand_rows(batch: pa.Table) -> pa.Table:
        bf = _ray.get(bloom_ref)
        ids, segs, hss = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            hs = segment_hashes(t or "", width)
            hit = np.flatnonzero(bf.contains_many(hs)) if len(hs) else []
            ids.extend([i] * len(hit))
            segs.extend(int(s) for s in hit)
            hss.append(hs[hit])
        h = np.concatenate(hss) if hss else np.zeros(0, dtype=np.uint64)
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "seg_no": pa.array(segs, type=pa.int64()),
                         "h": pa.array(h, type=pa.uint64()),
                         "h_part": pa.array((h % np.uint64(npart)).astype(np.int64))})

    def dup_side(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.nulls(len(h), type=id_type),
                         "seg_no": pa.nulls(len(h), type=pa.int64()),
                         "h": batch.column("h"),
                         "h_part": pa.array((h % np.uint64(npart)).astype(np.int64))})

    id_is_int = pa.types.is_integer(id_type)

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        dup_h = g.loc[g["seg_no"].isna(), "h"].unique()
        rows = g.loc[g["seg_no"].notna() & g["h"].isin(dup_h),
                     [id_col, "seg_no"]].copy()
        rows["seg_no"] = rows["seg_no"].astype("int64")
        if id_is_int:
            rows[id_col] = rows[id_col].astype("int64")
        return rows

    removals = _keyed_groups(
        ds.map_batches(cand_rows, batch_format="pyarrow")
        .union(dup_ds.select_columns(["h"]).map_batches(
            dup_side, batch_format="pyarrow")),
        semi, "h_part", npart)

    # ONE text exchange, co-partitioned with the removal rows by id hash
    # (documented partitioning assumption: a doc's text row and all its
    # removal rows share an id-hash partition).
    from ..pipelines.relational import coarse_partition_apply

    def doc_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # null text coalesces to '' (the broadcast path's `t or ""`):
        # rebuild() tells the two union sides apart by scs_text nullity,
        # so a null-text doc row would be misread as a removal row and
        # the document would vanish from the output
        return pa.table({id_col: batch.column(id_col),
                         "scs_text": pc.fill_null(
                             pc.cast(batch.column(text_col), pa.string()),
                             ""),
                         "seg_no": pa.nulls(n, type=pa.int64())})

    def rm_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({id_col: batch.column(id_col),
                         "scs_text": pa.nulls(n, type=pa.string()),
                         "seg_no": pc.cast(batch.column("seg_no"),
                                           pa.int64())})

    both = ds.map_batches(doc_side, batch_format="pyarrow").union(
        removals.map_batches(rm_side, batch_format="pyarrow"))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["scs_text"].notna()]
        rm = g[g["scs_text"].isna()]
        by_id: dict = {}
        if len(rm):
            sn = rm["seg_no"].to_numpy(dtype=np.int64)
            for j, i in enumerate(rm[id_col].to_numpy()):
                by_id.setdefault(i, []).append(int(sn[j]))
        out = {id_col: [], "clean_text": [], "n_seg_kept": [],
               "n_seg_removed": []}
        for i, t in zip(docs[id_col].to_numpy(), docs["scs_text"]):
            clean, k, r = _rebuild_segments(t, by_id.get(i, ()), width)
            out[id_col].append(i); out["clean_text"].append(clean)
            out["n_seg_kept"].append(k); out["n_seg_removed"].append(r)
        df = pd.DataFrame(out)
        if id_is_int and len(df):
            df[id_col] = df[id_col].astype("int64")
        return df

    # width from the dup-segment estimate; nrows stays None — text rides
    # this exchange, so the slim-row coalesce gate must NOT collapse it
    return coarse_partition_apply(both, rebuild, key_col=id_col,
                                  part_col="scs_part", num_parts=npart,
                                  nrows=None)


def cluster_canonical(labels_ds, scores_ds, *, id_col: str = "doc_id",
                      cluster_col: str = "component_id",
                      score_col: str = "n_tokens", nrows: int | None = None):
    """Canonical-document selection per duplicate cluster — the retention
    policy that CONSUMES ``connected_components`` labels: within each
    cluster exactly one document survives, the one with the highest
    ``score_col`` (longest/best-quality doc), ties broken by min id. The
    standard near-dup resolution of web-corpus pipelines (keep the best
    representative, drop the rest), absent from the reference (which has
    no dedup at all).

    Inputs are both SLIM: ``labels_ds`` is (id, cluster) from
    ``connected_components``; ``scores_ds`` is (id, score) — the caller
    computes scores from the corpus with whatever kernel defines "best"
    (token count here by convention). The join ships only these two
    tables (never text), coalesced before its bucket sort because both
    sides are slim; the per-cluster argmax is ONE vectorized
    mergesort+dedup kernel per coarse partition (a cluster never spans
    partitions). Returns (id, cluster, score, keep bool) — one row per
    labeled doc.
    """
    from ..pipelines.relational import (choose_partitions,
                                        coarse_partition_apply, hash_join)

    if nrows is None:
        labels_ds = labels_ds.materialize()  # count() must not re-execute
        nrows = labels_ds.count()            # the upstream CC fixpoint
    width = choose_partitions(nrows, default=8, lo=1, hi=256)

    j = hash_join(labels_ds, scores_ds, key=id_col, num_buckets=width,
                  left_types={id_col: pa.int64(), cluster_col: pa.int64()},
                  right_types={id_col: pa.int64(), score_col: pa.int64()},
                  coalesce_blocks=width)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([cluster_col, score_col, id_col],
                          ascending=[True, False, True], kind="mergesort")
        keep = ~g.duplicated(cluster_col).to_numpy()
        out = g[[id_col, cluster_col, score_col]].copy()
        out["keep"] = keep
        return out

    return coarse_partition_apply(j, pick, key_col=cluster_col,
                                  part_col="cc_pick", num_parts=width,
                                  nrows=nrows)


def exact_dedup_incremental(new_ds, prior_ds, *, text_col: str = "text",
                            num_buckets: int = 32):
    """Cross-run incremental exact dedup: keep only the NEW documents
    whose text does not already occur in a PRIOR corpus — the ingestion
    step of a continuously-growing 100-TB pipeline (each crawl snapshot
    dedups against everything committed before it; public practice in
    every incremental web-corpus build).

    Scale shape: the prior side reduces to per-batch-distinct uint64
    md5 text hashes (slim — the prior corpus' payload never moves);
    the new side ships once through the bucket-partitioned exact
    anti-join (``semi_anti_join``). Hash rule is the house
    DuckDB-replayable md5-prefix (functions/hashing.md5_u64), so the
    whole operator is SQL-oracle-checkable; a 64-bit collision would
    wrongly drop one new doc — the standard trade accepted by every
    hash-identity dedup at this scale."""
    from ..functions.hashing import md5_u64
    from ..pipelines.relational import _arrow_type, semi_anti_join

    def add_th(batch: pa.Table) -> pa.Table:
        th = md5_u64([v or "" for v in batch.column(text_col).to_pylist()])
        return batch.append_column("__th", pa.array(th, type=pa.uint64()))

    def prior_th(batch: pa.Table) -> pa.Table:
        th = np.unique(md5_u64(
            [v or "" for v in batch.column(text_col).to_pylist()]))
        return pa.table({"__th": pa.array(th, type=pa.uint64())})

    lschema = new_ds.schema()
    ltypes = {n: _arrow_type(t)
              for n, t in zip(lschema.names, lschema.types)}
    ltypes["__th"] = pa.uint64()
    out = semi_anti_join(
        new_ds.map_batches(add_th, batch_format="pyarrow"),
        prior_ds.map_batches(prior_th, batch_format="pyarrow"),
        left_key="__th", anti=True, num_buckets=num_buckets,
        left_types=ltypes)
    return out.map_batches(lambda b: b.drop_columns(["__th"]),
                           batch_format="pyarrow")


def minhash_incremental_ids(new_ds, prior_ds, *, text_col: str = "text",
                            id_col: str = "doc_id", num_perm: int = 32,
                            num_bands: int = 8, num_buckets: int = 32,
                            broadcast_limit: int = 2_000_000):
    """Incremental NEAR-dup against a committed archive — the fuzzy
    sibling of :func:`exact_dedup_incremental` (each crawl snapshot drops
    new documents that are near-duplicates of anything already committed;
    the CommonCrawl monthly-ingest shape). A new doc is dropped when ANY
    of its md5-mode MinHash LSH bands collides with any archive doc's
    band; survivors' ids are returned. Candidate-level by design: band
    collision is the operator's recall-oriented contract (at 32 perms /
    8 bands a Jaccard-0.8 pair collides with p ≈ 1-(1-0.8^4)^8 ≈ 0.98),
    and a downstream verify can re-rank — keeping it candidate-level
    keeps every step exactly SQL-replayable.

    Scale shape: the ARCHIVE side reduces to per-batch-distinct band-key
    strings (~8×(2+8·rows) B per doc — its payload never moves, exactly
    like the exact-incremental's slim hash side). Below
    ``broadcast_limit`` archive band rows, the distinct key set
    broadcasts once (``ray.put`` frozenset) and new docs are filtered
    locally — zero exchange. Above it, the new side's slim (band_key,
    id) pairs route through one bucket-partitioned semi-join, then
    ids-only through the final anti-join; the new payload never shuffles
    either way.

    Band keys here are the band's EXACT value bytes (hex), not the
    48-bit md5 digests ``band_keys`` uses: with no downstream verify, a
    truncated-digest collision would silently drop a unique doc and
    diverge from the oracle's exact sig-slice comparison — the dedup
    families that keep the 48-bit keys all re-verify candidates."""
    import ray as _ray

    rows = num_perm // num_bands

    def exact_band_explode(batch: pa.Table) -> pa.Table:
        ids, keys = [], []
        for did, sig_bytes in zip(batch.column(id_col).to_pylist(),
                                  batch.column("minhash_sig").to_pylist()):
            sig = np.frombuffer(sig_bytes, dtype=np.uint64)
            for b in range(num_bands):
                keys.append(
                    f"{b}:{sig[b * rows:(b + 1) * rows].tobytes().hex()}")
                ids.append(did)
        return pa.table({
            "band_key": pa.array(keys, type=pa.string()),
            id_col: pa.array(ids, type=batch.column(id_col).type)})

    fn = {"num_perm": num_perm, "shingle_width": 5, "text_col": text_col}
    bands_prior = (prior_ds
                   .map_batches(minhash_sketch_md5_batch, fn_kwargs=fn,
                                batch_format="pyarrow")
                   .map_batches(exact_band_explode, batch_format="pyarrow")
                   .select_columns(["band_key"])
                   .materialize())  # slim: key strings only
    n_prior = bands_prior.count()

    if n_prior <= broadcast_limit:
        keys = frozenset(
            r["band_key"] for b in bands_prior.iter_batches(
                batch_format="pyarrow")
            for r in b.select(["band_key"]).to_pylist())
        keys_ref = _ray.put(keys)

        def keep(batch: pa.Table) -> pa.Table:
            kset: frozenset = _ray.get(keys_ref)
            from ..functions.minhash import minhash_signature_md5

            mask = []
            for t in batch.column(text_col).to_pylist():
                sig = np.array(
                    minhash_signature_md5(t or "", num_perm, 5),
                    dtype=np.uint64)
                mask.append(not any(
                    f"{b}:{sig[b * rows:(b + 1) * rows].tobytes().hex()}"
                    in kset for b in range(num_bands)))
            return batch.select([id_col]).filter(pa.array(mask))

        return new_ds.map_batches(keep, batch_format="pyarrow")

    # ABOVE THE GATE: slim band semi-join + ids-only anti-join
    from ..pipelines.relational import _arrow_type, semi_anti_join

    bands_new = (new_ds
                 .map_batches(minhash_sketch_md5_batch, fn_kwargs=fn,
                              batch_format="pyarrow")
                 .map_batches(exact_band_explode, batch_format="pyarrow"))
    id_type = _arrow_type(new_ds.schema().types[
        new_ds.schema().names.index(id_col)])
    matched = semi_anti_join(
        bands_new, bands_prior, left_key="band_key",
        num_buckets=num_buckets,
        left_types={"band_key": pa.string(), id_col: id_type})
    new_ids = new_ds.select_columns([id_col])
    out = semi_anti_join(
        new_ids, matched.select_columns([id_col]), left_key=id_col,
        anti=True, num_buckets=num_buckets, left_types={id_col: id_type})
    return out


# ---------------------------------------------------------------------------
# PPJoin / AllPairs: EXACT similarity self-join via prefix filtering
# ---------------------------------------------------------------------------

import re as _re
from fractions import Fraction as _Fraction

_PP_WS = _re.compile(r"[ \t\n\r\f]+")
_PP_MASK63 = (1 << 63) - 1


def _pp_shingle_set(text: str, width: int) -> set[str]:
    """Distinct word-``width``-gram shingles under the house tokenizer
    (ASCII-whitespace split of the lowered text; SQL parity:
    ``string_split_regex(lower(text), '[ \\t\\n\\r\\f]+')``)."""
    ws = [x for x in _PP_WS.split((text or "").lower()) if x]
    return {" ".join(ws[i:i + width]) for i in range(len(ws) - width + 1)}


def _pp_tok63(s: str) -> int:
    """Stable 63-bit shingle id (blake2b-8 masked into int64's positive
    range — Arrow-friendly). Collision odds are ~2^-63 per shingle pair;
    at a 10^12-doc vocab you would widen to a 16-byte digest (the
    exchange stays slim either way), which only changes digest_size."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                          digest_size=8).digest(),
                          "big") & _PP_MASK63


def ppjoin_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 threshold: float = 0.6, width: int = 3,
                 broadcast_limit: int = 200_000,
                 df_broadcast_limit: int = 2_000_000,
                 num_parts: int = 64):
    """COMPLETE exact-Jaccard near-dup edges (doc_id, dup_of), doc_id <
    dup_of, over distinct word-``width``-gram shingle sets — the AllPairs
    / PPJoin prefix-filtering join (Bayardo et al., WWW'07; Xiao et al.,
    WWW'08), the seventh near-dup family and the only one with NO false
    negatives: unlike the LSH families (minhash/simhash/ngram/embedding),
    whose recall is probabilistic, every pair with Jaccard >= threshold
    is guaranteed returned.

    How the quadratic joins becomes tractable: order every doc's tokens
    by GLOBAL rarity (document frequency asc, token id asc — any single
    total order preserves completeness; rare-first minimizes posting
    sizes); a doc of size s only indexes its first
    ``s - ceil(t*s) + 1`` tokens (its PREFIX), because two docs with
    Jaccard >= t provably share a token inside both prefixes. Candidates
    are pairs co-occurring in one prefix posting list (plus the
    ``min >= t*max`` length filter); an exact shingle-set verify
    disposes. The threshold is held as an exact rational (``Fraction``)
    and every gate cross-multiplies in int64 — no float ever decides.

    Scale shape: three slim exchanges and one verify. (1) df: per-batch
    (tok, n_docs) partials through the house group-sum — token ids, not
    shingle strings, cross the wire; (2) the df->rank side broadcasts
    under ``df_broadcast_limit`` vocab rows (above it, an honest
    doc-bucketed rebuild via coarse partition on the exploded
    (doc, tok, df) rows); (3) prefix postings (tok, doc, sz) — a
    (1-t)-fraction of each doc's tokens — coarse-partitioned by token,
    pairs deduped by `_distinct_edges`; (4) verify over the
    Bloom-prefiltered text pool, broadcast under ``broadcast_limit`` else
    bucket hash joins. Skew: a hot PREFIX token means many docs sharing
    a globally-rare shingle — real near-dup mass, the pairs exist in the
    answer; at 10^12 docs a hot posting would additionally shard by the
    pair's anchor id before pairing (same salting recipe as hash_join).
    """
    import ray as _ray

    from ..pipelines.relational import (coarse_partition_apply,
                                        partitioned_group_sum,
                                        vec_str_buckets)

    frac = _Fraction(str(threshold))
    tn, td = frac.numerator, frac.denominator

    def tokens_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        toks, sz = [], []
        for t in texts:
            hs = sorted(_pp_tok63(s) for s in _pp_shingle_set(t, width))
            toks.append(hs)
            sz.append(len(hs))
        return pa.table({
            id_col: batch.column(id_col),
            "toks": pa.array(toks, type=pa.list_(pa.int64())),
            "sz": pa.array(sz, type=pa.int64())})

    slim = ds.select_columns([id_col, text_col]).map_batches(
        tokens_batch, batch_format="pyarrow").materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        flat = batch.column("toks").combine_chunks()
        vals, counts = np.unique(
            np.asarray(flat.flatten(), dtype=np.int64), return_counts=True)
        # toks are per-doc DISTINCT, so per-batch counts are doc counts
        return pa.table({"tok": pa.array(vals, type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64())})

    dftab = partitioned_group_sum(
        slim.select_columns(["toks"]).map_batches(df_partial,
                                                  batch_format="pyarrow"),
        key="tok", sum_cols={"df": "n"}).materialize()

    def prefix_rows(df_lookup, g: pd.DataFrame) -> pd.DataFrame:
        out_t, out_d, out_s = [], [], []
        for did, toks, sz in zip(g[id_col], g["toks"], g["sz"]):
            sz = int(sz)
            if sz == 0:
                continue
            p = sz - (-(tn * sz) // td) + 1   # sz - ceil(t*sz) + 1
            ranked = sorted(toks, key=lambda tk: (df_lookup[tk], tk))
            for tk in ranked[:p]:
                out_t.append(tk)
                out_d.append(did)
                out_s.append(sz)
        return pd.DataFrame({"tok": np.asarray(out_t, dtype=np.int64),
                             "pid": np.asarray(out_d),
                             "sz": np.asarray(out_s, dtype=np.int64)})

    if dftab.count() <= df_broadcast_limit:
        dfp = dftab.to_pandas()
        df_ref = _ray.put(dict(zip(dfp["tok"].to_numpy(np.int64),
                                   dfp["df"].to_numpy(np.int64))))

        def prefix_broadcast(g: pd.DataFrame) -> pd.DataFrame:
            return prefix_rows(_ray.get(df_ref), g)

        postings = slim.map_batches(prefix_broadcast, batch_format="pandas")
    else:
        # scale path: explode (pid, tok), join df by token buckets, then
        # rebuild each doc's ranked prefix in a doc-keyed coarse partition
        from ..pipelines.relational import hash_join

        def explode(batch: pa.Table) -> pa.Table:
            toks = batch.column("toks").combine_chunks()
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            ids = np.repeat(
                np.asarray(batch.column(id_col), dtype=np.int64), lens)
            szs = np.repeat(
                np.asarray(batch.column("sz"), dtype=np.int64), lens)
            return pa.table({
                "pid": pa.array(ids, type=pa.int64()),
                "tok": toks.flatten(),
                "sz": pa.array(szs, type=pa.int64())})

        exploded = slim.map_batches(explode, batch_format="pyarrow")
        joined = hash_join(
            exploded, dftab, key="tok", num_buckets=num_parts,
            left_types={"pid": pa.int64(), "tok": pa.int64(),
                        "sz": pa.int64()},
            right_types={"tok": pa.int64(), "df": pa.int64()})

        def rebuild(g: pd.DataFrame) -> pd.DataFrame:
            out_t, out_d, out_s = [], [], []
            order = np.lexsort((g["tok"].to_numpy(np.int64),
                                g["df"].to_numpy(np.int64)))
            gs = g.iloc[order]
            for did, sub in gs.groupby("pid", sort=False):
                sz = int(sub["sz"].iloc[0])
                p = sz - (-(tn * sz) // td) + 1
                out_t.extend(sub["tok"].to_numpy(np.int64)[:p])
                out_d.extend([did] * min(p, len(sub)))
                out_s.extend([sz] * min(p, len(sub)))
            return pd.DataFrame({
                "tok": np.asarray(out_t, dtype=np.int64),
                "pid": np.asarray(out_d),
                "sz": np.asarray(out_s, dtype=np.int64)})

        postings = coarse_partition_apply(
            joined, rebuild, key_col="pid", part_col="pp_part",
            num_parts=num_parts)

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, sub in g.groupby("tok", sort=False):
            ids = sub["pid"].to_numpy()
            szs = sub["sz"].to_numpy(np.int64)
            k = len(ids)
            if k < 2:
                continue
            o = np.argsort(ids, kind="stable")
            ids, szs = ids[o], szs[o]
            for i in range(k - 1):
                # length filter: J >= t needs td*min(sa,sb) >= tn*max
                ok = td * np.minimum(szs[i], szs[i + 1:]) >= \
                    tn * np.maximum(szs[i], szs[i + 1:])
                for j in np.nonzero(ok)[0]:
                    a_out.append(ids[i])
                    b_out.append(ids[i + 1 + j])
        return pd.DataFrame({"doc_id": a_out, "dup_of": b_out})

    postings = postings.materialize()
    n_post = postings.count()
    # pairing cost grows with posting-list density (quadratic within a
    # posting), not linearly with rows — coalescing to ONE task is only
    # right for genuinely tiny runs, so this gate sits far below the
    # band-dedup coalesce limit (A/B at sf0.1's 260k postings: coalesced
    # 9.8 s vs token-partitioned 6.1 s end-to-end)
    if n_post <= 50_000:
        cands = postings.repartition(1).map_batches(
            lambda g: pair_up(g).drop_duplicates(["doc_id", "dup_of"]),
            batch_format="pandas", batch_size=None).materialize()
    else:
        # stamp cardinality AND block count from the KNOWN posting count
        # (the choose_partitions rule) — a fixed width would run the
        # quadratic pair stage in too few tasks at web scale and scatter
        # empty sort ranges at bench scale
        from ..pipelines.relational import choose_partitions

        pair_parts = choose_partitions(n_post, default=num_parts)
        pair_blocks = pair_parts if pair_parts > 64 else max(
            2, -(-pair_parts // 8))

        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["tok_part"] = vec_str_buckets(df["tok"], pair_parts)
            return df

        cands = _distinct_edges(
            postings.map_batches(add_part, batch_format="pandas")
            .repartition(pair_blocks).groupby("tok_part").map_groups(
                lambda g: pair_up(g), batch_format="pandas"))

    cands = cands.materialize()
    n_cands = cands.count()
    if n_cands == 0:
        return cands
    # the coalesced pair_up above emits ONE block; spread the verify —
    # measured 44 s single-task vs ~4 s spread at sf0.1's 719k candidates
    from ..pipelines.relational import choose_partitions

    cands = cands.repartition(
        choose_partitions(n_cands, rows_per_part=16_384))

    pool = _bloom_filtered_pool(ds.select_columns([id_col, text_col]),
                                cands, id_col=id_col, value_col=text_col)

    def _verify_sets(df: pd.DataFrame, text_of) -> list[bool]:
        """Per-batch verify with the shingle set built ONCE per distinct
        doc (a doc rides many candidate pairs — rebuilding its set per
        pair was the measured 10× of the verify stage)."""
        memo: dict = {}

        def sset(i):
            s = memo.get(i)
            if s is None:
                s = memo[i] = _pp_shingle_set(text_of(i), width)
            return s

        keep = []
        for a, b in zip(df["doc_id"], df["dup_of"]):
            sa, sb = sset(a), sset(b)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            keep.append(union > 0 and td * inter >= tn * union)
        return keep

    if pool.count() <= broadcast_limit:
        pdf = pool.to_pandas()
        lk_ref = _ray.put(dict(zip(pdf[id_col], pdf[text_col])))

        def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df.reindex(columns=["doc_id", "dup_of"])
            lk = _ray.get(lk_ref)
            keep = _verify_sets(df, lk.__getitem__)
            return df.loc[keep, ["doc_id", "dup_of"]]

        return cands.map_batches(verify_broadcast, batch_format="pandas")

    from ..pipelines.relational import hash_join

    id_type = pa.int64()
    texts_a = pool.map_batches(
        lambda b: b.rename_columns(["doc_id", "text_a"]),
        batch_format="pyarrow")
    texts_b = pool.map_batches(
        lambda b: b.rename_columns(["dup_of", "text_b"]),
        batch_format="pyarrow")
    cand_types = {"doc_id": id_type, "dup_of": id_type}
    j1 = hash_join(cands, texts_a, key="doc_id", num_buckets=16,
                   left_types=cand_types,
                   right_types={"doc_id": id_type, "text_a": pa.string()})
    j2 = hash_join(j1, texts_b, key="dup_of", num_buckets=16,
                   left_types={**cand_types, "text_a": pa.string()},
                   right_types={"dup_of": id_type, "text_b": pa.string()})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.reindex(columns=["doc_id", "dup_of"])
        text_lk = {}
        text_lk.update(zip(df["doc_id"], df["text_a"]))
        text_lk.update(zip(df["dup_of"], df["text_b"]))
        keep = _verify_sets(df, text_lk.__getitem__)
        return df.loc[keep, ["doc_id", "dup_of"]]

    return j2.map_batches(verify, batch_format="pandas")
