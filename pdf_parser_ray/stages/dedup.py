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
  - duplicate resolution is one round of min-label propagation inside each
    bucket (doc marked dup iff some bucket links it to a smaller-id doc at
    ≥ threshold similarity). This under-merges long chains A~B~C where
    A!~C — documented approximation, same contract as common LSH dedup
    at web scale; exact connected components would need an iterative
    groupby loop (available via repeated application).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import MinHasher, SimHasher, char_ngrams, jaccard


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, *, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    """Vectorized-enough sha256 over the text column (C-speed per row)."""
    vals = batch.column(text_col).to_pylist()
    hashes = [hashlib.sha256((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column(out_col, pa.array(hashes, type=pa.string()))


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row of each identical-content group.

    hash → groupby(content_hash) → per-group first (pandas sort for a
    deterministic survivor). The shuffle moves full rows — fine for narrow
    tables; for wide payloads use ``exact_dedup_ids`` (survivor ids with an
    ids-only shuffle) or ``exact_dedup_semi`` (full survivor rows via
    semi-join, payload never enters a groupby shuffle).
    """
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


def _slim_hash_parts(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     keep_cols: tuple = (), num_parts: int = 64):
    """Pre-shuffle stage of the ids-only dedup: hash the payload, DROP it,
    pre-combine per batch (one row per hash per batch), coarse-partition by
    crc32(hash). The returned dataset — the only thing that shuffles —
    carries (id, content_hash, *keep_cols, dedup_part); no payload column.
    """
    import zlib

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})
    slim_cols = [id_col, "content_hash", *keep_cols]

    def slim(batch: pa.Table) -> pa.Table:
        df = batch.select(slim_cols).to_pandas()
        # per-batch combiner: keep only each hash's min-id row before the
        # exchange (an all-identical batch collapses to one row)
        df = df.sort_values(["content_hash", id_col], kind="mergesort")
        df = df.drop_duplicates("content_hash", keep="first")
        df["dedup_part"] = [zlib.crc32(h.encode()) % num_parts
                            for h in df["content_hash"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    return hashed.map_batches(slim, batch_format="pyarrow")


def exact_dedup_ids(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    keep_cols: tuple = (), num_parts: int = 64):
    """Survivor (min-id) rows of each identical-content group, shuffling
    ONLY (id, content_hash, *keep_cols) — never the payload.

    The groupby key is a coarse crc32(hash) partition; the min-id pick is a
    vectorized sort + drop_duplicates within each partition (a per-hash
    map_groups would cost milliseconds of Python per tiny group).
    Output columns: (id_col, content_hash, *keep_cols).
    """
    parts = _slim_hash_parts(ds, text_col=text_col, id_col=id_col,
                             keep_cols=keep_cols, num_parts=num_parts)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_hash", id_col], kind="mergesort")
        return g.drop_duplicates("content_hash", keep="first").drop(columns=["dedup_part"])

    return parts.groupby("dedup_part").map_groups(keep_min, batch_format="pandas")


def exact_dedup_semi(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     num_parts: int = 64):
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
                                num_parts=num_parts)
    return semi_anti_join(ds, survivors, left_key=id_col, anti=False)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHashSketch:
    """Actor-pool stage: text → 128-perm MinHash signature (binary col)."""

    def __init__(self, num_perm: int = 128, shingle_width: int = 5,
                 text_col: str = "text"):
        self.hasher = MinHasher(num_perm=num_perm, shingle_width=shingle_width)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.hasher.signature(t or "").astype(np.uint64).tobytes()
            for t in batch.column(self.text_col).to_pylist()
        ]
        return batch.append_column("minhash_sig", pa.array(sigs, type=pa.binary()))


class BandExplode:
    """Signature → one row per LSH band: (band_key, doc_id, minhash_sig)."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16, id_col: str = "doc_id"):
        self.hasher = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, keys, sigs = [], [], []
        for doc_id, sig_bytes in zip(
            batch.column(self.id_col).to_pylist(), batch.column("minhash_sig").to_pylist()
        ):
            sig = np.frombuffer(sig_bytes, dtype=np.uint64)
            for key in self.hasher.band_keys(sig, self.num_bands):
                ids.append(doc_id)
                keys.append(key)
                sigs.append(sig_bytes)
        id_type = batch.column(self.id_col).type
        return pa.table(
            {"band_key": pa.array(keys, type=pa.string()),
             "doc_id": pa.array(ids, type=id_type),
             "minhash_sig": pa.array(sigs, type=pa.binary())}
        )


def _bucket_dup_edges(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Vectorized within-PARTITION edge finder (a partition holds many band
    buckets — coarse crc32(band_key) groupby, fine grouping done here with
    numpy instead of a per-bucket Python callback).

    Within each band bucket: link every doc to the bucket's min-id doc if
    signature agreement ≥ threshold. Emits (doc_id, dup_of)."""
    if len(g) < 2:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=g["doc_id"].dtype),
                             "dup_of": pd.Series([], dtype=g["doc_id"].dtype)})
    g = g.sort_values(["band_key", "doc_id"], kind="mergesort").reset_index(drop=True)
    n = len(g)
    sig_mat = np.frombuffer(b"".join(g["minhash_sig"]), dtype=np.uint64).reshape(n, -1)
    keys = g["band_key"].to_numpy()
    change = np.r_[True, keys[1:] != keys[:-1]]
    first_idx = np.flatnonzero(change)
    anchor_idx = first_idx[np.cumsum(change) - 1]
    agree = (sig_mat == sig_mat[anchor_idx]).mean(axis=1)
    mask = (agree >= threshold) & (np.arange(n) != anchor_idx)
    ids = g["doc_id"].to_numpy()
    return pd.DataFrame({"doc_id": pd.Series(ids[mask], dtype=g["doc_id"].dtype),
                         "dup_of": pd.Series(ids[anchor_idx[mask]], dtype=g["doc_id"].dtype)})


def minhash_dedup_edges(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 128, num_bands: int = 16,
                        threshold: float = 0.8, concurrency=None):
    """Dataset of (doc_id, dup_of) near-duplicate edges (doc_id > dup_of).

    shingle→minhash (actor pool) → band explode → groupby(band_key) →
    per-bucket verify. Distinct edges via a final groupby.
    """
    kwargs = {"concurrency": concurrency} if concurrency else {}
    sketched = ds.map_batches(
        MinHashSketch, fn_constructor_kwargs={"num_perm": num_perm, "text_col": text_col},
        batch_format="pyarrow", **(kwargs or {"concurrency": 4}),
    )
    bands = sketched.map_batches(
        BandExplode,
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands, "id_col": id_col},
        batch_format="pyarrow", concurrency=2,
    )
    # coarse-partition by crc32(band_key) so one task handles MANY buckets
    # with the vectorized kernel (a per-bucket map_groups callback costs
    # milliseconds of Python per tiny group — measured 8s vs 0.5s at sf0.1)
    def add_part(batch: pa.Table) -> pa.Table:
        import zlib

        parts = [zlib.crc32(k.encode()) % 64 for k in batch.column("band_key").to_pylist()]
        return batch.append_column("band_part", pa.array(parts, type=pa.int64()))

    parts = bands.map_batches(add_part, batch_format="pyarrow")
    edges = parts.groupby("band_part").map_groups(
        lambda g: _bucket_dup_edges(g, threshold), batch_format="pandas"
    )
    # distinct (doc_id, dup_of): same edge may surface from several bands
    return edges.groupby(["doc_id", "dup_of"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHashSketch:
    """Actor-pool stage: text → 64-bit SimHash + 4×16-bit band keys."""

    def __init__(self, text_col: str = "text"):
        self.hasher = SimHasher()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.hasher.signature(t or "") for t in batch.column(self.text_col).to_pylist()]
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
                        max_hamming: int = 3):
    """(doc_id, dup_of) edges where hamming(simhash) ≤ max_hamming, found via
    4-band 16-bit LSH (any duplicate within distance 3 shares ≥1 band)."""

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
        import zlib

        parts = [zlib.crc32(k.encode()) % 64 for k in batch.column("band_key").to_pylist()]
        return batch.append_column("band_part", pa.array(parts, type=pa.int64()))

    sketched = ds.map_batches(SimHashSketch, fn_constructor_kwargs={"text_col": text_col},
                              batch_format="pyarrow", concurrency=4)
    bands = sketched.map_batches(simhash_band_explode, batch_format="pyarrow",
                                 fn_kwargs={"id_col": id_col})
    parts = bands.map_batches(add_part, batch_format="pyarrow")
    edges = parts.groupby("band_part").map_groups(partition_edges, batch_format="pandas")
    return edges.groupby(["doc_id", "dup_of"]).map_groups(lambda g: g.head(1),
                                                          batch_format="pandas")


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
                            threshold: float = 0.95, num_planes: int = 12, seed: int = 42):
    """Near-duplicate edges by cosine ≥ threshold, bucketed by random-
    hyperplane LSH (sign pattern of ``num_planes`` fixed projections).

    Only vectors sharing a sign-bucket are compared — the standard SimHash-
    for-vectors trade-off: recall < 1 for pairs near the planes; raise
    num_planes→bands for higher recall at more shuffle volume.
    """

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vec_col].to_numpy())
        dim = mat.shape[1]
        planes = np.random.default_rng(seed).standard_normal((dim, num_planes))
        signs = (mat @ planes) >= 0
        batch["lsh_bucket"] = [
            "".join("1" if b else "0" for b in row) for row in signs
        ]
        return batch

    def bucket_edges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "dup_of": pd.Series([], dtype="int64")})
        g = g.sort_values(id_col)
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        anchor = unit[0]
        sims = unit[1:] @ anchor
        mask = sims >= threshold
        ids = g[id_col].iloc[1:].to_numpy()[mask]
        return pd.DataFrame({id_col: ids, "dup_of": g[id_col].iloc[0]})

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("lsh_bucket").map_groups(bucket_edges, batch_format="pandas")


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
        import numpy as np
        import zlib

        # crc32, not hash(): Python's str hash is per-process randomized
        ids = batch.column(id_col).to_pylist()
        salts = np.array([zlib.crc32(str(i).encode()) % num_salts for i in ids],
                         dtype=np.int64)
        return batch.append_column("dedup_salt", pa.array(salts, type=pa.int64()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    salted = hashed.map_batches(add_salt, batch_format="pyarrow")
    phase1 = salted.groupby(["dedup_salt", "content_hash"]).map_groups(
        keep_first, batch_format="pandas")
    phase2 = phase1.groupby("content_hash").map_groups(keep_first, batch_format="pandas")
    return phase2.map_batches(lambda b: b.drop_columns(["dedup_salt"]),
                              batch_format="pyarrow")
