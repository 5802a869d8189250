"""Content hashing kernels.

Reference identity key: sha256(bytes).hexdigest()[:6]
(/root/reference/src/pdf_parser/processors/pdf_processor.py:65). We keep the
6-char prefix for golden parity (``file_hash6``) but use the FULL hex digest
as the engine's dedup/identity key — a 24-bit prefix collides long before
10^12 documents.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def sha256_hex6(data: bytes) -> str:
    """Reference-parity 6-char identity (pdf_processor.py:65)."""
    return hashlib.sha256(data).hexdigest()[:6]


def sha256_column(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hex of each element of a string/binary column.

    hashlib releases the GIL per call; the loop is per-row but hashing is
    C-speed and this stage parallelizes across blocks.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        b = v.as_py()
        if b is None:
            out[i] = None
            continue
        if isinstance(b, str):
            b = b.encode("utf-8")
        out[i] = hashlib.sha256(b).hexdigest()
    return pa.array(out, type=pa.string())


def md5_column(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        b = v.as_py()
        if b is None:
            out[i] = None
            continue
        if isinstance(b, str):
            b = b.encode("utf-8")
        out[i] = hashlib.md5(b).hexdigest()
    return pa.array(out, type=pa.string())


def md5_bucket_100(ids) -> list:
    """Per-row md5 percent-bucket of the stringified id — the ONE source of
    truth for every deterministic-sampling / split rule in the repo
    (hash_sample, source_mix, the contamination/corpus_curate train/test
    split). DuckDB replay:
    ``CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS UBIGINT)
    % 100``."""
    _md5 = hashlib.md5
    return [int.from_bytes(_md5(str(i).encode()).digest()[:4], "big") % 100
            for i in ids]


def md5_u64(values) -> np.ndarray:
    """uint64 md5 hash of each stringified value — the house uniform-hash
    rule for sketches (KMV distinct, minhash md5 mode). DuckDB replay:
    ``CAST(concat('0x', substr(md5(CAST(v AS VARCHAR)), 1, 16)) AS UBIGINT)``
    (first 8 digest bytes, big-endian == first 16 hex chars)."""
    _md5 = hashlib.md5
    out = np.fromiter(
        (int.from_bytes(_md5(str(v).encode()).digest()[:8], "big")
         for v in values),
        dtype=np.uint64, count=len(values))
    return out


def md5_shard(ids, n_shards: int) -> np.ndarray:
    """int64 shard per stringified id from md5 bits 96-127 (hex chars
    25-32) — a digest slice DISJOINT from both ``md5_bucket_100`` (hex
    1-8) and ``md5_order_i60`` (hex 9-23), so a corpus pre-filtered by
    percent bucket still shards uniformly (gcd(n_shards, 100) residue
    bias otherwise). DuckDB replay: ``CAST(concat('0x',
    substr(md5(CAST(id AS VARCHAR)), 25, 8)) AS UBIGINT) % n``."""
    _md5 = hashlib.md5
    return np.fromiter(
        (int(_md5(str(i).encode()).hexdigest()[24:32], 16) % n_shards
         for i in ids), dtype=np.int64, count=len(ids))


def md5_order_i60(ids) -> np.ndarray:
    """int64 order key per stringified id from md5 bits 32-92 (hex chars
    9-23) — INDEPENDENT of the ``md5_shard`` bits, so sharding and
    intra-shard order don't correlate. DuckDB replay:
    ``CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 9, 15)) AS
    BIGINT)``. 60 bits are unique at test scale; near 2^30 rows per
    ordered domain, widen the slice (compare more md5 hex) before
    trusting rank uniqueness."""
    _md5 = hashlib.md5
    return np.fromiter(
        (int(_md5(str(i).encode()).hexdigest()[8:23], 16)
         for i in ids), dtype=np.int64, count=len(ids))
