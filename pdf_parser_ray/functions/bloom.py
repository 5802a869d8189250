"""Bloom filter for broadcast semi/anti-joins at scale.

When the build-side key set is too large to broadcast as a Python set
(hundreds of millions of keys), broadcast a Bloom filter instead: ~10 bits
per key for 1% false positives, membership test is k hash probes into a
shared bit array. Standard construction (k = m/n·ln2, double hashing per
Kirsch-Mitzenmacher); deterministic (no RNG).

Semi-join: filter probe side by `might_contain` (FPs allowed → exact
verify only the survivors, or accept the FP rate).
Anti-join: a Bloom NO is definitive, so `NOT might_contain` keeps only
true non-members plus FP-rate losses — callers needing exactness route
the `might_contain` minority through an exact check.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant set) — the vectorized
    key hash for INTEGER keys. The Bloom key hash is NOT part of any
    operator contract (filters live within one run and every survivor is
    exactly re-verified downstream), so integer keys use this numpy path
    while strings keep per-key md5; only the FP *pattern* differs."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        if capacity <= 0:
            capacity = 1
        m = int(-capacity * math.log(fp_rate) / (math.log(2) ** 2))
        self.num_bits = max(64, (m + 63) // 64 * 64)
        self.num_hashes = max(1, round(self.num_bits / capacity * math.log(2)))
        self.bits = np.zeros(self.num_bits // 64, dtype=np.uint64)

    @staticmethod
    def _hash_pair(key: str) -> tuple[int, int]:
        d = hashlib.md5(key.encode("utf-8")).digest()
        return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1

    def _positions(self, key: str) -> np.ndarray:
        h1, h2 = self._hash_pair(key)
        i = np.arange(self.num_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.num_bits)

    @staticmethod
    def _numeric(keys) -> np.ndarray | None:
        """uint64 view of an integer key collection, else None. Routing is
        by the COLLECTION's dtype, and any integer collection of the same
        key domain resolves to the same uint64 values on both the add and
        probe side (int64/uint64/python-int lists all wrap identically)."""
        if isinstance(keys, np.ndarray):
            arr = keys
        else:
            try:
                arr = np.asarray(keys)
            except (ValueError, TypeError):
                return None
        if arr.ndim == 1 and arr.dtype.kind in "iu":
            with np.errstate(over="ignore"):
                return arr.astype(np.uint64, copy=False)
        return None

    def _pos_matrix(self, arr: np.ndarray) -> np.ndarray:
        """(num_hashes, n) bit positions for a uint64 key array
        (Kirsch-Mitzenmacher double hashing, vectorized)."""
        h1 = _mix64(arr)
        h2 = _mix64(arr ^ np.uint64(0xA5A5_A5A5_A5A5_A5A5)) | np.uint64(1)
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits)

    def add(self, key) -> None:
        if isinstance(key, (int, np.integer)) and not isinstance(key, bool):
            pos = self._pos_matrix(np.asarray([key]).astype(np.uint64)).ravel()
        else:
            pos = self._positions(str(key))
        # ufunc.at: plain fancy |= drops bits when two positions share a word
        np.bitwise_or.at(self.bits, (pos // np.uint64(64)).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))

    def add_many(self, keys) -> None:
        keys = keys if isinstance(keys, np.ndarray) else list(keys)
        arr = self._numeric(keys)
        if arr is not None:
            if len(arr):
                pos = self._pos_matrix(arr).ravel()
                np.bitwise_or.at(self.bits,
                                 (pos // np.uint64(64)).astype(np.int64),
                                 np.uint64(1) << (pos % np.uint64(64)))
            return
        for k in keys:
            self.add(k)

    def might_contain(self, key) -> bool:
        if isinstance(key, (int, np.integer)) and not isinstance(key, bool):
            pos = self._pos_matrix(np.asarray([key]).astype(np.uint64)).ravel()
        else:
            pos = self._positions(str(key))
        word = self.bits[(pos // np.uint64(64)).astype(np.int64)]
        return bool(((word >> (pos % np.uint64(64))) & np.uint64(1)).all())

    def contains_many(self, keys) -> np.ndarray:
        keys = keys if isinstance(keys, np.ndarray) else list(keys)
        arr = self._numeric(keys)
        if arr is None:
            return np.array([self.might_contain(k) for k in keys], dtype=bool)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._pos_matrix(arr)
        words = self.bits[(pos // np.uint64(64)).astype(np.int64)]
        hit = (words >> (pos % np.uint64(64))) & np.uint64(1)
        return hit.all(axis=0)

    @property
    def nbytes(self) -> int:
        return self.bits.nbytes


def build_bloom_from_dataset(ds, column: str, capacity_hint: int | None = None,
                             fp_rate: float = 0.01) -> BloomFilter:
    """Stream a Dataset column into a Bloom filter on the driver.

    At cluster scale, build per-block filters inside map_batches and OR-merge
    the (mergeable) bit arrays — this driver-side variant is for build sides
    that stream but don't fit as a set.
    """
    if capacity_hint is None:
        capacity_hint = max(1024, ds.count())
    bf = BloomFilter(capacity_hint, fp_rate)
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        import pyarrow as pa

        bf.add_many(pa.table(batch).column(column).to_pylist())
    return bf


def build_bloom_distributed(ds, column: str, capacity: int,
                            fp_rate: float = 0.01) -> BloomFilter:
    """Distributed Bloom construction: each batch builds a partial filter
    over its keys inside map_batches; the driver OR-merges the fixed-size
    bit arrays. Driver traffic = num_blocks × filter bytes, independent of
    key count — the scale path for build sides with billions of keys.

    All partials share (num_bits, num_hashes) because they're derived from
    the same (capacity, fp_rate), so the bitwise OR is an exact merge.
    """
    import pyarrow as pa

    capacity = max(1024, capacity)
    merged = BloomFilter(capacity, fp_rate)

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fp_rate)
        bf.add_many(batch.column(column).to_pylist())
        return pa.table({"bloom_bits": pa.array([bf.bits.tobytes()], type=pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for bits in pa.table(b).column("bloom_bits").to_pylist():
            merged.bits |= np.frombuffer(bits, dtype=np.uint64)
    return merged
