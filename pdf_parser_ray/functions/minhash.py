"""Near-duplicate sketch kernels: shingling, MinHash, SimHash, n-gram Jaccard.

Standard public algorithms (Broder 1997 MinHash; Charikar 2002 SimHash;
banding/LSH per Mining of Massive Datasets ch.3). Deterministic: hash family
seeded by fixed constants, no wall-clock or RNG state.

Scale notes: each kernel is batch-oriented (numpy over a batch of docs) and
emits fixed-width sketch columns, so the shuffle that follows (band-bucket
groupby) moves sketches, not documents.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_MAX_U32 = np.uint64(0xFFFFFFFF)


def _hash_family(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficients for universal hashing a*x+b mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, width: int = 5) -> set[str]:
    """Word w-shingles (lowercased, whitespace-tokenized)."""
    toks = text.lower().split()
    if len(toks) < width:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)}


def char_ngrams(text: str, n: int = 5) -> set[str]:
    t = text.lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def _shingle_hashes(sh: set[str]) -> np.ndarray:
    """Stable 64-bit hashes of shingles (md5-based, python-hash-randomization-proof)."""
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        out[i] = np.uint64(
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
        )
    return out


class MinHasher:
    """Compile-once MinHash sketcher (held by an actor pool at scale)."""

    def __init__(self, num_perm: int = 128, shingle_width: int = 5, seed: int = 42):
        self.num_perm = num_perm
        self.shingle_width = shingle_width
        self.a, self.b = _hash_family(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(shingles(text, self.shingle_width))
        if len(h) == 0:
            return np.full(self.num_perm, _MAX_U32, dtype=np.uint64)
        # (num_perm, n_shingles): ((a*x + b) mod p) truncated to 32 bits
        vals = (self.a[:, None] * (h[None, :] & _MERSENNE) + self.b[:, None]) % _MERSENNE
        return (vals & _MAX_U32).min(axis=1)

    def band_keys(self, sig: np.ndarray, num_bands: int = 16) -> list[str]:
        """LSH band keys: hash of each band's rows → bucket id strings."""
        rows = self.num_perm // num_bands
        keys = []
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows]
            digest = hashlib.md5(band.tobytes()).hexdigest()[:12]
            keys.append(f"{b}:{digest}")
        return keys


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


class SimHasher:
    """64-bit SimHash over word features (Charikar 2002)."""

    def __init__(self, bits: int = 64):
        self.bits = bits

    def signature(self, text: str) -> int:
        acc = np.zeros(self.bits, dtype=np.int64)
        for tok in set(text.lower().split()):
            h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")
            for i in range(self.bits):
                acc[i] += 1 if (h >> i) & 1 else -1
        sig = 0
        for i in range(self.bits):
            if acc[i] > 0:
                sig |= 1 << i
        return sig


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
