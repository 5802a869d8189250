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


_WORD_BASE = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _word_shingle_hashes(text: str, width: int = 5) -> np.ndarray:
    """Vectorized stable hashes of word w-shingles (the hot-path variant).

    Per word: crc32 (C speed, stable across processes) mixed to 64 bits;
    per shingle: numpy rolling polynomial combine over the word-hash array.
    ~20× faster than hashing each shingle string through md5; distribution
    quality is adequate for MinHash (verified against exact Jaccard in
    tests). Duplicate shingles need no dedup — MinHash takes a min.
    """
    import zlib

    toks = text.lower().split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    wh = np.array([zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    with np.errstate(over="ignore"):
        wh = (wh + np.uint64(1)) * _WORD_BASE  # spread crc32 into 64 bits
        if len(wh) < width:
            h = np.uint64(0)
            for v in wh:
                h = h * _WORD_BASE + v
            return np.array([h], dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(wh, width)
        powers = np.empty(width, dtype=np.uint64)
        acc = np.uint64(1)
        for i in range(width):
            powers[width - 1 - i] = acc
            acc = acc * _WORD_BASE
        return (windows * powers).sum(axis=1, dtype=np.uint64)


def word_shingle_hashes_batch(texts: list, width: int = 5) -> list[np.ndarray]:
    """Batch form of ``_word_shingle_hashes``: ONE sliding-window combine
    over the concatenated word-hash stream of the whole batch instead of
    a per-doc numpy call chain. Bit-identical output (pytest-pinned);
    measured 4.4× on the hash stage at sf0.1 — per-doc numpy dispatch
    overhead, not arithmetic, was the cost (BENCH/TUNING.md round 5).
    Returns one uint64 hash array per input text (empty for empty docs)."""
    import zlib

    tok_lists = [(x or "").lower().split() for x in texts]
    lens = np.array([len(tk) for tk in tok_lists], dtype=np.int64)
    flat = [zlib.crc32(w.encode("utf-8")) for toks in tok_lists for w in toks]
    with np.errstate(over="ignore"):
        wh = (np.array(flat, dtype=np.uint64) + np.uint64(1)) * _WORD_BASE
        powers = np.empty(width, dtype=np.uint64)
        acc = np.uint64(1)
        for i in range(width):
            powers[width - 1 - i] = acc
            acc = acc * _WORD_BASE
        if len(wh) >= width:
            sw = np.lib.stride_tricks.sliding_window_view(wh, width)
            winvals = (sw * powers).sum(axis=1, dtype=np.uint64)
        else:
            winvals = np.zeros(0, dtype=np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        out = []
        for d, n in enumerate(lens):
            if n == 0:
                out.append(np.zeros(0, dtype=np.uint64))
            elif n < width:   # short doc: single hash over all its tokens
                h = np.uint64(0)
                for v in wh[starts[d]:ends[d]]:
                    h = h * _WORD_BASE + v
                out.append(np.array([h], dtype=np.uint64))
            else:             # window rows s..e-width of the global stream
                out.append(winvals[starts[d]: ends[d] - width + 1])
        return out


class MinHasher:
    """Compile-once MinHash sketcher (held by an actor pool at scale)."""

    def __init__(self, num_perm: int = 128, shingle_width: int = 5, seed: int = 42):
        self.num_perm = num_perm
        self.shingle_width = shingle_width
        self.a, self.b = _hash_family(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        h = _word_shingle_hashes(text, self.shingle_width)
        if len(h) == 0:
            return np.full(self.num_perm, _MAX_U32, dtype=np.uint64)
        # (num_perm, n_shingles): ((a*x + b) mod p) truncated to 32 bits
        vals = (self.a[:, None] * (h[None, :] & _MERSENNE) + self.b[:, None]) % _MERSENNE
        return (vals & _MAX_U32).min(axis=1)

    def signatures(self, texts: list, *,
                   chunk_shingles: int = 4096) -> list[np.ndarray]:
        """Batch sketch: bit-identical to ``[signature(t) for t in texts]``
        (pytest-pinned) but 1.7× faster at sf0.1 (BENCH/TUNING.md round 5).
        Two levers: ONE sliding-window shingle-hash combine for the whole
        batch, and the permutation min-fold applied to cache-sized chunks
        of the concatenated hash stream with ``np.minimum.reduceat`` at
        doc offsets — full-batch folding was measured SLOWER (memory-bound
        (num_perm × total_shingles) temporaries), per-doc folding pays
        numpy dispatch per doc; ~4096 shingles/fold is the sweet spot."""
        hl = word_shingle_hashes_batch(texts, self.shingle_width)
        lens = np.array([len(h) for h in hl], dtype=np.int64)
        sigs: list = [None] * len(hl)
        i = 0
        while i < len(hl):
            j = i
            tot = 0
            idxs = []
            while j < len(hl) and (tot == 0 or tot + lens[j] <= chunk_shingles):
                if lens[j] > 0:
                    idxs.append(j)
                    tot += lens[j]
                else:
                    sigs[j] = np.full(self.num_perm, _MAX_U32, dtype=np.uint64)
                j += 1
            if idxs:
                H = np.concatenate([hl[k] for k in idxs])
                vals = (self.a[:, None] * (H[None, :] & _MERSENNE)
                        + self.b[:, None]) % _MERSENNE
                vals &= _MAX_U32
                offs = np.zeros(len(idxs), dtype=np.int64)
                np.cumsum(lens[idxs][:-1], out=offs[1:])
                mins = np.minimum.reduceat(vals, offs, axis=1)
                for c, k in enumerate(idxs):
                    sigs[k] = mins[:, c]
            i = j
        return sigs

    def band_keys(self, sig: np.ndarray, num_bands: int = 16) -> list[str]:
        """LSH band keys: hash of each band's rows → bucket id strings."""
        rows = self.num_perm // num_bands
        keys = []
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows]
            digest = hashlib.md5(band.tobytes()).hexdigest()[:12]
            keys.append(f"{b}:{digest}")
        return keys


def shingles_ascii(text: str, width: int = 5) -> set[str]:
    """Word w-shingles with ASCII-\\s+ tokenization (RE2/SQL-compatible —
    see SimHasher note; the plain ``shingles`` uses Python str.split which
    also splits on unicode whitespace)."""
    toks = [t for t in _ASCII_WS.split(text.lower()) if t]
    if not toks:
        return set()
    if len(toks) < width:
        return {" ".join(toks)}
    return {" ".join(toks[i: i + width]) for i in range(len(toks) - width + 1)}


_P61 = (1 << 61) - 1


def _perm_min_p61(hs: np.ndarray, a: np.ndarray, b: np.ndarray,
                  _chunk: int = 65536) -> np.ndarray:
    """min over shingles of ((a_i*h + b_i) mod 2^61-1) & 0xFFFFFFFF, exact.

    Vectorized 61-bit modmul via 31/30-bit split so every intermediate
    stays < 2^64 (no uint64 wraparound) — bit-identical to python-int
    arithmetic, hence still replayable in DuckDB HUGEINT SQL:
      a*h = a1*h1*2^62 + (a1*h0 + a0*h1)*2^31 + a0*h0,  2^61 ≡ 1 (mod p)
    Shapes: a, b (P,); hs (H,) with every value < 2^61. Returns (P,).

    The shingle axis is processed in ``_chunk`` slices with a running min
    so peak memory is O(P × _chunk) (~16 MB per temporary at 32 perms),
    not O(P × H) — a 1 MB document has ~200k shingles and the one-shot
    broadcast held several (P, H) uint64 temporaries at once.
    """
    p = _MERSENNE
    one, c30, c31, c61 = (np.uint64(1), np.uint64(30), np.uint64(31),
                          np.uint64(61))
    m30, m31 = np.uint64(0x3FFFFFFF), np.uint64(0x7FFFFFFF)
    A = a[:, None]
    a1, a0 = A >> c31, A & m31          # a1 < 2^30, a0 < 2^31
    B = b[:, None]
    best: np.ndarray | None = None
    for start in range(0, len(hs), _chunk):
        H = hs[None, start:start + _chunk]
        h1, h0 = H >> c31, H & m31
        hi2 = (a1 * h1) << one          # a1*h1 < 2^60 < p; ×2 ≡ ×2^62 (mod p)
        mid = a1 * h0 + a0 * h1         # < 2^62
        mid = (mid >> c61) + (mid & p)  # ≤ p + 1
        np.subtract(mid, p, out=mid, where=mid >= p)
        # mid*2^31 mod p: mid = m1*2^30 + m0 → m1*2^61 + m0*2^31 ≡ m1 + m0*2^31
        midr = (mid >> c30) + ((mid & m30) << c31)  # < 2^31 + 2^61
        s = hi2 + midr + a0 * h0 + B                # < 2^63 + 2^62-ish < 2^64
        s = (s >> c61) + (s & p)                    # ≤ p + 7
        np.subtract(s, p, out=s, where=s >= p)
        vals = (s & _MAX_U32).min(axis=1)
        best = vals if best is None else np.minimum(best, vals)
    return best


def minhash_signature_md5(text: str, num_perm: int = 32,
                          shingle_width: int = 5, seed: int = 42) -> list[int]:
    """SQL-reproducible MinHash signature: md5-prefix shingle hashes
    (big-endian hex → UBIGINT, DuckDB-matchable) and EXACT modular
    permutations sig_i = min over shingles of ((a_i*h + b_i) mod 2^61-1)
    mod 2^32 — computed by the exact split-multiply kernel
    (`_perm_min_p61`, bit-identical to python-int bigint math, equivalence
    property-tested), so the arithmetic can be replayed in HUGEINT SQL
    with the (a, b) constants inlined. Empty text → all 0xFFFFFFFF.
    Used by the oracle-gated dedup variant.
    """
    sh = shingles_ascii(text, shingle_width)
    if not sh:
        return [0xFFFFFFFF] * num_perm
    a, b = _hash_family(num_perm, seed)
    hs = np.array([int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                                  "big") & _P61 for s in sh], dtype=np.uint64)
    return _perm_min_p61(hs, a, b).tolist()


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


import re

# explicit class matching RE2's \s ([ \t\n\f\r]) — Python's re.ASCII \s
# additionally matches \v (0x0B), which would silently diverge from the
# DuckDB oracle on texts containing vertical tabs
_ASCII_WS = re.compile(r"[ \t\n\r\f]+")


class SimHasher:
    """64-bit SimHash over word features (Charikar 2002).

    Token hash = first 8 bytes of md5 (big-endian hex prefix) — chosen so
    the whole signature is reproducible in ANSI SQL (DuckDB:
    ``CAST('0x' || substr(md5(tok),1,16) AS UBIGINT)``), making the
    simhash dedup pipeline oracle-checkable. Tokenization is ASCII-\\s+
    split to match SQL regexp semantics.
    """

    def __init__(self, bits: int = 64):
        self.bits = bits

    def signature(self, text: str) -> int:
        toks = {t for t in _ASCII_WS.split(text.lower()) if t}
        if not toks:
            return 0
        h = np.array(
            [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16) for t in toks],
            dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(self.bits, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        sig = 0
        for i in range(self.bits):
            if acc[i] > 0:
                sig |= 1 << i
        return sig

    def signatures(self, texts: list) -> list[int]:
        """Batch sketch, value-identical to ``[signature(t) for t in
        texts]`` (pytest-pinned) and 1.75× faster at sf0.1: md5 runs once
        per DISTINCT token across the batch (vocabulary ≪ instances) and
        the per-bit majority folds over the concatenated token-hash
        stream with ONE ``np.add.reduceat`` at doc offsets instead of a
        per-doc matrix build (BENCH/TUNING.md round 5)."""
        tok_sets = [sorted({t for t in _ASCII_WS.split((x or "").lower()) if t})
                    for x in texts]
        vocab: dict[str, int] = {}
        for ts in tok_sets:
            for t in ts:
                if t not in vocab:
                    vocab[t] = int.from_bytes(
                        hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
        lens = np.array([len(ts) for ts in tok_sets], dtype=np.int64)
        flat = np.array([vocab[t] for ts in tok_sets for t in ts],
                        dtype=np.uint64)
        nz = lens > 0
        if len(flat):
            bitm = ((flat[:, None] >> np.arange(self.bits, dtype=np.uint64))
                    & np.uint64(1)).astype(np.int64)
            ends = np.cumsum(lens)
            sums = np.add.reduceat(bitm, (ends - lens)[nz], axis=0)
            accs = 2 * sums - lens[nz][:, None]
            vals = (((accs > 0).astype(np.uint64)
                     << np.arange(self.bits, dtype=np.uint64)[None, :])
                    .sum(axis=1))
        else:
            vals = np.zeros(0, dtype=np.uint64)
        out, j = [], 0
        for d in range(len(texts)):
            if nz[d]:
                out.append(int(vals[j]))
                j += 1
            else:
                out.append(0)
        return out


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def token_window_hashes(text: str, width: int) -> np.ndarray:
    """uint64 hash of every ``width``-token window of ``text``, in token
    order — the unit of exact-substring duplicate-span detection
    (stages/dedup.py:duplicate_spans).

    Tokenization is ASCII-``\\s+`` split (no case folding: spans are EXACT
    substrings); window hash = first 8 bytes of the md5 of the
    space-joined window, big-endian hex prefix — DuckDB-reproducible as
    ``CAST('0x' || substr(md5(array_to_string(win, ' ')), 1, 16) AS
    UBIGINT)``, which is what makes the whole span pipeline
    oracle-checkable. Texts with fewer than ``width`` tokens yield no
    windows."""
    toks = [t for t in _ASCII_WS.split(text or "") if t]
    n = len(toks) - width + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter(
        (int(hashlib.md5(" ".join(toks[i:i + width]).encode("utf-8"))
             .hexdigest()[:16], 16) for i in range(n)),
        dtype=np.uint64, count=n)


def segment_hashes(text: str, width: int) -> np.ndarray:
    """uint64 hash of every NON-overlapping ``width``-token segment of
    ``text``, in segment order — the unit of cross-document segment dedup
    (stages/dedup.py:strip_common_segments), the fixed-width analog of
    CCNet's paragraph-level dedup (Wenzek et al. 2020, public) for
    corpora whose documents carry no paragraph structure.

    Same tokenization and hash rule as :func:`token_window_hashes`
    (ASCII-``\\s+`` split, md5 16-hex-char prefix as uint64) so the
    operator stays DuckDB-replayable; segment ``i`` covers tokens
    ``[i*width, (i+1)*width)`` and the final segment may be shorter —
    it hashes its own (short) space-joined text."""
    toks = [t for t in _ASCII_WS.split(text or "") if t]
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    n = (len(toks) + width - 1) // width
    return np.fromiter(
        (int(hashlib.md5(" ".join(toks[i * width:(i + 1) * width])
                         .encode("utf-8")).hexdigest()[:16], 16)
         for i in range(n)),
        dtype=np.uint64, count=n)
