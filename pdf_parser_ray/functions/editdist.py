"""Edit-distance kernels for the PassJoin near-dup family.

Public method: Li, Deng & Feng, "PASS-JOIN: A Partition-based Method for
Similarity Joins" (PVLDB 2011). A string of length l is partitioned into
d+1 segments; by pigeonhole, any string within edit distance d of it must
contain one of those segments verbatim at a position shifted by at most d.
Candidate buckets are therefore (partner_length, segment_index, substring)
keys; exact (banded) Levenshtein disposes.

The reference repo has no similarity machinery at all (it is a
Streamlit/SQLite extraction app, src/pdf_parser/*); this family is part of
the training-data curation surface the engine adds on top (SURVEY §2.9).
The unit-cost Levenshtein here is defined to match DuckDB's
``levenshtein()`` exactly so the whole pipeline is SQL-replayable.
"""

from __future__ import annotations


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (insert/delete/substitute), the classic
    Wagner-Fischer DP — semantics identical to DuckDB's levenshtein()."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def levenshtein_leq(a: str, b: str, d: int) -> bool:
    """True iff edit distance ≤ d, via the Ukkonen band: only DP cells with
    |i - j| ≤ d can stay ≤ d, so each row costs O(d) and the scan aborts
    as soon as a full row exceeds d. Exact (no false positives/negatives);
    this is the verify kernel, so it runs once per candidate pair only."""
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return False
    if d == 0:
        return a == b
    if la < lb:
        a, b, la, lb = b, a, lb, la
    if lb == 0:
        return la <= d
    big = d + 1
    prev = [j if j <= d else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo = max(1, i - d)
        hi = min(lb, i + d)
        cur = [big] * (lb + 1)
        if lo == 1:
            cur[0] = i if i <= d else big
        ca = a[i - 1]
        best = big
        for j in range(lo, hi + 1):
            c = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != b[j - 1]))
            if c > big:
                c = big
            cur[j] = c
            if c < best:
                best = c
        if cur[0] < best:
            best = cur[0]
        if best > d:
            return False
        prev = cur
    return prev[lb] <= d


def char_matrix(strs, pad_to: int = 0):
    """(n, L) uint32 codepoint matrix (zero-padded) + int64 length vector —
    the columnar string layout the vectorized DP kernel consumes."""
    import numpy as np

    lens = np.array([len(s or "") for s in strs], dtype=np.int64)
    L = max(int(lens.max()) if len(lens) else 0, pad_to, 1)
    buf = np.zeros((len(strs), L), dtype=np.uint32)
    for r, s in enumerate(strs):
        if s:
            buf[r, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                            dtype=np.uint32)
    return buf, lens


def levenshtein_leq_pairs(A, la, B, lb, d: int):
    """Vectorized banded ed≤d over PAIR BATCHES: row r of (A, la) vs row r
    of (B, lb); returns a bool vector. Same Ukkonen band as the scalar
    ``levenshtein_leq`` but the DP cell loop runs 5 numpy ops per text row
    over the whole pair axis instead of a Python loop per pair — the
    verify stage's hot kernel (measured ~10× over the scalar loop on
    650k-candidate batches; tests pin vec ≡ scalar)."""
    import numpy as np

    n = A.shape[0]
    if A.shape[1] != B.shape[1]:  # align widths (zero padding is neutral)
        L = max(A.shape[1], B.shape[1])
        A = np.pad(A, ((0, 0), (0, L - A.shape[1])))
        B = np.pad(B, ((0, 0), (0, L - B.shape[1])))
    big = np.int16(d + 1)
    W = 2 * d + 1
    ans = np.full(n, big, dtype=np.int16)
    # length filter first — also guarantees |lb-la| <= d below
    alive = np.abs(la - lb) <= d
    if not alive.any():
        return np.zeros(n, dtype=bool)
    # exact-equality fast path (padded rows compare equal iff equal strs)
    eq = alive & (la == lb) & (A == B).all(axis=1)
    ans[eq] = 0
    # D[:, k] = dist(i, i + k - d) for the current text row i
    D = np.full((n, W), big, dtype=np.int16)
    for o in range(0, d + 1):
        col = np.full(n, min(o, d + 1), dtype=np.int16)
        col[o > lb] = big  # j > lb is outside the matrix
        D[:, d + o] = col
    done0 = (la == 0) & ~eq & alive
    if done0.any():
        ans[done0] = np.minimum(lb[done0], int(big)).astype(np.int16)
    max_i = int(la.max()) if n else 0
    for i in range(1, max_i + 1):
        ai = A[:, i - 1] if i - 1 < A.shape[1] else np.zeros(n, dtype=np.uint32)
        Dn = np.full((n, W), big, dtype=np.int16)
        for k in range(W):
            o = k - d
            j = i + o
            if j < 0:
                continue
            if j == 0:
                # (i, 0): delete the whole i-prefix
                if i <= d:
                    Dn[:, k] = i
                continue
            cell = np.full(n, big, dtype=np.int16)
            if j - 1 < B.shape[1]:
                # diagonal (substitute/match) from (i-1, j-1)
                cell = np.minimum(
                    cell, D[:, k] + (ai != B[:, j - 1]).astype(np.int16))
            if k + 1 < W:
                # above, from (i-1, j): delete a_i
                cell = np.minimum(cell, D[:, k + 1] + 1)
            if k >= 1:
                # left, from (i, j-1): insert b_j
                cell = np.minimum(cell, Dn[:, k - 1] + 1)
            cell[j > lb] = big  # outside partner's length
            np.minimum(cell, big, out=cell)
            Dn[:, k] = cell
        D = Dn
        fin = (la == i) & ~eq & alive  # off is in-band only for alive pairs
        if fin.any():
            off = (lb[fin] - i) + d
            ans[fin] = D[fin, off]
    return ans <= d


def _segments(length: int, k: int) -> list[tuple[int, int]]:
    """Fixed even partition of a length-``length`` string into ``k``
    segments: the first k - (length % k) get floor(length/k) chars, the
    rest one more. Deterministic — both the index and probe sides must
    agree on it exactly."""
    base, rem = divmod(length, k)
    out = []
    pos = 0
    for i in range(k):
        ln = base + (1 if i >= k - rem else 0)
        out.append((pos, ln))
        pos += ln
    return out


def passjoin_keys(s: str, d: int) -> tuple[set[str], set[str]]:
    """COMPLETE candidate bucket keys for self-join at edit distance ≤ d,
    split by role: (index_keys, probe_keys).

    - index keys: the string's own d+1 segments, keyed
      (own_length|seg_idx|value);
    - probe keys: for every partner length l in [len(s)-d, len(s)+d], the
      substrings of ``s`` that could equal segment i of a length-l
      partner. The segment's start shift ``sh`` obeys the SOUND prefix/
      suffix edit split |sh| + |Δ − sh| ≤ d with Δ = len(s) − l (the net
      length change: a prefix shift of |sh| needs ≥|sh| edits before the
      untouched segment, and the suffix must absorb the remaining Δ − sh)
      — a strictly tighter window than the naive ±d, roughly halving both
      probe emissions and bucket sizes.

    Pairing is INDEX × PROBE only (never probe×probe): if ed(s,t) ≤ d,
    some segment of t's own partition is untouched and appears in s within
    the shift window, so s's probe set meets t's index set (and/or vice
    versa). Strings too short to partition (len ≤ 2d) all share one
    "tiny" bucket in BOTH roles: if the shorter side of a pair has fewer
    than d+1 chars, the longer has at most 2d.

    Scale note: a bucket is "same exact substring at an aligned position
    in same-length-class strings" — discriminative on natural text, but a
    corpus of near-constant short keys degenerates to hot buckets whose
    index×probe candidate step is quadratic IN THE BUCKET (the semdedup
    hot-cluster caveat applies; cap or pre-hash-split hot key values
    upstream if a corpus exhibits this).
    """
    k = d + 1
    m = len(s)
    idx: set[str] = set()
    probe: set[str] = set()
    if m <= 2 * d:
        idx.add("T")
        probe.add("T")
    if m >= k:
        for i, (p, ln) in enumerate(_segments(m, k)):
            idx.add(f"{m}|{i}|{s[p:p + ln]}")
    for l in range(max(m - d, k), m + d + 1):
        delta = m - l
        for i, (p, ln) in enumerate(_segments(l, k)):
            if ln == 0:
                continue
            for sh in range(-d, d + 1):
                if abs(sh) + abs(delta - sh) > d:
                    continue
                q = p + sh
                if q < 0 or q + ln > m:
                    continue
                probe.add(f"{l}|{i}|{s[q:q + ln]}")
    return idx, probe


def passjoin_buckets(s: str, d: int) -> set[str]:
    """Union of both role key sets (kept for property tests; the pipeline
    uses the role-split ``passjoin_keys`` to pair index×probe only)."""
    idx, probe = passjoin_keys(s, d)
    return idx | probe
