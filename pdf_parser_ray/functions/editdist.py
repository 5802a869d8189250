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


def passjoin_buckets(s: str, d: int) -> set[str]:
    """COMPLETE candidate bucket keys for self-join at edit distance ≤ d.

    Emits both roles for ``s``:
    - index keys: its own d+1 segments, keyed (own_length|seg_idx|value);
    - probe keys: for every partner length l in [len(s)-d, len(s)+d], every
      substring of ``s`` that could equal segment i of a length-l partner
      (start position within ±d of that segment's start — the pigeonhole
      shift bound).
    Strings too short to partition (len ≤ 2d) all share one "tiny" bucket:
    if the shorter side of a pair has fewer than d+1 chars, the longer side
    has at most 2d, so the tiny bucket covers exactly the unpartitionable
    pairs. Two strings within distance d are guaranteed to share ≥1 key;
    extra sharing only adds candidates the exact verify then drops.

    Scale note: a bucket is "same exact substring at an aligned position in
    same-length-class strings" — discriminative on natural text, but a
    corpus of near-constant short keys degenerates to hot buckets whose
    all-pairs candidate step is quadratic IN THE BUCKET (the semdedup
    hot-cluster caveat applies; cap or pre-hash-split hot key values
    upstream if a corpus exhibits this).
    """
    k = d + 1
    m = len(s)
    out: set[str] = set()
    if m <= 2 * d:
        out.add("T")
    if m >= k:
        for i, (p, ln) in enumerate(_segments(m, k)):
            out.add(f"{m}|{i}|{s[p:p + ln]}")
    for l in range(max(m - d, k), m + d + 1):
        for i, (p, ln) in enumerate(_segments(l, k)):
            if ln == 0:
                continue
            lo = max(0, p - d)
            hi = min(m - ln, p + d)
            for q in range(lo, hi + 1):
                out.add(f"{l}|{i}|{s[q:q + ln]}")
    return out
