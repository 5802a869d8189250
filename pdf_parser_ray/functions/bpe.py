"""From-scratch byte-pair-encoding (BPE) kernels.

The classic subword algorithm (Sennrich et al. 2016, public): train on a
WORD-FREQUENCY table (never the raw corpus — the table is the sufficient
statistic), repeatedly merging the most frequent adjacent symbol pair;
encode by replaying merges in rank order.  Determinism: ties on pair
count break lexicographically, so training is reproducible across runs
and processes.

Scale shape (used by ``stages/textstage.bpe_token_counts``): the corpus
contributes ONE distributed word-count exchange; training itself runs on
the driver over the bounded top-K word table; encoding is an
embarrassingly parallel second pass with the merge ranks broadcast.
"""

from __future__ import annotations


def _pair_counts(word_syms: dict[str, list[str]],
                 freqs: dict[str, int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for w, syms in word_syms.items():
        f = freqs[w]
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    return counts


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(word_freqs: dict[str, int],
              num_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges from a word→frequency table.
    Words are sequences of characters; no end-of-word marker (counts are
    within-word only, the common simplification).  Stops early when no
    pair repeats."""
    word_syms = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(word_syms, word_freqs)
        if not counts:
            break
        # max count, ties → lexicographically smallest pair (determinism)
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        merges.append(best)
        word_syms = {w: _merge_word(s, best) if len(s) > 1 else s
                     for w, s in word_syms.items()}
    return merges


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word by replaying merges in rank order (the standard
    greedy lowest-rank-first loop)."""
    syms = list(word)
    while len(syms) > 1:
        pairs = set(zip(syms, syms[1:]))
        cand = [(ranks[p], p) for p in pairs if p in ranks]
        if not cand:
            break
        syms = _merge_word(syms, min(cand)[1])
    return syms
