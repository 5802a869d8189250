"""Text-analysis kernels: token counting, quality scoring, language ID,
document fingerprinting.

These are new, scale-oriented capabilities (no reference counterpart —
SURVEY.md §2.9); all deterministic, and deliberately specified with
arithmetic that an ANSI-SQL oracle can reproduce exactly (the driver
hash-compares Ray output vs DuckDB per query):

  - token count   = number of maximal runs of non-whitespace
  - alpha count   = number of [A-Za-z] chars
  - punct count   = number of [.,;:!?] chars
  - stopword count per language uses non-overlapping ``' word '`` substring
    counting via the replace-length trick, so Python and SQL agree char-for-char.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# Small per-language stopword lists for the n-gram/stopword-vote heuristic.
# Order matters only for deterministic tie-breaking (alphabetical, then
# 'unknown' when no stopwords at all matched).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "of", "a", "is"),
    "es": ("el", "la", "que", "y", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}


def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized: number of ``\\S+`` runs."""
    return texts.fillna("").str.count(r"\S+").astype("int64")


def bpe_ish_token_count(texts: pd.Series) -> pd.Series:
    """A BPE-ish sub-word token count: word pieces + digits + punctuation.

    Matches runs of letters (split every 8 chars like BPE merges cap),
    digit runs, and single punctuation marks. Deterministic and cheap;
    used for budget estimation, not model parity.
    """
    pieces = texts.fillna("").str.count(r"[A-Za-z]{1,8}|[0-9]{1,4}|[^\sA-Za-z0-9]")
    return pieces.astype("int64")


def char_count(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.len().astype("int64")


def alpha_count(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.count(r"[A-Za-z]").astype("int64")


def punct_count(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.count(r"[.,;:!?]").astype("int64")


def substring_occurrences(texts: pd.Series, needle: str) -> pd.Series:
    """Non-overlapping occurrence count via the replace-length trick.

    Defined this way (instead of regex) so a SQL oracle can reproduce it
    exactly: (len(s) - len(replace(s, needle, ''))) / len(needle).
    """
    s = texts.fillna("")
    return ((s.str.len() - s.str.replace(needle, "", regex=False).str.len()) // len(needle)).astype("int64")


def stopword_votes(texts: pd.Series, lang: str) -> pd.Series:
    """Total stopword occurrences for one language over ``' '||text||' '``."""
    padded = " " + texts.fillna("") + " "
    total = pd.Series(np.zeros(len(texts), dtype="int64"), index=texts.index)
    for w in LANG_STOPWORDS[lang]:
        total = total + substring_occurrences(padded, f" {w} ")
    return total


def detect_language(texts: pd.Series) -> pd.Series:
    """Stopword-vote language ID. Argmax across languages; ties broken by
    alphabetical language code; zero votes everywhere → 'unknown'."""
    votes = {lang: stopword_votes(texts, lang).to_numpy() for lang in sorted(LANG_STOPWORDS)}
    langs = sorted(votes)
    mat = np.stack([votes[lg] for lg in langs], axis=1)  # (n, L)
    best = mat.argmax(axis=1)  # first max → alphabetical tie-break
    out = np.array(langs, dtype=object)[best]
    out[mat.max(axis=1) == 0] = "unknown"
    return pd.Series(out, index=texts.index, dtype=object)


def quality_score(texts: pd.Series) -> pd.DataFrame:
    """Heuristic document-quality features + composite keep flag.

    All components are SQL-reproducible:
      n_tokens, n_chars, alpha_ratio, punct_ratio, mean_token_len,
      quality_keep = n_tokens>=10 AND alpha_ratio>0.5 AND punct_ratio<0.2.
    Ratios are computed in float64 with max(n_chars,1) denominators.
    """
    n_chars = char_count(texts)
    n_tokens = token_count(texts)
    denom = n_chars.clip(lower=1).astype("float64")
    alpha_ratio = alpha_count(texts).astype("float64") / denom
    punct_ratio = punct_count(texts).astype("float64") / denom
    nonspace = n_chars - texts.fillna("").str.count(r"\s").astype("int64")
    mean_token_len = nonspace.astype("float64") / n_tokens.clip(lower=1).astype("float64")
    keep = (n_tokens >= 10) & (alpha_ratio > 0.5) & (punct_ratio < 0.2)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alpha_ratio": alpha_ratio,
            "punct_ratio": punct_ratio,
            "mean_token_len": mean_token_len,
            "quality_keep": keep,
        }
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowing over k-gram rolling hashes)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1_000_003)
_FP_MASK = np.uint64((1 << 61) - 1)


def kgram_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rolling polynomial hashes of all k-grams of ``text`` (uint64).

    k-grams are over Unicode CODEPOINTS (utf-32 units), not bytes — one
    hash position per character regardless of encoding width, which is
    also what the SQL oracle's per-character ord() replay computes."""
    data = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(data)
    if n < k:
        if n == 0:
            return np.zeros(0, dtype=np.uint64)
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in data:
                h = (h * _FP_BASE + c) & _FP_MASK
        return np.array([h], dtype=np.uint64)
    # cumulative polynomial hash with precomputed powers (wraparound mod 2^64
    # then mask is intended — silence numpy's overflow warnings)
    base = int(_FP_BASE)
    powers = np.array([pow(base, i, 1 << 61) for i in range(k)], dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    with np.errstate(over="ignore"):
        h = (windows * powers[::-1]).sum(axis=1, dtype=np.uint64) & _FP_MASK
    return h


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003, public algorithm): keep the min hash
    of each sliding window of k-gram hashes; dedupe consecutive picks."""
    h = kgram_hashes(text, k)
    if len(h) == 0:
        return h
    if len(h) <= window:
        return np.array([h.min()], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = win.min(axis=1)
    keep = np.ones(len(mins), dtype=bool)
    keep[1:] = mins[1:] != mins[:-1]
    return np.unique(mins[keep])


def doc_fingerprint_hex(text: str, k: int = 8, window: int = 16) -> str:
    """Stable doc-level fingerprint: sha256 of the sorted winnowed set,
    serialized as comma-joined decimal values — a TEXT serialization
    chosen deliberately so the digest is SQL-replayable
    (``sha256(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h))``; DuckDB's
    sha256 is VARCHAR-only, so a raw-bytes digest could never be
    oracle-gated)."""
    fp = np.sort(winnow_fingerprint(text, k, window))
    payload = ",".join(str(int(v)) for v in fp)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def substring_occurrences_sql(padded_expr: str, needle: str) -> str:
    """The SQL replay of :func:`substring_occurrences` on an
    ALREADY-PADDED expression — the single source of the replace-length
    counting idiom shared by the lang-id votes, the model-filter feature
    block and the banned-word filter (three oracles that must stay
    bit-identical to the pandas kernel above)."""
    lit = needle.replace("'", "''")
    return (f"(length({padded_expr}) - length(replace({padded_expr}, "
            f"'{lit}', ''))) // {len(needle)}")


# Telltale sequences of UTF-8 bytes mis-decoded as Latin-1/cp1252
# (ftfy's core signal): 'Ã' leads every 2-byte UTF-8 sequence read as
# Latin-1; 'â€' leads the mangled General Punctuation block (curly
# quotes, dashes, ellipsis). U+FFFD is the decoder's own damage report.
MOJIBAKE_MARKERS = ("Ã", "â€")
REPLACEMENT_CHAR = "�"

# Character classes shared verbatim (as RE2-compatible patterns) by the
# pandas kernel and the DuckDB oracle. Control excludes \t\n\v\f\r --
# those are whitespace, not damage.
_WS_CLASS = "[ \\t\\n\\r\\f\\x0B]"
_DIGIT_CLASS = "[0-9]"
_CTL_CLASS = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"


def encoding_stats(texts: pd.Series) -> pd.DataFrame:
    """Encoding-wellformedness features (the ftfy-style pre-filter every
    web-corpus pipeline runs before training): per-doc counts of
    whitespace, digits, raw control characters, U+FFFD replacement
    characters and classic UTF-8-as-Latin-1 mojibake markers, plus a
    composite ``wellformed`` verdict. All-integer outputs so a DuckDB
    oracle replays them bit-exactly (the regex classes above are shared
    with :func:`encoding_stats_sql`)."""
    s = texts.fillna("")
    n_chars = s.str.len().astype("int64")
    n_ws = s.str.count(_WS_CLASS).astype("int64")
    n_digits = s.str.count(_DIGIT_CLASS).astype("int64")
    n_ctl = s.str.count(_CTL_CLASS).astype("int64")
    n_replacement = substring_occurrences(s, REPLACEMENT_CHAR)
    n_moji = pd.Series(np.zeros(len(s), dtype="int64"), index=s.index)
    for marker in MOJIBAKE_MARKERS:
        n_moji = n_moji + substring_occurrences(s, marker)
    wellformed = (n_ctl == 0) & (n_replacement == 0) & (n_moji == 0)
    return pd.DataFrame({
        "n_chars": n_chars, "n_ws": n_ws, "n_digits": n_digits,
        "n_ctl": n_ctl, "n_replacement": n_replacement,
        "n_mojibake": n_moji, "wellformed": wellformed,
    })


def _class_count_sql(expr: str, char_class: str) -> str:
    return (f"(length({expr}) - length(regexp_replace({expr}, "
            f"'{char_class}', '', 'g')))")


def encoding_stats_sql(text_expr: str = "coalesce(text, '')") -> str:
    """DuckDB SELECT-list replay of :func:`encoding_stats` (same classes,
    same replace-length idiom; RE2 reads the \\x escapes the same way
    Python's re does)."""
    moji = " + ".join(substring_occurrences_sql(text_expr, m)
                      for m in MOJIBAKE_MARKERS)
    repl = substring_occurrences_sql(text_expr, REPLACEMENT_CHAR)
    ctl = _class_count_sql(text_expr, _CTL_CLASS)
    return (
        f"length({text_expr}) AS n_chars, "
        f"{_class_count_sql(text_expr, _WS_CLASS)} AS n_ws, "
        f"{_class_count_sql(text_expr, _DIGIT_CLASS)} AS n_digits, "
        f"{ctl} AS n_ctl, "
        f"{repl} AS n_replacement, "
        f"{moji} AS n_mojibake, "
        f"({ctl} = 0 AND ({repl}) = 0 AND ({moji}) = 0) AS wellformed"
    )


# Ordered repair table for the classic UTF-8-bytes-read-as-cp1252
# double encoding (ftfy's most common case): each left side is the
# mangled form of the right side. 3-char General-Punctuation repairs
# first, then the 2-char Latin-1 accents (no left side is a prefix of
# another within the applied order). One source of truth for the pandas
# kernel AND the SQL replay.
MOJIBAKE_REPAIRS = (
    ("\u00e2\u20ac\u2122", "\u2019"),  # mangled right single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # mangled left double quote
    ("\u00e2\u20ac\u009d", "\u201d"),  # mangled right double quote
    ("\u00e2\u20ac\u201c", "\u2013"),  # mangled en dash
    ("\u00e2\u20ac\u201d", "\u2014"),  # mangled em dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # mangled ellipsis
    ("\u00c3\u00a9", "\u00e9"),  # e acute
    ("\u00c3\u00a8", "\u00e8"),  # e grave
    ("\u00c3\u00a1", "\u00e1"),  # a acute
    ("\u00c3\u00b3", "\u00f3"),  # o acute
    ("\u00c3\u00b1", "\u00f1"),  # n tilde
    ("\u00c3\u00bc", "\u00fc"),  # u umlaut
    ("\u00c3\u00b6", "\u00f6"),  # o umlaut
    ("\u00c3\u00a4", "\u00e4"),  # a umlaut
    ("\u00c3\u00a7", "\u00e7"),  # c cedilla
    ("\u00c3\u00a0", "\u00e0"),  # a grave
    ("\u00c2\u00ab", "\u00ab"),  # left guillemet
    ("\u00c2\u00bb", "\u00bb"),  # right guillemet
    ("\u00c2\u00a0", "\u00a0"),  # stray A-circumflex before nbsp
)


def fix_mojibake(texts: pd.Series) -> pd.DataFrame:
    """Deterministic mojibake REPAIR (the consumption form of
    :func:`encoding_stats`): the fixed, ordered :data:`MOJIBAKE_REPAIRS`
    table applied as vectorized literal replaces — no heuristics, no
    model, so the transform is bit-reproducible across engines and the
    DuckDB oracle replays it as nested ``replace()`` calls
    (:func:`fix_mojibake_sql`). Returns (fixed_text, changed)."""
    orig = texts.fillna("")
    s = orig
    for bad, good in MOJIBAKE_REPAIRS:
        s = s.str.replace(bad, good, regex=False)
    return pd.DataFrame({"fixed_text": s, "changed": (s != orig)})


def fix_mojibake_sql(text_expr: str = "coalesce(text, '')") -> str:
    """SQL SELECT-list replay of :func:`fix_mojibake` — the same ordered
    table as nested replace() calls."""
    expr = text_expr
    for bad, good in MOJIBAKE_REPAIRS:
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        expr = f"replace({expr}, '{b}', '{g}')"
    return (f"{expr} AS fixed_text, "
            f"({expr} <> {text_expr}) AS changed")
