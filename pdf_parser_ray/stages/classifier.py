"""Model-based document filtering: a trained linear classifier over
SQL-exact integer text features.

The heuristic ``textstats.quality_score`` thresholds and the
``detect_language`` argmax vote are hand-set rules; real curation
pipelines (CCNet, Gopher, fastText-style web filters — public papers)
LEARN the keep/drop boundary from labels instead. This module is that
pattern, Ray-Data-first and fully deterministic:

  - :func:`extract_features` — int64 per-mille features computed with the
    same arithmetic contract as the ``quality`` oracle (regex counts,
    integer floor-division by ``GREATEST(n, 1)``), so a DuckDB oracle
    reproduces every feature bit-for-bit;
  - :func:`train_model` — driver-side full-batch logistic regression on
    a bounded sample (fixed iterations, fixed learning rate, float64 —
    deterministic; no RNG anywhere). Standardization is FOLDED back into
    the returned raw-feature weights, so scoring needs no per-dataset
    statistics;
  - :func:`score_model` — stateless vectorized ``map_batches`` scoring
    pass. The logit is accumulated in a FIXED term order (b, then one
    ``z += w_j * x_j`` per feature, left to right) — exactly the IEEE
    sequence DuckDB performs for the literal expression
    ``b + w1*f1 + w2*f2 + ...`` — so the SQL oracle's doubles are
    bitwise identical and ``floor(1000*z)`` / ``z >= 0`` match exactly.

Scale shape: training touches only a driver-side sample (like the IVF
centroids / PQ codebooks in stages/similarity.py); scoring is a single
embarrassing-parallel pass, weights travel as a handful of float
literals in the task closure. No shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import textstats

#: scoring feature order — FIXED: both the Ray kernel and the SQL oracle
#: accumulate the logit in exactly this sequence. Surface statistics
#: first, then the per-language stopword votes (the replace-length trick,
#: same arithmetic as the lang_id oracle).
FEATURE_COLS = ("n_tokens", "alpha_pm", "punct_pm", "digit_pm", "mtl_milli",
                *(f"v_{lg}" for lg in sorted(textstats.LANG_STOPWORDS)))


def extract_features(texts: pd.Series) -> pd.DataFrame:
    """Int64 feature block (per-mille ratios, integer floor-division).

    SQL replay of each column (on ``text``):
      n_tokens  = length(regexp_extract_all(text, '\\S+'))
      alpha_pm  = (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) // GREATEST(length(text), 1)
      punct_pm  = same with '[^.,;:!?]'
      digit_pm  = same with '[^0-9]'
      mtl_milli = (1000 * length(regexp_replace(text, '\\s', '', 'g'))) // GREATEST(n_tokens, 1)
      v_<lang>  = total non-overlapping ' word ' occurrences over
                  ' ' || text || ' ' (replace-length trick, per stopword)
    """
    s = texts.fillna("")
    n_chars = s.str.len().astype("int64")
    n_tokens = textstats.token_count(texts)
    denom = n_chars.clip(lower=1)
    alpha_pm = (1000 * textstats.alpha_count(texts)) // denom
    punct_pm = (1000 * textstats.punct_count(texts)) // denom
    digit_pm = (1000 * s.str.count(r"[0-9]").astype("int64")) // denom
    nonspace = s.str.replace(r"\s", "", regex=True).str.len().astype("int64")
    mtl_milli = (1000 * nonspace) // n_tokens.clip(lower=1)
    out = {"n_tokens": n_tokens, "alpha_pm": alpha_pm, "punct_pm": punct_pm,
           "digit_pm": digit_pm, "mtl_milli": mtl_milli}
    for lg in sorted(textstats.LANG_STOPWORDS):
        out[f"v_{lg}"] = textstats.stopword_votes(texts, lg)
    return pd.DataFrame(out)


def weak_labels_quality(feats: pd.DataFrame) -> np.ndarray:
    """The ORACLED quality rule (the `quality` query's per-mille form:
    n_tokens >= 10 AND alpha_per_mille > 500 AND punct_per_mille < 200)
    as 0/1 training targets. NOTE this is the integer-exact contract, not
    textstats.quality_score's float `alpha_ratio > 0.5` — the two differ
    on exact-boundary docs (alpha 501/1001: ratio 0.50049 > 0.5 but
    per-mille floor 500 is not > 500)."""
    keep = ((feats["n_tokens"] >= 10) & (feats["alpha_pm"] > 500)
            & (feats["punct_pm"] < 200))
    return keep.to_numpy().astype(np.float64)


def weak_labels_english(texts: pd.Series) -> np.ndarray:
    """'is the document English' per the stopword-vote lang-id — weak
    supervision from an existing rule, the standard bootstrap when human
    labels are unavailable (the fastText web-filter recipe)."""
    return (textstats.detect_language(texts) == "en").to_numpy().astype(np.float64)


def train_model(texts: pd.Series, labels: np.ndarray | None = None,
                *, iters: int = 300, lr: float = 0.5) -> tuple:
    """Deterministic driver-side logistic regression → raw-feature weights
    ``(b, *w)`` with one ``w`` per FEATURE_COLS entry. Default labels:
    :func:`weak_labels_english` (keep-the-target-language filter).

    Full-batch gradient descent on standardized features (zero init, no
    RNG, fixed ``iters``/``lr``); the standardization is folded into the
    returned weights so scoring consumes the raw int64 features directly.
    """
    feats = extract_features(texts)
    y = (weak_labels_english(texts) if labels is None
         else np.asarray(labels, np.float64))
    x = feats[list(FEATURE_COLS)].to_numpy().astype(np.float64)
    mu = x.mean(axis=0)
    sd = x.std(axis=0)
    sd[sd == 0] = 1.0
    xs = (x - mu) / sd
    w = np.zeros(x.shape[1], dtype=np.float64)
    b = 0.0
    n = float(len(y))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xs @ w + b)))
        g = p - y
        w = w - lr * (xs.T @ g) / n
        b = b - lr * float(g.sum()) / n
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    return (float(b_raw), *(float(v) for v in w_raw))


def score_model(ds, weights, *, text_col: str = "text",
                id_col: str = "doc_id"):
    """Score every document with the trained weights (one stateless
    vectorized pass; no shuffle). Output columns:

      score_milli = floor(1000 * z) as int64 (z = the raw logit)
      model_keep  = z >= 0

    The logit accumulation order is pinned to FEATURE_COLS so a DuckDB
    oracle inlining the same weight literals is bitwise-identical.
    """
    b = float(weights[0])
    ws = [float(v) for v in weights[1:]]
    if len(ws) != len(FEATURE_COLS):
        raise ValueError(f"expected {1 + len(FEATURE_COLS)} weights")

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        feats = extract_features(batch[text_col])
        z = np.full(len(batch), b, dtype=np.float64)
        for w, col in zip(ws, FEATURE_COLS):
            z = z + w * feats[col].to_numpy().astype(np.float64)
        return pd.DataFrame({
            id_col: batch[id_col],
            "score_milli": np.floor(1000.0 * z).astype(np.int64),
            "model_keep": z >= 0.0})

    return ds.map_batches(kernel, batch_format="pandas")


def _vote_sql(lang: str, text_expr: str = "text") -> str:
    """Total-stopword-vote SQL for one language: sum over its stopwords of
    the non-overlapping replace-length count on ``' ' || text || ' '`` —
    the identical integer arithmetic as textstats.stopword_votes (and the
    lang_id oracle's per-language vote columns), built through the single
    shared idiom helper so the oracles cannot drift apart."""
    padded = f"(' ' || {text_expr} || ' ')"
    terms = [textstats.substring_occurrences_sql(padded, f" {w} ")
             for w in textstats.LANG_STOPWORDS[lang]]
    return "(" + " + ".join(terms) + ")"


def model_filter_sql(weights, *, from_rel: str = "documents",
                     id_col: str = "doc_id") -> str:
    """The exact-replay DuckDB statement for :func:`score_model` with
    ``weights`` inlined as repr() literals (repr = shortest round-trip
    float64 text, so SQL parses the identical double)."""
    b = repr(float(weights[0]))
    ws = [repr(float(v)) for v in weights[1:]]
    terms = " + ".join(f"{w} * {c}" for w, c in zip(ws, FEATURE_COLS))
    z = f"{b} + {terms}"
    feats = (
        f"SELECT {id_col}, "
        "length(regexp_extract_all(text, '\\S+')) AS n_tokens, "
        "(1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) // GREATEST(length(text), 1) AS alpha_pm, "
        "(1000 * length(regexp_replace(text, '[^.,;:!?]', '', 'g'))) // GREATEST(length(text), 1) AS punct_pm, "
        "(1000 * length(regexp_replace(text, '[^0-9]', '', 'g'))) // GREATEST(length(text), 1) AS digit_pm, "
        "(1000 * length(regexp_replace(text, '\\s', '', 'g'))) // GREATEST(length(regexp_extract_all(text, '\\S+')), 1) AS mtl_milli, "
        + ", ".join(_vote_sql(lg) + f" AS v_{lg}"
                    for lg in sorted(textstats.LANG_STOPWORDS))
        + f" FROM {from_rel}")
    return (f"SELECT {id_col}, CAST(floor(1000.0 * ({z})) AS BIGINT) AS score_milli, "
            f"({z}) >= 0.0 AS model_keep FROM ({feats})")
