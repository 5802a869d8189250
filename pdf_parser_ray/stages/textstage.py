"""Vectorized text-analysis stages over a plain ``text`` column.

Stateless pandas-batch functions (cheap, elastic tasks) — each adds columns
and is designed so a DuckDB oracle can reproduce the values exactly
(functions/textstats.py docstring).
"""

from __future__ import annotations

import pandas as pd

from ..functions import textstats


def add_token_counts(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    batch["n_tokens"] = textstats.token_count(batch[text_col])
    batch["n_tokens_bpe"] = textstats.bpe_ish_token_count(batch[text_col])
    return batch


def add_quality(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    q = textstats.quality_score(batch[text_col])
    for col in q.columns:
        batch[col] = q[col].to_numpy()
    return batch


def add_language(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    batch["lang_detected"] = textstats.detect_language(batch[text_col]).to_numpy()
    return batch


class Fingerprint:
    """Winnowing fingerprint stage (per-doc rolling-hash sketch).

    Callable class → actor pool; the kernel is per-row but C-speed numpy.
    """

    def __init__(self, k: int = 8, window: int = 16, text_col: str = "text"):
        self.k, self.window, self.text_col = k, window, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = [
            textstats.doc_fingerprint_hex(t or "", self.k, self.window)
            for t in batch[self.text_col]
        ]
        return batch


def bm25_score(ds, *, terms: list[str], text_col: str = "text",
               id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75):
    """Distributed BM25 relevance scoring (Robertson–Spärck Jones / Okapi,
    public algorithm) of every document against a fixed term list — the
    relevance-filtering primitive of training-data curation.

    Two passes, no shuffle at all:
      pass A emits ONE slim partial row per batch (n_docs, Σ doc_len, and
      per-term document frequencies as a list column); the driver folds
      the ≤ n_blocks partials into (N, avgdl, idf_t) — a bounded scalar
      collect, not a data collect. Pass B scores each doc vectorized
      against those few floats shipped in the task closure (no broadcast
      object needed at this size).

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  (the non-negative variant);
    score = Σ_t idf_t · tf/(tf + k1·(1 − b + b·dl/avgdl)), accumulated in
    term order so the float sum is reproducible left-to-right by the SQL
    oracle. Tokenization is lowercased ASCII-``\\s+`` split (matches the
    oracle's lower() + regexp split). Output: (id_col, dl, score_milli)
    with DuckDB-style half-away-from-zero milli rounding.
    """
    import math

    import numpy as np
    import pyarrow as pa

    from ..functions.minhash import _ASCII_WS

    terms = list(terms)

    def _toks(t: str) -> list[str]:
        return [x for x in _ASCII_WS.split((t or "").lower()) if x]

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n, sum_dl = 0, 0
        df = [0] * len(terms)
        for t in texts:
            toks = _toks(t)
            n += 1
            sum_dl += len(toks)
            tokset = set(toks)
            for j, term in enumerate(terms):
                if term in tokset:
                    df[j] += 1
        return pa.table({"n_docs": pa.array([n], type=pa.int64()),
                         "sum_dl": pa.array([sum_dl], type=pa.int64()),
                         "df": pa.array([df], type=pa.list_(pa.int64()))})

    n_total, sum_dl_total = 0, 0
    df_total = np.zeros(len(terms), dtype=np.int64)
    for part in ds.map_batches(partials, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        n_total += sum(part.column("n_docs").to_pylist())
        sum_dl_total += sum(part.column("sum_dl").to_pylist())
        for row in part.column("df").to_pylist():
            df_total += np.asarray(row, dtype=np.int64)

    avgdl = sum_dl_total / n_total if n_total else 1.0
    idf = [math.log((n_total - int(d) + 0.5) / (int(d) + 0.5) + 1.0)
           for d in df_total]

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def score(batch: pa.Table) -> pa.Table:
        ids, dls, millis = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = _toks(t)
            dl = len(toks)
            s = 0.0
            for term, w in zip(terms, idf):  # fixed order: SQL-reproducible
                tf = toks.count(term)
                s += w * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
            ids.append(i)
            dls.append(dl)
            # DuckDB round(): half away from zero
            millis.append(int(math.copysign(math.floor(abs(s) * 1000 + 0.5), s)))
        return pa.table({id_col: pa.array(ids, type=id_type),
                         "dl": pa.array(dls, type=pa.int64()),
                         "score_milli": pa.array(millis, type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")
