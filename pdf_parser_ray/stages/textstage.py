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
