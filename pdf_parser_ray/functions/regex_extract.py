"""Regex field extraction kernel.

Behavioral parity with the reference ClassicExtractor
(/root/reference/src/pdf_parser/extractors/classic_extractor.py:38-120):

  - patterns compiled once with re.IGNORECASE (``:54-57``)
  - per field: patterns tried in order, FIRST match wins (``:112-116``)
  - value = match.group(1).strip() (``:116``)
  - empty/whitespace-only text → error "No text content to process" (``:79-80``)
  - unknown requested field → skipped (``:85-87``)
  - missing field → key absent (here: null in the fields struct)

The extractor is a plain class (compile-once state) designed to be held by
a map_batches actor pool; `extract_column` applies it across a batch.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..config import REGEX_FIELDS


class FieldExtractionError(ValueError):
    pass


class RegexFieldExtractor:
    """Compile-once, use-many regex field extractor (reference ST1)."""

    def __init__(self, config: dict | None = None) -> None:
        if config is None:
            config = REGEX_FIELDS
        try:
            self.cfg: dict[str, list[re.Pattern]] = {
                k: [re.compile(p, re.I) for p in v["patterns"]]
                for k, v in config.items()
            }
        except re.error as e:  # reference classic_extractor.py:58-59
            raise FieldExtractionError(f"Regex compilation error: {e}") from e
        self.field_names = list(self.cfg.keys())

    def extract(self, text: str, fields: list[str] | None = None) -> dict[str, str]:
        """Extract fields from one text; raises on empty text (reference :79-80)."""
        if not text or not text.strip():
            raise FieldExtractionError("No text content to process")
        out: dict[str, str] = {}
        for key in fields if fields else self.field_names:
            if key not in self.cfg:
                continue  # unknown field → skip (reference :85-87)
            value = self._extract_field_value(key, text)
            if value:
                out[key] = value
        return out

    def _extract_field_value(self, key: str, text: str) -> str | None:
        for pat in self.cfg[key]:
            try:
                m = pat.search(text)
                if m:
                    return m.group(1).strip()
            except Exception:
                continue  # per-pattern failure → try next (reference :117-119)
        return None

    def extract_or_none(self, text: str | None) -> dict[str, str | None]:
        """Batch-friendly variant: empty/None text → all-null fields, no raise."""
        result: dict[str, str | None] = {k: None for k in self.field_names}
        if not text or not text.strip():
            return result
        for key in self.field_names:
            result[key] = self._extract_field_value(key, text)
        return result

    def extract_column(self, texts: pa.Array | pa.ChunkedArray) -> pa.StructArray:
        """Apply extraction over a string column → one struct array of fields.

        Python `re` over batch values (not pc.extract_regex) because the
        reference contract requires re.I + first-match-across-pattern-list
        semantics (SURVEY.md §2.7).
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        cols: dict[str, list] = {k: [] for k in self.field_names}
        for v in texts:
            d = self.extract_or_none(v.as_py())
            for k in self.field_names:
                cols[k].append(d[k])
        return pa.StructArray.from_arrays(
            [pa.array(cols[k], type=pa.string()) for k in self.field_names],
            names=self.field_names,
        )
