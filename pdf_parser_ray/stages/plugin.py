"""User-extension surface: the reference's extractor Strategy pattern (E1).

The reference lets users subclass DataExtractor and implement
``extract(text, fields) -> Dict[str, str]``
(/root/reference/src/pdf_parser/extractors/data_extractor.py:15-40, factory
src/app.py:239-254). We keep the EXACT scalar contract and wrap it in a batch
adapter so reference-style plugins run unchanged inside map_batches.
"""

from __future__ import annotations

import json
from typing import Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class DataExtractor(Protocol):
    """The reference plugin contract: one text in, field dict out."""

    def extract(self, text: str, fields: list[str] | None = None) -> dict[str, str]:
        ...


def encode_fields_json(fields: dict) -> str:
    """M9 parity: persisted form is json.dumps(..., ensure_ascii=False)
    (extraction_repository.py:63; byte-equality asserted by reference
    tests/test_database.py:136-169)."""
    return json.dumps(fields, ensure_ascii=False)


class PluginExtract:
    """Actor-pool batch adapter around any DataExtractor plugin.

    Emits ``fields_json`` (the reference's persisted JSON form) and
    ``extract_error`` per row; a raising plugin never kills the batch
    (batch_processor.py:84-88 error-capture parity).
    """

    def __init__(self, extractor: DataExtractor, fields: list[str] | None = None,
                 text_col: str = "text"):
        self.extractor = extractor
        self.fields = fields
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_json, out_err = [], []
        for v in batch.column(self.text_col).to_pylist():
            try:
                fields = self.extractor.extract(v or "", self.fields)
                out_json.append(encode_fields_json(fields))
                out_err.append(None)
            except Exception as e:
                out_json.append(None)
                out_err.append(str(e))
        batch = batch.append_column("fields_json", pa.array(out_json, type=pa.string()))
        batch = batch.append_column("extract_error", pa.array(out_err, type=pa.string()))
        return batch
