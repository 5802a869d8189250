"""ClassicExtract: regex field extraction over a plain text column.

Actor-pool stage holding compiled patterns (reference ST1 —
classic_extractor.py:38-59 compile-once semantics); emits one struct column
``fields`` plus flattened per-field columns for SQL-friendly output.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.regex_extract import RegexFieldExtractor


class ClassicExtract:
    def __init__(self, field_config: dict | None = None, text_col: str = "text",
                 flatten: bool = True):
        self.extractor = RegexFieldExtractor(field_config)
        self.text_col = text_col
        self.flatten = flatten

    def __call__(self, batch: pa.Table) -> pa.Table:
        struct = self.extractor.extract_column(batch.column(self.text_col))
        if self.flatten:
            for i, name in enumerate(self.extractor.field_names):
                batch = batch.append_column(name, struct.field(i))
            return batch
        return batch.append_column("fields", struct)
