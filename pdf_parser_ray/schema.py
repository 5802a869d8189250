"""Arrow schemas for the interleaved-document corpus (BASELINE.json:input_hint).

Input:  (doc_id: string, spans: list<struct<kind, text, media_ref: string, offset: int32>>)
Output: same span struct (kinds text/image/media only) + file_hash, fields, error,
        page_errors columns (FIXTURES.md §1).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

FIELDS_STRUCT = pa.struct(
    [
        ("customer_name", pa.string()),
        ("policy_number", pa.string()),
        ("claim_amount", pa.string()),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("file_hash", pa.string()),   # full sha256 hex of concatenated payload bytes
        ("file_hash6", pa.string()),  # reference 6-char prefix (pdf_processor.py:65 parity)
        ("fields", FIELDS_STRUCT),
        ("error", pa.string()),            # null on success (batch_processor.py:84-88 parity)
        ("page_errors", pa.list_(pa.string())),  # per-page skip records (text_extractor.py:49-56)
        ("n_spans", pa.int32()),
        ("n_bytes", pa.int64()),
        ("extraction_method", pa.string()),  # reference models.py:35 parity
    ]
)

# Input span kinds and their meaning (FIXTURES.md §1):
#   text  — already-extracted text, passes through
#   html  — raw HTML, main-content extraction
#   pdf   — base64 PDF bytes, layout parse
#   image/media — opaque payload addressed by media_ref, order-preserving pass-through
INPUT_KINDS = ("text", "html", "pdf", "image", "media")
OUTPUT_KINDS = ("text", "image", "media")
