"""Document payload validation kernels.

Semantics mirror the reference's PDFValidator (validators.py:24-96): size
window [MIN_FILE_SIZE, MAX_FILE_SIZE], %PDF magic prefix, .pdf extension —
checked in that order, first failure wins. Here they are expressed as
*error-returning* (never raising) functions so that invalid rows are kept
with an ``error`` value instead of aborting a batch (reference batch
error-capture semantics, batch_processor.py:84-88).

Vectorized variants operate on pyarrow arrays for use in map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import MAX_FILE_SIZE, MIN_FILE_SIZE


def validate_payload(payload: bytes, filename: str = "") -> str | None:
    """Validate one document payload; return error string or None.

    Check order matches reference validate_pdf_file (validators.py:36-39):
    size → magic → extension. The extension check only applies when a
    filename is supplied (corpus rows usually have none).
    """
    if len(payload) > MAX_FILE_SIZE:
        return f"File {filename} is too large. Maximum size: {MAX_FILE_SIZE // (1024 * 1024)}MB"
    if len(payload) < MIN_FILE_SIZE:
        return f"File {filename} is too small or corrupted"
    if not payload.startswith(b"%PDF"):
        return f"File {filename} is not a valid PDF file"
    if filename and not filename.lower().endswith(".pdf"):
        return f"Invalid file extension. Expected .pdf, got: {_suffix(filename)}"
    return None


def _suffix(filename: str) -> str:
    base = filename.rsplit("/", 1)[-1]
    j = base.rfind(".")
    return base[j:] if j > 0 else ""


def validate_sizes_arrow(byte_lengths: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized size-window check → error-code array.

    Returns a string array: null = ok, 'too_large' / 'too_small'.
    Used by the batch validation stage over binary/string payload columns.
    """
    lengths = pc.cast(byte_lengths, pa.int64())
    # null lengths (null payloads) count as too_small — fill_null before the
    # comparisons so the boolean masks are null-free (numpy mask indexing
    # chokes on None otherwise)
    lengths = pc.fill_null(lengths, 0)
    too_large = pc.greater(lengths, MAX_FILE_SIZE)
    too_small = pc.less(lengths, MIN_FILE_SIZE)
    n = len(lengths)
    out = np.full(n, None, dtype=object)
    out[too_small.to_numpy(zero_copy_only=False)] = "too_small"
    out[too_large.to_numpy(zero_copy_only=False)] = "too_large"
    return pa.array(out, type=pa.string())


def has_pdf_magic_arrow(payloads: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized %PDF magic-prefix check over a binary/string column."""
    return pc.starts_with(pc.cast(payloads, pa.string()), "%PDF")
