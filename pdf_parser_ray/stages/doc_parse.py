"""DocParse: the flagship interleaved-document extraction stage.

An actor-pool ``map_batches`` class (reference ST4 — SURVEY.md §2.3): holds
warm parser state (compiled field regexes; the PDF/HTML kernels' caches) in
``__init__``; ``__call__`` processes one Arrow batch of interleaved docs.

Per-document semantics (FIXTURES.md §1):
  - ``text`` spans pass through untouched
  - ``html`` spans → main-content text spans + positioned image spans
  - ``pdf`` spans → validate (size/magic, reference validators.py:24-39
    semantics) → from-scratch layout parse → one text span per page;
    per-page failures land in ``page_errors`` (text_extractor.py:49-56
    parity), hard failures set the row ``error`` (batch_processor.py:84-88)
  - ``image``/``media`` spans pass through verbatim, order preserved
  - output ``offset`` reassigned 0..n-1 in final document order
  - ``file_hash`` = sha256 of concatenated input payload bytes
    (text/html: utf-8 text; pdf: decoded bytes; media: the media_ref);
    ``file_hash6`` keeps the reference's 6-char prefix (pdf_processor.py:65)
  - ``fields`` = regex extraction (classic_extractor.py semantics) over the
    document's full extracted text joined with "\\n"

One output row per input row, always — a poisoned document NEVER kills the
task (error captured per row).
"""

from __future__ import annotations

import base64
import binascii
import functools
import hashlib

import pyarrow as pa

from ..functions.regex_extract import RegexFieldExtractor
from ..functions.validators import validate_payload
from ..pdf import PdfError, extract_page_texts
from ..html import extract_main_content
from ..schema import FIELDS_STRUCT, OUTPUT_SCHEMA, SPAN_STRUCT
from ..state import metrics
from ..state.metrics import observe


class DocParse:
    def __init__(self, field_config: dict | None = None,
                 passthrough_cols: list[str] | None = None):
        self.extractor = RegexFieldExtractor(field_config)
        self.passthrough_cols = passthrough_cols or []

    # -- per-document kernel --------------------------------------------
    @observe("doc_parse.process_doc")
    def _process_doc(self, spans: list[dict]) -> dict:
        out_spans: list[dict] = []
        page_errors: list[str] = []
        hasher = hashlib.sha256()
        error: str | None = None

        for span in sorted(spans, key=lambda s: s["offset"]):
            kind = span["kind"]
            text = span["text"] or ""
            media_ref = span["media_ref"] or ""
            if kind == "text":
                hasher.update(text.encode("utf-8"))
                out_spans.append({"kind": "text", "text": text, "media_ref": ""})
            elif kind == "html":
                hasher.update(text.encode("utf-8"))
                for hs in extract_main_content(text):
                    out_spans.append(
                        {"kind": hs.kind, "text": hs.text, "media_ref": hs.media_ref}
                    )
            elif kind == "pdf":
                try:
                    payload = base64.b64decode(text.encode("ascii"), validate=False)
                except (binascii.Error, ValueError) as e:
                    error = f"Invalid base64 PDF payload: {e}"
                    break
                hasher.update(payload)
                verr = validate_payload(payload)
                if verr is not None:
                    error = verr
                    break
                try:
                    pages, perrs = extract_page_texts(payload)
                except PdfError as e:
                    error = str(e)
                    break
                page_errors.extend(perrs)
                for page in pages:
                    out_spans.append({"kind": "text", "text": page, "media_ref": ""})
            elif kind in ("image", "media"):
                hasher.update(media_ref.encode("utf-8"))
                out_spans.append({"kind": kind, "text": "", "media_ref": media_ref})
            else:
                error = f"Unknown span kind: {kind}"
                break

        if error is not None:
            out_spans = []
        for i, s in enumerate(out_spans):
            s["offset"] = i
        full_text = "\n".join(s["text"] for s in out_spans if s["kind"] == "text")
        fields = self.extractor.extract_or_none(full_text)
        digest = hasher.hexdigest()
        return {
            "spans": out_spans,
            "file_hash": digest,
            "file_hash6": digest[:6],
            "fields": fields,
            "error": error,
            "page_errors": page_errors,
            "n_spans": len(out_spans),
            "n_bytes": sum(len(s["text"]) for s in out_spans),
        }

    # -- batch adapter ---------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        rows = [self._process_doc(spans or []) for spans in spans_col]
        out = pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_STRUCT)),
                pa.array([r["file_hash"] for r in rows], type=pa.string()),
                pa.array([r["file_hash6"] for r in rows], type=pa.string()),
                pa.array([r["fields"] for r in rows], type=FIELDS_STRUCT),
                pa.array([r["error"] for r in rows], type=pa.string()),
                pa.array([r["page_errors"] for r in rows], type=pa.list_(pa.string())),
                pa.array([r["n_spans"] for r in rows], type=pa.int32()),
                pa.array([r["n_bytes"] for r in rows], type=pa.int64()),
                pa.array(["classic"] * len(rows), type=pa.string()),
            ],
            schema=OUTPUT_SCHEMA,
        )
        for col in self.passthrough_cols:
            out = out.append_column(col, batch.column(col))
        metrics.maybe_flush(every=1)  # actor-pool path reports op metrics too
        return out


@functools.lru_cache(maxsize=4)
def _warm_parser(passthrough: tuple = ()) -> DocParse:
    """Per-worker-process cached parser for task-mode execution."""
    return DocParse(passthrough_cols=list(passthrough))


def doc_parse_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of DocParse for ``map_batches(fn)``.

    Ray tasks reuse warm worker processes, so the module-level cache gives
    the same compile-once amortization as the actor pool without per-dataset
    actor spawn latency. Use the DocParse class (actor pool) when parser
    state grows heavy (model weights, big font caches); use this for the
    lightweight default.
    """
    out = _warm_parser()(batch)
    metrics.maybe_flush(every=1)  # ship per-op latencies to the aggregator, if any
    return out


def doc_parse_batch_partitioned(batch: pa.Table) -> pa.Table:
    """Task-mode DocParse preserving the ``partition_id`` column
    (checkpointed-run variant of doc_parse_batch)."""
    out = _warm_parser(("partition_id",))(batch)
    metrics.maybe_flush(every=1)
    return out
