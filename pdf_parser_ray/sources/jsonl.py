"""JSONL source/sink — the lingua franca interchange format of
training-data pipelines (one JSON object per line, optionally gzipped).

Reading builds on ``ray.data.read_json`` (Arrow's streaming JSON reader;
a ``.gz`` suffix decompresses transparently), so ingestion scales the
same way every other source here does: one file is the read-parallelism
unit and rows stream through ``map_batches`` with backpressure.
``read_jsonl`` only NORMALIZES: project/rename the id and text fields to
the house corpus names and synthesize a deterministic id when the data
has none (sha256 of the text — content-addressed, so re-ingestion is
idempotent and exact dedup downstream collapses true duplicates).

Reference parity: the reference app ingests local PDF files only
(src/app.py upload path); JSONL exists here because corpus interchange
at 100 TB is JSONL/parquet, not file uploads.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def make_doc_normalizer(*, id_field: str | None = "doc_id",
                        text_field: str = "text", keep_fields: tuple = (),
                        what: str = "JSONL"):
    """Shared batch kernel normalizing any tabular interchange source to
    the house (doc_id, text, *keep_fields) corpus shape: project/rename,
    cast ids to string, synthesize ``doc_id = sha256(text)[:32]`` when
    the data has none (content-addressed — re-ingestion idempotent,
    exact dedup collapses true duplicates). Used by the JSONL and CSV
    readers so the two interchange paths can never drift."""

    def normalize(batch: pa.Table) -> pa.Table:
        names = set(batch.column_names)
        if text_field not in names:
            raise ValueError(
                f"{what} rows have no {text_field!r} field "
                f"(columns: {sorted(names)})")
        text = pc.cast(batch.column(text_field), pa.string())
        if id_field is not None and id_field in names:
            doc_id = pc.cast(batch.column(id_field), pa.string())
        else:
            doc_id = pa.array(
                [hashlib.sha256((t or "").encode()).hexdigest()[:32]
                 for t in text.to_pylist()], type=pa.string())
        cols = {"doc_id": doc_id, "text": text}
        for f in keep_fields:
            if f not in names:
                raise ValueError(f"{what} rows have no {f!r} field")
            cols[f] = batch.column(f)
        return pa.table(cols)

    return normalize


def read_jsonl(paths, *, id_field: str | None = "doc_id",
               text_field: str = "text", keep_fields: tuple = (),
               **ray_kwargs):
    """Dataset of (doc_id, text, *keep_fields) rows from JSONL file(s).

    ``id_field=None`` (or a field missing from the data) synthesizes
    ``doc_id = sha256(text)[:32]`` — content-addressed and deterministic.
    Unlisted fields are dropped at the earliest stage (column pruning —
    JSONL rows often carry heavy metadata the pipeline never reads)."""
    import ray.data

    ds = ray.data.read_json(paths, **ray_kwargs)
    normalize = make_doc_normalizer(id_field=id_field, text_field=text_field,
                                    keep_fields=keep_fields, what="JSONL")
    return ds.map_batches(normalize, batch_format="pyarrow")


def read_csv_docs(paths, *, id_field: str | None = "doc_id",
                  text_field: str = "text", keep_fields: tuple = (),
                  **ray_kwargs):
    """Dataset of (doc_id, text, *keep_fields) rows from RFC-4180 CSV
    file(s) — the other ubiquitous interchange format. Same normalize
    contract as ``read_jsonl`` (shared kernel).

    Built on ``ray.data.read_csv`` (Arrow's streaming CSV reader — one
    file is the read-parallelism unit). ``newlines_in_values`` is ON by
    default: corpus text routinely embeds newlines, and quoted multiline
    fields are valid RFC 4180 that Arrow otherwise rejects. Empty quoted
    strings stay empty strings (Arrow's ``strings_can_be_null`` default),
    so text round-trips byte-exact."""
    import ray.data
    from pyarrow import csv as pa_csv

    parse = ray_kwargs.pop(
        "parse_options", pa_csv.ParseOptions(newlines_in_values=True))
    ds = ray.data.read_csv(paths, parse_options=parse, **ray_kwargs)
    normalize = make_doc_normalizer(id_field=id_field, text_field=text_field,
                                    keep_fields=keep_fields, what="CSV")
    return ds.map_batches(normalize, batch_format="pyarrow")


def jsonl_to_corpus(paths, out_dir: str, *, row_group_size: int = 32,
                    **read_kwargs) -> None:
    """Materialize JSONL input as the interleaved-corpus parquet layout
    (one ``text`` span per document), the same two-step contract as
    ``warc_to_corpus``: JSONL carries no row-group statistics, so the
    checkpointed extraction plans over the parquet this writes.

    Written with SMALL row groups (32, matching the corpus writer's
    granularity): row groups are the byte-budget planner's indivisible
    unit, so parquet-default million-row groups would collapse fragment
    planning (and skew isolation) into giant all-or-nothing partitions."""
    from ..schema import SPAN_STRUCT

    ds = read_jsonl(paths, **read_kwargs)

    def to_spans(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        spans = [[{"kind": "text", "text": t or "", "media_ref": "",
                   "offset": 0}] for t in texts]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "spans": pa.array(spans,
                                           type=pa.list_(SPAN_STRUCT))})

    ds.map_batches(to_spans, batch_format="pyarrow").write_parquet(
        out_dir, row_group_size=row_group_size)


def write_jsonl(ds, out_dir: str, **ray_kwargs) -> None:
    """Sink: one JSON object per row, one file per block — resumable at
    file granularity like every sink here (``ray.data.Dataset.write_json``
    commits files independently)."""
    ds.write_json(out_dir, **ray_kwargs)
