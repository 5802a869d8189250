"""Flagship pipeline: interleaved corpus → ordered span extraction.

Two entry points:
  - ``extraction_dataset``: lazy Dataset pipeline (read → DocParse actor
    pool) for direct consumption (tests, queries(), bench);
  - ``run_extraction``: checkpointed run — byte-budget partition planning,
    per-partition atomic commits to the manifest, exact resume.

Replaces the reference's sequential per-file loop
(processors/batch_processor.py:46-91) with a streaming Dataset execution:
the Dataset IS the batch; per-row error capture replaces try/except-per-file.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow.dataset as pads
import pyarrow.compute as pc

from .. import __version__ as PARSER_VERSION
from ..config import DEFAULT_PARSE_BATCH_SIZE, PARTITION_BYTE_BUDGET
from ..sources.io import read_corpus, read_fragment_ranges
from ..stages.doc_parse import DocParse
from ..state.manifest import (Manifest, fragment_plan_fingerprint,
                              fragment_stats, plan_fragment_partitions,
                              ranges_json, validate_fragment_resume)


def extraction_dataset(corpus_path: str, *, parse_concurrency=4,
                       batch_size: int = DEFAULT_PARSE_BATCH_SIZE,
                       field_config: dict | None = None,
                       compute: str = "actors",
                       override_num_blocks: int | None = None):
    """Lazy read → DocParse pipeline over the corpus.

    compute="actors" (default): actor pool holding warm parser state —
    the right shape when state is heavy (models, font caches).
    compute="tasks": stateless tasks with a per-worker cached parser —
    same amortization via warm worker reuse, no actor-spawn latency;
    only valid with the default field_config.
    """
    kwargs = {"override_num_blocks": override_num_blocks} if override_num_blocks else {}
    ds = read_corpus(corpus_path, **kwargs)
    if compute == "tasks" and field_config is None:
        from ..stages.doc_parse import doc_parse_batch

        return ds.map_batches(doc_parse_batch, batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(
        DocParse,
        fn_constructor_kwargs={"field_config": field_config} if field_config else {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=parse_concurrency,
    )


def run_extraction(corpus_path: str, out_dir: str, *,
                   byte_budget: int = PARTITION_BYTE_BUDGET,
                   parse_concurrency=4,
                   batch_size: int = DEFAULT_PARSE_BATCH_SIZE,
                   commit_batch_size: int = 8,
                   compute: str = "actors") -> dict:
    """Checkpointed extraction run with exact resume.

    Partitions are planned by byte budget over contiguous FRAGMENT (parquet
    row-group) ranges using footer metadata only — the driver never holds a
    per-document structure (O(n_fragments) plan state, sound at 10^12 docs).
    Jobs process ``commit_batch_size`` uncommitted partitions at a time,
    reading ONLY those partitions' fragments (no full-corpus scan + filter),
    write hive-partitioned Parquet to a temp dir, then atomically move each
    partition dir into place and append its manifest record (commit point).
    Returns a summary dict.
    """
    from ..state import metrics as op_metrics

    # opt into cluster-wide per-op observability: workers flush their
    # @observe registries to this named actor; totals land in the summary.
    # (One aggregator per session: concurrent run_extraction calls in one
    # driver would share/kill each other's actor — run them sequentially.)
    agg = op_metrics.create_aggregator()
    try:
        return _run_extraction_inner(
            corpus_path, out_dir, agg, byte_budget=byte_budget,
            parse_concurrency=parse_concurrency, batch_size=batch_size,
            commit_batch_size=commit_batch_size, compute=compute)
    finally:
        op_metrics.destroy_aggregator()  # never leak partial totals


def _run_extraction_inner(corpus_path: str, out_dir: str, agg, *,
                          byte_budget: int, parse_concurrency,
                          batch_size: int, commit_batch_size: int,
                          compute: str) -> dict:
    manifest = Manifest(out_dir)
    frags = fragment_stats(corpus_path)
    parts = plan_fragment_partitions(frags, byte_budget)
    fingerprint = fragment_plan_fingerprint(frags)
    # a resume against a changed corpus / byte_budget would replan different
    # fragment ranges under committed partition ids — abort loudly instead
    validate_fragment_resume(manifest.records(), parts, byte_budget, fingerprint)
    committed = manifest.committed_ids()
    todo = [p for p in parts if p.partition_id not in committed]

    n_done = 0
    for chunk_start in range(0, len(todo), commit_batch_size):
        chunk = todo[chunk_start : chunk_start + commit_batch_size]
        t0 = time.time()
        tmp_dir = os.path.join(out_dir, f"_tmp_job_{chunk[0].partition_id}")
        shutil.rmtree(tmp_dir, ignore_errors=True)

        # read ONLY this chunk's fragments (one read task per fragment
        # range) — the rest of the corpus is never touched by this job
        ds = read_fragment_ranges(
            corpus_path,
            [(p.partition_id, path, lo, hi)
             for p in chunk for path, lo, hi in p.ranges])
        if compute == "tasks":
            from ..stages.doc_parse import doc_parse_batch_partitioned

            parsed = ds.map_batches(doc_parse_batch_partitioned,
                                    batch_format="pyarrow", batch_size=batch_size)
        else:
            parsed = ds.map_batches(
                DocParse,
                fn_constructor_kwargs={"passthrough_cols": ["partition_id"]},
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=parse_concurrency,
            )
        parsed.write_parquet(tmp_dir, partition_cols=["partition_id"])

        elapsed = time.time() - t0
        for p in chunk:
            src = os.path.join(tmp_dir, f"partition_id={p.partition_id}")
            dst = manifest.partition_dir(p.partition_id)
            if not os.path.exists(src):
                os.makedirs(src, exist_ok=True)  # empty partition still commits
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(src, dst)
            metrics = _partition_metrics(dst)
            manifest.commit({
                "partition_id": p.partition_id,
                "input_path": corpus_path,
                "fragments": ranges_json(p),
                "n_docs_planned": p.n_rows,
                "n_input_bytes_planned": p.n_bytes,
                "byte_budget": byte_budget,
                "plan_fingerprint": fingerprint,
                "parser_version": PARSER_VERSION,
                "metrics": dict(metrics, job_elapsed_sec=round(elapsed, 3)),
            })
            n_done += 1
        shutil.rmtree(tmp_dir, ignore_errors=True)

    import ray as _ray

    op_totals = _ray.get(agg.get_totals.remote())
    return {"partitions_total": len(parts), "partitions_committed_now": n_done,
            "partitions_skipped": len(committed), "out_dir": out_dir,
            "op_metrics": op_totals}


def _partition_metrics(part_dir: str) -> dict:
    files = [os.path.join(part_dir, f) for f in os.listdir(part_dir)
             if f.endswith(".parquet")]
    if not files:
        return {"docs": 0, "spans": 0, "bytes": 0, "errors": 0}
    t = pads.dataset(files).to_table(columns=["error", "n_spans", "n_bytes"])
    return {
        "docs": t.num_rows,
        "spans": int(pc.sum(t.column("n_spans")).as_py() or 0),
        "bytes": int(pc.sum(t.column("n_bytes")).as_py() or 0),
        "errors": int(pc.count(t.column("error"), mode="only_valid").as_py() or 0),
    }


def canonical_dump(ds, out_path: str | None = None):
    """Deterministic canonical output: rows sorted by doc_id (SURVEY.md §2.6
    sort row — cross-row order is otherwise irrelevant because span order
    lives inside rows). A global sort is a shuffle; only use for dumps."""
    ordered = ds.sort("doc_id")
    if out_path is not None:
        ordered.write_parquet(out_path)
    return ordered
