"""Checkpoint manifest: per-partition lineage + metrics + exact resume.

Design (SURVEY.md §4.2 row 4 / north rule):
  - the corpus is planned into partitions by BYTE BUDGET over contiguous
    doc_id ranges (one oversized doc → its own partition, so a multi-GB PDF
    never rides with 10k HTML docs);
  - partition boundaries are a small sorted array of doc_id strings →
    membership is ``np.searchsorted`` inside map_batches (scales to 10^12
    docs: boundaries are one string per partition, broadcast once);
  - each partition's output is written to a temp dir and atomically
    ``os.replace``d into place; the manifest line (JSONL, one per
    partition: lineage + metrics + parser_version) is appended LAST —
    the rename+append is the commit point;
  - resume = skip partitions whose ids appear in the manifest with
    status committed; a killed run re-processes only uncommitted ones,
    and the output is byte-identical to an uninterrupted run (tests).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Partition:
    partition_id: int
    start_doc_id: str  # inclusive
    end_doc_id: str | None  # exclusive; None = +inf
    n_docs: int
    n_bytes: int


def plan_partitions(doc_ids: list[str], sizes: np.ndarray, byte_budget: int) -> list[Partition]:
    """Greedy contiguous packing of (sorted) docs into ≤ byte_budget partitions.

    ``doc_ids`` must be sorted ascending; an oversized single doc becomes its
    own partition (skew isolation).
    """
    assert len(doc_ids) == len(sizes)
    parts: list[Partition] = []
    start = 0
    acc = 0
    for i in range(len(doc_ids)):
        # split when the current partition is non-empty (i > start) and the
        # next doc would blow the budget — NOT `acc > 0`, which a zero-size
        # doc at partition start would defeat
        if i > start and acc + int(sizes[i]) > byte_budget:
            parts.append(Partition(len(parts), doc_ids[start],
                                   doc_ids[i], i - start, acc))
            start, acc = i, 0
        acc += int(sizes[i])
    if len(doc_ids) > start:
        parts.append(Partition(len(parts), doc_ids[start], None,
                               len(doc_ids) - start, acc))
    return parts


def plan_fingerprint(doc_ids: list[str], sizes: np.ndarray) -> str:
    """Deterministic digest of the planning inputs (sorted doc_ids + sizes).

    Stored in every manifest record; a resume whose replanned inputs hash
    differently (corpus changed under the same out_dir) must abort rather
    than silently commit overlapping/missing doc ranges.
    """
    import hashlib

    h = hashlib.md5()
    for d, s in zip(doc_ids, sizes):
        h.update(d.encode())
        h.update(int(s).to_bytes(8, "little", signed=True))
    return h.hexdigest()


def validate_resume_plan(records: list[dict], parts: list[Partition],
                         byte_budget: int, fingerprint: str) -> None:
    """Abort a resume whose fresh plan disagrees with committed records.

    Checks, per committed record: byte_budget and plan fingerprint (when the
    record carries them — older manifests may predate the fields), and that
    the record's (start_doc_id, end_doc_id) equal the same partition_id's
    range in the new plan. Any mismatch means 'resume' would assign
    different doc ranges to already-committed partition ids — the
    byte-identical-resume contract cannot hold, so fail loudly.
    """
    by_id = {p.partition_id: p for p in parts}
    for rec in records:
        if rec.get("status") != "committed":
            continue
        pid = int(rec["partition_id"])
        if rec.get("byte_budget") is not None and int(rec["byte_budget"]) != byte_budget:
            raise RuntimeError(
                f"resume mismatch: partition {pid} was committed with "
                f"byte_budget={rec['byte_budget']}, this run uses {byte_budget}; "
                "rerun with the original byte_budget or a fresh out_dir")
        if rec.get("plan_fingerprint") is not None and rec["plan_fingerprint"] != fingerprint:
            raise RuntimeError(
                f"resume mismatch: input corpus changed since partition {pid} "
                "was committed (plan fingerprint differs); use a fresh out_dir")
        p = by_id.get(pid)
        if p is None or p.start_doc_id != rec.get("start_doc_id") \
                or p.end_doc_id != rec.get("end_doc_id"):
            raise RuntimeError(
                f"resume mismatch: committed partition {pid} covered "
                f"[{rec.get('start_doc_id')}, {rec.get('end_doc_id')}) but the "
                f"fresh plan assigns "
                f"{'nothing' if p is None else f'[{p.start_doc_id}, {p.end_doc_id})'} "
                "to that id; use a fresh out_dir")


def partition_boundaries(parts: list[Partition]) -> list[str]:
    """Sorted start-doc_ids of partitions 1..n-1 — searchsorted keys."""
    return [p.start_doc_id for p in parts[1:]]


def assign_partition(doc_ids: np.ndarray, boundaries: list[str]) -> np.ndarray:
    """Vectorized partition-id assignment for a batch of doc_ids."""
    if not boundaries:
        return np.zeros(len(doc_ids), dtype=np.int64)
    return np.searchsorted(np.asarray(boundaries, dtype=object), doc_ids, side="right")


class Manifest:
    """JSONL manifest at ``<out_dir>/manifest.jsonl``; append-only commits."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(os.path.join(out_dir, "partitions"), exist_ok=True)

    def committed_ids(self) -> set[int]:
        if not os.path.exists(self.path):
            return set()
        out: set[int] = set()
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail line from a killed run → not committed
                if rec.get("status") == "committed":
                    out.add(int(rec["partition_id"]))
        return out

    def partition_dir(self, pid: int) -> str:
        return os.path.join(self.out_dir, "partitions", f"partition_id={pid}")

    def commit(self, record: dict) -> None:
        record = dict(record, status="committed")
        with open(self.path, "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        continue
        return out


def summarize_run(out_dir: str) -> dict:
    """Driver-side run summary from the manifest (reference B5 parity:
    _display_batch_results' per-file counts + error list, src/app.py:256-281,
    rebuilt from durable per-partition records instead of an in-memory list)."""
    m = Manifest(out_dir)
    recs = [r for r in m.records() if r.get("status") == "committed"]
    metrics = [r.get("metrics", {}) for r in recs]
    return {
        "partitions": len(recs),
        "docs": sum(x.get("docs", 0) for x in metrics),
        "spans": sum(x.get("spans", 0) for x in metrics),
        "bytes": sum(x.get("bytes", 0) for x in metrics),
        "errors": sum(x.get("errors", 0) for x in metrics),
        "parser_versions": sorted({r.get("parser_version", "?") for r in recs}),
    }
