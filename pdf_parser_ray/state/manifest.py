"""Checkpoint manifest: per-partition lineage + metrics + exact resume.

Design (SURVEY.md §4.2 row 4 / north rule):
  - the corpus is planned into partitions by BYTE BUDGET over contiguous
    FRAGMENT (parquet row-group / Lance fragment) ranges, using only
    footer/fragment METADATA — the driver never enumerates documents, so
    the planning structure is O(n_fragments), not O(n_docs) (at 10^12
    docs with ~10^7 fragments that is MBs, not TBs, of driver state);
  - one oversized fragment → its own partition (skew isolation: the
    corpus writer keeps row groups small — 32 docs — so a multi-GB PDF
    dominates its own row group and lands alone);
  - each partition's output is written to a temp dir and atomically
    ``os.replace``d into place; the manifest line (JSONL, one per
    partition: fragment-range lineage + metrics + parser_version) is
    appended LAST — the rename+append is the commit point;
  - resume = skip partitions whose ids appear in the manifest with
    status committed; a killed run re-processes only uncommitted ones,
    and the output is byte-identical to an uninterrupted run (tests).

``plan_partitions``/``assign_partition`` (doc-id-range planning) remain as
the logical-level planner for callers that already hold per-doc sizes;
the extraction run path uses the fragment planner exclusively.
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


# ---------------------------------------------------------------------------
# Fragment-metadata planning (the extraction run path)
# ---------------------------------------------------------------------------

def _natural_key(name: str) -> tuple:
    """Numeric-aware sort key: digit runs compare as ints, so unpadded
    part names (part-2 < part-10) keep doc-contiguity of planned
    partitions."""
    import re

    return tuple(int(t) if t.isdigit() else t
                 for t in re.split(r"(\d+)", name))


@dataclass(frozen=True)
class Fragment:
    """One planning unit: a parquet row group (or a Lance fragment).

    ``path`` is relative to the corpus root so plans are location-portable;
    ``index`` is the row-group index within the file."""
    path: str
    index: int
    n_rows: int
    n_bytes: int  # uncompressed total_byte_size from the footer


@dataclass(frozen=True)
class FragPartition:
    """A contiguous run of fragments. ``ranges`` is a compact tuple of
    (path, rg_lo, rg_hi) half-open row-group ranges — the durable lineage
    record (manifest) and the read instruction for the partition job."""
    partition_id: int
    ranges: tuple[tuple[str, int, int], ...]
    n_rows: int
    n_bytes: int


def fragment_stats(corpus_path: str) -> list[Fragment]:
    """Per-row-group (path, index, n_rows, n_bytes) from parquet FOOTERS only
    — no data pages are read, no document is enumerated.

    Files are visited in NATURAL-sorted name order (digit runs compare
    numerically, so ``part-2`` precedes ``part-10`` even unpadded) — the
    corpus writer emits doc-id-ordered part files, so fragment order ==
    doc order holds for both padded and unpadded numbering. For a Lance corpus
    the equivalent is ``dataset.get_fragments()`` → per-fragment
    ``count_rows()`` + physical size; same Fragment shape either way.
    At >10^4 files fan the footer reads out as Ray tasks (footers are
    O(KB) each; the driver only holds the resulting stats list).
    """
    import pyarrow.parquet as pq

    if os.path.isdir(corpus_path):
        names = sorted((f for f in os.listdir(corpus_path)
                        if f.endswith(".parquet")), key=_natural_key)
    else:
        corpus_path, names = os.path.dirname(corpus_path) or ".", \
            [os.path.basename(corpus_path)]

    def file_stats(name: str) -> list[Fragment]:
        md = pq.ParquetFile(os.path.join(corpus_path, name)).metadata
        return [Fragment(name, i, md.row_group(i).num_rows,
                         md.row_group(i).total_byte_size)
                for i in range(md.num_row_groups)]

    if len(names) >= 10_000:  # distributed metadata pass
        import ray

        @ray.remote(num_cpus=0.25)
        def _remote_stats(root: str, chunk: list[str]) -> list[Fragment]:
            out: list[Fragment] = []
            for n in chunk:
                md = pq.ParquetFile(os.path.join(root, n)).metadata
                out.extend(Fragment(n, i, md.row_group(i).num_rows,
                                    md.row_group(i).total_byte_size)
                           for i in range(md.num_row_groups))
            return out

        chunks = [names[i:i + 256] for i in range(0, len(names), 256)]
        results = ray.get([_remote_stats.remote(corpus_path, c) for c in chunks])
        return [f for sub in results for f in sub]
    return [f for n in names for f in file_stats(n)]


def plan_fragment_partitions(frags: list[Fragment],
                             byte_budget: int) -> list[FragPartition]:
    """Greedy contiguous packing of fragments into ≤ byte_budget partitions.

    An oversized single fragment becomes its own partition (skew isolation
    at row-group granularity). Consecutive row groups of one file collapse
    into a single (path, lo, hi) range."""
    parts: list[FragPartition] = []
    cur: list[Fragment] = []
    acc_bytes = acc_rows = 0

    def close():
        nonlocal cur, acc_bytes, acc_rows
        if not cur:
            return
        ranges: list[tuple[str, int, int]] = []
        for f in cur:
            if ranges and ranges[-1][0] == f.path and ranges[-1][2] == f.index:
                ranges[-1] = (f.path, ranges[-1][1], f.index + 1)
            else:
                ranges.append((f.path, f.index, f.index + 1))
        parts.append(FragPartition(len(parts), tuple(ranges),
                                   acc_rows, acc_bytes))
        cur, acc_bytes, acc_rows = [], 0, 0

    for f in frags:
        if cur and acc_bytes + f.n_bytes > byte_budget:
            close()
        cur.append(f)
        acc_bytes += f.n_bytes
        acc_rows += f.n_rows
    close()
    return parts


def fragment_plan_fingerprint(frags: list[Fragment]) -> str:
    """Digest of the fragment METADATA (path, index, rows, bytes) — O(n_frags).
    A resume whose corpus stats hash differently must abort (same contract
    as the legacy per-doc fingerprint, without enumerating docs)."""
    import hashlib

    h = hashlib.md5()
    for f in frags:
        h.update(f.path.encode())
        h.update(f.index.to_bytes(4, "little"))
        h.update(f.n_rows.to_bytes(8, "little"))
        h.update(f.n_bytes.to_bytes(8, "little", signed=True))
    return h.hexdigest()


def ranges_json(p: FragPartition) -> list[list]:
    return [[path, lo, hi] for path, lo, hi in p.ranges]


def validate_fragment_resume(records: list[dict], parts: list[FragPartition],
                             byte_budget: int, fingerprint: str) -> None:
    """Abort a resume whose fresh fragment plan disagrees with committed
    records (same contract as validate_resume_plan, fragment-range keyed)."""
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
        want = rec.get("fragments")
        if p is None or (want is not None and ranges_json(p) != want):
            raise RuntimeError(
                f"resume mismatch: committed partition {pid} covered fragment "
                f"ranges {want} but the fresh plan assigns "
                f"{'nothing' if p is None else ranges_json(p)}; use a fresh out_dir")


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
