"""Read/write indirection for the interleaved corpus.

The target design reads Lance (`ray.data.read_lance`); `pylance` is not
installed in this sandbox, so the format resolves to Parquet at import time
behind one indirection (SURVEY.md §1.3 row 2 — same Arrow schema either way,
no other code path differs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - environment-dependent
    import lance  # type: ignore  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

CORPUS_FORMAT = "lance" if HAVE_LANCE else "parquet"


def read_corpus(path: str, *, columns: list[str] | None = None, **ray_kwargs):
    """ray.data.Dataset over the corpus at ``path`` (directory or file)."""
    import ray.data

    if CORPUS_FORMAT == "lance":
        return ray.data.read_lance(path, columns=columns, **ray_kwargs)
    return ray.data.read_parquet(path, columns=columns, **ray_kwargs)


def read_fragment_ranges(corpus_root: str,
                         ranges: list[tuple[int, str, int, int]],
                         *, columns: list[str] | None = None):
    """Dataset over specific fragment ranges: one read task per
    (partition_id, file, rg_lo, rg_hi) descriptor, emitting the rows with a
    ``partition_id`` column attached.

    This is the checkpointed-run read path: a job touches ONLY its
    partitions' row groups (footer-planned), never the whole corpus. For a
    Lance corpus the equivalent is per-fragment ``ray.data.read_lance``
    with fragment ids; parquet implementation below.
    """
    import os

    import ray.data

    if not os.path.isdir(corpus_root):  # single-file corpus
        corpus_root = os.path.dirname(corpus_root) or "."
    items = [{"pid": pid, "path": path, "lo": lo, "hi": hi}
             for pid, path, lo, hi in ranges]

    def read_one(batch):
        import os

        tables = []
        for pid, path, lo, hi in zip(batch["pid"], batch["path"],
                                     batch["lo"], batch["hi"]):
            pf = pq.ParquetFile(os.path.join(corpus_root, path))
            t = pf.read_row_groups(list(range(int(lo), int(hi))),
                                   columns=columns)
            tables.append(t.append_column(
                "partition_id",
                pa.array([int(pid)] * t.num_rows, type=pa.int64())))
        return pa.concat_tables(tables)

    return ray.data.from_items(
        items, override_num_blocks=len(items)).map_batches(
        read_one, batch_format="numpy", batch_size=1)


def write_corpus_table(table: pa.Table, path: str, *,
                       row_group_size: int = 32,
                       isolate_bytes: int = 4 * 1024 * 1024) -> None:
    """Driver-side write of a (small, synthesized) corpus table.

    Small row groups: row groups are the block/slice granularity
    downstream AND the fragment-planning granularity (state/manifest.py).
    A row whose payload exceeds ``isolate_bytes`` is written as its OWN
    row group — otherwise a 50 MB doc shares a 32-row group with 31
    small docs, the byte-budget planner (which cannot split below a row
    group) is forced to drag the co-riders into the straggler partition,
    and every sliced block containing a neighbor carries the giant
    buffer. With isolation, skew shows up in footer metadata alone and
    the planner quarantines exactly the heavy doc."""
    if CORPUS_FORMAT == "lance":  # pragma: no cover
        import lance

        lance.write_dataset(table, path, mode="overwrite")
        return
    sizes = [sum(len(s["text"] or "") for s in spans or [])
             for spans in table.column("spans").to_pylist()]
    big = [i for i, b in enumerate(sizes) if b > isolate_bytes]
    if not big:
        pq.write_table(table, path, row_group_size=row_group_size)
        return
    writer = pq.ParquetWriter(path, table.schema)
    try:
        start = 0
        for i in big:
            if i > start:
                writer.write_table(table.slice(start, i - start),
                                   row_group_size=row_group_size)
            writer.write_table(table.slice(i, 1), row_group_size=1)
            start = i + 1
        if start < table.num_rows:
            writer.write_table(table.slice(start, table.num_rows - start),
                               row_group_size=row_group_size)
    finally:
        writer.close()


def write_output(ds, path: str, *, partition_cols: list[str] | None = None) -> None:
    """Dataset sink: partitioned Parquet directory (resumable layout)."""
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    ds.write_parquet(path, **kwargs)
