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


def write_corpus_table(table: pa.Table, path: str) -> None:
    """Driver-side write of a (small, synthesized) corpus table."""
    if CORPUS_FORMAT == "lance":  # pragma: no cover
        import lance

        lance.write_dataset(table, path, mode="overwrite")
    else:
        # Small row groups: row groups are the block/slice granularity
        # downstream — a multi-MB payload row must not share a row group
        # with (and thus ride inside every sliced block of) small docs.
        pq.write_table(table, path, row_group_size=32)


def write_output(ds, path: str, *, partition_cols: list[str] | None = None) -> None:
    """Dataset sink: partitioned Parquet directory (resumable layout)."""
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    ds.write_parquet(path, **kwargs)
