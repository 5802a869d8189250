"""Deterministic shuffled training export — the consumption side of
``relational.shuffle_shards``.

Documents land in md5-shard directories (``shard=K``), each file
internally ordered by the intra-shard shuffle rank, so a training job
reading shard directories in order replays ONE stable global
permutation — no ``random_shuffle`` all-to-all, stable across reruns.

Resume contract (same shape as the extraction checkpoint,
``pipelines/extraction.py``): a shard directory is written to a tmp path
and committed with an atomic rename; a rerun skips committed shards
without recomputing them, and the returned manifest says which were
skipped.  Scale note: one shard is sorted in one kernel — pick
``n_shards`` so a shard fits a worker (corpus_bytes / shard_budget);
shards are md5-uniform so there is no skew to salt.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.hashing import md5_order_i60, md5_shard


def export_shuffled(sf_dir: str, out_dir: str, n_shards: int = 16,
                    columns: list[str] | None = None):
    """Write ``documents`` to ``out_dir/shard=K/part-0.parquet``, each
    file ordered by the deterministic shuffle rank.  Returns the shard
    manifest as a pandas DataFrame (shard, n_docs, skipped)."""
    columns = columns or ["doc_id", "text"]
    os.makedirs(out_dir, exist_ok=True)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=columns)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        batch = batch.append_column("shard",
                                    pa.array(md5_shard(ids, n_shards)))
        return batch.append_column("shuffle_rank",
                                   pa.array(md5_order_i60(ids)))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        dst = os.path.join(out_dir, f"shard={shard}")
        if os.path.exists(dst):  # committed by a previous run — skip
            return pd.DataFrame({"shard": [shard], "n_docs": [len(g)],
                                 "skipped": [True]})
        g = g.sort_values(["shuffle_rank", "doc_id"], kind="mergesort")
        tmp = dst + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(
            pa.Table.from_pandas(g[columns], preserve_index=False),
            os.path.join(tmp, "part-0.parquet"))
        os.replace(tmp, dst)  # atomic commit: dir appears fully written
        return pd.DataFrame({"shard": [shard], "n_docs": [len(g)],
                             "skipped": [False]})

    manifest = (ds.map_batches(prep, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(write_shard, batch_format="pandas")).to_pandas()
    return manifest.sort_values("shard", ignore_index=True)
