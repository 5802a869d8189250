"""Deterministic shuffled training export — the consumption side of
``relational.shuffle_shards``.

Documents land in md5-shard directories (``shard=K``), split into
rank-RANGE bucket files named so that reading a shard's files in
lexicographic order, each file already internally sorted, replays ONE
stable global permutation — no ``random_shuffle`` all-to-all, stable
across reruns, and no kernel ever holds a whole shard: the work unit is
a (shard, rank-range) bucket (``order_buckets`` per shard), so memory
per task is corpus_bytes / (n_shards × order_buckets) regardless of
shard size.

Resume contract (same shape as the extraction checkpoint,
``pipelines/extraction.py``): each bucket file is written to a tmp path
and committed with an atomic rename; a rerun skips committed files
without recomputing their sort, and the returned manifest says which
were skipped.  Shards and buckets are md5-uniform, so there is no skew
to salt.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.hashing import md5_order_i60, md5_shard

_RANK_BITS = 60  # md5_order_i60 yields values in [0, 2^60)


def export_shuffled(sf_dir: str, out_dir: str, n_shards: int = 16,
                    order_buckets: int = 4,
                    columns: list[str] | None = None):
    """Write ``documents`` to ``out_dir/shard=K/part-{bucket}.parquet``,
    bucket = high bits of the shuffle rank (so file-name order == rank
    order), each file internally rank-sorted.  Returns the bucket
    manifest as a pandas DataFrame (shard, bucket, n_docs, skipped)."""
    if order_buckets < 1 or order_buckets & (order_buckets - 1):
        raise ValueError("order_buckets must be a power of two")
    columns = columns or ["doc_id", "text"]
    bucket_shift = _RANK_BITS - (order_buckets.bit_length() - 1)
    width = len(str(order_buckets - 1)) if order_buckets > 1 else 1
    os.makedirs(out_dir, exist_ok=True)
    # resume-plan guard (the extraction checkpoint's plan-mismatch abort,
    # sink-side): skipping committed FILES is only sound if the rerun
    # shards and buckets identically AND the input corpus is byte-for-
    # byte the plan that wrote them — a changed corpus would silently
    # mix stale committed bucket files with fresh ones
    import json

    from ..state.manifest import fragment_plan_fingerprint, fragment_stats

    src = f"{sf_dir}/documents.parquet"
    params = {"n_shards": n_shards, "order_buckets": order_buckets,
              "columns": list(columns),
              "corpus_fingerprint": fragment_plan_fingerprint(
                  fragment_stats(src))}
    params_path = os.path.join(out_dir, "_export_params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError(
                f"export plan mismatch: {out_dir} was written with {prev}, "
                f"rerun asks for {params}; use a fresh out_dir")
    else:
        with open(params_path, "w") as f:
            json.dump(params, f)
    ds = ray.data.read_parquet(src, columns=columns)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        rank = md5_order_i60(ids)
        shard = md5_shard(ids, n_shards)
        # ORDERED buckets from the rank's high bits: lexicographic file
        # order replays rank order with zero cross-file coordination
        bucket = rank >> bucket_shift
        batch = batch.append_column("shard", pa.array(shard))
        batch = batch.append_column("order_bucket", pa.array(bucket))
        batch = batch.append_column(
            "export_part", pa.array(shard * order_buckets + bucket))
        return batch.append_column("shuffle_rank", pa.array(rank))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        bucket = int(g["order_bucket"].iloc[0])
        shard_dir = os.path.join(out_dir, f"shard={shard}")
        os.makedirs(shard_dir, exist_ok=True)
        dst = os.path.join(shard_dir, f"part-{bucket:0{width}d}.parquet")
        row = {"shard": [shard], "bucket": [bucket], "n_docs": [len(g)]}
        if os.path.exists(dst):  # committed by a previous run — skip
            return pd.DataFrame({**row, "skipped": [True]})
        g = g.sort_values(["shuffle_rank", "doc_id"], kind="mergesort")
        tmp = dst + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(g[columns], preserve_index=False), tmp)
        os.replace(tmp, dst)  # atomic commit: file appears fully written
        return pd.DataFrame({**row, "skipped": [False]})

    manifest = (ds.map_batches(prep, batch_format="pyarrow")
                .groupby("export_part")
                .map_groups(write_bucket, batch_format="pandas")).to_pandas()
    if "shard" not in manifest.columns:  # empty input loses its schema
        return pd.DataFrame({"shard": pd.Series(dtype="int64"),
                             "bucket": pd.Series(dtype="int64"),
                             "n_docs": pd.Series(dtype="int64"),
                             "skipped": pd.Series(dtype="bool")})
    return manifest.sort_values(["shard", "bucket"], ignore_index=True)
