"""WebDataset-style tar-shard source.

The dominant multimodal training-data layout (public convention:
github.com/webdataset/webdataset): a corpus is a set of POSIX tar files
("shards"); all members sharing a basename stem form one SAMPLE, the
member extension names the field ("0001.txt" + "0001.json" + "0001.png"
→ one sample with text, metadata, and image fields). Sequential tar
reads amortize seeks on object storage, and ONE SHARD = ONE READ UNIT is
the scale contract: a 10^12-sample corpus is ~10^6 shards of ~1 GB, each
decoded independently inside ``map_batches`` with streaming backpressure
— no per-member round trips, no shard ever held beyond its block.

Built on ``ray.data.read_binary_files`` (one row per shard: path +
bytes) + a stdlib ``tarfile`` decode kernel. Reference parity: the
reference ingests individual uploaded files only (src/app.py); tar
shards are the corpus-scale equivalent of its multi-file batch path.
"""

from __future__ import annotations

import io
import json
import tarfile

import pyarrow as pa


def _decode_shard(data: bytes, path: str, *, text_exts: tuple,
                  meta_ext: str | None, binary_exts: tuple):
    """Yield one sample dict per basename stem, fields keyed by extension
    class. Members stream in archive order; samples are emitted in first
    appearance order of their stem (the WebDataset contract keeps a
    sample's members adjacent, but adjacency is NOT required here)."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for member in tf:
            if not member.isfile():
                continue
            name = member.name.rsplit("/", 1)[-1]
            if "." not in name:
                continue
            stem, ext = name.rsplit(".", 1)
            ext = ext.lower()
            fobj = tf.extractfile(member)
            if fobj is None:
                continue
            raw = fobj.read()
            if stem not in samples:
                samples[stem] = {"doc_id": stem, "shard": path}
                order.append(stem)
            rec = samples[stem]
            if ext in text_exts:
                rec["text"] = raw.decode("utf-8", errors="replace")
            elif meta_ext is not None and ext == meta_ext:
                rec["meta"] = json.loads(raw.decode("utf-8"))
            elif ext in binary_exts:
                rec.setdefault("media", []).append(
                    {"ext": ext, "data": raw})
    for stem in order:
        yield samples[stem]


def read_tar_samples(paths, *, text_exts: tuple = ("txt",),
                     meta_ext: str | None = "json",
                     meta_fields: tuple = (),
                     binary_exts: tuple = ("png", "jpg", "jpeg", "gif",
                                           "wav", "avi"),
                     **ray_kwargs):
    """Dataset of WebDataset samples from tar shard file(s).

    Output columns: ``doc_id`` (member stem, string), ``shard`` (source
    tar path), ``text`` (first ``text_exts`` member, '' if none),
    ``n_media``/``media_exts`` (count + comma-joined extensions of binary
    members — the opaque-payload columns themselves stay out of the
    schema unless a downstream decode stage asks for them via
    ``include_media=True`` semantics of the media pipeline), plus one
    column per ``meta_fields`` name pulled out of the ``meta_ext`` JSON
    member (missing → null).

    Shards decode independently (one tar = one input row = one decode
    task), so read parallelism is the shard count — the WebDataset scale
    contract. Typed empty blocks: a shard with zero samples still emits
    the full schema, so unions downstream never see schema drift."""
    import ray.data

    # one shard = one block: pin the block count to the shard count so the
    # read never plans empty (schemaless) filler blocks — the decode task
    # is the parallelism unit, exactly the WebDataset contract
    if isinstance(paths, (list, tuple)) and paths and \
            "override_num_blocks" not in ray_kwargs:
        ray_kwargs["override_num_blocks"] = len(paths)
    ds = ray.data.read_binary_files(paths, include_paths=True, **ray_kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        ids, shards, texts, n_media, media_exts = [], [], [], [], []
        meta_cols: dict[str, list] = {f: [] for f in meta_fields}
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            for rec in _decode_shard(data, path, text_exts=text_exts,
                                     meta_ext=meta_ext,
                                     binary_exts=binary_exts):
                ids.append(rec["doc_id"])
                shards.append(rec["shard"])
                texts.append(rec.get("text", ""))
                media = rec.get("media", ())
                n_media.append(len(media))
                media_exts.append(",".join(m["ext"] for m in media))
                meta = rec.get("meta", {})
                for f in meta_fields:
                    meta_cols[f].append(meta.get(f))
        cols = {
            "doc_id": pa.array(ids, type=pa.string()),
            "shard": pa.array(shards, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "n_media": pa.array(n_media, type=pa.int64()),
            "media_exts": pa.array(media_exts, type=pa.string()),
        }
        for f in meta_fields:
            cols[f] = pa.array(meta_cols[f], type=pa.string())
        return pa.table(cols)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_tar_shards(df, out_dir: str, *, shard_size: int = 1000,
                     text_ext: str = "txt", meta_fields: tuple = (),
                     id_col: str = "doc_id", text_col: str = "text"):
    """Deterministic WebDataset shard writer (driver-side fixture/export
    helper): rows in ``df`` order, ``shard_size`` samples per tar, member
    times zeroed so byte output is reproducible. Returns shard paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for si in range(0, len(df), shard_size):
        chunk = df.iloc[si:si + shard_size]
        path = os.path.join(out_dir, f"shard-{si // shard_size:06d}.tar")
        with tarfile.open(path, "w") as tf:
            for _, row in chunk.iterrows():
                stem = str(row[id_col])
                payload = (row[text_col] or "").encode("utf-8")
                info = tarfile.TarInfo(name=f"{stem}.{text_ext}")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
                if meta_fields:
                    meta = json.dumps(
                        {f: row[f] for f in meta_fields},
                        ensure_ascii=False, sort_keys=True).encode("utf-8")
                    minfo = tarfile.TarInfo(name=f"{stem}.json")
                    minfo.size = len(meta)
                    minfo.mtime = 0
                    tf.addfile(minfo, io.BytesIO(meta))
        paths.append(path)
    return paths
