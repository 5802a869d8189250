"""WebDataset tar-shard source (sources/tar.py): writer/reader round
trip, multimodal member grouping, schema stability on degenerate shards."""

from __future__ import annotations

import io
import json
import tarfile

import pandas as pd
import pytest


def _read_df(paths, **kwargs) -> pd.DataFrame:
    from pdf_parser_ray.sources.tar import read_tar_samples

    return (read_tar_samples(paths, **kwargs).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def _add_member(tf: tarfile.TarFile, name: str, payload: bytes):
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    tf.addfile(info, io.BytesIO(payload))


class TestTarRoundTrip:
    def test_write_read_with_meta(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.tar import write_tar_shards

        df = pd.DataFrame({
            "doc_id": [f"d{i:03d}" for i in range(25)],
            "text": [f"text number {i} é\n" for i in range(25)],
            "lang": ["en", "de", "fr", "en", "es"] * 5,
        })
        paths = write_tar_shards(df, str(tmp_path / "shards"),
                                 shard_size=10, meta_fields=("lang",))
        assert len(paths) == 3  # 25 samples / 10 per shard
        got = _read_df(paths, meta_fields=("lang",))
        assert len(got) == 25
        assert got["doc_id"].tolist() == df["doc_id"].tolist()
        assert got["text"].tolist() == df["text"].tolist()
        assert got["lang"].tolist() == df["lang"].tolist()
        assert (got["n_media"] == 0).all()

    def test_writer_deterministic_bytes(self, tmp_path):
        from pdf_parser_ray.sources.tar import write_tar_shards

        df = pd.DataFrame({"doc_id": ["a", "b"], "text": ["x", "y"]})
        p1 = write_tar_shards(df, str(tmp_path / "one"))[0]
        p2 = write_tar_shards(df, str(tmp_path / "two"))[0]
        assert open(p1, "rb").read() == open(p2, "rb").read()


class TestTarSamples:
    def test_multimodal_members_grouped(self, ray_session, tmp_path):
        path = tmp_path / "mm.tar"
        with tarfile.open(path, "w") as tf:
            _add_member(tf, "s1.txt", "caption one".encode())
            _add_member(tf, "s1.png", b"\x89PNGfake")
            _add_member(tf, "s1.wav", b"RIFFfake")
            _add_member(tf, "s1.json", json.dumps({"lang": "en"}).encode())
            _add_member(tf, "s2.png", b"imgonly")
        got = _read_df([str(path)], meta_fields=("lang",))
        assert got["doc_id"].tolist() == ["s1", "s2"]
        s1 = got.iloc[0]
        assert s1["text"] == "caption one"
        assert s1["n_media"] == 2 and s1["media_exts"] == "png,wav"
        assert s1["lang"] == "en"
        s2 = got.iloc[1]
        assert s2["text"] == "" and s2["n_media"] == 1
        assert pd.isna(s2["lang"])

    def test_nested_names_and_unknown_exts(self, ray_session, tmp_path):
        path = tmp_path / "nest.tar"
        with tarfile.open(path, "w") as tf:
            _add_member(tf, "dir/sub/k1.txt", b"hello")
            _add_member(tf, "dir/sub/k1.xyz", b"ignored ext")
            _add_member(tf, "noext", b"skipped entirely")
        got = _read_df([str(path)])
        assert got["doc_id"].tolist() == ["k1"]
        assert got.iloc[0]["text"] == "hello"
        assert got.iloc[0]["n_media"] == 0

    def test_empty_shard_keeps_schema(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.tar import read_tar_samples

        path = tmp_path / "empty.tar"
        with tarfile.open(path, "w"):
            pass
        ds = read_tar_samples([str(path)], meta_fields=("lang",))
        # the DATASET schema stays fully typed (Ray's to_pandas drops
        # columns for an all-empty dataset, so assert on the schema)
        assert ds.schema().names == ["doc_id", "shard", "text", "n_media",
                                     "media_exts", "lang"]
        assert ds.count() == 0

    def test_shard_column_names_source(self, ray_session, tmp_path):
        from pdf_parser_ray.sources.tar import write_tar_shards

        df = pd.DataFrame({"doc_id": ["a"], "text": ["t"]})
        paths = write_tar_shards(df, str(tmp_path / "s"))
        got = _read_df(paths)
        assert got.iloc[0]["shard"].endswith("shard-000000.tar")
