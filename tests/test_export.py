"""Shuffled training export: determinism, ordering, bucketed files, and
file-level resume."""

import filecmp
import glob
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _shard_doc_ids(out_dir: str, shard: int) -> list:
    """Read a shard's files in lexicographic name order — the reader
    contract: that order IS the shuffle order."""
    ids = []
    for f in sorted(glob.glob(os.path.join(out_dir, f"shard={shard}",
                                           "part-*.parquet"))):
        ids.extend(pd.read_parquet(f)["doc_id"].tolist())
    return ids


@pytest.mark.usefixtures("ray_session")
class TestExportShuffled:
    def test_order_resume_and_determinism(self, tmp_path):
        from pdf_parser_ray.pipelines.export import export_shuffled

        out1 = str(tmp_path / "run1")
        m1 = export_shuffled(SF_DIR, out1, n_shards=4, order_buckets=4)
        assert not m1["skipped"].any()
        assert m1["n_docs"].sum() == duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'").fetchall()[0][0]

        # files read in name order replay the SQL shuffle rank
        want = duckdb.sql(
            f"WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx "
            f"FROM '{SF_DIR}/documents.parquet') "
            "SELECT doc_id FROM h "
            "WHERE CAST(concat('0x', substr(hx,25,8)) AS UBIGINT) % 4 = 1 "
            "ORDER BY CAST(concat('0x', substr(hx,9,15)) AS BIGINT), doc_id"
        ).fetchdf()["doc_id"].tolist()
        assert _shard_doc_ids(out1, 1) == want

        # full rerun: every bucket file skipped
        m2 = export_shuffled(SF_DIR, out1, n_shards=4, order_buckets=4)
        assert m2["skipped"].all()

        # resume at FILE granularity: drop one bucket file, only it returns
        before = _shard_doc_ids(out1, 2)
        victims = sorted(glob.glob(os.path.join(out1, "shard=2",
                                                "part-*.parquet")))
        os.remove(victims[0])
        m3 = export_shuffled(SF_DIR, out1, n_shards=4, order_buckets=4)
        redone = m3[~m3["skipped"]]
        assert len(redone) == 1
        assert (int(redone["shard"].iloc[0]), int(redone["bucket"].iloc[0])) \
            == (2, 0)
        assert _shard_doc_ids(out1, 2) == before  # rewritten file is exact

        # independent fresh run is byte-identical (deterministic export)
        out2 = str(tmp_path / "run2")
        export_shuffled(SF_DIR, out2, n_shards=4, order_buckets=4)
        for f1 in glob.glob(os.path.join(out1, "shard=*", "part-*.parquet")):
            f2 = os.path.join(out2, os.path.relpath(f1, out1))
            assert filecmp.cmp(f1, f2, shallow=False), f1

    def test_single_bucket_mode(self, tmp_path):
        from pdf_parser_ray.pipelines.export import export_shuffled

        out = str(tmp_path / "one")
        m = export_shuffled(SF_DIR, out, n_shards=2, order_buckets=1)
        assert sorted(m["shard"].unique()) == [0, 1]
        assert (m["bucket"] == 0).all()

    def test_bad_bucket_count_raises(self, tmp_path):
        from pdf_parser_ray.pipelines.export import export_shuffled

        with pytest.raises(ValueError):
            export_shuffled(SF_DIR, str(tmp_path / "x"), order_buckets=3)

    def test_plan_mismatch_rerun_aborts(self, tmp_path):
        from pdf_parser_ray.pipelines.export import export_shuffled

        out = str(tmp_path / "plan")
        export_shuffled(SF_DIR, out, n_shards=2, order_buckets=2)
        with pytest.raises(ValueError, match="plan mismatch"):
            export_shuffled(SF_DIR, out, n_shards=4, order_buckets=2)
