"""Shuffled training export: determinism, ordering, and shard-level resume."""

import filecmp
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestExportShuffled:
    def test_order_resume_and_determinism(self, tmp_path):
        from pdf_parser_ray.pipelines.export import export_shuffled

        out1 = str(tmp_path / "run1")
        m1 = export_shuffled(SF_DIR, out1, n_shards=4)
        assert not m1["skipped"].any() and len(m1) == 4
        assert m1["n_docs"].sum() == duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'").fetchall()[0][0]

        # within-shard order replays the SQL shuffle rank
        want = duckdb.sql(
            f"WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx "
            f"FROM '{SF_DIR}/documents.parquet') "
            "SELECT doc_id FROM h "
            "WHERE CAST(concat('0x', substr(hx,1,8)) AS UBIGINT) % 4 = 1 "
            "ORDER BY CAST(concat('0x', substr(hx,9,15)) AS BIGINT), doc_id"
        ).fetchdf()["doc_id"].tolist()
        got = pd.read_parquet(os.path.join(out1, "shard=1"))["doc_id"].tolist()
        assert got == want

        # full rerun: every shard skipped, files untouched
        m2 = export_shuffled(SF_DIR, out1, n_shards=4)
        assert m2["skipped"].all()

        # resume: drop one shard, only it is rewritten — byte-equal
        import shutil
        shutil.rmtree(os.path.join(out1, "shard=2"))
        m3 = export_shuffled(SF_DIR, out1, n_shards=4)
        assert m3.set_index("shard")["skipped"].to_dict() == {
            0: True, 1: True, 2: False, 3: True}

        # independent fresh run is byte-identical (deterministic export)
        out2 = str(tmp_path / "run2")
        export_shuffled(SF_DIR, out2, n_shards=4)
        for k in range(4):
            a = os.path.join(out1, f"shard={k}", "part-0.parquet")
            b = os.path.join(out2, f"shard={k}", "part-0.parquet")
            assert filecmp.cmp(a, b, shallow=False), f"shard {k} differs"
