"""Content-defined chunking (stages/cdc.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from pdf_parser_ray.stages.cdc import (CDC_BASE, CDC_MASK_BITS, CDC_WINDOW,
                                       cdc_chunk_rows, cdc_cut_positions,
                                       cdc_chunks, cdc_dup_chunks)


def _ref_cuts(text: str) -> list[int]:
    """Straight-line scalar re-derivation of the cut rule."""
    n, W = len(text), CDC_WINDOW
    cuts = []
    for i in range(W - 1, n - 1):
        h = 0
        for j in range(W):
            h = (h + ord(text[i - W + 1 + j])
                 * pow(CDC_BASE, W - 1 - j, 1 << 64)) % (1 << 64)
        if h % (1 << CDC_MASK_BITS) == 0:
            cuts.append(i)
    return cuts


class TestCutKernel:
    def test_matches_scalar_reference(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            n = int(rng.integers(0, 120))
            text = "".join(chr(int(c)) for c in rng.integers(32, 1200, n))
            assert cdc_cut_positions(text).tolist() == _ref_cuts(text)

    def test_short_and_empty_texts(self):
        assert cdc_cut_positions("").tolist() == []
        assert cdc_cut_positions("abcdefgh").tolist() == []  # n == W: no
        # cut allowed at the final char even if the hash hits
        assert cdc_chunk_rows("") == [(0, 0, "")]
        assert cdc_chunk_rows("abc") == [(0, 3, "abc")]

    def test_chunks_cover_text_exactly(self):
        rng = np.random.default_rng(11)
        text = " ".join(f"w{int(i)}" for i in rng.integers(0, 30, 200))
        rows = cdc_chunk_rows(text)
        assert "".join(c for _, _, c in rows) == text
        assert rows[0][0] == 0
        for (s1, l1, _), (s2, _, _) in zip(rows, rows[1:]):
            assert s1 + l1 == s2
        assert all(length > 0 for _, length, _ in rows)

    def test_content_defined_realignment(self):
        """The CDC property: a prefix edit only disturbs chunks near the
        edit; once past the window, boundaries realign."""
        rng = np.random.default_rng(13)
        body = " ".join(f"tok{int(i)}" for i in rng.integers(0, 50, 300))
        a = {(c, length) for s, length, c in cdc_chunk_rows(body)}
        b = {(c, length) for s, length, c in
             cdc_chunk_rows("INSERTED PREFIX " + body)}
        shared = len(a & b)
        assert shared >= 0.8 * len(a)  # tail chunks identical


class TestCdcDatasets:
    def test_chunks_partition_invariant(self, ray_session):
        import ray.data

        rng = np.random.default_rng(3)
        rows = [{"doc_id": i,
                 "text": " ".join(f"w{int(x)}"
                                  for x in rng.integers(0, 40, 60))}
                for i in range(50)]
        a = cdc_chunks(ray.data.from_items(rows)).to_pandas().sort_values(
            ["doc_id", "chunk_idx"], ignore_index=True)
        b = cdc_chunks(
            ray.data.from_items(rows).repartition(7)
        ).to_pandas().sort_values(["doc_id", "chunk_idx"],
                                  ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        # hash rule is the house md5-u64 of the chunk text — check on the
        # ARROW table (a pandas round-trip would degrade uint64 to float)
        t = cdc_chunks(ray.data.from_items(rows[:1])).take_batch(
            batch_format="pyarrow")
        first_len = int(t.column("n_chars")[0].as_py())
        chunk = rows[0]["text"][:first_len]
        assert t.column("chunk_hash")[0].as_py() == int.from_bytes(
            hashlib.md5(chunk.encode()).digest()[:8], "big")

    def test_dup_chunks_finds_planted_boilerplate(self, ray_session):
        import ray.data

        rng = np.random.default_rng(5)
        boiler = " ".join(f"b{int(x)}" for x in rng.integers(0, 9, 40))
        rows = [{"doc_id": i,
                 "text": boiler + " " + " ".join(
                     f"u{i}x{int(x)}" for x in rng.integers(0, 99, 40))}
                for i in range(30)]
        out = cdc_dup_chunks(ray.data.from_items(rows)).to_pandas()
        assert len(out) >= 1
        assert out["n_docs"].max() == 30  # shared prefix chunk in all docs
        assert (out["n_occ"] >= out["n_docs"]).all()

    def test_sql_parity_both_queries(self, ray_session):
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        for name in ("cdc_chunks", "cdc_dup_chunks"):
            got = entry.queries()[name](sf).to_pandas()
            exp = con.execute(entry.oracle_sql()[name]).fetchdf()
            cols = sorted(got.columns)
            assert cols == sorted(exp.columns)
            a = got[cols].sort_values(cols, ignore_index=True)
            b = exp[cols].sort_values(cols, ignore_index=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestCdcNeardup:
    def test_planted_neardup_pair_found(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.cdc import cdc_neardup_edges

        rng = np.random.default_rng(29)
        body = " ".join(f"tok{int(x)}" for x in rng.integers(0, 50, 300))
        rows = [
            {"doc_id": 1, "text": body},
            {"doc_id": 2, "text": "EDIT AT FRONT " + body},  # near-dup of 1
            {"doc_id": 3, "text": " ".join(
                f"z{int(x)}" for x in rng.integers(0, 50, 300))},
        ]
        out = cdc_neardup_edges(ray.data.from_items(rows)).to_pandas()
        pairs = set(zip(out["a"], out["b"]))
        assert (1, 2) in pairs
        assert not any(3 in p for p in pairs)

    def test_hot_bucket_cap_is_deterministic(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.cdc import cdc_neardup_edges

        # 10 identical docs share every chunk; cap=3 keeps doc ids 0-2 →
        # exactly the 3 pairs among them, regardless of partitioning
        rows = [{"doc_id": i,
                 "text": "shared boilerplate chunk text that is long "
                         "enough to pass the min length filter easily"}
                for i in range(10)]
        for reps in (None, 4):
            ds = ray.data.from_items(rows)
            if reps:
                ds = ds.repartition(reps)
            out = cdc_neardup_edges(ds, max_bucket=3,
                                    min_shared=1).to_pandas()
            assert set(zip(out["a"], out["b"])) == {(0, 1), (0, 2), (1, 2)}

    def test_sql_parity(self, ray_session):
        import duckdb

        import __ray_entry__ as entry

        sf = "/root/testdata/sf0.001"
        got = entry.queries()["cdc_neardup"](sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        exp = con.execute(entry.oracle_sql()["cdc_neardup"]).fetchdf()
        cols = sorted(got.columns)
        a = got[cols].sort_values(cols, ignore_index=True)
        b = exp[cols].sort_values(cols, ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
