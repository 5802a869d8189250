"""Frozen-golden span-sequence equality (SURVEY.md §5 test plan).

The distributed pipeline's output must match tests/golden/*.parquet
row-for-row on (kind, text, media_ref, order) plus fields/hash/error —
the artifact is generated once by tools/regen_goldens.py (hand-verified
spot checks) and locked; drift in any kernel fails here."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "spans_sf0.001.parquet")


@pytest.fixture(scope="module")
def golden() -> pa.Table:
    return pq.read_table(GOLDEN)


class TestFrozenGolden:
    def test_single_process_matches_golden(self, golden):
        from pdf_parser_ray.sources.synth import generate_corpus
        from pdf_parser_ray.stages.doc_parse import DocParse

        out = DocParse()(generate_corpus(0.001))
        out = out.take(pc.sort_indices(out.column("doc_id")))
        for col in golden.column_names:
            assert out.column(col).to_pylist() == golden.column(col).to_pylist(), col

    def test_ray_pipeline_matches_golden(self, ray_session, corpus_sf0001, golden):
        from pdf_parser_ray.pipelines.extraction import extraction_dataset

        ds = extraction_dataset(corpus_sf0001, parse_concurrency=2, batch_size=4)
        tbl = pa.concat_tables(
            [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
        tbl = tbl.take(pc.sort_indices(tbl.column("doc_id")))
        for col in ("doc_id", "spans", "file_hash", "fields", "error", "page_errors"):
            assert tbl.column(col).to_pylist() == golden.column(col).to_pylist(), col

    def test_golden_has_expected_docs(self, golden):
        assert golden.num_rows == 10
        assert golden.column("doc_id").to_pylist() == [
            f"doc-{i:08d}" for i in range(10)]


class TestFrozenGoldenSf001:
    def test_sf001_matches(self):
        from pdf_parser_ray.sources.synth import generate_corpus
        from pdf_parser_ray.stages.doc_parse import DocParse

        golden01 = pq.read_table(os.path.join(os.path.dirname(__file__),
                                              "golden", "spans_sf0.01.parquet"))
        out = DocParse()(generate_corpus(0.01))
        out = out.take(pc.sort_indices(out.column("doc_id")))
        assert out.num_rows == golden01.num_rows == 100
        for col in golden01.column_names:
            assert out.column(col).to_pylist() == golden01.column(col).to_pylist(), col
