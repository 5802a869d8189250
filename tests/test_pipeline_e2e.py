"""End-to-end extraction pipeline under Ray: distributed output must equal
the single-process oracle span-for-span (the correctness contract:
span-sequence equality on (kind, text, media_ref, order)) and be
deterministic across runs."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pdf_parser_ray.pipelines.extraction import extraction_dataset
from pdf_parser_ray.sources.synth import generate_corpus
from pdf_parser_ray.stages.doc_parse import DocParse


def _canonical(table: pa.Table) -> pa.Table:
    cols = ["doc_id", "spans", "file_hash", "file_hash6", "fields", "error",
            "page_errors", "n_spans", "n_bytes"]
    table = table.select(cols)
    return table.take(pc.sort_indices(table.column("doc_id")))


@pytest.fixture(scope="module")
def ray_output(ray_session, corpus_sf0001) -> pa.Table:
    ds = extraction_dataset(corpus_sf0001, parse_concurrency=2, batch_size=4)
    return _canonical(pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]))


class TestSpanEquality:
    def test_matches_single_process_oracle(self, ray_output):
        oracle = _canonical(DocParse()(generate_corpus(0.001)))
        assert ray_output.num_rows == oracle.num_rows
        for col in ("doc_id", "spans", "file_hash", "file_hash6", "fields",
                    "error", "page_errors", "n_spans"):
            assert ray_output.column(col).to_pylist() == oracle.column(col).to_pylist(), col

    def test_deterministic_across_runs(self, ray_session, corpus_sf0001, ray_output):
        ds2 = extraction_dataset(corpus_sf0001, parse_concurrency=2, batch_size=4)
        again = _canonical(pa.concat_tables(
            [pa.table(b) for b in ds2.iter_batches(batch_format="pyarrow")]))
        assert ray_output.equals(again)

    def test_one_row_per_input_doc(self, ray_output):
        assert ray_output.num_rows == 10
        assert len(set(ray_output.column("doc_id").to_pylist())) == 10


class TestEntryContract:
    def test_entry_runs(self, ray_session):
        import __ray_entry__ as m

        out = m.entry()
        tbl = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
        assert tbl.num_rows >= 1
        assert "doc_id" in tbl.column_names

    def test_queries_and_oracles_aligned(self):
        import __ray_entry__ as m

        qs, sqls = m.queries(), m.oracle_sql()
        assert set(sqls).issubset(set(qs))
        assert len(qs) >= 20
