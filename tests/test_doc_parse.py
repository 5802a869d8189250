"""DocParse stage kernel (no Ray needed: called directly on Arrow tables)
+ the synthesized corpus's embedded golden/error documents."""

import base64

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pdf_parser_ray.pdf.build import claim_form_pdf, minimal_pdf
from pdf_parser_ray.schema import INPUT_SCHEMA
from pdf_parser_ray.sources.synth import generate_corpus
from pdf_parser_ray.stages.doc_parse import DocParse


def _table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


@pytest.fixture(scope="module")
def dp() -> DocParse:
    return DocParse()


class TestKinds:
    def test_text_passthrough(self, dp):
        out = dp(_table([{"doc_id": "d1", "spans": [
            {"kind": "text", "text": "hello world", "media_ref": "", "offset": 0}]}]))
        spans = out.column("spans").to_pylist()[0]
        assert spans == [{"kind": "text", "text": "hello world", "media_ref": "", "offset": 0}]
        assert out.column("error").to_pylist() == [None]

    def test_media_passthrough_order(self, dp):
        out = dp(_table([{"doc_id": "d1", "spans": [
            {"kind": "image", "text": "", "media_ref": "media://d1/0", "offset": 0},
            {"kind": "text", "text": "between", "media_ref": "", "offset": 1},
            {"kind": "media", "text": "", "media_ref": "media://d1/2", "offset": 2},
        ]}]))
        spans = out.column("spans").to_pylist()[0]
        assert [s["kind"] for s in spans] == ["image", "text", "media"]
        assert [s["offset"] for s in spans] == [0, 1, 2]
        assert spans[2]["media_ref"] == "media://d1/2"

    def test_input_offset_order_restored(self, dp):
        # spans arrive out of order; processing must follow input offset
        out = dp(_table([{"doc_id": "d1", "spans": [
            {"kind": "text", "text": "second", "media_ref": "", "offset": 1},
            {"kind": "text", "text": "first", "media_ref": "", "offset": 0},
        ]}]))
        spans = out.column("spans").to_pylist()[0]
        assert [s["text"] for s in spans] == ["first", "second"]

    def test_pdf_pages_become_spans(self, dp):
        out = dp(_table([{"doc_id": "d1", "spans": [
            {"kind": "pdf", "text": _b64(claim_form_pdf()), "media_ref": "", "offset": 0}]}]))
        spans = out.column("spans").to_pylist()[0]
        assert len(spans) == 5  # one text span per page
        assert spans[0]["text"].startswith("INSURANCE CLAIM FORM")

    def test_pdf_golden_fields(self, dp):
        out = dp(_table([{"doc_id": "d1", "spans": [
            {"kind": "pdf", "text": _b64(claim_form_pdf()), "media_ref": "", "offset": 0}]}]))
        fields = out.column("fields").to_pylist()[0]
        # golden record from the reference extractions.db (FIXTURES.md §2.1)
        assert fields == {"customer_name": "Jan Kowalski",
                          "policy_number": "POL-789456123",
                          "claim_amount": "3,450.00"}

    def test_minimal_pdf_fallback_encoding(self, dp):
        out = dp(_table([{"doc_id": "d1", "spans": [
            {"kind": "pdf", "text": _b64(minimal_pdf()), "media_ref": "", "offset": 0}]}]))
        fields = out.column("fields").to_pylist()[0]
        assert fields["customer_name"] == "John Doe"

    def test_html_extraction(self, dp):
        html = ('<body><header><nav><a href="/">x</a></nav></header>'
                "<p>Main content paragraph long enough to be kept by the scorer.</p>"
                '<img src="media://d1/0/i"></body>')
        out = dp(_table([{"doc_id": "d1", "spans": [
            {"kind": "html", "text": html, "media_ref": "", "offset": 0}]}]))
        spans = out.column("spans").to_pylist()[0]
        assert [s["kind"] for s in spans] == ["text", "image"]
        assert spans[1]["media_ref"] == "media://d1/0/i"

    def test_identical_payload_identical_hash(self, dp):
        rows = [{"doc_id": d, "spans": [
            {"kind": "pdf", "text": _b64(claim_form_pdf()), "media_ref": "", "offset": 0}]}
            for d in ("a", "b")]
        out = dp(_table(rows))
        h = out.column("file_hash").to_pylist()
        assert h[0] == h[1]
        assert out.column("file_hash6").to_pylist()[0] == h[0][:6]


class TestCorpusGoldens:
    @pytest.fixture(scope="class")
    def parsed(self):
        return DocParse()(generate_corpus(0.01))

    def _row(self, parsed, doc_id):
        mask = pc.equal(parsed.column("doc_id"), doc_id)
        return parsed.filter(mask)

    def test_error_buckets(self, parsed):
        errs = {r["doc_id"]: r["error"] for r in parsed.to_pylist() if r["error"]}
        assert "not a valid PDF" in errs["doc-00000001"]
        assert "too small" in errs["doc-00000002"]
        assert "Failed to extract text from any page" in errs["doc-00000003"]

    def test_bad_page_mix_recovers(self, parsed):
        row = self._row(parsed, "doc-00000004").to_pylist()[0]
        assert row["error"] is None
        assert len(row["page_errors"]) == 1
        assert row["spans"][0]["text"] == "Recovered page two text"

    def test_no_fields_doc(self, parsed):
        row = self._row(parsed, "doc-00000005").to_pylist()[0]
        assert row["fields"] == {"customer_name": None, "policy_number": None,
                                 "claim_amount": None}
        assert row["error"] is None

    def test_unicode_preserved(self, parsed):
        row = self._row(parsed, "doc-00000006").to_pylist()[0]
        assert row["fields"]["customer_name"] == "José García"
        assert "中文" in row["spans"][0]["text"]

    def test_dup_docs_same_hash(self, parsed):
        a = self._row(parsed, "doc-00000007").to_pylist()[0]
        b = self._row(parsed, "doc-00000008").to_pylist()[0]
        assert a["file_hash"] == b["file_hash"]
        assert a["fields"]["customer_name"] == "Jan Kowalski"

    def test_output_offsets_contiguous(self, parsed):
        for row in parsed.to_pylist():
            offs = [s["offset"] for s in row["spans"]]
            assert offs == list(range(len(offs)))

    def test_output_kinds_contract(self, parsed):
        for row in parsed.to_pylist():
            for s in row["spans"]:
                assert s["kind"] in ("text", "image", "media")

    def test_error_rows_have_no_spans(self, parsed):
        for row in parsed.to_pylist():
            if row["error"]:
                assert row["spans"] == [] and row["n_spans"] == 0


class TestInvariantsAcrossSeeds:
    @pytest.mark.parametrize("seed", [7, 123, 20260817])
    def test_docparse_invariants(self, dp, seed):
        from pdf_parser_ray.sources.synth import generate_corpus

        out = dp(generate_corpus(0.003, seed=seed))
        for row in out.to_pylist():
            # offsets contiguous from 0
            offs = [s["offset"] for s in row["spans"]]
            assert offs == list(range(len(offs)))
            # error rows have no spans; success rows' kinds are output kinds
            if row["error"]:
                assert row["spans"] == []
            for s in row["spans"]:
                assert s["kind"] in ("text", "image", "media")
                if s["kind"] != "text":
                    assert s["text"] == "" and s["media_ref"]
            # hash shape
            assert len(row["file_hash"]) == 64
            assert row["file_hash6"] == row["file_hash"][:6]
            assert row["n_spans"] == len(row["spans"])

    @pytest.mark.parametrize("seed", [7, 123])
    def test_seed_determinism(self, dp, seed):
        from pdf_parser_ray.sources.synth import generate_corpus

        a = dp(generate_corpus(0.002, seed=seed))
        b = dp(generate_corpus(0.002, seed=seed))
        assert a.equals(b)

    def test_different_seeds_differ(self, dp):
        from pdf_parser_ray.sources.synth import generate_corpus

        a = generate_corpus(0.002, seed=1)
        b = generate_corpus(0.002, seed=2)
        assert not a.equals(b)


class TestMethodTag:
    def test_extraction_method_passthrough(self, dp):
        # reference test_processors.py:367-389 method-tag pass-through parity
        out = dp(_table([{"doc_id": "d", "spans": [
            {"kind": "text", "text": "x", "media_ref": "", "offset": 0}]}]))
        assert out.column("extraction_method").to_pylist() == ["classic"]
