"""RegexFieldExtractor — behavioral parity with the reference ClassicExtractor
(tests/test_extractors.py classic section): golden matches, empty-text error,
unknown-field skip, first-pattern-wins, strip, unicode, compile error."""

import pyarrow as pa
import pytest

from pdf_parser_ray.functions.regex_extract import FieldExtractionError, RegexFieldExtractor


@pytest.fixture
def ex() -> RegexFieldExtractor:
    return RegexFieldExtractor()


class TestExtract:
    def test_golden_defaults(self, ex, sample_text_content):
        # reference test_extractors.py:151-159 golden values
        out = ex.extract(sample_text_content)
        assert out == {
            "customer_name": "John Smith",
            "policy_number": "POL-123456",
            "claim_amount": "1,500.00",
        }

    def test_empty_text_raises(self, ex):
        # reference classic_extractor.py:79-80
        with pytest.raises(FieldExtractionError):
            ex.extract("")
        with pytest.raises(FieldExtractionError):
            ex.extract("   \n ")

    def test_unknown_field_skipped(self, ex, sample_text_content):
        # reference test_extractors.py:178-184 → unknown key yields {}
        assert ex.extract(sample_text_content, fields=["nonexistent"]) == {}

    def test_subset_fields(self, ex, sample_text_content):
        out = ex.extract(sample_text_content, fields=["policy_number"])
        assert out == {"policy_number": "POL-123456"}

    def test_no_match_absent_key(self, ex):
        out = ex.extract("This text does not contain the expected patterns")
        assert out == {}

    def test_case_insensitive(self, ex):
        out = ex.extract("CUSTOMER NAME: Jane Doe")
        assert out["customer_name"] == "Jane Doe"

    def test_first_pattern_wins(self):
        # reference test_extractors.py:217-232
        ex = RegexFieldExtractor({
            "f": {"display": "F", "patterns": [r"first: (\w+)", r"second: (\w+)"]},
        })
        assert ex.extract("second: b first: a") == {"f": "a"}

    def test_value_stripped(self):
        ex = RegexFieldExtractor({"f": {"display": "F", "patterns": [r"v:([ \w]+)"]}})
        assert ex.extract("v:  padded  ") == {"f": "padded"}

    def test_unicode_name(self, ex):
        out = ex.extract("Customer Name: José García\nmore")
        assert out["customer_name"] == "José García"

    def test_compile_error(self):
        with pytest.raises(FieldExtractionError):
            RegexFieldExtractor({"bad": {"display": "B", "patterns": ["("]}})


class TestBatch:
    def test_extract_column(self, ex, sample_text_content):
        col = pa.array([sample_text_content, "", None, "no fields here"])
        struct = ex.extract_column(col)
        rows = struct.to_pylist()
        assert rows[0]["customer_name"] == "John Smith"
        assert rows[1] == {"customer_name": None, "policy_number": None, "claim_amount": None}
        assert rows[2]["claim_amount"] is None
        assert rows[3]["policy_number"] is None
