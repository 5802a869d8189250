"""Validator kernels — ports every behavioral branch of the reference's
tests/test_validators.py (size boundaries, magic prefix, extension case,
check order) onto our error-returning API."""

import pyarrow as pa

from pdf_parser_ray.config import MAX_FILE_SIZE, MIN_FILE_SIZE
from pdf_parser_ray.functions.validators import (
    has_pdf_magic_arrow,
    validate_payload,
    validate_sizes_arrow,
)


def _pdf(n: int) -> bytes:
    body = b"%PDF-1.4\n"
    return body + b"x" * (n - len(body))


class TestValidatePayload:
    def test_valid(self):
        assert validate_payload(_pdf(2048), "doc.pdf") is None

    def test_boundary_sizes(self):
        assert validate_payload(_pdf(MIN_FILE_SIZE), "a.pdf") is None
        assert validate_payload(_pdf(MAX_FILE_SIZE), "a.pdf") is None
        assert "too small" in validate_payload(_pdf(MIN_FILE_SIZE - 1), "a.pdf")
        assert "too large" in validate_payload(_pdf(MAX_FILE_SIZE + 1), "a.pdf")

    def test_magic(self):
        assert "not a valid PDF" in validate_payload(b"x" * 200, "a.pdf")

    def test_extension_case_insensitive(self):
        assert validate_payload(_pdf(200), "A.PDF") is None
        assert validate_payload(_pdf(200), "a.Pdf") is None
        err = validate_payload(_pdf(200), "a.txt")
        assert "Invalid file extension" in err and ".txt" in err

    def test_no_filename_skips_extension(self):
        assert validate_payload(_pdf(200)) is None

    def test_check_order_size_before_magic(self):
        # reference validators.py:36-39: size checked first
        assert "too small" in validate_payload(b"no magic", "a.pdf")


class TestVectorized:
    def test_sizes(self):
        lengths = pa.array([50, MIN_FILE_SIZE, MAX_FILE_SIZE, MAX_FILE_SIZE + 1])
        out = validate_sizes_arrow(lengths).to_pylist()
        assert out == ["too_small", None, None, "too_large"]

    def test_magic(self):
        col = pa.array(["%PDF-1.7 x", "nope", "%PDX"])
        assert has_pdf_magic_arrow(col).to_pylist() == [True, False, False]


class TestSuffixHelper:
    def test_no_extension(self):
        from pdf_parser_ray.functions.validators import _suffix

        assert _suffix("noext") == ""
        assert _suffix("archive.tar.gz") == ".gz"
        assert _suffix("dir.d/file") == ""
        assert _suffix("dir.d/file.pdf") == ".pdf"

    def test_error_message_mentions_suffix(self):
        from pdf_parser_ray.functions.validators import validate_payload

        err = validate_payload(b"%PDF" + b"x" * 200, "doc.docx")
        assert ".docx" in err


class TestNullHandling:
    def test_null_lengths_are_too_small(self):
        import pyarrow.compute as pc

        col = pa.array(["%PDF ok text here", None, "x"])
        out = validate_sizes_arrow(pc.binary_length(col)).to_pylist()
        assert out == ["too_small", "too_small", "too_small"]

    def test_valid_sized_with_null_neighbor(self):
        import pyarrow.compute as pc

        col = pa.array(["x" * 200, None])
        out = validate_sizes_arrow(pc.binary_length(col)).to_pylist()
        assert out == [None, "too_small"]
