"""Property-based tests (hypothesis) for the hand-written kernels —
robustness beyond the reference's example-based suite (SURVEY.md §5 notes
the reference has none; these guard the from-scratch parsers)."""

import string

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdf_parser_ray.pdf import PdfError, extract_text
from pdf_parser_ray.pdf.build import minimal_pdf, _escape_literal
from pdf_parser_ray.pdf.objects import Lexer, PdfSyntaxError
from pdf_parser_ray.html import extract_main_content
from pdf_parser_ray.functions import textstats
from pdf_parser_ray.functions.minhash import MinHasher, jaccard, shingles


printable_line = st.text(
    alphabet=string.ascii_letters + string.digits + " .,:;!?()-'\"$%&/\\",
    min_size=1, max_size=60,
).filter(lambda s: s.strip())


class TestPdfRoundtrip:
    @given(st.lists(printable_line, min_size=1, max_size=8))
    @settings(max_examples=40, deadline=None)
    def test_build_parse_roundtrip(self, lines):
        # whatever text we write (incl. parens/backslashes) must decode back;
        # layout collapses internal runs of >1 space, so compare normalized
        got = extract_text(minimal_pdf(lines))
        want = "\n".join(" ".join(l.split()) for l in lines if l.strip())
        got_norm = "\n".join(" ".join(l.split()) for l in got.split("\n"))
        assert got_norm == want

    @given(st.binary(min_size=0, max_size=400))
    @settings(max_examples=60, deadline=None)
    def test_fuzz_never_crashes(self, junk):
        # arbitrary bytes → PdfError or text, never another exception type
        try:
            extract_text(b"%PDF-1.4\n" + junk)
        except PdfError:
            pass

    @given(st.binary(min_size=0, max_size=120))
    @settings(max_examples=60, deadline=None)
    def test_literal_escape_roundtrip(self, raw):
        data = raw.decode("latin-1", "ignore").encode("cp1252", "replace")
        escaped = b"(" + _escape_literal(data.decode("cp1252")) + b")"
        lex = Lexer(escaped)
        assert lex.parse_value() == data


class TestLexerFuzz:
    @given(st.binary(min_size=1, max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_parse_value_never_hangs_or_crashes(self, junk):
        lex = Lexer(junk)
        try:
            lex.parse_value()
        except (PdfSyntaxError, RecursionError):
            pass


class TestHtmlFuzz:
    @given(st.text(alphabet=string.printable, min_size=0, max_size=400))
    @settings(max_examples=60, deadline=None)
    def test_never_crashes(self, junk):
        spans = extract_main_content(junk)
        for s in spans:
            assert s.kind in ("text", "image")

    @given(st.lists(st.text(alphabet=string.ascii_letters + " ",
                            min_size=30, max_size=80), min_size=1, max_size=5))
    @settings(max_examples=30, deadline=None)
    def test_plain_paragraphs_kept_in_order(self, paras):
        paras = [" ".join(p.split()) for p in paras]
        paras = [p for p in paras if len(p) >= 25]
        html = "<body>" + "".join(f"<p>{p}</p>" for p in paras) + "</body>"
        got = [s.text for s in extract_main_content(html)]
        assert got == paras


class TestSketchProperties:
    @given(st.text(alphabet=string.ascii_lowercase + " ", min_size=0, max_size=300))
    @settings(max_examples=30, deadline=None)
    def test_minhash_self_similarity(self, text):
        h = MinHasher(num_perm=64)
        sig = h.signature(text)
        assert sig.shape == (64,)
        assert (sig == h.signature(text)).all()

    @given(st.text(alphabet=string.ascii_lowercase + " ", min_size=1, max_size=200),
           st.text(alphabet=string.ascii_lowercase + " ", min_size=1, max_size=200))
    @settings(max_examples=30, deadline=None)
    def test_jaccard_bounds(self, a, b):
        j = jaccard(shingles(a), shingles(b))
        assert 0.0 <= j <= 1.0
        assert jaccard(shingles(a), shingles(a)) == 1.0


class TestTextstatsProperties:
    @given(st.text(min_size=0, max_size=300))
    @settings(max_examples=40, deadline=None)
    def test_fingerprint_total(self, text):
        # winnowing output is sorted-unique and deterministic for any input
        fp = textstats.winnow_fingerprint(text)
        assert (np.sort(np.unique(fp)) == fp).all() or len(fp) <= 1
        assert textstats.doc_fingerprint_hex(text) == textstats.doc_fingerprint_hex(text)

    @given(st.text(alphabet=string.printable, min_size=0, max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_counts_consistent(self, text):
        import pandas as pd

        s = pd.Series([text])
        assert int(textstats.alpha_count(s)[0]) <= int(textstats.char_count(s)[0])
        assert int(textstats.token_count(s)[0]) <= max(1, int(textstats.char_count(s)[0]))


class TestRepetitionSignalProperties:
    @given(st.lists(st.text(alphabet=string.printable, max_size=200),
                    min_size=0, max_size=8))
    @settings(max_examples=40, deadline=None)
    def test_bounds_and_shape(self, texts):
        from pdf_parser_ray.stages.textstage import _repetition_signals

        n_tok, ttr, dup, top, keep = _repetition_signals(texts, 50, 400, 60)
        assert len(n_tok) == len(ttr) == len(dup) == len(top) == len(keep) \
            == len(texts)
        for n, t, d, p, k in zip(n_tok, ttr, dup, top, keep):
            assert 0 <= t <= 1000 and 0 <= d <= 1000 and 0 <= p <= 1000
            if n < 2:  # no bigrams: both ratios pinned to 0
                assert d == 0 and p == 0
            assert k == (d <= 50 and t >= 400 and p <= 60)

    @given(st.integers(min_value=2, max_value=50))
    @settings(max_examples=20, deadline=None)
    def test_degenerate_repetition(self, n):
        from pdf_parser_ray.stages.textstage import _repetition_signals

        # one token repeated n times: top bigram ratio is exactly 1000
        _, ttr, dup, top, _ = _repetition_signals(["x " * n], 50, 400, 60)
        assert top[0] == 1000
        assert ttr[0] == 1000 // n
        n_bg = n - 1
        assert dup[0] == 1000 * (n_bg - 1) // n_bg


class TestMd5BucketProperties:
    @given(st.lists(st.one_of(st.integers(min_value=0, max_value=10**9),
                              st.text(max_size=24)),
                    min_size=0, max_size=30))
    @settings(max_examples=40, deadline=None)
    def test_range_and_determinism(self, ids):
        from pdf_parser_ray.functions.hashing import md5_bucket_100

        a = md5_bucket_100(ids)
        assert a == md5_bucket_100(ids)
        assert all(0 <= b < 100 for b in a)
        # stringified ids bucket identically (the DuckDB CAST AS VARCHAR rule)
        assert a == md5_bucket_100([str(i) for i in ids])
