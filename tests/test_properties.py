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


class TestKmvProperties:
    @given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                    min_size=0, max_size=300),
           st.integers(min_value=2, max_value=32),
           st.integers(min_value=1, max_value=5))
    @settings(max_examples=60, deadline=None)
    def test_merge_is_partition_invariant(self, vals, k, nparts):
        """Union of per-part k-smallest == k-smallest of the whole — the
        property that makes the distributed sketch (and its tree merge)
        exact regardless of block layout."""
        from pdf_parser_ray.functions.hashing import md5_u64
        from pdf_parser_ray.stages.sketch import _k_smallest_distinct

        hs = md5_u64(vals)
        whole = _k_smallest_distinct(hs, k)
        parts = [hs[i::nparts] for i in range(nparts)]
        pooled = np.concatenate(
            [_k_smallest_distinct(p, k) for p in parts]) if vals else hs
        merged = _k_smallest_distinct(pooled, k)
        assert np.array_equal(whole, merged)

    @given(st.lists(st.integers(min_value=0, max_value=40),
                    min_size=1, max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_exact_below_k_and_estimator_bounds(self, vals):
        from pdf_parser_ray.functions.hashing import md5_u64
        from pdf_parser_ray.stages.sketch import (_k_smallest_distinct,
                                                  kmv_estimate)

        k = 64  # distinct(vals) <= 41 < k → exact path always
        kept = _k_smallest_distinct(md5_u64(vals), k)
        assert kmv_estimate(kept, k) == len(set(vals))

    @given(st.lists(st.one_of(st.integers(min_value=-10**9, max_value=10**9),
                              st.text(max_size=12)),
                    min_size=0, max_size=50))
    @settings(max_examples=40, deadline=None)
    def test_md5_u64_equals_hex_prefix_rule(self, vals):
        """First-8-digest-bytes big-endian == int(hexdigest[:16], 16) — the
        exact value CAST('0x'||substr(md5(x),1,16) AS UBIGINT) yields."""
        import hashlib

        from pdf_parser_ray.functions.hashing import md5_u64

        got = md5_u64(vals)
        want = [int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
                for v in vals]
        assert [int(x) for x in got] == want


class TestQuantileRuleProperties:
    @given(st.lists(st.integers(min_value=-1000, max_value=1000),
                    min_size=1, max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_histogram_lookup_equals_sorted_index(self, vals):
        """The (values, cumsum, searchsorted) discrete-quantile lookup used
        by token_percentiles / events_value_percentiles == direct
        sorted-list indexing at ceil(q·n)-1 (DuckDB quantile_disc)."""
        import math

        arr = np.asarray(sorted(vals))
        uniq, counts = np.unique(arr, return_counts=True)
        cum = counts.cumsum()
        n = len(arr)
        for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
            idx = min(max(math.ceil(q * n) - 1, 0), n - 1)
            via_hist = int(uniq[np.searchsorted(cum, idx + 1)])
            assert via_hist == int(arr[idx])


class TestFinalSessionSketchProperties:
    """Pure-kernel properties of the round-5 final-session operators —
    no Ray session needed (the Dataset-level partition-invariance tests
    live in test_sketch / test_cdc)."""

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=0, max_size=300),
           st.integers(min_value=2, max_value=8))
    @settings(max_examples=60, deadline=None)
    def test_hll_partial_merge_invariant(self, raw, nparts):
        """max-merge of per-part register vectors == the whole-input
        vector — the property that makes HLL exact under ANY merge tree
        (idempotent, commutative, associative)."""
        from pdf_parser_ray.stages.sketch import _hll_partial

        hs = np.array(raw, dtype=np.uint64)
        whole = _hll_partial(hs, 8)
        merged = np.zeros(256, dtype=np.int64)
        for i in range(nparts):
            np.maximum(merged, _hll_partial(hs[i::nparts], 8), out=merged)
        assert np.array_equal(whole, merged)

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=1, max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_hll_rank_rule_matches_bit_length(self, raw):
        """rank = 57 - bit_length(low 56 bits) (0 suffix → 57), the exact
        value the SQL length(bin(sfx)) replay computes."""
        from pdf_parser_ray.stages.sketch import _hll_partial

        hs = np.array(raw, dtype=np.uint64)
        regs = _hll_partial(hs, 8)
        want = np.zeros(256, dtype=np.int64)
        for h in raw:
            r, sfx = h >> 56, h & ((1 << 56) - 1)
            want[r] = max(want[r], 57 - sfx.bit_length() if sfx else 57)
        assert np.array_equal(regs, want)

    @given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=3),
                    min_size=0, max_size=400),
           st.integers(min_value=2, max_value=6),
           st.integers(min_value=2, max_value=5))
    @settings(max_examples=60, deadline=None)
    def test_pigeonhole_prefilter_superset(self, toks, nparts, den):
        """The heavy-hitters guarantee: every token with global count*den
        >= N is locally heavy in at least one slice — the candidate union
        can never lose a true heavy hitter."""
        import collections

        n = len(toks)
        globally_heavy = {t for t, c in collections.Counter(toks).items()
                          if c * den >= n}
        cands = set()
        for i in range(nparts):
            part = toks[i::nparts]
            cnt = collections.Counter(part)
            nb = len(part)
            cands.update(t for t, c in cnt.items() if c * den >= nb)
        assert globally_heavy <= cands

    @given(st.text(alphabet=string.ascii_lowercase + " 0123456789",
                   max_size=400))
    @settings(max_examples=80, deadline=None)
    def test_cdc_chunks_partition_text_exactly(self, text):
        from pdf_parser_ray.stages.cdc import cdc_chunk_rows

        rows = cdc_chunk_rows(text)
        assert "".join(c for _, _, c in rows) == text
        if text:
            assert all(n > 0 for _, n, _ in rows)
        starts = [s for s, _, _ in rows]
        assert starts == sorted(starts) and starts[0] == 0

    @given(st.text(alphabet=string.ascii_lowercase + " ",
                   min_size=50, max_size=300),
           st.text(alphabet=string.ascii_lowercase, min_size=1,
                   max_size=20))
    @settings(max_examples=60, deadline=None)
    def test_cdc_suffix_chunks_realign_after_prefix_edit(self, body, edit):
        """Content-defined property: past the window span, the chunk
        sequences of `body` and `edit+body` become identical suffixes."""
        from pdf_parser_ray.stages.cdc import CDC_WINDOW, cdc_chunk_rows

        a = [c for _, _, c in cdc_chunk_rows(body)]
        b = [c for _, _, c in cdc_chunk_rows(edit + body)]
        # compare chunk lists from the first boundary beyond the edit's
        # influence: all chunks fully inside body[window:] must realign
        tail_a, tail_b = [], []
        pos = 0
        for c in a:
            if pos >= CDC_WINDOW:
                tail_a.append(c)
            pos += len(c)
        pos = 0
        for c in b:
            if pos >= len(edit) + CDC_WINDOW:
                tail_b.append(c)
            pos += len(c)
        # the two tails agree on their common suffix
        k = min(len(tail_a), len(tail_b))
        if k:
            assert tail_a[-k:] == tail_b[-k:]
