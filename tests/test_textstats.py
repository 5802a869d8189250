"""Text-analysis kernels: token counts, quality, language ID, fingerprints."""

import numpy as np
import pandas as pd

from pdf_parser_ray.functions import textstats


class TestCounts:
    def test_token_count(self):
        s = pd.Series(["one two three", "", None, "  padded  words "])
        assert textstats.token_count(s).tolist() == [3, 0, 0, 2]

    def test_alpha_punct(self):
        s = pd.Series(["ab, cd!"])
        assert textstats.alpha_count(s).tolist() == [4]
        assert textstats.punct_count(s).tolist() == [2]

    def test_substring_occurrences_replace_semantics(self):
        # must match the SQL replace-length trick exactly, incl. overlap
        s = pd.Series([" the the b "])
        assert textstats.substring_occurrences(s, " the ").tolist() == [1]


class TestQuality:
    def test_frame(self):
        q = textstats.quality_score(pd.Series([
            "The quick brown fox jumps over the lazy dog again and again today.",
            "!!! ??? ...",
        ]))
        assert bool(q["quality_keep"][0]) is True
        assert bool(q["quality_keep"][1]) is False
        assert q["n_tokens"][0] == 13


class TestLangId:
    def test_english(self):
        s = pd.Series(["the cat and the dog of a house is here"])
        assert textstats.detect_language(s).tolist() == ["en"]

    def test_unknown(self):
        s = pd.Series(["zzz qqq www"])
        assert textstats.detect_language(s).tolist() == ["unknown"]

    def test_tie_alphabetical(self):
        # 'la' appears in both es and fr lists → tie broken alphabetically (es)
        s = pd.Series(["la la"])
        assert textstats.detect_language(s).tolist() == ["es"]


class TestFingerprint:
    def test_deterministic(self):
        t = "some document text for fingerprinting purposes with enough length"
        assert textstats.doc_fingerprint_hex(t) == textstats.doc_fingerprint_hex(t)

    def test_differs(self):
        a = textstats.doc_fingerprint_hex("totally different content one here")
        b = textstats.doc_fingerprint_hex("another unrelated document body text")
        assert a != b

    def test_near_dup_overlap(self):
        base = " ".join(f"word{i}" for i in range(200))
        variant = base + " tail"
        fa = set(textstats.winnow_fingerprint(base).tolist())
        fb = set(textstats.winnow_fingerprint(variant).tolist())
        overlap = len(fa & fb) / len(fa | fb)
        assert overlap > 0.8  # winnowing keeps most shared k-grams

    def test_empty(self):
        assert textstats.winnow_fingerprint("").size == 0
        assert isinstance(textstats.doc_fingerprint_hex(""), str)


class TestEncodingStats:
    def test_clean_and_damaged(self):
        s = pd.Series([
            "hello world 42",          # clean: 2 ws, 2 digits
            "cafÃ© bad",     # Latin-1 mojibake marker Ã
            "quote â€™s",  # â€ marker (cp1252 curly quote)
            "raw\x01control",          # bare control char
            "lost �� data",  # replacement chars
            None,                      # null → all zeros, wellformed
        ])
        df = textstats.encoding_stats(s)
        assert df["n_ws"].tolist() == [2, 1, 1, 0, 2, 0]
        assert df["n_digits"].tolist() == [2, 0, 0, 0, 0, 0]
        assert df["n_ctl"].tolist() == [0, 0, 0, 1, 0, 0]
        assert df["n_replacement"].tolist() == [0, 0, 0, 0, 2, 0]
        assert df["n_mojibake"].tolist() == [0, 1, 1, 0, 0, 0]
        assert df["wellformed"].tolist() == [True, False, False, False,
                                             False, True]

    def test_whitespace_controls_not_double_counted(self):
        # \t\n\r\f\v are whitespace, NOT control damage
        df = textstats.encoding_stats(pd.Series(["a\tb\nc\rd\fe\x0bf"]))
        assert df["n_ws"].tolist() == [5]
        assert df["n_ctl"].tolist() == [0]
        assert df["wellformed"].tolist() == [True]

    def test_sql_replay_bit_exact(self):
        import duckdb

        s = pd.Series([
            "hello world 42", "cafÃ©", "x â€œy",
            "raw\x01\x7fctl", "�", None, "", "  \t\n  ",
            "1234567890" * 3, "ÃÃÃ",
        ])
        got = textstats.encoding_stats(s)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"text": s}))
        want = con.sql(
            "SELECT " + textstats.encoding_stats_sql() + " FROM t").df()
        for col in got.columns:
            assert got[col].tolist() == want[col].tolist(), col


class TestFixMojibake:
    def test_repairs_planted(self):
        s = pd.Series([
            "caf\u00c3\u00a9 \u00e2\u20ac\u201d nice",
            "plain ascii",
            None,
        ])
        df = textstats.fix_mojibake(s)
        assert df["fixed_text"].tolist() == [
            "caf\u00e9 \u2014 nice", "plain ascii", ""]
        assert df["changed"].tolist() == [True, False, False]

    def test_every_table_row_repairs(self):
        for bad, good in textstats.MOJIBAKE_REPAIRS:
            out = textstats.fix_mojibake(pd.Series([f"x{bad}y"]))
            assert out["fixed_text"].tolist() == [f"x{good}y"], (bad, good)
            assert out["changed"].tolist() == [True]

    def test_sql_replay_bit_exact(self):
        import duckdb

        s = pd.Series([
            "caf\u00c3\u00a9 \u00e2\u20ac\u0153q\u00e2\u20ac\u009d",
            "\u00c3\u00bcber \u00c2\u00ab x \u00c2\u00bb",
            "", None, "already fine \u2014 dash",
        ])
        got = textstats.fix_mojibake(s)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"text": s}))
        want = con.sql(
            "SELECT " + textstats.fix_mojibake_sql() + " FROM t").df()
        assert got["fixed_text"].tolist() == want["fixed_text"].tolist()
        assert got["changed"].tolist() == want["changed"].tolist()
