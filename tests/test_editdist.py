"""Edit-distance near-dup family (PassJoin): kernel exactness vs DuckDB's
levenshtein(), banded-verify equivalence, pigeonhole completeness of the
candidate buckets, and the edges pipeline end to end on planted pairs
(both verify tiers)."""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest

from pdf_parser_ray.functions.editdist import (_segments, levenshtein,
                                               levenshtein_leq,
                                               passjoin_buckets,
                                               passjoin_keys)


def _cobucketed(a: str, b: str, d: int) -> bool:
    """The pipeline's actual pairing rule: index of one side meets probe
    of the other in some bucket."""
    ia, pa_ = passjoin_keys(a, d)
    ib, pb = passjoin_keys(b, d)
    return bool((ia & pb) or (ib & pa_))

ALPHA = "abcx "


def _rand_strings(rng: random.Random, n: int, max_len: int = 12) -> list[str]:
    return ["".join(rng.choice(ALPHA) for _ in range(rng.randrange(max_len + 1)))
            for _ in range(n)]


class TestLevenshtein:
    def test_known_values(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "") == 0
        assert levenshtein("abc", "") == 3
        assert levenshtein("", "xy") == 2
        assert levenshtein("same", "same") == 0
        assert levenshtein("ab", "ba") == 2

    def test_matches_duckdb(self):
        import duckdb

        rng = random.Random(7)
        pairs = [(a, b) for a, b in zip(_rand_strings(rng, 200),
                                        _rand_strings(rng, 200))]
        got = [levenshtein(a, b) for a, b in pairs]
        want = [duckdb.sql("select levenshtein(?, ?)", params=[a, b]).fetchone()[0]
                for a, b in pairs]
        assert got == want

    def test_banded_equals_full(self):
        rng = random.Random(11)
        for a, b in zip(_rand_strings(rng, 300), _rand_strings(rng, 300)):
            full = levenshtein(a, b)
            for d in range(4):
                assert levenshtein_leq(a, b, d) == (full <= d), (a, b, d)


class TestPassJoinBuckets:
    def test_segments_cover_exactly(self):
        for l in range(1, 30):
            for k in range(1, min(l, 6) + 1):
                segs = _segments(l, k)
                assert len(segs) == k
                pos = 0
                for p, ln in segs:
                    assert p == pos and ln >= 1
                    pos += ln
                assert pos == l

    @pytest.mark.parametrize("d", [1, 2, 3])
    def test_completeness_random_pool(self, d):
        """Any pair within edit distance d MUST share a bucket key — the
        property the DuckDB brute-force oracle checks at corpus scale."""
        rng = random.Random(100 + d)
        pool = _rand_strings(rng, 60, max_len=10)
        for a, b in itertools.combinations(pool, 2):
            if levenshtein(a, b) <= d:
                assert _cobucketed(a, b, d), (a, b, d)

    @pytest.mark.parametrize("d", [1, 2])
    def test_completeness_planted_edits(self, d):
        """Strings derived by exactly ≤d random edits always co-bucket."""
        rng = random.Random(200 + d)
        for _ in range(150):
            base = "".join(rng.choice(ALPHA) for _ in range(rng.randrange(2, 14)))
            s = list(base)
            for _ in range(rng.randrange(d + 1)):
                op = rng.choice(("sub", "ins", "del"))
                if op == "sub" and s:
                    s[rng.randrange(len(s))] = rng.choice(ALPHA)
                elif op == "ins":
                    s.insert(rng.randrange(len(s) + 1), rng.choice(ALPHA))
                elif op == "del" and s:
                    del s[rng.randrange(len(s))]
            other = "".join(s)
            assert _cobucketed(base, other, d), (base, other, d)

    def test_tiny_strings_cobucket(self):
        # len <= 2d strings must meet in the tiny bucket (both roles)
        assert _cobucketed("", "ab", 2)
        assert _cobucketed("a", "b", 1)

    def test_union_helper_is_superset(self):
        idx, probe = passjoin_keys("hello world", 2)
        assert passjoin_buckets("hello world", 2) == idx | probe


class TestVectorizedDP:
    @pytest.mark.parametrize("d", [0, 1, 2, 3])
    def test_vec_equals_scalar(self, d):
        import numpy as np

        from pdf_parser_ray.functions.editdist import (char_matrix,
                                                       levenshtein_leq_pairs)

        rng = random.Random(31 + d)
        a = _rand_strings(rng, 400, max_len=14)
        b = _rand_strings(rng, 400, max_len=14)
        # salt in edge shapes: empties, equal pairs, off-by-length pairs
        a += ["", "", "same", "abc"]
        b += ["", "xy", "same", "abcde"]
        A, la = char_matrix(a)
        B, lb = char_matrix(b)
        got = levenshtein_leq_pairs(A, la, B, lb, d)
        want = np.array([levenshtein(x, y) <= d for x, y in zip(a, b)])
        assert (got == want).all()


def _edges_df(rows, **kwargs) -> pd.DataFrame:
    import ray.data

    from pdf_parser_ray.stages.dedup import editdist_dedup_edges

    ds = ray.data.from_items(rows)
    df = editdist_dedup_edges(ds, key_col="key", **kwargs).to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_id": [], "dup_of": []}).astype("int64")
    return df.sort_values(["doc_id", "dup_of"]).reset_index(drop=True)


def _brute(rows, d) -> pd.DataFrame:
    out = []
    for a, b in itertools.combinations(rows, 2):
        if levenshtein(a["key"], b["key"]) <= d:
            lo, hi = sorted((a["doc_id"], b["doc_id"]))
            out.append({"doc_id": lo, "dup_of": hi})
    return (pd.DataFrame(out, columns=["doc_id", "dup_of"])
            .astype("int64").sort_values(["doc_id", "dup_of"])
            .reset_index(drop=True))


class TestEditDistEdges:
    def test_planted_pairs_both_tiers(self, ray_session):
        rows = [
            {"doc_id": 1, "key": "hello world inc"},
            {"doc_id": 2, "key": "helo world inc"},    # 1 del
            {"doc_id": 3, "key": "hello world incx"},  # 1 ins
            {"doc_id": 4, "key": "totally different"},
            {"doc_id": 5, "key": "hello w0rld ink"},   # 2 subs
            {"doc_id": 6, "key": "a"},                 # tiny
            {"doc_id": 7, "key": "ab"},                # tiny, ed(6,7)=1
        ]
        want = _brute(rows, 2)
        assert {(1, 2), (1, 3), (1, 5), (6, 7)} <= set(
            map(tuple, want.to_numpy()))
        got_b = _edges_df(rows, max_dist=2)
        pd.testing.assert_frame_equal(got_b, want, check_dtype=False)
        # forced hash-join tier (broadcast_limit=0)
        got_j = _edges_df(rows, max_dist=2, broadcast_limit=0)
        pd.testing.assert_frame_equal(got_j, want, check_dtype=False)

    def test_random_pool_matches_bruteforce(self, ray_session):
        rng = random.Random(42)
        pool = list(dict.fromkeys(_rand_strings(rng, 40, max_len=9)))
        rows = [{"doc_id": i, "key": s} for i, s in enumerate(pool)]
        for d in (1, 2):
            got = _edges_df(rows, max_dist=d)
            want = _brute(rows, d)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_no_pairs(self, ray_session):
        rows = [{"doc_id": 1, "key": "aaaaaaaaaa"},
                {"doc_id": 2, "key": "bbbbbbbbbb"}]
        assert len(_edges_df(rows, max_dist=2)) == 0

    def test_null_keys_treated_empty(self, ray_session):
        rows = [{"doc_id": 1, "key": None}, {"doc_id": 2, "key": ""},
                {"doc_id": 3, "key": "x"}]
        got = _edges_df(rows, max_dist=1)
        # None ≡ "" : ed("","")=0, ed("","x")=1 → all three pair up
        assert set(map(tuple, got.to_numpy())) == {(1, 2), (1, 3), (2, 3)}
