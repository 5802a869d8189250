"""Exact-substring duplicate-span detection (stages/dedup.py:duplicate_spans):
brute-force equivalence on both execution paths, island-merge semantics,
edge cases, and the md5 window-hash helper."""

import collections
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from pdf_parser_ray.functions.minhash import token_window_hashes
from pdf_parser_ray.stages.dedup import _mark_spans, duplicate_spans


def brute_spans(docs, width, min_count=2):
    """Reference implementation: literal window-string counting + merge."""
    cnt = collections.Counter()
    toks_all = [d.split() for d in docs]
    for toks in toks_all:
        for i in range(len(toks) - width + 1):
            cnt[" ".join(toks[i:i + width])] += 1
    spans = []
    for did, toks in enumerate(toks_all):
        pos = [i for i in range(len(toks) - width + 1)
               if cnt[" ".join(toks[i:i + width])] >= min_count]
        if not pos:
            continue
        start, prev, nw = pos[0], pos[0], 1
        for p in pos[1:]:
            if p - prev > width:
                spans.append((did, start, prev + width - 1,
                              prev + width - start, nw))
                start, nw = p, 0
            prev = p
            nw += 1
        spans.append((did, start, prev + width - 1, prev + width - start, nw))
    return sorted(spans)


def _corpus(seed=0, n=40, width=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 25))))
            for _ in range(n)]
    phrase = "alpha beta gamma delta epsilon"
    docs[3] += " " + phrase
    docs[17] = phrase + " " + docs[17]
    docs[25] = "x y z q r x y z q r"  # within-doc repeat counts too
    return docs


class TestWindowHashes:
    def test_md5_prefix_semantics(self):
        h = token_window_hashes("a b  c d", 2)
        assert len(h) == 3
        assert h[0] == int(hashlib.md5(b"a b").hexdigest()[:16], 16)
        assert h[2] == int(hashlib.md5(b"c d").hexdigest()[:16], 16)

    def test_short_and_empty(self):
        assert len(token_window_hashes("a b", 3)) == 0
        assert len(token_window_hashes("", 2)) == 0
        assert len(token_window_hashes(None, 2)) == 0

    def test_case_sensitive(self):
        assert token_window_hashes("A b", 2)[0] != token_window_hashes("a b", 2)[0]


class TestMarkSpans:
    def test_merge_overlapping_and_adjacent(self):
        dup = np.array([5, 7], dtype=np.uint64)
        hs = np.array([5, 1, 2, 7, 3], dtype=np.uint64)  # hits at pos 0, 3
        # width 3: intervals [0,2] and [3,5] touch (gap 3 ≤ width) → merge
        assert _mark_spans(hs, np.sort(dup), 3) == [(0, 5, 2)]

    def test_split_on_large_gap(self):
        dup = np.array([9], dtype=np.uint64)
        hs = np.array([9, 1, 2, 3, 4, 9], dtype=np.uint64)  # pos 0 and 5
        # width 3: gap 5 > 3 → two spans
        assert _mark_spans(hs, dup, 3) == [(0, 2, 1), (5, 7, 1)]

    def test_no_hits(self):
        assert _mark_spans(np.array([1], dtype=np.uint64),
                           np.array([2], dtype=np.uint64), 3) == []
        assert _mark_spans(np.zeros(0, dtype=np.uint64),
                           np.array([2], dtype=np.uint64), 3) == []


def _run(docs, width, ray_session, **kw):
    import ray.data

    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    ds = ray.data.from_arrow(tbl).repartition(5)
    result = duplicate_spans(ds, width=width, **kw)
    cols = ["doc_id", "span_start", "span_end", "span_tokens", "n_dup_windows"]
    assert result.schema().names == cols  # schema survives even when empty
    out = result.to_pandas()
    if len(out) == 0:
        # Ray's to_pandas drops columns on an all-empty dataset (generic
        # Ray Data behavior, verified independent of this operator)
        return []
    assert all(str(out[c].dtype) == "int64" for c in cols)
    return sorted(map(tuple, out[cols].itertuples(index=False)))


class TestDuplicateSpans:
    def test_matches_bruteforce_broadcast_path(self, ray_session):
        docs = _corpus()
        assert _run(docs, 3, ray_session) == brute_spans(docs, 3)

    def test_matches_bruteforce_semijoin_path(self, ray_session):
        """broadcast_limit=0 forces the distributed semi-join fallback."""
        docs = _corpus(seed=1)
        assert _run(docs, 3, ray_session, broadcast_limit=0) == brute_spans(docs, 3)

    def test_within_doc_repeat_detected(self, ray_session):
        docs = ["p q r s p q r s", "completely different words here"]
        got = _run(docs, 4, ray_session)
        # windows 0 (p q r s) and 4 (p q r s) duplicate; gap 4 ≤ width → merged
        assert got == [(0, 0, 7, 8, 2)]

    def test_no_duplicates_empty_result(self, ray_session):
        docs = ["a b c d e", "f g h i j"]
        assert _run(docs, 3, ray_session) == []

    def test_all_docs_too_short(self, ray_session):
        docs = ["a b", "a b", ""]
        assert _run(docs, 5, ray_session) == []

    def test_min_count_threshold(self, ray_session):
        docs = ["s t u v", "s t u v", "s t u v"]
        got3 = _run(docs, 4, ray_session, min_count=3)
        got4 = _run(docs, 4, ray_session, min_count=4)
        assert got3 == [(0, 0, 3, 4, 1), (1, 0, 3, 4, 1), (2, 0, 3, 4, 1)]
        assert got4 == []

    def test_string_ids(self, ray_session):
        import ray.data

        tbl = pa.table({"doc_id": ["d1", "d2"],
                        "text": ["m n o p", "m n o p"]})
        out = duplicate_spans(ray.data.from_arrow(tbl), width=4).to_pandas()
        assert sorted(out["doc_id"]) == ["d1", "d2"]
        assert (out["span_start"] == 0).all()


def brute_strip(docs, width, min_count=2):
    spans = brute_spans(docs, width, min_count)
    out = []
    for did, d in enumerate(docs):
        toks = d.split()
        cover = [False] * len(toks)
        for sd, s, e, _t, _n in spans:
            if sd == did:
                for i in range(s, e + 1):
                    cover[i] = True
        kept = [t for t, c in zip(toks, cover) if not c]
        out.append((did, " ".join(kept), len(kept), len(toks) - len(kept)))
    return out


class TestStripDuplicateSpans:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.dedup import strip_duplicate_spans

        docs = _corpus(seed=2)
        tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                        "text": pa.array(docs)})
        out = strip_duplicate_spans(
            ray.data.from_arrow(tbl).repartition(4), width=3).to_pandas()
        got = sorted(map(tuple, out[["doc_id", "clean_text", "n_tokens_kept",
                                     "n_tokens_removed"]].itertuples(index=False)))
        assert got == brute_strip(docs, 3)

    def test_no_dups_identity_modulo_whitespace(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.dedup import strip_duplicate_spans

        tbl = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                        "text": ["a  b\tc\nd e"]})
        out = strip_duplicate_spans(ray.data.from_arrow(tbl), width=3).to_pandas()
        assert out["clean_text"].tolist() == ["a b c d e"]
        assert out["n_tokens_removed"].tolist() == [0]

    def test_full_doc_stripped(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.dedup import strip_duplicate_spans

        tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                        "text": ["same exact phrase here", "same exact phrase here"]})
        out = strip_duplicate_spans(ray.data.from_arrow(tbl), width=4).to_pandas()
        assert out["clean_text"].tolist() == ["", ""]
        assert out["n_tokens_removed"].tolist() == [4, 4]

    def _three_paths(self, ray_session, docs, width, span_limit, ids=None):
        """Run strip on the broadcast path and both above-gate tiers and
        assert identical output (the kernels are path-independent)."""
        import ray.data

        from pdf_parser_ray.stages.dedup import strip_duplicate_spans

        tbl = pa.table({"doc_id": pa.array(ids or list(range(len(docs))),
                                           type=pa.int64()),
                        "text": pa.array(docs)})

        def run(limit):
            return strip_duplicate_spans(
                ray.data.from_arrow(tbl), width=width,
                broadcast_limit=limit).to_pandas().sort_values(
                "doc_id", ignore_index=True)

        base = run(2_000_000)              # broadcast path
        tier1 = run(span_limit)            # spans broadcast, hashes not
        tier2 = run(0)                     # full union exchange
        for other in (tier1, tier2):
            assert base.to_dict("list") == other.to_dict("list")
        return base

    def test_above_gate_paths_match_broadcast(self, ray_session):
        docs = _corpus(seed=5)
        self._three_paths(ray_session, docs, 3, span_limit=10_000)

    def test_above_gate_tier1_exercised(self, ray_session):
        # 7 dup window hashes > limit=2 >= 2 span rows → tier 1 really runs
        docs = ["p q r s t u v w x y", "p q r s t u v w x y", "n o"]
        base = self._three_paths(ray_session, docs, 4, span_limit=2)
        assert base["clean_text"].tolist() == ["", "", "n o"]

    def test_above_gate_string_ids(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.dedup import strip_duplicate_spans

        tbl = pa.table({"doc_id": pa.array(["b", "a"]),
                        "text": ["same exact phrase here maybe",
                                 "same exact phrase here never"]})
        out = {lim: strip_duplicate_spans(
                   ray.data.from_arrow(tbl), width=4,
                   broadcast_limit=lim).to_pandas().sort_values(
                   "doc_id", ignore_index=True).to_dict("list")
               for lim in (10**6, 0)}
        assert out[10**6] == out[0]
        assert out[0]["n_tokens_removed"] == [4, 4]


class TestContamination:
    def _ds(self, docs, ids=None):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids or list(range(len(docs))), type=pa.int64()),
            "text": pa.array(docs)}))

    def test_planted_overlap(self, ray_session):
        from pdf_parser_ray.stages.dedup import contamination

        test = self._ds(["the secret benchmark answer is forty two exactly"])
        train = self._ds([
            "clean document with no overlap whatsoever in it",
            "leaked: the secret benchmark answer is forty two exactly here",
            "short",
        ], ids=[10, 11, 12])
        out = contamination(train, test, width=4).to_pandas().set_index("doc_id")
        assert not out.loc[10, "contaminated"]
        assert out.loc[11, "contaminated"]
        # test doc has 5 windows of width 4; the leak embeds all of them
        assert out.loc[11, "n_contaminated"] == 5
        assert out.loc[12, "n_windows"] == 0
        assert not out.loc[12, "contaminated"]

    def test_empty_test_set(self, ray_session):
        from pdf_parser_ray.stages.dedup import contamination

        test = self._ds(["tiny"])  # < width → zero windows
        train = self._ds(["a b c d e f"])
        out = contamination(train, test, width=4).to_pandas()
        assert out["n_contaminated"].tolist() == [0]

    def test_above_gate_matches_broadcast(self, ray_session):
        from pdf_parser_ray.stages.dedup import contamination

        test = self._ds(["the secret benchmark answer is forty two exactly",
                         "another held out prompt with rare tokens inside"])
        train = self._ds([
            "clean document with no overlap whatsoever in it",
            "leaked: the secret benchmark answer is forty two exactly here",
            "short",
            "another held out prompt with rare tokens inside twice over "
            "another held out prompt with rare tokens inside",
        ], ids=[10, 11, 12, 13])

        def run(limit):
            return contamination(
                train, test, width=4,
                broadcast_limit=limit).to_pandas().sort_values(
                "doc_id", ignore_index=True)

        base, gated = run(2_000_000), run(0)
        assert base.to_dict("list") == gated.to_dict("list")
        assert gated.set_index("doc_id").loc[11, "n_contaminated"] == 5

    def test_above_gate_string_ids(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.dedup import contamination

        test = self._ds(["u v w x y z"])
        train = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(["d2", "d1"]),
            "text": ["u v w x y z plus trailing", "nothing shared at all ok"]}))
        base = contamination(train, test, width=4,
                             broadcast_limit=10**6).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        gated = contamination(train, test, width=4,
                              broadcast_limit=0).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        assert base.to_dict("list") == gated.to_dict("list")

    def test_drop_contaminated_above_gate(self, ray_session):
        from pdf_parser_ray.stages.dedup import drop_contaminated

        test = self._ds(["the secret benchmark answer is forty two exactly"])
        train = self._ds([
            "clean document with no overlap whatsoever in it",
            "leaked: the secret benchmark answer is forty two exactly here",
            "short",
        ], ids=[10, 11, 12])
        base = drop_contaminated(train, test, width=4,
                                 broadcast_limit=10**6).to_pandas()
        gated = drop_contaminated(train, test, width=4,
                                  broadcast_limit=0).to_pandas()
        for out in (base, gated):
            assert sorted(out["doc_id"].tolist()) == [10, 12]
        assert sorted(base.columns) == sorted(gated.columns)
