"""Distributed BM25 scoring (stages/textstage.py:bm25_score): hand-computed
reference values, idf monotonicity, and edge cases."""

import math

import pyarrow as pa
import pytest


def _score(docs, terms, ray_session, k1=1.2, b=0.75, ids=None):
    import ray.data

    from pdf_parser_ray.stages.textstage import bm25_score

    tbl = pa.table({"doc_id": pa.array(ids or list(range(len(docs))),
                                       type=pa.int64()),
                    "text": pa.array(docs)})
    out = bm25_score(ray.data.from_arrow(tbl).repartition(3),
                     terms=terms, k1=k1, b=b).to_pandas()
    return out.set_index("doc_id").sort_index()


def brute_bm25(docs, terms, k1=1.2, b=0.75):
    toks_all = [d.lower().split() for d in docs]
    n = len(docs)
    avgdl = sum(map(len, toks_all)) / n
    out = []
    for toks in toks_all:
        dl = len(toks)
        s = 0.0
        for t in terms:
            df = sum(1 for tk in toks_all if t in tk)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            tf = toks.count(t)
            s += idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
        out.append(int(math.copysign(math.floor(abs(s) * 1000 + 0.5), s)))
    return out


DOCS = [
    "hash join beats sort merge join",
    "vector scan over the hash index",
    "nothing relevant in this one at all",
    "hash hash hash hash",
]


class TestBm25:
    def test_matches_bruteforce(self, ray_session):
        got = _score(DOCS, ["hash", "vector"], ray_session)
        assert got["score_milli"].tolist() == brute_bm25(DOCS, ["hash", "vector"])
        assert got["dl"].tolist() == [6, 6, 7, 4]

    def test_zero_when_no_terms_present(self, ray_session):
        got = _score(DOCS, ["hash", "vector"], ray_session)
        assert got.loc[2, "score_milli"] == 0

    def test_tf_saturation(self, ray_session):
        """BM25 saturates: 4x repetition scores < 4x a single occurrence."""
        got = _score(DOCS, ["hash"], ray_session)
        single, spam = got.loc[0, "score_milli"], got.loc[3, "score_milli"]
        assert spam > single          # more tf still scores higher...
        assert spam < 4 * single      # ...but sub-linearly

    def test_rare_term_outweighs_common(self, ray_session):
        docs = ["rare common", "common x", "common y", "common z"]
        got = _score(docs, ["rare", "common"], ray_session)
        # doc 0 has both; its rare-term contribution dominates:
        # strip the common contribution by comparing to a common-only doc
        assert got.loc[0, "score_milli"] > 2 * got.loc[1, "score_milli"]

    def test_case_folded(self, ray_session):
        got = _score(["HASH Join", "hash join"], ["hash"], ray_session)
        assert got.loc[0, "score_milli"] == got.loc[1, "score_milli"] > 0


class TestPackSequences:
    def test_matches_bruteforce_prefix_sum(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.stages.textstage import pack_sequences

        rng = np.random.default_rng(0)
        docs, ids = [], []
        for i in range(200):
            n = int(rng.integers(0, 40))
            docs.append(" ".join(f"t{j}" for j in range(n)))
            ids.append(i * 7)  # sparse ids across buckets
        tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                        "text": pa.array(docs)})
        L = 16
        out = pack_sequences(ray.data.from_arrow(tbl).repartition(7),
                             seq_len=L, bucket_size=64).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        off = 0
        want = {}
        for ix in np.argsort(ids):
            n = len(docs[ix].split())
            first = off // L
            last = (off + n - 1) // L if n > 0 else first
            want[ids[ix]] = (n, off, first, last)
            off += n
        for _, r in out.iterrows():
            got = (r["n_tokens"], r["token_offset"], r["first_seq"],
                   r["last_seq"])
            assert got == want[r["doc_id"]]
        assert out["token_offset"].is_monotonic_increasing
        assert len(out) == 200

    def test_string_ids_rejected(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.textstage import pack_sequences

        tbl = pa.table({"doc_id": ["a"], "text": ["x y"]})
        with pytest.raises(TypeError, match="integer"):
            pack_sequences(ray.data.from_arrow(tbl), seq_len=8)


class TestTopTerms:
    def test_counts_and_tie_break(self, ray_session):
        import ray.data

        from pdf_parser_ray.stages.textstage import top_terms

        docs = ["b a a", "c b A", "d"]  # a:3 (case-folded), b:2, c:1, d:1
        tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                        "text": pa.array(docs)})
        out = top_terms(ray.data.from_arrow(tbl).repartition(2),
                        k=3).to_pandas()
        got = sorted(map(tuple, out[["term", "n"]].itertuples(index=False)))
        # k=3 boundary tie between c and d (both 1) → token asc keeps 'c'
        assert got == [("a", 3), ("b", 2), ("c", 1)]


# ---------------------------------------------------------------------------
# inverted_index (posting-list build — stages/textstage.py)
# ---------------------------------------------------------------------------


def test_inverted_index_brute(ray_session):
    import collections

    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.textstage import inverted_index

    docs = [(1, "The cat sat"), (2, "the cat ran"), (3, "THE dog"),
            (4, ""), (5, "cat cat cat")]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}))
    out = {r["term"]: (r["df"], r["tf_total"], r["postings"])
           for r in inverted_index(ds, min_df=2).take_all()}
    # brute force
    dt = collections.defaultdict(dict)
    for did, t in docs:
        for w in t.lower().split():
            dt[w][did] = dt[w].get(did, 0) + 1
    expect = {w: (len(p), sum(p.values()),
                  ",".join(f"{d}:{c}" for d, c in sorted(p.items())))
              for w, p in dt.items() if len(p) >= 2}
    assert out == expect
    assert out["the"] == (3, 3, "1:1,2:1,3:1")   # case folded
    assert out["cat"] == (3, 5, "1:1,2:1,5:3")   # within-doc tf kept
