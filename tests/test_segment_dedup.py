"""Cross-document common-segment removal (stages/dedup.py:
strip_common_segments — the CCNet paragraph-dedup analog): brute-force
equivalence on both execution paths, df-vs-occurrence semantics, tail
segments, and the segment-hash helper."""

import collections
import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data

from pdf_parser_ray.functions.minhash import segment_hashes
from pdf_parser_ray.stages.dedup import strip_common_segments

W = 3


def brute(docs, width=W, max_df=1):
    """Reference implementation: literal segment-string doc-frequency."""
    segs_of = {}
    for did, t in docs:
        toks = t.split()
        n = math.ceil(len(toks) / width)
        segs_of[did] = [" ".join(toks[i * width:(i + 1) * width])
                        for i in range(n)]
    df = collections.Counter()
    for did, segs in segs_of.items():
        for s in set(segs):
            df[s] += 1
    dup = {s for s, c in df.items() if c > max_df}
    rows = []
    for did, t in docs:
        kept = [s for s in segs_of[did] if s not in dup]
        rows.append((did, " ".join(kept), len(kept),
                     len(segs_of[did]) - len(kept)))
    return sorted(rows)


def run(docs, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}))
    out = strip_common_segments(ds, width=kw.pop("width", W), **kw)
    return sorted(
        (r["doc_id"], r["clean_text"], r["n_seg_kept"], r["n_seg_removed"])
        for r in out.take_all())


DOCS = [
    (0, "a b c a b c x y z"),          # 3 segments, 'a b c' twice in-doc
    (1, "a b c q r s"),                # shares 'a b c'
    (2, "a b c t u v tail"),           # shares 'a b c'; short tail 'tail'
    (3, "p q r t u v tail"),           # shares nothing above df=1... tail
    (4, ""),                           # empty doc
    (5, "one two"),                    # single short segment
]


def test_broadcast_path_matches_brute(ray_session):
    assert run(DOCS, max_df=1) == brute(DOCS, max_df=1)


def test_above_gate_path_matches_brute(ray_session):
    assert run(DOCS, max_df=1, broadcast_limit=0) == brute(DOCS, max_df=1)


def test_df_counts_docs_not_occurrences(ray_session):
    # 'a b c' appears twice inside doc 0 but only in 2 distinct docs:
    # at max_df=2 it survives; an occurrence-count rule would strip it.
    docs = [(0, "a b c a b c"), (1, "a b c z z z"), (2, "m n o p q r")]
    rows = run(docs, max_df=2)
    assert rows[0] == (0, "a b c a b c", 2, 0)
    # at max_df=1 both docs lose every copy
    rows = run(docs, max_df=1)
    assert rows[0] == (0, "", 0, 2)
    assert rows[1] == (1, "z z z", 1, 1)


def test_tail_segment_is_its_own_unit(ray_session):
    # 'tail' (1 token) is the final segment of docs 2 and 3 → df=2 → at
    # max_df=1 it is stripped from both, independently of the full-width
    # segments around it ('t u v' is also df=2 and goes; 'p q r' is df=1
    # and stays).
    rows = dict((r[0], r) for r in run(DOCS, max_df=1))
    assert "tail" not in rows[2][1] and "tail" not in rows[3][1]
    assert rows[3][1] == "p q r"
    assert rows[2][3] >= 1 and rows[3][3] == 2


def test_empty_and_short_docs(ray_session):
    rows = dict((r[0], r) for r in run(DOCS, max_df=1))
    assert rows[4] == (4, "", 0, 0)
    assert rows[5] == (5, "one two", 1, 0)


def test_segment_hashes_rule():
    h = segment_hashes("a b c d e", 2)
    assert len(h) == 3
    assert h[0] == int(hashlib.md5(b"a b").hexdigest()[:16], 16)
    assert h[2] == int(hashlib.md5(b"e").hexdigest()[:16], 16)
    assert segment_hashes("", 4).dtype == np.uint64
    assert len(segment_hashes("   ", 4)) == 0


# ---------------------------------------------------------------------------
# cluster_canonical (retention policy over connected-components labels)
# ---------------------------------------------------------------------------


def _canon(labels, scores, **kw):
    from pdf_parser_ray.stages.dedup import cluster_canonical

    lds = ray.data.from_arrow(pa.table({
        "doc_id": [a for a, _ in labels],
        "component_id": [b for _, b in labels]}))
    sds = ray.data.from_arrow(pa.table({
        "doc_id": [a for a, _ in scores],
        "n_tokens": [b for _, b in scores]}))
    out = cluster_canonical(lds, sds, **kw)
    return sorted((r["doc_id"], r["component_id"], r["n_tokens"], r["keep"])
                  for r in out.take_all())


def test_cluster_canonical_argmax_and_ties(ray_session):
    labels = [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)]
    scores = [(1, 10), (2, 30), (3, 30), (7, 5), (8, 5), (9, 0)]
    rows = _canon(labels, scores)
    keep = {d for d, _c, _n, k in rows if k}
    # cluster 1: max score 30 tied between 2 and 3 → min id 2
    # cluster 7: tie 5/5 → min id 7; singleton 9 keeps itself
    assert keep == {2, 7, 9}
    assert len(rows) == 6 and sum(1 for *_, k in rows if k) == 3


def test_cluster_canonical_explicit_width(ray_session):
    labels = [(i, i % 4) for i in range(40)]
    scores = [(i, i) for i in range(40)]
    rows = _canon(labels, scores, nrows=40)
    keep = {d for d, _c, _n, k in rows if k}
    # per residue class the max doc_id wins (score == id)
    assert keep == {36, 37, 38, 39}


def test_null_text_survives_both_paths(ray_session):
    # a null text cell must yield (id, '', 0, 0) on BOTH gate paths —
    # the above-gate rebuild distinguishes union sides by text nullity,
    # so an uncoalesced null doc row used to vanish from the output
    docs = [(0, "a b c a b c"), (1, "a b c z z z"), (2, None), (3, "m n o")]
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.dedup import strip_common_segments

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _ in docs],
        "text": pa.array([t for _, t in docs], type=pa.string())}))
    for limit in (2_000_000, 0):
        rows = sorted((r["doc_id"], r["clean_text"], r["n_seg_kept"],
                       r["n_seg_removed"])
                      for r in strip_common_segments(
                          ds, width=3, max_df=1,
                          broadcast_limit=limit).take_all())
        assert [r[0] for r in rows] == [0, 1, 2, 3], rows
        assert rows[2] == (2, "", 0, 0)
        assert rows[0] == (0, "", 0, 2)          # both 'a b c' copies go


def test_exact_dedup_incremental_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.dedup import exact_dedup_incremental

    prior = ray.data.from_arrow(pa.table({
        "doc_id": [100, 101], "text": ["seen before", "also seen"]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["fresh one", "seen before", "also seen", "fresh two"]}))
    out = sorted((r["doc_id"], r["text"])
                 for r in exact_dedup_incremental(new, prior).take_all())
    assert out == [(1, "fresh one"), (4, "fresh two")]
    # empty prior: everything survives
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    out = sorted(r["doc_id"]
                 for r in exact_dedup_incremental(new, empty).take_all())
    assert out == [1, 2, 3, 4]


def test_minhash_incremental_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.dedup import minhash_incremental_ids

    base = " ".join(f"tok{i}" for i in range(60))
    near = base + " extratail"          # near-dup of the archived doc
    fresh = " ".join(f"other{i}" for i in range(60))
    prior = ray.data.from_arrow(pa.table({
        "doc_id": [100], "text": [base]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [near, fresh, base]}))  # 3 = byte-identical archive copy
    out = sorted(r["doc_id"]
                 for r in minhash_incremental_ids(new, prior).take_all())
    assert out == [2]  # near-dup AND exact copy both dropped
    # distributed tier (broadcast_limit=0) must agree exactly
    out_dist = sorted(
        r["doc_id"] for r in minhash_incremental_ids(
            new, prior, broadcast_limit=0).take_all())
    assert out_dist == out

    # empty archive: everything survives
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    out = sorted(r["doc_id"]
                 for r in minhash_incremental_ids(new, empty).take_all())
    assert out == [1, 2, 3]
