"""Distributed integer-exact Lloyd's k-means (stages/similarity.py
kmeans_assignments): reference-kernel equality, partition invariance,
tie-break and empty-cluster rules, trunc-division semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_parser_ray.stages.similarity import _trunc_div


def _reference_kmeans(vecs: np.ndarray, ids: np.ndarray, k: int, iters: int,
                      scale: int = 1000) -> pd.DataFrame:
    """Single-process replay of the documented contract (floor quantize,
    argmin lowest-cid ties, trunc-div update, empty keeps previous)."""
    q = np.floor(scale * vecs.astype(np.float64)).astype(np.int64)
    order = np.argsort(ids)
    cents = q[order[:k]].copy()
    for _ in range(iters - 1):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)
        for c in range(k):
            sub = q[cid == c]
            if len(sub):
                cents[c] = _trunc_div(sub.sum(axis=0), np.int64(len(sub)))
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return pd.DataFrame({"vec_id": ids, "cluster": d2.argmin(axis=1)}) \
        .sort_values("vec_id").reset_index(drop=True)


def _run(vecs: np.ndarray, ids: np.ndarray, *, k: int, iters: int,
         num_blocks: int = 1) -> pd.DataFrame:
    import ray.data

    from pdf_parser_ray.stages.similarity import kmeans_assignments

    rows = [{"vec_id": int(i), "embedding": v.astype(np.float32)}
            for i, v in zip(ids, vecs)]
    ds = ray.data.from_items(rows)
    if num_blocks > 1:
        ds = ds.repartition(num_blocks)
    df = kmeans_assignments(ds, k=k, iters=iters).to_pandas()
    return (df.astype({"vec_id": "int64", "cluster": "int64"})
            .sort_values("vec_id").reset_index(drop=True))


class TestTruncDiv:
    def test_matches_duckdb_intdiv(self):
        import duckdb

        vals = [(-7, 2), (7, 2), (-9, 4), (9, 4), (0, 3), (-1, 5)]
        for s, c in vals:
            want = duckdb.sql(f"select {s} // {c}").fetchone()[0]
            got = int(_trunc_div(np.array([s], dtype=np.int64),
                                 np.int64(c))[0])
            assert got == want, (s, c)


class TestKMeans:
    def test_matches_reference_kernel(self, ray_session):
        rng = np.random.default_rng(5)
        vecs = rng.normal(scale=0.3, size=(80, 6))
        ids = np.arange(80, dtype=np.int64)
        got = _run(vecs, ids, k=4, iters=4)
        want = _reference_kmeans(vecs, ids, k=4, iters=4)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got["cluster"].nunique() > 1

    def test_partition_invariance(self, ray_session):
        rng = np.random.default_rng(6)
        vecs = rng.normal(scale=0.3, size=(60, 5))
        ids = np.arange(60, dtype=np.int64)
        one = _run(vecs, ids, k=3, iters=3, num_blocks=1)
        many = _run(vecs, ids, k=3, iters=3, num_blocks=7)
        pd.testing.assert_frame_equal(one, many)

    def test_tie_breaks_to_lowest_cid(self, ray_session):
        # two identical seed vectors: every point equidistant to both seeds
        # must land in cluster 0, never 1
        vecs = np.array([[0.1, 0.1], [0.1, 0.1], [0.4, 0.4], [0.42, 0.4]])
        ids = np.arange(4, dtype=np.int64)
        got = _run(vecs, ids, k=2, iters=1)
        assert (got["cluster"] == 0).iloc[0] and (got["cluster"] == 0).iloc[1]

    def test_empty_cluster_keeps_previous_centroid(self, ray_session):
        # seeds 0/1 identical → cluster 1 captures nothing after round 1;
        # the contract (and the SQL LEFT JOIN+COALESCE) keeps its centroid
        vecs = np.array([[0.0, 0.0], [0.0, 0.0], [0.5, 0.5], [0.5, 0.52]])
        ids = np.arange(4, dtype=np.int64)
        got = _run(vecs, ids, k=2, iters=3)
        want = _reference_kmeans(vecs, ids, k=2, iters=3)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    @pytest.mark.parametrize("iters", [1, 2])
    def test_single_and_two_iter(self, ray_session, iters):
        rng = np.random.default_rng(7)
        vecs = rng.normal(scale=0.2, size=(30, 4))
        ids = np.arange(30, dtype=np.int64)
        got = _run(vecs, ids, k=3, iters=iters)
        want = _reference_kmeans(vecs, ids, k=3, iters=iters)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
