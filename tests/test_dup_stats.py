"""Exact-dup cluster-size distribution (stages/dedup.py dup_cluster_stats)."""

from __future__ import annotations

import pandas as pd


def _run(texts, num_blocks: int = 1) -> pd.DataFrame:
    import ray.data

    from pdf_parser_ray.stages.dedup import dup_cluster_stats

    ds = ray.data.from_items([{"text": t} for t in texts])
    if num_blocks > 1:
        ds = ds.repartition(num_blocks)
    return (dup_cluster_stats(ds, nrows=len(texts)).to_pandas()
            .sort_values("cluster_size").reset_index(drop=True))


class TestDupStats:
    def test_planted_clusters(self, ray_session):
        texts = ["aaa"] * 3 + ["bbb"] * 2 + ["unique"]
        got = _run(texts)
        want = pd.DataFrame({"cluster_size": [1, 2, 3],
                             "n_clusters": [1, 1, 1],
                             "n_docs": [1, 2, 3]}).astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert got["n_docs"].sum() == len(texts)

    def test_partition_invariance_and_none(self, ray_session):
        texts = ["x"] * 4 + [None, None] + ["", "y"]  # None ≡ "" cluster
        one = _run(texts, num_blocks=1)
        many = _run(texts, num_blocks=5)
        pd.testing.assert_frame_equal(one, many)
        # None and "" hash identically → a 3-cluster
        assert set(map(tuple, one.to_numpy())) == {(1, 1, 1), (3, 1, 3),
                                                   (4, 1, 4)}

    def test_all_unique(self, ray_session):
        got = _run([f"t{i}" for i in range(7)])
        assert got.to_numpy().tolist() == [[1, 7, 7]]


def _diff(old_rows, new_rows, **kwargs) -> set:
    import ray.data

    from pdf_parser_ray.stages.dedup import snapshot_diff

    out = snapshot_diff(ray.data.from_items(old_rows),
                        ray.data.from_items(new_rows), **kwargs).to_pandas()
    if out.empty:
        return set()
    return set(map(tuple, out[["doc_id", "status"]].to_numpy()))


class TestSnapshotDiff:
    def test_planted_delta(self, ray_session):
        old = [{"doc_id": 1, "text": "a"}, {"doc_id": 2, "text": "b"},
               {"doc_id": 3, "text": "c"}]
        new = [{"doc_id": 2, "text": "b"}, {"doc_id": 3, "text": "c2"},
               {"doc_id": 4, "text": "d"}]
        assert _diff(old, new, nrows=6) == {(1, "removed"), (3, "changed"),
                                            (4, "added")}

    def test_identical_snapshots_empty(self, ray_session):
        rows = [{"doc_id": i, "text": f"t{i}"} for i in range(10)]
        assert _diff(rows, rows, nrows=20) == set()

    def test_null_text_equals_empty(self, ray_session):
        old = [{"doc_id": 1, "text": None}]
        new = [{"doc_id": 1, "text": ""}]
        # None hashes as "" on both sides → unchanged → no row
        assert _diff(old, new, nrows=2) == set()
