"""Partition planning + manifest unit tests (no Ray)."""

import numpy as np
import pytest

from pdf_parser_ray.state.manifest import (
    Manifest,
    assign_partition,
    partition_boundaries,
    plan_partitions,
)


class TestPlan:
    def test_packs_to_budget(self):
        ids = [f"d{i:03d}" for i in range(10)]
        parts = plan_partitions(ids, np.full(10, 10), byte_budget=30)
        assert [p.n_docs for p in parts] == [3, 3, 3, 1]
        assert parts[0].start_doc_id == "d000" and parts[0].end_doc_id == "d003"
        assert parts[-1].end_doc_id is None

    def test_oversized_isolated(self):
        ids = ["a", "b", "c", "d"]
        parts = plan_partitions(ids, np.array([10, 1000, 10, 10]), byte_budget=50)
        assert [p.n_docs for p in parts] == [1, 1, 2]

    def test_single_partition(self):
        parts = plan_partitions(["a", "b"], np.array([1, 1]), byte_budget=100)
        assert len(parts) == 1 and parts[0].end_doc_id is None

    def test_assign_matches_plan(self):
        ids = [f"d{i:03d}" for i in range(20)]
        parts = plan_partitions(ids, np.full(20, 10), byte_budget=70)
        bounds = partition_boundaries(parts)
        assigned = assign_partition(np.array(ids, dtype=object), bounds)
        for p in parts:
            lo = ids.index(p.start_doc_id)
            for i in range(lo, lo + p.n_docs):
                assert assigned[i] == p.partition_id


class TestManifest:
    def test_commit_and_read(self, tmp_path):
        m = Manifest(str(tmp_path / "out"))
        assert m.committed_ids() == set()
        m.commit({"partition_id": 0, "metrics": {}})
        m.commit({"partition_id": 3, "metrics": {}})
        assert m.committed_ids() == {0, 3}

    def test_torn_tail_line_ignored(self, tmp_path):
        m = Manifest(str(tmp_path / "out"))
        m.commit({"partition_id": 1, "metrics": {}})
        with open(m.path, "a") as f:
            f.write('{"partition_id": 2, "stat')  # killed mid-write
        assert m.committed_ids() == {1}
