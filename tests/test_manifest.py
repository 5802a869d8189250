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


class TestPlanProperties:
    """Property-based invariants of the byte-budget planner."""

    def test_invariants(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        @given(st.lists(st.integers(min_value=0, max_value=5000),
                        min_size=1, max_size=200),
               st.integers(min_value=1, max_value=10_000))
        @settings(max_examples=100, deadline=None)
        def check(sizes, budget):
            ids = [f"d{i:05d}" for i in range(len(sizes))]
            parts = plan_partitions(ids, np.array(sizes), budget)
            # every doc covered exactly once, contiguously, in order
            assert sum(p.n_docs for p in parts) == len(ids)
            assert parts[0].start_doc_id == ids[0]
            for a, b in zip(parts, parts[1:]):
                assert a.end_doc_id == b.start_doc_id
            assert parts[-1].end_doc_id is None
            # budget respected except single-doc oversize partitions
            for p in parts:
                assert p.n_bytes <= budget or p.n_docs == 1
            # assignment agrees with the plan
            bounds = partition_boundaries(parts)
            assigned = assign_partition(np.array(ids, dtype=object), bounds)
            idx = 0
            for p in parts:
                for _ in range(p.n_docs):
                    assert assigned[idx] == p.partition_id
                    idx += 1

        check()
