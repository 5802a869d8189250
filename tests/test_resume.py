"""Checkpoint manifest + exact resume: interrupted run, once resumed, must
be byte-identical to an uninterrupted run; committed partitions are skipped."""

import json
import os

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from pdf_parser_ray.pipelines.extraction import run_extraction


def _read_all(out_dir):
    t = pads.dataset(os.path.join(out_dir, "partitions"),
                     format="parquet", partitioning="hive").to_table()
    t = t.sort_by("doc_id")
    return t


@pytest.fixture(scope="module")
def full_run(ray_session, corpus_sf0001, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("full"))
    summary = run_extraction(corpus_sf0001, out, byte_budget=4096,
                             parse_concurrency=2, commit_batch_size=100)
    return out, summary


class TestResume:
    def test_multiple_partitions_planned(self, full_run):
        _, summary = full_run
        assert summary["partitions_total"] >= 2

    def test_interrupt_then_resume_identical(self, ray_session, corpus_sf0001,
                                             tmp_path_factory, full_run):
        out2 = str(tmp_path_factory.mktemp("resumed"))
        # simulate interruption: commit only the first partition, then resume
        s1 = run_extraction(corpus_sf0001, out2, byte_budget=4096,
                            parse_concurrency=2, commit_batch_size=1)
        assert s1["partitions_committed_now"] >= 2  # loop committed one-by-one
        # wipe all but the first commit line to fake a mid-run kill
        manifest = os.path.join(out2, "manifest.jsonl")
        lines = open(manifest).read().strip().split("\n")
        kept = lines[:1]
        open(manifest, "w").write("\n".join(kept) + "\n")
        kept_pid = json.loads(kept[0])["partition_id"]
        # remove the no-longer-committed partition outputs
        pdir = os.path.join(out2, "partitions")
        for d in os.listdir(pdir):
            if d != f"partition_id={kept_pid}":
                import shutil
                shutil.rmtree(os.path.join(pdir, d))

        s2 = run_extraction(corpus_sf0001, out2, byte_budget=4096,
                            parse_concurrency=2, commit_batch_size=1)
        assert s2["partitions_skipped"] == 1

        full_out, _ = full_run
        a, b = _read_all(full_out), _read_all(out2)
        assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
        assert a.column("file_hash").to_pylist() == b.column("file_hash").to_pylist()
        assert a.column("spans").to_pylist() == b.column("spans").to_pylist()

    def test_manifest_lineage_fields(self, full_run):
        out, _ = full_run
        recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
        for r in recs:
            assert r["status"] == "committed"
            assert "fragments" in r and "parser_version" in r
            # fragment-range lineage: [path, rg_lo, rg_hi] triples
            assert all(len(rng) == 3 for rng in r["fragments"])
            assert set(r["metrics"]) >= {"docs", "spans", "bytes", "errors"}

    def test_metrics_match_written_data(self, full_run):
        out, _ = full_run
        recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
        t = _read_all(out)
        assert sum(r["metrics"]["docs"] for r in recs) == t.num_rows
        assert sum(r["metrics"]["errors"] for r in recs) == \
            pc.count(t.column("error"), mode="only_valid").as_py()


class TestResumePlanValidation:
    def test_changed_byte_budget_aborts(self, ray_session, corpus_sf0001,
                                        tmp_path_factory):
        out = str(tmp_path_factory.mktemp("budget_change"))
        run_extraction(corpus_sf0001, out, byte_budget=4096,
                       parse_concurrency=2, commit_batch_size=100)
        with pytest.raises(RuntimeError, match="byte_budget"):
            run_extraction(corpus_sf0001, out, byte_budget=8192,
                           parse_concurrency=2, commit_batch_size=100)

    def test_changed_corpus_aborts(self, ray_session, corpus_sf0001,
                                   tmp_path_factory):
        from pdf_parser_ray.sources.synth import corpus_path

        out = str(tmp_path_factory.mktemp("corpus_change"))
        run_extraction(corpus_sf0001, out, byte_budget=4096,
                       parse_concurrency=2, commit_batch_size=100)
        other = corpus_path(0.001, seed=7, tag="_resumetest")
        with pytest.raises(RuntimeError, match="fingerprint|partition"):
            run_extraction(other, out, byte_budget=4096,
                           parse_concurrency=2, commit_batch_size=100)

    def test_same_plan_resumes_clean(self, ray_session, corpus_sf0001,
                                     tmp_path_factory):
        out = str(tmp_path_factory.mktemp("same_plan"))
        run_extraction(corpus_sf0001, out, byte_budget=4096,
                       parse_concurrency=2, commit_batch_size=100)
        s = run_extraction(corpus_sf0001, out, byte_budget=4096,
                           parse_concurrency=2, commit_batch_size=100)
        assert s["partitions_committed_now"] == 0
        assert s["partitions_skipped"] == s["partitions_total"]


class TestSkewIsolation:
    def test_oversized_doc_gets_own_partition(self, ray_session, tmp_path_factory):
        from pdf_parser_ray.state.manifest import plan_partitions
        import numpy as np

        ids = [f"doc-{i:04d}" for i in range(10)]
        sizes = np.array([100] * 5 + [10_000] + [100] * 4)
        parts = plan_partitions(ids, sizes, byte_budget=500)
        big = [p for p in parts if p.start_doc_id == "doc-0005"]
        assert len(big) == 1 and big[0].n_docs == 1  # isolated straggler

    def test_oversized_fragment_gets_own_partition(self):
        from pdf_parser_ray.state.manifest import (Fragment,
                                                   plan_fragment_partitions)

        frags = ([Fragment("part-0.parquet", i, 32, 100) for i in range(5)]
                 + [Fragment("part-1.parquet", 0, 1, 10_000)]
                 + [Fragment("part-2.parquet", i, 32, 100) for i in range(4)])
        parts = plan_fragment_partitions(frags, byte_budget=500)
        big = [p for p in parts if p.ranges == (("part-1.parquet", 0, 1),)]
        assert len(big) == 1 and big[0].n_rows == 1  # isolated straggler


class TestFragmentPlanScale:
    def test_plan_never_enumerates_docs(self):
        """A 10^12-doc corpus (10^6 fragments × 10^6 rows each) must plan
        from fragment metadata alone — O(n_fragments) state, instant."""
        from pdf_parser_ray.state.manifest import (
            Fragment, fragment_plan_fingerprint, plan_fragment_partitions)

        n_frag, rows_per, bytes_per = 1_000_000, 1_000_000, 1 << 30
        frags = [Fragment(f"part-{i // 64:07d}.parquet", i % 64,
                          rows_per, bytes_per) for i in range(n_frag)]
        parts = plan_fragment_partitions(frags, byte_budget=16 << 30)
        assert sum(p.n_rows for p in parts) == n_frag * rows_per  # 10^12 docs
        assert all(p.n_bytes <= 16 << 30 for p in parts)
        # contiguous, complete, non-overlapping coverage
        assert sum(hi - lo for p in parts for _, lo, hi in p.ranges) == n_frag
        assert len(fragment_plan_fingerprint(frags)) == 32

    def test_ranges_collapse_within_file(self):
        from pdf_parser_ray.state.manifest import (Fragment,
                                                   plan_fragment_partitions)

        frags = [Fragment("f.parquet", i, 10, 10) for i in range(8)]
        parts = plan_fragment_partitions(frags, byte_budget=1000)
        assert parts[0].ranges == (("f.parquet", 0, 8),)
