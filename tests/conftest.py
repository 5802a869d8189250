"""Shared fixtures. Ray is initialised ONCE per pytest session.

Known transient (3 sightings across ~45 full-suite runs, 2026-08-18/19,
never reproducible in isolation, under induced CPU load, or on immediate
rerun; the 3rd — TestSemDedup::test_matches_bruteforce_both_paths —
passed in isolation AND in an immediate full-suite rerun with full
tracebacks enabled): a single test_dedup_similarity case fails once in a
full-suite run (different test each time). Suspected Ray worker churn on the shared
4-CPU session while the host is contended — not an algorithmic
nondeterminism (all kernels are partition-shape-independent and the same
inputs replay bit-identically). If it recurs, rerun the file alone and
capture the FULL traceback before concluding anything."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_sf0001(tmp_path_factory):
    """Synthesized interleaved corpus at sf0.001, written once per session."""
    from pdf_parser_ray.sources.synth import generate_corpus
    from pdf_parser_ray.sources.io import write_corpus_table

    path = tmp_path_factory.mktemp("corpus") / "sf0.001.parquet"
    # tiny row groups: this 10-doc corpus must still plan into multiple
    # fragment-metadata partitions for the resume tests
    write_corpus_table(generate_corpus(0.001), str(path), row_group_size=2)
    return str(path)


@pytest.fixture(scope="session")
def sample_text_content() -> str:
    """Reference conftest.py:126-134 canonical text blob (FIXTURES.md §2.3)."""
    return (
        "Customer Name: John Smith\n"
        "Policy Number: POL-123456\n"
        "Claim Amount: $1,500.00\n"
        "Date: 2024-01-01"
    )
