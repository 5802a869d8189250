"""Cluster-shaped job entry point.

Run the checkpointed extraction as a Ray job (the north rule's invocation
shape — on a real cluster this is submitted to each fixed-size cluster):

    ray job submit --working-dir . -- \\
        python -m pdf_parser_ray.job --corpus <dir> --out <dir> [--budget BYTES]

Locally (sandbox): ``python -m pdf_parser_ray.job --corpus ... --out ...``.
This module OWNS a Ray session (guarded init) — unlike the library code,
which never calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Checkpointed interleaved-corpus extraction")
    parser.add_argument("--corpus", required=True, help="input corpus dir/file (parquet)")
    parser.add_argument("--out", required=True, help="output dir (partitions + manifest)")
    parser.add_argument("--budget", type=int, default=None, help="partition byte budget")
    parser.add_argument("--num-cpus", type=int,
                        default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    parser.add_argument("--compute", choices=["actors", "tasks"], default="actors")
    parser.add_argument("--commit-batch-size", type=int, default=8)
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .config import PARTITION_BYTE_BUDGET
    from .pipelines.extraction import run_extraction
    from .state.manifest import summarize_run

    try:
        summary = run_extraction(
            args.corpus, args.out,
            byte_budget=args.budget or PARTITION_BYTE_BUDGET,
            parse_concurrency=(max(2, args.num_cpus // 2), args.num_cpus),
            commit_batch_size=args.commit_batch_size,
            compute=args.compute,
        )
        summary["run"] = summarize_run(args.out)
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
