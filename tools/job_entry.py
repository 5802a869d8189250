"""Cluster job entrypoint — the script a real deployment submits:

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python tools/job_entry.py \
        --corpus /data/corpus --out /data/extracted

This is the north rule's ``ray job submit`` path. In THIS sandbox the
jobs API cannot run (minimal ray wheel: no aiohttp → no dashboard → no
job agent; see BENCH/BASELINE.md), so the same entrypoint also runs
directly (``python tools/job_entry.py``), where it starts a local Ray.
The body is identical either way: on a cluster, ``ray.init(address=
"auto")`` joins the running cluster the job agent placed us in; the
checkpointed run commits per-partition lineage, so a preempted job is
re-submitted with the same arguments and skips committed partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="corpus dir (default: synth sf0.01 fixture)")
    ap.add_argument("--out", default="/tmp/pdf_parser_ray_job_out")
    ap.add_argument("--byte-budget", type=int, default=256 << 20)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # on a cluster the job agent sets RAY_ADDRESS; standalone runs local
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    corpus = args.corpus
    if corpus is None:
        from pdf_parser_ray.sources.synth import corpus_path

        corpus = corpus_path(0.01)

    from pdf_parser_ray.pipelines.extraction import run_extraction

    summary = run_extraction(corpus, args.out, byte_budget=args.byte_budget)
    print(json.dumps({k: v for k, v in summary.items()
                      if isinstance(v, (int, float, str))}, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
