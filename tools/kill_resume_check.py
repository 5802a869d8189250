"""Hard kill/resume validation (one-off, run standalone — owns Ray sessions
via subprocesses of pdf_parser_ray.job).

1. Run the checkpointed job to completion → reference output.
2. Run it again in a fresh output dir, SIGKILL the process as soon as the
   first partition commit lands in the manifest.
3. Resume with the same command; verify committed partitions were skipped
   and the final output is row-identical to the uninterrupted run.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = None  # resolved below
A_OUT = "/tmp/krc_full"
B_OUT = "/tmp/krc_killed"


def job_cmd(out_dir: str) -> list[str]:
    return [sys.executable, "-m", "pdf_parser_ray.job",
            "--corpus", CORPUS, "--out", out_dir,
            "--budget", str(512 * 1024), "--num-cpus", "8",
            "--compute", "tasks", "--commit-batch-size", "1"]


def read_all(out_dir: str):
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(out_dir, "partitions"), format="parquet",
                     partitioning="hive").to_table()
    return t.sort_by("doc_id")


def main() -> None:
    global CORPUS
    from pdf_parser_ray.sources.synth import corpus_path

    CORPUS = corpus_path(0.01)
    env = dict(os.environ, PYTHONPATH="/root/repo")

    shutil.rmtree(A_OUT, ignore_errors=True)
    shutil.rmtree(B_OUT, ignore_errors=True)

    subprocess.run(job_cmd(A_OUT), env=env, check=True, capture_output=True)
    print("uninterrupted run complete")

    proc = subprocess.Popen(job_cmd(B_OUT), env=env,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    manifest = os.path.join(B_OUT, "manifest.jsonl")
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(manifest) and open(manifest).read().count('"committed"') >= 1:
            break
        if proc.poll() is not None:
            raise SystemExit("job finished before we could kill it — lower budget")
        time.sleep(0.05)
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    n_committed = open(manifest).read().count('"committed"')
    print(f"killed mid-run with {n_committed} partition(s) committed")

    out = subprocess.run(job_cmd(B_OUT), env=env, check=True,
                         capture_output=True, text=True)
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    print("resume summary:", summary)
    assert summary["partitions_skipped"] >= 1, "resume did not skip committed work"

    a, b = read_all(A_OUT), read_all(B_OUT)
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert a.column("file_hash").to_pylist() == b.column("file_hash").to_pylist()
    assert a.column("spans").to_pylist() == b.column("spans").to_pylist()
    print(f"PASS: killed+resumed output identical to uninterrupted run "
          f"({a.num_rows} docs, {summary['partitions_skipped']} partitions skipped)")


if __name__ == "__main__":
    main()
