"""Benchmark harness.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "spans_per_sec": ...}

--scaling: runs the headline extraction at two parallelism levels exactly
4× apart (default num_cpus=4 vs 16; BENCH_SCALE_LO/HI override) in fresh
subprocesses on the IDENTICAL plan, alternating median-of-3, and prints
throughput at both levels plus scaling efficiency = (thr_hi/thr_lo)/4 and
the host's own ALU scaling ceiling; records the result in
BENCH/BASELINE.md (the sandbox stand-in for N vs 4N nodes via
ray job submit — BASELINE.md target table).

The headline corpus is the deterministic synthesized interleaved table at
the SF of $GRAFT_SF_DIR, read ``BENCH_REPLICAS`` times (default sized to
~16k docs) so the job is compute-bound rather than startup-bound; reported
docs/sec counts processed (replicated) docs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = _env_int("RAY_GRAFT_CPUS", 32)


def _sf_of(sf_dir: str) -> float:
    try:
        return float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        return 0.1


def run_headline_extraction(num_cpus: int) -> dict:
    """Extraction pipeline: synth corpus (replicated) → DocParse actor pool
    → streaming aggregate consumption. Returns timing + throughput."""
    import ray.data
    from pdf_parser_ray.sources.synth import corpus_path
    from pdf_parser_ray.stages.doc_parse import DocParse

    # Bench corpus: the synthesized interleaved table scaled up from the
    # SF of $GRAFT_SF_DIR to a compute-bound size (generated once, cached).
    from pdf_parser_ray.sources.synth import EXTRACTION_KIND_WEIGHTS

    sf = _sf_of(SF_DIR)
    bench_docs = _env_int("BENCH_DOCS", 128_000)
    bench_sf = max(sf, bench_docs / 10_000)
    # extraction-heavy span mix: the engine's work is PDF layout parse +
    # HTML boilerplate strip; a pass-through-text-heavy mix benchmarks
    # memcpy, not the engine (see synth.EXTRACTION_KIND_WEIGHTS)
    dpf = _env_int("BENCH_DOCS_PER_FILE", 500)
    path = corpus_path(bench_sf, kind_weights=EXTRACTION_KIND_WEIGHTS, tag="_xh",
                       docs_per_file=dpf)

    # warm the page cache (untimed) so we measure compute, not first disk read
    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
             if os.path.isdir(path) else [path])
    for fp in paths:
        with open(fp, "rb") as f:
            while f.read(16 * 1024 * 1024):
                pass

    from pdf_parser_ray.stages.doc_parse import doc_parse_batch

    # tasks-mode by default: DocParse state (compiled regexes) is light, so
    # the per-worker warm cache amortizes it identically to an actor pool
    # while avoiding per-dataset actor spawn latency. Set BENCH_COMPUTE=actors
    # to bench the actor-pool configuration (the default for heavy state —
    # models, font caches; see stages/doc_parse.py).
    compute = os.environ.get("BENCH_COMPUTE", "tasks")

    def build(input_path, onb):
        # longest-first scheduling: list part files largest-first so the
        # indivisible heavy docs (a ~1000-page PDF parses ~5 s as ONE task)
        # start in the first wave instead of straggling the tail — measured
        # max-task 6.6 s landing late cost ~20% utilization at 32 CPUs
        # while barely denting the 8-CPU run (the scaling-gap asymmetry)
        if os.path.isdir(input_path):
            parts = [os.path.join(input_path, f) for f in os.listdir(input_path)
                     if f.endswith(".parquet")]
            input_path = sorted(parts, key=os.path.getsize, reverse=True)
            # replicate the file list to scale work without regenerating
            # (interleaved so longest-first ordering is preserved per pass)
            reps = _env_int("BENCH_REPLICAS", 1)
            if reps > 1:
                input_path = [p for p in input_path for _ in range(reps)]
                onb = onb * reps
        ds = ray.data.read_parquet(input_path, override_num_blocks=onb)
        if compute == "tasks":
            return ds.map_batches(doc_parse_batch, batch_format="pyarrow",
                                  batch_size=_env_int("BENCH_BATCH_SIZE", 128))
        return ds.map_batches(
            DocParse,
            batch_format="pyarrow", batch_size=_env_int("BENCH_BATCH_SIZE", 128),
            concurrency=(max(2, num_cpus // 2), num_cpus),
        )

    # untimed pilot: warms worker processes / import caches / plasma
    pilot = build(corpus_path(0.01), 8)
    for _ in pilot.iter_batches(batch_format="pyarrow", batch_size=None):
        pass

    # a scaling experiment must run the IDENTICAL plan at both levels —
    # BENCH_FIXED_BLOCKS pins the block count regardless of num_cpus
    # (otherwise the low-CPU level gets bigger tasks with less per-task
    # overhead and the comparison measures plan shape, not scaling)
    fixed_blocks = _env_int("BENCH_FIXED_BLOCKS", 0)
    onb = fixed_blocks or num_cpus * _env_int("BENCH_BLOCKS_PER_CPU", 8)
    parsed = build(path, onb)

    # distributed consumption: per-block count partials — the driver sees
    # one tiny row per block instead of deserializing ~0.5 GB of parsed
    # spans through iter_batches (constant driver-side cost that eats the
    # high-CPU run's advantage; production consumes via write_parquet)
    def count_partial(batch):
        import pyarrow as pa

        n_spans = sum(batch.column("n_spans").to_pylist())
        n_err = sum(1 for e in batch.column("error").to_pylist() if e)
        return pa.table({"docs": [batch.num_rows], "spans": [n_spans],
                         "errors": [n_err]})

    counted = parsed.map_batches(count_partial, batch_format="pyarrow",
                                 batch_size=None)
    t0 = time.time()
    docs = spans = errors = 0
    for batch in counted.iter_batches(batch_format="pyarrow", batch_size=None):
        docs += sum(batch.column("docs").to_pylist())
        spans += sum(batch.column("spans").to_pylist())
        errors += sum(batch.column("errors").to_pylist())
    elapsed = time.time() - t0

    # persist the per-operator breakdown (wall-time-on-useful-compute evidence)
    try:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/stats_last_run.txt", "w") as f:
            f.write(f"# headline ds.stats() @ num_cpus={num_cpus}\n")
            f.write(counted.stats())
    except Exception:
        pass
    return {
        "sec": elapsed,
        "docs": docs,
        "spans": spans,
        "errors": errors,
        "bench_sf": bench_sf,
        "docs_per_sec": docs / elapsed,
        "spans_per_sec": spans / elapsed,
    }


def run_query_suite() -> dict:
    """Representative operator pipelines over $GRAFT_SF_DIR, timed."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    names = ["dedup_exact", "minhash_dedup", "knn_bruteforce",
             "pricing_summary", "events_hourly", "token_counts",
             "customer_order_revenue", "corpus_prep",
             "ngram_jaccard", "events_asof",
             "events_range_join", "knn_lsh", "dup_spans",
             "corpus_curate", "approx_distinct_users",
             "events_value_percentiles", "orders_top_per_customer",
             "nation_revenue", "orders_price_rank",
             "perplexity", "bpe_tokens",
             # round-4 additions (appended: earlier keys stay comparable)
             "strip_dup_spans", "contamination", "domain_cap",
             "perplexity_backoff", "media_features_jpeg", "top_terms",
             "knn_hnsw", "model_filter",
             # round-4 session-3 additions
             "pagerank", "segment_dedup", "cluster_canonical",
             "inverted_index",
             # round-5 additions
             "gopher_quality", "weighted_sample", "local_supplier_volume",
             "temperature_mix", "scene_cuts_avi",
             "returned_item_report", "extraction_manifest",
             "volume_shipping", "fk_orphans", "promo_revenue",
             # round-5 final-session additions
             "customer_distribution", "order_priority_check",
             "large_volume_customers", "global_sales_opportunity",
             "supplier_nation_share", "top_supplier",
             "brand_supplier_count", "small_qty_revenue",
             "disjunctive_revenue", "market_share", "late_shipments",
             "product_type_profit", "forecast_revenue",
             "best_supplier_per_part", "waiting_suppliers",
             "part_promotion_suppliers",
             # round-5 final-session sketch/chunking additions
             "hll_distinct_users", "heavy_hitters",
             "cdc_chunks", "cdc_dup_chunks",
             "value_histogram", "key_skew_profile", "heavy_hitters_by_source", "cdc_neardup",
             # round-5 continuation additions
             "editdist_neardup", "kmeans", "tar_ingest", "dup_stats",
             "snapshot_diff", "zorder_layout", "event_anomalies",
             "source_keywords", "event_throttle",
             # round-5 continuation-2 additions
             "order_skyline", "ppjoin_neardup", "customer_order_trend",
             "user_activity_coverage", "event_type_affinity",
             # round-5 continuation-3 additions
             "dataset_split", "encoding_stats", "minhash_incremental",
             "fix_mojibake", "datacard", "length_outliers"]
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        result = qs[name](SF_DIR)
        if hasattr(result, "to_pandas"):
            result.to_pandas()  # consume
        out[name] = round(time.time() - t0, 3)
    return out


def run_gates_forced_suite() -> dict:
    """Exercise the ABOVE-GATE (distributed) tiers of the size-gated
    operators with real wall-clock, not just pytest equality (r4-verdict
    item 4). At sf0.1 every gated operator rides its broadcast/coalesce
    fast path, so the distributed fallback tiers — the ones that matter
    at 100 TB — never get bench rows. Each target runs TWICE back-to-back
    in the same host window: default gates (broadcast tier) then
    ``broadcast_limit=0`` (forced distributed tier); the pair's ratio is
    host-drift-immune. Output equality across tiers is pytest-owned
    (two-path tests); this block owns the performance claim.

    The distributed tiers pay multiple sort-barrier floors that are FIXED
    per exchange (TUNING.md: ~seconds regardless of row count) — pure
    overhead at sf0.1 that amortizes away at scale. Normalization is
    empirical, not hand-counted: each tier ALSO runs a 50-doc "floor
    replica" (identical exchange structure, negligible compute), and the
    comparison uses the data-proportional net times
    ``(full − floor)``."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as em
    from pdf_parser_ray.stages.dedup import (contamination,
                                             strip_common_segments,
                                             strip_duplicate_spans)
    from pdf_parser_ray.stages.textstage import bigram_commonness

    def docs(n=None):
        d = em._documents(SF_DIR, columns=["doc_id", "text"])
        return d.limit(n) if n else d

    def contam(bl, n=None):
        test_ds = docs(n).map_batches(em._md5_bucket_split,
                                      fn_kwargs={"want_test": True},
                                      batch_format="pyarrow")
        train_ds = docs(n).map_batches(em._md5_bucket_split,
                                       fn_kwargs={"want_test": False},
                                       batch_format="pyarrow")
        return contamination(train_ds, test_ds, width=8, broadcast_limit=bl)

    targets = {
        "strip_dup_spans": lambda bl, n=None: strip_duplicate_spans(
            docs(n), width=8, min_count=2, broadcast_limit=bl),
        "contamination": contam,
        "segment_dedup": lambda bl, n=None: strip_common_segments(
            docs(n), width=4, max_df=3, broadcast_limit=bl),
        "bigram_commonness": lambda bl, n=None: bigram_commonness(
            docs(n), broadcast_limit=bl),
    }

    def timed(build, bl, n=None) -> tuple[float, int]:
        t0 = time.time()
        res = build(bl, n)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return round(time.time() - t0, 3), len(df)

    out: dict[str, dict] = {}
    warm = False
    for name, build in targets.items():
        if not warm:  # session warmup: first pipeline pays worker spin-up
            timed(build, 2_000_000, 50)
            warm = True
        tb_floor, _ = timed(build, 2_000_000, 50)
        tb, nb = timed(build, 2_000_000)
        tf_floor, _ = timed(build, 0, 50)
        tf, nf = timed(build, 0)
        net_b = max(tb - tb_floor, 0.05)   # data-proportional seconds
        net_f = max(tf - tf_floor, 0.0)
        out[name] = {
            "broadcast_sec": tb, "broadcast_floor_sec": tb_floor,
            "forced_sec": tf, "forced_floor_sec": tf_floor,
            "rows": nb, "rows_forced_tier": nf,
            "forced_over_broadcast_raw": round(tf / max(tb, 1e-9), 2),
            "forced_over_broadcast_net": round(net_f / net_b, 2),
        }
    return out


def main_plain() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    # Multi-window headline + host-speed control: this shared VM swings
    # 1.5-5x across minutes (every round has hit a different weather
    # window — r2 15.8 s vs r3 21.0 s on identical input was host drift,
    # not a code regression). The artifact therefore carries (a) every
    # window's wall time, (b) a fixed-work single-process ALU control
    # measured alongside, so rounds can be compared on docs/sec PER HOST
    # SPEED UNIT instead of raw wall clock.
    windows = max(1, _env_int("BENCH_HEADLINE_WINDOWS", 3))
    alu: list[float] = [_burn_once(0)]
    runs = []
    for _ in range(windows):
        runs.append(run_headline_extraction(NUM_CPUS))
        alu.append(_burn_once(0))
    runs_sorted = sorted(runs, key=lambda r: r["sec"])
    headline = runs_sorted[len(runs_sorted) // 2]  # median window
    alu_sec = sorted(alu)[len(alu) // 2]
    queries = {} if os.environ.get("BENCH_SKIP_QUERIES") else run_query_suite()
    gates_forced = ({} if os.environ.get("BENCH_SKIP_QUERIES")
                    else run_gates_forced_suite())
    result = {
        "metric": "interleaved-extraction end-to-end",
        "value": round(headline["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "queries_gates_forced": gates_forced,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
        "docs": headline["docs"],
        "spans": headline["spans"],
        "errors": headline["errors"],
        "bench_sf": headline["bench_sf"],
        "docs_per_sec": round(headline["docs_per_sec"], 1),
        "spans_per_sec": round(headline["spans_per_sec"], 1),
        "headline_windows_sec": [round(r["sec"], 3) for r in runs],
        "docs_per_sec_windows": [round(r["docs_per_sec"], 1) for r in runs],
        "host_alu_control_sec": round(alu_sec, 3),
        "host_alu_all_sec": [round(a, 3) for a in alu],
        "docs_per_sec_per_alu": round(headline["docs_per_sec"] * alu_sec, 1),
    }
    ray.shutdown()
    print(json.dumps(result))


def _burn_once(_: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return time.time() - t0


def hardware_ceiling(lo: int = 8, hi: int = 32) -> float:
    """Measured scaling ceiling of this machine for pure ALU work.

    Runs an identical fixed-work loop in ``lo`` and ``hi`` concurrent
    processes (no Ray, no memory traffic). On shared/oversubscribed VMs the
    per-process time inflates at high concurrency; the ratio of per-process
    times bounds any software's achievable 8→32 scaling efficiency.
    """
    import multiprocessing as mp

    with mp.Pool(lo) as pool:
        t_lo = sum(pool.map(_burn_once, range(lo))) / lo
    with mp.Pool(hi) as pool:
        t_hi = sum(pool.map(_burn_once, range(hi))) / hi
    return t_lo / t_hi


def main_scaling() -> None:
    """Scaling protocol (the BASELINE.md "N vs 4N nodes" stand-in):

    - Levels: num_cpus = 4 and 16 by default (exactly 4×;
      BENCH_SCALE_LO/HI override, e.g. 7/28). Below 32 total so the Ray
      control plane (driver, raylet, GCS, plasma) has headroom on this
      32-core host, as it would on a real cluster where the head node
      doesn't run tasks; at num_cpus=32 workers + control plane
      oversubscribe the host and the measurement mixes in scheduler
      starvation that a multi-node deployment doesn't have.
    - IDENTICAL plan at both levels (BENCH_FIXED_BLOCKS pins the block
      count; the corpus file list is read 2× for a longer, fixed-cost-
      amortized run) — only the resource count differs.
    - Alternating median-of-3 in fresh processes (host throughput swings
      ±30% across minutes; alternation hits both levels with the same
      drift).
    - A pure-ALU fixed-work loop measures the HOST's own scaling ceiling
      at the same two levels — the bound for any software on this VM.
    """
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SKIP_QUERIES="1")
        env.setdefault("BENCH_FIXED_BLOCKS", "256")
        env.setdefault("BENCH_REPLICAS", "2")
        # one window per subprocess: the scaling protocol is ITSELF an
        # alternating median-of-3 — nesting the plain run's 3-window
        # median would triple the wall time for no extra signal
        env.setdefault("BENCH_HEADLINE_WINDOWS", "1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = _env_int("BENCH_SCALE_LO", 4), _env_int("BENCH_SCALE_HI", 16)
    reps = _env_int("BENCH_SCALING_REPS", 3)
    runs_lo, runs_hi = [], []
    for _ in range(reps):  # alternate levels so machine noise hits both equally
        runs_lo.append(run(lo))
        time.sleep(5)
        runs_hi.append(run(hi))
        time.sleep(5)

    def median_run(runs: list[dict]) -> dict:
        return sorted(runs, key=lambda r: r["docs_per_sec"])[len(runs) // 2]

    r_lo, r_hi = median_run(runs_lo), median_run(runs_hi)
    thr_lo, thr_hi = r_lo["docs_per_sec"], r_hi["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    ceiling = hardware_ceiling(lo, hi)
    result = {
        "metric": f"scaling efficiency (docs/sec, {lo} vs {hi} CPUs, fresh processes)",
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "cpus_lo": lo, "cpus_hi": hi,
        "docs_per_sec_lo": thr_lo, "docs_per_sec_hi": thr_hi,
        "spans_per_sec_lo": r_lo["spans_per_sec"], "spans_per_sec_hi": r_hi["spans_per_sec"],
        "all_runs_lo": [r["docs_per_sec"] for r in runs_lo],
        "all_runs_hi": [r["docs_per_sec"] for r in runs_hi],
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling": round(ceiling, 3),
        "normalized_efficiency": round(eff / ceiling, 3),
        "sf": r_hi["sf"], "bench_sf": r_hi["bench_sf"], "docs": r_hi["docs"],
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    section = (
        "<!-- SCALING:BEGIN -->\n"
        "## Latest scaling run\n\n"
        f"`ray.init(num_cpus={lo})` vs `num_cpus={hi}` (exactly 4×), identical\n"
        f"fixed-block plan, fresh processes, alternating reps={reps}.\n\n"
        f"| metric | {lo} CPUs | {hi} CPUs |\n|---|---|---|\n"
        f"| wall sec | {r_lo['value']} | {r_hi['value']} |\n"
        f"| docs/sec | {thr_lo} | {thr_hi} |\n"
        f"| spans/sec | {r_lo['spans_per_sec']} | {r_hi['spans_per_sec']} |\n"
        f"| all reps (docs/sec) | {result['all_runs_lo']} | {result['all_runs_hi']} |\n\n"
        f"**Scaling efficiency = (thr_hi/thr_lo)/4 = {eff:.3f}** (target ≥ 0.8).\n"
        f"ALU host ceiling {lo}→{hi} measured in the same session: "
        f"**{ceiling:.3f}** → normalized engine efficiency "
        f"{eff:.3f}/{ceiling:.3f} = **{eff/ceiling:.3f}**.\n"
        f"Input: synthesized corpus at sf={r_hi['bench_sf']} = {r_hi['docs']} "
        f"docs, {r_hi['spans']} spans, {r_hi['errors']} error rows.\n"
        "<!-- SCALING:END -->\n"
    )
    path = "BENCH/BASELINE.md"
    try:
        prev = open(path).read()
    except FileNotFoundError:
        prev = ""
    if "<!-- SCALING:BEGIN -->" in prev and "<!-- SCALING:END -->" in prev:
        # curated file: replace only the marked block, keep the multi-level
        # evidence and methodology sections around it
        a = prev.index("<!-- SCALING:BEGIN -->")
        b = prev.index("<!-- SCALING:END -->") + len("<!-- SCALING:END -->")
        if prev[b:b + 1] == "\n":
            b += 1
        out = prev[:a] + section + prev[b:]
    else:
        header = ("# BENCH — measured scaling (sandbox stand-in for N vs 4N "
                  "nodes)\n\nSee bench.py `--scaling` for the protocol.\n\n")
        skew = ""
        if "## Skew robustness" in prev:
            skew = prev[prev.index("## Skew robustness") - 1:]
        out = header + section + skew
    with open(path, "w") as f:
        f.write(out)


def main_skew() -> None:
    """Skew-robustness row (BASELINE.md target table): checkpointed run over
    the sf0.1 corpus — which embeds a ~1000-page PDF (doc 997) and a 50 MB
    payload (doc 9) — with byte-budget planning. Reports that the oversized
    docs land in their own partitions (no co-riders to stall) and the
    per-partition elapsed spread."""
    import shutil

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from pdf_parser_ray.sources.synth import corpus_path
    from pdf_parser_ray.pipelines.extraction import run_extraction
    from pdf_parser_ray.state.manifest import Manifest

    out_dir = "/tmp/bench_skew_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    path = corpus_path(0.1)
    t0 = time.time()
    run_extraction(path, out_dir, byte_budget=2 * 1024 * 1024,
                   compute="tasks", commit_batch_size=100)
    elapsed = time.time() - t0
    recs = Manifest(out_dir).records()
    parts = [{"partition_id": r["partition_id"], "docs": r["metrics"]["docs"],
              "bytes_planned": r["n_input_bytes_planned"]} for r in recs]
    isolated = [p for p in parts if p["docs"] <= 2 and p["bytes_planned"] > 2 * 1024 * 1024]
    result = {
        "metric": "skew robustness (byte-budget partitioning, sf0.1 + embedded 1000x docs)",
        "value": round(elapsed, 3), "unit": "sec",
        "partitions": len(parts),
        "isolated_oversized_partitions": isolated,
        "docs": sum(p["docs"] for p in parts),
    }
    ray.shutdown()
    print(json.dumps(result))
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            "\n## Skew robustness\n\n"
            f"Checkpointed run over sf0.1 (embeds a ~1000-page PDF and a 50 MB payload "
            f"doc): {len(parts)} partitions, wall {elapsed:.1f}s; oversized docs "
            f"isolated into their own partitions by the byte-budget planner: "
            f"{isolated}. No co-riding docs wait behind the stragglers; resume "
            f"granularity stays per-partition.\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--skew" in sys.argv:
        main_skew()
    else:
        main_plain()
