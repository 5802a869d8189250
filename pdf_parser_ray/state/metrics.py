"""Per-operation observability (reference parity: the `@observe`-decorated
extractor methods, classic_extractor.py:61 / ai_extractor.py — a
Langfuse-style tracing hook; this repo's analogue is dependency-free).

``@observe("op")`` records call count, total/max wall seconds, and error
count into a per-PROCESS registry — in Ray that means per worker/actor
process, which is the useful granularity (each actor reports its own op
latencies). ``snapshot()`` returns the registry as plain dicts, so a
stage can fold it into its output metrics (e.g. the manifest's
per-partition metrics dict) for driver-side aggregation; ``reset()``
clears it (tests / per-partition scoping).
"""

from __future__ import annotations

import functools
import threading
import time

_LOCK = threading.Lock()
_REGISTRY: dict[str, dict] = {}


def _entry(name: str) -> dict:
    e = _REGISTRY.get(name)
    if e is None:
        e = _REGISTRY[name] = {"calls": 0, "errors": 0,
                               "total_s": 0.0, "max_s": 0.0}
    return e


def observe(name: str):
    """Decorator: time each call of the wrapped function under ``name``."""

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                return fn(*args, **kwargs)
            except Exception:
                with _LOCK:
                    _entry(name)["errors"] += 1
                raise
            finally:
                dt = time.perf_counter() - t0
                with _LOCK:
                    e = _entry(name)
                    e["calls"] += 1
                    e["total_s"] += dt
                    e["max_s"] = max(e["max_s"], dt)

        return inner

    return wrap


def record(name: str, seconds: float, error: bool = False) -> None:
    """Imperative form for call sites where a decorator doesn't fit."""
    with _LOCK:
        e = _entry(name)
        e["calls"] += 1
        e["total_s"] += seconds
        e["max_s"] = max(e["max_s"], seconds)
        if error:
            e["errors"] += 1


def snapshot() -> dict[str, dict]:
    with _LOCK:
        return {k: dict(v) for k, v in _REGISTRY.items()}


def reset() -> None:
    with _LOCK:
        _REGISTRY.clear()


def drain() -> dict[str, dict]:
    """Atomically snapshot and clear (flush-to-aggregator primitive)."""
    with _LOCK:
        out = {k: dict(v) for k, v in _REGISTRY.items()}
        _REGISTRY.clear()
        return out


# ---------------------------------------------------------------------------
# Cluster-wide collection: a named aggregator actor the driver opts into.
# Workers flush their per-process registries to it (fire-and-forget);
# the driver fetches merged totals at end of run.
# ---------------------------------------------------------------------------

_AGGREGATOR_NAME = "pdf_parser_ray_metrics"
_flush_counter = 0
_cached_agg = None  # positive actor-handle cache (per process)


class MetricsAggregator:
    """Merged op-metrics across all worker processes (driver-owned actor)."""

    def __init__(self):
        self.totals: dict[str, dict] = {}

    def merge(self, snap: dict[str, dict]) -> None:
        for k, v in snap.items():
            e = self.totals.setdefault(
                k, {"calls": 0, "errors": 0, "total_s": 0.0, "max_s": 0.0})
            e["calls"] += v["calls"]
            e["errors"] += v["errors"]
            e["total_s"] += v["total_s"]
            e["max_s"] = max(e["max_s"], v["max_s"])

    def get_totals(self) -> dict[str, dict]:
        return {k: dict(v) for k, v in self.totals.items()}


def create_aggregator():
    """Driver-side: create (or reuse) the named aggregator actor."""
    import ray

    return ray.remote(MetricsAggregator).options(
        name=_AGGREGATOR_NAME, get_if_exists=True).remote()


def destroy_aggregator() -> None:
    import ray

    try:
        ray.kill(ray.get_actor(_AGGREGATOR_NAME))
    except ValueError:
        pass


def maybe_flush(every: int = 1) -> None:
    """Worker-side: every ``every`` calls, ship the local registry to the
    aggregator actor if the driver created one; otherwise DISCARD it (a
    registry left to accumulate across pipelines would be absorbed into
    whichever later run first creates an aggregator, over-reporting its
    totals — and would grow without bound in warm workers).

    Cost at every=1 (measured rationale): one cached-handle actor call
    round-trip ≈ 0.5 ms per ~200 ms parse batch, <0.5% — and the
    synchronous wait is what guarantees the driver's post-run totals see
    every flush (actor mailboxes have no cross-sender ordering)."""
    global _flush_counter, _cached_agg

    _flush_counter += 1
    if _flush_counter < every:
        return
    _flush_counter = 0
    import ray

    if not ray.is_initialized():
        return
    agg = _cached_agg
    if agg is None:
        try:
            agg = _cached_agg = ray.get_actor(_AGGREGATOR_NAME)
        except ValueError:
            drain()  # no collector → discard, don't accumulate stale state
            return
    snap = drain()
    if snap:
        try:
            ray.get(agg.merge.remote(snap))
        except Exception:
            _cached_agg = None  # actor died (run ended) → drop the handle
