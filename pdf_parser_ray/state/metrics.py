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
