"""Stateful streaming-shaped operators (raw Ray actors).

Ray Data has no event-time windows or watermarks (guide: treat stream-shaped
input as an ordered, partitioned log). For semantics a ``groupby.map_groups``
over the sorted log CAN express, use pipelines/relational.events_sessions.
This module is the escape hatch the Dataset API genuinely can't express:
INCREMENTAL state across an unbounded, arriving-in-order stream — one actor
per key-hash bucket holds running state and consumes batches in timestamp
order, emitting closed windows as they complete.

Partitioning assumption (documented per the custom-operator contract): the
feed must deliver each key's events in non-decreasing ts order per bucket;
bucket = crc32(key) % num_buckets, so a key never spans buckets.
"""

from __future__ import annotations

import zlib

import pandas as pd

import ray


@ray.remote
class SessionWindowActor:
    """Per-bucket incremental sessionizer: gap > ``gap_us`` closes a session."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        self.state: dict = {}  # key → (session_start, last_ts, n_events)
        self.closed: list[tuple] = []

    def feed(self, keys: list, ts_us: list) -> int:
        for k, t in zip(keys, ts_us):
            st = self.state.get(k)
            if st is None:
                self.state[k] = (t, t, 1)
            else:
                start, last, n = st
                if t - last > self.gap_us:
                    self.closed.append((k, start, last, n))
                    self.state[k] = (t, t, 1)
                else:
                    self.state[k] = (start, t, n + 1)
        return len(self.closed)

    def flush(self) -> list[tuple]:
        """Close all open sessions (end-of-stream) and return every window."""
        for k, (start, last, n) in sorted(self.state.items()):
            self.closed.append((k, start, last, n))
        self.state = {}
        return self.closed


def sessionize_stream(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                      gap_minutes: int = 30, num_buckets: int = 4) -> pd.DataFrame:
    """Incremental sessionization of an ordered event log via bucket actors.

    The Dataset is consumed in ts order on the driver (iter_batches over the
    pre-sorted log) and routed to per-bucket actors; actors emit closed
    windows incrementally. Returns (key, session_start, session_end,
    n_events) for every session. Matches the batch map_groups sessionizer
    on any input (tested).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    actors = [SessionWindowActor.remote(gap_us) for _ in range(num_buckets)]
    ordered = ds.sort(ts_col)
    pending = []
    for batch in ordered.iter_batches(batch_format="pandas", batch_size=8192):
        ts_us = batch[ts_col].astype("int64")
        buckets = batch[key_col].map(
            lambda k: zlib.crc32(str(k).encode()) % num_buckets)
        for b in range(num_buckets):
            mask = buckets == b
            if mask.any():
                pending.append(actors[b].feed.remote(
                    batch[key_col][mask].tolist(), ts_us[mask].tolist()))
    ray.get(pending)  # barrier: all feeds applied in order before flush
    rows = []
    for a in actors:
        rows.extend(ray.get(a.flush.remote()))
    for a in actors:
        ray.kill(a)
    out = pd.DataFrame(rows, columns=[key_col, "session_start", "session_end",
                                      "n_events"])
    return out.sort_values([key_col, "session_start"], ignore_index=True)
