"""Stateful streaming-shaped operators (raw Ray actors).

Ray Data has no event-time windows or watermarks (guide: treat stream-shaped
input as an ordered, partitioned log). For semantics a ``groupby.map_groups``
over the sorted log CAN express, use pipelines/relational.events_sessions.
This module is the escape hatch the Dataset API genuinely can't express:
INCREMENTAL state across an unbounded, arriving-in-order stream — one actor
per key-hash bucket holds running state and consumes batches in timestamp
order, emitting closed windows as they complete.

Data path (scale design): the sorted Dataset's block REFS are taken in
order on the driver (refs only — the driver never deserializes event
data); each block is routed to the bucket actors by a worker-side router
task, so payloads flow worker → actor through the object store. Because
router tasks run in parallel, feeds can arrive out of order; every feed
carries the block's global sequence number and each actor reorders —
processing the contiguous prefix incrementally, buffering gaps (the
router feeds every bucket for every block, empty or not, so the prefix
always advances).

Partitioning assumption (documented per the custom-operator contract):
bucket = vec_str_buckets(key) % num_buckets (a fixed-key deterministic
hash), so a key never spans buckets; the
global sort guarantees block n's events all precede block n+1's.
"""

from __future__ import annotations


import pandas as pd

import ray


@ray.remote
class SessionWindowActor:
    """Per-bucket incremental sessionizer: gap > ``gap_us`` closes a session.

    Feeds arrive tagged with a global block sequence number; the actor
    applies the contiguous prefix immediately (incremental emission) and
    buffers out-of-order blocks until the gap fills.
    """

    def __init__(self, gap_us: int, max_buffer: int | None = None):
        self.gap_us = gap_us
        self.state: dict = {}  # key → (session_start, last_ts, n_events)
        self.closed: list[tuple] = []
        self.buffer: dict[int, tuple] = {}  # seq → (keys, ts_us)
        self.next_seq = 0
        # backpressure bound: the driver's sliding submission window
        # guarantees ≤ max_in_flight out-of-order feeds can be outstanding,
        # so a larger buffer means the contract broke — fail loudly instead
        # of growing without bound (at 10^7 blocks an unbounded gap buffer
        # is an OOM, not a warning).
        self.max_buffer = max_buffer

    def _apply(self, keys: list, ts_us: list) -> None:
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

    def feed(self, seq: int, keys: list, ts_us: list) -> int:
        # idempotence guard: a retried router task (Ray tasks are
        # at-least-once) may re-deliver an already-applied or already-
        # buffered seq — applying it twice would corrupt session counts
        if seq < self.next_seq or seq in self.buffer:
            return len(self.closed)
        if self.max_buffer is not None and len(self.buffer) >= self.max_buffer:
            raise RuntimeError(
                f"gap buffer exceeded max_buffer={self.max_buffer} "
                f"(next_seq={self.next_seq}, got seq={seq}); the router "
                "submission window is not bounding out-of-order delivery")
        self.buffer[seq] = (keys, ts_us)
        while self.next_seq in self.buffer:
            k, t = self.buffer.pop(self.next_seq)
            self._apply(k, t)
            self.next_seq += 1
        return len(self.closed)

    def flush(self) -> list[tuple]:
        """End-of-stream: drain any buffered blocks in seq order, close all
        open sessions, return every window."""
        for seq in sorted(self.buffer):
            k, t = self.buffer[seq]
            self._apply(k, t)
        self.buffer = {}
        for k, (start, last, n) in sorted(self.state.items()):
            self.closed.append((k, start, last, n))
        self.state = {}
        return self.closed


@ray.remote
def _route_block(block, seq: int, actors: list, key_col: str, ts_col: str,
                 num_buckets: int):
    """Worker-side router: split one (already-sorted) block by key bucket and
    feed every bucket actor — empty feeds included so each actor's seq
    prefix always advances. Blocks until every feed is accepted, then
    returns the feed count (driver windows on router completion)."""
    df = block.to_pandas() if hasattr(block, "to_pandas") else block
    # resolution-independent µs (bare int64 cast gives ns for datetime64[ns],
    # shrinking the effective gap threshold 1000×)
    from ..pipelines.relational import ts_int_us, vec_str_buckets

    ts_us = pd.Series(ts_int_us(df[ts_col]))
    buckets = pd.Series(vec_str_buckets(df[key_col], num_buckets),
                        index=df.index)
    refs = []
    for b, actor in enumerate(actors):
        mask = buckets == b
        refs.append(actor.feed.remote(
            seq, df[key_col][mask].tolist(), ts_us[mask].tolist()))
    # the router completes only once every bucket actor ACCEPTED its feed —
    # this is what makes the driver's sliding window a real backpressure
    # bound on the actors' gap buffers
    ray.get(refs)
    return len(refs)


def sessionize_stream(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                      gap_minutes: int = 30, num_buckets: int = 4,
                      max_in_flight: int = 64) -> pd.DataFrame:
    """Incremental sessionization of an ordered event log via bucket actors.

    Returns (key, session_start, session_end, n_events) for every session.
    Matches the batch map_groups sessionizer on any input (tested). The
    driver touches only block refs and seq numbers; event payloads move
    worker → actor.

    Backpressure: at most ``max_in_flight`` router tasks run at once, and
    the window slides in SEQ ORDER (wait on the oldest outstanding router
    before submitting the next), so any gap-buffered seq is within the
    current window — each actor's out-of-order buffer is bounded by
    ``max_in_flight`` blocks and the actor enforces that bound loudly.

    ORDERING ASSUMPTION (documented per the custom-operator contract): a
    real stream arrives time-ordered from its source (Kafka partition, log
    segment, CDC feed) — the global ``sort(ts)`` below exists ONLY because
    this demo replays a static parquet table as a stream and must
    manufacture arrival order first. At 100 TB you would NOT run this
    sort: feed ``iter_internal_ref_bundles`` from the ordered source
    directly (the routing, seq-reorder, backpressure and actor-state
    machinery downstream is the part that scales; the sort is scaffolding,
    priced accordingly in any bench reading of this operator).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    actors = [SessionWindowActor.remote(gap_us, max_buffer=max_in_flight)
              for _ in range(num_buckets)]
    ordered = ds.sort(ts_col)

    pending: list = []
    seq = 0
    for bundle in ordered.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            if len(pending) >= max_in_flight:
                ray.get(pending.pop(0))  # oldest-first: window slides in seq order
            pending.append(_route_block.remote(
                block_ref, seq, actors, key_col, ts_col, num_buckets))
            seq += 1
    # barrier: every feed accepted before flush (routers confirm acceptance)
    ray.get(pending)
    rows = []
    for a in actors:
        rows.extend(ray.get(a.flush.remote()))
    for a in actors:
        ray.kill(a)
    out = pd.DataFrame(rows, columns=[key_col, "session_start", "session_end",
                                      "n_events"])
    return out.sort_values([key_col, "session_start"], ignore_index=True)
