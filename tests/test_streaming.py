"""Incremental (actor-state) sessionization must match the batch
map_groups sessionizer on the same input."""

import pandas as pd
import pytest


def pa_table_ns(df):
    """pandas frame → Arrow table preserving timestamp[ns]."""
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False)


@pytest.mark.usefixtures("ray_session")
class TestStreamingSessions:
    def test_matches_batch_sessionizer(self):
        import ray.data
        from pdf_parser_ray.pipelines.relational import events_sessions
        from pdf_parser_ray.stages.streaming import sessionize_stream

        sf = "/root/testdata/sf0.001"
        batch = events_sessions(sf).to_pandas().sort_values(
            "user_id", ignore_index=True)

        ds = ray.data.read_parquet(f"{sf}/events.parquet",
                                   columns=["user_id", "ts"])
        stream = sessionize_stream(ds, gap_minutes=30, num_buckets=3)
        per_user = stream.groupby("user_id", as_index=False).agg(
            n_sessions=("session_start", "size"),
            n_events=("n_events", "sum"))
        per_user = per_user.sort_values("user_id", ignore_index=True)

        assert per_user["user_id"].tolist() == batch["user_id"].tolist()
        assert per_user["n_sessions"].tolist() == batch["n_sessions"].tolist()
        assert per_user["n_events"].tolist() == batch["n_events"].tolist()

    def test_window_bounds_sane(self):
        import ray.data
        from pdf_parser_ray.stages.streaming import sessionize_stream

        rows = [
            {"user_id": 1, "ts": 0},
            {"user_id": 1, "ts": 10 * 60 * 1_000_000},        # same session
            {"user_id": 1, "ts": 120 * 60 * 1_000_000},       # new session
            {"user_id": 2, "ts": 5},
        ]
        import pyarrow as pa

        t = pa.table({"user_id": [r["user_id"] for r in rows],
                      "ts": pa.array([r["ts"] for r in rows],
                                     type=pa.timestamp("us"))})
        ds = ray.data.from_arrow(t)
        out = sessionize_stream(ds, gap_minutes=30, num_buckets=2)
        u1 = out[out["user_id"] == 1]
        assert len(u1) == 2
        assert u1.iloc[0]["n_events"] == 2 and u1.iloc[1]["n_events"] == 1
        assert len(out[out["user_id"] == 2]) == 1

    def test_ns_resolution_gap_semantics(self):
        """datetime64[ns] input must use the SAME gap threshold as [us] —
        a bare int64 cast would make the threshold 1000× too small."""
        import pyarrow as pa
        import ray.data
        from pdf_parser_ray.stages.streaming import sessionize_stream

        ts_us = [0, 10 * 60 * 1_000_000, 120 * 60 * 1_000_000]
        t = pa.table({"user_id": [1, 1, 1],
                      "ts": pa.array(
                          [v * 1000 for v in ts_us], type=pa.timestamp("ns"))})
        out = sessionize_stream(ray.data.from_arrow(t),
                                gap_minutes=30, num_buckets=2)
        # 0 and 10min share a session; 2h starts a new one → exactly 2
        assert len(out) == 2
        assert sorted(out["n_events"]) == [1, 2]

    def test_ns_resolution_batch_sessions(self):
        """events_sessions over a ns-resolution frame matches µs semantics."""
        import numpy as np
        import pandas as pd
        import ray.data
        from pdf_parser_ray.pipelines.relational import events_sessions
        import os, tempfile

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime([0, 10 * 60, 120 * 60, 0], unit="s"),
        })
        assert df["ts"].dtype == "datetime64[ns]"
        tmp = tempfile.mkdtemp()
        # force ns storage so read-back stays ns
        import pyarrow.parquet as pq
        pq.write_table(
            pa_table_ns(df), os.path.join(tmp, "events.parquet"),
            coerce_timestamps=None)
        out = events_sessions(tmp).to_pandas().sort_values(
            "user_id", ignore_index=True)
        assert out["n_sessions"].tolist() == [2, 1]

    def test_out_of_order_feeds_reordered(self, ray_session=None):
        """Feeds arriving out of seq order must be buffered and applied in
        order — the worker-side router makes no delivery-order promise."""
        import ray
        from pdf_parser_ray.stages.streaming import SessionWindowActor

        gap_us = 30 * 60 * 1_000_000
        a = SessionWindowActor.remote(gap_us)
        h = 3_600_000_000  # 1h in us
        # seq 2 (t=2h, 3h: new session after gap) arrives BEFORE seq 0/1
        ray.get(a.feed.remote(2, ["u"], [3 * h]))
        ray.get(a.feed.remote(0, ["u"], [0]))
        ray.get(a.feed.remote(1, ["u"], [10 * 60 * 1_000_000]))
        rows = ray.get(a.flush.remote())
        ray.kill(a)
        # session 1: [0, 10min]; session 2: [3h, 3h]
        assert len(rows) == 2
        assert rows[0][3] == 2 and rows[1][3] == 1

    def test_out_of_order_routers_with_induced_delay(self):
        """Routers completing in REVERSE seq order (induced sleeps) must
        still produce correct sessions — the per-actor seq reorder buffer is
        what's under test."""
        import time

        import ray
        from pdf_parser_ray.stages.streaming import SessionWindowActor

        gap_us = 30 * 60 * 1_000_000
        actor = SessionWindowActor.remote(gap_us, max_buffer=8)

        @ray.remote
        def delayed_feed(seq, keys, ts, delay_s):
            time.sleep(delay_s)
            return ray.get(actor.feed.remote(seq, keys, ts))

        h = 3_600_000_000
        blocks = [(0, ["u"], [0]), (1, ["u"], [10 * 60 * 1_000_000]),
                  (2, ["u"], [3 * h]), (3, ["u"], [3 * h + 60_000_000])]
        # later seqs get SHORTER delays → delivery order is reversed
        refs = [delayed_feed.remote(s, k, t, 0.05 * (len(blocks) - s))
                for s, k, t in blocks]
        ray.get(refs)
        rows = ray.get(actor.flush.remote())
        ray.kill(actor)
        assert len(rows) == 2
        assert rows[0][3] == 2 and rows[1][3] == 2

    def test_buffer_cap_enforced(self):
        """A gap buffer growing past max_buffer must fail loudly, not OOM."""
        import pytest
        import ray
        from pdf_parser_ray.stages.streaming import SessionWindowActor

        actor = SessionWindowActor.remote(1, max_buffer=2)
        # seq 0 never arrives; 1..3 must overflow the cap of 2
        ray.get(actor.feed.remote(1, ["u"], [1]))
        ray.get(actor.feed.remote(2, ["u"], [2]))
        with pytest.raises(ray.exceptions.RayTaskError, match="max_buffer"):
            ray.get(actor.feed.remote(3, ["u"], [3]))
        ray.kill(actor)

    def test_sliding_window_bounds_buffer(self):
        """End-to-end with a tiny max_in_flight: correctness holds and the
        actor-side cap (== max_in_flight) is never tripped."""
        import numpy as np
        import pandas as pd
        import ray.data
        from pdf_parser_ray.stages.streaming import sessionize_stream

        rng = np.random.default_rng(5)
        n = 1500
        df = pd.DataFrame({
            "user_id": rng.integers(0, 11, size=n),
            "ts": pd.to_datetime(
                np.sort(rng.integers(0, 24 * 3600, size=n)), unit="s"),
        })
        ds = ray.data.from_pandas(df).repartition(12)
        out = sessionize_stream(ds, gap_minutes=30, num_buckets=3,
                                max_in_flight=2)
        assert out["n_events"].sum() == n

    def test_many_blocks_roundtrip(self):
        """Sessionization over a log spread across many blocks matches the
        batch sessionizer (exercises the ref-bundle seq path)."""
        import numpy as np
        import pandas as pd
        import ray.data
        from pdf_parser_ray.pipelines.relational import events_sessions
        from pdf_parser_ray.stages.streaming import sessionize_stream

        rng = np.random.default_rng(11)
        n = 4000
        df = pd.DataFrame({
            "user_id": rng.integers(0, 37, size=n),
            "ts": pd.to_datetime(
                np.sort(rng.integers(0, 3 * 24 * 3600, size=n)), unit="s"),
        })
        ds = ray.data.from_pandas(df).repartition(16)
        got = sessionize_stream(ds, gap_minutes=30, num_buckets=4)
        per_user = got.groupby("user_id", as_index=False).agg(
            n_sessions=("session_start", "size"), n_events=("n_events", "sum"))

        import tempfile, os
        tmp = tempfile.mkdtemp()
        ds.write_parquet(os.path.join(tmp, "events.parquet"))
        want = events_sessions(tmp).to_pandas()
        merged = per_user.merge(want, on="user_id", suffixes=("_got", "_want"))
        assert len(merged) == len(want)
        assert (merged["n_sessions_got"] == merged["n_sessions_want"]).all()
        assert (merged["n_events_got"] == merged["n_events_want"]).all()
