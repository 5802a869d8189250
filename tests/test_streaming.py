"""Incremental (actor-state) sessionization must match the batch
map_groups sessionizer on the same input."""

import pandas as pd
import pytest


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
