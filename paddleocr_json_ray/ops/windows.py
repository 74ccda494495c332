"""Windowed aggregates over the events stream table.

The reference has no event-time machinery (SURVEY.md §2.8) — these are the
custom operators a training-data pipeline needs, expressed Ray-Data-first:

  * ``events_tumbling`` — tumbling time window as a derived grouping key
    (timestamp truncation inside ``map_batches``), then the native partial
    -aggregate groupby.  No special windowing runtime needed for bounded
    batch data.
  * ``user_sessions`` — gap-based sessionization: ``groupby(user_id)``
    co-locates a user's events, ``map_groups`` sorts by time and splits on
    gaps > timeout.  Per-user state never crosses the group boundary, so the
    one shuffle is the only coordination.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from .relational import _round2

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def events_tumbling(sf_dir: str, unit: str = "hour") -> ray.data.Dataset:
    """(event_type, window_start, n_events, sum_value) per tumbling window."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=unit)
        # epoch microseconds: integer window key, hash-identical across
        # engines (string formatting differs between arrow and SQL dialects)
        return pa.table({"event_type": batch.column("event_type"),
                         "window_start_us": win.cast(pa.int64()),
                         "value": batch.column("value")})

    agg = (ds.map_batches(add_window, batch_format="pyarrow")
             .groupby(["event_type", "window_start_us"])
             .aggregate(Count(), Sum("value")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "window_start_us": batch.column("window_start_us"),
            "n_events": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
            "sum_value": pa.array([_round2(v) for v in batch.column("sum(value)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def events_sliding(sf_dir: str, size_us: int = 3_600_000_000,
                   hop_us: int = 1_800_000_000) -> ray.data.Dataset:
    """Sliding (hopping) window aggregate: size 1h, hop 30min — every event
    contributes to size/hop windows.  The fan-out is derived IN-BATCH (rows
    repeated size/hop times with shifted integer window keys), then the
    native partial-aggregate groupby — no windowing runtime, no state."""
    k = size_us // hop_us
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "ts", "value"])

    def fan_out(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy()
        w0 = (us // hop_us) * hop_us
        n = len(us)
        idx = np.tile(np.arange(n), k)
        shifts = np.repeat(np.arange(k, dtype=np.int64) * hop_us, n)
        return pa.table({
            "event_type": batch.column("event_type").take(pa.array(idx)),
            "window_start_us": pa.array(np.tile(w0, k) - shifts, type=pa.int64()),
            "value": batch.column("value").take(pa.array(idx)),
        })

    agg = (ds.map_batches(fan_out, batch_format="pyarrow")
             .groupby(["event_type", "window_start_us"])
             .aggregate(Count(), Sum("value")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "window_start_us": batch.column("window_start_us"),
            "n_events": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
            "sum_value": pa.array([_round2(v) for v in batch.column("sum(value)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def user_sessions(sf_dir: str, gap_us: int = SESSION_GAP_US) -> ray.data.Dataset:
    """Gap-based sessions per user: (user_id, session_id, n_events,
    session_start_us, session_end_us) with session_id = 1-based rank of the
    session within the user's timeline (epoch-microsecond bounds)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_id", "ts"])

    def sessionize(group: pa.Table) -> pa.Table:
        tab = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = tab.column("ts").cast(pa.int64()).to_numpy()  # microseconds
        user = tab.column("user_id")[0].as_py()
        if len(ts) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "session_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "session_start_us": pa.array([], type=pa.int64()),
                             "session_end_us": pa.array([], type=pa.int64())})
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        session_ids = np.cumsum(new_session)
        starts = np.where(new_session)[0]
        ends = np.append(starts[1:], len(ts)) - 1
        return pa.table({
            "user_id": pa.array([user] * len(starts), type=pa.int64()),
            "session_id": pa.array(range(1, len(starts) + 1), type=pa.int64()),
            "n_events": pa.array((ends - starts + 1).tolist(), type=pa.int64()),
            "session_start_us": pa.array([int(ts[i]) for i in starts], type=pa.int64()),
            "session_end_us": pa.array([int(ts[i]) for i in ends], type=pa.int64()),
        })

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pyarrow")
