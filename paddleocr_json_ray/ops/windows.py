"""Windowed aggregates over the events stream table.

The reference has no event-time machinery (SURVEY.md §2.8) — these are the
custom operators a training-data pipeline needs, expressed Ray-Data-first:

  * ``events_tumbling`` / ``events_sliding`` — window keys derived IN-BATCH
    (timestamp truncation / k-fold fan-out), then the native partial-
    aggregate groupby.  No windowing runtime needed for bounded batch data.
  * ``user_sessions`` — gap-based sessionization on the sorted-run pattern:
    one global (user, ts) sort, vectorized per-block sessionization, and a
    grouped heal that merges block-local PARTIAL sessions (the mergeable
    sufficient statistic) for users straddling block boundaries.
  * ``events_running_total`` — unbounded-preceding cumulative sum: run-
    local prefix sums per block + an O(blocks) offset chain healed per
    boundary user.
  * ``events_rolling_sum`` — bounded ROWS-k-PRECEDING window: only the
    first k-1 rows of a boundary run need the previous block's last k-1
    rows, so the heal exchange is constant per block boundary.
  * ``events_lag_diff`` — the LAG window shape (time since the same user's
    previous event): the sufficient statistic is ONE row per block edge —
    only a block's first row can have its predecessor in another block, and
    only a block's last row can be that predecessor.
  * ``events_cume_dist`` — the GLOBAL rank shape (CUME_DIST over the whole
    table): one value sort, per-block vectorized local ranks, and an
    O(blocks) statistics exchange that heals offsets and cross-block ties;
    no row ever leaves its block.
  * ``cohort_retention`` — the retention-matrix shape: first-seen day per
    user (grouped Min, broadcast) x distinct activity days (pair-bounded
    combiner groupby) -> (cohort, offset) counts.
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
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

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
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

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


def _sessions_for(user_ids: np.ndarray, ts: np.ndarray, gap_us: int,
                  run_starts: np.ndarray, run_stops: np.ndarray) -> pa.Table:
    """Vectorized gap-split sessionization over contiguous per-user runs of
    a (user-major, time-ordered) row range."""
    out = {"user_id": [], "session_id": [], "n_events": [],
           "session_start_us": [], "session_end_us": []}
    for s, e in zip(run_starts, run_stops):
        t = ts[s:e]
        new = np.ones(len(t), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(t)) - 1
        out["user_id"].extend([int(user_ids[s])] * len(starts))
        out["session_id"].extend(range(1, len(starts) + 1))
        out["n_events"].extend((ends - starts + 1).tolist())
        out["session_start_us"].extend(int(t[i]) for i in starts)
        out["session_end_us"].extend(int(t[i]) for i in ends)
    return pa.table({k: pa.array(v, type=pa.int64()) for k, v in out.items()})


def user_sessions(sf_dir: str, gap_us: int = SESSION_GAP_US) -> ray.data.Dataset:
    """Gap-based sessions per user: (user_id, session_id, n_events,
    session_start_us, session_end_us) with session_id = 1-based rank of the
    session within the user's timeline (epoch-microsecond bounds).

    One global sort by (user, ts, event_id) replaces the per-user Python
    groupby: each sorted block sessionizes its complete interior user runs
    vectorized.  Users straddling a block boundary are ALSO sessionized
    block-locally — per-block sessions are mergeable sufficient statistics
    (two adjacent partial sessions fuse iff next.start - prev.end <= gap) —
    and a distributed grouped heal merges the partial-session chains.
    Skew-safe: a hot user spanning B blocks ships its per-block session
    summaries (compressed, never raw events) to ONE heal task, and the
    driver sees no rows at all."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts"])
    return _sessionize_ds(ds, gap_us)


def _sessionize_ds(ds: "ray.data.Dataset",
                   gap_us: int) -> "ray.data.Dataset":
    """The sessionization exchange over any (user_id, event_id, ts)
    dataset (user_sessions' core, shared with the streaming variant)."""
    srt = ds.sort(["user_id", "ts", "event_id"])

    def block_sessions(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        n = len(u)
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "user_id": pa.array([], type=pa.int64()),
                          "session_id": pa.array([], type=pa.int64()),
                          "n_events": pa.array([], type=pa.int64()),
                          "session_start_us": pa.array([], type=pa.int64()),
                          "session_end_us": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, n]
        interior = _sessions_for(u, t, gap_us, starts[1:-1], stops[1:-1]) \
            if len(starts) > 2 else empty.drop_columns(["kind"])
        # boundary runs: block-local PARTIAL sessions (compressed sufficient
        # statistics), not raw rows — session_id is assigned in the heal
        e_starts = (starts[[0, -1]], stops[[0, -1]]) if len(starts) > 1 \
            else (starts[[0]], stops[[0]])
        edge = _sessions_for(u, t, gap_us, e_starts[0], e_starts[1])
        k = np.r_[np.zeros(interior.num_rows, dtype=np.int8),
                  np.ones(edge.num_rows, dtype=np.int8)]
        both = pa.concat_tables([interior, edge])
        return pa.table({
            "kind": pa.array(k),
            "user_id": both.column("user_id"),
            "session_id": both.column("session_id"),
            "n_events": both.column("n_events"),
            "session_start_us": both.column("session_start_us"),
            "session_end_us": both.column("session_end_us"),
        })

    out = srt.map_batches(block_sessions, batch_format="pyarrow",
                          batch_size=None).materialize()
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).drop_columns(["kind"]),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(
            ["user_id", "n_events", "session_start_us", "session_end_us"]),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        s = group.column("session_start_us").to_numpy().astype(np.int64)
        e = group.column("session_end_us").to_numpy().astype(np.int64)
        nv = group.column("n_events").to_numpy().astype(np.int64)
        order = np.argsort(s, kind="stable")
        s, e, nv = s[order], e[order], nv[order]
        new = np.r_[True, (s[1:] - e[:-1]) > gap_us]
        st = np.flatnonzero(new)
        return pa.table({
            "user_id": group.column("user_id").slice(0, len(st)),
            "session_id": pa.array(np.arange(1, len(st) + 1, dtype=np.int64)),
            "n_events": pa.array(np.add.reduceat(nv, st), type=pa.int64()),
            "session_start_us": pa.array(s[st], type=pa.int64()),
            "session_end_us": pa.array(np.maximum.reduceat(e, st), type=pa.int64()),
        })

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def events_running_total(sf_dir: str) -> ray.data.Dataset:
    """(event_id, running_cents) — per-user cumulative sum in (ts, event_id)
    order: the unbounded-preceding window-function shape.

    One global sort by (user, ts, event_id); each block computes run-local
    prefix sums vectorized.  Only runs touching a block EDGE can continue a
    user from a previous block, so per-run totals are emitted for boundary
    runs alone — the offset exchange is O(blocks), not O(users) — healed by
    a grouped exclusive-cumsum per boundary user and broadcast back as
    object-store refs.  Values are half-away-rounded integer cents so the
    prefix sums are hash-exact against the SQL window oracle."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def to_cents(v: np.ndarray) -> np.ndarray:
        av = np.floor(np.abs(v) * 100.0 + 0.5)
        return (np.sign(v) * av).astype(np.int64)

    def block_prefix(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        c = to_cents(batch.column("value").to_numpy().astype(np.float64))
        n = len(u)
        empty = pa.table({k: pa.array([], type=pa.int64())
                          for k in ("kind", "event_id", "user_id", "seg_ts",
                                    "seg_eid", "cents")})
        if n == 0:
            return empty
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, n]
        run_id = np.cumsum(np.r_[True, np.diff(u) != 0]) - 1
        cs = np.cumsum(c)
        base = np.r_[0, cs[starts[1:] - 1]]
        partial = cs - base[run_id]
        is_edge_run = (run_id == 0) | (run_id == len(starts) - 1)
        # rows: seg identity only for edge runs (others never need an offset)
        seg_ts = np.where(is_edge_run, t[starts[run_id]], 0)
        seg_eid = np.where(is_edge_run, e[starts[run_id]], -1)
        rows = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "event_id": pa.array(e),
            "user_id": pa.array(u),
            "seg_ts": pa.array(seg_ts.astype(np.int64)),
            "seg_eid": pa.array(seg_eid.astype(np.int64)),
            "cents": pa.array(partial),
        })
        # one total row per EDGE run (first/last of the block)
        er = np.unique(run_id[is_edge_run])
        seg = pa.table({
            "kind": pa.array(np.ones(len(er), dtype=np.int64)),
            "event_id": pa.array(np.zeros(len(er), dtype=np.int64)),
            "user_id": pa.array(u[starts[er]], type=pa.int64()),
            "seg_ts": pa.array(t[starts[er]], type=pa.int64()),
            "seg_eid": pa.array(e[starts[er]], type=pa.int64()),
            "cents": pa.array(cs[stops[er] - 1] - base[er], type=pa.int64()),
        })
        return pa.concat_tables([rows, seg])

    out = srt.map_batches(block_prefix, batch_format="pyarrow",
                          batch_size=None).materialize()
    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).drop_columns(["kind"]),
        batch_format="pyarrow")
    segs = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["user_id", "seg_ts", "seg_eid", "cents"]),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        ts = group.column("seg_ts").to_numpy().astype(np.int64)
        eid = group.column("seg_eid").to_numpy().astype(np.int64)
        tot = group.column("cents").to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts))
        off = np.zeros(len(order), dtype=np.int64)
        off[order[1:]] = np.cumsum(tot[order])[:-1]
        return pa.table({
            "user_id": group.column("user_id"),
            "seg_ts": group.column("seg_ts"),
            "seg_eid": group.column("seg_eid"),
            "offset": pa.array(off, type=pa.int64()),
        })

    offsets = segs.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    refs = offsets.materialize().to_arrow_refs()

    def add_offsets(batch: pa.Table, offset_refs) -> pa.Table:
        tabs = [t for t in ray.get(list(offset_refs)) if t.num_rows]
        lut: dict = {}
        for t_ in tabs:
            for u_, ts_, e_, o_ in zip(t_.column("user_id").to_pylist(),
                                       t_.column("seg_ts").to_pylist(),
                                       t_.column("seg_eid").to_pylist(),
                                       t_.column("offset").to_pylist()):
                lut[(u_, ts_, e_)] = o_
        u = batch.column("user_id").to_pylist()
        st = batch.column("seg_ts").to_pylist()
        se = batch.column("seg_eid").to_pylist()
        c = batch.column("cents").to_numpy().astype(np.int64)
        off = np.fromiter((lut.get((u_, t_, e_), 0) if e_ >= 0 else 0
                           for u_, t_, e_ in zip(u, st, se)),
                          dtype=np.int64, count=len(u))
        return pa.table({"event_id": batch.column("event_id"),
                         "running_cents": pa.array(c + off, type=pa.int64())})

    return rows.map_batches(add_offsets, batch_format="pyarrow", fn_args=(refs,))


def _adjacent_diff(sf_dir: str, lead: bool, col: str) -> ray.data.Dataset:
    """Shared LAG/LEAD kernel: (event_id, <col> nullable) — microseconds
    to the same user's adjacent event in (ts, event_id) order (previous
    event for LAG, next event for LEAD).

    Sorted-run pattern with a ONE-ROW sufficient statistic per block edge:
    after the global (user, ts, event_id) sort, every row's neighbor is in
    the same block except one boundary row per block — for LAG the FIRST
    row (predecessor, if any, is some earlier block's LAST row of the same
    user), for LEAD the LAST row (successor is a later block's FIRST row);
    sort contiguity guarantees the nearest such row is a block-boundary
    row.  Each block emits all interior diffs final, withholds its one
    boundary row, and ships the opposite boundary row as context; a
    grouped heal re-derives the withheld diffs.  Skew-safe: a hot user
    costs 2 rows per block it spans, never its row count."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def block_diff(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        n = len(u)
        if n == 0:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "event_id": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "ts": pa.array([], type=pa.int64()),
                             col: pa.array([], type=pa.int64())})
        diff = np.zeros(n, dtype=np.int64)
        same = np.zeros(n, dtype=bool)
        if n > 1:
            if lead:
                diff[:-1] = t[1:] - t[:-1]
                same[:-1] = u[1:] == u[:-1]
            else:
                diff[1:] = t[1:] - t[:-1]
                same[1:] = u[1:] == u[:-1]
        kind = np.zeros(n, dtype=np.int8)
        kind[n - 1 if lead else 0] = 1     # withheld: neighbor unknown
        # opposite boundary row: context copy (n==1 rows are kind-1 only —
        # the heal reads their ts from the withheld row itself)
        ctx = (0 if lead else n - 1) if n > 1 else None
        base = pa.table({"kind": pa.array(kind),
                         "event_id": pa.array(e),
                         "user_id": pa.array(u),
                         "ts": pa.array(t),
                         col: pa.array(diff, type=pa.int64(), mask=~same)})
        if ctx is None:
            return base
        ctx_tab = pa.table({"kind": pa.array([2], type=pa.int8()),
                            "event_id": pa.array([int(e[ctx])], type=pa.int64()),
                            "user_id": pa.array([int(u[ctx])], type=pa.int64()),
                            "ts": pa.array([int(t[ctx])], type=pa.int64()),
                            col: pa.array([None], type=pa.int64())})
        return pa.concat_tables([base, ctx_tab])

    out = srt.map_batches(block_diff, batch_format="pyarrow",
                          batch_size=None).materialize()
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["event_id", col]),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.greater(b.column("kind"), 0)),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        e = group.column("event_id").to_numpy().astype(np.int64)
        t = group.column("ts").to_numpy().astype(np.int64)
        kind = group.column("kind").to_numpy().astype(np.int8)
        # dedupe by event_id keeping the withheld flag if present (a row
        # cannot be both its own block's withheld AND context — ctx is the
        # opposite boundary — but defensively prefer kind-1)
        order = np.lexsort((-kind.astype(np.int64), e))
        e, t, kind = e[order], t[order], kind[order]
        first = np.r_[True, np.diff(e) != 0]
        e, t, kind = e[first], t[first], kind[first]
        order = np.lexsort((e, t))
        e, t, kind = e[order], t[order], kind[order]
        m = len(e)
        diff = np.zeros(m, dtype=np.int64)
        have = np.zeros(m, dtype=bool)
        if m > 1:
            if lead:
                diff[:-1] = t[1:] - t[:-1]
                have[:-1] = True
            else:
                diff[1:] = t[1:] - t[:-1]
                have[1:] = True
        keep = kind == 1
        return pa.table({"event_id": pa.array(e[keep], type=pa.int64()),
                         col: pa.array(diff[keep], type=pa.int64(),
                                       mask=~have[keep])})

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def events_lag_diff(sf_dir: str) -> ray.data.Dataset:
    """(event_id, lag_us nullable) — microseconds since the same user's
    previous event: LAG(ts) OVER (PARTITION BY user ORDER BY ts, event_id).
    See ``_adjacent_diff`` for the skew-safe sorted-block plan."""
    return _adjacent_diff(sf_dir, lead=False, col="lag_us")


def events_lead_diff(sf_dir: str) -> ray.data.Dataset:
    """(event_id, lead_us nullable) — microseconds until the same user's
    next event: LEAD(ts) OVER (PARTITION BY user ORDER BY ts, event_id),
    the forward partner of ``events_lag_diff`` (e.g. time-on-page /
    inter-arrival features).  Same skew-safe sorted-block plan, mirrored:
    the block's LAST row is withheld and its FIRST row ships as context."""
    return _adjacent_diff(sf_dir, lead=True, col="lead_us")


def events_cume_dist(sf_dir: str) -> ray.data.Dataset:
    """(event_id, cume_dist) — CUME_DIST() OVER (ORDER BY value): the
    fraction of rows with value <= this row's value.  The GLOBAL (whole-
    table) rank shape: unlike the per-user windows above there is no
    partitioning key to shuffle by, so the pattern is one global value
    sort + per-block local ranks + an O(blocks) sufficient-statistics heal.

    CUME_DIST is a pure function of the value (count of <= v over N), so
    after the sort every block can rank its rows locally (one vectorized
    ``searchsorted`` against its own sorted values); the only cross-block
    facts a row needs are (a) how many rows live in earlier blocks — all of
    which are <= v by sort order — and (b) for rows TIED with the block
    max, how many copies of that value continue into later blocks.  Both
    derive from one tiny stat row per block (n_rows, min/max value, tie
    counts at each end): sorted-contiguity guarantees a later block's rows
    are all >= this block's max, with equality only at its min.  The stat
    table is control-plane sized (O(blocks)), broadcast back once; rows
    never leave their block and a heavily tied value domain costs nothing
    extra (the tie heal moves counts, not rows)."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_id", "value"])
    srt = ds.sort("value")

    def block_rank(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy().astype(np.float64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        n = len(v)
        cols = ("kind", "event_id", "leq", "is_max", "key_v", "key_e",
                "n_rows", "min_v", "n_eq_min", "max_v", "n_eq_max")
        if n == 0:
            return pa.table({c: pa.array([], type=pa.float64() if c in
                            ("key_v", "min_v", "max_v") else pa.int64())
                             for c in cols})
        leq = np.searchsorted(v, v, side="right")  # block is value-sorted
        rows = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "event_id": pa.array(e),
            "leq": pa.array(leq.astype(np.int64)),
            "is_max": pa.array((v == v[-1]).astype(np.int64)),
            "key_v": pa.array(np.full(n, v[0])),
            "key_e": pa.array(np.full(n, e[0], dtype=np.int64)),
            "n_rows": pa.array(np.zeros(n, dtype=np.int64)),
            "min_v": pa.array(np.zeros(n, dtype=np.float64)),
            "n_eq_min": pa.array(np.zeros(n, dtype=np.int64)),
            "max_v": pa.array(np.zeros(n, dtype=np.float64)),
            "n_eq_max": pa.array(np.zeros(n, dtype=np.int64)),
        })
        stat = pa.table({
            "kind": pa.array([1], type=pa.int64()),
            "event_id": pa.array([0], type=pa.int64()),
            "leq": pa.array([0], type=pa.int64()),
            "is_max": pa.array([0], type=pa.int64()),
            "key_v": pa.array([float(v[0])]),
            "key_e": pa.array([int(e[0])], type=pa.int64()),
            "n_rows": pa.array([n], type=pa.int64()),
            "min_v": pa.array([float(v[0])]),
            "n_eq_min": pa.array([int(np.searchsorted(v, v[0], side="right"))],
                                 type=pa.int64()),
            "max_v": pa.array([float(v[-1])]),
            "n_eq_max": pa.array([int(n - np.searchsorted(v, v[-1], side="left"))],
                                 type=pa.int64()),
        })
        return pa.concat_tables([rows, stat])

    out = srt.map_batches(block_rank, batch_format="pyarrow",
                          batch_size=None).materialize()
    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["event_id", "leq", "is_max", "key_v", "key_e"]),
        batch_format="pyarrow")
    stats = (out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["key_v", "key_e", "n_rows", "min_v", "n_eq_min",
                            "max_v", "n_eq_max"]),
        batch_format="pyarrow").to_pandas())  # O(blocks): control-plane sized
    if stats.empty:  # empty input: no blocks emitted any rows
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "cume_dist": pa.array([], type=pa.float64())}))

    # stat order: (min, max, first event) — equivalent to true block order up
    # to permutations of identical-range (all-tied) blocks, which CUME_DIST
    # cannot observe (it counts values, not positions)
    stats = stats.sort_values(["min_v", "max_v", "key_e"], kind="stable")
    n_total = int(stats["n_rows"].sum())
    offsets = np.r_[0, np.cumsum(stats["n_rows"].to_numpy())[:-1]]
    # eq_after: copies of this block's max living in later blocks (later
    # blocks hold them only at their min, by sorted contiguity)
    eq_after = np.zeros(len(stats), dtype=np.int64)
    suffix: dict[float, int] = {}
    mins = stats["min_v"].to_numpy()
    maxs = stats["max_v"].to_numpy()
    nmin = stats["n_eq_min"].to_numpy()
    for i in range(len(stats) - 1, -1, -1):
        eq_after[i] = suffix.get(maxs[i], 0)
        suffix[mins[i]] = suffix.get(mins[i], 0) + int(nmin[i])
    lut = {(kv, ke): (int(o), int(q))
           for kv, ke, o, q in zip(stats["key_v"], stats["key_e"], offsets, eq_after)}
    lut_ref = ray.put(lut)

    def finish(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        kv = batch.column("key_v").to_numpy()
        ke = batch.column("key_e").to_numpy()
        leq = batch.column("leq").to_numpy().astype(np.int64)
        is_max = batch.column("is_max").to_numpy().astype(np.int64)
        # one lookup per source BLOCK (keys are block-constant), not per row
        uniq = {(float(a), int(b)) for a, b in zip(kv, ke)}
        off = np.empty(len(kv), dtype=np.int64)
        qaf = np.empty(len(kv), dtype=np.int64)
        for key in uniq:
            sel = (kv == key[0]) & (ke == key[1])
            o, q = m[key]
            off[sel] = o
            qaf[sel] = q
        cnt = leq + off + is_max * qaf
        return pa.table({
            "event_id": batch.column("event_id"),
            "cume_dist": pa.array(cnt.astype(np.float64) / float(n_total)),
        })

    return rows.map_batches(finish, batch_format="pyarrow", fn_args=(lut_ref,))


def user_first_event(sf_dir: str) -> ray.data.Dataset:
    """(user_id, first_event_id, first_ts_us, first_type) — FIRST_VALUE
    over each user's (ts, event_id) order: every user's earliest event with
    its payload columns (the 'acquisition event' enrichment shape; MIN(ts)
    alone cannot carry the other columns of the winning row).

    Sorted-run first-per-key plan (same as the curation dedupe): one keyed
    sort, each block keeps the FIRST row of every interior user run as
    final and emits ONE candidate row per boundary run; a grouped heal
    picks the (ts, event_id)-min candidate.  A hot user spanning B blocks
    costs B one-row candidates, never its event count."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events",
                    ["user_id", "event_id", "ts", "event_type"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def firsts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "user_id": pa.array([], type=pa.int64()),
                             "first_event_id": pa.array([], type=pa.int64()),
                             "first_ts_us": pa.array([], type=pa.int64()),
                             "first_type": pa.array([], type=pa.string())})
        u = batch.column("user_id").to_numpy().astype(np.int64)
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        kind = np.zeros(len(starts), dtype=np.int8)
        kind[0] = kind[-1] = 1
        idx = pa.array(starts)
        return pa.table({
            "kind": pa.array(kind),
            "user_id": batch.column("user_id").take(idx),
            "first_event_id": batch.column("event_id").take(idx),
            "first_ts_us": batch.column("ts").cast(pa.int64()).take(idx),
            "first_type": batch.column("event_type").take(idx),
        })

    out = srt.map_batches(firsts, batch_format="pyarrow",
                          batch_size=None).materialize()
    payload = ["user_id", "first_event_id", "first_ts_us", "first_type"]
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(payload),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(payload),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        t = group.column("first_ts_us").to_numpy().astype(np.int64)
        e = group.column("first_event_id").to_numpy().astype(np.int64)
        win = int(np.lexsort((e, t))[0])
        return group.slice(win, 1).select(payload)

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def events_rank(sf_dir: str) -> ray.data.Dataset:
    """(event_id, rnk) — RANK() OVER (ORDER BY value): 1 + the count of
    STRICTLY smaller values; tied rows share a rank and the next rank
    skips.  Same O(blocks) global-rank plan as ``events_cume_dist``, with
    the tie heal mirrored to the LOW end: a row only needs (a) how many
    rows live in earlier blocks — all <= v — and (b) for rows tied with
    the block MIN, how many copies of that value live in EARLIER blocks
    (by sorted contiguity, only at their max); subtract those from the
    earlier-rows offset and the strict-less count is exact.  Rows never
    leave their block; ties move counts, not rows."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_id", "value"])
    srt = ds.sort("value")

    def block_rank(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy().astype(np.float64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        n = len(v)
        cols = ("kind", "event_id", "lt", "is_min", "key_v", "key_e",
                "n_rows", "min_v", "n_eq_min", "max_v", "n_eq_max")
        if n == 0:
            return pa.table({c: pa.array([], type=pa.float64() if c in
                            ("key_v", "min_v", "max_v") else pa.int64())
                             for c in cols})
        lt = np.searchsorted(v, v, side="left")  # block is value-sorted
        rows = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "event_id": pa.array(e),
            "lt": pa.array(lt.astype(np.int64)),
            "is_min": pa.array((v == v[0]).astype(np.int64)),
            "key_v": pa.array(np.full(n, v[0])),
            "key_e": pa.array(np.full(n, e[0], dtype=np.int64)),
            "n_rows": pa.array(np.zeros(n, dtype=np.int64)),
            "min_v": pa.array(np.zeros(n, dtype=np.float64)),
            "n_eq_min": pa.array(np.zeros(n, dtype=np.int64)),
            "max_v": pa.array(np.zeros(n, dtype=np.float64)),
            "n_eq_max": pa.array(np.zeros(n, dtype=np.int64)),
        })
        stat = pa.table({
            "kind": pa.array([1], type=pa.int64()),
            "event_id": pa.array([0], type=pa.int64()),
            "lt": pa.array([0], type=pa.int64()),
            "is_min": pa.array([0], type=pa.int64()),
            "key_v": pa.array([float(v[0])]),
            "key_e": pa.array([int(e[0])], type=pa.int64()),
            "n_rows": pa.array([n], type=pa.int64()),
            "min_v": pa.array([float(v[0])]),
            "n_eq_min": pa.array([int(np.searchsorted(v, v[0], side="right"))],
                                 type=pa.int64()),
            "max_v": pa.array([float(v[-1])]),
            "n_eq_max": pa.array([int(n - np.searchsorted(v, v[-1], side="left"))],
                                 type=pa.int64()),
        })
        return pa.concat_tables([rows, stat])

    out = srt.map_batches(block_rank, batch_format="pyarrow",
                          batch_size=None).materialize()
    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["event_id", "lt", "is_min", "key_v", "key_e"]),
        batch_format="pyarrow")
    stats = (out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["key_v", "key_e", "n_rows", "min_v", "n_eq_min",
                            "max_v", "n_eq_max"]),
        batch_format="pyarrow").to_pandas())  # O(blocks): control-plane sized
    if stats.empty:  # empty input
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "rnk": pa.array([], type=pa.int64())}))

    # same all-tied-block permutation argument as cume_dist: rank is a pure
    # function of the value, so identical-range block order is unobservable
    stats = stats.sort_values(["min_v", "max_v", "key_e"], kind="stable")
    offsets = np.r_[0, np.cumsum(stats["n_rows"].to_numpy())[:-1]]
    # eq_before: copies of this block's min living in EARLIER blocks (they
    # can only sit at those blocks' max, by sorted contiguity)
    eq_before = np.zeros(len(stats), dtype=np.int64)
    prefix: dict[float, int] = {}
    mins = stats["min_v"].to_numpy()
    maxs = stats["max_v"].to_numpy()
    nmax = stats["n_eq_max"].to_numpy()
    for i in range(len(stats)):
        eq_before[i] = prefix.get(mins[i], 0)
        prefix[maxs[i]] = prefix.get(maxs[i], 0) + int(nmax[i])
    lut = {(kv, ke): (int(o), int(q))
           for kv, ke, o, q in zip(stats["key_v"], stats["key_e"],
                                   offsets, eq_before)}
    lut_ref = ray.put(lut)

    def finish(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        kv = batch.column("key_v").to_numpy()
        ke = batch.column("key_e").to_numpy()
        lt = batch.column("lt").to_numpy().astype(np.int64)
        is_min = batch.column("is_min").to_numpy().astype(np.int64)
        uniq = {(float(a), int(b)) for a, b in zip(kv, ke)}  # one per block
        off = np.empty(len(kv), dtype=np.int64)
        qbf = np.empty(len(kv), dtype=np.int64)
        for key in uniq:
            sel = (kv == key[0]) & (ke == key[1])
            o, q = m[key]
            off[sel] = o
            qbf[sel] = q
        return pa.table({
            "event_id": batch.column("event_id"),
            "rnk": pa.array(off - is_min * qbf + lt + 1, type=pa.int64()),
        })

    return rows.map_batches(finish, batch_format="pyarrow", fn_args=(lut_ref,))


def events_ntile(sf_dir: str, n_buckets: int = 16) -> ray.data.Dataset:
    """(event_id, tile) — NTILE(n) OVER (ORDER BY value, event_id): equi-
    depth bucket assignment for the training-data quantile-binning shape.
    The event_id tiebreak makes the total order STRICT, so NTILE is
    deterministic (NTILE over a tied order is engine-defined — this op
    deliberately pins the order instead).

    Strict order means no tie healing at all: one sort, each block emits
    its rows with a LOCAL index plus one count-stat row; global positions
    derive from the O(blocks) stat table (block firsts sort in true block
    order because the order is strict), and the standard first-(N mod n)-
    buckets-get-one-extra formula maps positions to tiles."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_id", "value"])
    srt = ds.sort(["value", "event_id"])

    def block_pos(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], type=pa.int64()),
                             "event_id": pa.array([], type=pa.int64()),
                             "local": pa.array([], type=pa.int64()),
                             "key_v": pa.array([], type=pa.float64()),
                             "key_e": pa.array([], type=pa.int64())})
        e = batch.column("event_id").to_numpy().astype(np.int64)
        v0 = float(batch.column("value")[0].as_py())
        rows = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "event_id": pa.array(e),
            "local": pa.array(np.arange(n, dtype=np.int64)),
            "key_v": pa.array(np.full(n, v0)),
            "key_e": pa.array(np.full(n, e[0], dtype=np.int64)),
        })
        stat = pa.table({
            "kind": pa.array([1], type=pa.int64()),
            "event_id": pa.array([n], type=pa.int64()),  # carries the count
            "local": pa.array([0], type=pa.int64()),
            "key_v": pa.array([v0]),
            "key_e": pa.array([int(e[0])], type=pa.int64()),
        })
        return pa.concat_tables([rows, stat])

    out = srt.map_batches(block_pos, batch_format="pyarrow",
                          batch_size=None).materialize()
    stats = (out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)),
        batch_format="pyarrow").to_pandas())  # O(blocks)
    if stats.empty:  # empty events table
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "tile": pa.array([], type=pa.int64())}))
    stats = stats.sort_values(["key_v", "key_e"], kind="stable")
    offs = {}
    running = 0
    for r in stats.itertuples():
        offs[(float(r.key_v), int(r.key_e))] = running
        running += int(r.event_id)
    n_total = running
    q, rem = divmod(n_total, n_buckets)
    offs_ref = ray.put(offs)

    def finish(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        kv = batch.column("key_v").to_numpy()
        ke = batch.column("key_e").to_numpy()
        local = batch.column("local").to_numpy().astype(np.int64)
        off = np.empty(len(kv), dtype=np.int64)
        for key in {(float(a), int(b)) for a, b in zip(kv, ke)}:  # per block
            sel = (kv == key[0]) & (ke == key[1])
            off[sel] = m[key]
        pos = off + local
        cut = rem * (q + 1)
        big = pos < cut
        tile = np.where(big, pos // max(q + 1, 1),
                        rem + (pos - cut) // max(q, 1)) + 1
        return pa.table({
            "event_id": batch.column("event_id"),
            "tile": pa.array(tile.astype(np.int64)),
        })

    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)),
        batch_format="pyarrow")
    return rows.map_batches(finish, batch_format="pyarrow", fn_args=(offs_ref,))


def orders_dense_rank(sf_dir: str) -> ray.data.Dataset:
    """(o_orderkey, o_orderpriority, rnk) — DENSE_RANK() OVER (PARTITION BY
    o_orderpriority ORDER BY o_totalprice DESC): the grouped rank-of-value
    window.  Like ``events_cume_dist``, dense rank is a pure function of
    the (key, value) pair — rank = count of DISTINCT larger values + 1 —
    so after one (priority asc, price desc) sort every block ranks its own
    rows with a vectorized distinct-run cumsum and ships ONE stat row per
    (block x priority-run): (first_val, last_val, n_distinct, run min
    orderkey as surrogate id).

    The driver orders each priority's runs by (first_val desc, last_val
    desc): sorted contiguity means a later run's values are all <= an
    earlier run's, with overlap only at the single boundary value, so the
    scan accumulates distinct counts and subtracts 1 whenever a run opens
    on the previous run's closing value (a value straddling blocks is
    counted once).  Runs that tie on BOTH endpoints are single-value runs
    whose relative order is unobservable to rank-of-value semantics, same
    argument as the cume_dist stat table.  O(blocks + priority-runs) driver
    bytes; rows never leave their block."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_orderpriority", "o_totalprice"])
    srt = ds.sort(["o_orderpriority", "o_totalprice"],
                  descending=[False, True])

    def block_rank(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols_t = {"kind": pa.int64(), "o_orderkey": pa.int64(),
                  "prio": pa.string(), "local": pa.int64(),
                  "run_ok": pa.int64(), "first_val": pa.float64(),
                  "last_val": pa.float64(), "n_distinct": pa.int64()}
        if n == 0:
            return pa.table({c: pa.array([], type=t) for c, t in cols_t.items()})
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)
        prio = np.asarray(batch.column("o_orderpriority").to_pylist())
        val = batch.column("o_totalprice").to_numpy().astype(np.float64)
        chg_p = np.r_[True, prio[1:] != prio[:-1]]
        chg_v = chg_p | np.r_[True, val[1:] != val[:-1]]
        dr = np.cumsum(chg_v)
        seg_first = np.flatnonzero(chg_p)
        counts = np.diff(np.r_[seg_first, n])
        local = dr - np.repeat(dr[seg_first], counts) + 1
        run_ok = np.repeat(np.minimum.reduceat(ok, seg_first), counts)
        seg_last = np.r_[seg_first[1:], n] - 1
        rows = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "o_orderkey": pa.array(ok),
            "prio": pa.array(prio, type=pa.string()),
            "local": pa.array(local.astype(np.int64)),
            "run_ok": pa.array(run_ok),
            "first_val": pa.array(np.zeros(n, dtype=np.float64)),
            "last_val": pa.array(np.zeros(n, dtype=np.float64)),
            "n_distinct": pa.array(np.zeros(n, dtype=np.int64)),
        })
        m = len(seg_first)
        stat = pa.table({
            "kind": pa.array(np.ones(m, dtype=np.int64)),
            "o_orderkey": pa.array(np.zeros(m, dtype=np.int64)),
            "prio": pa.array(prio[seg_first], type=pa.string()),
            "local": pa.array(np.zeros(m, dtype=np.int64)),
            "run_ok": pa.array(np.minimum.reduceat(ok, seg_first)),
            "first_val": pa.array(val[seg_first]),
            "last_val": pa.array(val[seg_last]),
            "n_distinct": pa.array(local[seg_last].astype(np.int64)),
        })
        return pa.concat_tables([rows, stat])

    out = srt.map_batches(block_rank, batch_format="pyarrow",
                          batch_size=None).materialize()
    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["o_orderkey", "prio", "local", "run_ok"]),
        batch_format="pyarrow")
    stats = (out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["prio", "run_ok", "first_val", "last_val",
                            "n_distinct"]),
        batch_format="pyarrow").to_pandas())  # O(blocks + runs)
    if stats.empty:  # empty orders table
        return ray.data.from_arrow(pa.table({
            "o_orderkey": pa.array([], type=pa.int64()),
            "o_orderpriority": pa.array([], type=pa.string()),
            "rnk": pa.array([], type=pa.int64())}))

    stats = stats.sort_values(
        ["prio", "first_val", "last_val", "run_ok"],
        ascending=[True, False, False, True], kind="stable")
    lut: dict[tuple, int] = {}
    prev_p, prev_last, cum = None, None, 0
    for r in stats.itertuples():
        if r.prio != prev_p:
            cum = 0
            adj = 0
        else:
            adj = 1 if r.first_val == prev_last else 0
        off = cum - adj
        lut[(r.prio, int(r.run_ok))] = off
        cum = off + int(r.n_distinct)
        prev_p, prev_last = r.prio, r.last_val
    lut_ref = ray.put(lut)

    def finish(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        prio = batch.column("prio").to_pylist()
        rok = batch.column("run_ok").to_numpy().astype(np.int64)
        local = batch.column("local").to_numpy().astype(np.int64)
        off = np.empty(len(prio), dtype=np.int64)
        for key in {(p, int(k)) for p, k in zip(prio, rok)}:  # one per run
            sel = np.fromiter((p == key[0] and int(k) == key[1]
                               for p, k in zip(prio, rok)),
                              dtype=bool, count=len(prio))
            off[sel] = m[key]
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_orderpriority": pa.array(prio, type=pa.string()),
            "rnk": pa.array(local + off, type=pa.int64()),
        })

    return rows.map_batches(finish, batch_format="pyarrow", fn_args=(lut_ref,))


def events_rolling_sum(sf_dir: str, window: int = 3) -> ray.data.Dataset:
    """(event_id, rolling_cents) — per-user sum of the last ``window`` rows
    in (ts, event_id) order: the bounded ROWS-PRECEDING window shape.

    Sorted-run pattern with a BOUNDED sufficient statistic: only the first
    window-1 rows of a run touching a block edge can be wrong locally, and
    fixing them needs only the previous block's last window-1 rows of that
    user.  Each block therefore emits its interior rows final (vectorized
    sliding sums), withholds those few rows as fix-me rows, and ships the
    context rows; a grouped heal recomputes just the withheld rows.  Skew-
    safe: a hot user costs 2*(window-1) rows per block boundary, never its
    row count.  Integer cents keep the result hash-exact vs the SQL
    oracle."""
    import ray  # noqa: F401  (symmetry with events_running_total)

    from ..sources.readers import read_table

    k = window
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def to_cents(v: np.ndarray) -> np.ndarray:
        av = np.floor(np.abs(v) * 100.0 + 0.5)
        return (np.sign(v) * av).astype(np.int64)

    def block_rolling(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        c = to_cents(batch.column("value").to_numpy().astype(np.float64))
        n = len(u)
        cols = ("kind", "event_id", "user_id", "ts", "cents")
        if n == 0:
            return pa.table({x: pa.array([], type=pa.int64()) for x in cols})
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        run_id = np.cumsum(np.r_[True, np.diff(u) != 0]) - 1
        # run-local sliding sum of the last k rows (vectorized)
        cs = np.cumsum(c)
        pos = np.arange(n) - starts[run_id]          # index within the run
        lo = np.maximum(np.arange(n) - k + 1, starts[run_id])
        roll = cs - np.where(lo > 0, cs[lo - 1], 0)
        # rows needing cross-block context: first k-1 rows of the block's
        # FIRST run (it may continue a user from the previous block) — these
        # are WITHHELD from the final output and re-emitted by the heal
        fix = (run_id == 0) & (pos < k - 1)
        # context COPIES for the next block's heal: last k-1 rows of the
        # block's LAST run (these rows' own local rolls stay final)
        last = len(starts) - 1
        ctx = (run_id == last) & (np.arange(n) >= n - (k - 1)) & ~fix
        kind = np.zeros(n, dtype=np.int64)
        kind[fix] = 1
        base_tab = pa.table({
            "kind": pa.array(kind),
            "event_id": pa.array(e),
            "user_id": pa.array(u),
            "ts": pa.array(t),
            "cents": pa.array(np.where(fix, c, roll), type=pa.int64()),
        })
        ctx_tab = pa.table({
            "kind": pa.array(np.full(int(ctx.sum()), 2, dtype=np.int64)),
            "event_id": pa.array(e[ctx]),
            "user_id": pa.array(u[ctx]),
            "ts": pa.array(t[ctx]),
            "cents": pa.array(c[ctx], type=pa.int64()),
        })
        return pa.concat_tables([base_tab, ctx_tab])

    out = srt.map_batches(block_rolling, batch_format="pyarrow",
                          batch_size=None).materialize()
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["event_id", "cents"])
                   .rename_columns(["event_id", "rolling_cents"]),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.greater(b.column("kind"), 0)),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        e = group.column("event_id").to_numpy().astype(np.int64)
        t = group.column("ts").to_numpy().astype(np.int64)
        c = group.column("cents").to_numpy().astype(np.int64)
        kind = group.column("kind").to_numpy().astype(np.int64)
        # dedupe rows shipped as both fix and context (tiny groups)
        _, first = np.unique(e, return_index=True)
        e, t, c, kind = e[first], t[first], c[first], kind[first]
        order = np.lexsort((e, t))
        e, t, c, kind = e[order], t[order], c[order], kind[order]
        cs = np.cumsum(c)
        lo = np.maximum(np.arange(len(e)) - k + 1, 0)
        roll = cs - np.where(lo > 0, cs[lo - 1], 0)
        keep = kind == 1
        return pa.table({"event_id": pa.array(e[keep], type=pa.int64()),
                         "rolling_cents": pa.array(roll[keep], type=pa.int64())})

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def cohort_retention(sf_dir: str,
                     broadcast_max_users: int | None = None) -> ray.data.Dataset:
    """(cohort_day_us, day_offset, n_users) — classic retention matrix:
    users grouped by first-seen day, counted on each later day they were
    active.  The two-table cohort shape (signup-cohort x activity) built
    from streaming parts:

      * first-seen day per user: native Min groupby (users-bounded);
      * activity days: per-batch distinct (user, day) combiner then the
        distinct-pair groupby (pairs bounded by users x days, never raw
        events);
      * the pair -> (cohort, offset) keying runs in TWO TIERS on user
        cardinality (default $PJR_COHORT_BROADCAST_MAX or 10M): under the
        cap the first-seen table broadcasts as two sorted int64 arrays
        (16 B/user, assembled from Arrow refs — no pandas) and keys each
        batch with one ``np.searchsorted``; beyond it the SAME keying is a
        partitioned hash join of the pairs against the first-seen table,
        so a billion-user table never lands on the driver.  Both tiers
        feed the identical final Count groupby and are equality-tested
        (tests/test_joins.py pins ``broadcast_max_users=0``)."""
    from ray.data.aggregate import Count, Min

    from ..sources.readers import read_table
    from .relational import _join_partitions

    cap = (broadcast_max_users if broadcast_max_users is not None
           else int(os.environ.get("PJR_COHORT_BROADCAST_MAX", 10_000_000)))
    DAY_US = 86_400_000_000
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def to_days(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "day_us": pc.multiply(
                pc.divide(batch.column("ts").cast(pa.int64()),
                          pa.scalar(DAY_US)).cast(pa.int64()),
                pa.scalar(DAY_US)),
        })

    days = ds.map_batches(to_days, batch_format="pyarrow")
    first = days.groupby("user_id").aggregate(Min("day_us")).materialize()
    n_users = first.count()
    if n_users == 0:  # empty events table
        return ray.data.from_arrow(pa.table({
            "cohort_day_us": pa.array([], type=pa.int64()),
            "day_offset": pa.array([], type=pa.int64()),
            "n_users": pa.array([], type=pa.int64())}))

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "day_us"]).aggregate([])

    pairs = (days.map_batches(distinct_pairs, batch_format="pyarrow")
                 .groupby(["user_id", "day_us"]).aggregate(Count()))

    if n_users <= cap:
        from .joins import _sorted_user_ts

        ids_coh_ref = ray.put(_sorted_user_ts(first, ts_col="min(day_us)"))

        def keyed(batch: pa.Table, ref) -> pa.Table:
            ids, coh = ray.get(ref)
            u = batch.column("user_id").to_numpy().astype(np.int64)
            d = batch.column("day_us").to_numpy().astype(np.int64)
            pos = np.searchsorted(ids, u)
            c = coh[pos]  # every active user has a first day by construction
            return pa.table({
                "cohort_day_us": pa.array(c, type=pa.int64()),
                "day_offset": pa.array((d - c) // DAY_US, type=pa.int64()),
            })

        keyed_ds = pairs.map_batches(keyed, batch_format="pyarrow",
                                     fn_args=(ids_coh_ref,))
    else:
        firsts_r = first.map_batches(
            lambda b: pa.table({"uf": b.column("user_id"),
                                "cohort_us": b.column("min(day_us)")}),
            batch_format="pyarrow")
        joined = pairs.join(firsts_r, "inner",
                            num_partitions=_join_partitions(pairs, firsts_r),
                            on=("user_id",), right_on=("uf",))

        def keyed_join(batch: pa.Table) -> pa.Table:
            d = batch.column("day_us").to_numpy().astype(np.int64)
            c = batch.column("cohort_us").to_numpy().astype(np.int64)
            return pa.table({
                "cohort_day_us": pa.array(c, type=pa.int64()),
                "day_offset": pa.array((d - c) // DAY_US, type=pa.int64()),
            })

        keyed_ds = joined.map_batches(keyed_join, batch_format="pyarrow")

    agg = keyed_ds.groupby(["cohort_day_us", "day_offset"]).aggregate(Count())
    return agg.map_batches(
        lambda b: pa.table({
            "cohort_day_us": b.column("cohort_day_us"),
            "day_offset": b.column("day_offset"),
            "n_users": b.column("count()").cast(pa.int64()),
        }), batch_format="pyarrow")


def top_event_type_per_user(sf_dir: str) -> ray.data.Dataset:
    """(user_id, top_type, n) — each user's most frequent event type
    (grouped MODE with a deterministic tie-break: count desc, then type
    asc).  Two-level plan: Ray's native partial-agg Count groupby builds
    the (user, type) histogram — the only corpus-sized exchange — then the
    argmax-per-user runs as the repo's sorted-run first-per-key: sort the
    histogram by (user asc, n desc, type asc), keep the first row of every
    interior run, emit ONE candidate per boundary run, heal candidates in
    a grouped pass.  The histogram is |users| x |types| rows, so the
    second exchange is bounded by distinct keys, not events."""
    import ray

    from ray.data.aggregate import Count

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).aggregate(Count())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "top_type": batch.column("event_type"),
            "n": batch.column("count()").cast(pa.int64()),
        })

    srt = (counts.map_batches(rename, batch_format="pyarrow")
                 .sort(["user_id", "n", "top_type"],
                       descending=[False, True, False]))

    def firsts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "user_id": pa.array([], type=pa.int64()),
                             "top_type": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        u = batch.column("user_id").to_numpy().astype(np.int64)
        starts = np.r_[0, np.flatnonzero(np.diff(u) != 0) + 1]
        kind = np.zeros(len(starts), dtype=np.int8)
        kind[0] = kind[-1] = 1
        idx = pa.array(starts)
        return pa.table({
            "kind": pa.array(kind),
            "user_id": batch.column("user_id").take(idx),
            "top_type": batch.column("top_type").take(idx),
            "n": batch.column("n").take(idx),
        })

    out = srt.map_batches(firsts, batch_format="pyarrow",
                          batch_size=None).materialize()
    payload = ["user_id", "top_type", "n"]
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(payload),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(payload),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        ns = group.column("n").to_pylist()
        ts = group.column("top_type").to_pylist()
        win = min(range(len(ns)), key=lambda i: (-ns[i], ts[i]))
        return group.slice(win, 1).select(payload)

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def user_paths(sf_dir: str) -> ray.data.Dataset:
    """(user_id, path) — each user's full journey as an ordered '>'-joined
    event-type string (STRING_AGG ... ORDER BY: the order-SENSITIVE grouped
    aggregation the engine's other groupbys don't need).  Same sorted-run
    plan as sessionization: one global (user, ts, event_id) sort, interior
    user runs join block-locally, boundary runs emit ONE partial segment
    per block (already-joined substring + its first (ts, event_id) for
    ordering) and a grouped heal concatenates segments by first-timestamp
    order.  Healing ships O(blocks) segments per straddling user whose
    total size equals that user's final path — the output row itself — so
    no heal input exceeds output size."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts",
                                       "event_type"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def block_paths(batch: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "user_id": pa.array([], type=pa.int64()),
                          "path": pa.array([], type=pa.string()),
                          "first_ts": pa.array([], type=pa.int64()),
                          "first_eid": pa.array([], type=pa.int64())})
        n = batch.num_rows
        if n == 0:
            return empty
        u = batch.column("user_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        eid = batch.column("event_id").to_numpy().astype(np.int64)
        types = batch.column("event_type").to_pylist()
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, n]
        kind = np.zeros(len(starts), dtype=np.int8)
        kind[0] = kind[-1] = 1
        return pa.table({
            "kind": pa.array(kind),
            "user_id": pa.array(u[starts]),
            "path": pa.array([">".join(types[s:e])
                              for s, e in zip(starts, stops)],
                             type=pa.string()),
            "first_ts": pa.array(t[starts]),
            "first_eid": pa.array(eid[starts]),
        })

    out = srt.map_batches(block_paths, batch_format="pyarrow",
                          batch_size=None).materialize()
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["user_id", "path"]),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["user_id", "path", "first_ts", "first_eid"]),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        t = group.column("first_ts").to_numpy().astype(np.int64)
        e = group.column("first_eid").to_numpy().astype(np.int64)
        order = np.lexsort((e, t))
        segs = group.column("path").to_pylist()
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "path": pa.array([">".join(segs[i] for i in order)],
                             type=pa.string()),
        })

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


_DAY_US = 86_400_000_000


def rolling_active_users(sf_dir: str, window_days: int = 7) -> ray.data.Dataset:
    """(day_us, n_users) — trailing-``window_days`` distinct active users
    for every day that has events (the rolling-DAU dashboard query:
    COUNT(DISTINCT) over a sliding time window, which no frame-based
    running aggregate can express because distinct-ness doesn't subtract).

    Plan: per-batch (day, user) de-dup combiner, k-fold fan-out of each
    pair to the ``window_days`` window-end days it can serve (the
    ``events_sliding`` trick applied to distinct-count), then TWO native
    partial-agg exchanges — (window, user) de-dup, then per-window count —
    each bounded by days x active-users, never by event volume.  Window
    ends with no events of their own are dropped against a broadcast
    day-set (tiny: one int per distinct day)."""
    import ray as _ray

    from ray.data.aggregate import Count

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def day_pairs(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u = batch.column("user_id").to_numpy().astype(np.int64)
        uniq = np.unique(np.stack([d, u], axis=1), axis=0)
        return pa.table({"d": pa.array(uniq[:, 0]),
                         "user_id": pa.array(uniq[:, 1])})

    pairs = ds.map_batches(day_pairs, batch_format="pyarrow")

    # the distinct day set is tiny (one row per calendar day) — safe collect
    day_rows = (pairs.groupby("d").aggregate(Count())
                     .select_columns(["d"]).take_all())
    days = np.sort(np.array([r["d"] for r in day_rows], dtype=np.int64))
    days_ref = _ray.put(days)

    def fan_out(batch: pa.Table, ref) -> pa.Table:
        dset = _ray.get(ref)
        d = batch.column("d").to_numpy().astype(np.int64)
        u = batch.column("user_id").to_numpy().astype(np.int64)
        wd = (d[:, None] + np.arange(window_days)[None, :]).ravel()
        uu = np.repeat(u, window_days)
        pos = np.minimum(np.searchsorted(dset, wd), max(len(dset) - 1, 0))
        keep = (dset[pos] == wd) if len(dset) else np.zeros(len(wd), bool)
        return pa.table({"wd": pa.array(wd[keep]),
                         "user_id": pa.array(uu[keep])})

    fanned = pairs.map_batches(fan_out, batch_format="pyarrow",
                               fn_args=(days_ref,))
    distinct = fanned.groupby(["wd", "user_id"]).aggregate(Count())
    counts = (distinct.select_columns(["wd"])
                      .groupby("wd").aggregate(Count()))
    return counts.map_batches(
        lambda b: pa.table({
            "day_us": pc.multiply(b.column("wd"), pa.scalar(_DAY_US)),
            "n_users": b.column("count()").cast(pa.int64()),
        }), batch_format="pyarrow")


def event_type_share(sf_dir: str) -> ray.data.Dataset:
    """(user_id, event_type, n, share_milli) — each type's share of its
    user's events in integer permille (RATIO_TO_REPORT / ``n * 1000 //
    SUM(n) OVER (PARTITION BY user)``: the windowed-total normalisation).
    Integer floor-division keeps the result exact across engines.

    Plan: native partial-agg Count groupby builds the (user, type)
    histogram (the only corpus-sized exchange), then a user-keyed sort of
    the histogram computes per-run totals block-locally; runs touching a
    block edge ship their (type, n) rows — bounded by |event types|, never
    event volume — to a distributed grouped heal."""
    from ray.data.aggregate import Count

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).aggregate(Count())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "n": batch.column("count()").cast(pa.int64()),
        })

    srt = counts.map_batches(rename, batch_format="pyarrow").sort("user_id")

    def block_share(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "user_id": pa.array([], type=pa.int64()),
                          "event_type": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "share_milli": pa.array([], type=pa.int64())})
        if m == 0:
            return empty
        u = batch.column("user_id").to_numpy().astype(np.int64)
        nv = batch.column("n").to_numpy().astype(np.int64)
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, m]
        totals = np.add.reduceat(nv, starts)
        per_row_tot = np.repeat(totals, stops - starts)
        share = nv * 1000 // per_row_tot
        kind = np.zeros(m, dtype=np.int8)
        kind[starts[0]:stops[0]] = 1
        kind[starts[-1]:stops[-1]] = 1
        return pa.table({
            "kind": pa.array(kind),
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "n": pa.array(nv),
            "share_milli": pa.array(share),
        })

    out = srt.map_batches(block_share, batch_format="pyarrow",
                          batch_size=None).materialize()
    payload = ["user_id", "event_type", "n", "share_milli"]
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(payload),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["user_id", "event_type", "n"]),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        nv = group.column("n").to_numpy().astype(np.int64)
        tot = int(nv.sum())
        return pa.table({
            "user_id": group.column("user_id"),
            "event_type": group.column("event_type"),
            "n": pa.array(nv),
            "share_milli": pa.array(nv * 1000 // tot),
        })

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def session_stats(sf_dir: str, gap_us: int = SESSION_GAP_US) -> ray.data.Dataset:
    """Single-row {n_sessions, avg_events_milli, avg_duration_us} — corpus-
    level session summary composed ON TOP of the distributed
    ``user_sessions`` operator (the composition check: a downstream
    aggregate consuming another operator's streamed output, never a
    rebuild).  Averages are integer floor-divisions of exact int sums, so
    the result is bit-identical across engines."""
    from ray.data.aggregate import Count, Sum

    s = user_sessions(sf_dir, gap_us)

    def add_dur(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_events": batch.column("n_events"),
            "dur": pc.subtract(batch.column("session_end_us"),
                               batch.column("session_start_us")),
        })

    agg = s.map_batches(add_dur, batch_format="pyarrow").aggregate(
        Count(), Sum("n_events"), Sum("dur"))
    n = int(agg["count()"] or 0)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "n_sessions": pa.array([], type=pa.int64()),
            "avg_events_milli": pa.array([], type=pa.int64()),
            "avg_duration_us": pa.array([], type=pa.int64())}))
    return ray.data.from_arrow(pa.table({
        "n_sessions": pa.array([n], type=pa.int64()),
        "avg_events_milli": pa.array([int(agg["sum(n_events)"]) * 1000 // n],
                                     type=pa.int64()),
        "avg_duration_us": pa.array([int(agg["sum(dur)"]) // n],
                                    type=pa.int64()),
    }))


def events_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """(event_id, pr_permille) — PERCENT_RANK() OVER (ORDER BY value) as
    integer permille: floor((rank - 1) * 1000 / (n - 1)).  Composes on the
    ``events_rank`` plan (whose sort output is already materialized for the
    two-consumer stat exchange): the only extra work is one streaming count
    and one arithmetic map over (event_id, rnk) pairs — no second sort, no
    new exchange.  Integer floor-division keeps the result bit-identical
    across engines."""
    import ray

    ranked = events_rank(sf_dir)
    n = ranked.count()
    if n <= 1:
        return ranked.map_batches(
            lambda b: pa.table({
                "event_id": b.column("event_id"),
                "pr_permille": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            }), batch_format="pyarrow")
    denom = n - 1

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("rnk").to_numpy().astype(np.int64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "pr_permille": pa.array((r - 1) * 1000 // denom, type=pa.int64()),
        })

    return ranked.map_batches(finish, batch_format="pyarrow")


def top_value_event_per_user(sf_dir: str) -> ray.data.Dataset:
    """(user_id, top_event_id, top_value) — MAX_BY / arg-max per key: each
    user's highest-value event with its payload, smallest event_id breaking
    value ties.  Same sorted-run first-per-key plan as ``user_first_event``
    with a (value DESC, event_id ASC) order: every block keeps the first
    row of interior user runs as final and ships ONE candidate row per
    boundary run to a grouped heal.  A hot user spanning B blocks costs B
    one-row candidates, never its event count."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "value"])
    srt = ds.sort(["user_id", "value", "event_id"],
                  descending=[False, True, False])

    def firsts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "user_id": pa.array([], type=pa.int64()),
                             "top_event_id": pa.array([], type=pa.int64()),
                             "top_value": pa.array([], type=pa.float64())})
        u = batch.column("user_id").to_numpy().astype(np.int64)
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        kind = np.zeros(len(starts), dtype=np.int8)
        kind[0] = kind[-1] = 1
        idx = pa.array(starts)
        return pa.table({
            "kind": pa.array(kind),
            "user_id": batch.column("user_id").take(idx),
            "top_event_id": batch.column("event_id").take(idx),
            "top_value": batch.column("value").take(idx),
        })

    out = srt.map_batches(firsts, batch_format="pyarrow",
                          batch_size=None).materialize()
    payload = ["user_id", "top_event_id", "top_value"]
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(payload),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(payload),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        v = group.column("top_value").to_numpy().astype(np.float64)
        e = group.column("top_event_id").to_numpy().astype(np.int64)
        win = int(np.lexsort((e, -v))[0])
        return group.slice(win, 1).select(payload)

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def hourly_ohlc(sf_dir: str) -> ray.data.Dataset:
    """(hour_us, open_value, high_value, low_value, close_value, n_events)
    — the time-bucketed OHLC shape (first/last by event time + extremes per
    window; the streaming-telemetry staple that MIN/MAX alone cannot carry).

    No global sort: each batch reduces to one PARTIAL row per touched hour
    — (first-ts row's value, last-ts row's value, min, max, n) computed by
    one in-batch lexsort — and a grouped heal merges partials per bucket.
    Open/close partials are sufficient statistics (the bucket's global
    first/last row is some batch's first/last row), so the exchange is
    buckets x blocks rows: bounded by the TIME RANGE, not the data size,
    and the heal group count is the bucket count.  (ts, event_id) makes the
    order strict, so results are deterministic under ts ties."""
    from ..sources.readers import read_table

    _HOUR = 3_600_000_000

    ds = read_table(sf_dir, "events", ["event_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"hour_us": pa.int64(), "first_ts": pa.int64(),
                "first_eid": pa.int64(), "open_value": pa.float64(),
                "last_ts": pa.int64(), "last_eid": pa.int64(),
                "close_value": pa.float64(), "low_value": pa.float64(),
                "high_value": pa.float64(), "n": pa.int64()}
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], type=t) for c, t in cols.items()})
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        e = batch.column("event_id").to_numpy().astype(np.int64)
        v = batch.column("value").to_numpy().astype(np.float64)
        hb = t // _HOUR
        order = np.lexsort((e, t, hb))
        hb, t, e, v = hb[order], t[order], e[order], v[order]
        bnd = np.flatnonzero(np.diff(hb) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(hb)]
        lows = np.minimum.reduceat(v, starts)
        highs = np.maximum.reduceat(v, starts)
        return pa.table({
            "hour_us": pa.array(hb[starts] * _HOUR, type=pa.int64()),
            "first_ts": pa.array(t[starts]), "first_eid": pa.array(e[starts]),
            "open_value": pa.array(v[starts]),
            "last_ts": pa.array(t[stops - 1]), "last_eid": pa.array(e[stops - 1]),
            "close_value": pa.array(v[stops - 1]),
            "low_value": pa.array(lows), "high_value": pa.array(highs),
            "n": pa.array(stops - starts),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        ft = group.column("first_ts").to_numpy().astype(np.int64)
        fe = group.column("first_eid").to_numpy().astype(np.int64)
        lt = group.column("last_ts").to_numpy().astype(np.int64)
        le = group.column("last_eid").to_numpy().astype(np.int64)
        first = int(np.lexsort((fe, ft))[0])
        last = int(np.lexsort((le, lt))[-1])
        return pa.table({
            "hour_us": group.column("hour_us").slice(0, 1),
            "open_value": group.column("open_value").slice(first, 1),
            "high_value": pa.array([pc.max(group.column("high_value")).as_py()]),
            "low_value": pa.array([pc.min(group.column("low_value")).as_py()]),
            "close_value": group.column("close_value").slice(last, 1),
            "n_events": pa.array(
                [pc.sum(group.column("n")).as_py()], type=pa.int64()),
        })

    return parts.groupby("hour_us").map_groups(heal, batch_format="pyarrow")


_RANGE_WINDOW_US = 3_600_000_000  # 1 hour


def events_hour_window_sum(sf_dir: str,
                           window_us: int = _RANGE_WINDOW_US) -> ray.data.Dataset:
    """(event_id, window_cents) — the time-RANGE window frame:
    SUM(cents) OVER (PARTITION BY user ORDER BY ts RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW).  Unlike ROWS-k frames
    (``events_rolling_sum``: constant 2-row boundary context) the frame
    row-count here is unbounded, so the boundary sufficient statistic is
    TIME-bounded instead: each block ships, per edge run, only the rows in
    the last ``window_us`` of that run (any earlier row can never fall in
    a later block's frame: a frame reaching row r implies r is within
    window_us of its own block-run end — sorted contiguity).  Rows whose
    frame start falls inside their own block finalize locally via two
    packed-key searchsorteds; the rest ship one query row each to a
    per-user grouped heal over the time-bounded contexts.  Exchange volume
    is therefore O(event density x window) per block edge, never O(run).

    RANGE frames include same-ts PEERS in both directions, so peer pairs
    straddling a block boundary are healed too: run-END rows route to the
    heal (their forward peers are unknowable in-block) and run-START peer
    bursts are shipped as head context; the heal sums all other-run
    context in [w, ts] (own-run context subtracts back out — the local
    value already counted every own-block frame row).  Packs
    (user, ts-offset) into uint64 (same <2^44 us span bet as
    ``events_last_signup``)."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def to_cents(v: np.ndarray) -> np.ndarray:
        av = np.floor(np.abs(v) * 100.0 + 0.5)
        return (np.sign(v) * av).astype(np.int64)

    W = np.int64(window_us)
    cols = ("kind", "event_id", "user_id", "t", "w", "rs_ts", "rs_eid",
            "cents")

    def block_pass(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        u = batch.column("user_id").to_numpy().astype(np.int64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        c = to_cents(batch.column("value").to_numpy().astype(np.float64))
        n = len(u)
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, n]
        run_id = np.cumsum(np.r_[True, np.diff(u) != 0]) - 1
        rs_ts = t[starts[run_id]]
        rs_eid = e[starts[run_id]]
        base = np.int64(t.min())
        pk = (u.astype(np.uint64) << np.uint64(44)) | (t - base).astype(np.uint64)
        w = t - W
        wk = (u.astype(np.uint64) << np.uint64(44)) | \
            np.maximum(w - base, 0).astype(np.uint64)
        hi = np.searchsorted(pk, pk, side="right")      # rows <= (u, t) incl peers
        lo = np.searchsorted(pk, wk, side="left")
        P = np.r_[0, np.cumsum(c)]
        local = P[hi] - P[lo]
        is_edge = (run_id == 0) | (run_id == len(starts) - 1)
        re_ts = t[stops[run_id] - 1]
        # frame start precedes the block-run, or forward peers possible
        # (row sits at the run-end timestamp, next block may continue it)
        needs = is_edge & ((w < rs_ts) | (t == re_ts))
        final_rows = pa.table({
            "kind": pa.array(np.zeros(int((~needs).sum()), dtype=np.int64)),
            "event_id": pa.array(e[~needs]),
            "user_id": pa.array(u[~needs]),
            "t": pa.array(t[~needs]), "w": pa.array(w[~needs]),
            "rs_ts": pa.array(rs_ts[~needs]), "rs_eid": pa.array(rs_eid[~needs]),
            "cents": pa.array(local[~needs]),
        })
        query_rows = pa.table({
            "kind": pa.array(np.ones(int(needs.sum()), dtype=np.int64)),
            "event_id": pa.array(e[needs]),
            "user_id": pa.array(u[needs]),
            "t": pa.array(t[needs]), "w": pa.array(w[needs]),
            "rs_ts": pa.array(rs_ts[needs]), "rs_eid": pa.array(rs_eid[needs]),
            "cents": pa.array(local[needs]),
        })
        # time-bounded context: edge-run rows within window of THEIR run
        # end (backward frames) plus run-START peer bursts (forward peers);
        # rows carry their (rs_ts, rs_eid) run identity for own-run
        # exclusion in the heal
        ctx = is_edge & ((t >= re_ts - W) | (t == rs_ts))
        ctx_rows = pa.table({
            "kind": pa.array(np.full(int(ctx.sum()), 2, dtype=np.int64)),
            "event_id": pa.array(e[ctx]),
            "user_id": pa.array(u[ctx]),
            "t": pa.array(t[ctx]), "w": pa.array(np.zeros(int(ctx.sum()),
                                                          dtype=np.int64)),
            "rs_ts": pa.array(rs_ts[ctx]),
            "rs_eid": pa.array(rs_eid[ctx]),
            "cents": pa.array(c[ctx]),
        })
        return pa.concat_tables([final_rows, query_rows, ctx_rows])

    out = srt.map_batches(block_pass, batch_format="pyarrow",
                          batch_size=None).materialize()
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["event_id", "cents"])
                   .rename_columns(["event_id", "window_cents"]),
        batch_format="pyarrow")
    pending = out.map_batches(
        lambda b: b.filter(pc.greater(b.column("kind"), 0)),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy().astype(np.int64)
        qm = kind == 1
        cm = kind == 2
        qe = group.column("event_id").to_numpy().astype(np.int64)[qm]
        qt = group.column("t").to_numpy().astype(np.int64)[qm]
        qw = group.column("w").to_numpy().astype(np.int64)[qm]
        qrun = (group.column("rs_ts").to_numpy().astype(np.int64)[qm],
                group.column("rs_eid").to_numpy().astype(np.int64)[qm])
        qloc = group.column("cents").to_numpy().astype(np.int64)[qm]
        ct = group.column("t").to_numpy().astype(np.int64)[cm]
        cc = group.column("cents").to_numpy().astype(np.int64)[cm]
        crun = (group.column("rs_ts").to_numpy().astype(np.int64)[cm],
                group.column("rs_eid").to_numpy().astype(np.int64)[cm])
        order = np.argsort(ct, kind="stable")
        ct, cc = ct[order], cc[order]
        crs, cre = crun[0][order], crun[1][order]
        P = np.r_[0, np.cumsum(cc)]
        # ALL context in the frame [w, t] (peers included, both directions)
        lo = np.searchsorted(ct, qw, side="left")
        hi = np.searchsorted(ct, qt, side="right")
        tot = P[hi] - P[lo]
        # subtract the query's OWN block-run context back out: the local
        # value already counted every own-block frame row
        own = np.zeros(len(qe), dtype=np.int64)
        for a, b in set(zip(qrun[0].tolist(), qrun[1].tolist())):
            sel = (qrun[0] == a) & (qrun[1] == b)
            csel = (crs == a) & (cre == b)
            cts = ct[csel]
            Pr = np.r_[0, np.cumsum(cc[csel])]
            own[sel] = (Pr[np.searchsorted(cts, qt[sel], side="right")]
                        - Pr[np.searchsorted(cts, qw[sel], side="left")])
        return pa.table({
            "event_id": pa.array(qe),
            "window_cents": pa.array(qloc + tot - own, type=pa.int64()),
        })

    healed = pending.groupby("user_id").map_groups(heal,
                                                   batch_format="pyarrow")
    return finals.union(healed)


_EWMA_CHUNK = 512  # in-block scan chunk: g^-(C-1) stays well inside float64


def user_value_ewma(sf_dir: str, alpha: float = 0.25) -> ray.data.Dataset:
    """(event_id, ewma) — exponentially weighted moving average of
    events.value per user in (ts, event_id) order, seeded ewma_1 = x_1:
    the stateful linear recurrence (t_i = a*x_i + (1-a)*t_{i-1}) no SQL
    window frame expresses, and the repo's DISTRIBUTED AFFINE SCAN shape.

    The recurrence is affine in the incoming state: a segment of length L
    maps state s to z_L + g^L * s (g = 1-a, z = the segment's zero-state
    scan), and the true value at 0-based position p is z_p + g^(p+1) * s.
    So ONE (user, ts, event_id) sort makes each user's rows contiguous;
    inside a block the zero-state scan z vectorizes via scaled cumsums
    over 512-row chunks (the g^-j scaling stays bounded per chunk, and
    the error of the rescale stays relative to the VALUES, not the
    scale factor) with an O(rows/512)-step vectorized carry chain across
    chunk levels; complete interior runs finish in-block because their
    incoming state is their own first value (t_1 = x_1 <=> s = x_1).
    Only the (<= 2 per block) edge runs ship ONE affine row (A = g^len,
    B = z_end, first_x) to a grouped per-user heal that composes the
    segment maps in time order — O(blocks) rows, never values — and the
    resolved incoming states broadcast back as object-store refs.
    Rows-only (no SQL form); pinned by a brute-force recurrence pytest."""
    import ray

    from ..sources.readers import read_table

    g = 1.0 - alpha
    C = _EWMA_CHUNK

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    srt = ds.sort(["user_id", "ts", "event_id"])

    def block_scan(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "kind": pa.array([], type=pa.int8()),
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "seg_ts": pa.array([], type=pa.int64()),
            "seg_eid": pa.array([], type=pa.int64()),
            "z": pa.array([], type=pa.float64()),
            "d": pa.array([], type=pa.float64()),
            "first_x": pa.array([], type=pa.float64())})
        n = batch.num_rows
        if n == 0:
            return empty
        u = batch.column("user_id").to_numpy().astype(np.int64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        x = batch.column("value").to_numpy().astype(np.float64)
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, n]
        run_id = np.cumsum(np.r_[True, np.diff(u) != 0]) - 1
        p = np.arange(n) - starts[run_id]          # 0-based pos in run
        j = p % C                                  # pos in chunk
        lvl = p // C                               # chunk level in run
        # zero-state scan per chunk: z0_i = a * g^j * sum_{m<=j} x_m g^-m.
        # The cumsum MUST restart exactly at each chunk (a few slices per
        # block — rows/512 + runs): one global cumsum + base subtraction
        # accumulates terms at scale g^-(C-1) (~1e63) across chunks and
        # the cancellation error (~1e48 absolute) annihilates later chunks.
        w_inv = g ** (-j.astype(np.float64))
        cs_idx = np.flatnonzero(j == 0)
        z = np.empty(n)
        term = x * w_inv
        scale = alpha * (g ** j.astype(np.float64))
        for s_, e_ in zip(cs_idx, np.r_[cs_idx[1:], n]):
            z[s_:e_] = scale[s_:e_] * np.cumsum(term[s_:e_])
        # carry chain across chunk levels, vectorized per level over runs
        lens = stops - starts
        for L in range(1, int(lvl.max()) + 1):
            # carry for a level-L row of run r = z at the run's level-(L-1)
            # chunk end (starts[r] + L*C - 1) — already carry-corrected by
            # the previous iteration, so the chain composes left to right
            rows = lvl == L
            if not rows.any():
                break
            rs = run_id[rows]
            carry = z[starts[rs] + L * C - 1]
            z[rows] = z[rows] + (g ** (j[rows] + 1.0)) * carry
        d = g ** (p + 1.0)
        is_edge_run = (run_id == 0) | (run_id == len(starts) - 1)
        interior = ~is_edge_run
        # interior runs finish in-block: s = first value of the run
        z = np.where(interior, z + d * x[starts[run_id]], z)
        seg_ts = np.where(is_edge_run, t[starts[run_id]], 0)
        seg_eid = np.where(is_edge_run, e[starts[run_id]], -1)
        rows_tab = pa.table({
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "event_id": pa.array(e),
            "user_id": pa.array(u),
            "seg_ts": pa.array(seg_ts.astype(np.int64)),
            "seg_eid": pa.array(seg_eid.astype(np.int64)),
            "z": pa.array(z),
            "d": pa.array(np.where(is_edge_run, d, 0.0)),
            "first_x": pa.array(np.zeros(n))})
        er = np.unique(run_id[is_edge_run])
        segs = pa.table({
            "kind": pa.array(np.ones(len(er), dtype=np.int8)),
            "event_id": pa.array(np.zeros(len(er), dtype=np.int64)),
            "user_id": pa.array(u[starts[er]], type=pa.int64()),
            "seg_ts": pa.array(t[starts[er]], type=pa.int64()),
            "seg_eid": pa.array(e[starts[er]], type=pa.int64()),
            "z": pa.array(z[stops[er] - 1]),          # B = zero-state end
            "d": pa.array(g ** lens[er].astype(np.float64)),  # A = g^len
            "first_x": pa.array(x[starts[er]])})
        return pa.concat_tables([rows_tab, segs])

    out = srt.map_batches(block_scan, batch_format="pyarrow",
                          batch_size=None).materialize()
    rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["event_id", "user_id", "seg_ts", "seg_eid",
                            "z", "d"]),
        batch_format="pyarrow")
    segs = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["user_id", "seg_ts", "seg_eid", "z", "d",
                            "first_x"]),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        ts = group.column("seg_ts").to_numpy().astype(np.int64)
        eid = group.column("seg_eid").to_numpy().astype(np.int64)
        B = group.column("z").to_numpy().astype(np.float64)
        A = group.column("d").to_numpy().astype(np.float64)
        fx = group.column("first_x").to_numpy().astype(np.float64)
        order = np.lexsort((eid, ts))
        s = np.zeros(len(order))
        st = fx[order[0]]                       # seed: t_1 = x_1
        for k in order:
            s[k] = st
            st = B[k] + A[k] * st
        return pa.table({
            "user_id": group.column("user_id"),
            "seg_ts": group.column("seg_ts"),
            "seg_eid": group.column("seg_eid"),
            "s_in": pa.array(s, type=pa.float64())})

    states = segs.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    refs = states.materialize().to_arrow_refs()

    def add_state(batch: pa.Table, state_refs) -> pa.Table:
        tabs = [t_ for t_ in ray.get(list(state_refs)) if t_.num_rows]
        lut: dict = {}
        for t_ in tabs:
            for u_, ts_, e_, s_ in zip(t_.column("user_id").to_pylist(),
                                       t_.column("seg_ts").to_pylist(),
                                       t_.column("seg_eid").to_pylist(),
                                       t_.column("s_in").to_pylist()):
                lut[(u_, ts_, e_)] = s_
        se = batch.column("seg_eid").to_pylist()
        u = batch.column("user_id").to_pylist()
        st = batch.column("seg_ts").to_pylist()
        z = batch.column("z").to_numpy().astype(np.float64)
        d = batch.column("d").to_numpy().astype(np.float64)
        s = np.fromiter((lut.get((u_, t_, e_), 0.0) if e_ >= 0 else 0.0
                         for u_, t_, e_ in zip(u, st, se)),
                        dtype=np.float64, count=len(u))
        return pa.table({"event_id": batch.column("event_id"),
                         "ewma": pa.array(z + d * s, type=pa.float64())})

    return rows.map_batches(add_state, batch_format="pyarrow",
                            fn_args=(refs,))


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """(prev_type, next_type, n) — Markov transition counts between each
    user's consecutive event types in (ts, event_id) order: the
    session-flow / next-action analytics staple.

    Every adjacency except one per block edge is block-local after the
    (user, ts, event_id) sort, so blocks emit vocabulary-bounded partial
    count rows (np.unique over packed type-pair ids — the combiner) plus
    TWO context rows (their first and last physical row).  Cross-block
    adjacencies are exactly (block k's last row, block k+1's first row)
    of the same user: the O(blocks) context rows resolve on the driver
    (control-plane sized, like the cume_dist stat table) and the healed
    counts union into the final native Sum groupby, bounded by the
    squared type vocabulary."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts",
                                       "event_type"])
    srt = ds.sort(["user_id", "ts", "event_id"]).materialize()

    def block_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "prev_type": pa.array([], type=pa.string()),
                          "next_type": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "user_id": pa.array([], type=pa.int64()),
                          "ts": pa.array([], type=pa.int64()),
                          "event_id": pa.array([], type=pa.int64())})
        m = batch.num_rows
        if m == 0:
            return empty
        u = batch.column("user_id").to_numpy().astype(np.int64)
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        ty, inv = np.unique(np.asarray(batch.column("event_type")),
                            return_inverse=True)
        adj = u[1:] == u[:-1]
        pair = inv[:-1][adj] * len(ty) + inv[1:][adj]
        pu, pn = np.unique(pair, return_counts=True)
        rows = pa.table({
            "kind": pa.array(np.zeros(len(pu), dtype=np.int8)),
            "prev_type": pa.array(ty[pu // len(ty)], type=pa.string()),
            "next_type": pa.array(ty[pu % len(ty)], type=pa.string()),
            "n": pa.array(pn.astype(np.int64)),
            "user_id": pa.array(np.zeros(len(pu), dtype=np.int64)),
            "ts": pa.array(np.zeros(len(pu), dtype=np.int64)),
            "event_id": pa.array(np.zeros(len(pu), dtype=np.int64))})
        # context: first (kind 1) and last (kind 2) physical row
        ctx = pa.table({
            "kind": pa.array(np.array([1, 2], dtype=np.int8)),
            "prev_type": pa.array([str(ty[inv[0]]), str(ty[inv[m - 1]])],
                                  type=pa.string()),
            "next_type": pa.array(["", ""], type=pa.string()),
            "n": pa.array(np.zeros(2, dtype=np.int64)),
            "user_id": pa.array(u[[0, m - 1]]),
            "ts": pa.array(t[[0, m - 1]]),
            "event_id": pa.array(e[[0, m - 1]])})
        return pa.concat_tables([rows, ctx])

    out = (srt.map_batches(block_counts, batch_format="pyarrow",
                           batch_size=None).materialize())
    partials = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["prev_type", "next_type", "n"]),
        batch_format="pyarrow")
    ctx = pa.concat_tables(
        [tt for tt in ray.get(out.map_batches(
            lambda b: b.filter(pc.greater(b.column("kind"), 0)),
            batch_format="pyarrow").to_arrow_refs()) if tt.num_rows])

    heal_rows = {"prev_type": [], "next_type": [], "n": []}
    if ctx.num_rows:
        cu = ctx.column("user_id").to_numpy().astype(np.int64)
        ct = ctx.column("ts").to_numpy().astype(np.int64)
        ce = ctx.column("event_id").to_numpy().astype(np.int64)
        ck = ctx.column("kind").to_numpy().astype(np.int64)
        cty = np.asarray(ctx.column("prev_type"))
        # first (kind 1) sorts before last (kind 2) on eid ties
        order = np.lexsort((ck, ce, ct, cu))
        for a, b in zip(order[:-1], order[1:]):
            if (cu[a] == cu[b] and ck[a] == 2 and ck[b] == 1
                    and (ce[a], ct[a]) != (ce[b], ct[b])):
                heal_rows["prev_type"].append(str(cty[a]))
                heal_rows["next_type"].append(str(cty[b]))
                heal_rows["n"].append(1)
    healed = ray.data.from_arrow(pa.table({
        "prev_type": pa.array(heal_rows["prev_type"], type=pa.string()),
        "next_type": pa.array(heal_rows["next_type"], type=pa.string()),
        "n": pa.array(heal_rows["n"], type=pa.int64())}))

    agg = (partials.union(healed)
           .groupby(["prev_type", "next_type"]).aggregate(Sum("n")))
    return agg.map_batches(
        lambda b: pa.table({"prev_type": b.column("prev_type"),
                            "next_type": b.column("next_type"),
                            "n": b.column("sum(n)")}),
        batch_format="pyarrow")


def max_event_gap(sf_dir: str) -> ray.data.Dataset:
    """One-row ingestion-freshness monitor: the largest gap (microseconds)
    between consecutive events in global time order, plus the event count.

    Plan: ONE sort exchange by ts, then each (range-partitioned, internally
    sorted) block reports its local max gap and its first/last timestamps —
    a fixed-width sufficient statistic, because the only gaps a block
    cannot see are the B-1 seam gaps (next block's first ts minus this
    block's last), reconstructed on the driver from the O(blocks) stat rows
    ordered by first ts."""
    import numpy as np

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["ts"]).sort("ts")

    def block_stat(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        if len(ts) == 0:
            return pa.table({"first_ts": pa.array([], type=pa.int64()),
                             "last_ts": pa.array([], type=pa.int64()),
                             "max_gap": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        gap = int(np.diff(ts).max()) if len(ts) > 1 else 0
        return pa.table({"first_ts": pa.array([int(ts[0])], type=pa.int64()),
                         "last_ts": pa.array([int(ts[-1])], type=pa.int64()),
                         "max_gap": pa.array([gap], type=pa.int64()),
                         "n": pa.array([len(ts)], type=pa.int64())})

    parts = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     ds.map_batches(block_stat, batch_format="pyarrow",
                                    batch_size=None).to_arrow_refs())
         if t.num_rows])
    f = parts.column("first_ts").to_numpy()
    l = parts.column("last_ts").to_numpy()
    g = parts.column("max_gap").to_numpy()
    n = int(np.sum(parts.column("n").to_numpy()))
    order = np.argsort(f, kind="stable")
    f, l, g = f[order], l[order], g[order]
    best = int(g.max()) if len(g) else 0
    if len(f) > 1:
        seams = f[1:] - l[:-1]  # the cross-block gaps no block can see
        best = max(best, int(seams.max()))
    return ray.data.from_arrow(pa.table({
        "max_gap_us": pa.array([best], type=pa.int64()),
        "n_events": pa.array([n], type=pa.int64())}))


def event_disorder_audit(sf_dir: str) -> ray.data.Dataset:
    """One-row out-of-order-ingestion audit in arrival order (event_id):
    how many events arrive with a timestamp BELOW the running maximum of
    all strictly-earlier events, and the worst such lateness — the
    watermark-sizing statistic for streaming ingestion.

    Plan: ONE sort by event_id, materialized and passed twice (the
    user_value_median pattern): pass 1 ships a fixed-width (first_id,
    max_ts) stat per block; the driver computes each block's EXCLUSIVE
    prefix max (O(blocks)); pass 2 re-reads the same sorted blocks with
    the prefix broadcast and counts late events against
    max(prefix, local running max excluding self) — exact because
    max(a_i, b_i) composes per event.  Nothing event-sized leaves any
    block."""
    import numpy as np

    from ..sources.readers import read_table

    srt = read_table(sf_dir, "events", ["event_id", "ts"]) \
        .sort("event_id").materialize()

    def block_stat(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_id": pa.array([], type=pa.int64()),
                             "max_ts": pa.array([], type=pa.int64())})
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        eid = batch.column("event_id").to_numpy()
        return pa.table({"first_id": pa.array([int(eid[0])], type=pa.int64()),
                         "max_ts": pa.array([int(ts.max())], type=pa.int64())})

    stats = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     srt.map_batches(block_stat, batch_format="pyarrow",
                                     batch_size=None).to_arrow_refs())
         if t.num_rows])
    fid = stats.column("first_id").to_numpy()
    bmax = stats.column("max_ts").to_numpy()
    order = np.argsort(fid)
    fid, bmax = fid[order], bmax[order]
    # exclusive prefix max per block, keyed by the block's first event_id
    prefix = np.empty(len(bmax), dtype=np.int64)
    lo = np.iinfo(np.int64).min
    run = lo
    for i, m in enumerate(bmax.tolist()):
        prefix[i] = run
        run = max(run, m)
    pm_ref = ray.put((fid, prefix))

    def late_partial(batch: pa.Table, ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "n_late": pa.array([], type=pa.int64()),
                             "max_late": pa.array([], type=pa.int64())})
        f, p = ray.get(ref)
        eid = batch.column("event_id").to_numpy()
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        pm = int(p[np.searchsorted(f, int(eid[0]))])
        lrm = np.empty_like(ts)
        lrm[0] = np.iinfo(np.int64).min  # exclusive: first row has no prior
        if len(ts) > 1:
            np.maximum.accumulate(ts[:-1], out=lrm[1:])
        eff = np.maximum(lrm, pm)
        late = ts < eff
        max_late = int((eff[late] - ts[late]).max()) if late.any() else 0
        return pa.table({"n": pa.array([len(ts)], type=pa.int64()),
                         "n_late": pa.array([int(late.sum())], type=pa.int64()),
                         "max_late": pa.array([max_late], type=pa.int64())})

    parts = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     srt.map_batches(late_partial, batch_format="pyarrow",
                                     batch_size=None, fn_args=(pm_ref,))
                       .to_arrow_refs())
         if t.num_rows])
    return ray.data.from_arrow(pa.table({
        "n_events": pa.array([int(np.sum(parts.column("n").to_numpy()))],
                             type=pa.int64()),
        "n_late": pa.array([int(np.sum(parts.column("n_late").to_numpy()))],
                           type=pa.int64()),
        "max_lateness_us": pa.array(
            [int(np.max(parts.column("max_late").to_numpy()))]
            if parts.num_rows else [0], type=pa.int64()),
    }))


# ------------------------------------------------------- streaming windows
_STREAM_WIN_US = 3_600_000_000       # 1-hour tumbling windows
_STREAM_LATE_US = 1_800_000_000      # 30-min allowed lateness


def _arrival_us(event_ids: "np.ndarray", ts_us: "np.ndarray") -> "np.ndarray":
    """Deterministic ingestion-time model: 90% of events arrive at their
    event time; the md5(event_id)%10==0 tail arrives up to 4 h late
    (delay = md5_32 // 16 % 14400 seconds).  The events table itself is
    perfectly time-ordered, so the late tail is what makes watermark
    semantics observable; md5 of the decimal id keeps the model
    engine-independent (the same idiom as the md5-rank sampling ops)."""
    import hashlib

    h = np.fromiter(
        (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
         for i in event_ids), dtype=np.uint64, count=len(event_ids))
    delay = np.where(h % 10 == 0, (h // 16 % 14400).astype(np.int64)
                     * 1_000_000, 0)
    return ts_us + delay


def streaming_tumbling_windows(sf_dir: str, window_us: int = _STREAM_WIN_US,
                               lateness_us: int = _STREAM_LATE_US
                               ) -> ray.data.Dataset:
    """(win_start, event_type, n_events, sum_cents) — STREAMING tumbling
    windows with watermark semantics: events arrive in INGESTION order
    (``_arrival_us``: event time + a deterministic heavy-tail delay, NOT
    time order), the watermark trails the running max observed event time
    by ``lateness_us``, and an event whose window has already closed
    (win_end <= watermark at its arrival, watermark computed over
    STRICTLY PRIOR arrivals) is DROPPED, exactly as a Flink/Beam-style
    pipe discards late data (~6-8% of this corpus at the defaults).
    Surviving events aggregate per (hour window, event_type).

    Distributed form of the sequential stream: the per-arrival watermark
    is a prefix MAX over arrival order, so ONE (arrival, event_id) sort
    makes blocks contiguous arrival segments; pass 1 ships one
    (first arrival key, max_ts) row
    per block, the driver folds the O(blocks) exclusive prefix maxes and
    broadcasts them; pass 2 (same materialized sort, batch_size=None ->
    identical block boundaries) resolves each event's watermark from the
    block base + an in-block shifted cummax, filters late arrivals, and
    emits per-(window, type) combiner partials.  The driver merges
    window-domain-bounded partial rows — control-plane sized at any
    corpus scale.  Oracled: the prefix max is SQL's running-max window
    frame (ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)."""
    import ray

    from ..sources.readers import read_table

    W, L = int(window_us), int(lateness_us)

    def add_arrival(batch: pa.Table) -> pa.Table:
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        return batch.append_column("arr", pa.array(_arrival_us(e, t),
                                                   type=pa.int64()))

    srt = read_table(sf_dir, "events",
                     ["event_id", "ts", "event_type", "value"]) \
        .map_batches(add_arrival, batch_format="pyarrow") \
        .sort(["arr", "event_id"]).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        # block identity = the FIRST row's (arr, event_id) pair: the sort
        # is a total order, so the pair is unique even when an arr value
        # ties across a block boundary (a bare min-arr key would collide)
        if batch.num_rows == 0:
            return pa.table({"arr0": pa.array([], type=pa.int64()),
                             "eid0": pa.array([], type=pa.int64()),
                             "max_ts": pa.array([], type=pa.int64())})
        e = batch.column("arr").to_numpy()
        i = batch.column("event_id").to_numpy()
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        return pa.table({"arr0": pa.array([int(e[0])], type=pa.int64()),
                         "eid0": pa.array([int(i[0])], type=pa.int64()),
                         "max_ts": pa.array([int(t.max())], type=pa.int64())})

    stats = [t for t in ray.get(
        srt.map_batches(block_stats, batch_format="pyarrow",
                        batch_size=None).to_arrow_refs()) if t.num_rows]
    st = pa.concat_tables(stats)
    firsts = list(zip(st.column("arr0").to_pylist(),
                      st.column("eid0").to_pylist()))
    maxs = st.column("max_ts").to_numpy().astype(np.int64)
    order = sorted(range(len(firsts)), key=lambda k: firsts[k])
    sentinel = np.iinfo(np.int64).min // 4
    base_by_first = {}
    run = sentinel
    for k in order:
        base_by_first[firsts[k]] = run
        run = max(run, int(maxs[k]))
    base_ref = ray.put(base_by_first)

    def window_partials(batch: pa.Table, ref) -> pa.Table:
        empty = pa.table({"win_start": pa.array([], type=pa.int64()),
                          "event_type": pa.array([], type=pa.string()),
                          "n_events": pa.array([], type=pa.int64()),
                          "sum_cents": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        base_by_first = ray.get(ref)
        e = batch.column("arr").to_numpy().astype(np.int64)
        eid = batch.column("event_id").to_numpy().astype(np.int64)
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        b = base_by_first[(int(e[0]), int(eid[0]))]
        prev_max = np.r_[b, np.maximum(b, np.maximum.accumulate(ts)[:-1])]
        win_start = ts - ts % W
        keep = win_start + W > prev_max - L
        if not keep.any():
            return empty
        ws = win_start[keep]
        types = np.asarray(batch.column("event_type").to_pylist(),
                           dtype=object)[keep]
        vals = batch.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)[keep]
        cents = np.where(np.isnan(vals), 0.0,
                         np.where(vals >= 0, np.floor(vals * 100 + 0.5),
                                  -np.floor(-vals * 100 + 0.5))) \
            .astype(np.int64)
        t_uniq, t_inv = np.unique(types, return_inverse=True)
        w_uniq, w_inv = np.unique(ws, return_inverse=True)
        comp = w_inv * len(t_uniq) + t_inv
        n = np.bincount(comp, minlength=len(w_uniq) * len(t_uniq))
        s = np.bincount(comp, weights=cents.astype(np.float64),
                        minlength=len(w_uniq) * len(t_uniq))
        nz = np.flatnonzero(n)
        return pa.table({
            "win_start": pa.array(w_uniq[nz // len(t_uniq)],
                                  type=pa.int64()),
            "event_type": pa.array(t_uniq[nz % len(t_uniq)].tolist(),
                                   type=pa.string()),
            "n_events": pa.array(n[nz].astype(np.int64)),
            "sum_cents": pa.array(s[nz].astype(np.int64)),
        })

    parts = [t for t in ray.get(
        srt.map_batches(window_partials, batch_format="pyarrow",
                        batch_size=None, fn_args=(base_ref,))
           .to_arrow_refs()) if t.num_rows]
    acc: dict = {}
    for t in parts:
        for w, ty, n, s in zip(t.column("win_start").to_pylist(),
                               t.column("event_type").to_pylist(),
                               t.column("n_events").to_pylist(),
                               t.column("sum_cents").to_pylist()):
            k = (w, ty)
            pn, ps = acc.get(k, (0, 0))
            acc[k] = (pn + n, ps + s)
    keys = sorted(acc)
    return ray.data.from_arrow(pa.table({
        "win_start": pa.array([k[0] for k in keys], type=pa.int64()),
        "event_type": pa.array([k[1] for k in keys], type=pa.string()),
        "n_events": pa.array([acc[k][0] for k in keys], type=pa.int64()),
        "sum_cents": pa.array([acc[k][1] for k in keys], type=pa.int64()),
    }))


def streaming_late_drops(sf_dir: str, window_us: int = _STREAM_WIN_US,
                         lateness_us: int = _STREAM_LATE_US
                         ) -> ray.data.Dataset:
    """(n_total, n_dropped, max_over_us) — the monitoring face of
    ``streaming_tumbling_windows``: how many arrivals were discarded as
    late, and the worst overshoot (how far past its window's close the
    latest arrival landed, in microseconds).  Same arrival model, same
    distributed prefix-max scan; partials are three integers per block."""
    import ray

    from ..sources.readers import read_table

    W, L = int(window_us), int(lateness_us)

    def add_arrival(batch: pa.Table) -> pa.Table:
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        return batch.append_column("arr", pa.array(_arrival_us(e, t),
                                                   type=pa.int64()))

    srt = read_table(sf_dir, "events", ["event_id", "ts"]) \
        .map_batches(add_arrival, batch_format="pyarrow") \
        .sort(["arr", "event_id"]).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"arr0": pa.array([], type=pa.int64()),
                             "eid0": pa.array([], type=pa.int64()),
                             "max_ts": pa.array([], type=pa.int64())})
        e = batch.column("arr").to_numpy()
        i = batch.column("event_id").to_numpy()
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        return pa.table({"arr0": pa.array([int(e[0])], type=pa.int64()),
                         "eid0": pa.array([int(i[0])], type=pa.int64()),
                         "max_ts": pa.array([int(t.max())], type=pa.int64())})

    stats = [t for t in ray.get(
        srt.map_batches(block_stats, batch_format="pyarrow",
                        batch_size=None).to_arrow_refs()) if t.num_rows]
    st = pa.concat_tables(stats)
    firsts = list(zip(st.column("arr0").to_pylist(),
                      st.column("eid0").to_pylist()))
    maxs = st.column("max_ts").to_numpy().astype(np.int64)
    sentinel = np.iinfo(np.int64).min // 4
    base_by_first = {}
    run = sentinel
    for k in sorted(range(len(firsts)), key=lambda j: firsts[j]):
        base_by_first[firsts[k]] = run
        run = max(run, int(maxs[k]))
    base_ref = ray.put(base_by_first)

    def drop_partial(batch: pa.Table, ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "nd": pa.array([], type=pa.int64()),
                             "mo": pa.array([], type=pa.int64())})
        base_by = ray.get(ref)
        e = batch.column("arr").to_numpy().astype(np.int64)
        eid = batch.column("event_id").to_numpy().astype(np.int64)
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        b = base_by[(int(e[0]), int(eid[0]))]
        prev_max = np.r_[b, np.maximum(b, np.maximum.accumulate(ts)[:-1])]
        win_end = ts - ts % W + W
        over = prev_max - L - win_end   # dropped iff >= 0
        dropped = over >= 0
        mo = int(over[dropped].max()) if dropped.any() else 0
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64()),
                         "nd": pa.array([int(dropped.sum())],
                                        type=pa.int64()),
                         "mo": pa.array([mo], type=pa.int64())})

    parts = [t for t in ray.get(
        srt.map_batches(drop_partial, batch_format="pyarrow",
                        batch_size=None, fn_args=(base_ref,))
           .to_arrow_refs()) if t.num_rows]
    n = sum(int(x) for t in parts for x in t.column("n").to_pylist())
    nd = sum(int(x) for t in parts for x in t.column("nd").to_pylist())
    mo = max((int(x) for t in parts for x in t.column("mo").to_pylist()),
             default=0)
    return ray.data.from_arrow(pa.table({
        "n_total": pa.array([n], type=pa.int64()),
        "n_dropped": pa.array([nd], type=pa.int64()),
        "max_over_us": pa.array([mo], type=pa.int64()),
    }))


def _live_events(sf_dir: str, window_us: int, lateness_us: int,
                 columns: tuple) -> "ray.data.Dataset":
    """Watermark-surviving events under the ``_arrival_us`` ingestion
    model: the shared filter stage of the streaming window/session ops.
    Returns the requested columns (plus event_id/ts) for every arrival
    whose tumbling window was still open at its arrival time."""
    import ray

    from ..sources.readers import read_table

    W, L = int(window_us), int(lateness_us)
    cols = list(dict.fromkeys(["event_id", "ts", *columns]))

    def add_arrival(batch: pa.Table) -> pa.Table:
        e = batch.column("event_id").to_numpy().astype(np.int64)
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        return batch.append_column("arr", pa.array(_arrival_us(e, t),
                                                   type=pa.int64()))

    srt = read_table(sf_dir, "events", cols) \
        .map_batches(add_arrival, batch_format="pyarrow") \
        .sort(["arr", "event_id"]).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"arr0": pa.array([], type=pa.int64()),
                             "eid0": pa.array([], type=pa.int64()),
                             "max_ts": pa.array([], type=pa.int64())})
        e = batch.column("arr").to_numpy()
        i = batch.column("event_id").to_numpy()
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        return pa.table({"arr0": pa.array([int(e[0])], type=pa.int64()),
                         "eid0": pa.array([int(i[0])], type=pa.int64()),
                         "max_ts": pa.array([int(t.max())], type=pa.int64())})

    stats = [t for t in ray.get(
        srt.map_batches(block_stats, batch_format="pyarrow",
                        batch_size=None).to_arrow_refs()) if t.num_rows]
    st = pa.concat_tables(stats)
    firsts = list(zip(st.column("arr0").to_pylist(),
                      st.column("eid0").to_pylist()))
    maxs = st.column("max_ts").to_numpy().astype(np.int64)
    sentinel = np.iinfo(np.int64).min // 4
    base_by_first = {}
    run = sentinel
    for k in sorted(range(len(firsts)), key=lambda j: firsts[j]):
        base_by_first[firsts[k]] = run
        run = max(run, int(maxs[k]))
    base_ref = ray.put(base_by_first)

    def live(batch: pa.Table, ref) -> pa.Table:
        if batch.num_rows == 0:
            return batch.drop_columns(["arr"])
        base_by = ray.get(ref)
        e = batch.column("arr").to_numpy().astype(np.int64)
        eid = batch.column("event_id").to_numpy().astype(np.int64)
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        b = base_by[(int(e[0]), int(eid[0]))]
        prev_max = np.r_[b, np.maximum(b, np.maximum.accumulate(ts)[:-1])]
        keep = (ts - ts % W) + W > prev_max - L
        return batch.filter(pa.array(keep)).drop_columns(["arr"])

    return srt.map_batches(live, batch_format="pyarrow", batch_size=None,
                           fn_args=(base_ref,))


def streaming_user_sessions(sf_dir: str, gap_us: int = SESSION_GAP_US,
                            window_us: int = _STREAM_WIN_US,
                            lateness_us: int = _STREAM_LATE_US
                            ) -> ray.data.Dataset:
    """Sessionization over the WATERMARK-SURVIVING stream: arrivals whose
    window already closed are dropped (the streaming_tumbling_windows
    discipline), then the survivors sessionize per user in EVENT time —
    the eventual-result semantics of a session-window operator with
    allowed lateness, where an accepted late event may retroactively
    extend or bridge sessions.  Output shape matches ``user_sessions``.
    Two exchanges by necessity (arrival-order scan, then user/time sort);
    both reuse the existing distributed machinery."""
    live = _live_events(sf_dir, window_us, lateness_us, ("user_id",))
    return _sessionize_ds(live, gap_us)
