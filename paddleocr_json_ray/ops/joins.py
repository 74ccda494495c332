"""Custom join/order operators Ray Data has no native form for — each
documents the partitioning assumption it relies on (instructions: as-of
join, range join, windowed top-k as compositions of map_batches / sort +
run detection / broadcast, never per-row Python in the hot path).

  * ``events_last_signup`` — AS-OF join (most recent signup at-or-before
    each event, per user).  The build side (signup events) is small after
    the filter, so it is broadcast once via ``ray.put`` as ONE sorted
    packed (user, ts) key array; every probe batch is a single
    ``np.searchsorted`` — no shuffle at all.  Partitioning assumption:
    build side fits the object store (it is a filtered slice); at larger
    build sides the same merge runs after a groupby(user).
  * ``events_value_bands`` — RANGE join against an interval table: the
    band table is tiny and static, so the interval lookup is a broadcast
    ``np.searchsorted`` over the band edges inside ``map_batches``,
    followed by the native partial-aggregate groupby.
  * ``top_orders_per_cust`` — grouped top-k: sort by the group key, then
    per-block vectorized run detection picks each complete group's top-k
    (lexsort + rank-within-run); groups touching a block boundary ship only
    their BLOCK-LOCAL top-k rows (sufficient statistics — the global top-k
    is contained in the union of block-local top-ks) to a distributed
    ``groupby().map_groups`` heal, so a hot key spanning many blocks costs
    k rows per block, never O(hot-key) rows, and never lands on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .relational import _round2


def events_last_signup(sf_dir: str) -> ray.data.Dataset:
    """(event_id, last_signup_us nullable) — most recent 'signup' event of
    the same user at-or-before each event's timestamp."""
    import pyarrow.parquet as pq

    # build side: pruned at the read with a predicate — only signup rows
    build = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["user_id", "ts", "event_type"],
                          filters=[("event_type", "=", "signup")])
    bu = build.column("user_id").to_numpy().astype(np.uint64)
    bt = build.column("ts").cast(pa.int64()).to_numpy()
    base = int(bt.min()) if len(bt) else 0
    # pack (user, ts-offset) into one sortable uint64 key: ts spans << 2^44
    keys = (bu << np.uint64(44)) | (bt - base).astype(np.uint64)
    order = np.argsort(keys)
    keys, bu_s, bt_s = keys[order], bu[order], bt[order]
    build_ref = ray.put((keys, bu_s, bt_s, base))

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def probe(batch: pa.Table) -> pa.Table:
        keys_, bu_, bt_, base_ = ray.get(build_ref)
        users = batch.column("user_id").to_numpy().astype(np.uint64)
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        pk = (users << np.uint64(44)) | np.maximum(ts - base_, 0).astype(np.uint64)
        pos = np.searchsorted(keys_, pk, side="right")
        valid = (pos > 0) & (bu_[np.maximum(pos - 1, 0)] == users) & (ts >= base_)
        out = bt_[np.maximum(pos - 1, 0)]
        return pa.table({
            "event_id": batch.column("event_id"),
            "last_signup_us": pa.array(
                [int(v) if f else None for v, f in zip(out, valid)], type=pa.int64()),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


_BAND_EDGES = (10.0, 100.0)
_BAND_NAMES = ("low", "mid", "high")


def events_value_bands(sf_dir: str) -> ray.data.Dataset:
    """Range join events.value into static bands [0,10) [10,100) [100,inf),
    aggregated per band: (band, n_events, sum_value)."""
    from ray.data.aggregate import Count, Sum

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["value"])
    edges = np.asarray(_BAND_EDGES)

    def band(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy().astype(np.float64)
        idx = np.searchsorted(edges, v, side="right")
        return pa.table({
            "band": pa.array([_BAND_NAMES[i] for i in idx], type=pa.string()),
            "value": batch.column("value"),
        })

    agg = ds.map_batches(band, batch_format="pyarrow").groupby("band") \
            .aggregate(Count(), Sum("value"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "band": batch.column("band"),
            "n_events": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
            "sum_value": pa.array([_round2(v) for v in batch.column("sum(value)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def top_orders_per_cust(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k orders per customer by (o_totalprice desc, o_orderkey asc):
    sort by customer, vectorized per-block run ranking; boundary groups are
    truncated to their block-local top-k (sufficient statistics) and healed
    by a distributed grouped re-rank — skew-safe: a hot customer spanning B
    blocks ships k*B rows to ONE heal task, never its full row set."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "orders",
                    ["o_custkey", "o_orderkey", "o_totalprice"])

    def block_topk(batch: pa.Table) -> pa.Table:
        c = batch.column("o_custkey").to_numpy().astype(np.int64)
        o = batch.column("o_orderkey").to_numpy().astype(np.int64)
        p = batch.column("o_totalprice").to_numpy().astype(np.float64)
        empty = {"kind": np.empty(0, dtype=np.int8), "o_custkey": np.empty(0, dtype=np.int64),
                 "o_orderkey": np.empty(0, dtype=np.int64), "rank": np.empty(0, dtype=np.int64),
                 "price": np.empty(0, dtype=np.float64)}
        if len(c) == 0:
            return pa.table({k2: pa.array(v) for k2, v in empty.items()})
        order = np.lexsort((o, -p, c))  # cust asc, price desc, orderkey asc
        cs, os_, ps = c[order], o[order], p[order]
        grp_start = np.r_[True, np.diff(cs) != 0]
        grp_id = np.cumsum(grp_start) - 1
        rank = np.arange(len(cs)) - np.flatnonzero(grp_start)[grp_id] + 1
        edge = (cs == cs[0]) | (cs == cs[-1])  # boundary groups -> grouped heal
        keep_final = (~edge) & (rank <= k)
        keep_edge = edge & (rank <= k)  # block-local top-k suffices globally
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(keep_final.sum(), dtype=np.int8),
                                   np.ones(keep_edge.sum(), dtype=np.int8)]),
            "o_custkey": pa.array(np.r_[cs[keep_final], cs[keep_edge]], type=pa.int64()),
            "o_orderkey": pa.array(np.r_[os_[keep_final], os_[keep_edge]], type=pa.int64()),
            "rank": pa.array(np.r_[rank[keep_final], rank[keep_edge]], type=pa.int64()),
            "price": pa.array(np.r_[ps[keep_final], ps[keep_edge]], type=pa.float64()),
        })

    import pyarrow.compute as pc

    out = (ds.sort("o_custkey")
             .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
             .materialize())
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(
            ["o_custkey", "o_orderkey", "rank"]),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        o = group.column("o_orderkey").to_numpy().astype(np.int64)
        p = group.column("price").to_numpy().astype(np.float64)
        top = np.lexsort((o, -p))[:k]
        return pa.table({
            "o_custkey": group.column("o_custkey").slice(0, len(top)),
            "o_orderkey": pa.array(o[top], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        })

    healed = edges.groupby("o_custkey").map_groups(heal, batch_format="pyarrow")
    return finals.union(healed)


def _sorted_user_ts(agg_ds: ray.data.Dataset,
                    ts_col: str = "min(ts_us)") -> tuple[np.ndarray, np.ndarray]:
    """Collect a users-bounded (user_id, ts) aggregate into sorted parallel
    numpy arrays straight from the Arrow refs (no pandas)."""
    tabs = [ray.get(r) for r in agg_ds.to_arrow_refs()]
    t = pa.concat_tables([tb for tb in tabs if tb.num_rows],
                         ) if any(tb.num_rows for tb in tabs) else None
    if t is None or t.num_rows == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    u = t.column("user_id").to_numpy().astype(np.int64)
    ts = t.column(ts_col).to_numpy().astype(np.int64)
    order = np.argsort(u)
    return u[order], ts[order]


def _lookup_ts(sorted_u: np.ndarray, sorted_ts: np.ndarray,
               probe: np.ndarray) -> np.ndarray:
    """Vectorized user -> ts lookup; misses get int64 max (excludes them
    from any strictly-after comparison)."""
    if len(sorted_u) == 0:
        return np.full(len(probe), np.iinfo(np.int64).max, dtype=np.int64)
    pos = np.minimum(np.searchsorted(sorted_u, probe), len(sorted_u) - 1)
    hit = sorted_u[pos] == probe
    return np.where(hit, sorted_ts[pos], np.iinfo(np.int64).max)


def user_funnel(sf_dir: str,
                broadcast_max_users: int | None = None) -> ray.data.Dataset:
    """(user_id, funnel_stage) — how far each user progressed through the
    ORDERED funnel signup -> click -> purchase (stage 0-3): the sequential
    event-pattern shape (conversion funnels, multi-step task completion).

    Three chained stages, each a native grouped Min over a filtered read;
    stage k+1's candidate events must be STRICTLY after the user's stage-k
    first-hit time.  TWO TIERS on per-stage user cardinality (counted on
    the distributed aggregate, measured before anything lands anywhere):

      * broadcast tier (<= ``broadcast_max_users``, default
        $PJR_FUNNEL_BROADCAST_MAX or 10M): the stage-k first-hit table is
        two sorted int64 arrays in the object store (16 B/user), applied
        per batch with one vectorized ``np.searchsorted`` — no per-row
        Python, no shuffle;
      * join tier (beyond): the SAME chain as partitioned hash joins —
        stage-k+1 events join the stage-k firsts on user_id, filter
        strictly-after, then the grouped Min; the final stage assignment
        is three left-outer joins onto the distinct-user set.  Nothing is
        ever materialized on the driver, so a billion-user events table
        costs three user-keyed exchanges, not driver RSS.

    Both tiers are equality-tested (tests/test_joins.py pins
    ``broadcast_max_users=0``)."""
    from ray.data.aggregate import Count, Min

    from ..sources.readers import read_table
    from .relational import _join_partitions

    cap = (broadcast_max_users if broadcast_max_users is not None
           else int(os.environ.get("PJR_FUNNEL_BROADCAST_MAX", 10_000_000)))
    ds = read_table(sf_dir, "events", ["user_id", "ts", "event_type"])

    def pick(etype: str, after_ref):
        """Per-batch combiner: one (user, min ts) row per user present,
        thresholded against the broadcast previous stage when given."""

        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch.column("event_type"), etype))
            u = t.column("user_id").to_numpy().astype(np.int64)
            ts = t.column("ts").cast(pa.int64()).to_numpy()
            if after_ref is not None:
                au, ats = ray.get(after_ref)
                keep = ts > _lookup_ts(au, ats, u)
                u, ts = u[keep], ts[keep]
            if len(u) == 0:
                return pa.table({"user_id": pa.array([], type=pa.int64()),
                                 "ts_us": pa.array([], type=pa.int64())})
            order = np.argsort(u, kind="stable")
            u, ts = u[order], ts[order]
            st = np.r_[0, np.flatnonzero(np.diff(u)) + 1]
            return pa.table({
                "user_id": pa.array(u[st], type=pa.int64()),
                "ts_us": pa.array(np.minimum.reduceat(ts, st), type=pa.int64()),
            })

        return fn

    def grouped_min(stream: ray.data.Dataset) -> ray.data.Dataset:
        return (stream.groupby("user_id").aggregate(Min("ts_us"))
                      .materialize())

    def join_stage(etype: str, prev: ray.data.Dataset) -> ray.data.Dataset:
        """Join tier: etype events semi-joined to the previous stage's
        firsts, strictly-after filter, then the grouped Min.  The events
        CANNOT be per-batch min-combined before the join — the per-user
        threshold is unknown until the join lands, and a pre-min below the
        threshold would mask a valid later candidate in the same batch —
        so the join ships the etype slice raw (one event type's rows, not
        the corpus) and the combiner runs after the filter."""
        prev_r = prev.map_batches(
            lambda b: pa.table({"uj": b.column("user_id"),
                                "prev_us": b.column("min(ts_us)")}),
            batch_format="pyarrow")

        def slice_etype(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch.column("event_type"), etype))
            return pa.table({
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts_us": t.column("ts").cast(pa.int64()),
            })

        ev = ds.map_batches(slice_etype, batch_format="pyarrow")
        joined = ev.join(prev_r, "inner",
                         num_partitions=_join_partitions(ev, prev_r),
                         on=("user_id",), right_on=("uj",))

        def after_min(b: pa.Table) -> pa.Table:
            t = b.filter(pc.greater(b.column("ts_us"), b.column("prev_us")))
            u = t.column("user_id").to_numpy().astype(np.int64)
            ts = t.column("ts_us").to_numpy()
            if len(u) == 0:
                return pa.table({"user_id": pa.array([], type=pa.int64()),
                                 "ts_us": pa.array([], type=pa.int64())})
            order = np.argsort(u, kind="stable")
            u, ts = u[order], ts[order]
            st = np.r_[0, np.flatnonzero(np.diff(u)) + 1]
            return pa.table({
                "user_id": pa.array(u[st], type=pa.int64()),
                "ts_us": pa.array(np.minimum.reduceat(ts, st),
                                  type=pa.int64()),
            })

        return grouped_min(joined.map_batches(after_min,
                                              batch_format="pyarrow"))

    t1 = grouped_min(ds.map_batches(pick("signup", None),
                                    batch_format="pyarrow"))
    small = t1.count() <= cap  # later stages only shrink
    if small:
        r1 = ray.put(_sorted_user_ts(t1))
        t2 = grouped_min(ds.map_batches(pick("click", r1),
                                        batch_format="pyarrow"))
        r2 = ray.put(_sorted_user_ts(t2))
        t3 = grouped_min(ds.map_batches(pick("purchase", r2),
                                        batch_format="pyarrow"))
        r3 = ray.put(_sorted_user_ts(t3))
    else:
        t2 = join_stage("click", t1)
        t3 = join_stage("purchase", t2)

    users = (ds.map_batches(
        lambda b: b.select(["user_id"]).group_by("user_id").aggregate([]),
        batch_format="pyarrow")
        .groupby("user_id").aggregate(Count()))

    if small:
        def stage(batch: pa.Table, ra, rb, rc) -> pa.Table:
            au, _ = ray.get(ra)
            bu, _ = ray.get(rb)
            cu, _ = ray.get(rc)
            u = batch.column("user_id").to_numpy().astype(np.int64)

            def member(arr: np.ndarray) -> np.ndarray:
                if len(arr) == 0:
                    return np.zeros(len(u), dtype=np.int64)
                p = np.minimum(np.searchsorted(arr, u), len(arr) - 1)
                return (arr[p] == u).astype(np.int64)

            # stages nest (c ⊆ b ⊆ a by construction) so membership sums
            st = member(au) + member(bu) + member(cu)
            return pa.table({"user_id": pa.array(u, type=pa.int64()),
                             "funnel_stage": pa.array(st, type=pa.int64())})

        return users.map_batches(stage, batch_format="pyarrow",
                                 fn_args=(r1, r2, r3))

    # join tier: three left-outer joins onto the distinct-user set; stage =
    # number of non-null first-hit timestamps (they nest).
    out = users.select_columns(["user_id"])
    for i, tk in enumerate((t1, t2, t3), start=1):
        rhs = tk.map_batches(
            lambda b, i=i: pa.table({f"u{i}": b.column("user_id"),
                                     f"hit{i}": b.column("min(ts_us)")}),
            batch_format="pyarrow")
        out = out.join(rhs, "left_outer",
                       num_partitions=_join_partitions(out, rhs),
                       on=("user_id",), right_on=(f"u{i}",))

    def assign(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        st = np.zeros(len(u), dtype=np.int64)
        for i in (1, 2, 3):
            st += pc.is_valid(batch.column(f"hit{i}")).to_numpy(
                zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": pa.array(u, type=pa.int64()),
                         "funnel_stage": pa.array(st, type=pa.int64())})

    return out.map_batches(assign, batch_format="pyarrow")


def click_to_purchase(sf_dir: str,
                      horizon_us: int = 3_600_000_000) -> ray.data.Dataset:
    """(user_id, n_pairs) — conversion pairs: per user, how many
    (click, purchase) event pairs have the purchase within ``horizon_us``
    AFTER the click (the temporal SELF-join: ``e JOIN e ON same user AND
    0 < Δt <= H``, which a naive plan executes as an all-pairs blowup).

    Time-bucket co-partition instead: every event maps to bucket
    ``ts // H``; a qualifying purchase is always in the click's bucket or
    the next one, so clicks fan out to exactly those TWO (user, bucket)
    keys and one sort co-locates every candidate pair.  Per block,
    complete (user, bucket) runs count matches with two vectorized
    ``searchsorted``s over the run's purchase timestamps; runs touching a
    block edge ship to a distributed grouped heal keyed by (user, bucket).
    Partitioning assumption: one user's events within one ``horizon_us``
    bucket fit a heal task (per-user-per-hour volume, not corpus volume);
    a pathological single-hot-bucket user would need bucket salting +
    a second combine."""
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "ts", "event_type"])

    def emit(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        t = batch.filter(keep)
        u = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        is_p = np.asarray(pc.equal(t.column("event_type"), "purchase"))
        bkt = ts // horizon_us
        # purchases once in their own bucket; clicks probe bucket and bucket+1
        pu, pts, pb = u[is_p], ts[is_p], bkt[is_p]
        cu, cts, cb = u[~is_p], ts[~is_p], bkt[~is_p]
        return pa.table({
            "user_id": pa.array(np.concatenate([pu, cu, cu])),
            "bucket": pa.array(np.concatenate([pb, cb, cb + 1])),
            "role": pa.array(np.concatenate([
                np.ones(len(pu), dtype=np.int8),
                np.zeros(2 * len(cu), dtype=np.int8)])),
            "ets": pa.array(np.concatenate([pts, cts, cts])),
        })

    srt = (ds.map_batches(emit, batch_format="pyarrow")
             .sort(["user_id", "bucket", "ets"]))

    def _count_runs(u, b, role, ets, starts, stops):
        uid, cnt = [], []
        for s, e in zip(starts, stops):
            r = role[s:e]
            p_ts = ets[s:e][r == 1]
            c_ts = ets[s:e][r == 0]
            if len(p_ts) == 0 or len(c_ts) == 0:
                continue
            hits = (np.searchsorted(p_ts, c_ts + horizon_us, side="right")
                    - np.searchsorted(p_ts, c_ts, side="right"))
            tot = int(hits.sum())
            if tot:
                uid.append(int(u[s]))
                cnt.append(tot)
        return pa.table({"user_id": pa.array(uid, type=pa.int64()),
                         "n": pa.array(cnt, type=pa.int64())})

    def block_count(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "user_id": pa.array([], type=pa.int64()),
                          "bucket": pa.array([], type=pa.int64()),
                          "role": pa.array([], type=pa.int8()),
                          "ets": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        u = batch.column("user_id").to_numpy().astype(np.int64)
        b = batch.column("bucket").to_numpy().astype(np.int64)
        role = batch.column("role").to_numpy().astype(np.int8)
        ets = batch.column("ets").to_numpy().astype(np.int64)
        key_chg = np.flatnonzero((np.diff(u) != 0) | (np.diff(b) != 0)) + 1
        starts = np.r_[0, key_chg]
        stops = np.r_[key_chg, n]
        interior = _count_runs(u, b, role, ets, starts[1:-1], stops[1:-1]) \
            if len(starts) > 2 else None
        lo, hi = starts[0], stops[0]
        lo2, hi2 = starts[-1], stops[-1]
        edge_idx = np.r_[np.arange(lo, hi), np.arange(lo2, hi2)] \
            if len(starts) > 1 else np.arange(lo, hi)
        rows = {"kind": pa.array(np.ones(len(edge_idx), dtype=np.int8)),
                "user_id": pa.array(u[edge_idx]),
                "bucket": pa.array(b[edge_idx]),
                "role": pa.array(role[edge_idx]),
                "ets": pa.array(ets[edge_idx]),
                "n": pa.array(np.zeros(len(edge_idx), dtype=np.int64))}
        edge_t = pa.table(rows)
        if interior is None or interior.num_rows == 0:
            return edge_t
        int_t = pa.table({
            "kind": pa.array(np.zeros(interior.num_rows, dtype=np.int8)),
            "user_id": interior.column("user_id"),
            "bucket": pa.array(np.zeros(interior.num_rows, dtype=np.int64)),
            "role": pa.array(np.zeros(interior.num_rows, dtype=np.int8)),
            "ets": pa.array(np.zeros(interior.num_rows, dtype=np.int64)),
            "n": interior.column("n"),
        })
        return pa.concat_tables([int_t, edge_t])

    out = srt.map_batches(block_count, batch_format="pyarrow",
                          batch_size=None).materialize()
    finals = out.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0))
                   .select(["user_id", "n"]),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1))
                   .select(["user_id", "bucket", "role", "ets"]),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        role = group.column("role").to_numpy().astype(np.int8)
        ets = group.column("ets").to_numpy().astype(np.int64)
        p_ts = np.sort(ets[role == 1])
        c_ts = ets[role == 0]
        if len(p_ts) == 0 or len(c_ts) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        hits = (np.searchsorted(p_ts, c_ts + horizon_us, side="right")
                - np.searchsorted(p_ts, c_ts, side="right"))
        tot = int(hits.sum())
        if tot == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"user_id": group.column("user_id").slice(0, 1),
                         "n": pa.array([tot], type=pa.int64())})

    healed = (edges.groupby(["user_id", "bucket"])
                   .map_groups(heal, batch_format="pyarrow"))
    agg = finals.union(healed).groupby("user_id").aggregate(Sum("n"))
    return agg.map_batches(
        lambda t: pa.table({
            "user_id": t.column("user_id"),
            "n_pairs": t.column("sum(n)").cast(pa.int64()),
        }), batch_format="pyarrow")


def events_next_signup(sf_dir: str) -> ray.data.Dataset:
    """(event_id, next_signup_us nullable) — the FORWARD as-of join: the
    same user's earliest 'signup' at-or-after each event's timestamp.
    Mirror of ``events_last_signup``: the filtered build side broadcasts
    once as a sorted packed (user, ts) key array and every probe batch is
    one ``np.searchsorted(side='left')`` — zero shuffle.  Same partitioning
    assumption: the build side is a filtered slice that fits the object
    store; beyond that the identical merge runs after a groupby(user)."""
    import pyarrow.parquet as pq

    build = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["user_id", "ts", "event_type"],
                          filters=[("event_type", "=", "signup")])
    bu = build.column("user_id").to_numpy().astype(np.uint64)
    bt = build.column("ts").cast(pa.int64()).to_numpy()
    base = int(bt.min()) if len(bt) else 0
    keys = (bu << np.uint64(44)) | (bt - base).astype(np.uint64)
    order = np.argsort(keys)
    keys, bu_s, bt_s = keys[order], bu[order], bt[order]
    build_ref = ray.put((keys, bu_s, bt_s, base))

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def probe(batch: pa.Table) -> pa.Table:
        keys_, bu_, bt_, base_ = ray.get(build_ref)
        users = batch.column("user_id").to_numpy().astype(np.uint64)
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        pk = (users << np.uint64(44)) | np.maximum(ts - base_, 0).astype(np.uint64)
        pos = np.searchsorted(keys_, pk, side="left")
        safe = np.minimum(pos, max(len(keys_) - 1, 0))
        valid = (pos < len(keys_)) & (bu_[safe] == users) if len(keys_) \
            else np.zeros(len(users), dtype=bool)
        out = bt_[safe] if len(keys_) else np.zeros(len(users), dtype=np.int64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "next_signup_us": pa.array(
                [int(v) if f else None for v, f in zip(out, valid)],
                type=pa.int64()),
        })

    return ds.map_batches(probe, batch_format="pyarrow")
