"""Custom join operators vs brute-force oracles on controlled data,
exercising the block-boundary healing paths explicitly."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.ops import joins


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(21)
    n = 3000
    base = 1_600_000_000_000_000
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 40, size=n), type=pa.int64()),
        "ts": pa.array((base + rng.integers(0, 10**12, size=n)).tolist(),
                       type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["signup", "view", "click"], size=n)),
        "value": pa.array(rng.uniform(-5, 500, size=n)),
    })
    d = tmp_path_factory.mktemp("ev")
    pq.write_table(tab, os.path.join(str(d), "events.parquet"))
    return str(d), tab


def test_asof_matches_bruteforce(ray_session, events_dir):
    d, tab = events_dir
    got = joins.events_last_signup(d).to_pandas().set_index("event_id")["last_signup_us"]
    users = tab.column("user_id").to_numpy()
    ts = tab.column("ts").cast(pa.int64()).to_numpy()
    types = tab.column("event_type").to_pylist()
    for eid in range(0, 3000, 37):
        cand = [ts[j] for j in range(3000)
                if types[j] == "signup" and users[j] == users[eid] and ts[j] <= ts[eid]]
        expect = max(cand) if cand else None
        val = got.loc[eid]
        assert (expect is None) == (val is None or np.isnan(val))
        if expect is not None:
            assert int(val) == expect


def test_asof_user_with_no_signups_is_null(ray_session, tmp_path):
    tab = pa.table({
        "event_id": pa.array([0, 1], type=pa.int64()),
        "user_id": pa.array([7, 8], type=pa.int64()),
        "ts": pa.array([10**15, 10**15 + 5], type=pa.timestamp("us")),
        "event_type": pa.array(["view", "signup"]),
        "value": pa.array([1.0, 2.0]),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = joins.events_last_signup(str(tmp_path)).to_pandas().set_index("event_id")
    assert np.isnan(got.loc[0, "last_signup_us"])  # user 7 never signed up
    assert int(got.loc[1, "last_signup_us"]) == 10**15 + 5  # own signup, ts >= ts


def test_value_bands_cover_all_rows(ray_session, events_dir):
    d, tab = events_dir
    got = joins.events_value_bands(d).to_pandas()
    assert int(got["n_events"].sum()) == tab.num_rows  # negatives land in 'low'
    v = tab.column("value").to_numpy()
    by = dict(zip(got["band"], got["n_events"]))
    assert by["low"] == int((v < 10).sum())
    assert by["mid"] == int(((v >= 10) & (v < 100)).sum())
    assert by["high"] == int((v >= 100).sum())


def test_grouped_topk_matches_bruteforce(ray_session, tmp_path):
    """Many tiny blocks force group-per-block-boundary healing."""
    import ray.data

    rng = np.random.default_rng(33)
    n = 5000
    tab = pa.table({
        "o_custkey": pa.array(rng.integers(0, 200, size=n), type=pa.int64()),
        "o_orderkey": pa.array(np.arange(n), type=pa.int64()),
        "o_totalprice": pa.array(np.round(rng.uniform(1, 9999, size=n), 2)),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "orders.parquet"))
    got = joins.top_orders_per_cust(str(tmp_path), k=3).to_pandas()
    c = tab.column("o_custkey").to_numpy()
    o = tab.column("o_orderkey").to_numpy()
    p = tab.column("o_totalprice").to_numpy()
    expect = set()
    for cust in np.unique(c):
        rows = np.flatnonzero(c == cust)
        order = rows[np.lexsort((o[rows], -p[rows]))][:3]
        expect.update((int(cust), int(o[i]), r + 1) for r, i in enumerate(order))
    assert set(zip(got["o_custkey"], got["o_orderkey"], got["rank"])) == expect


def _sessions_oracle(users, ts, gap):
    expect = set()
    for uid in np.unique(users):
        t = np.sort(ts[users == uid])
        new = np.r_[True, (t[1:] - t[:-1]) > gap]
        st = np.flatnonzero(new)
        en = np.append(st[1:], len(t)) - 1
        for sid, (a, b) in enumerate(zip(st, en), start=1):
            expect.add((int(uid), sid, int(b - a + 1), int(t[a]), int(t[b])))
    return expect


def test_skewed_hot_keys(ray_session, tmp_path):
    """One key owning 50% of all rows: boundary healing must stay exact
    (the hot key spans many sorted blocks) with only block-local sufficient
    statistics crossing the exchange — no driver materialization."""
    from paddleocr_json_ray.ops import windows

    rng = np.random.default_rng(55)
    n = 40_000
    hot = rng.random(n) < 0.5
    custs = np.where(hot, 7, rng.integers(100, 400, size=n)).astype(np.int64)
    base = 1_600_000_000_000_000
    ts = base + rng.integers(0, 10**11, size=n)

    pq.write_table(pa.table({
        "o_custkey": pa.array(custs),
        "o_orderkey": pa.array(np.arange(n), type=pa.int64()),
        "o_totalprice": pa.array(np.round(rng.uniform(1, 9999, size=n), 2)),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(custs),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
    }), os.path.join(str(tmp_path), "events.parquet"))

    got = joins.top_orders_per_cust(str(tmp_path), k=3).to_pandas()
    tab = pq.read_table(os.path.join(str(tmp_path), "orders.parquet"))
    c = tab.column("o_custkey").to_numpy()
    o = tab.column("o_orderkey").to_numpy()
    p = tab.column("o_totalprice").to_numpy()
    expect = set()
    for cust in np.unique(c):
        rows = np.flatnonzero(c == cust)
        order = rows[np.lexsort((o[rows], -p[rows]))][:3]
        expect.update((int(cust), int(o[i]), r + 1) for r, i in enumerate(order))
    assert set(zip(got["o_custkey"], got["o_orderkey"], got["rank"])) == expect

    gap = windows.SESSION_GAP_US
    sess = windows.user_sessions(str(tmp_path), gap_us=gap).to_pandas()
    got_s = set(zip(sess["user_id"], sess["session_id"], sess["n_events"],
                    sess["session_start_us"], sess["session_end_us"]))
    assert got_s == _sessions_oracle(custs, ts, gap)


def test_running_total_hot_user(ray_session, tmp_path):
    """Cumulative window under 50% hot-key skew: block-boundary offset
    chains must compose exactly across many blocks."""
    from paddleocr_json_ray.ops import windows

    rng = np.random.default_rng(77)
    n = 30_000
    hot = rng.random(n) < 0.5
    users = np.where(hot, 3, rng.integers(100, 200, size=n)).astype(np.int64)
    base = 1_600_000_000_000_000
    ts = base + rng.integers(0, 10**10, size=n)
    vals = np.round(rng.uniform(-5, 50, size=n), 4)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "value": pa.array(vals),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = windows.events_running_total(str(tmp_path)).to_pandas() \
        .set_index("event_id")["running_cents"]
    cents = np.where(vals >= 0, np.floor(vals * 100 + 0.5),
                     -np.floor(-vals * 100 + 0.5)).astype(np.int64)
    roll = windows.events_rolling_sum(str(tmp_path)).to_pandas() \
        .set_index("event_id")["rolling_cents"]
    assert len(roll) == n and not roll.index.duplicated().any()
    for uid in (3, 150):
        rows = np.flatnonzero(users == uid)
        order = rows[np.lexsort((rows, ts[rows]))]
        expect = np.cumsum(cents[order])
        np.testing.assert_array_equal(
            got.loc[[int(i) for i in order]].to_numpy(), expect)
        exp_roll = np.array([cents[order][max(0, i - 2):i + 1].sum()
                             for i in range(len(order))])
        np.testing.assert_array_equal(
            roll.loc[[int(i) for i in order]].to_numpy(), exp_roll)


def test_user_funnel_order_sensitivity(ray_session, tmp_path):
    """The funnel is ORDERED: events present but out of sequence (purchase
    before the first post-signup click, click before signup) don't count;
    ties on the boundary timestamp are strict."""
    rows = [
        # user 1: full ordered funnel -> 3
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: purchase BEFORE its click -> stage 2
        (2, 10, "signup"), (2, 30, "click"), (2, 20, "purchase"),
        # user 3: click before signup only -> stage 1
        (3, 20, "signup"), (3, 10, "click"),
        # user 4: no signup at all -> 0
        (4, 10, "click"), (4, 20, "purchase"),
        # user 5: click tied with signup ts (strict >) -> stage 1
        (5, 10, "signup"), (5, 10, "click"),
        # user 6: second click after purchase-eligible time -> 3
        (6, 10, "signup"), (6, 11, "click"), (6, 12, "purchase"), (6, 13, "click"),
    ]
    tab = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([10**15 + r[1] * 10**6 for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = (joins.user_funnel(str(tmp_path)).to_pandas()
           .set_index("user_id")["funnel_stage"])
    assert got.to_dict() == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1, 6: 3}


def _c2p_expect(tab, horizon_us=3_600_000_000):
    from collections import defaultdict

    clicks, purchases = defaultdict(list), defaultdict(list)
    for u, t, e in zip(tab.column("user_id").to_pylist(),
                       tab.column("ts").cast(pa.int64()).to_pylist(),
                       tab.column("event_type").to_pylist()):
        (clicks if e == "click" else purchases if e == "purchase" else
         defaultdict(list))[u].append(t)
    out = {}
    for u, cs in clicks.items():
        n = sum(1 for c in cs for p in purchases.get(u, [])
                if c < p <= c + horizon_us)
        if n:
            out[u] = n
    return out


def test_click_to_purchase(ray_session, tmp_path):
    from paddleocr_json_ray.ops import joins

    rng = np.random.default_rng(23)
    n = 6000
    base = 1_600_000_000_000_000
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 40, size=n), type=pa.int64()),
        # dense timeline (~2 days) so 1h windows hold many candidates and
        # regularly straddle the bucket boundary
        "ts": pa.array((base + rng.integers(0, 2 * 86_400_000_000, size=n))
                       .tolist(), type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(
            ["click", "purchase", "view"], size=n, p=[0.4, 0.4, 0.2])),
        "value": pa.array(np.zeros(n)),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = (joins.click_to_purchase(str(tmp_path)).to_pandas()
           .set_index("user_id")["n_pairs"].to_dict())
    assert got == _c2p_expect(tab)


def test_click_to_purchase_hot_user(ray_session, tmp_path):
    """Half of all events belong to one user inside a few hours — its
    (user, bucket) runs straddle every sorted block, forcing the grouped
    heal to do the counting."""
    from paddleocr_json_ray.ops import joins

    rng = np.random.default_rng(7)
    n = 5000
    base = 1_600_000_000_000_000
    hot = rng.uniform(size=n) < 0.5
    users = np.where(hot, 3, rng.integers(50, 80, size=n))
    ts = np.where(hot,
                  base + rng.integers(0, 4 * 3_600_000_000, size=n),
                  base + rng.integers(0, 86_400_000_000, size=n))
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["click", "purchase"], size=n)),
        "value": pa.array(np.zeros(n)),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = (joins.click_to_purchase(str(tmp_path)).to_pandas()
           .set_index("user_id")["n_pairs"].to_dict())
    assert got == _c2p_expect(tab)


def test_forward_asof_matches_bruteforce(ray_session, events_dir):
    d, tab = events_dir
    got = (joins.events_next_signup(d).to_pandas()
           .set_index("event_id")["next_signup_us"])
    df = tab.to_pandas()
    tus = df["ts"].astype("int64").to_numpy()
    uid = df["user_id"].to_numpy()
    sign = df["event_type"].to_numpy() == "signup"
    for eid in range(0, len(df), 131):
        m = (uid == uid[eid]) & sign & (tus >= tus[eid])
        expect = tus[m].min() if m.any() else None
        v = got.loc[eid]
        assert (v == expect) if expect is not None else np.isnan(v)


def test_forward_asof_no_later_signup_is_null(ray_session, tmp_path):
    base = 1_600_000_000_000_000
    tab = pa.table({
        "event_id": pa.array([0, 1, 2], type=pa.int64()),
        "user_id": pa.array([7, 7, 8], type=pa.int64()),
        "ts": pa.array([base, base + 50, base + 10],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["signup", "view", "view"]),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = (joins.events_next_signup(str(tmp_path)).to_pandas()
           .set_index("event_id")["next_signup_us"])
    assert got.loc[0] == base          # its own signup (at-or-after)
    assert np.isnan(got.loc[1])        # no signup after base+50
    assert np.isnan(got.loc[2])        # user 8 never signs up


def test_bloom_semi_join_exact(ray_session, tmp_path):
    """Bloom-pushdown semi join equals the brute-force filter: qualifying
    rows all survive (no false negatives) and the verify stage removes any
    bloom false positive before aggregation."""
    from paddleocr_json_ray.ops import relational

    rng = np.random.default_rng(67)
    n_orders, n_items = 2000, 12000
    totals = rng.uniform(0, 600_000, size=n_orders)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_orders), type=pa.int64()),
        "o_totalprice": pa.array(totals),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    okeys = rng.integers(0, n_orders, size=n_items)
    flags = np.asarray(["A", "N", "R"])[rng.integers(0, 3, size=n_items)]
    prices = np.round(rng.uniform(10, 1000, size=n_items), 2)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(okeys, type=pa.int64()),
        "l_returnflag": pa.array(flags),
        "l_extendedprice": pa.array(prices),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))

    got = (relational.big_order_lineitems_bloom(str(tmp_path))
           .to_pandas().set_index("l_returnflag").sort_index())
    qual = totals[okeys] > 400_000.0
    assert qual.any() and not qual.all()
    for f in np.unique(flags[qual]):
        m = qual & (flags == f)
        assert got.loc[f, "n_items"] == int(m.sum())
        assert got.loc[f, "revenue"] == pytest.approx(prices[m].sum(), abs=0.02)
    assert len(got) == len(np.unique(flags[qual]))


def test_hour_window_sum_bruteforce_hot_user(ray_session, tmp_path):
    """Time-RANGE window under 50% hot-key skew with frames dense enough to
    straddle blocks; exact vs a brute-force O(n^2)-per-user oracle."""
    from paddleocr_json_ray.ops import windows

    rng = np.random.default_rng(73)
    n = 20_000
    hot = rng.random(n) < 0.5
    users = np.where(hot, 5, rng.integers(100, 140, size=n)).astype(np.int64)
    base = 1_600_000_000_000_000
    # ~2.3 days of events: windows hold many rows and cross block edges
    ts = np.sort(base + rng.choice(2 * 10**11, size=n, replace=False))
    vals = np.round(rng.uniform(-5, 20, size=n), 2)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "value": pa.array(vals),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = (windows.events_hour_window_sum(str(tmp_path)).to_pandas()
           .set_index("event_id")["window_cents"])
    cents = np.where(vals >= 0, np.floor(vals * 100 + 0.5),
                     -np.floor(-vals * 100 + 0.5)).astype(np.int64)
    W = 3_600_000_000
    assert len(got) == n
    for eid in range(0, n, 517):
        m = (users == users[eid]) & (ts >= ts[eid] - W) & (ts <= ts[eid])
        assert got.loc[eid] == cents[m].sum()


def test_hour_window_sum_in_block_peers(ray_session, tmp_path):
    """RANGE frames include same-ts peers regardless of event_id order: a
    burst of equal timestamps must all report the full burst sum."""
    from paddleocr_json_ray.ops import windows

    base = 1_600_000_000_000_000
    ts = [base, base, base, base + 10, base + 7_200_000_000]
    vals = [1.0, 2.0, 4.0, 8.0, 16.0]
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), type=pa.int64()),
        "user_id": pa.array([1] * 5, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "value": pa.array(vals),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = (windows.events_hour_window_sum(str(tmp_path)).to_pandas()
           .set_index("event_id")["window_cents"])
    assert got.loc[0] == got.loc[1] == got.loc[2] == 700  # full peer burst
    assert got.loc[3] == 1500
    assert got.loc[4] == 1600  # 2h later: own row only


def test_funnel_and_cohort_tier_equality_hot_key(ray_session, tmp_path):
    """user_funnel / cohort_retention join tier (broadcast_max_users=0 —
    the beyond-object-store path that never materializes a per-user table
    on the driver) must equal the broadcast tier, on a corpus where one
    user owns 50% of the events (hot-key skew)."""
    from paddleocr_json_ray.ops import joins, windows

    rng = np.random.default_rng(77)
    n = 4000
    hot = rng.random(n) < 0.5
    users = np.where(hot, 7, rng.integers(100, 160, size=n)).astype(np.int64)
    base = 1_600_000_000_000_000
    ts = base + rng.integers(0, 20 * 86_400_000_000, size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(
            ["signup", "click", "purchase", "view"], size=n)),
        "value": pa.array(rng.uniform(0, 10, size=n)),
    }), os.path.join(str(tmp_path), "events.parquet"))

    import pandas as pd

    fa = (joins.user_funnel(str(tmp_path)).to_pandas()
          .sort_values("user_id", ignore_index=True))
    fb = (joins.user_funnel(str(tmp_path), broadcast_max_users=0).to_pandas()
          .sort_values("user_id", ignore_index=True))
    pd.testing.assert_frame_equal(fa, fb)
    assert int(fa.loc[fa.user_id == 7, "funnel_stage"].iloc[0]) == 3

    cols = ["cohort_day_us", "day_offset"]
    ca = (windows.cohort_retention(str(tmp_path)).to_pandas()
          .sort_values(cols, ignore_index=True))
    cb = (windows.cohort_retention(str(tmp_path), broadcast_max_users=0)
          .to_pandas().sort_values(cols, ignore_index=True))
    pd.testing.assert_frame_equal(ca, cb)
    assert len(ca) > 0
