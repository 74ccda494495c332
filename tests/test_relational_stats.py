"""Pivot / moment-statistics / set-intersection / global-rank operators vs
brute-force numpy oracles, exercising cross-block tie healing explicitly."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.ops import relational, windows


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(17)
    n = 5000
    base = 1_600_000_000_000_000
    # QUANTIZED values: ties are guaranteed to span block boundaries after
    # the value sort, exercising the cume_dist tie heal
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 60, size=n), type=pa.int64()),
        "ts": pa.array((base + rng.integers(0, 10**12, size=n)).tolist(),
                       type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], size=n)),
        "value": pa.array(np.round(rng.uniform(-5, 20, size=n), 0)),
    })
    d = tmp_path_factory.mktemp("evs")
    pq.write_table(tab, os.path.join(str(d), "events.parquet"))
    return str(d), tab


def test_cume_dist_with_heavy_ties(ray_session, events_dir):
    d, tab = events_dir
    got = (windows.events_cume_dist(d).to_pandas()
           .set_index("event_id")["cume_dist"])
    v = tab.column("value").to_numpy()
    sv = np.sort(v)
    expect = np.searchsorted(sv, v, side="right") / len(v)
    assert len(got) == len(v)
    for eid in range(0, len(v), 173):
        assert got.loc[eid] == expect[eid]  # exact: int count / int N


def test_cume_dist_single_value(ray_session, tmp_path):
    """All rows tied on one value -> every cume_dist is exactly 1.0 even
    though every block's min == max (the all-tied-block stat-order case)."""
    n = 800
    tab = pa.table({"event_id": pa.array(range(n), type=pa.int64()),
                    "value": pa.array(np.full(n, 3.5))})
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = windows.events_cume_dist(str(tmp_path)).to_pandas()
    assert len(got) == n
    assert (got["cume_dist"] == 1.0).all()


def test_rank_with_heavy_ties(ray_session, events_dir):
    """Global RANK over the quantized value domain: 1 + strict-less count,
    with ties guaranteed to straddle blocks (the eq_before heal)."""
    d, tab = events_dir
    got = (windows.events_rank(d).to_pandas().set_index("event_id")["rnk"])
    v = tab.column("value").to_numpy()
    sv = np.sort(v)
    expect = np.searchsorted(sv, v, side="left") + 1
    assert len(got) == len(v)
    for eid in range(0, len(v), 173):
        assert got.loc[eid] == expect[eid]


def test_rank_single_value(ray_session, tmp_path):
    n = 800
    pq.write_table(pa.table({"event_id": pa.array(range(n), type=pa.int64()),
                             "value": pa.array(np.full(n, 3.5))}),
                   os.path.join(str(tmp_path), "events.parquet"))
    got = windows.events_rank(str(tmp_path)).to_pandas()
    assert len(got) == n and (got["rnk"] == 1).all()


def test_ntile_uneven_division(ray_session, events_dir):
    """NTILE over a strict order: bucket sizes differ by at most one, the
    larger buckets come first, and the assignment matches the brute-force
    position formula exactly (5000 rows / 16 tiles -> 8 tiles of 313)."""
    d, tab = events_dir
    got = (windows.events_ntile(d, n_buckets=16).to_pandas()
           .set_index("event_id")["tile"])
    v = tab.column("value").to_numpy()
    e = np.arange(len(v))
    pos = np.empty(len(v), dtype=np.int64)
    pos[np.lexsort((e, v))] = np.arange(len(v))
    n, nb = len(v), 16
    q, rem = divmod(n, nb)
    cut = rem * (q + 1)
    expect = np.where(pos < cut, pos // (q + 1), rem + (pos - cut) // q) + 1
    np.testing.assert_array_equal(got.loc[e].to_numpy(), expect)
    sizes = np.bincount(expect)[1:]
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(sizes) <= 0).all()  # larger buckets first


def test_user_first_event_hot_user(ray_session, tmp_path):
    """FIRST_VALUE per key under 50% hot-key skew: one candidate row per
    block crosses the heal, and the winning row carries its full payload."""
    rng = np.random.default_rng(59)
    n = 30_000
    hot = rng.random(n) < 0.5
    users = np.where(hot, 3, rng.integers(100, 200, size=n)).astype(np.int64)
    base = 1_600_000_000_000_000
    ts = base + rng.integers(0, 10**10, size=n)
    types = np.asarray(["click", "view", "purchase"])[rng.integers(0, 3, size=n)]
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "event_type": pa.array(types),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = (windows.user_first_event(str(tmp_path)).to_pandas()
           .set_index("user_id"))
    assert len(got) == len(np.unique(users))
    for uid in (3, 150, 199):
        rows = np.flatnonzero(users == uid)
        win = rows[np.lexsort((rows, ts[rows]))][0]
        r = got.loc[uid]
        assert (r["first_event_id"], r["first_ts_us"], r["first_type"]) == \
            (win, ts[win], types[win])


def test_dense_rank_heavy_ties(ray_session, tmp_path):
    """Grouped DENSE_RANK over a quantized value domain: with only ~12
    distinct prices per priority, value runs are guaranteed to straddle
    blocks, exercising the boundary-equality adjustment in the run scan."""
    rng = np.random.default_rng(23)
    n = 20_000
    prios = np.asarray(["1-URGENT", "2-HIGH", "3-MEDIUM"])[
        rng.integers(0, 3, size=n)]
    prices = np.round(rng.uniform(0, 12, size=n), 0) * 1000.0
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n), type=pa.int64()),
        "o_orderpriority": pa.array(prios),
        "o_totalprice": pa.array(prices),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    got = (windows.orders_dense_rank(str(tmp_path)).to_pandas()
           .set_index("o_orderkey"))
    assert len(got) == n and not got.index.duplicated().any()
    for p in np.unique(prios):
        vals = prices[prios == p]
        distinct_desc = np.sort(np.unique(vals))[::-1]
        sub = got[got["o_orderpriority"] == p]
        keys = np.asarray(sub.index)
        expect = 1 + np.searchsorted(-distinct_desc, -prices[keys])
        np.testing.assert_array_equal(sub["rnk"].to_numpy(), expect)


def test_dense_rank_single_value(ray_session, tmp_path):
    """All rows tied on one value within each priority -> every rank is 1
    (the all-tied-run permutation case the stat order cannot distinguish)."""
    n = 900
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n), type=pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT" if i % 2 else "2-HIGH"
                                     for i in range(n)]),
        "o_totalprice": pa.array(np.full(n, 777.0)),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    got = windows.orders_dense_rank(str(tmp_path)).to_pandas()
    assert len(got) == n and (got["rnk"] == 1).all()


def test_value_stats_match_numpy(ray_session, events_dir):
    d, tab = events_dir
    got = relational.value_stats_by_type(d).to_pandas().set_index("event_type")
    et = np.asarray(tab.column("event_type").to_pylist())
    v = tab.column("value").to_numpy()
    for t in np.unique(et):
        x = v[et == t]
        row = got.loc[t]
        assert row["n_events"] == len(x)
        assert row["avg_value"] == pytest.approx(np.mean(x), abs=0.005)
        assert row["std_value"] == pytest.approx(np.std(x, ddof=1), abs=0.005)
        assert row["min_value"] == x.min() and row["max_value"] == x.max()


def test_corr_matches_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(31)
    n = 4000
    q = rng.integers(1, 51, size=n).astype(np.float64)
    p = q * 900 + rng.normal(0, 5000, size=n)  # strong positive correlation
    tab = pa.table({"l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n)),
                    "l_quantity": pa.array(q), "l_extendedprice": pa.array(p)})
    pq.write_table(tab, os.path.join(str(tmp_path), "lineitem.parquet"))
    got = relational.qty_price_corr(str(tmp_path)).to_pandas().set_index("l_returnflag")
    flags = np.asarray(tab.column("l_returnflag").to_pylist())
    for f in ("A", "N", "R"):
        m = flags == f
        expect = np.corrcoef(q[m], p[m])[0, 1]
        assert got.loc[f, "corr_qty_price"] == pytest.approx(expect, abs=0.0015)


def test_pivot_counts_and_total(ray_session, events_dir):
    d, tab = events_dir
    got = relational.events_pivot(d).to_pandas().set_index("user_id")
    type_cols = [c for c in got.columns if c != "n_events"]
    assert (got[type_cols].sum(axis=1) == got["n_events"]).all()
    et = np.asarray(tab.column("event_type").to_pylist())
    users = tab.column("user_id").to_numpy()
    for u in (0, 17, 59):
        m = users == u
        assert got.loc[u, "n_events"] == m.sum()
        assert got.loc[u, "n_click"] == ((et == "click") & m).sum()
        assert got.loc[u, "n_purchase"] == ((et == "purchase") & m).sum()


def test_intersection_matches_sets(ray_session, events_dir):
    d, tab = events_dir
    got = set(relational.users_click_and_purchase(d).to_pandas()["user_id"])
    et = np.asarray(tab.column("event_type").to_pylist())
    users = tab.column("user_id").to_numpy()
    expect = set(users[et == "click"]) & set(users[et == "purchase"])
    assert got == expect


# ---------------------------------------------------------------- round-3e ops

def _mode_expect(tab):
    from collections import Counter

    per_user = {}
    for u, t in zip(tab.column("user_id").to_pylist(),
                    tab.column("event_type").to_pylist()):
        per_user.setdefault(u, Counter())[t] += 1
    return {u: min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            for u, c in per_user.items()}


def test_top_event_type_per_user(ray_session, events_dir):
    d, tab = events_dir
    got = windows.top_event_type_per_user(d).to_pandas().set_index("user_id")
    expect = _mode_expect(tab)
    assert len(got) == len(expect)
    for u, (typ, n) in expect.items():
        assert got.loc[u, "top_type"] == typ
        assert got.loc[u, "n"] == n


def test_top_event_type_hot_key(ray_session, tmp_path):
    """One user owns 50% of all rows (its run spans every sorted block):
    the boundary heal must still pick the (count desc, type asc) winner."""
    rng = np.random.default_rng(5)
    n = 4000
    users = np.where(rng.uniform(size=n) < 0.5, 7,
                     rng.integers(100, 120, size=n))
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array([1_600_000_000_000_000 + i for i in range(n)],
                       type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b", "c"], size=n)),
        "value": pa.array(np.zeros(n)),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = (windows.top_event_type_per_user(str(tmp_path))
           .to_pandas().set_index("user_id"))
    expect = _mode_expect(tab)
    assert len(got) == len(expect)
    for u, (typ, n_) in expect.items():
        assert (got.loc[u, "top_type"], got.loc[u, "n"]) == (typ, n_)


def test_returned_revenue_by_cust(ray_session, sf0001_dir):
    import pandas as pd

    got = relational.returned_revenue_by_cust(sf0001_dir).to_pandas()
    li = pq.read_table(os.path.join(sf0001_dir, "lineitem.parquet")).to_pandas()
    orders = pq.read_table(os.path.join(sf0001_dir, "orders.parquet")).to_pandas()
    cust = pq.read_table(os.path.join(sf0001_dir, "customer.parquet")).to_pandas()
    nat = pq.read_table(os.path.join(sf0001_dir, "nation.parquet")).to_pandas()
    li = li[li.l_returnflag == "R"].copy()
    li["rev"] = li.l_extendedprice * (1 - li.l_discount)
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .groupby("o_custkey", as_index=False)["rev"].sum()
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    j["revenue"] = j["rev"].round(2)
    j = (j.sort_values(["revenue", "c_custkey"], ascending=[False, True])
          .head(20).reset_index())
    assert len(got) == 20
    assert got["c_custkey"].tolist() == j["c_custkey"].tolist()
    assert got["c_name"].tolist() == j["c_name"].tolist()
    assert got["n_name"].tolist() == j["n_name"].tolist()
    assert np.allclose(got["revenue"], j["revenue"], atol=0.011)


def test_bigram_topk(ray_session, sf0001_dir):
    import re
    from collections import Counter

    from paddleocr_json_ray.ops import text_ops

    got = text_ops.bigram_topk(sf0001_dir, k=30).to_pandas()
    tok = re.compile(r"[^ \t\n\r\f\v]+")
    c = Counter()
    docs = pq.read_table(os.path.join(sf0001_dir, "documents.parquet"),
                         columns=["text"])
    for t in docs.column("text").to_pylist():
        ws = tok.findall(t)
        c.update(zip(ws, ws[1:]))
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert [(r.w1, r.w2) for r in got.itertuples()] == [p for p, _ in expect]
    assert got["n"].tolist() == [n for _, n in expect]


def _paths_expect(tab):
    import pandas as pd

    df = tab.to_pandas().sort_values(["user_id", "ts", "event_id"])
    return df.groupby("user_id")["event_type"].agg(">".join).to_dict()


def test_user_paths(ray_session, events_dir):
    d, tab = events_dir
    got = windows.user_paths(d).to_pandas().set_index("user_id")["path"]
    expect = _paths_expect(tab)
    assert len(got) == len(expect)
    for u, p in expect.items():
        assert got.loc[u] == p


def test_user_paths_single_user(ray_session, tmp_path):
    """One user owns every row: the whole corpus is one run spanning all
    sorted blocks; the heal must stitch every block's segment in order."""
    n = 3000
    tab = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(np.full(n, 42), type=pa.int64()),
        "ts": pa.array([1_600_000_000_000_000 + 1000 * i for i in range(n)],
                       type=pa.timestamp("us")),
        "event_type": pa.array([("abc")[i % 3] for i in range(n)]),
        "value": pa.array(np.zeros(n)),
    })
    pq.write_table(tab, os.path.join(str(tmp_path), "events.parquet"))
    got = windows.user_paths(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got["path"][0] == ">".join(("abc")[i % 3] for i in range(n))


def test_rolling_active_users(ray_session, events_dir):
    d, tab = events_dir
    got = (windows.rolling_active_users(d).to_pandas()
           .set_index("day_us")["n_users"])
    DAY = 86_400_000_000
    days_of = {}
    for u, t in zip(tab.column("user_id").to_pylist(),
                    tab.column("ts").cast(pa.int64()).to_pylist()):
        days_of.setdefault(t // DAY, set()).add(u)
    assert len(got) == len(days_of)
    for d_, _ in days_of.items():
        expect = set()
        for back in range(7):
            expect |= days_of.get(d_ - back, set())
        assert got.loc[d_ * DAY] == len(expect)


def test_event_type_share(ray_session, events_dir):
    d, tab = events_dir
    got = (windows.event_type_share(d).to_pandas()
           .set_index(["user_id", "event_type"]))
    from collections import Counter

    per_user = {}
    for u, t in zip(tab.column("user_id").to_pylist(),
                    tab.column("event_type").to_pylist()):
        per_user.setdefault(u, Counter())[t] += 1
    n_rows = sum(len(c) for c in per_user.values())
    assert len(got) == n_rows
    for u, c in per_user.items():
        tot = sum(c.values())
        for t, n in c.items():
            assert got.loc[(u, t), "n"] == n
            assert got.loc[(u, t), "share_milli"] == n * 1000 // tot


def test_small_quantity_revenue(ray_session, sf0001_dir):
    got = relational.small_quantity_revenue(sf0001_dir).to_pandas()
    li = pq.read_table(os.path.join(sf0001_dir, "lineitem.parquet"),
                       columns=["l_partkey", "l_quantity",
                                "l_extendedprice"]).to_pandas()
    lim = 0.2 * li.groupby("l_partkey")["l_quantity"].mean()
    keep = li.l_quantity < li.l_partkey.map(lim)
    expect = round(li.loc[keep, "l_extendedprice"].sum() / 7.0, 2)
    assert len(got) == 1
    assert abs(got["avg_yearly"][0] - expect) < 0.02


def test_users_click_no_purchase(ray_session, events_dir):
    d, tab = events_dir
    res = relational.users_click_no_purchase(d, value_floor=18.0).to_pandas()
    got = set(res["user_id"]) if len(res) else set()
    et = np.asarray(tab.column("event_type").to_pylist())
    users = tab.column("user_id").to_numpy()
    vals = tab.column("value").to_numpy()
    expect = (set(users[et == "click"])
              - set(users[(et == "purchase") & (vals > 18.0)]))
    assert expect  # fixture must keep the query non-degenerate
    assert got == expect


def test_session_stats(ray_session, events_dir):
    d, tab = events_dir
    got = windows.session_stats(d).to_pandas()
    df = tab.to_pandas().sort_values(["user_id", "ts", "event_id"])
    gap = 30 * 60 * 1_000_000
    tus = df["ts"].astype("int64").to_numpy()
    uid = df["user_id"].to_numpy()
    new = np.r_[True, (uid[1:] != uid[:-1]) | (tus[1:] - tus[:-1] > gap)]
    starts = np.flatnonzero(new)
    stops = np.append(starts[1:], len(tus))
    n_sessions = len(starts)
    n_events = int((stops - starts).sum())
    dur = int(sum(tus[e - 1] - tus[s] for s, e in zip(starts, stops)))
    assert got["n_sessions"][0] == n_sessions
    assert got["avg_events_milli"][0] == n_events * 1000 // n_sessions
    assert got["avg_duration_us"][0] == dur // n_sessions


def test_value_skew_matches_numpy(ray_session, events_dir):
    d, tab = events_dir
    got = relational.value_skew_by_type(d).to_pandas().set_index("event_type")
    et = np.asarray(tab.column("event_type").to_pylist())
    v = tab.column("value").to_numpy()
    for t in np.unique(et):
        x = v[et == t]
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        skew = (m3 / m2 ** 1.5) * np.sqrt(n * (n - 1)) / (n - 2)
        g2 = m4 / m2 ** 2 - 3.0
        kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
        row = got.loc[t]
        assert row["n_events"] == n
        assert row["skew_value"] == pytest.approx(skew, abs=0.002)
        assert row["kurt_value"] == pytest.approx(kurt, abs=0.002)


def test_regression_recovers_planted_line(ray_session, tmp_path):
    rng = np.random.default_rng(41)
    n = 4000
    q = rng.integers(1, 51, size=n).astype(np.float64)
    p = q * 900.0 + 123.0 + rng.normal(0, 50, size=n)
    tab = pa.table({"l_returnflag": pa.array(rng.choice(["A", "N"], size=n)),
                    "l_quantity": pa.array(q), "l_extendedprice": pa.array(p)})
    pq.write_table(tab, os.path.join(str(tmp_path), "lineitem.parquet"))
    got = (relational.price_on_qty_regression(str(tmp_path))
           .to_pandas().set_index("l_returnflag"))
    flags = np.asarray(tab.column("l_returnflag").to_pylist())
    for f in ("A", "N"):
        m = flags == f
        slope, intercept = np.polyfit(q[m], p[m], 1)
        assert got.loc[f, "slope"] == pytest.approx(slope, abs=0.002)
        assert got.loc[f, "intercept"] == pytest.approx(intercept, abs=0.02)
        assert 0.99 < got.loc[f, "r2"] <= 1.0


def test_percent_rank_with_heavy_ties(ray_session, events_dir):
    # quantized values: every distinct value is a big tie group spanning
    # block boundaries after the sort — the adversarial case for the
    # O(blocks) tie heal the rank plan relies on
    d, tab = events_dir
    got = (windows.events_percent_rank(d).to_pandas()
           .sort_values("event_id", ignore_index=True))
    v = tab.column("value").to_numpy()
    sv = np.sort(v)
    rnk = np.searchsorted(sv, v, side="left") + 1
    expect = (rnk - 1) * 1000 // (len(v) - 1)  # fixture event_id == row index
    assert np.array_equal(got["pr_permille"].to_numpy(), expect)


def test_top_value_event_per_user_ties(ray_session, events_dir):
    # fixture values are 0dp-quantized, so per-user maxima tie often: the
    # event_id tie-break must pick the smallest id deterministically
    d, tab = events_dir
    got = (windows.top_value_event_per_user(d).to_pandas()
           .sort_values("user_id", ignore_index=True))
    df = tab.to_pandas()
    win = (df.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True])
             .groupby("user_id", as_index=False).first())
    assert np.array_equal(got["user_id"].to_numpy(), win["user_id"].to_numpy())
    assert np.array_equal(got["top_event_id"].to_numpy(),
                          win["event_id"].to_numpy())
    assert np.array_equal(got["top_value"].to_numpy(), win["value"].to_numpy())


def test_hourly_ohlc_matches_pandas(ray_session, events_dir):
    d, tab = events_dir
    got = (windows.hourly_ohlc(d).to_pandas()
           .sort_values("hour_us", ignore_index=True))
    df = tab.to_pandas()
    df["tus"] = df["ts"].astype("int64")
    df["hb"] = df["tus"] // 3_600_000_000
    df = df.sort_values(["hb", "tus", "event_id"])
    g = df.groupby("hb")
    assert len(got) == g.ngroups
    exp_open = g["value"].first().to_numpy()
    exp_close = g["value"].last().to_numpy()
    assert np.array_equal(got["hour_us"].to_numpy(),
                          (np.asarray(sorted(g.groups)) * 3_600_000_000))
    assert np.array_equal(got["open_value"].to_numpy(), exp_open)
    assert np.array_equal(got["close_value"].to_numpy(), exp_close)
    assert np.array_equal(got["high_value"].to_numpy(), g["value"].max().to_numpy())
    assert np.array_equal(got["low_value"].to_numpy(), g["value"].min().to_numpy())
    assert np.array_equal(got["n_events"].to_numpy(), g.size().to_numpy())


def test_hourly_ohlc_ts_ties(ray_session, tmp_path):
    """All rows share ONE timestamp: open/close must fall back to the
    event_id tie-break (smallest id opens, largest id closes)."""
    base = 1_600_000_000_000_000
    n = 500
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array([base] * n, type=pa.timestamp("us")),
        "value": pa.array(np.arange(n, dtype=np.float64) * 3.0),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = windows.hourly_ohlc(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["open_value"] == 0.0 and row["close_value"] == (n - 1) * 3.0
    assert row["low_value"] == 0.0 and row["high_value"] == (n - 1) * 3.0
    assert row["n_events"] == n


def test_local_supplier_revenue_q5(ray_session, sf0001_dir):
    got = relational.local_supplier_revenue(sf0001_dir).to_pandas()
    li = pq.read_table(os.path.join(sf0001_dir, "lineitem.parquet")).to_pandas()
    orders = pq.read_table(os.path.join(sf0001_dir, "orders.parquet")).to_pandas()
    cust = pq.read_table(os.path.join(sf0001_dir, "customer.parquet")).to_pandas()
    supp = pq.read_table(os.path.join(sf0001_dir, "supplier.parquet")).to_pandas()
    nat = pq.read_table(os.path.join(sf0001_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf0001_dir, "region.parquet")).to_pandas()
    orders = orders[(orders.o_orderdate >= "1996-01-01")
                    & (orders.o_orderdate < "1997-01-01")]
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j.c_nationkey == j.s_nationkey]
    j = (j.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
          .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
    j = j[j.r_name == "ASIA"].copy()
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    expect = (j.groupby("n_name")["rev"].sum().round(2)
               .sort_values(ascending=False))
    assert got["n_name"].tolist() == expect.index.tolist()
    assert np.allclose(got["revenue"], expect.to_numpy(), atol=0.011)


def test_props_k_stats_extraction(ray_session, tmp_path):
    """Vectorized JSON-field extraction: sums/avgs match the parsed field,
    multi-digit and single-digit values included."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops.relational import props_k_stats

    rng = np.random.default_rng(13)
    n = 3000
    types = rng.choice(["click", "view"], size=n)
    ks = rng.integers(0, 5000, size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(np.zeros(n)),
        "props": pa.array([json.dumps({"k": int(k)}) for k in ks])}),
        os.path.join(str(tmp_path), "events.parquet"))
    got = props_k_stats(str(tmp_path)).to_pandas().set_index("event_type")
    for t in ("click", "view"):
        x = ks[types == t]
        assert got.loc[t, "n"] == len(x)
        assert got.loc[t, "sum_k"] == x.sum()
        assert got.loc[t, "avg_k"] == round(x.sum() / len(x) + 1e-12, 2)


def test_sole_return_suppliers_brute(ray_session, tmp_path):
    """Q21 shape vs a brute-force pandas oracle on adversarial data:
    duplicate (order, supplier) rows with CONFLICTING flags (R + N for the
    same pair must count once, as R), single-supplier orders (excluded by
    n_supp > 1), and multi-R orders (excluded by n_r == 1)."""
    rng = np.random.default_rng(29)
    n = 4000
    ok = rng.integers(0, 300, size=n)
    sk = rng.integers(0, 12, size=n)
    flags = rng.choice(["R", "N", "A"], size=n, p=[0.3, 0.4, 0.3])
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, type=pa.int64()),
        "l_suppkey": pa.array(sk, type=pa.int64()),
        "l_returnflag": pa.array(flags.tolist(), type=pa.string()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    names = [f"S{i:03d}" for i in range(12)]
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(12), type=pa.int64()),
        "s_name": pa.array(names, type=pa.string()),
    }), os.path.join(str(tmp_path), "supplier.parquet"))

    import pandas as pd

    df = pd.DataFrame({"o": ok, "s": sk, "r": flags == "R"})
    pairs = df.groupby(["o", "s"])["r"].max().reset_index()
    g = pairs.groupby("o").agg(n_supp=("s", "count"), n_r=("r", "sum"),
                               culprit=("r", lambda x: -1))
    sole = pairs[pairs["r"]].merge(
        g[(g["n_supp"] > 1) & (g["n_r"] == 1)], on="o")
    expect = (sole.groupby("s").size().rename("numwait").reset_index()
                  .assign(s_name=lambda t: [names[i] for i in t["s"]])
                  .sort_values(["numwait", "s_name"],
                               ascending=[False, True])[["s_name", "numwait"]]
                  .head(20).reset_index(drop=True))
    got = relational.sole_return_suppliers(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        expect.astype({"numwait": "int64"}), check_dtype=True)


def test_cheapest_supplier_per_part_ties(ray_session, tmp_path):
    """Argmin-per-group: two suppliers tied on the minimum price must
    resolve to the LOWEST suppkey (the packed-key order carries the
    tie-break through the Min exchange)."""
    rng = np.random.default_rng(37)
    n = 2500
    pk = rng.integers(0, 80, size=n)
    sk = rng.integers(0, 15, size=n)
    # coarse price grid -> many exact ties within a part
    price = rng.integers(1, 6, size=n) * 10.0 + 0.25
    pq.write_table(pa.table({
        "l_partkey": pa.array(pk, type=pa.int64()),
        "l_suppkey": pa.array(sk, type=pa.int64()),
        "l_extendedprice": pa.array(price, type=pa.float64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(80), type=pa.int64()),
        "p_brand": pa.array([f"B{i % 5}" for i in range(80)], type=pa.string()),
    }), os.path.join(str(tmp_path), "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(15), type=pa.int64()),
        "s_name": pa.array([f"S{i:02d}" for i in range(15)], type=pa.string()),
    }), os.path.join(str(tmp_path), "supplier.parquet"))

    got = relational.cheapest_supplier_per_part(str(tmp_path)).to_pandas()
    import pandas as pd

    df = pd.DataFrame({"p": pk, "s": sk, "v": price})
    win = (df.sort_values(["p", "v", "s"]).groupby("p").first())
    assert got["p_partkey"].tolist() == sorted(win.index.tolist())
    for _, row in got.iterrows():
        w = win.loc[row["p_partkey"]]
        assert row["s_name"] == f"S{int(w['s']):02d}"
        assert row["min_price"] == w["v"]


def test_profile_events_with_nulls(ray_session, tmp_path):
    """The generated tables carry no nulls, so pin the null-count paths on
    a synthetic events table with value/props nulls and negative values."""
    n = 400
    rng = np.random.default_rng(41)
    base = 1_600_000_000_000_000
    vals = rng.uniform(-5, 20, size=n).round(2)
    vals_arr = pa.array([None if i % 7 == 0 else float(v)
                         for i, v in enumerate(vals)], type=pa.float64())
    props = pa.array([None if i % 11 == 0 else "{}" for i in range(n)],
                     type=pa.string())
    pq.write_table(pa.table({
        "ts": pa.array((base + rng.integers(0, 10**10, size=n)).tolist(),
                       type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b"], size=n).tolist()),
        "value": vals_arr,
        "props": props,
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = relational.profile_events(str(tmp_path)).to_pandas().iloc[0]
    keep = [i for i in range(n) if i % 7 != 0]
    cents = np.array([round(vals[i] * 100) if vals[i] >= 0
                      else -round(-vals[i] * 100) for i in keep], dtype=np.int64)
    assert got["n_rows"] == n
    assert got["null_value"] == len(range(0, n, 7))
    assert got["null_props"] == len(range(0, n, 11))
    assert got["n_event_types"] == 2
    assert got["n_negative"] == int((cents < 0).sum())
    assert got["sum_value_cents"] == int(cents.sum())


def test_fk_integrity_audit_with_planted_orphans(ray_session, tmp_path):
    """The generated schema is referentially clean, so plant orphans: 7
    lineitems with unknown orderkeys, 3 with unknown partkeys, and 2 orders
    with unknown custkeys must be counted exactly."""
    rng = np.random.default_rng(43)
    n = 500
    ok = rng.integers(0, 50, size=n)
    ok[:7] = 999_000 + np.arange(7)  # orphan orderkeys
    pk = rng.integers(0, 30, size=n)
    pk[10:13] = 888_000 + np.arange(3)  # orphan partkeys
    sk = rng.integers(0, 10, size=n)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, type=pa.int64()),
        "l_partkey": pa.array(pk, type=pa.int64()),
        "l_suppkey": pa.array(sk, type=pa.int64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    ck = rng.integers(0, 20, size=60)
    ck[:2] = 777_000 + np.arange(2)  # orphan custkeys
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(50), type=pa.int64()),
        "o_custkey": pa.array(ck[:50] * 0 + ck[:50], type=pa.int64()),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    pq.write_table(pa.table({"p_partkey": pa.array(range(30), type=pa.int64())}),
                   os.path.join(str(tmp_path), "part.parquet"))
    pq.write_table(pa.table({"s_suppkey": pa.array(range(10), type=pa.int64())}),
                   os.path.join(str(tmp_path), "supplier.parquet"))
    pq.write_table(pa.table({"c_custkey": pa.array(range(20), type=pa.int64())}),
                   os.path.join(str(tmp_path), "customer.parquet"))
    got = relational.fk_integrity_audit(str(tmp_path)).to_pandas().iloc[0]
    assert got["orphan_orderkeys"] == 7
    assert got["orphan_partkeys"] == 3
    assert got["orphan_suppkeys"] == 0
    assert got["orphan_custkeys"] == 2


def test_max_event_gap_seam_and_ties(ray_session, tmp_path):
    """The largest gap planted BETWEEN two dense clusters must be found even
    though it necessarily spans a sorted-block seam at some block count;
    duplicate timestamps (gap 0) must not break the scan."""
    base = 1_700_000_000_000_000
    ts = np.r_[base + np.repeat(np.arange(500), 2) * 1000,      # dup-heavy
               base + 10**12 + np.arange(400) * 1000]           # far cluster
    pq.write_table(pa.table({"ts": pa.array(ts.tolist(),
                                            type=pa.timestamp("us"))}),
                   os.path.join(str(tmp_path), "events.parquet"))
    got = windows.max_event_gap(str(tmp_path)).to_pandas().iloc[0]
    expect = int(np.diff(np.sort(ts)).max())
    assert got["max_gap_us"] == expect
    assert got["n_events"] == len(ts)


def test_event_disorder_audit_planted_lateness(ray_session, tmp_path):
    """Plant out-of-order arrivals (ids assign arrival order; timestamps
    jump back) and verify count + worst lateness against a brute prefix
    scan — incl. late events whose running max lives in an EARLIER block."""
    rng = np.random.default_rng(53)
    n = 3000
    base = 1_700_000_000_000_000
    ts = base + np.arange(n, dtype=np.int64) * 1_000_000
    late_idx = rng.choice(np.arange(1, n), size=150, replace=False)
    ts[late_idx] -= rng.integers(1, 10**9, size=150)  # pull 150 events back
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = windows.event_disorder_audit(str(tmp_path)).to_pandas().iloc[0]
    run = np.maximum.accumulate(ts)
    prev = np.r_[np.int64(-2**62), run[:-1]]
    late = ts < prev
    assert got["n_events"] == n
    assert got["n_late"] == int(late.sum())
    assert got["max_lateness_us"] == int((prev[late] - ts[late]).max())
