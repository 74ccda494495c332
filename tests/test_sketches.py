"""Sketch operators: HLL accuracy/mergeability, exact percentile math,
sliding-window fan-out invariants."""

import numpy as np
import pyarrow as pa
import pytest

from paddleocr_json_ray.ops import sketches


def _regs_for(vals: np.ndarray) -> np.ndarray:
    tab = pa.table({"user_id": pa.array(vals, type=pa.int64())})
    return np.frombuffer(sketches.hll_registers(tab)["registers"][0].as_py(), dtype=np.int8)


def test_hll_estimate_within_tolerance():
    """2^12 registers -> ~1.6% standard error; allow 5%."""
    rng = np.random.default_rng(5)
    for true_n in (500, 20_000):
        vals = rng.choice(10_000_000, size=true_n, replace=False)
        est = sketches.hll_estimate(_regs_for(vals))
        assert abs(est - true_n) / true_n < 0.05


def test_hll_merge_equals_single_pass():
    """Register max-merge is exact: split data any way, same sketch."""
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1 << 40, size=5000)
    whole = _regs_for(vals)
    merged = np.maximum(_regs_for(vals[:1700]),
                        np.maximum(_regs_for(vals[1700:3100]), _regs_for(vals[3100:])))
    assert np.array_equal(whole, merged)


def test_hll_duplicates_do_not_inflate():
    vals = np.tile(np.arange(300), 50)  # 15000 rows, 300 distinct
    est = sketches.hll_estimate(_regs_for(vals))
    assert abs(est - 300) / 300 < 0.05


def test_percentile_cont_interpolation(ray_session, tmp_path):
    """Engine percentiles must equal numpy's linear interpolation (the
    PERCENTILE_CONT definition) on a known multiset."""
    import os

    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    q = rng.integers(1, 51, size=4000).astype(np.float64)
    pq.write_table(pa.table({"l_quantity": pa.array(q)}),
                   os.path.join(str(tmp_path), "lineitem.parquet"))
    got = sketches.quantity_percentiles(str(tmp_path)).to_pandas().iloc[0]
    for col, p in (("p50", 50), ("p90", 90), ("p99", 99)):
        assert got[col] == pytest.approx(np.percentile(q, p, method="linear"), abs=1e-9)


def _rank_error(values: np.ndarray, estimate: float, p: float) -> float:
    """|empirical rank of the estimate - p| — the t-digest accuracy metric."""
    return abs(np.searchsorted(np.sort(values), estimate) / len(values) - p)


def test_tdigest_quantile_accuracy():
    """delta=200 digest on a heavy-tailed distribution: rank error under
    0.01 at the body and 0.005 at the tail (tails get finer centroids)."""
    rng = np.random.default_rng(11)
    v = rng.lognormal(3.0, 1.2, size=50_000)
    m, w = sketches._tdigest_compress(v, np.ones(len(v)))
    assert len(m) <= sketches._TD_DELTA // 2 + 1
    for p, tol in ((0.5, 0.01), (0.9, 0.01), (0.99, 0.005)):
        assert _rank_error(v, sketches._tdigest_quantile(m, w, p), p) < tol


def test_tdigest_merge_matches_single_pass():
    """Mergeability: compress per chunk, concatenate, re-compress — the
    merged digest's quantiles stay within the same rank-error budget as the
    single-pass digest (the property the distributed partial/merge relies on)."""
    rng = np.random.default_rng(23)
    v = rng.gamma(2.0, 40.0, size=60_000)
    parts = [sketches._tdigest_compress(c, np.ones(len(c)))
             for c in np.array_split(v, 7)]
    m, w = sketches._tdigest_compress(np.concatenate([p[0] for p in parts]),
                                      np.concatenate([p[1] for p in parts]))
    assert w.sum() == pytest.approx(len(v))
    for p in (0.5, 0.9, 0.99):
        assert _rank_error(v, sketches._tdigest_quantile(m, w, p), p) < 0.015


def test_price_quantiles_tdigest_e2e(ray_session, tmp_path):
    """End-to-end over parquet: estimates land within 1.5% relative of the
    exact continuous percentiles on a smooth price distribution."""
    import os

    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    prices = rng.lognormal(7.0, 0.8, size=30_000)
    pq.write_table(pa.table({"l_extendedprice": pa.array(prices)}),
                   os.path.join(str(tmp_path), "lineitem.parquet"))
    got = sketches.price_quantiles_tdigest(str(tmp_path)).to_pandas().iloc[0]
    for col, p in (("p50", 50), ("p90", 90), ("p99", 99)):
        exact = np.percentile(prices, p, method="linear")
        assert abs(got[col] - exact) / exact < 0.015


def test_heavy_hitters_zipf(ray_session, tmp_path):
    """Misra-Gries sketch under zipf skew with a tight capacity: the true
    top-k survives with exact ranks, and every bound interval contains the
    true count (the mergeable-summaries guarantee)."""
    import os
    from collections import Counter

    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i:05d}" for i in range(20_000)])
    draws = rng.zipf(1.3, size=120_000)
    draws = draws[draws <= len(vocab)] - 1
    texts = [" ".join(vocab[draws[i:i + 60]]) for i in range(0, len(draws) - 60, 60)]
    pq.write_table(pa.table({"text": pa.array(texts)}),
                   os.path.join(str(tmp_path), "documents.parquet"))
    truth = Counter(vocab[d] for d in draws[:len(texts) * 60])
    got = sketches.heavy_hitters(str(tmp_path), k=10, cap=512).to_pandas()
    exact = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["word"]) == [w for w, _ in exact]
    for r in got.itertuples():
        assert r.count_lo <= truth[r.word] <= r.count_hi


def test_cms_word_counts_zipf(ray_session, tmp_path):
    """Count-min under zipf skew: estimates NEVER undercount (one-sided),
    overestimates stay within the eps*N bound, and head words — whose
    counts dwarf any collision mass — come back exact with exact ranks."""
    import os
    from collections import Counter

    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i:05d}" for i in range(20_000)])
    draws = rng.zipf(1.3, size=120_000)
    draws = draws[draws <= len(vocab)] - 1
    texts = [" ".join(vocab[draws[i:i + 60]]) for i in range(0, len(draws) - 60, 60)]
    pq.write_table(pa.table({"text": pa.array(texts)}),
                   os.path.join(str(tmp_path), "documents.parquet"))
    n_total = len(texts) * 60
    truth = Counter(vocab[d] for d in draws[:n_total])
    got = sketches.cms_word_counts(str(tmp_path), k=10).to_pandas()
    assert len(got) == 10
    eps_bound = int(np.ceil(np.e / sketches._CMS_WIDTH * n_total))
    for r in got.itertuples():
        assert truth[r.word] <= r.est_count <= truth[r.word] + eps_bound
    exact_top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    head = got.sort_values("rank").head(5)
    assert list(head["word"]) == [w for w, _ in exact_top]
    assert list(head["est_count"]) == [c for _, c in exact_top]


def test_grouped_tdigest_per_flag(ray_session, tmp_path):
    """Grouped t-digest: per-key estimates within 1.5% relative of each
    key's exact percentiles, with deliberately different distributions per
    flag so cross-key contamination would be caught."""
    import os

    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    n = 30_000
    flags = np.asarray(["A", "N", "R"])[rng.integers(0, 3, size=n)]
    prices = np.where(flags == "A", rng.lognormal(7.0, 0.8, size=n),
                      np.where(flags == "N", rng.uniform(10, 100, size=n),
                               rng.exponential(500, size=n) + 1000))
    pq.write_table(pa.table({"l_returnflag": pa.array(flags),
                             "l_extendedprice": pa.array(prices)}),
                   os.path.join(str(tmp_path), "lineitem.parquet"))
    got = (sketches.price_quantiles_by_flag_tdigest(str(tmp_path))
           .to_pandas().set_index("l_returnflag"))
    assert len(got) == 3
    for f in ("A", "N", "R"):
        x = prices[flags == f]
        for col, p in (("p50", 50), ("p90", 90), ("p99", 99)):
            exact = np.percentile(x, p, method="linear")
            assert abs(got.loc[f, col] - exact) / exact < 0.015


def _write_prices(tmp_path, vals: np.ndarray) -> str:
    import os

    import pyarrow.parquet as pq

    pq.write_table(pa.table({"l_extendedprice": pa.array(vals, type=pa.float64())}),
                   os.path.join(str(tmp_path), "lineitem.parquet"))
    return str(tmp_path)


def test_exact_percentiles_continuous_domain(ray_session, tmp_path, monkeypatch):
    """Adaptive-refinement percentiles must be EXACT (to the 2dp output
    rounding) on a continuous domain, with the refinement loop actually
    exercised (collect cap forced below N)."""
    rng = np.random.default_rng(11)
    prices = np.round(rng.lognormal(7.0, 1.2, size=30_000), 2)
    sf = _write_prices(tmp_path, prices)
    monkeypatch.setattr(sketches, "_EXACT_PCT_COLLECT_CAP", 512)
    got = sketches.price_percentiles_exact(sf).to_pandas().iloc[0]
    for col, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        exact = np.percentile(prices, p * 100, method="linear")
        assert got[col] == pytest.approx(exact, abs=0.005 + 1e-9)


def test_exact_percentiles_duplicate_heavy(ray_session, tmp_path, monkeypatch):
    """All-duplicate intervals stop shrinking (progress=False branch) but
    the answer stays exact: 90% of rows share one value."""
    rng = np.random.default_rng(4)
    vals = np.concatenate([np.full(27_000, 1234.56),
                           np.round(rng.uniform(1.0, 9_999.0, size=3_000), 2)])
    rng.shuffle(vals)
    sf = _write_prices(tmp_path, vals)
    monkeypatch.setattr(sketches, "_EXACT_PCT_COLLECT_CAP", 256)
    got = sketches.price_percentiles_exact(sf).to_pandas().iloc[0]
    for col, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        exact = np.percentile(vals, p * 100, method="linear")
        assert got[col] == pytest.approx(exact, abs=0.005 + 1e-9)


def test_trimmed_mean_by_flag(ray_session, tmp_path, monkeypatch):
    """Grouped trimmed mean equals the numpy value-based trim per key, with
    the grouped refinement loop exercised (collect cap below group sizes)."""
    import os

    import pyarrow.parquet as pq

    rng = np.random.default_rng(6)
    flags = rng.choice(["A", "N", "R"], size=24_000)
    prices = np.round(rng.lognormal(7.0, 1.0, size=24_000), 2)
    pq.write_table(pa.table({"l_returnflag": pa.array(flags),
                             "l_extendedprice": pa.array(prices)}),
                   os.path.join(str(tmp_path), "lineitem.parquet"))
    monkeypatch.setattr(sketches, "_EXACT_PCT_COLLECT_CAP", 256)
    got = (sketches.trimmed_mean_price_by_flag(str(tmp_path)).to_pandas()
           .set_index("l_returnflag")["trimmed_mean"])
    for f in ("A", "N", "R"):
        x = prices[flags == f]
        lo = np.percentile(x, 5, method="linear")
        hi = np.percentile(x, 95, method="linear")
        exact = x[(x >= lo) & (x <= hi)].mean()
        assert got.loc[f] == pytest.approx(exact, abs=0.005 + 1e-9)


def test_quantity_mad_by_flag(ray_session, tmp_path):
    """Grouped median + MAD equal numpy's on an integer domain, including
    even-count interpolation (.5 medians, .25-grid MADs)."""
    import os

    import pyarrow.parquet as pq

    rng = np.random.default_rng(2)
    flags = rng.choice(["A", "N"], size=5001)  # odd + even group sizes
    q = rng.integers(1, 51, size=5001).astype(np.float64)
    pq.write_table(pa.table({"l_returnflag": pa.array(flags),
                             "l_quantity": pa.array(q)}),
                   os.path.join(str(tmp_path), "lineitem.parquet"))
    got = (sketches.quantity_mad_by_flag(str(tmp_path)).to_pandas()
           .set_index("l_returnflag"))
    for f in ("A", "N"):
        x = q[flags == f]
        med = np.percentile(x, 50, method="linear")
        mad = np.percentile(np.abs(x - med), 50, method="linear")
        assert got.loc[f, "med"] == med
        assert got.loc[f, "mad"] == mad


def _write_events_values(tmp_path, users, values):
    import os

    import pyarrow.parquet as pq

    n = len(users)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users, type=pa.int64()),
        "value": pa.array(values, type=pa.float64())}),
        os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_user_value_median_exact(ray_session, tmp_path):
    """High-cardinality grouped exact median vs numpy, odd and even group
    sizes, negatives included."""
    rng = np.random.default_rng(12)
    users = rng.integers(0, 500, size=20_000)
    values = np.round(rng.normal(0, 100, size=20_000), 2)
    sf = _write_events_values(tmp_path, users, values)
    got = (sketches.user_value_median(sf).to_pandas()
           .set_index("user_id")["med_value"])
    for u in (0, 7, 499, int(users[0])):
        x = values[users == u]
        assert got.loc[u] == pytest.approx(
            np.percentile(x, 50, method="linear"), abs=1e-12)
    assert len(got) == len(np.unique(users))


def test_user_value_median_hot_key(ray_session, tmp_path):
    """One user owning 50% of rows (straddles every block) still heals to
    the exact median."""
    rng = np.random.default_rng(3)
    n = 10_000
    users = np.where(rng.random(n) < 0.5, 42,
                     rng.integers(100, 200, size=n))
    values = np.round(rng.uniform(-50, 50, size=n), 2)
    sf = _write_events_values(tmp_path, users, values)
    got = (sketches.user_value_median(sf).to_pandas()
           .set_index("user_id")["med_value"])
    x = values[users == 42]
    assert got.loc[42] == pytest.approx(
        np.percentile(x, 50, method="linear"), abs=1e-12)


def _brute_ewma(users, ts, values, alpha):
    out = np.zeros(len(users))
    order = np.lexsort((np.arange(len(users)), ts, users))
    state: dict = {}
    for i in order:
        u = users[i]
        if u not in state:
            state[u] = values[i]
        else:
            state[u] = alpha * values[i] + (1 - alpha) * state[u]
        out[i] = state[u]
    return out


def test_user_value_ewma(ray_session, tmp_path):
    """Distributed affine scan equals the sequential recurrence, including
    runs longer than the scan chunk and a hot user straddling blocks."""
    import os

    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops import windows

    rng = np.random.default_rng(21)
    n = 12_000
    users = np.where(rng.random(n) < 0.4, 7,  # hot user, runs >> chunk
                     rng.integers(100, 160, size=n)).astype(np.int64)
    ts = rng.integers(0, 10**9, size=n)
    values = np.round(rng.normal(0, 10, size=n), 2)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "value": pa.array(values)}),
        os.path.join(str(tmp_path), "events.parquet"))
    got = (windows.user_value_ewma(str(tmp_path)).to_pandas()
           .set_index("event_id")["ewma"].sort_index().to_numpy())
    want = _brute_ewma(users, ts, values, 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_weighted_median_price(ray_session, tmp_path, monkeypatch):
    """Weighted lower median equals the sequential cumsum definition, with
    the refinement loop exercised and a duplicate-heavy corpus."""
    import os

    import pyarrow.parquet as pq

    def brute(v, w):
        order = np.argsort(v, kind="stable")
        cw = np.cumsum(w[order])
        return float(v[order][np.searchsorted(cw, cw[-1] / 2.0)])

    rng = np.random.default_rng(19)
    cases = {
        "spread": (np.round(rng.lognormal(7, 1, 20_000), 2),
                   rng.integers(1, 50, 20_000).astype(np.float64)),
        "dup-heavy": (np.r_[np.full(15_000, 777.77),
                            np.round(rng.uniform(1, 2000, 5_000), 2)],
                      rng.integers(1, 50, 20_000).astype(np.float64)),
    }
    for case, (v, w) in cases.items():
        d = os.path.join(str(tmp_path), f"c{case}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"l_extendedprice": pa.array(v),
                                 "l_quantity": pa.array(w)}),
                       os.path.join(d, "lineitem.parquet"))
        monkeypatch.setattr(sketches, "_EXACT_PCT_COLLECT_CAP", 256)
        got = sketches.weighted_median_price(d).to_pandas()["wmedian"][0]
        assert got == brute(v, w), case


def test_event_transitions(ray_session, tmp_path):
    """Transition counts equal the sequential lead() definition, hot user
    included (cross-block adjacencies healed from context rows)."""
    import os
    from collections import Counter

    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops import windows

    rng = np.random.default_rng(23)
    n = 8000
    users = np.where(rng.random(n) < 0.5, 9,
                     rng.integers(50, 90, size=n)).astype(np.int64)
    ts = rng.integers(0, 10**9, size=n)
    types = rng.choice(["click", "view", "purchase", "signup"], size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_type": pa.array(types)}),
        os.path.join(str(tmp_path), "events.parquet"))
    got = (windows.event_transitions(str(tmp_path)).to_pandas()
           .set_index(["prev_type", "next_type"])["n"].to_dict())
    want: Counter = Counter()
    order = np.lexsort((np.arange(n), ts, users))
    for a, b in zip(order[:-1], order[1:]):
        if users[a] == users[b]:
            want[(types[a], types[b])] += 1
    assert got == dict(want)


def test_user_activity_skew(ray_session, tmp_path, monkeypatch):
    """Skew report equals numpy over a planted hot-key distribution, with
    the refinement loop exercised over the derived counts dataset."""
    import os

    import pyarrow.parquet as pq

    rng = np.random.default_rng(29)
    n = 20_000
    users = np.where(rng.random(n) < 0.3, 1,
                     rng.integers(10, 2010, size=n))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(users, type=pa.int64())}),
        os.path.join(str(tmp_path), "events.parquet"))
    monkeypatch.setattr(sketches, "_EXACT_PCT_COLLECT_CAP", 128)
    got = sketches.user_activity_skew(str(tmp_path)).to_pandas().iloc[0]
    _, cnts = np.unique(users, return_counts=True)
    assert got["n_users"] == len(cnts)
    assert got["max_events"] == cnts.max()
    assert got["p50"] == pytest.approx(np.percentile(cnts, 50, method="linear"), abs=0.005)
    assert got["p99"] == pytest.approx(np.percentile(cnts, 99, method="linear"), abs=0.005)
