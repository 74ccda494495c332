"""Degenerate-input hardening for the round-3 close-out operators: empty
tables and single-row tables must produce well-formed (possibly empty)
results, never crash."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.ops import joins, relational, similarity, sketches, substring, windows


def _write_events(d, n):
    base = 1_600_000_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array([7] * n, type=pa.int64()),
        "ts": pa.array([base + i for i in range(n)], type=pa.timestamp("us")),
        "event_type": pa.array(["click"] * n, type=pa.string()),
        "value": pa.array([1.5] * n, type=pa.float64()),
    }), os.path.join(str(d), "events.parquet"))


@pytest.mark.parametrize("n", [0, 1])
def test_event_ops_degenerate(ray_session, tmp_path, n):
    _write_events(tmp_path, n)
    d = str(tmp_path)
    assert windows.events_cume_dist(d).count() == n
    assert len(windows.cohort_retention(d).to_pandas()) == (1 if n else 0)
    got = joins.user_funnel(d).to_pandas()
    assert len(got) == (1 if n else 0)
    if n:  # click without signup -> stage 0
        assert got["funnel_stage"].iloc[0] == 0
    piv = relational.events_pivot(d).to_pandas()
    assert len(piv) == (1 if n else 0)
    stats = relational.value_stats_by_type(d).to_pandas()
    if n:
        assert stats["std_value"].iloc[0] == 0.0  # ddof guard, not NaN
    assert relational.users_click_and_purchase(d).count() == 0
    hll = sketches.hll_distinct_users_by_type(d).to_pandas()
    assert len(hll) == (1 if n else 0)


@pytest.mark.parametrize("n", [0, 1])
def test_doc_ops_degenerate(ray_session, tmp_path, n):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["short text"] * n, type=pa.string()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    d = str(tmp_path)
    sub = substring.dedup_substrings(d).to_pandas()
    assert len(sub) == n
    if n:  # empty upstream legitimately yields a schemaless empty frame
        assert (sub["n_removed"] == 0).all()
    from paddleocr_json_ray.ops import text_ops

    sp = text_ops.shuffle_positions(d).to_pandas()
    assert len(sp) == n
    if n:
        assert sp["pos"].iloc[0] == 1


def test_embedding_ops_single_vector(ray_session, tmp_path):
    pq.write_table(pa.table({
        "vec_id": pa.array([0], type=pa.int64()),
        "embedding": pa.array([np.arange(8, dtype=np.float32)]),
        "label": pa.array([2], type=pa.int32()),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    d = str(tmp_path)
    cent = similarity.label_centroids(d).to_pandas()
    assert len(cent) == 8 and (cent["label"] == 2).all()
    assert list(cent.sort_values("dim")["avg_val"]) == list(np.arange(8.0))
    cov = similarity.embedding_covariance(d).to_pandas()
    assert len(cov) == 64  # n=1 -> ddof guard yields finite values
    assert np.isfinite(cov["cov"]).all()


@pytest.mark.parametrize("n", [0, 1])
def test_round3f_event_ops_degenerate(ray_session, tmp_path, n):
    _write_events(tmp_path, n)
    d = str(tmp_path)
    top = windows.top_event_type_per_user(d).to_pandas()
    assert len(top) == n
    if n:
        assert (top["top_type"].iloc[0], top["n"].iloc[0]) == ("click", 1)
    paths = windows.user_paths(d).to_pandas()
    assert len(paths) == n
    if n:
        assert paths["path"].iloc[0] == "click"
    rolled = windows.rolling_active_users(d).to_pandas()
    assert len(rolled) == n
    if n:
        assert rolled["n_users"].iloc[0] == 1
    share = windows.event_type_share(d).to_pandas()
    assert len(share) == n
    if n:
        assert share["share_milli"].iloc[0] == 1000
    assert joins.click_to_purchase(d).count() == 0  # no purchases at all


@pytest.mark.parametrize("n", [0, 1])
def test_bigram_degenerate(ray_session, tmp_path, n):
    from paddleocr_json_ray.ops import text_ops

    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["solo"] * n, type=pa.string()),  # 1 token: no pair
    }), os.path.join(str(tmp_path), "documents.parquet"))
    assert text_ops.bigram_topk(str(tmp_path)).count() == 0


def test_order_price_audit_semantics(ray_session, tmp_path):
    """Hand-built header/detail: a consistent order, a mismatched order,
    an order with no lineitems, and an orphan lineitem (ignored, like the
    oracle's orders-side LEFT JOIN)."""
    d = str(tmp_path)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_totalprice": pa.array([110.0, 50.0, 7.25], type=pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        # order 1: 100 * 1.0 * 1.10 = 110.00 exactly -> consistent
        # order 2: 30.00 vs header 50.00 -> mismatch of 2000 cents
        # order 99: orphan detail, must not be counted
        "l_orderkey": pa.array([1, 2, 99], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 30.0, 5.0], type=pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], type=pa.float64()),
        "l_tax": pa.array([0.10, 0.0, 0.0], type=pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = relational.order_price_audit(d).to_pandas()
    assert got["n_orders"].iloc[0] == 3
    # order 2 (2000c) and order 3 (725c, no details) mismatch; order 1 not
    assert got["n_mismatch"].iloc[0] == 2
    assert got["max_diff_cents"].iloc[0] == 2000


@pytest.mark.parametrize("n", [0, 1])
def test_rfm_and_outliers_degenerate(ray_session, tmp_path, n):
    _write_events(tmp_path, n)
    from paddleocr_json_ray.ops import text_ops
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["short text"] * n, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
        "source": pa.array(["s0"] * n, type=pa.string()),
        "n_chars": pa.array([10] * n, type=pa.int64()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    d = str(tmp_path)
    rfm = sketches.user_rfm_segments(d).to_pandas()
    if n:  # single user lands in segment (1,1,1) with all-equal thresholds
        assert rfm.to_dict("records") == [
            {"r_seg": 1, "f_seg": 1, "m_seg": 1, "n_users": 1}]
    else:
        assert len(rfm) == 0
    out = text_ops.doc_length_outliers(d).to_pandas()
    if n:
        assert out.to_dict("records") == [
            {"source": "s0", "p05": 10.0, "p95": 10.0,
             "n_kept": 1, "n_trimmed": 0}]
    else:
        assert len(out) == 0


def test_streaming_tumbling_windows_bruteforce(ray_session, tmp_path):
    """Watermark semantics vs a sequential reference on a corpus with
    PLANTED arrival ties (the block-boundary hazard) and heavy disorder:
    event times stride backwards/forwards so many arrivals share the same
    arrival key and several windows close mid-stream."""
    import hashlib

    rng = np.random.default_rng(77)
    n = 5_000
    W, L = 3_600_000_000, 1_800_000_000
    base = 1_700_000_000_000_000
    # clustered event times with jumps so windows genuinely close
    ts = base + np.sort(rng.integers(0, 3 * 86_400, size=n)) * 1_000_000
    ev = np.arange(n, dtype=np.int64)
    types = np.array(["a", "b", "c"], dtype=object)[ev % 3]
    vals = np.where(ev % 7 == 0, np.nan,
                    rng.normal(0, 50, size=n)).astype(np.float64)
    pq.write_table(pa.table({
        "event_id": pa.array(ev),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "event_type": pa.array(types.tolist()),
        "value": pa.array([None if np.isnan(v) else float(v)
                           for v in vals], type=pa.float64()),
    }), os.path.join(str(tmp_path), "events.parquet"))

    got = windows.streaming_tumbling_windows(str(tmp_path)).to_pandas()

    # sequential reference with the SAME arrival model
    def md5_32(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    arr = np.array([t + ((md5_32(i) // 16 % 14400) * 1_000_000
                         if md5_32(i) % 10 == 0 else 0)
                    for i, t in zip(ev, ts)], dtype=np.int64)
    order = np.lexsort((ev, arr))
    acc = {}
    wm = None
    n_dropped = 0
    for k in order:
        t = int(ts[k])
        win = t - t % W
        if wm is not None and win + W <= wm - L:
            n_dropped += 1
        else:
            v = vals[k]
            c = 0 if np.isnan(v) else \
                (int(np.floor(v * 100 + 0.5)) if v >= 0
                 else -int(np.floor(-v * 100 + 0.5)))
            pn, ps = acc.get((win, types[k]), (0, 0))
            acc[(win, types[k])] = (pn + 1, ps + c)
        wm = t if wm is None else max(wm, t)
    assert n_dropped > 0, "corpus must exercise the late-drop path"
    expect = {k: acc[k] for k in acc}
    got_map = {(int(r.win_start), r.event_type):
               (int(r.n_events), int(r.sum_cents))
               for r in got.itertuples()}
    assert got_map == expect
    # output ordering contract
    keys = list(zip(got["win_start"], got["event_type"]))
    assert keys == sorted(keys)


def test_streaming_late_drops_consistency(ray_session, tmp_path):
    """The drop audit agrees with the window op on the same corpus: total
    minus kept equals dropped, and zero-disorder input reports 0 drops
    (single row survives — the 0-row to_pandas column-drop hazard)."""
    rng = np.random.default_rng(78)
    n = 3_000
    base = 1_700_000_000_000_000
    ts = base + np.sort(rng.integers(0, 2 * 86_400, size=n)) * 1_000_000
    ev = np.arange(n, dtype=np.int64)
    pq.write_table(pa.table({
        "event_id": pa.array(ev),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "event_type": pa.array((np.array(["x", "y"], dtype=object)[ev % 2]).tolist()),
        "value": pa.array(rng.normal(0, 10, size=n)),
    }), os.path.join(str(tmp_path), "events.parquet"))
    audit = windows.streaming_late_drops(str(tmp_path)).to_pandas()
    wins = windows.streaming_tumbling_windows(str(tmp_path)).to_pandas()
    assert int(audit["n_total"][0]) == n
    assert int(audit["n_total"][0]) - int(wins["n_events"].sum()) \
        == int(audit["n_dropped"][0])
    assert (int(audit["max_over_us"][0]) > 0) == \
        (int(audit["n_dropped"][0]) > 0)
    # zero-disorder corpus: huge lateness budget -> nothing drops
    quiet = windows.streaming_late_drops(
        str(tmp_path), lateness_us=10**15).to_pandas()
    assert len(quiet) == 1 and int(quiet["n_dropped"][0]) == 0
    assert int(quiet["max_over_us"][0]) == 0


def test_streaming_sessions_bridge_and_drop(ray_session, tmp_path):
    """An accepted late event BRIDGES two sessions (retroactive merge);
    a dropped late event does not.  Sequential reference on a planted
    timeline (no md5 tail here — the delays come from the planted
    event_ids matching/avoiding the md5 lateness bucket is irrelevant at
    this scale; we just assert vs the same arrival model)."""
    import hashlib

    base = 1_700_000_000_000_000
    HOUR = 3_600_000_000
    # user 1: two bursts 40 min apart (gap 30 min -> 2 sessions unless an
    # in-between event survives and bridges them)
    rows = [
        (0, 1, base),
        (1, 1, base + 5 * 60_000_000),
        (2, 1, base + 25 * 60_000_000),   # bridge candidate
        (3, 1, base + 45 * 60_000_000),
        (4, 1, base + 50 * 60_000_000),
        (5, 2, base + 2 * HOUR),
        (6, 2, base + 30 * HOUR),
    ]
    ev = np.array([r[0] for r in rows], dtype=np.int64)
    us = np.array([r[1] for r in rows], dtype=np.int64)
    ts = np.array([r[2] for r in rows], dtype=np.int64)
    pq.write_table(pa.table({
        "event_id": pa.array(ev),
        "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
        "user_id": pa.array(us),
        "event_type": pa.array(["x"] * len(ev)),
        "value": pa.array([1.0] * len(ev)),
    }), os.path.join(str(tmp_path), "events.parquet"))

    got = windows.streaming_user_sessions(str(tmp_path)).to_pandas() \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)

    # sequential reference: same arrival model + watermark + sessionize
    def md5_32(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    arr = np.array([t + ((md5_32(i) // 16 % 14400) * 1_000_000
                         if md5_32(i) % 10 == 0 else 0)
                    for i, t in zip(ev, ts)], dtype=np.int64)
    order = np.lexsort((ev, arr))
    wm = None
    keep = []
    for k in order:
        t = int(ts[k])
        win = t - t % HOUR
        if not (wm is not None and win + HOUR <= wm - HOUR // 2):
            keep.append(k)
        wm = t if wm is None else max(wm, t)
    keep.sort(key=lambda k: (us[k], ts[k], ev[k]))
    sess = []
    for k in keep:
        if sess and sess[-1][0] == us[k] \
                and ts[k] - sess[-1][2] <= 30 * 60_000_000:
            u, s0, _, n = sess[-1]
            sess[-1] = (u, s0, int(ts[k]), n + 1)
        else:
            sess.append((int(us[k]), int(ts[k]), int(ts[k]), 1))
    expect = []
    sid = {}
    for u, s0, s1, n in sess:
        sid[u] = sid.get(u, 0) + 1
        expect.append((u, sid[u], n, s0, s1))
    got_t = [(int(r.user_id), int(r.session_id), int(r.n_events),
              int(r.session_start_us), int(r.session_end_us))
             for r in got.itertuples()]
    assert got_t == expect
