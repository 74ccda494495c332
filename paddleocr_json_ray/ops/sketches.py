"""Sketch + order-statistic operators over the demo tables.

  * ``events_distinct_users`` — EXACT distinct count per key: per-batch
    partial dedup (the combiner) shrinks rows to distinct (key, user)
    pairs, then two native partial-agg exchanges (keyed distinct, per-key
    count) — the driver never holds the pair set; cardinality is bounded
    by |event_type| x |users|, never corpus-sized.
  * ``hll_distinct_users`` — HyperLogLog (Flajolet et al., AofA 2007):
    the UNBOUNDED-cardinality scale path.  Each batch emits one row of
    2^p max-rank registers; registers merge by elementwise max (associative
    + commutative, so partial merges pipeline freely) and the estimate
    uses the standard alpha_m correction with the small-range fix.
  * ``quantity_percentiles`` — exact percentile_cont over a bounded value
    domain: per-batch value histograms merge on the driver; interpolation
    follows SQL PERCENTILE_CONT exactly (rank h=(N-1)p between adjacent
    order statistics).
  * ``hll_distinct_users_by_type`` — the grouped-sketch variant: one
    register row per (key, batch), max-merged per key.
  * ``heavy_hitters`` — mergeable Misra-Gries/SpaceSaving top-k with a
    one-sided error bound: the unbounded-vocabulary companion to the
    exact ``word_topk``.
  * ``price_quantiles_tdigest`` — mergeable t-digest quantiles: the
    unbounded-value-domain companion to the exact histogram percentiles.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_HLL_P = 12
_HLL_M = 1 << _HLL_P


def _hash64(vals: np.ndarray) -> np.ndarray:
    """splitmix64 over int64 values, vectorized (public-domain finalizer)."""
    x = vals.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def events_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n_users) — exact COUNT(DISTINCT user_id) per type.

    Two native partial-aggregating exchanges, both combiner-first: batch-
    local distinct pairs -> keyed distinct groupby -> per-type Count.  The
    driver never holds the pair set (that was the round-2 shape; HLL below
    remains the documented unbounded-cardinality path)."""
    from ray.data.aggregate import Count

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    def partial_pairs(batch: pa.Table) -> pa.Table:
        # combiner: this batch's distinct pairs only
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (ds.map_batches(partial_pairs, batch_format="pyarrow")
               .groupby(["event_type", "user_id"]).aggregate(Count())
               .select_columns(["event_type"]))
    agg = pairs.groupby("event_type").aggregate(Count())
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b.column("event_type"),
            "n_users": b.column("count()").cast(pa.int64()),
        }),
        batch_format="pyarrow").sort("event_type")


def _hll_ranks(h: np.ndarray) -> np.ndarray:
    """1-based position of the leftmost 1 in the low 64-p bits of each hash."""
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    nlz = np.zeros(len(h), dtype=np.int64)
    cur = rest.copy()
    top = np.uint64(1) << np.uint64(63)
    for _ in range(64 - _HLL_P + 1):
        unset = (cur & top) == 0
        if not unset.any():
            break
        nlz[unset] += 1
        cur[unset] = cur[unset] << np.uint64(1)
    return nlz + 1


def hll_registers(batch: pa.Table, col: str = "user_id") -> pa.Table:
    """One row per batch: 2^p HLL registers over the hashed column."""
    h = _hash64(batch.column(col).to_numpy().astype(np.int64))
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rank = _hll_ranks(h)
    regs = np.zeros(_HLL_M, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return pa.table({"registers": pa.array([regs.tobytes()], type=pa.binary())})


def hll_estimate(regs: np.ndarray) -> float:
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def hll_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT user_id) over events via HyperLogLog:
    one register row per batch, merged by elementwise max.  Returns a
    single row (n_users_approx int64) — rows-only checked; the exact
    counterpart is events_distinct_users."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])
    parts = ds.map_batches(hll_registers, batch_format="pyarrow").to_pandas()
    merged = np.zeros(_HLL_M, dtype=np.int8)
    for blob in parts["registers"]:
        np.maximum(merged, np.frombuffer(blob, dtype=np.int8), out=merged)
    return ray.data.from_arrow(pa.table({
        "n_users_approx": pa.array([int(round(hll_estimate(merged)))], type=pa.int64()),
    }))


def hll_distinct_users_by_type(sf_dir: str) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT user_id) PER event_type — the grouped
    sketch shape.  Each batch emits one register row per key present (an
    arrow-grouped variant of ``hll_registers``); the merge is elementwise
    max per key over keys x blocks rows (control-plane sized — registers
    are 4 KB regardless of cardinality, so a hot key costs the same as a
    cold one).  Returns (event_type, n_users_approx), rows-only checked;
    the exact counterpart is ``events_distinct_users``."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column("event_type").to_numpy(zero_copy_only=False)
        h = _hash64(batch.column("user_id").to_numpy().astype(np.int64))
        order = np.argsort(keys, kind="stable")
        keys, h = keys[order], h[order]
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        out_k, out_r = [], []
        idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
        rank = _hll_ranks(h)
        for s, e in zip(starts, np.r_[starts[1:], len(keys)]):
            regs = np.zeros(_HLL_M, dtype=np.int8)
            np.maximum.at(regs, idx[s:e], rank[s:e].astype(np.int8))
            out_k.append(keys[s])
            out_r.append(regs.tobytes())
        return pa.table({"event_type": pa.array(out_k, type=pa.string()),
                         "registers": pa.array(out_r, type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # empty events table
        return ray.data.from_arrow(pa.table({
            "event_type": pa.array([], type=pa.string()),
            "n_users_approx": pa.array([], type=pa.int64())}))
    merged: dict[str, np.ndarray] = {}
    for k, blob in zip(parts["event_type"], parts["registers"]):
        regs = np.frombuffer(blob, dtype=np.int8)
        if k in merged:
            np.maximum(merged[k], regs, out=merged[k])
        else:
            merged[k] = regs.copy()
    keys = sorted(merged)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(keys, type=pa.string()),
        "n_users_approx": pa.array(
            [int(round(hll_estimate(merged[k]))) for k in keys], type=pa.int64()),
    }))


_HH_CAP = 4096
_DEDUCT_KEY = "\x00deducted"  # NUL-prefixed: cannot collide with a token


def _mg_reduce(words: list[str], counts: np.ndarray, cap: int):
    """Misra-Gries reduction to ``cap`` counters: subtract the (cap+1)-th
    largest count from all and keep positives.  Returns (words, counts,
    deducted) — the deduction is the summary's one-sided error mass."""
    if len(words) <= cap:
        return words, counts, 0
    kth = np.partition(counts, len(counts) - cap - 1)[len(counts) - cap - 1]
    keep = counts > kth
    return ([w for w, m in zip(words, keep) if m],
            counts[keep] - kth, int(kth))


def heavy_hitters(sf_dir: str, k: int = 20, cap: int = _HH_CAP) -> ray.data.Dataset:
    """(word, count_lo, count_hi, rank) — approximate top-k words via the
    MERGEABLE Misra-Gries / SpaceSaving summary (Agarwal et al., Mergeable
    Summaries, PODS'12): the unbounded-vocabulary companion to the exact
    ``word_topk`` (whose vocab-bounded groupby stops being cheap when the
    key space is open-ended: URLs, n-grams, user agents).

    Per batch: exact counts MG-reduced to ``cap`` counters plus one
    deduction row (the summary's error mass).  Counters merge by native
    Sum groupby (rows bounded by cap x blocks, control-plane sized — never
    corpus-sized); the global deduction total E gives the one-sided bound
    true count in [count_lo, count_lo + E] for every surviving word, and
    any word with true count > E is guaranteed to survive."""
    import re

    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    tok = re.compile(r"[^ \t\n\r\f\v]+")
    ds = read_table(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tok.findall(t))
        words = list(c.keys())
        counts = np.fromiter(c.values(), dtype=np.int64, count=len(words))
        words, counts, ded = _mg_reduce(words, counts, cap)
        return pa.table({
            "word": pa.array(words + [_DEDUCT_KEY], type=pa.string()),
            "n": pa.array(np.r_[counts, ded], type=pa.int64()),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("word").aggregate(Sum("n")).to_pandas())
    is_ded = merged["word"] == _DEDUCT_KEY
    err = int(merged.loc[is_ded, "sum(n)"].sum())
    rest = merged[~is_ded].sort_values(["sum(n)", "word"],
                                       ascending=[False, True]).head(k)
    return ray.data.from_arrow(pa.table({
        "word": pa.array(rest["word"].tolist(), type=pa.string()),
        "count_lo": pa.array(rest["sum(n)"].astype("int64").tolist(), type=pa.int64()),
        "count_hi": pa.array((rest["sum(n)"].astype("int64") + err).tolist(),
                             type=pa.int64()),
        "rank": pa.array(range(1, len(rest) + 1), type=pa.int64()),
    }))


_CMS_DEPTH = 4
_CMS_WIDTH = 4096
_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                       0x94D049BB133111EB, 0xD6E8FEB86659FD93],
                      dtype=np.uint64)


def _cms_word_hashes(words: list[str]) -> np.ndarray:
    """(depth, len(words)) column indices: a stable md5-derived 64-bit base
    hash per word, re-mixed through splitmix64 with one seed per row."""
    import hashlib

    base = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
         for w in words), dtype=np.uint64, count=len(words))
    rows = np.empty((_CMS_DEPTH, len(words)), dtype=np.int64)
    for r in range(_CMS_DEPTH):
        rows[r] = (_hash64((base ^ _CMS_SEEDS[r]).astype(np.int64))
                   % np.uint64(_CMS_WIDTH)).astype(np.int64)
    return rows


def cms_word_counts(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """(word, est_count, rank) — point-frequency estimates for the top-k
    candidate words from a count-min sketch (Cormode & Muthukrishnan,
    J. Algorithms 2005): the FIXED-MEMORY frequency companion to
    ``heavy_hitters`` (which finds candidates but carries per-word rows) —
    CMS answers "how often does word w occur" in depth*width counters no
    matter how large the vocabulary, with the one-sided guarantee
    true <= est <= true + (e/width) * N  w.p. 1 - exp(-depth).

    Shape: per batch ONE sketch row (depth x width int64 blob, counters
    are exact batch counts added at depth hashed columns); blobs merge by
    elementwise ADD — associative and commutative, so a map_batches
    combine level collapses blocks 32:1 before the driver folds the rest
    (extend with more combine levels at 100 TB; each is a 32x reduction).
    Candidates come from the mergeable Misra-Gries pass (`heavy_hitters`);
    estimates are the min over the sketch's depth rows."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "documents", ["text"])
    import re

    tok = re.compile(r"[^ \t\n\r\f\v]+")

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tok.findall(t))
        sketch = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
        if c:
            words = list(c.keys())
            counts = np.fromiter(c.values(), dtype=np.int64, count=len(words))
            idx = _cms_word_hashes(words)
            for r in range(_CMS_DEPTH):
                np.add.at(sketch[r], idx[r], counts)
        return pa.table({"sketch": pa.array([sketch.tobytes()],
                                            type=pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        acc = np.zeros(_CMS_DEPTH * _CMS_WIDTH, dtype=np.int64)
        for blob in batch.column("sketch").to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64)
        return pa.table({"sketch": pa.array([acc.tobytes()], type=pa.binary())})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
               .map_batches(combine, batch_format="pyarrow", batch_size=32)
               .to_pandas())
    sketch = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
    for blob in parts["sketch"]:
        sketch += np.frombuffer(blob, dtype=np.int64).reshape(
            _CMS_DEPTH, _CMS_WIDTH)

    cands = heavy_hitters(sf_dir, k=k).to_pandas()["word"].tolist()
    if not cands:
        return ray.data.from_arrow(pa.table({
            "word": pa.array([], type=pa.string()),
            "est_count": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64())}))
    idx = _cms_word_hashes(cands)
    est = sketch[np.arange(_CMS_DEPTH)[:, None], idx].min(axis=0)
    order = sorted(range(len(cands)), key=lambda i: (-int(est[i]), cands[i]))
    return ray.data.from_arrow(pa.table({
        "word": pa.array([cands[i] for i in order], type=pa.string()),
        "est_count": pa.array([int(est[i]) for i in order], type=pa.int64()),
        "rank": pa.array(range(1, len(order) + 1), type=pa.int64()),
    }))


_TD_DELTA = 200


def _tdigest_compress(means: np.ndarray, weights: np.ndarray,
                      delta: int = _TD_DELTA):
    """Re-cluster sorted centroids under the t-digest scale function
    k(q) = delta * (asin(2q-1)/pi + 1/2)/2 (Dunning & Ertl 2019): each
    centroid lands in the integer k-bin of its cumulative-weight midpoint
    and consecutive same-bin centroids fuse (one reduceat, no Python loop
    over values).  k spans [0, delta/2], so the output is <= delta/2 + 1
    centroids with fine resolution at the tails."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    if total == 0:
        return means[:0], weights[:0]
    q_mid = (np.cumsum(weights) - weights / 2) / total
    k = delta * (np.arcsin(np.clip(2 * q_mid - 1, -1, 1)) / np.pi + 0.5) / 2
    bins = np.floor(k).astype(np.int64)
    starts = np.r_[0, np.flatnonzero(np.diff(bins)) + 1]
    out_w = np.add.reduceat(weights, starts)
    out_m = np.add.reduceat(means * weights, starts) / out_w
    return out_m, out_w


def _cont_interp(lo: float, hi: float, h: float) -> float:
    """DuckDB PERCENTILE_CONT interpolation, BIT-faithful: the two-sided
    ``(CRN-RN)*lo + (RN-FRN)*hi`` form of DuckDB's Interpolator
    (src/core_functions/aggregate/holistic/quantile.cpp), with the
    CRN==FRN exact-index branch.  The algebraically-equal one-sided
    ``lo + frac*(hi-lo)`` differs by 1 ulp for some fractions (measured:
    p95 over 25 rows -> 488.3999999999999 vs DuckDB 488.4), which the
    driver's byte-level hash treats as a mismatch."""
    frn = np.floor(h)
    crn = np.ceil(h)
    if crn == frn:
        return float(lo)
    return float((crn - h) * lo + (h - frn) * hi)


def _tdigest_quantile(means: np.ndarray, weights: np.ndarray, p: float) -> float:
    """Interpolate at centroid cumulative midpoints."""
    cum = np.cumsum(weights) - weights / 2
    target = p * weights.sum()
    return float(np.interp(target, cum, means))


def price_quantiles_tdigest(sf_dir: str) -> ray.data.Dataset:
    """(p50, p90, p99) of lineitem.l_extendedprice via a MERGEABLE t-digest:
    the UNBOUNDED-value-domain scale path for quantiles (the exact
    ``quantity_percentiles`` relies on a small value domain for its
    mergeable histogram — prices/latencies/losses have none).  Each batch
    emits its centroid rows (<= delta per batch); merging is concatenate +
    one more compression (associative up to digest tolerance), so the
    exchange carries O(delta x blocks) rows, never values."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy().astype(np.float64)
        m, w = _tdigest_compress(v, np.ones(len(v)))
        return pa.table({"mean": pa.array(m, type=pa.float64()),
                         "weight": pa.array(w, type=pa.float64())})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    m, w = _tdigest_compress(part["mean"].to_numpy(), part["weight"].to_numpy())
    return ray.data.from_arrow(pa.table({
        "p50": pa.array([_tdigest_quantile(m, w, 0.5)], type=pa.float64()),
        "p90": pa.array([_tdigest_quantile(m, w, 0.9)], type=pa.float64()),
        "p99": pa.array([_tdigest_quantile(m, w, 0.99)], type=pa.float64()),
    }))


_PCTS = (0.5, 0.9, 0.99)


def quantity_percentiles(sf_dir: str) -> ray.data.Dataset:
    """Exact PERCENTILE_CONT(0.5/0.9/0.99) of lineitem.l_quantity via
    mergeable per-batch value histograms (the quantity domain is small)."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem", ["l_quantity"])

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column("l_quantity").to_numpy().astype(np.float64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"val": pa.array(u, type=pa.float64()),
                         "cnt": pa.array(c.astype(np.int64), type=pa.int64())})

    part = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    vals = part["val"].to_numpy()
    cnts = part["cnt"].to_numpy().astype(np.int64)
    u, inv = np.unique(vals, return_inverse=True)
    tot = np.zeros(len(u), dtype=np.int64)
    np.add.at(tot, inv, cnts)
    cum = np.cumsum(tot)
    n = int(cum[-1])

    def pct(p: float) -> float:
        h = (n - 1) * p
        lo_i = int(np.searchsorted(cum, int(np.floor(h)) + 1))
        hi_i = int(np.searchsorted(cum, int(np.floor(h)) + 2))
        lo, hi = float(u[lo_i]), float(u[min(hi_i, len(u) - 1)])
        return _cont_interp(lo, hi, h)

    return ray.data.from_arrow(pa.table({
        "p50": pa.array([pct(0.5)], type=pa.float64()),
        "p90": pa.array([pct(0.9)], type=pa.float64()),
        "p99": pa.array([pct(0.99)], type=pa.float64()),
    }))


def quantity_percentiles_by_flag(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group PERCENTILE_CONT(0.5/0.9/0.99) of l_quantity by
    l_returnflag — the grouped order-statistic shape.  Same mergeable
    value-histogram pattern as the global version: per-batch (flag, value,
    count) combiners shrink the exchange to the value domain x groups
    (control-plane sized: the quantity domain is ~50 values), interpolation
    happens over the merged histogram."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def hist(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")]).rename_columns(
            ["l_returnflag", "val", "cnt"])

    part = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    rows = {"l_returnflag": [], "p50": [], "p90": [], "p99": []}
    for flag, grp in sorted(part.groupby("l_returnflag")):
        vals = grp["val"].to_numpy().astype(np.float64)
        cnts = grp["cnt"].to_numpy().astype(np.int64)
        u, inv = np.unique(vals, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, cnts)
        cum = np.cumsum(tot)
        n = int(cum[-1])
        rows["l_returnflag"].append(flag)
        for name, p in zip(("p50", "p90", "p99"), _PCTS):
            h = (n - 1) * p
            lo_i = int(np.searchsorted(cum, int(np.floor(h)) + 1))
            hi_i = int(np.searchsorted(cum, int(np.floor(h)) + 2))
            lo, hi = float(u[lo_i]), float(u[min(hi_i, len(u) - 1)])
            rows[name].append(_cont_interp(lo, hi, h))
    return ray.data.from_arrow(pa.table({
        "l_returnflag": pa.array(rows["l_returnflag"], type=pa.string()),
        "p50": pa.array(rows["p50"], type=pa.float64()),
        "p90": pa.array(rows["p90"], type=pa.float64()),
        "p99": pa.array(rows["p99"], type=pa.float64()),
    }))


def price_quantiles_by_flag_tdigest(sf_dir: str) -> ray.data.Dataset:
    """(l_returnflag, p50, p90, p99) — GROUPED approximate quantiles over
    an unbounded value domain: per-(batch, key) t-digest centroid rows
    (<= delta rows per key per batch) merge through a grouped heal, so the
    exchange is keys x blocks x delta rows and values never co-locate.
    The grouped companion of ``price_quantiles_tdigest`` — use the exact
    ``quantity_percentiles_by_flag`` only when the value domain is small
    enough for a mergeable histogram."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        flags = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        v = batch.column("l_extendedprice").to_numpy().astype(np.float64)
        order = np.argsort(flags, kind="stable")
        flags, v = flags[order], v[order]
        bnd = np.flatnonzero(flags[1:] != flags[:-1]) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(flags)]
        out_f, out_m, out_w = [], [], []
        for s0, s1 in zip(starts, stops):
            m, w = _tdigest_compress(v[s0:s1], np.ones(s1 - s0))
            out_f.extend([flags[s0]] * len(m))
            out_m.append(m)
            out_w.append(w)
        return pa.table({
            "l_returnflag": pa.array(out_f, type=pa.string()),
            "mean": pa.array(np.concatenate(out_m) if out_m else []),
            "weight": pa.array(np.concatenate(out_w) if out_w else []),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        m, w = _tdigest_compress(
            group.column("mean").to_numpy().astype(np.float64),
            group.column("weight").to_numpy().astype(np.float64))
        return pa.table({
            "l_returnflag": group.column("l_returnflag").slice(0, 1),
            "p50": pa.array([_tdigest_quantile(m, w, 0.5)]),
            "p90": pa.array([_tdigest_quantile(m, w, 0.9)]),
            "p99": pa.array([_tdigest_quantile(m, w, 0.99)]),
        })

    return parts.groupby("l_returnflag").map_groups(heal,
                                                    batch_format="pyarrow")


_EXACT_PCT_BINS = 4096
_EXACT_PCT_COLLECT_CAP = 262_144  # rows the final exact pass may gather


def _exact_percentile_values(ds: ray.data.Dataset, col: str,
                             key_col: str | None, pcts) -> dict:
    """{(key, p): exact PERCENTILE_CONT value} over an unbounded continuous
    domain in fixed memory and a bounded number of scans, optionally per
    key (key_col=None -> one global key ``None``).

    Adaptive histogram refinement (the classic distributed selection
    plan): every unresolved (key, percentile) target keeps its own
    HALF-OPEN candidate interval [lo, hi), and ONE shared pass per round
    histograms all of them simultaneously (per-batch ``np.bincount``
    blobs, one fixed-size binary row per batch, driver-merged like the
    CMS sketch).  Bin membership is ``searchsorted`` against explicit
    float edges and the refined interval is [edges[b_lo], edges[b_hi+1]),
    so interval comparisons and bin indices agree EXACTLY at float
    boundaries.  A target's two bracketing ranks shrink its interval
    4096x per round (1-2 rounds in practice); the final filtered pass
    gathers only the localized slivers for the exact interpolation.
    All-duplicate intervals stop shrinking but also stop mattering: the
    collected values are then one repeated float.  Keys must be
    low-cardinality (state is driver-held per target); high-cardinality
    grouped quantiles are ``price_quantiles_by_flag_tdigest``'s job."""
    from ray.data.aggregate import Count, Max, Min

    if key_col is None:
        stats = ds.aggregate(Count(), Min(col), Max(col))
        rows = [(None, stats["count()"], stats[f"min({col})"],
                 stats[f"max({col})"])] if stats["count()"] else []
    else:
        gb = (ds.groupby(key_col).aggregate(Count(), Min(col), Max(col))
              .to_pandas())
        rows = [(r[key_col], r["count()"], r[f"min({col})"], r[f"max({col})"])
                for _, r in gb.iterrows()]

    state = []
    for key, n, mn, mx in rows:
        n = int(n)
        if n == 0:
            continue
        lo0, hi0 = float(mn), float(np.nextafter(float(mx), np.inf))
        for p in pcts:
            h = (n - 1) * p
            state.append({"key": key, "p": p, "r_lo": int(np.floor(h)),
                          "r_hi": min(int(np.floor(h)) + 1, n - 1),
                          "h": float(h),
                          "lo": lo0, "hi": hi0, "below": 0, "pop": n})

    def key_views(batch: pa.Table):
        """(key, float64 values) per distinct target key present."""
        v = batch.column(col).to_numpy().astype(np.float64)
        if key_col is None:
            yield None, v
            return
        k = np.asarray(batch.column(key_col))
        for key in {s["key"] for s in state}:
            yield key, v[k == key]

    def multi_hist(targets) -> np.ndarray:
        """One pass; merged per-(key, interval) bin counts."""
        edge_sets = [(t["key"], np.linspace(t["lo"], t["hi"],
                                            _EXACT_PCT_BINS + 1))
                     for t in targets]

        def partial(batch: pa.Table) -> pa.Table:
            acc = np.zeros((len(edge_sets), _EXACT_PCT_BINS), dtype=np.int64)
            for key, v in key_views(batch):
                for i, (ek, edges) in enumerate(edge_sets):
                    if ek != key:
                        continue
                    x = v[(v >= edges[0]) & (v < edges[-1])]
                    idx = np.searchsorted(edges, x, side="right") - 1
                    acc[i] = np.bincount(np.clip(idx, 0, _EXACT_PCT_BINS - 1),
                                         minlength=_EXACT_PCT_BINS)
            return pa.table({"h": pa.array([acc.tobytes()],
                                           type=pa.binary())})

        out = np.zeros(len(edge_sets) * _EXACT_PCT_BINS, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for blob in b.column("h").to_pylist():
                out += np.frombuffer(blob, dtype=np.int64)
        return out.reshape(len(edge_sets), _EXACT_PCT_BINS)

    for _ in range(6):
        live = [s for s in state if s["pop"] > _EXACT_PCT_COLLECT_CAP]
        if not live:
            break
        hists = multi_hist(live)
        progress = False
        for s, counts in zip(live, hists):
            edges = np.linspace(s["lo"], s["hi"], _EXACT_PCT_BINS + 1)
            cum = s["below"] + np.cumsum(counts)
            b_lo = int(np.searchsorted(cum, s["r_lo"] + 1))
            b_hi = int(np.searchsorted(cum, s["r_hi"] + 1))
            new_pop = int(counts[b_lo:b_hi + 1].sum())
            if new_pop < s["pop"]:
                progress = True
            s["below"] += int(counts[:b_lo].sum())
            s["pop"] = new_pop
            s["lo"], s["hi"] = float(edges[b_lo]), float(edges[b_hi + 1])
        if not progress:  # all-duplicate interval: cannot shrink further
            break

    ivals = [(s["key"], s["lo"], s["hi"]) for s in state]

    def collect(batch: pa.Table) -> pa.Table:
        tid, vals = [np.empty(0, dtype=np.int64)], [np.empty(0)]
        for key, v in key_views(batch):
            for i, (ik, lo, hi) in enumerate(ivals):
                if ik != key:
                    continue
                x = v[(v >= lo) & (v < hi)]
                tid.append(np.full(len(x), i, dtype=np.int64))
                vals.append(x)
        return pa.table({"tid": pa.array(np.concatenate(tid)),
                         "v": pa.array(np.concatenate(vals))})

    parts = list(ds.map_batches(collect, batch_format="pyarrow")
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    tid = np.concatenate([b.column("tid").to_numpy() for b in parts] or
                         [np.empty(0, dtype=np.int64)])
    vv = np.concatenate([b.column("v").to_numpy() for b in parts] or
                        [np.empty(0)])
    out = {}
    for i, s in enumerate(state):
        vals = np.sort(vv[tid == i])
        v_lo = vals[s["r_lo"] - s["below"]]
        v_hi = vals[s["r_hi"] - s["below"]]
        out[(s["key"], s["p"])] = _cont_interp(v_lo, v_hi, s["h"])
    return out


def price_percentiles_exact(sf_dir: str,
                            pcts=(0.5, 0.9, 0.99)) -> ray.data.Dataset:
    """EXACT PERCENTILE_CONT of l_extendedprice (p50/p90/p99) — the exact
    companion to ``price_quantiles_tdigest`` (one scan, approx) and
    ``quantity_percentiles`` (exact, needs a small value domain).  All the
    machinery lives in ``_exact_percentile_values``."""
    from ..sources.readers import read_table

    from .relational import _round_nd

    ds = read_table(sf_dir, "lineitem", ["l_extendedprice"]).materialize()
    vals = _exact_percentile_values(ds, "l_extendedprice", None, pcts)
    if not vals:
        return ray.data.from_arrow(pa.table(
            {f"p{int(p * 100)}": pa.array([], type=pa.float64())
             for p in pcts}))
    return ray.data.from_arrow(pa.table(
        {f"p{int(p * 100)}": pa.array([_round_nd(vals[(None, p)], 2)])
         for p in pcts}))


def trimmed_mean_price_by_flag(sf_dir: str, lo_p: float = 0.05,
                               hi_p: float = 0.95) -> ray.data.Dataset:
    """(l_returnflag, trimmed_mean) — mean of l_extendedprice per flag with
    the tails OUTSIDE the exact per-key [p5, p95] percentile values trimmed
    off (the robust-mean staple; value-based trim, bounds inclusive).

    Two phases, both streaming: exact per-key percentile bounds via the
    grouped adaptive refinement (``_exact_percentile_values``), then one
    pass of per-batch (flag, sum, count) partials over the in-bounds rows
    into a native partial-agg groupby.  The bounds dict is key-bounded (3
    flags) so it travels in the task closure, not an exchange.

    Safe to SQL-oracle at 2dp despite float interpolation: a CONT
    percentile value either equals a data value exactly (frac=0 or an
    all-duplicate sliver — bit-identical in both engines) or lies strictly
    between two adjacent order statistics, where no data value exists for
    a last-ulp difference to flip across the BETWEEN bound."""
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    from .relational import _round_nd

    ds = read_table(sf_dir, "lineitem",
                    ["l_returnflag", "l_extendedprice"]).materialize()
    vals = _exact_percentile_values(ds, "l_extendedprice", "l_returnflag",
                                    (lo_p, hi_p))
    bounds = {key: (vals[(key, lo_p)], vals[(key, hi_p)])
              for key, _ in vals}

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy().astype(np.float64)
        k = np.asarray(batch.column("l_returnflag"))
        flags, sums, cnts = [], [], []
        for key, (lo, hi) in bounds.items():
            x = v[(k == key) & (v >= lo) & (v <= hi)]
            flags.append(key)
            sums.append(float(x.sum()))
            cnts.append(len(x))
        return pa.table({"l_returnflag": pa.array(flags, type=pa.string()),
                         "s": pa.array(sums, type=pa.float64()),
                         "n": pa.array(cnts, type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag").aggregate(Sum("s"), Sum("n")))

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(s)").to_numpy()
        n = batch.column("sum(n)").to_numpy()
        tm = [_round_nd(float(a) / int(b), 2) for a, b in zip(s, n)]
        return pa.table({"l_returnflag": batch.column("l_returnflag"),
                         "trimmed_mean": pa.array(tm, type=pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def _hist_percentile_cont(u: np.ndarray, tot: np.ndarray, p: float) -> float:
    """PERCENTILE_CONT(p) from a sorted (value, count) histogram."""
    cum = np.cumsum(tot)
    n = int(cum[-1])
    h = (n - 1) * p
    lo_i = int(np.searchsorted(cum, int(np.floor(h)) + 1))
    hi_i = int(np.searchsorted(cum, int(np.floor(h)) + 2))
    lo, hi = float(u[lo_i]), float(u[min(hi_i, len(u) - 1)])
    return _cont_interp(lo, hi, h)


def quantity_mad_by_flag(sf_dir: str) -> ray.data.Dataset:
    """(l_returnflag, med, mad) — grouped MEDIAN and MEDIAN ABSOLUTE
    DEVIATION of l_quantity: the robust-statistics NESTED order statistic
    (median of |x - median(x)|).

    On a bounded value domain both medians fall out of ONE mergeable
    histogram exchange (the ``quantity_percentiles_by_flag`` pattern —
    per-batch (flag, value, count) combiners, value-domain-sized): the
    deviation histogram is a driver-side fold of the value histogram
    around the first median, so the second order statistic costs no
    second scan.  Deviations live on the 0.5 grid (integer values, .5
    medians) — exact in float64, no rounding seam."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def hist(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")]).rename_columns(
            ["l_returnflag", "val", "cnt"])

    part = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    rows = {"l_returnflag": [], "med": [], "mad": []}
    for flag, grp in sorted(part.groupby("l_returnflag")):
        vals = grp["val"].to_numpy().astype(np.float64)
        cnts = grp["cnt"].to_numpy().astype(np.int64)
        u, inv = np.unique(vals, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, cnts)
        med = _hist_percentile_cont(u, tot, 0.5)
        dev = np.abs(u - med)
        du, dinv = np.unique(dev, return_inverse=True)
        dtot = np.zeros(len(du), dtype=np.int64)
        np.add.at(dtot, dinv, tot)
        rows["l_returnflag"].append(flag)
        rows["med"].append(med)
        rows["mad"].append(_hist_percentile_cont(du, dtot, 0.5))
    return ray.data.from_arrow(pa.table({
        "l_returnflag": pa.array(rows["l_returnflag"], type=pa.string()),
        "med": pa.array(rows["med"], type=pa.float64()),
        "mad": pa.array(rows["mad"], type=pa.float64()),
    }))


def user_value_median(sf_dir: str) -> ray.data.Dataset:
    """(user_id, med_value) — EXACT median of events.value per user at
    HIGH key cardinality: the grouped order statistic the mergeable
    histogram (small value domain) and the grouped t-digest (approx)
    both dodge.

    ONE (user_id, value) sort makes every user's values a contiguous
    sorted run, so interior runs reduce to a fully VECTORIZED gather —
    med = v[lo] + 0.5 * (v[hi] - v[lo]) with lo/hi computed from run
    starts/lengths in bulk (the PERCENTILE_CONT formula verbatim, so the
    result is bit-identical to the SQL engine's).  Boundary runs ship
    SUFFICIENT STATISTICS ONLY — one (user, seg_min, seg_max, seg_len)
    row per block edge, O(blocks) total: because the sort's range
    partitioning makes a straddling user's segments value-ordered,
    ordering them by (seg_min, seg_max) reconstructs the global order
    (ties across equal-stat segments are interchangeable by equality),
    so the driver locates the two middle positions from the length sums
    alone and a second pass over the SAME materialized sort fetches just
    those two values per user — a hot user spanning every block costs
    two control-plane rows, never its data."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "value"])
    srt = ds.sort(["user_id", "value"]).materialize()

    def block_medians(batch: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "user_id": pa.array([], type=pa.int64()),
                          "med_value": pa.array([], type=pa.float64()),
                          "vmax": pa.array([], type=pa.float64()),
                          "slen": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy().astype(np.int64)
        v = batch.column("value").to_numpy().astype(np.float64)
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(u)]
        interior = (slice(1, len(starts) - 1) if len(starts) > 1
                    else slice(0, 0))
        ist, isp = starts[interior], stops[interior]
        lens = isp - ist
        lo = v[ist + (lens - 1) // 2]
        hi = v[ist + lens // 2]
        med = 0.5 * lo + 0.5 * hi  # DuckDB two-sided CONT form
        # boundary runs: one stats row each (never their rows)
        er = np.unique(np.r_[0, len(starts) - 1])
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(med), dtype=np.int8),
                                   np.ones(len(er), dtype=np.int8)]),
            "user_id": pa.array(np.r_[u[ist], u[starts[er]]]),
            "med_value": pa.array(np.r_[med, v[starts[er]]]),   # seg_min
            "vmax": pa.array(np.r_[np.zeros(len(med)), v[stops[er] - 1]]),
            "slen": pa.array(np.r_[np.zeros(len(med), dtype=np.int64),
                                   stops[er] - starts[er]]),
        })

    out = (srt.map_batches(block_medians, batch_format="pyarrow",
                           batch_size=None).materialize())
    interior = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["user_id", "med_value"]), batch_format="pyarrow")
    stats = pa.concat_tables(
        [t for t in ray.get(out.map_batches(
            lambda b: b.filter(pc.equal(b.column("kind"), 1)),
            batch_format="pyarrow").to_arrow_refs()) if t.num_rows])

    if stats.num_rows == 0:
        return interior

    # driver plan over O(blocks) stat rows: per straddling user, order
    # segments by (seg_min, seg_max), locate the two middle positions
    su = stats.column("user_id").to_numpy().astype(np.int64)
    smin = stats.column("med_value").to_numpy().astype(np.float64)
    smax = stats.column("vmax").to_numpy().astype(np.float64)
    slen = stats.column("slen").to_numpy().astype(np.int64)
    order = np.lexsort((smax, smin, su))
    su, smin, smax, slen = su[order], smin[order], smax[order], slen[order]
    req: dict = {}   # (user, seg_min, seg_max, seg_len) -> [(slot, local_idx)]
    ustarts = np.r_[np.flatnonzero(np.r_[True, np.diff(su) != 0]), len(su)]
    for a, b in zip(ustarts[:-1], ustarts[1:]):
        n = int(slen[a:b].sum())
        user = int(su[a])
        cum = 0
        for kth, slot in (((n - 1) // 2, 0), (n // 2, 1)):
            cum = 0
            for i in range(a, b):
                if kth < cum + slen[i]:
                    key = (user, float(smin[i]), float(smax[i]), int(slen[i]))
                    req.setdefault(key, []).append((slot, int(kth - cum)))
                    break
                cum += int(slen[i])
    req_ref = ray.put(req)

    def fetch(batch: pa.Table, rref) -> pa.Table:
        rq = ray.get(rref) if isinstance(rref, ray.ObjectRef) else rref
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "slot": pa.array([], type=pa.int64()),
                          "val": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy().astype(np.int64)
        v = batch.column("value").to_numpy().astype(np.float64)
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(u)]
        users, slots, vals = [], [], []
        for r in np.unique(np.r_[0, len(starts) - 1]):
            s_, e_ = int(starts[r]), int(stops[r])
            key = (int(u[s_]), float(v[s_]), float(v[e_ - 1]), e_ - s_)
            for slot, li in rq.get(key, ()):
                users.append(int(u[s_]))
                slots.append(slot)
                vals.append(float(v[s_ + li]))
        return pa.table({"user_id": pa.array(users, type=pa.int64()),
                         "slot": pa.array(slots, type=pa.int64()),
                         "val": pa.array(vals, type=pa.float64())})

    fetched = pa.concat_tables(
        [t for t in ray.get(srt.map_batches(
            fetch, batch_format="pyarrow", batch_size=None,
            fn_args=(req_ref,)).to_arrow_refs()) if t.num_rows])
    fu = fetched.column("user_id").to_numpy().astype(np.int64)
    fs = fetched.column("slot").to_numpy().astype(np.int64)
    fv = fetched.column("val").to_numpy().astype(np.float64)
    # equal-stat segment collisions emit duplicates with EQUAL values —
    # keep the first per (user, slot)
    _, first = np.unique(fu * 2 + fs, return_index=True)
    fu, fs, fv = fu[first], fs[first], fv[first]
    o2 = np.lexsort((fs, fu))
    fu, fs, fv = fu[o2], fs[o2], fv[o2]
    lo, hi = fv[0::2], fv[1::2]
    healed = pa.table({
        "user_id": pa.array(fu[0::2], type=pa.int64()),
        "med_value": pa.array(0.5 * lo + 0.5 * hi, type=pa.float64())})
    return interior.union(ray.data.from_arrow(healed))


def weighted_median_price(sf_dir: str) -> ray.data.Dataset:
    """(wmedian,) — quantity-WEIGHTED lower median of l_extendedprice: the
    smallest price v whose cumulative weight reaches half the total (the
    weighted order statistic — token-weighted medians in corpus curation
    are this exact shape).

    Same adaptive interval refinement as ``_exact_percentile_values`` but
    the histogram accumulates WEIGHTS (``np.bincount(..., weights=w)``)
    and the target is the W/2 weight rank, not a row rank; the final
    sliver gathers (value, weight) rows and the crossing value falls out
    of one sorted cumsum.  Output is an actual data value, so the SQL
    compare is exact with no rounding seam."""
    from ray.data.aggregate import Max, Min, Sum

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem",
                    ["l_extendedprice", "l_quantity"]).materialize()
    stats = ds.aggregate(Sum("l_quantity"), Min("l_extendedprice"),
                         Max("l_extendedprice"))
    tot = float(stats["sum(l_quantity)"] or 0.0)
    if tot == 0.0:
        return ray.data.from_arrow(pa.table(
            {"wmedian": pa.array([], type=pa.float64())}))
    target = tot / 2.0
    lo = float(stats["min(l_extendedprice)"])
    hi = float(np.nextafter(stats["max(l_extendedprice)"], np.inf))
    below_w = 0.0

    def whist(lo_: float, hi_: float) -> np.ndarray:
        edges = np.linspace(lo_, hi_, _EXACT_PCT_BINS + 1)

        def partial(batch: pa.Table) -> pa.Table:
            v = batch.column("l_extendedprice").to_numpy().astype(np.float64)
            w = batch.column("l_quantity").to_numpy().astype(np.float64)
            sel = (v >= edges[0]) & (v < edges[-1])
            idx = np.searchsorted(edges, v[sel], side="right") - 1
            acc = np.bincount(np.clip(idx, 0, _EXACT_PCT_BINS - 1),
                              weights=w[sel], minlength=_EXACT_PCT_BINS)
            return pa.table({"h": pa.array([acc.tobytes()],
                                           type=pa.binary())})

        out = np.zeros(_EXACT_PCT_BINS)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for blob in b.column("h").to_pylist():
                out += np.frombuffer(blob, dtype=np.float64)
        return out

    pop = tot
    for _ in range(6):
        if pop <= float(_EXACT_PCT_COLLECT_CAP):
            break
        counts = whist(lo, hi)
        edges = np.linspace(lo, hi, _EXACT_PCT_BINS + 1)
        cum = below_w + np.cumsum(counts)
        b_i = int(np.searchsorted(cum, target))  # first bin with cum >= target
        new_pop = float(counts[b_i])
        if new_pop >= pop:  # all-duplicate interval
            break
        below_w += float(counts[:b_i].sum())
        pop = new_pop
        lo, hi = float(edges[b_i]), float(edges[b_i + 1])

    lo_f, hi_f = lo, hi

    def collect(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy().astype(np.float64)
        w = batch.column("l_quantity").to_numpy().astype(np.float64)
        sel = (v >= lo_f) & (v < hi_f)
        return pa.table({"v": pa.array(v[sel]), "w": pa.array(w[sel])})

    parts = list(ds.map_batches(collect, batch_format="pyarrow")
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    vv = np.concatenate([b.column("v").to_numpy() for b in parts] or
                        [np.empty(0)])
    ww = np.concatenate([b.column("w").to_numpy() for b in parts] or
                        [np.empty(0)])
    order = np.argsort(vv, kind="stable")
    cw = below_w + np.cumsum(ww[order])
    k = int(np.searchsorted(cw, target))
    return ray.data.from_arrow(pa.table(
        {"wmedian": pa.array([float(vv[order][min(k, len(cw) - 1)])],
                             type=pa.float64())}))


def user_activity_skew(sf_dir: str) -> ray.data.Dataset:
    """(n_users, max_events, p50, p99) — the key-skew diagnostic over the
    per-user event-count distribution (the report that tells you whether
    a keyed exchange will hot-spot BEFORE you run it).

    Two composed exchanges, both scale-shaped: one native partial-agg
    Count groupby builds the per-user counts DATASET, then the exact
    unbounded-domain percentile core (``_exact_percentile_values``) runs
    over that derived dataset — the counts never land on the driver, so
    the report works at any key cardinality."""
    from ray.data.aggregate import Count, Max

    from ..sources.readers import read_table

    from .relational import _round_nd

    ds = read_table(sf_dir, "events", ["user_id"])
    counts = (ds.groupby("user_id").aggregate(Count())
              .map_batches(lambda b: pa.table(
                  {"n": b.column("count()").cast(pa.float64())}),
                  batch_format="pyarrow").materialize())
    stats = counts.aggregate(Count(), Max("n"))
    n_users = int(stats["count()"] or 0)
    if n_users == 0:
        return ray.data.from_arrow(pa.table(
            {"n_users": pa.array([0], type=pa.int64()),
             "max_events": pa.array([0], type=pa.int64()),
             "p50": pa.array([0.0]), "p99": pa.array([0.0])}))
    vals = _exact_percentile_values(counts, "n", None, (0.5, 0.99))
    return ray.data.from_arrow(pa.table({
        "n_users": pa.array([n_users], type=pa.int64()),
        "max_events": pa.array([int(stats["max(n)"])], type=pa.int64()),
        "p50": pa.array([_round_nd(vals[(None, 0.5)], 2)]),
        "p99": pa.array([_round_nd(vals[(None, 0.99)], 2)]),
    }))


def user_rfm_segments(sf_dir: str) -> ray.data.Dataset:
    """(r_seg, f_seg, m_seg, n_users) — RFM quartile segmentation, the
    classic user-value report: per-user Recency (last-event epoch second),
    Frequency (event count) and Monetary (value summed in CENTS), each cut
    at its own global quartiles into segments 1..4, then counted per
    (r, f, m) cell (<= 64 rows out).

    Every metric is an INTEGER (cents via DuckDB-faithful half-away
    rounding per event, seconds via floor-div — max and // commute, so
    max(ts)//1e6 == max(ts//1e6)), which kills the float-summation-order
    seam between engines; quartile thresholds come from the shared
    percentile core (bit-faithful two-sided interpolation), and
    value-vs-threshold bucketing (not positional NTILE) keeps ties
    deterministic.

    Plan: ONE user-sorted exchange; blocks reduce interior user-runs
    vectorized (reduceat) and ship first/last-run partials as sufficient
    statistics (f sums, m sums, r maxes) to a grouped heal — O(blocks)
    heal rows.  The quartile refinement then runs over the per-user
    Dataset (never the driver), and cell counting is a block-local
    64-bin bincount with a driver merge of O(blocks) scalar rows."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "events", ["user_id", "ts", "value"])
    cols = ["user_id", "f", "m", "r"]
    empty = pa.table({"kind": pa.array([], type=pa.int8()),
                      "user_id": pa.array([], type=pa.int64()),
                      "f": pa.array([], type=pa.int64()),
                      "m": pa.array([], type=pa.int64()),
                      "r": pa.array([], type=pa.int64())})

    def block_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        u = b.column("user_id").to_numpy().astype(np.int64)
        ts = b.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        v = b.column("value").to_numpy().astype(np.float64)
        x = v * 100
        cents = np.where(x >= 0, np.floor(x + 0.5),
                         -np.floor(-x + 0.5)).astype(np.int64)
        sec = ts // 1_000_000
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(u)]
        n_runs = len(starts)
        f = stops - starts
        m = np.add.reduceat(cents, starts)
        r = np.maximum.reduceat(sec, starts)
        interior = np.arange(1, n_runs - 1) if n_runs > 1 else np.empty(
            0, dtype=np.int64)
        edge = np.unique(np.r_[0, n_runs - 1])
        kind = np.r_[np.zeros(len(interior), dtype=np.int8),
                     np.ones(len(edge), dtype=np.int8)]
        sel = np.r_[interior, edge]
        return pa.table({"kind": pa.array(kind),
                         "user_id": pa.array(u[starts[sel]]),
                         "f": pa.array(f[sel].astype(np.int64)),
                         "m": pa.array(m[sel]),
                         "r": pa.array(r[sel])})

    from .dedup import _split_kinds

    out = (ds.sort("user_id")
           .map_batches(block_partials, batch_format="pyarrow",
                        batch_size=None))
    interior, edges = _split_kinds(out, cols, cols)

    def heal(group: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "f": pa.array([int(pc.sum(group.column("f")).as_py())],
                          type=pa.int64()),
            "m": pa.array([int(pc.sum(group.column("m")).as_py())],
                          type=pa.int64()),
            "r": pa.array([int(pc.max(group.column("r")).as_py())],
                          type=pa.int64())})

    healed = edges.groupby("user_id").map_groups(heal, batch_format="pyarrow")
    agg = interior.union(healed).materialize()
    if agg.count() == 0:
        return ray.data.from_arrow(pa.table({
            "r_seg": pa.array([], type=pa.int64()),
            "f_seg": pa.array([], type=pa.int64()),
            "m_seg": pa.array([], type=pa.int64()),
            "n_users": pa.array([], type=pa.int64())}))
    thr = {}
    for c in ("r", "f", "m"):
        vals = _exact_percentile_values(agg, c, None, (0.25, 0.5, 0.75))
        thr[c] = np.array([vals[(None, 0.25)], vals[(None, 0.5)],
                           vals[(None, 0.75)]])

    def cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"cell": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        segs = {}
        for c in ("r", "f", "m"):
            v = b.column(c).to_numpy().astype(np.float64)
            segs[c] = ((v[:, None] > thr[c][None, :]).sum(axis=1)
                       .astype(np.int64))
        cell = segs["r"] * 16 + segs["f"] * 4 + segs["m"]
        cnt = np.bincount(cell, minlength=64).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz])})

    parts = pa.concat_tables(
        [t for t in (ray.get(ref) for ref in
                     agg.map_batches(cells, batch_format="pyarrow")
                     .to_arrow_refs()) if t.num_rows])
    tot = np.zeros(64, dtype=np.int64)
    np.add.at(tot, parts.column("cell").to_numpy(), parts.column("n").to_numpy())
    nz = np.flatnonzero(tot)
    return ray.data.from_arrow(pa.table({
        "r_seg": pa.array(nz // 16 + 1),
        "f_seg": pa.array((nz // 4) % 4 + 1),
        "m_seg": pa.array(nz % 4 + 1),
        "n_users": pa.array(tot[nz])}))
