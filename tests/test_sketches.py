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
