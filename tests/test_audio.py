"""WAV codec round-trips and DSP feature correctness on known signals."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.functions.audiocodecs import decode_wav, encode_wav
from paddleocr_json_ray.ops import multimodal


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    pcm, sr = decode_wav(encode_wav(mono, 8000))
    assert sr == 8000 and pcm.shape == (777, 1)
    assert np.array_equal(pcm[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(400, 2), dtype=np.int16)
    pcm2, sr2 = decode_wav(encode_wav(stereo, 44100))
    assert sr2 == 44100 and np.array_equal(pcm2, stereo)


def test_wav_float_scaling_and_extra_chunks():
    x = np.array([0.0, 1.0, -1.0, 0.5])
    pcm, _ = decode_wav(encode_wav(x, 16000))
    assert pcm[:, 0].tolist() == [0, 32767, -32767, 16384]
    # a LIST chunk between fmt and data must be skipped, not fatal
    raw = encode_wav(x, 16000)
    import struct
    head, rest = raw[:12], raw[12:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = head[:4] + struct.pack("<I", len(rest) + len(extra) + 4) \
        + head[8:] + extra + rest
    pcm2, _ = decode_wav(patched)
    assert np.array_equal(pcm, pcm2)


def test_wav_error_paths():
    with pytest.raises(ValueError):
        decode_wav(b"nope")
    # non-PCM format code -> the codec-lib seam
    raw = bytearray(encode_wav(np.zeros(4), 16000))
    raw[20] = 3  # audio_format = IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))


def test_features_pure_tone():
    """440 Hz sine: centroid ~= 440, ZCR ~= 2*f/sr, RMS ~= A/sqrt(2)."""
    sr = multimodal._AUDIO_SR
    t = np.arange(sr // 2) / sr
    wav = encode_wav(0.8 * np.sin(2 * np.pi * 440.0 * t), sr)
    stage = multimodal.AudioFeatureStage()
    sr_, n, dur, rms, zcr, cent = stage._features(wav)
    assert sr_ == sr and n == sr // 2 and dur == 500
    assert rms == pytest.approx(0.8 / np.sqrt(2) * 1000, abs=15)
    assert zcr == pytest.approx(2 * 440 / sr * 1000, abs=5)
    assert cent == pytest.approx(440, abs=15)


def test_audio_features_e2e(ray_session, tmp_path):
    """Clip generation -> actor-pool decode+features over a documents table:
    deterministic outputs, all rows ok, every clip keyed to its doc."""
    n = 40
    pq.write_table(pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                             "text": pa.array(["x"] * n)}),
                   os.path.join(str(tmp_path), "documents.parquet"))
    got = (multimodal.audio_features(str(tmp_path), concurrency=2)
           .to_pandas().sort_values("clip_id").reset_index(drop=True))
    assert len(got) == n and got["ok"].all()
    assert set(got["clip_id"]) == set(range(n))
    assert (got["sample_rate"] == multimodal._AUDIO_SR).all()
    assert got["duration_ms"].between(200, 600).all()
    assert (got["centroid_hz"] > 50).all()
    again = (multimodal.audio_features(str(tmp_path), concurrency=2)
             .to_pandas().sort_values("clip_id").reset_index(drop=True))
    assert got.equals(again)


def test_hll_grouped_matches_exact(ray_session, tmp_path):
    """Grouped HLL within 5% of the exact per-key distinct counts."""
    from paddleocr_json_ray.ops import sketches

    rng = np.random.default_rng(13)
    n = 60_000
    types = rng.choice(["a", "b", "c"], size=n, p=[0.7, 0.2, 0.1])
    # distinct cardinality differs per key by construction
    users = np.where(types == "a", rng.integers(0, 20_000, size=n),
                     np.where(types == "b", rng.integers(0, 900, size=n),
                              rng.integers(0, 40, size=n)))
    base = 1_600_000_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(users, type=pa.int64()),
        "ts": pa.array([base] * n, type=pa.timestamp("us")),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n)),
    }), os.path.join(str(tmp_path), "events.parquet"))
    got = (sketches.hll_distinct_users_by_type(str(tmp_path))
           .to_pandas().set_index("event_type")["n_users_approx"])
    for t in ("a", "b", "c"):
        exact = len(np.unique(users[types == t]))
        assert abs(got.loc[t] - exact) / exact < 0.05


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(n=st.integers(1, 2000), ch=st.integers(1, 2),
       sr=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31))
def test_wav_roundtrip_property(n, ch, sr, seed):
    """Any PCM16 payload survives encode->decode bit-exactly."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    out, sr2 = decode_wav(encode_wav(pcm, sr))
    assert sr2 == sr and np.array_equal(out, pcm)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31), chunks=st.integers(1, 12),
       dist=st.sampled_from(["lognormal", "uniform", "bimodal"]))
def test_tdigest_merge_rank_error_property(seed, chunks, dist):
    """Split-compress-merge keeps every checked quantile within the rank
    budget, for any chunking and several distribution shapes."""
    from paddleocr_json_ray.ops import sketches

    rng = np.random.default_rng(seed)
    n = 20_000
    if dist == "lognormal":
        v = rng.lognormal(2.0, 1.0, size=n)
    elif dist == "uniform":
        v = rng.uniform(-50, 50, size=n)
    else:
        v = np.concatenate([rng.normal(-100, 3, n // 2), rng.normal(80, 15, n - n // 2)])
    parts = [sketches._tdigest_compress(c, np.ones(len(c)))
             for c in np.array_split(v, chunks)]
    m, w = sketches._tdigest_compress(np.concatenate([p[0] for p in parts]),
                                      np.concatenate([p[1] for p in parts]))
    assert w.sum() == pytest.approx(n)
    sv = np.sort(v)
    for p in (0.1, 0.5, 0.9, 0.99):
        est = sketches._tdigest_quantile(m, w, p)
        rank = np.searchsorted(sv, est) / n
        assert abs(rank - p) < 0.02
