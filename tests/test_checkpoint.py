"""Resumable partitioned output: interrupted run -> resume skips complete
shards; final output equals golden."""

import json
import os

import pyarrow.parquet as pq

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.state.checkpoint import is_shard_complete, manifest_path, run_resumable
from paddleocr_json_ray.synth.corpus import build_corpus


def test_resume_skips_complete_shards(ray_session, sf0001_dir, tmp_path):
    out = str(tmp_path / "out")
    cfg = PipelineConfig()
    s1 = run_resumable(sf0001_dir, out, cfg, n_shards=4)
    assert s1["skipped"] == [] and len(s1["ran"]) >= 2

    # corrupt one shard: drop its manifest -> that shard alone must rerun
    victim = s1["ran"][1]
    os.remove(manifest_path(out, victim))
    s2 = run_resumable(sf0001_dir, out, cfg, n_shards=4)
    assert s2["ran"] == [victim]
    assert sorted(s2["skipped"] + s2["ran"]) == sorted(s1["ran"])

    # manifests carry lineage
    with open(manifest_path(out, victim), encoding="utf-8") as fh:
        m = json.load(fh)
    assert m["complete"] and m["input_files"] and m["n_docs"] > 0 and m["config_digest"]

    # full output equals golden doc set with equal span sequences
    paths = build_corpus(sf0001_dir, cfg)
    golden = pq.read_table(paths.golden_parquet)
    written = pq.read_table(out)
    assert written.num_rows == golden.num_rows
    g = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
         for r in golden.to_pylist()}
    w = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
         for r in written.to_pylist()}
    assert g == w


def test_config_change_invalidates(ray_session, sf0001_dir, tmp_path):
    out = str(tmp_path / "out2")
    run_resumable(sf0001_dir, out, PipelineConfig(), n_shards=2)
    # different parser -> different digest -> shards not considered complete
    other = PipelineConfig(parser="single_line")
    from paddleocr_json_ray.state.checkpoint import _config_digest

    assert not is_shard_complete(out, 0, _config_digest(other))


def test_shard_count_change_invalidates(ray_session, sf0001_dir, tmp_path):
    """Re-running with a different --shards value must not skip stale shards
    or leave orphaned shard dirs."""
    import pyarrow.parquet as pq2

    out = str(tmp_path / "out3")
    cfg = PipelineConfig()
    run_resumable(sf0001_dir, out, cfg, n_shards=6)
    s2 = run_resumable(sf0001_dir, out, cfg, n_shards=2)
    assert s2["skipped"] == [] and sorted(s2["ran"]) == [0, 1]
    assert sorted(os.listdir(out)) == ["shard=0000", "shard=0001"]
    assert pq2.read_table(out).num_rows == 500  # no duplicated docs


def test_memwatch():
    from paddleocr_json_ray.state.memwatch import MemoryWatchdog, rss_mb

    assert rss_mb() > 10  # this process certainly uses >10MB
    wd = MemoryWatchdog(limit_mb=1)   # absurdly low -> always trims
    assert wd.maybe_trim() is True and wd.trims == 1
    wd2 = MemoryWatchdog(limit_mb=10**6)  # absurdly high -> never trims
    assert wd2.maybe_trim() is False and wd2.peak_mb > 0


def test_compact_parquet_preserves_content(ray_session, tmp_path):
    """Compaction of 40 tiny files into ~1 target file: identical rows
    (sorted compare), fewer files, and a refusal to append into a non-empty
    output dir (the write_parquet append footgun)."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from paddleocr_json_ray.state.compact import compact_parquet

    src = tmp_path / "tiny"
    src.mkdir()
    rng = np.random.default_rng(3)
    all_ids = []
    for i in range(40):
        ids = (np.arange(25) + i * 25).tolist()
        all_ids += ids
        pq.write_table(pa.table({
            "id": pa.array(ids, type=pa.int64()),
            "v": pa.array(rng.integers(0, 1000, 25), type=pa.int64()),
        }), str(src / f"part-{i:03d}.parquet"))
    out = tmp_path / "compacted"
    s = compact_parquet(str(src), str(out), target_mb=64)
    assert s["files_in"] == 40 and s["n_rows"] == 1000
    assert s["files_out"] < 40
    a = pq.read_table(str(src)).sort_by("id")
    b = pq.read_table(str(out)).sort_by("id")
    assert a.equals(b)
    with pytest.raises(ValueError, match="append"):
        compact_parquet(str(src), str(out))
