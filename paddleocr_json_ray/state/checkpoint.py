"""Resumable partitioned output with per-partition lineage manifests.

The resume unit is an INPUT SHARD (a group of input parquet fragments): each
shard runs the full streaming pipeline over its fragments and lands in its
own output directory with a ``_MANIFEST.json`` recording lineage (input
files, row counts, wall time, config digest).  A restarted job skips every
shard whose manifest is complete — the reference has no checkpointing at all
(stateless server, SURVEY.md §4), this is the scale-out addition the north
rule requires.

The manifest is written only after the shard's data files are fully written
(tmp + rename), so a crash mid-shard leaves no manifest and the shard reruns
cleanly (output files are overwritten by the rerun).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict

import ray.data

from ..config import PipelineConfig


def _config_digest(cfg: PipelineConfig) -> str:
    return hashlib.sha256(json.dumps(asdict(cfg), sort_keys=True, default=str).encode()).hexdigest()[:16]


def _shard_files(input_files: list[str], n_shards: int) -> list[list[str]]:
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(sorted(input_files)):
        shards[i % n_shards].append(f)
    return [s for s in shards if s]


def manifest_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(out_dir, f"shard={shard_id:04d}", "_MANIFEST.json")


def is_shard_complete(out_dir: str, shard_id: int, cfg_digest: str,
                      expected_files: list[str] | None = None) -> bool:
    """A shard counts as done only if its manifest is complete, was produced
    under the same config digest AND covered exactly the same input files —
    re-running with a different --shards value must not silently skip data
    (the shard->file assignment changes with the shard count)."""
    p = manifest_path(out_dir, shard_id)
    if not os.path.exists(p):
        return False
    try:
        with open(p, encoding="utf-8") as fh:
            m = json.load(fh)
        if m.get("complete") is not True or m.get("config_digest") != cfg_digest:
            return False
        if expected_files is not None and sorted(m.get("input_files", [])) != sorted(expected_files):
            return False
        return True
    except (OSError, json.JSONDecodeError):
        return False


def run_resumable(sf_dir: str, out_dir: str, cfg: PipelineConfig | None = None,
                  n_shards: int = 16) -> dict:
    """Run the extraction pipeline shard-by-shard, skipping complete shards.

    Returns a summary {ran: [...], skipped: [...], n_docs, wall_s}."""
    from ..pipelines.ocr import build_pipeline
    from ..synth.corpus import build_corpus

    cfg = (cfg or PipelineConfig()).validated()
    digest = _config_digest(cfg)
    paths = build_corpus(sf_dir, cfg)
    files = [os.path.join(paths.interleaved_dir, f)
             for f in os.listdir(paths.interleaved_dir) if f.endswith(".parquet")]
    shards = _shard_files(files, n_shards)
    pipe = build_pipeline(cfg, paths.dict_path)

    ran, skipped = [], []
    total_docs = 0
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    # shards from a previous run with a different --shards value would leave
    # stale data beyond the current layout — remove them so readers of
    # out_dir never see duplicated/orphaned documents
    import shutil

    for entry in os.listdir(out_dir):
        if entry.startswith("shard="):
            try:
                sid = int(entry.split("=", 1)[1])
            except ValueError:
                continue
            if sid >= len(shards):
                shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    for sid, shard in enumerate(shards):
        if is_shard_complete(out_dir, sid, digest, expected_files=shard):
            skipped.append(sid)
            continue
        shard_dir = os.path.join(out_dir, f"shard={sid:04d}")
        os.makedirs(shard_dir, exist_ok=True)
        # a rerun after a crash must not append to half-written output:
        # clear stale data files first (write_parquet generates fresh names)
        for f in os.listdir(shard_dir):
            if f.endswith(".parquet"):
                os.remove(os.path.join(shard_dir, f))
        t_shard = time.time()
        ds = ray.data.read_parquet(shard)
        out = pipe(ds)
        out.write_parquet(shard_dir)
        # count written rows from parquet metadata (cheap footer read)
        import pyarrow.parquet as pq

        n_docs = 0
        n_bytes = 0
        out_files = []
        for f in os.listdir(shard_dir):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(shard_dir, f)
            n_docs += pq.ParquetFile(fp).metadata.num_rows
            n_bytes += os.path.getsize(fp)
            out_files.append(f)
        wall_shard = time.time() - t_shard
        manifest = {
            "shard_id": sid,
            "input_files": shard,
            "output_files": sorted(out_files),
            "n_docs": n_docs,
            "output_bytes": n_bytes,
            "wall_s": round(wall_shard, 3),
            "docs_per_sec": round(n_docs / wall_shard, 2) if wall_shard > 0 else None,
            "config_digest": digest,
            "complete": True,
            "engine_version": "0.1.0",
        }
        tmp = manifest_path(out_dir, sid) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, manifest_path(out_dir, sid))
        ran.append(sid)
        total_docs += n_docs
    return {"ran": ran, "skipped": skipped, "n_docs_written": total_docs,
            "wall_s": round(time.time() - t0, 3), "n_shards": len(shards),
            "out_dir": out_dir}
