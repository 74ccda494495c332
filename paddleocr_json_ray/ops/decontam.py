"""Benchmark decontamination — flag training documents that share long
token n-grams with an evaluation/benchmark set (the standard pre-training
hygiene pass: see Brown et al. 2020 §C "measuring and preventing memorization
of benchmarks"; 8-gram overlap is the common criterion).

The benchmark here is a deterministic pseudo-set — ``doc_id % 13 == 0`` —
so the op is self-contained over the ``documents`` table (no external data)
and SQL-oracle-checkable.  Two implementations:

  * ``decontaminate`` — EXACT: the benchmark gram-hash set is built
    distributed (per-batch distinct partials), gathered once (it is the
    SMALL side: grams of the benchmark slice only), broadcast via
    ``ray.put`` as one sorted uint64 array, and probed with a vectorized
    ``searchsorted`` per scoring batch.  Partitioning assumption: the
    benchmark gram set fits the object store (8 bytes/gram); a 1M-doc
    benchmark at ~200 grams/doc is ~1.6 GB — beyond that, switch to the
    Bloom variant below (fixed memory) or shard the gram set and join.
  * ``bloom_decontaminate`` — APPROXIMATE, fixed-memory scale path: a
    Bloom filter (m bits, 4 probes derived from the 64-bit gram hash) is
    built as per-batch bitmaps OR-merged driver-side (m/8 bytes per batch,
    bounded; at cluster scale the OR is a tree reduce over object refs).
    One-sided error: hit counts are never UNDER-counted (no false
    negatives), so filtering on the bloom never lets contamination through
    — the classic sketch trade.

Per document: ``n_grams`` 8-gram positions, ``n_hit`` positions whose gram
occurs anywhere in the benchmark set, ``contam_milli`` = n_hit*1000//n_grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.textstats import token_gram_hashes

N_GRAM = 8
BENCH_MOD = 13  # pseudo-benchmark membership: doc_id % BENCH_MOD == 0


def _read_documents(sf_dir: str) -> ray.data.Dataset:
    from ..sources.readers import read_table

    return read_table(sf_dir, "documents", ("doc_id", "text"))


def _bench_gram_partials(batch: pa.Table) -> pa.Table:
    """Per-batch DISTINCT gram hashes of the benchmark slice (combiner)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    hs = [token_gram_hashes(t, N_GRAM)
          for i, t in zip(ids, texts) if i % BENCH_MOD == 0]
    u = np.unique(np.concatenate(hs)) if hs else np.empty(0, dtype=np.uint64)
    return pa.table({"g": pa.array(u.astype(np.int64), type=pa.int64())})


def _bench_gram_set(sf_dir: str) -> np.ndarray:
    """Sorted uint64 gram-hash array of the benchmark slice, built
    distributed and gathered once (small side)."""
    parts = (_read_documents(sf_dir)
             .map_batches(_bench_gram_partials, batch_format="pyarrow")
             .materialize())
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(
        [t.column("g").to_numpy().astype(np.uint64) for t in tabs]))


def _score_table(batch: pa.Table, hits_fn) -> pa.Table:
    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    n_grams = np.empty(len(texts), dtype=np.int64)
    n_hit = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        g = token_gram_hashes(t, N_GRAM)
        n_grams[i] = len(g)
        n_hit[i] = hits_fn(g) if len(g) else 0
    milli = np.where(n_grams > 0, n_hit * 1000 // np.maximum(n_grams, 1), 0)
    return pa.table({
        "doc_id": ids,
        "n_grams": pa.array(n_grams, type=pa.int64()),
        "n_hit": pa.array(n_hit, type=pa.int64()),
        "contam_milli": pa.array(milli, type=pa.int64()),
    })


def decontaminate(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_grams, n_hit, contam_milli) — exact 8-gram overlap of
    every document against the benchmark slice (broadcast sorted-set
    membership; one searchsorted per scoring batch)."""
    bench = _bench_gram_set(sf_dir)
    bench_ref = ray.put(bench)

    def score(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)

        def hits(g: np.ndarray) -> int:
            if not len(b):
                return 0
            pos = np.minimum(np.searchsorted(b, g), len(b) - 1)
            return int((b[pos] == g).sum())

        return _score_table(batch, hits)

    return _read_documents(sf_dir).map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------- bloom path
_BLOOM_BITS = 1 << 22          # 4 Mbit = 512 KiB bitmap
_BLOOM_PROBES = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
                 np.uint64(0x165667B19E3779F9), np.uint64(0x27D4EB2F165667C5))


def _bloom_positions(g: np.ndarray) -> np.ndarray:
    """(len(g), 4) bit positions for each gram hash."""
    with np.errstate(over="ignore"):
        cols = [((g * k) >> np.uint64(64 - 22)).astype(np.int64)
                for k in _BLOOM_PROBES]
    return np.stack(cols, axis=1)


def build_bloom(sf_dir: str) -> np.ndarray:
    """uint8[m/8] Bloom bitmap over the benchmark slice's gram hashes:
    per-batch bitmaps (the mergeable partial) OR-merged once."""
    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        t = _bench_gram_partials(batch)
        g = t.column("g").to_numpy().astype(np.uint64)
        if len(g):
            pos = _bloom_positions(g).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bitmap": pa.array([bits.tobytes()], type=pa.binary())})

    parts = (_read_documents(sf_dir)
             .map_batches(partial, batch_format="pyarrow")
             .materialize())
    bitmap = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for t in ray.get(parts.to_arrow_refs()):
        for buf in t.column("bitmap").to_pylist():
            bitmap |= np.frombuffer(buf, dtype=np.uint8)
    return bitmap


def bloom_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_grams, n_hit, contam_milli) — Bloom-approximate overlap:
    n_hit >= the exact count per document (never under), memory fixed at
    m/8 bytes however large the benchmark grows."""
    bitmap_ref = ray.put(build_bloom(sf_dir))

    def score(batch: pa.Table) -> pa.Table:
        bits = ray.get(bitmap_ref)

        def hits(g: np.ndarray) -> int:
            pos = _bloom_positions(g)
            present = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            return int(present.all(axis=1).sum())

        return _score_table(batch, hits)

    return _read_documents(sf_dir).map_batches(score, batch_format="pyarrow")
