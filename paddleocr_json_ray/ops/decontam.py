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


def _verify_cross_run(docs: np.ndarray, sigs: np.ndarray, cap: int,
                      threshold: float):
    """One complete bucket run, CROSS-SIDE only: signature agreement
    between benchmark docs (doc_id % BENCH_MOD == 0) and training docs."""
    uniq, first = np.unique(docs, return_index=True)
    if not (2 <= len(uniq) <= cap):
        return None
    bench = uniq % BENCH_MOD == 0
    nb, nt = int(bench.sum()), int((~bench).sum())
    if nb == 0 or nt == 0:
        return None
    sm = sigs[first]
    sb, st = sm[bench], sm[~bench]
    # (train, bench) agreement matrix — bucket-capped, so nb*nt is bounded
    est = (st[:, None, :] == sb[None, :, :]).mean(axis=2)
    ti, bi = np.nonzero(est >= threshold)
    if len(ti) == 0:
        return None
    return uniq[~bench][ti], uniq[bench][bi], est[ti, bi]


def fuzzy_decontaminate(sf_dir: str,
                        threshold: float = 0.7) -> ray.data.Dataset:
    """(doc_id, bench_id, est_jaccard) — NEAR-DUP decontamination: training
    documents whose MinHash signature agreement with any benchmark document
    reaches ``threshold`` (the fuzzy companion to the exact 8-gram
    ``decontaminate`` — paraphrased or lightly-edited benchmark leakage
    that exact grams miss; C4/Dolma-style hygiene).

    Same single-pass banded-LSH exchange as ``dedup_minhash`` — each doc's
    64-lane signature travels with its 16 band rows through ONE keyed
    sort — but run verification pairs only ACROSS the benchmark/train
    split, so candidate volume is the cross product within a capped
    bucket, not all pairs.  Boundary runs heal in a grouped stage; pairs
    surfacing from several bands collapse in a native distinct groupby.
    Rows-only (LSH has no SQL form); pinned by a planted-paraphrase
    pytest."""
    from .dedup import (_BUCKET_CAP, _band_hashes, _batch_signatures,
                        _distinct_pairs, _perm_params, _sig_fingerprints,
                        _sig_matrix, _split_kinds, _SIG_BYTES, _BANDS)

    ds = _read_documents(sf_dir)
    a_ref, b_ref = _perm_params()

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        sigs = _batch_signatures(batch.column("text").to_pylist(),
                                 a_ref, b_ref)
        bh = _band_hashes(sigs)
        # 1-byte lane fingerprints, not raw uint64 lanes: the sig column
        # dominates the sort payload (see dedup._sig_fingerprints)
        fps = _sig_fingerprints(sigs)
        sig_bytes = pa.array(
            [s.tobytes() for s in np.repeat(fps, _BANDS, axis=0)],
            type=pa.binary(_SIG_BYTES))
        return pa.table({
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(doc_ids, _BANDS)),
            "sig": sig_bytes,
        })

    def run_rows(batch: pa.Table) -> pa.Table:
        h = batch.column("band_hash").to_numpy()
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        n = len(h)
        outs = {"id_a": [], "id_b": [], "est": []}
        edge_idx = []
        if n:
            sigs = _sig_matrix(batch.column("sig"))
            bnd = np.flatnonzero(np.diff(h) != 0) + 1
            starts = np.r_[0, bnd]
            stops = np.r_[bnd, n]
            for ri in range(len(starts)):
                s, e = int(starts[ri]), int(stops[ri])
                if ri == 0 or ri == len(starts) - 1:
                    edge_idx.append(np.arange(s, min(e, s + _BUCKET_CAP + 1)))
                    continue
                got = _verify_cross_run(d[s:e], sigs[s:e], _BUCKET_CAP,
                                        threshold)
                if got is not None:
                    outs["id_a"].append(got[0])
                    outs["id_b"].append(got[1])
                    outs["est"].append(got[2])
        z = np.empty(0, dtype=np.int64)
        ia = np.concatenate(outs["id_a"]) if outs["id_a"] else z
        ib = np.concatenate(outs["id_b"]) if outs["id_b"] else z
        es = np.concatenate(outs["est"]) if outs["est"] else np.empty(0)
        ei = np.concatenate(edge_idx) if edge_idx else z
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(ia), dtype=np.int8),
                                   np.ones(len(ei), dtype=np.int8)]),
            "id_a": pa.array(np.r_[ia, d[ei]], type=pa.int64()),
            "id_b": pa.array(np.r_[ib, np.zeros(len(ei), dtype=np.int64)]),
            "est_jaccard": pa.array(np.r_[es, np.zeros(len(ei))],
                                    type=pa.float64()),
            "key": pa.array(np.r_[np.zeros(len(ia), dtype=np.int64),
                                  h[ei].astype(np.int64)]),
            "sig": pa.array(
                ([b"\x00" * _SIG_BYTES] * len(ia))
                + [batch.column("sig")[int(i)].as_py() for i in ei],
                type=pa.binary(_SIG_BYTES)),
        })

    out = (ds.map_batches(band_rows, batch_format="pyarrow")
           .sort("band_hash")
           .map_batches(run_rows, batch_format="pyarrow", batch_size=None))
    interior, edges = _split_kinds(out, ["id_a", "id_b", "est_jaccard"],
                                   ["key", "id_a", "sig"])

    def heal(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "est_jaccard": pa.array([], type=pa.float64())})
        docs = group.column("id_a").to_numpy().astype(np.int64)
        got = _verify_cross_run(docs, _sig_matrix(group.column("sig")),
                                _BUCKET_CAP, threshold)
        if got is None:
            return empty
        return pa.table({"id_a": pa.array(got[0], type=pa.int64()),
                         "id_b": pa.array(got[1], type=pa.int64()),
                         "est_jaccard": pa.array(got[2], type=pa.float64())})

    healed = edges.groupby("key").map_groups(heal, batch_format="pyarrow")
    both = interior.union(healed)
    pairs = _distinct_pairs(both, extra="est_jaccard")
    return pairs.map_batches(
        lambda b: pa.table({"doc_id": b.column("id_a"),
                            "bench_id": b.column("id_b"),
                            "est_jaccard": b.column("est_jaccard")}),
        batch_format="pyarrow")
