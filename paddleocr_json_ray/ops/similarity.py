"""Similarity search over the embeddings table.

Random-hyperplane (angular) LSH per Charikar (STOC 2002); IVF-style coarse
probing follows the inverted-file ANN pattern (Jegou et al., "Product
quantization for nearest neighbor search", 2011 — coarse quantizer only).

  * ``knn_brute`` — brute-force cosine top-k: the (small) query matrix is
    broadcast via ray.put; every batch does one [B, Q] float64 matmul and a
    partial top-k; partial results are merged with a final per-query groupby.
    That is the exact-baseline path (matmul scan scales linearly, queries
    stay broadcast).
  * ``embedding_lsh_buckets`` / ``knn_ivf`` — the scale path: random
    hyperplane signatures bucket vectors so candidate generation is a
    key-partitioned groupby instead of an all-pairs scan; probing the
    query's bucket (+ optional neighbouring buckets) bounds work per query.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _load_matrix(sf_dir: str):
    import pyarrow.parquet as pq

    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tab.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(tab.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def knn_brute(sf_dir: str, n_queries: int = 8, k: int = 5) -> ray.data.Dataset:
    """Top-k cosine neighbours for the first ``n_queries`` vec_ids (self
    excluded).  Output: (query_id, neighbor_id, rank) — integer-only so the
    DuckDB oracle matches hash-exactly; ties broken by (sim desc, vec_id)."""
    # prune at the read: only the query vectors come to the driver
    import pyarrow.parquet as pq

    qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", n_queries)])
    q_ids = np.asarray(qtab.column("vec_id").to_pylist(), dtype=np.int64)
    q_mat = np.asarray(qtab.column("embedding").to_pylist(), dtype=np.float64)
    q_mat = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put((q_ids, q_mat))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        bmat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        bmat = bmat / np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-30)
        sims = qmat @ bmat.T  # [Q, B]
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(len(qids)):
            s = sims[qi]
            valid = bids != qids[qi]
            cand_idx = np.where(valid)[0]
            if cand_idx.size == 0:
                continue
            take = cand_idx[np.argsort(-s[cand_idx], kind="stable")][:k]
            for c in take:
                rows["query_id"].append(int(qids[qi]))
                rows["neighbor_id"].append(int(bids[c]))
                rows["sim"].append(float(s[c]))
        return pa.table({"query_id": pa.array(rows["query_id"], type=pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                         "sim": pa.array(rows["sim"], type=pa.float64())})

    def merge_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        nb = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
        sm = np.asarray(group.column("sim").to_pylist(), dtype=np.float64)
        order = np.lexsort((nb, -sm))[:k]  # sim desc, vec_id asc
        return pa.table({
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "neighbor_id": pa.array([int(nb[i]) for i in order], type=pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), type=pa.int64()),
        })

    return (ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=512)
              .groupby("query_id").map_groups(merge_topk, batch_format="pyarrow"))


_N_PLANES = 8


def _plane_matrix(dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.standard_normal((dim, _N_PLANES))


def embedding_lsh_buckets(sf_dir: str) -> ray.data.Dataset:
    """Random-hyperplane bucket assignment: (vec_id, bucket) — the coarse
    index used by the ANN scale path."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    planes_holder: dict[int, object] = {}

    def assign(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        planes = planes_holder.setdefault(mat.shape[1], _plane_matrix(mat.shape[1]))
        bits = (mat @ planes) > 0
        buckets = (bits * (1 << np.arange(_N_PLANES))).sum(axis=1).astype(np.int64)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": pa.array(buckets, type=pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=1024)


def knn_ivf(sf_dir: str, n_queries: int = 8, k: int = 5) -> ray.data.Dataset:
    """ANN top-k probing only the query's LSH bucket plus all buckets within
    hamming distance 2 (~14% of a uniform corpus at 8 planes — bounded
    candidate set; recall < 1 by design, the exact baseline is knn_brute).
    Output (query_id, neighbor_id, rank, bucket)."""
    ids, mat = _load_matrix(sf_dir)
    planes = _plane_matrix(mat.shape[1])
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    bits = (mat @ planes) > 0
    buckets = (bits * (1 << np.arange(_N_PLANES))).sum(axis=1).astype(np.int64)

    q_sel = ids < n_queries
    probes: dict[int, set[int]] = {}
    for qi in np.where(q_sel)[0]:
        b = int(buckets[qi])
        probe = {b}
        for p in range(_N_PLANES):
            probe.add(b ^ (1 << p))
            for p2 in range(p + 1, _N_PLANES):
                probe.add(b ^ (1 << p) ^ (1 << p2))
        probes[int(ids[qi])] = probe
    q_ref = ray.put((ids[q_sel], norm[q_sel], probes))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, probe_map = ray.get(q_ref)
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        bmat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        bnorm = bmat / np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-30)
        bbits = (bmat @ planes) > 0
        bbuckets = (bbits * (1 << np.arange(_N_PLANES))).sum(axis=1).astype(np.int64)
        sims = qmat @ bnorm.T
        rows = {"query_id": [], "neighbor_id": [], "sim": [], "bucket": []}
        for qi, qid in enumerate(qids):
            probe = probe_map[int(qid)]
            mask = np.array([int(bb) in probe and bid != qid
                             for bb, bid in zip(bbuckets, bids)])
            cand = np.where(mask)[0]
            take = cand[np.argsort(-sims[qi][cand], kind="stable")][:k]
            for c in take:
                rows["query_id"].append(int(qid))
                rows["neighbor_id"].append(int(bids[c]))
                rows["sim"].append(float(sims[qi, c]))
                rows["bucket"].append(int(bbuckets[c]))
        # explicit types: empty batches must not degrade to null-typed columns
        return pa.table({
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
            "sim": pa.array(rows["sim"], type=pa.float64()),
            "bucket": pa.array(rows["bucket"], type=pa.int64()),
        })

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        nb = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
        sm = np.asarray(group.column("sim").to_pylist(), dtype=np.float64)
        bk = np.asarray(group.column("bucket").to_pylist(), dtype=np.int64)
        order = np.lexsort((nb, -sm))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "neighbor_id": pa.array([int(nb[i]) for i in order], type=pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), type=pa.int64()),
            "bucket": pa.array([int(bk[i]) for i in order], type=pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=512)
              .groupby("query_id").map_groups(merge, batch_format="pyarrow"))
