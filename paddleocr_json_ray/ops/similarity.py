"""Similarity search over the embeddings table.

Random-hyperplane (angular) LSH per Charikar (STOC 2002); IVF-style coarse
probing follows the inverted-file ANN pattern (Jegou et al., "Product
quantization for nearest neighbor search", 2011 — coarse quantizer only).

  * ``knn_brute`` — brute-force cosine top-k: the (small) query matrix is
    broadcast via ray.put; every batch does one [B, Q] float64 matmul and a
    partial top-k; partial results are merged with a final per-query groupby.
    That is the exact-baseline path (matmul scan scales linearly, queries
    stay broadcast).
  * ``build_ivf_index`` / ``knn_ivf`` — the scale path: a one-time pass
    assigns every vector a random-hyperplane bucket and writes the corpus
    as bucket-partitioned parquet (one directory per coarse cell — the
    inverted file).  Queries then read ONLY the probed partitions (own
    bucket + hamming<=2 neighbours), so candidate IO shrinks with the
    probe fraction instead of scanning the full table; per-row membership
    is a vectorized ``np.isin``, and nothing materializes on the driver
    beyond the query vectors.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

IVF_ROOT = os.environ.get("PJR_IVF_ROOT", "/tmp/pjr_ivf")
_N_PLANES = 8  # floor; build_ivf_index grows planes with corpus bytes
_IVF_TARGET_CELL_BYTES = 64 << 20
_IVF_VERSION = "v1"


def _ivf_n_planes(sf_dir: str,
                  target_cell_bytes: int = _IVF_TARGET_CELL_BYTES) -> int:
    """Coarse-cell count must scale with data: at a static plane count each
    cell is corpus/2^planes, so probe IO grows linearly with corpus size.
    Derive planes from on-disk bytes targeting ~64 MB per cell (the same
    sizing rule as relational._join_partitions), floored at 8 (the probe
    geometry the small-corpus tests pin) and capped at 24."""
    import math

    nbytes = os.path.getsize(os.path.join(sf_dir, "embeddings.parquet"))
    need = max(1, math.ceil(nbytes / max(1, target_cell_bytes)))
    return min(24, max(_N_PLANES, math.ceil(math.log2(need))))


def _mat(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> [N, D] float64 matrix, via the flat values
    buffer (no per-row Python lists)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)


def _read_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Prune at the read: only the query vectors come to the driver."""
    import pyarrow.parquet as pq

    qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", n_queries)])
    q_ids = qtab.column("vec_id").to_numpy().astype(np.int64)
    return q_ids, _mat(qtab.column("embedding"))


def knn_brute(sf_dir: str, n_queries: int = 8, k: int = 5) -> ray.data.Dataset:
    """Top-k cosine neighbours for the first ``n_queries`` vec_ids (self
    excluded).  Output: (query_id, neighbor_id, rank) — integer-only so the
    DuckDB oracle matches hash-exactly; ties broken by (sim desc, vec_id)."""
    q_ids, q_mat = _read_queries(sf_dir, n_queries)
    q_ref = ray.put((q_ids, _normalize(q_mat)))

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        bids = batch.column("vec_id").to_numpy().astype(np.int64)
        bnorm = _normalize(_mat(batch.column("embedding")))
        sims = qmat @ bnorm.T  # [Q, B]
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(len(qids)):
            s = sims[qi]
            cand_idx = np.flatnonzero(bids != qids[qi])
            if cand_idx.size == 0:
                continue
            take = cand_idx[np.argsort(-s[cand_idx], kind="stable")][:k]
            rows["query_id"].extend([int(qids[qi])] * len(take))
            rows["neighbor_id"].extend(int(bids[c]) for c in take)
            rows["sim"].extend(float(s[c]) for c in take)
        return pa.table({"query_id": pa.array(rows["query_id"], type=pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                         "sim": pa.array(rows["sim"], type=pa.float64())})

    return (ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=512)
              .groupby("query_id").map_groups(_merge_topk_fn(k), batch_format="pyarrow"))


def _merge_topk_fn(k: int, with_bucket: bool = False):
    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        nb = group.column("neighbor_id").to_numpy().astype(np.int64)
        sm = group.column("sim").to_numpy().astype(np.float64)
        order = np.lexsort((nb, -sm))[:k]  # sim desc, vec_id asc
        out = {
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "neighbor_id": pa.array([int(nb[i]) for i in order], type=pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), type=pa.int64()),
        }
        if with_bucket:
            bk = group.column("bucket").to_numpy().astype(np.int64)
            out["bucket"] = pa.array([int(bk[i]) for i in order], type=pa.int64())
        return pa.table(out)

    return merge


def _plane_matrix(dim: int, n_planes: int = _N_PLANES, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.standard_normal((dim, n_planes))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes) > 0
    return (bits * (1 << np.arange(planes.shape[1]))).sum(axis=1).astype(np.int64)


def embedding_lsh_buckets(sf_dir: str) -> ray.data.Dataset:
    """Random-hyperplane bucket assignment: (vec_id, bucket) — the coarse
    index used by the ANN scale path."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    planes_holder: dict[int, np.ndarray] = {}

    def assign(batch: pa.Table) -> pa.Table:
        mat = _mat(batch.column("embedding"))
        planes = planes_holder.setdefault(mat.shape[1], _plane_matrix(mat.shape[1]))
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": pa.array(_bucket_of(mat, planes), type=pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=1024)


def _dir_tag(sf_dir: str) -> str:
    """Cache key component: basename + abspath digest, so two corpora that
    happen to share a directory basename (pytest tmp fixtures) never share
    an index cache."""
    import hashlib

    name = os.path.basename(os.path.normpath(sf_dir))
    dig = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"{name}-{dig}"


def ivf_index_dir(sf_dir: str, n_planes: int = _N_PLANES) -> str:
    return os.path.join(IVF_ROOT, f"{_dir_tag(sf_dir)}-p{n_planes}-{_IVF_VERSION}")


def build_ivf_index(sf_dir: str, force: bool = False,
                    target_cell_bytes: int = _IVF_TARGET_CELL_BYTES) -> str:
    """One streaming pass: assign every vector its coarse bucket and write
    the corpus as bucket-partitioned parquet (hive layout, one directory per
    cell).  At 100 TB this is the amortized index-build job; queries after
    it read only their probe cells."""
    n_planes = _ivf_n_planes(sf_dir, target_cell_bytes)
    out = ivf_index_dir(sf_dir, n_planes)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker) and not force:
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)  # stale/partial builds must not accumulate
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    planes_holder: dict[int, np.ndarray] = {}

    def assign(batch: pa.Table) -> pa.Table:
        mat = _mat(batch.column("embedding"))
        planes = planes_holder.setdefault(mat.shape[1],
                                          _plane_matrix(mat.shape[1], n_planes))
        return batch.append_column(
            "bucket", pa.array(_bucket_of(mat, planes), type=pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow", batch_size=1024) \
      .write_parquet(out, partition_cols=["bucket"])
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out


def _probe_set(bucket: int, n_planes: int = _N_PLANES) -> np.ndarray:
    """Own cell + every cell within hamming distance 2 (1 + P + C(P,2)
    cells: 37 of 256 at the 8-plane floor — ~14% of a uniform corpus, and a
    shrinking fraction as planes grow with corpus bytes)."""
    probe = {bucket}
    for p in range(n_planes):
        probe.add(bucket ^ (1 << p))
        for p2 in range(p + 1, n_planes):
            probe.add(bucket ^ (1 << p) ^ (1 << p2))
    return np.array(sorted(probe), dtype=np.int64)


def knn_ivf(sf_dir: str, n_queries: int = 8, k: int = 5,
            target_cell_bytes: int = _IVF_TARGET_CELL_BYTES) -> ray.data.Dataset:
    """ANN top-k probing only each query's LSH cell plus cells within
    hamming distance 2 — recall < 1 by design, the exact baseline is
    ``knn_brute``.  Reads ONLY the probed partitions of the inverted-file
    index (candidate IO ∝ probe fraction, not corpus size); membership per
    query is a vectorized ``np.isin`` over recomputed bucket ids.
    Output (query_id, neighbor_id, rank, bucket)."""
    index_dir = build_ivf_index(sf_dir, target_cell_bytes=target_cell_bytes)
    n_planes = _ivf_n_planes(sf_dir, target_cell_bytes)
    q_ids, q_mat = _read_queries(sf_dir, n_queries)
    planes = _plane_matrix(q_mat.shape[1], n_planes)
    q_buckets = _bucket_of(q_mat, planes)
    probes = {int(qid): _probe_set(int(b), n_planes)
              for qid, b in zip(q_ids, q_buckets)}
    union = sorted({int(b) for pr in probes.values() for b in pr})
    import glob as _glob

    paths = [f for b in union
             for f in _glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))]
    q_ref = ray.put((q_ids, _normalize(q_mat), probes))

    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        qids, qnorm, probe_map = ray.get(q_ref)
        bids = batch.column("vec_id").to_numpy().astype(np.int64)
        bmat = _mat(batch.column("embedding"))
        bbuckets = _bucket_of(bmat, planes)
        sims = qnorm @ _normalize(bmat).T
        rows = {"query_id": [], "neighbor_id": [], "sim": [], "bucket": []}
        for qi, qid in enumerate(qids):
            mask = np.isin(bbuckets, probe_map[int(qid)]) & (bids != qid)
            cand = np.flatnonzero(mask)
            take = cand[np.argsort(-sims[qi][cand], kind="stable")][:k]
            rows["query_id"].extend([int(qid)] * len(take))
            rows["neighbor_id"].extend(int(bids[c]) for c in take)
            rows["sim"].extend(float(sims[qi, c]) for c in take)
            rows["bucket"].extend(int(bbuckets[c]) for c in take)
        # explicit types: empty batches must not degrade to null-typed columns
        return pa.table({
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
            "sim": pa.array(rows["sim"], type=pa.float64()),
            "bucket": pa.array(rows["bucket"], type=pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=512)
              .groupby("query_id").map_groups(_merge_topk_fn(k, with_bucket=True),
                                              batch_format="pyarrow"))


# ------------------------------------------------ product quantization (PQ)
PQ_ROOT = os.environ.get("PJR_PQ_ROOT", "/tmp/pjr_pq")
_PQ_VERSION = 1


def _pq_codebooks(sample: np.ndarray, m: int, ks: int,
                  iters: int = 10) -> np.ndarray:
    """[m, ks, d/m] per-subspace Lloyd codebooks (Jégou et al., TPAMI 2011
    §III).  Deterministic: init = the first ``ks`` sample rows; empty cells
    keep their centroid; ties break to the lower code."""
    n, d = sample.shape
    if n == 0:
        raise ValueError("PQ codebook training needs at least one vector")
    ks = min(ks, n)  # degrade gracefully on tiny/sparse-id corpora
    sub = d // m
    books = np.empty((m, ks, sub))
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        c = x[:ks].copy()
        for _ in range(iters):
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
                  + (c * c).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            for ci in range(ks):
                mask = a == ci
                if mask.any():
                    c[ci] = x[mask].mean(axis=0)
        books[j] = c
    return books


def _pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """[N, D] -> [N, m] uint8 code matrix (nearest centroid per subspace)."""
    m, ks, sub = books.shape
    codes = np.empty((mat.shape[0], m), dtype=np.uint8)
    for j in range(m):
        x = mat[:, j * sub:(j + 1) * sub]
        c = books[j]
        d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
              + (c * c).sum(1)[None, :])
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def build_pq_index(sf_dir: str, m: int = 8, ks: int = 16,
                   train_n: int = 2048, force: bool = False) -> tuple[str, np.ndarray]:
    """One streaming pass: PQ-encode every vector and write the CODES-ONLY
    index (vec_id + m uint8 codes = m+8 bytes/vector vs 8 bytes/dim raw —
    32x smaller at D=64/m=8).  At 100 TB this is the amortized index-build
    job; the query scan then reads codes, never raw vectors.  Codebooks
    train on a deterministic vec_id-pruned sample (sample-bounded driver
    memory) and are persisted beside the codes for reuse."""
    out = os.path.join(PQ_ROOT, f"{_dir_tag(sf_dir)}-m{m}-ks{ks}-{_PQ_VERSION}")
    marker = os.path.join(out, "_COMPLETE")
    books_path = os.path.join(out, "codebooks.npy")
    if os.path.exists(marker) and not force:
        return os.path.join(out, "codes"), np.load(books_path)
    import shutil

    shutil.rmtree(out, ignore_errors=True)  # stale/partial builds must not accumulate
    import pyarrow.parquet as pq

    sample_tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"],
                               filters=[("vec_id", "<", train_n)])
    order = np.argsort(sample_tab.column("vec_id").to_numpy())
    sample = _normalize(_mat(sample_tab.column("embedding")))[order]
    books = _pq_codebooks(sample, m, ks)
    books_ref = ray.put(books)

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def encode(batch: pa.Table, ref) -> pa.Table:
        b = ray.get(ref)
        codes = _pq_encode(_normalize(_mat(batch.column("embedding"))), b)
        return pa.table({
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "codes": pa.array([c.tobytes() for c in codes], type=pa.binary()),
        })

    os.makedirs(out, exist_ok=True)
    ds.map_batches(encode, batch_format="pyarrow", batch_size=1024,
                   fn_args=(books_ref,)).write_parquet(
        os.path.join(out, "codes"))
    np.save(books_path, books)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return os.path.join(out, "codes"), books


def knn_pq(sf_dir: str, n_queries: int = 8, k: int = 5, m: int = 8,
           ks: int = 16) -> ray.data.Dataset:
    """ANN top-k by product-quantization asymmetric distance (ADC): the
    MEMORY-scale ANN path next to ``knn_ivf``'s IO-scale one.  The scan
    reads the codes-only index (m bytes/vector); each query precomputes an
    [m, ks] subspace distance table once, so per-candidate cost is m table
    lookups (one numpy fancy-index per batch), never a D-dim multiply.
    Recall < 1 by design (quantization error) — the exact baseline is
    ``knn_brute`` and the recall floor is pinned in pytest.  Vectors are
    L2-normalized first, so PQ L2 order approximates cosine order.
    Output (query_id, neighbor_id, rank)."""
    index_dir, books = build_pq_index(sf_dir, m=m, ks=ks)
    q_ids, q_mat = _read_queries(sf_dir, n_queries)
    qn = _normalize(q_mat)
    mm, _ks, sub = books.shape
    # per-query [m, ks] ADC tables: ||q_j - c||^2 per subspace centroid
    tabs = np.stack([
        ((qn[:, j * sub:(j + 1) * sub][:, None, :] - books[j][None, :, :]) ** 2
         ).sum(axis=2)
        for j in range(mm)], axis=1)  # [Q, m, ks]
    q_ref = ray.put((q_ids, tabs))

    ds = ray.data.read_parquet(index_dir, columns=["vec_id", "codes"])

    def partial(batch: pa.Table) -> pa.Table:
        qids, qtabs = ray.get(q_ref)
        bids = batch.column("vec_id").to_numpy().astype(np.int64)
        blob = b"".join(batch.column("codes").to_pylist())
        codes = np.frombuffer(blob, dtype=np.uint8).reshape(len(bids), -1)
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        cols = np.arange(codes.shape[1])
        for qi, qid in enumerate(qids):
            dist = qtabs[qi][cols, codes].sum(axis=1)  # m lookups/candidate
            cand = np.flatnonzero(bids != qid)
            if cand.size == 0:
                continue
            take = cand[np.argsort(dist[cand], kind="stable")][:k]
            rows["query_id"].extend([int(qid)] * len(take))
            rows["neighbor_id"].extend(int(bids[c]) for c in take)
            rows["sim"].extend(float(-dist[c]) for c in take)
        return pa.table({
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
            "sim": pa.array(rows["sim"], type=pa.float64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
              .groupby("query_id").map_groups(_merge_topk_fn(k),
                                              batch_format="pyarrow"))


# ------------------------------------------------------------------ k-means
def label_centroids(sf_dir: str) -> ray.data.Dataset:
    """(label, dim, avg_val) — element-wise per-label mean of the embedding
    column: the grouped VECTOR-aggregation shape (class prototypes, cluster
    summaries, feature-normalization stats).

    Per batch the [n, D] matrix reduces to one partial-sum vector per label
    present (vectorized ``np.add.at`` over the label index), exploded to
    (label, dim, s, n) rows; the native Sum groupby merges them, so the
    exchange carries labels x D x blocks rows — control-plane sized — and
    the raw vectors never shuffle."""
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings", ["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        mat = _mat(batch.column("embedding"))
        labels = batch.column("label").to_numpy().astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        d = mat.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), type=pa.int32()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts, d).astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["label", "dim"]).aggregate(Sum("s"), Sum("n")))

    def finish(batch: pa.Table) -> pa.Table:
        from .relational import _round_nd

        s = np.asarray(batch.column("sum(s)").to_pylist())
        n = np.asarray(batch.column("sum(n)").to_pylist())
        # normalize IEEE -0.0 -> +0.0 so the byte hash matches the oracle
        vals = np.array([_round_nd(v, 3) for v in s / n])
        vals = np.where(vals == 0.0, 0.0, vals)
        return pa.table({
            "label": batch.column("label"),
            "dim": batch.column("dim"),
            "avg_val": pa.array(vals),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def embedding_covariance(sf_dir: str) -> ray.data.Dataset:
    """(dim_i, dim_j, cov) — sample covariance matrix of the embedding
    column: the MATRIX-sufficient-statistics shape (PCA / whitening /
    feature-decorrelation prep).

    Each batch contributes one X^T X Gram matrix (a single [n, D] x
    [D, n] matmul), a column-sum vector and a count; partials explode to
    (i, j, sxy) rows and merge through the native Sum groupby, so the
    exchange carries D^2 + D rows per block (a few KB) — never vectors.
    The covariance derives once from the merged moments."""
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        mat = _mat(batch.column("embedding"))
        n, d = mat.shape
        gram = mat.T @ mat
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        return pa.table({
            "dim_i": pa.array(np.r_[ii.ravel(), np.arange(d), [-1]],
                              type=pa.int64()),
            "dim_j": pa.array(np.r_[jj.ravel(), np.full(d, -1), [-1]],
                              type=pa.int64()),
            # (i, j) -> sum x_i x_j; (i, -1) -> sum x_i; (-1, -1) -> count
            "s": pa.array(np.r_[gram.ravel(), mat.sum(axis=0), [float(n)]]),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["dim_i", "dim_j"]).aggregate(Sum("s")).to_pandas())
    s = {(int(i), int(j)): v for i, j, v in
         zip(agg["dim_i"], agg["dim_j"], agg["sum(s)"])}
    n = s.pop((-1, -1))
    d = int(max(i for i, _ in s) + 1)
    sx = np.array([s.pop((i, -1)) for i in range(d)])
    cov = np.empty((d, d))
    for (i, j), v in s.items():
        cov[i, j] = (v - sx[i] * sx[j] / n) / max(n - 1, 1)
    from .relational import _round_nd

    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    # normalize IEEE -0.0 -> +0.0 so the byte hash matches the oracle
    vals = np.array([_round_nd(v, 5) for v in cov.ravel()])
    vals = np.where(vals == 0.0, 0.0, vals)
    return ray.data.from_arrow(pa.table({
        "dim_i": pa.array(ii.ravel(), type=pa.int64()),
        "dim_j": pa.array(jj.ravel(), type=pa.int64()),
        "cov": pa.array(vals),
    }))


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 8) -> ray.data.Dataset:
    """(vec_id, cluster) after Lloyd iterations — the canonical broadcast-
    small-state iterative pattern: centroids (k x dim floats, control-plane
    sized) broadcast via ``ray.put`` each round; every batch assigns
    vectors and emits PARTIAL per-cluster sums + counts (k rows per block —
    the combiner), so the driver reduces O(k x blocks) rows per round and
    never sees a vector row.  Deterministic: init = the k lowest vec_ids'
    vectors; ties break to the lower cluster index.

    At 100 TB the same loop holds: per-round driver traffic is k x dim
    floats x blocks, independent of corpus size."""
    from ..sources.readers import read_table

    import pyarrow.parquet as pq

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    init = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", k)])
    order = np.argsort(init.column("vec_id").to_numpy())
    cents = _mat(init.column("embedding"))[order]

    def partial_sums(batch: pa.Table, cents_ref) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _mat(batch.column("embedding"))
        d2 = ((mat * mat).sum(axis=1)[:, None] - 2.0 * (mat @ c.T)
              + (c * c).sum(axis=1)[None, :])
        assign = np.argmin(d2, axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=len(c))
        nz = np.flatnonzero(counts)
        return pa.table({
            "cluster": pa.array(nz.astype(np.int64)),
            "count": pa.array(counts[nz].astype(np.int64)),
            "vecsum": pa.array([sums[i].tobytes() for i in nz], type=pa.binary()),
        })

    dim = cents.shape[1]
    for _ in range(iters):
        cents_ref = ray.put(cents)
        part = ds.map_batches(partial_sums, batch_format="pyarrow",
                              fn_args=(cents_ref,)).to_pandas()
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for cl, n, blob in zip(part["cluster"], part["count"], part["vecsum"]):
            sums[cl] += np.frombuffer(blob, dtype=np.float64)
            counts[cl] += n
        new = np.where(counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None],
                       cents)
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new

    final_ref = ray.put(cents)

    def assign_only(batch: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        mat = _mat(batch.column("embedding"))
        d2 = ((mat * mat).sum(axis=1)[:, None] - 2.0 * (mat @ c.T)
              + (c * c).sum(axis=1)[None, :])
        return pa.table({"vec_id": batch.column("vec_id"),
                         "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64))})

    return ds.map_batches(assign_only, batch_format="pyarrow")


def kmeans_cluster_sizes(sf_dir: str, k: int = 8,
                         iters: int = 3) -> ray.data.Dataset:
    """(cluster_id, n_vecs, min_vec_id) — ORACLED distributed Lloyd
    k-means: ``iters`` assignment passes with centroid recomputes between
    them, exactly mirrorable in SQL as unrolled CTE layers (the PageRank
    precedent for iterative algorithms; a recursive CTE cannot aggregate
    over its own reference).

    Bit-parity design vs the DuckDB oracle:
    - init centroids = the k lowest vec_ids' vectors, raw float32 widened
      to float64 (exact on both sides);
    - recomputed centroids are QUANTIZED ``floor(mean * 1e6 + 0.5) / 1e6``
      on both sides — DuckDB's parallel group-avg and the driver merge sum
      in different orders, and quantization absorbs the ~1e-12 ulp noise
      that would otherwise flip a discrete assignment;
    - empty clusters DROP from the next round (the SQL's group-by simply
      has no row for them), ids keep their original values;
    - ties break to the lower cluster id (np.argmin first-hit == the
      SQL's ``ORDER BY dist, cid`` row_number).

    Same scale shape as ``kmeans_embeddings``: centroids broadcast via
    ``ray.put`` each round, each batch emits k partial-sum rows, the
    driver reduces O(k x blocks) control-plane rows and never holds
    vectors.  The ``materialize()`` is a deliberate multi-pass cache of
    the SMALLEST sf table (embeddings) in the object store; on a corpus
    that outgrows the store, drop it and let each Lloyd round re-read —
    the loop structure is unchanged."""
    import pyarrow.parquet as pq

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings",
                    ["vec_id", "embedding"]).materialize()

    init = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", k)])
    order = np.argsort(init.column("vec_id").to_numpy())
    cents = _mat(init.column("embedding"))[order]
    cids = np.arange(len(cents), dtype=np.int64)

    def partial(batch: pa.Table, ref) -> pa.Table:
        c, ids = ray.get(ref)
        mat = _mat(batch.column("embedding"))
        vid = batch.column("vec_id").to_numpy().astype(np.int64)
        # full squared-difference form (matches the oracle's
        # list_distance term-by-term up to summation order)
        d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=len(c))
        minvec = np.full(len(c), np.iinfo(np.int64).max)
        np.minimum.at(minvec, assign, vid)
        nz = np.flatnonzero(counts)
        return pa.table({
            "cluster": pa.array(ids[nz]),
            "count": pa.array(counts[nz].astype(np.int64)),
            "minvec": pa.array(minvec[nz]),
            "vecsum": pa.array([sums[i].tobytes() for i in nz],
                               type=pa.binary()),
        })

    dim = cents.shape[1]
    for it in range(iters):
        ref = ray.put((cents, cids))
        part = ds.map_batches(partial, batch_format="pyarrow",
                              fn_args=(ref,)).to_pandas()
        idx = {int(c): i for i, c in enumerate(cids)}
        sums = np.zeros((len(cids), dim))
        counts = np.zeros(len(cids), dtype=np.int64)
        minvec = np.full(len(cids), np.iinfo(np.int64).max)
        for cl, n, mv, blob in zip(part["cluster"], part["count"],
                                   part["minvec"], part["vecsum"]):
            i = idx[int(cl)]
            sums[i] += np.frombuffer(blob, dtype=np.float64)
            counts[i] += n
            minvec[i] = min(minvec[i], mv)
        if it == iters - 1:
            keep = counts > 0
            return ray.data.from_arrow(pa.table({
                "cluster_id": pa.array(cids[keep]),
                "n_vecs": pa.array(counts[keep]),
                "min_vec_id": pa.array(minvec[keep]),
            }))
        keep = counts > 0
        cids = cids[keep]
        cents = np.floor(sums[keep] / counts[keep][:, None] * 1e6
                         + 0.5) / 1e6

    raise AssertionError("unreachable: iters >= 1")


def embedding_pca_projection(sf_dir: str, n_components: int = 4) -> ray.data.Dataset:
    """(vec_id, pc0..pc{k-1}) — project every embedding onto the corpus'
    top-k principal components: the dimensionality-reduction prep stage
    (whitening, 2-D corpus maps, cheap pre-ANN compression).

    Two streaming passes, no shuffle of vectors: pass 1 is the
    ``embedding_covariance`` moment plan (one Gram matmul per batch,
    D^2-row exchange); the D x D eigendecomposition runs once driver-side
    (control-plane sized — D is model width, never data-bound) and the
    (mean, components) pair broadcasts via ``ray.put``; pass 2 maps each
    batch through one [n, D] x [D, k] matmul.  Components are
    sign-canonicalized (largest-|loading| coordinate positive) so the
    output is deterministic despite eigenvector sign ambiguity."""
    from ..sources.readers import read_table

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        mat = _mat(batch.column("embedding"))
        n, d = mat.shape
        gram = mat.T @ mat
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        return pa.table({
            "dim_i": pa.array(np.r_[ii.ravel(), np.arange(d), [-1]],
                              type=pa.int64()),
            "dim_j": pa.array(np.r_[jj.ravel(), np.full(d, -1), [-1]],
                              type=pa.int64()),
            "s": pa.array(np.r_[gram.ravel(), mat.sum(axis=0), [float(n)]]),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["dim_i", "dim_j"]).aggregate(Sum("s")).to_pandas())
    s = {(int(i), int(j)): v for i, j, v in
         zip(agg["dim_i"], agg["dim_j"], agg["sum(s)"])}
    n = s.pop((-1, -1))
    d = int(max(i for i, _ in s) + 1)
    k = min(n_components, d)
    mean = np.array([s.pop((i, -1)) for i in range(d)]) / n
    cov = np.empty((d, d))
    for (i, j), v in s.items():
        cov[i, j] = v / n - mean[i] * mean[j]
    evals, evecs = np.linalg.eigh(cov)          # ascending
    comps = evecs[:, ::-1][:, :k].T             # [k, D], descending variance
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    model_ref = ray.put((mean, comps))

    def project(batch: pa.Table, ref) -> pa.Table:
        mean_, comps_ = ray.get(ref)
        mat = _mat(batch.column("embedding"))
        proj = (mat - mean_) @ comps_.T
        cols = {"vec_id": batch.column("vec_id")}
        for i in range(comps_.shape[0]):
            cols[f"pc{i}"] = pa.array(np.round(proj[:, i], 5))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", fn_args=(model_ref,))


def label_confusion(sf_dir: str) -> ray.data.Dataset:
    """(label, nearest, n) — nearest-centroid confusion matrix: every
    embedding assigned to its most-cosine-similar class prototype (the
    cluster-purity / label-noise eval every embedding pipeline runs).

    Plan: prototypes come from ``label_centroids``' own OUTPUT (rounded
    3dp, -0.0-normalized) so both engines score against bit-identical
    centroid values; the [k, D] matrix broadcasts in the task closure and
    every batch is one matmul + argmax (ties: lowest label, mirrored by
    the oracle's ORDER BY sim DESC, label); counts merge as a k^2-bounded
    driver np.add.at.  Raw vectors never shuffle."""
    cent = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     label_centroids(sf_dir).to_arrow_refs())
         if t.num_rows])
    labels = cent.column("label").to_numpy().astype(np.int64)
    dims = cent.column("dim").to_numpy().astype(np.int64)
    vals = cent.column("avg_val").to_numpy()
    uniq = np.unique(labels)
    d = int(dims.max()) + 1
    C = np.zeros((len(uniq), d))
    lut = {int(l): i for i, l in enumerate(uniq)}
    for l, dd, v in zip(labels, dims, vals):
        C[lut[int(l)], dd] = v
    norms = np.sqrt((C * C).sum(axis=1))
    norms[norms == 0] = 1.0

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "embeddings", ["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        mat = _mat(batch.column("embedding"))
        # dot first, divide after — the oracle's sum(v*cv)/nrm op order
        sims = (mat @ C.T) / norms[None, :]
        nearest = uniq[np.argmax(sims, axis=1)]  # first max = lowest label
        lab = batch.column("label").to_numpy().astype(np.int64)
        key = lab * (int(uniq.max()) + 1) + nearest
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk, type=pa.int64()),
                         "c": pa.array(cnt, type=pa.int64())})

    parts = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     ds.map_batches(partial, batch_format="pyarrow")
                       .to_arrow_refs()) if t.num_rows])
    acc: dict[int, int] = {}
    for k, c in zip(parts.column("k").to_pylist(), parts.column("c").to_pylist()):
        acc[k] = acc.get(k, 0) + c
    base = int(uniq.max()) + 1
    keys = sorted(acc)
    return ray.data.from_arrow(pa.table({
        "label": pa.array([k // base for k in keys], type=pa.int64()),
        "nearest": pa.array([k % base for k in keys], type=pa.int64()),
        "n": pa.array([acc[k] for k in keys], type=pa.int64()),
    }))
