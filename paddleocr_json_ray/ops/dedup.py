"""Deduplication ops — exact, MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup (large-scale training-data pipeline components).

Algorithms from the public literature: MinHash resemblance sketching
(Broder, "On the resemblance and containment of documents", 1997) with
banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3);
SimHash (Charikar, "Similarity estimation techniques from rounding
algorithms", STOC 2002) with the 4-chunk pigeonhole probe of Manku et al.
(WWW 2007).

Scale shape of every variant:
  1. per-batch vectorized signature computation (``map_batches``, no state);
  2. candidate generation via a key-partitioned ``groupby`` (band hash /
     simhash chunk / shared n-gram) — the only all-to-all exchange, keyed so
     co-candidates land together; oversized buckets are capped (stop-gram
     behaviour) and the cap is logged in the result;
  3. pair verification inside the grouped stage;
  4. the duplicate-pair set (tiny relative to the corpus: only dups) is
     union-found on the driver and the loser set broadcast back into a
     ``map_batches`` filter — broadcast-small-side, never a second shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.textstats import char_shingles, fnv1a64, simhash64, word_ngrams

_MERSENNE61 = (1 << 61) - 1


# --------------------------------------------------------------------- exact
def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: hash-partition on a 64-bit text hash, keep the smallest
    doc_id per distinct text within each hash group.  Output: surviving
    doc_ids."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [fnv1a64(t.encode("utf-8")) for t in batch.column("text").to_pylist()]
        return batch.append_column("text_hash", pa.array(hashes, type=pa.int64()))

    def first_per_text(group: pa.Table) -> pa.Table:
        # group = one text_hash; collisions are resolved by exact text compare
        best: dict[str, int] = {}
        for doc_id, text in zip(group.column("doc_id").to_pylist(),
                                group.column("text").to_pylist()):
            if text not in best or doc_id < best[text]:
                best[text] = doc_id
        return pa.table({"doc_id": pa.array(sorted(best.values()), type=pa.int64())})

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("text_hash")
              .map_groups(first_per_text, batch_format="pyarrow"))


# ---------------------------------------------------------------- union-find
def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find over the (small) duplicate-pair set; returns
    member -> cluster-min."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _survivors_from_pairs(sf_dir: str, pairs: list[tuple[int, int]]) -> ray.data.Dataset:
    roots = _union_find(pairs)
    losers = {m for m, r in roots.items() if r != m}
    losers_ref = ray.put(losers)

    def keep(batch: pa.Table) -> pa.Table:
        lose = ray.get(losers_ref)
        mask = [d not in lose for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id"])
    return ds.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------- minhash + LSH
_N_PERM = 64
_BANDS = 16
_ROWS_PER_BAND = _N_PERM // _BANDS


def _perm_params(seed: int = 42):
    rng = np.random.Generator(np.random.Philox(seed))
    a = rng.integers(1, _MERSENNE61, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE61, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if shingles.size == 0:
        return np.zeros(_N_PERM, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # universal-ish hashing mod 2^64 (wraparound), vectorized (S, P)
        vals = shingles[:, None] * a[None, :] + b[None, :]
    return vals.min(axis=0)


def minhash_candidate_pairs(sf_dir: str, threshold: float = 0.8) -> ray.data.Dataset:
    """(id_a, id_b, est_jaccard) for LSH-candidate pairs whose signature
    agreement >= threshold."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    a_ref, b_ref = _perm_params()

    def band_rows(batch: pa.Table) -> pa.Table:
        out_band, out_bh, out_doc, out_sig = [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = minhash_signature(char_shingles(text), a_ref, b_ref)
            sig_bytes = sig.tobytes()
            for band in range(_BANDS):
                chunk = sig[band * _ROWS_PER_BAND:(band + 1) * _ROWS_PER_BAND]
                out_band.append(band)
                out_bh.append(fnv1a64(chunk.tobytes()))
                out_doc.append(doc_id)
                out_sig.append(sig_bytes)
        return pa.table({
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_bh, type=pa.int64()),
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "sig": pa.array(out_sig, type=pa.binary()),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").to_pylist()
        if len(docs) < 2 or len(docs) > 256:  # cap pathological buckets
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "est_jaccard": pa.array([], type=pa.float64())})
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in group.column("sig").to_pylist()]
        ids_a, ids_b, est = [], [], []
        order = np.argsort(docs)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                sim = float(np.mean(sigs[i] == sigs[j]))
                if sim >= threshold:
                    ids_a.append(docs[i])
                    ids_b.append(docs[j])
                    est.append(sim)
        return pa.table({"id_a": pa.array(ids_a, type=pa.int64()),
                         "id_b": pa.array(ids_b, type=pa.int64()),
                         "est_jaccard": pa.array(est, type=pa.float64())})

    pairs = (ds.map_batches(band_rows, batch_format="pyarrow")
               .groupby(["band", "band_hash"])
               .map_groups(bucket_pairs, batch_format="pyarrow"))
    # same pair can surface from multiple bands -> dedupe
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> ray.data.Dataset:
    pairs_df = minhash_candidate_pairs(sf_dir, threshold).to_pandas()
    pairs = [(int(a), int(b)) for a, b in zip(pairs_df["id_a"], pairs_df["id_b"])]
    return _survivors_from_pairs(sf_dir, pairs)


# ------------------------------------------------------------------- simhash
def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup: 4x16-bit chunk banding (pigeonhole guarantees any
    pair within hamming<=3 shares at least one chunk), verify exact hamming
    in-bucket."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def chunk_rows(batch: pa.Table) -> pa.Table:
        out = {"chunk_idx": [], "chunk_val": [], "doc_id": [], "sig": []}
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = simhash64(text)
            u = sig & 0xFFFFFFFFFFFFFFFF
            for c in range(4):
                out["chunk_idx"].append(c)
                out["chunk_val"].append((u >> (16 * c)) & 0xFFFF)
                out["doc_id"].append(doc_id)
                out["sig"].append(sig)
        return pa.table({
            "chunk_idx": pa.array(out["chunk_idx"], type=pa.int32()),
            "chunk_val": pa.array(out["chunk_val"], type=pa.int32()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "sig": pa.array(out["sig"], type=pa.int64()),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").to_pylist()
        sigs = group.column("sig").to_pylist()
        ids_a, ids_b = [], []
        if 2 <= len(docs) <= 512:
            order = np.argsort(docs)
            for ii in range(len(order)):
                for jj in range(ii + 1, len(order)):
                    i, j = order[ii], order[jj]
                    if bin((sigs[i] ^ sigs[j]) & 0xFFFFFFFFFFFFFFFF).count("1") <= max_hamming:
                        ids_a.append(docs[i])
                        ids_b.append(docs[j])
        return pa.table({"id_a": pa.array(ids_a, type=pa.int64()),
                         "id_b": pa.array(ids_b, type=pa.int64())})

    pairs_tab = (ds.map_batches(chunk_rows, batch_format="pyarrow")
                   .groupby(["chunk_idx", "chunk_val"])
                   .map_groups(bucket_pairs, batch_format="pyarrow")).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(pairs_tab["id_a"], pairs_tab["id_b"])}
    return _survivors_from_pairs(sf_dir, sorted(pairs))


# ------------------------------------------------------------ n-gram jaccard
def ngram_dup_pairs(sf_dir: str, n: int = 3, threshold: float = 0.8,
                    bucket_cap: int = 64) -> ray.data.Dataset:
    """Word n-gram Jaccard pairs >= threshold via a shared-gram inverted
    index: rows (gram_hash, doc) -> groupby gram -> co-occurrence counts ->
    jaccard from broadcast per-doc gram counts."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        gh, dc, cnt = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            grams = word_ngrams(text, n)
            for g in grams:
                gh.append(fnv1a64(g.encode("utf-8")))
                dc.append(doc_id)
            cnt.append(len(grams))
        return pa.table({"gram": pa.array(gh, type=pa.int64()),
                         "doc_id": pa.array(dc, type=pa.int64())})

    # per-doc gram counts (needed for the jaccard denominator) — small table,
    # computed once and broadcast
    counts_tab = ds.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "n_grams": pa.array([len(word_ngrams(t, n)) for t in b.column("text").to_pylist()],
                                type=pa.int64()),
        }), batch_format="pyarrow").to_pandas()
    counts_ref = ray.put(dict(zip(counts_tab["doc_id"].astype(int),
                                  counts_tab["n_grams"].astype(int))))

    def gram_pairs(group: pa.Table) -> pa.Table:
        docs = sorted(set(group.column("doc_id").to_pylist()))
        ids_a, ids_b = [], []
        if 2 <= len(docs) <= bucket_cap:  # stop-gram cap: drop ubiquitous grams
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    ids_a.append(docs[i])
                    ids_b.append(docs[j])
        return pa.table({"id_a": pa.array(ids_a, type=pa.int64()),
                         "id_b": pa.array(ids_b, type=pa.int64())})

    def to_jaccard(group: pa.Table) -> pa.Table:
        counts = ray.get(counts_ref)
        a = group.column("id_a")[0].as_py()
        b = group.column("id_b")[0].as_py()
        co = group.num_rows
        na, nb = counts.get(a, 0), counts.get(b, 0)
        j = co / (na + nb - co) if (na + nb - co) > 0 else 0.0
        if j < threshold:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        return pa.table({"id_a": pa.array([a], type=pa.int64()),
                         "id_b": pa.array([b], type=pa.int64()),
                         "jaccard": pa.array([j], type=pa.float64())})

    return (ds.map_batches(gram_rows, batch_format="pyarrow")
              .groupby("gram").map_groups(gram_pairs, batch_format="pyarrow")
              .groupby(["id_a", "id_b"]).map_groups(to_jaccard, batch_format="pyarrow"))


def dedup_ngram(sf_dir: str, n: int = 3, threshold: float = 0.8) -> ray.data.Dataset:
    pairs_tab = ngram_dup_pairs(sf_dir, n, threshold).to_pandas()
    pairs = [(int(a), int(b)) for a, b in zip(pairs_tab["id_a"], pairs_tab["id_b"])]
    return _survivors_from_pairs(sf_dir, pairs)


# ------------------------------------------------------- embedding near-dup
def embedding_dup_pairs(sf_dir: str, threshold: float = 0.35) -> ray.data.Dataset:
    """Cosine-similar pairs over the embeddings table.  The full normalized
    matrix is broadcast once via ray.put (read in every task, never
    re-shipped per batch); each batch does one [B, N] float64 matmul.  The
    documented scale path for corpora whose matrix exceeds broadcast budget
    is the LSH-bucketed variant (similarity.embedding_lsh_buckets)."""
    import pyarrow.parquet as pq

    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tab.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(tab.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    mat_ref = ray.put((ids, mat))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        bmat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-30)
        sims = bmat @ all_mat.T
        rows_a, rows_b, vals = [], [], []
        for r in range(len(bids)):
            hit = np.where(sims[r] > threshold)[0]
            for c in hit:
                if bids[r] < all_ids[c]:  # i<j canonical orientation
                    rows_a.append(int(bids[r]))
                    rows_b.append(int(all_ids[c]))
                    vals.append(float(sims[r, c]))
        return pa.table({"id_a": pa.array(rows_a, type=pa.int64()),
                         "id_b": pa.array(rows_b, type=pa.int64())})

    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=256)


def dedup_embedding(sf_dir: str, threshold: float = 0.35) -> ray.data.Dataset:
    """Survivors after removing cosine-near-dup embeddings (keep min vec_id
    per cluster)."""
    pairs_tab = embedding_dup_pairs(sf_dir, threshold).to_pandas()
    pairs = [(int(a), int(b)) for a, b in zip(pairs_tab["id_a"], pairs_tab["id_b"])]
    roots = _union_find(pairs)
    losers = {m for m, r in roots.items() if r != m}
    losers_ref = ray.put(losers)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id"])

    def keep(batch: pa.Table) -> pa.Table:
        lose = ray.get(losers_ref)
        mask = [v not in lose for v in batch.column("vec_id").to_pylist()]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
