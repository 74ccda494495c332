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
    """Exact dedup: keep the smallest doc_id per distinct text.  Identity is
    a 128-bit content hash (blake2b-16) so the keyed exchange ships 24-byte
    rows instead of document bodies; the winner per text is one native
    partial-aggregating ``Min`` groupby (combiner before the exchange).
    Output: surviving doc_ids."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib

        h1, h2 = [], []
        for t in batch.column("text").to_pylist():
            d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
            h1.append(int.from_bytes(d[:8], "little", signed=True))
            h2.append(int.from_bytes(d[8:], "little", signed=True))
        return pa.table({"text_hash": pa.array(h1, type=pa.int64()),
                         "h2": pa.array(h2, type=pa.int64()),
                         "doc_id": batch.column("doc_id")})

    from ray.data.aggregate import Min

    agg = (ds.map_batches(add_hash, batch_format="pyarrow")
             .groupby(["text_hash", "h2"]).aggregate(Min("doc_id")))
    return agg.map_batches(
        lambda b: pa.table({"doc_id": b.column("min(doc_id)")}),
        batch_format="pyarrow")


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


def _survivors_from_pairs(sf_dir: str, pairs: list[tuple[int, int]],
                          table: str = "documents", id_col: str = "doc_id") -> ray.data.Dataset:
    roots = _union_find(pairs)
    losers_ref = ray.put(pa.array(sorted(m for m, r in roots.items() if r != m),
                                  type=pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        lose = ray.get(losers_ref)
        return batch.filter(pc.invert(pc.is_in(batch.column(id_col), value_set=lose)))

    ds = ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=[id_col])
    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------- sorted-run bucketing
_BUCKET_CAP = 256


def _run_bucket_pairs(batch: pa.Table, key: str, cap: int) -> pa.Table:
    """Per sorted block: unverified candidate pairs from complete interior
    key-runs (vectorized), plus this block's first/last runs passed through
    as edge rows (kind=1) for driver-side healing.  Oversized runs are
    dropped (interior) or truncated to cap+1 (edge) — the cap is the
    stop-gram behaviour shared with the groupby formulation."""
    h = batch.column(key).to_numpy()
    d = batch.column("doc_id").to_numpy().astype(np.int64)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    edge_h: list[np.ndarray] = []
    edge_d: list[np.ndarray] = []
    if len(h):
        bnd = np.flatnonzero(np.diff(h) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(h)]
        for ri in range(len(starts)):
            s, e = int(starts[ri]), int(stops[ri])
            if ri == 0 or ri == len(starts) - 1:
                e2 = min(e, s + cap + 1)
                edge_h.append(h[s:e2])
                edge_d.append(d[s:e2])
                continue
            if e - s < 2:
                continue
            docs = np.unique(d[s:e])
            if 2 <= len(docs) <= cap:
                iu, ju = np.triu_indices(len(docs), k=1)
                out_a.append(docs[iu])
                out_b.append(docs[ju])
    pa_ = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    pb_ = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    eh = np.concatenate(edge_h) if edge_h else np.empty(0, dtype=h.dtype if len(h) else np.int64)
    ed = np.concatenate(edge_d) if edge_d else np.empty(0, dtype=np.int64)
    n_p, n_e = len(pa_), len(eh)
    return pa.table({
        "kind": pa.array(np.r_[np.zeros(n_p, dtype=np.int8), np.ones(n_e, dtype=np.int8)]),
        "id_a": pa.array(np.r_[pa_, ed], type=pa.int64()),
        "id_b": pa.array(np.r_[pb_, np.zeros(n_e, dtype=np.int64)], type=pa.int64()),
        "key": pa.array(np.r_[np.zeros(n_p, dtype=np.int64), eh.astype(np.int64)],
                        type=pa.int64()),
    })


def _heal_edge_pairs(cand, cap: int) -> list[tuple[int, int]]:
    """Driver-side: interior pairs + pairs from the re-grouped edge rows."""
    pairs = {(int(a), int(b))
             for k, a, b in zip(cand["kind"], cand["id_a"], cand["id_b"]) if k == 0}
    edge = cand[cand["kind"] == 1]
    for _, grp in edge.groupby("key"):
        docs = np.unique(grp["id_a"].to_numpy().astype(np.int64))
        if 2 <= len(docs) <= cap:
            iu, ju = np.triu_indices(len(docs), k=1)
            pairs.update(zip(docs[iu].tolist(), docs[ju].tolist()))
    return sorted(pairs)


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


def _batch_signatures(texts: list[str], a_ref: np.ndarray, b_ref: np.ndarray) -> np.ndarray:
    """Vectorized MinHash signatures for a whole batch: shingles laid out
    CSR-style, all 64 permutations min-reduced in one ``np.minimum.reduceat``."""
    sh = [char_shingles(t) for t in texts]
    lens = np.array([len(s) for s in sh], dtype=np.int64)
    sigs = np.zeros((len(texts), _N_PERM), dtype=np.uint64)
    nz = np.flatnonzero(lens)
    if nz.size:
        all_sh = np.concatenate([sh[i] for i in nz])
        starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
        with np.errstate(over="ignore"):
            vals = all_sh[:, None] * a_ref[None, :] + b_ref[None, :]
        sigs[nz] = np.minimum.reduceat(vals, starts, axis=0)
    return sigs


def _band_hashes(sigs: np.ndarray) -> np.ndarray:
    """[D, BANDS] FNV-style fold of each band's signature lanes."""
    chunks = sigs.reshape(len(sigs), _BANDS, _ROWS_PER_BAND)
    bh = np.full((len(sigs), _BANDS), 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(_ROWS_PER_BAND):
            bh = (bh ^ chunks[:, :, r]) * np.uint64(0x100000001B3)
    return bh


def minhash_candidate_pairs(sf_dir: str, threshold: float = 0.8) -> ray.data.Dataset:
    """(id_a, id_b, est_jaccard) for LSH-candidate pairs whose signature
    agreement >= threshold.

    Two passes, both vectorized: (1) ship ONLY (band, band_hash, doc_id)
    through the keyed exchange — 24-byte rows, not 500-byte signatures —
    and emit unverified candidate pairs per bucket; (2) recompute signatures
    for just the candidate docs (dup-bounded set, broadcast filter) and
    verify agreement on the driver.  Driver state is candidates + pairs,
    never the corpus."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    a_ref, b_ref = _perm_params()

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        sigs = _batch_signatures(batch.column("text").to_pylist(), a_ref, b_ref)
        bh = _band_hashes(sigs)
        return pa.table({
            "band": pa.array(np.tile(np.arange(_BANDS, dtype=np.int32), len(doc_ids))),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(doc_ids, _BANDS)),
        })

    # Candidate buckets via sort + per-block RUN detection instead of
    # groupby().map_groups: the sort is the same keyed exchange, but run
    # processing is vectorized per block (~10us/run instead of a Python
    # group dispatch per bucket — the buckets are overwhelmingly singletons).
    # A run can straddle two adjacent range-partitioned blocks, so each
    # block's FIRST and LAST runs are emitted as edge rows and re-grouped on
    # the driver (bounded: <= 2 x cap rows per block).
    sorted_rows = (ds.map_batches(band_rows, batch_format="pyarrow")
                     .sort("band_hash"))
    cand = sorted_rows.map_batches(
        lambda b: _run_bucket_pairs(b, "band_hash", _BUCKET_CAP),
        batch_format="pyarrow", batch_size=None).to_pandas()
    pairs = _heal_edge_pairs(cand, _BUCKET_CAP)
    if not pairs:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64())}))

    cand_ids = pa.array(sorted({d for p in pairs for d in p}), type=pa.int64())
    cand_ref = ray.put(cand_ids)

    def cand_sigs(batch: pa.Table) -> pa.Table:
        sel = pc.is_in(batch.column("doc_id"), value_set=ray.get(cand_ref))
        batch = batch.filter(sel)
        sigs = _batch_signatures(batch.column("text").to_pylist(), a_ref, b_ref)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "sig": pa.array([s.tobytes() for s in sigs], type=pa.binary())})

    sig_tab = ds.map_batches(cand_sigs, batch_format="pyarrow").to_pandas()
    sig_ids = sig_tab["doc_id"].to_numpy().astype(np.int64)
    sig_mat = np.frombuffer(b"".join(sig_tab["sig"]), dtype=np.uint64).reshape(-1, _N_PERM)
    order = np.argsort(sig_ids)
    sig_ids, sig_mat = sig_ids[order], sig_mat[order]
    parr = np.asarray(pairs, dtype=np.int64)
    ai = np.searchsorted(sig_ids, parr[:, 0])
    bi = np.searchsorted(sig_ids, parr[:, 1])
    est = (sig_mat[ai] == sig_mat[bi]).mean(axis=1)
    hit = est >= threshold
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array(parr[hit, 0], type=pa.int64()),
        "id_b": pa.array(parr[hit, 1], type=pa.int64()),
        "est_jaccard": pa.array(est[hit], type=pa.float64())}))


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> ray.data.Dataset:
    pairs_df = minhash_candidate_pairs(sf_dir, threshold).to_pandas()
    pairs = [(int(a), int(b)) for a, b in zip(pairs_df["id_a"], pairs_df["id_b"])]
    return _survivors_from_pairs(sf_dir, pairs)


# ------------------------------------------------------------------- simhash
def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup: 4x16-bit chunk banding (pigeonhole guarantees any
    pair within hamming<=3 shares at least one chunk).  Candidate pairs via
    the sorted-run exchange (key = chunk_idx:chunk_val packed in one int64),
    exact hamming verified on the dup-bounded candidate set with signatures
    recomputed in a broadcast-filtered second pass."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def chunk_rows(batch: pa.Table) -> pa.Table:
        keys, dc = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            u = simhash64(text) & 0xFFFFFFFFFFFFFFFF
            for c in range(4):
                keys.append((c << 16) | ((u >> (16 * c)) & 0xFFFF))
                dc.append(doc_id)
        return pa.table({"band_hash": pa.array(keys, type=pa.int64()),
                         "doc_id": pa.array(dc, type=pa.int64())})

    cand = (ds.map_batches(chunk_rows, batch_format="pyarrow")
              .sort("band_hash")
              .map_batches(lambda b: _run_bucket_pairs(b, "band_hash", 512),
                           batch_format="pyarrow", batch_size=None)).to_pandas()
    candidates = _heal_edge_pairs(cand, 512)
    if not candidates:
        return _survivors_from_pairs(sf_dir, [])

    cand_ids = pa.array(sorted({d for p in candidates for d in p}), type=pa.int64())
    cand_ref = ray.put(cand_ids)

    def cand_sigs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch.column("doc_id"), value_set=ray.get(cand_ref)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.array([simhash64(t) for t in batch.column("text").to_pylist()],
                            type=pa.int64())})

    sig_tab = ds.map_batches(cand_sigs, batch_format="pyarrow").to_pandas()
    sig_ids = sig_tab["doc_id"].to_numpy().astype(np.int64)
    sigs = sig_tab["sig"].to_numpy().astype(np.int64).view(np.uint64)
    order = np.argsort(sig_ids)
    sig_ids, sigs = sig_ids[order], sigs[order]
    parr = np.asarray(candidates, dtype=np.int64)
    x = sigs[np.searchsorted(sig_ids, parr[:, 0])] ^ sigs[np.searchsorted(sig_ids, parr[:, 1])]
    dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    hit = dist <= max_hamming
    return _survivors_from_pairs(sf_dir, [tuple(p) for p in parr[hit]])


# ------------------------------------------------------------ n-gram jaccard
def ngram_dup_pairs(sf_dir: str, n: int = 3, threshold: float = 0.8,
                    bucket_cap: int = 64) -> ray.data.Dataset:
    """Word n-gram Jaccard pairs >= threshold via a shared-gram inverted
    index.  Per-doc gram counts travel WITH the inverted-index rows (no
    whole-corpus broadcast); the gram exchange is the sorted-run pattern
    (vectorized per block, driver-healed edges); co-occurrence counts are
    pre-aggregated per block (combiner) and merged driver-side over the
    dup-bounded distinct-pair set."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        gh, dc, cnt = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            grams = word_ngrams(text, n)  # a set: distinct grams
            for g in grams:
                gh.append(fnv1a64(g.encode("utf-8")))
                dc.append(doc_id)
                cnt.append(len(grams))
        return pa.table({"gram": pa.array(gh, type=pa.int64()),
                         "doc_id": pa.array(dc, type=pa.int64()),
                         "n_grams": pa.array(cnt, type=pa.int64())})

    def gram_run_rows(batch: pa.Table) -> pa.Table:
        """Per sorted block: pair rows (kind=0, with both docs' gram counts)
        from complete interior gram runs; first/last runs pass through as
        edge rows (kind=1) for driver-side healing."""
        g = batch.column("gram").to_numpy()
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        c = batch.column("n_grams").to_numpy().astype(np.int64)
        pa_l, pb_l, na_l, nb_l = [], [], [], []
        eg, ed, ec = [], [], []
        if len(g):
            bnd = np.flatnonzero(np.diff(g) != 0) + 1
            starts = np.r_[0, bnd]
            stops = np.r_[bnd, len(g)]
            for ri in range(len(starts)):
                s, e = int(starts[ri]), int(stops[ri])
                if ri == 0 or ri == len(starts) - 1:
                    e2 = min(e, s + bucket_cap + 1)
                    eg.append(g[s:e2])
                    ed.append(d[s:e2])
                    ec.append(c[s:e2])
                    continue
                if not (2 <= e - s <= bucket_cap):  # stop-gram cap
                    continue
                order = np.argsort(d[s:e])
                docs, cnts = d[s:e][order], c[s:e][order]
                iu, ju = np.triu_indices(len(docs), k=1)
                pa_l.append(docs[iu])
                pb_l.append(docs[ju])
                na_l.append(cnts[iu])
                nb_l.append(cnts[ju])
        z = np.empty(0, dtype=np.int64)
        p_a = np.concatenate(pa_l) if pa_l else z
        p_b = np.concatenate(pb_l) if pb_l else z
        n_a = np.concatenate(na_l) if na_l else z
        n_b = np.concatenate(nb_l) if nb_l else z
        e_g = np.concatenate(eg) if eg else z
        e_d = np.concatenate(ed) if ed else z
        e_c = np.concatenate(ec) if ec else z
        np_, ne = len(p_a), len(e_g)
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(np_, dtype=np.int8), np.ones(ne, dtype=np.int8)]),
            "id_a": pa.array(np.r_[p_a, e_d], type=pa.int64()),
            "id_b": pa.array(np.r_[p_b, np.zeros(ne, dtype=np.int64)], type=pa.int64()),
            "na": pa.array(np.r_[n_a, e_c], type=pa.int64()),
            "nb": pa.array(np.r_[n_b, np.zeros(ne, dtype=np.int64)], type=pa.int64()),
            "key": pa.array(np.r_[np.zeros(np_, dtype=np.int64), e_g], type=pa.int64()),
        })

    def partial_counts(batch: pa.Table) -> pa.Table:
        """Combiner: collapse this block's pair rows to (pair, partial
        co-count, na, nb) — the pre-aggregation that keeps the final merge
        O(distinct candidate pairs) instead of O(pair rows)."""
        a = batch.column("id_a").to_numpy().astype(np.uint64)
        b = batch.column("id_b").to_numpy().astype(np.uint64)
        packed = (a << np.uint64(32)) | b  # doc ids fit 32 bits
        u, idx, cnt = np.unique(packed, return_index=True, return_counts=True)
        return pa.table({
            "pair": pa.array(u.view(np.int64)),
            "co": pa.array(cnt.astype(np.int64)),
            "na": pa.array(batch.column("na").to_numpy().astype(np.int64)[idx]),
            "nb": pa.array(batch.column("nb").to_numpy().astype(np.int64)[idx]),
        })

    out = (ds.map_batches(gram_rows, batch_format="pyarrow")
             .sort("gram")
             .map_batches(gram_run_rows, batch_format="pyarrow", batch_size=None)
             .materialize())  # split interior pairs from edge rows in one pass
    pair_cols = ["id_a", "id_b", "na", "nb"]
    pairs_ds = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(pair_cols),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(["key", "id_a", "na"]),
        batch_format="pyarrow").to_pandas()
    ea, eb, ena, enb = [], [], [], []
    for _, grp in edges.groupby("key"):
        docs = grp["id_a"].to_numpy().astype(np.int64)
        cnts = grp["na"].to_numpy().astype(np.int64)
        order = np.argsort(docs)
        docs, cnts = docs[order], cnts[order]
        if 2 <= len(docs) <= bucket_cap:
            iu, ju = np.triu_indices(len(docs), k=1)
            ea.append(docs[iu])
            eb.append(docs[ju])
            ena.append(cnts[iu])
            enb.append(cnts[ju])
    if ea:
        edge_ds = ray.data.from_arrow(pa.table({
            "id_a": pa.array(np.concatenate(ea), type=pa.int64()),
            "id_b": pa.array(np.concatenate(eb), type=pa.int64()),
            "na": pa.array(np.concatenate(ena), type=pa.int64()),
            "nb": pa.array(np.concatenate(enb), type=pa.int64()),
        }))
        pairs_ds = pairs_ds.union(edge_ds)
    # merge the partial counts on the driver: state is O(distinct candidate
    # pairs) — the same dup-bounded set every dedup variant holds — and the
    # numpy merge replaces a measured-40x-slower native multi-agg exchange
    part = pairs_ds.map_batches(partial_counts, batch_format="pyarrow").to_pandas()
    packed = part["pair"].to_numpy().view(np.uint64)
    u, inv = np.unique(packed, return_inverse=True)
    co = np.zeros(len(u), dtype=np.int64)
    np.add.at(co, inv, part["co"].to_numpy().astype(np.int64))
    first = np.zeros(len(u), dtype=np.int64)
    first[inv[::-1]] = np.arange(len(packed) - 1, -1, -1)
    na = part["na"].to_numpy().astype(np.int64)[first]
    nb = part["nb"].to_numpy().astype(np.int64)[first]
    denom = (na + nb - co).astype(np.float64)
    j = np.where(denom > 0, co / np.maximum(denom, 1), 0.0)
    keep = j >= threshold
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array((u[keep] >> np.uint64(32)).astype(np.int64)),
        "id_b": pa.array((u[keep] & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        "jaccard": pa.array(j[keep], type=pa.float64()),
    }))


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

    from ..ops.similarity import _mat, _normalize

    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = tab.column("vec_id").to_numpy().astype(np.int64)
    mat_ref = ray.put((ids, _normalize(_mat(tab.column("embedding")))))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = batch.column("vec_id").to_numpy().astype(np.int64)
        sims = _normalize(_mat(batch.column("embedding"))) @ all_mat.T
        r, c = np.where((sims > threshold) & (bids[:, None] < all_ids[None, :]))
        return pa.table({"id_a": pa.array(bids[r], type=pa.int64()),
                         "id_b": pa.array(all_ids[c], type=pa.int64())})

    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=256)


# multi-table angular LSH for the bucketed near-dup path (NOT the knn index:
# near-dup wants high recall at a similarity threshold, so more tables with
# fewer planes each)
_DEDUP_TABLES = 12
_DEDUP_PLANES = 6


def _dedup_planes(dim: int, seed: int = 77) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.standard_normal((_DEDUP_TABLES, dim, _DEDUP_PLANES))


def embedding_bucket_pairs(sf_dir: str, threshold: float = 0.35,
                           bucket_cap: int = 512) -> ray.data.Dataset:
    """Cosine-similar pairs via multi-table random-hyperplane bucketing:
    each vector lands in one bucket per table, pairs are verified with exact
    cosine INSIDE buckets only, and pairs found by several tables are
    deduplicated with a keyed groupby.  No full-matrix broadcast, no O(N^2)
    scan — recall < 1 by design (the exact baseline is embedding_dup_pairs,
    which stays the test oracle)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    planes_holder: dict[int, np.ndarray] = {}

    def table_rows(batch: pa.Table) -> pa.Table:
        from ..ops.similarity import _mat

        mat = _mat(batch.column("embedding"))
        planes = planes_holder.setdefault(mat.shape[1], _dedup_planes(mat.shape[1]))
        # [T, N] bucket ids
        bits = np.einsum("nd,tdp->tnp", mat, planes) > 0
        buckets = (bits * (1 << np.arange(_DEDUP_PLANES))).sum(axis=2).astype(np.int64)
        n = len(batch)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({
            "table": pa.array(np.repeat(np.arange(_DEDUP_TABLES, dtype=np.int32), n)),
            "bucket": pa.array(buckets.reshape(-1), type=pa.int64()),
            "vec_id": pa.array(np.tile(batch.column("vec_id").to_numpy().astype(np.int64),
                                       _DEDUP_TABLES)),
            "embedding": pa.concat_arrays([emb] * _DEDUP_TABLES),
        })

    def bucket_verify(group: pa.Table) -> pa.Table:
        from ..ops.similarity import _mat, _normalize

        ids = group.column("vec_id").to_numpy().astype(np.int64)
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if not (2 <= len(ids) <= bucket_cap):
            return empty
        order = np.argsort(ids)
        ids = ids[order]
        norm = _normalize(_mat(group.column("embedding")))[order]
        sims = norm @ norm.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] > threshold
        return pa.table({"id_a": pa.array(ids[iu[hit]], type=pa.int64()),
                         "id_b": pa.array(ids[ju[hit]], type=pa.int64())})

    pairs = (ds.map_batches(table_rows, batch_format="pyarrow", batch_size=1024)
               .groupby(["table", "bucket"])
               .map_groups(bucket_verify, batch_format="pyarrow"))
    # the same pair surfaces from several tables -> dedupe on the pair key
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def dedup_embedding(sf_dir: str, threshold: float = 0.35) -> ray.data.Dataset:
    """Survivors after removing cosine-near-dup embeddings (keep min vec_id
    per cluster).  Candidate generation is the bucketed LSH path — the
    O(N^2) ``embedding_dup_pairs`` scan stays exact-baseline only."""
    pairs_tab = embedding_bucket_pairs(sf_dir, threshold).to_pandas()
    pairs = [(int(a), int(b)) for a, b in zip(pairs_tab["id_a"], pairs_tab["id_b"])]
    return _survivors_from_pairs(sf_dir, pairs, table="embeddings", id_col="vec_id")
