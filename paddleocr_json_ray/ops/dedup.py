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
  2. candidate generation via ONE keyed sort exchange (band hash / simhash
     chunk / shared n-gram) carrying the signature WITH the key row, so
     verification runs vectorized inside each complete sorted run — no
     second corpus pass; oversized buckets are capped (stop-gram behaviour);
  3. the (<= 2 per block) runs straddling a block boundary are healed by a
     ``groupby().map_groups`` over ONLY those boundary rows — distributed,
     never driver-side (per-group Python dispatch is fine there because
     boundary runs are rare);
  4. duplicate clusters are resolved by the distributed star contraction in
     ``ops.cluster`` (no driver union-find); the loser ids are broadcast as
     object-store refs into the survivor filter.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.textstats import char_shingles, fnv1a64, simhash64, word_ngrams
# spanning-star reduction core lives in ops.cluster (resolve_clusters uses
# it too; importing dedup from cluster would cycle) — re-exported here for
# the run verifiers and tests
from .cluster import _forest_reduce

_MERSENNE61 = (1 << 61) - 1


def _read_docs(sf_dir: str, columns: list[str],
               table: str = "documents") -> ray.data.Dataset:
    """Bounded pruned read (see sources.readers.read_table)."""
    from ..sources.readers import read_table

    return read_table(sf_dir, table, columns)


# --------------------------------------------------------------------- exact
def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: keep the smallest doc_id per distinct text.  Identity is
    a 128-bit content hash (blake2b-16) so the keyed exchange ships 24-byte
    rows instead of document bodies; the winner per text is one native
    partial-aggregating ``Min`` groupby (combiner before the exchange).
    Output: surviving doc_ids."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

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
    """In-memory union-find — kept ONLY as the brute-force oracle for tests;
    production cluster resolution is the distributed star contraction in
    ``ops.cluster.resolve_clusters``.  Returns member -> cluster-min."""
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


def _survivors(sf_dir: str, pairs_ds: ray.data.Dataset,
               table: str = "documents", id_col: str = "doc_id") -> ray.data.Dataset:
    """Distributed survivors: star-contract the pair Dataset into clusters,
    broadcast the loser ids as object-store refs, filter the id column."""
    from .cluster import survivor_filter

    from ..sources.readers import read_table

    ds = read_table(sf_dir, table, [id_col])
    return survivor_filter(ds, pairs_ds, id_col)


# ---------------------------------------------------- sorted-run bucketing
_BUCKET_CAP = 256

_EMPTY_PAIRS = pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64())})


def _run_bucket_pairs(batch: pa.Table, key: str, cap: int,
                      id_col: str = "doc_id") -> pa.Table:
    """Per sorted block: unverified candidate pairs from complete interior
    key-runs (vectorized), plus this block's first/last runs passed through
    as edge rows (kind=1) for the distributed heal.  Oversized runs are
    dropped (interior) or truncated to cap+1 (edge) — the cap is the
    stop-gram behaviour shared with the groupby formulation."""
    h = batch.column(key).to_numpy()
    d = batch.column(id_col).to_numpy().astype(np.int64)
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


def _heal_bucket_pairs(edges: ray.data.Dataset, cap: int) -> ray.data.Dataset:
    """Distributed heal: re-group ONLY the boundary edge rows (<= 2 runs per
    block, each truncated to cap+1) by key and emit that run's candidate
    pairs.  A hot key spanning many blocks is healed in one task here, not
    on the driver."""

    def heal(group: pa.Table) -> pa.Table:
        docs = np.unique(group.column("id_a").to_numpy().astype(np.int64))
        if not (2 <= len(docs) <= cap):
            return _EMPTY_PAIRS
        iu, ju = np.triu_indices(len(docs), k=1)
        return pa.table({"id_a": pa.array(docs[iu], type=pa.int64()),
                         "id_b": pa.array(docs[ju], type=pa.int64())})

    return edges.groupby("key").map_groups(heal, batch_format="pyarrow")


def _distinct_pairs(pairs: ray.data.Dataset,
                    extra: str | None = None) -> ray.data.Dataset:
    """Exact distinct (id_a, id_b) via the native partial-aggregating groupby
    (combiner before the exchange — the same pair surfacing from several
    bands/tables/blocks collapses without per-group Python dispatch).  An
    optional ``extra`` column (deterministic per pair) is carried via Max."""
    from ray.data.aggregate import Count, Max

    if extra is None:
        g = pairs.groupby(["id_a", "id_b"]).aggregate(Count())
        return g.select_columns(["id_a", "id_b"])
    g = pairs.groupby(["id_a", "id_b"]).aggregate(Max(extra))
    return g.map_batches(
        lambda b: b.rename_columns(["id_a", "id_b", extra]),
        batch_format="pyarrow")


def _split_kinds(out: ray.data.Dataset, pair_cols: list[str],
                 edge_cols: list[str]) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Split a materialized kind-tagged block output into interior pair rows
    and boundary edge rows (both lazy over the same block refs)."""
    out = out.materialize()
    pairs = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(pair_cols),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(edge_cols),
        batch_format="pyarrow")
    return pairs, edges


# ------------------------------------------------------------- minhash + LSH
_N_PERM = 64
_BANDS = 16
_ROWS_PER_BAND = _N_PERM // _BANDS
# What travels through the band sort is NOT the raw 8-byte lanes but a
# 1-byte FINGERPRINT per lane: verification only tests lane EQUALITY, and
# a false 1-byte match (p = 1/256 per disagreeing lane) cannot lift a
# sub-threshold pair over 0.8*64 = 51 agreeing lanes (a 0.5-jaccard pair
# would need ~19 simultaneous collisions).  8x less sort payload — the
# signature column dominated the exchange (512 B x 16 band rows per doc).
_SIG_BYTES = _N_PERM
_FP_MULT = np.uint64(0x9E3779B97F4A7C15)


def _sig_fingerprints(sigs: np.ndarray) -> np.ndarray:
    """(D, 64) uint8 lane fingerprints of the uint64 signature matrix."""
    with np.errstate(over="ignore"):
        return ((sigs * _FP_MULT) >> np.uint64(56)).astype(np.uint8)


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
    CSR-style, permutations min-reduced with ``np.minimum.reduceat``
    (one 1-D reduceat per permutation: 2-D reduceat over axis 0 with
    short segments is ~75x slower and allocates an (S, 64) intermediate).

    The permutation loop runs over L2-SIZED CHUNKS of the shingle stream,
    not the whole stream per permutation: streaming all S shingles 64
    times is memory-bandwidth-bound (measured: the band stage scaled
    only 1.5-2x from 8->32 cores on one box because 64 full passes over a
    ~3 GB stream saturate DRAM); with a ~64 K-element chunk resident in
    cache, DRAM sees the stream roughly once and the stage is CPU-bound
    again.  Chunk boundaries straddling a document merge via elementwise
    ``np.minimum`` into the output rows."""
    sh = [char_shingles(t) for t in texts]
    lens = np.array([len(s) for s in sh], dtype=np.int64)
    sigs = np.zeros((len(texts), _N_PERM), dtype=np.uint64)
    nz = np.flatnonzero(lens)
    if nz.size:
        all_sh = np.concatenate([sh[i] for i in nz])
        starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
        n_seg = nz.size
        total = len(all_sh)
        out = np.full((n_seg, _N_PERM), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        chunk_sz = 1 << 16
        with np.errstate(over="ignore"):
            for c0 in range(0, total, chunk_sz):
                c1 = min(c0 + chunk_sz, total)
                chunk = all_sh[c0:c1]
                s_first = int(np.searchsorted(starts, c0, "right")) - 1
                s_last = int(np.searchsorted(starts, c1, "left")) - 1
                local = np.r_[c0, starts[s_first + 1:s_last + 1]] - c0
                for p in range(_N_PERM):
                    mins = np.minimum.reduceat(
                        chunk * a_ref[p] + b_ref[p], local)
                    dst = out[s_first:s_last + 1, p]
                    np.minimum(dst, mins, out=dst)
        sigs[nz] = out
    return sigs


def _band_hashes(sigs: np.ndarray) -> np.ndarray:
    """[D, BANDS] FNV-style fold of each band's signature lanes."""
    chunks = sigs.reshape(len(sigs), _BANDS, _ROWS_PER_BAND)
    bh = np.full((len(sigs), _BANDS), 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(_ROWS_PER_BAND):
            bh = (bh ^ chunks[:, :, r]) * np.uint64(0x100000001B3)
    return bh


def _sig_matrix(col) -> np.ndarray:
    """Zero-copy (N, 64) uint8 fingerprint view over a
    fixed_size_binary(64) column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_binary(col.type):
        buf = np.frombuffer(col.buffers()[1], dtype=np.uint8)
        off = col.offset * _N_PERM
        return buf[off:off + len(col) * _N_PERM].reshape(len(col), _N_PERM)
    # variable binary (post-groupby edge rows): per-row copies, tiny groups
    joined = b"".join(col.to_pylist())
    return np.frombuffer(joined, dtype=np.uint8).reshape(len(col), _N_PERM)


def _forest_blocks(pairs: ray.data.Dataset, col_a: str = "id_a",
                   col_b: str = "id_b") -> ray.data.Dataset:
    """Block-local ``_forest_reduce`` over an already-VERIFIED pair
    Dataset: each block's pair set is a subgraph of the global dup graph,
    so replacing it with its spanning star preserves global components.
    Used by the survivors paths whose verification happens at the end of
    the pair pipeline (ngram co-counts, embedding cosine), where the
    source-side run reduction can't apply."""
    empty = pa.table({col_a: pa.array([], type=pa.int64()),
                      col_b: pa.array([], type=pa.int64())})

    def reduce_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        r, m = _forest_reduce(
            batch.column(col_a).to_numpy().astype(np.int64),
            batch.column(col_b).to_numpy().astype(np.int64))
        return pa.table({col_a: pa.array(r, type=pa.int64()),
                         col_b: pa.array(m, type=pa.int64())})

    return pairs.map_batches(reduce_block, batch_format="pyarrow")


def _verify_sig_run(docs: np.ndarray, sigs: np.ndarray, cap: int,
                    threshold: float):
    """One complete bucket run: unique docs (first sig per doc — identical
    within a doc), pairwise signature agreement, keep est >= threshold."""
    uniq, first = np.unique(docs, return_index=True)
    if not (2 <= len(uniq) <= cap):
        return None
    sm = sigs[first]
    iu, ju = np.triu_indices(len(uniq), k=1)
    est = (sm[iu] == sm[ju]).mean(axis=1)
    hit = est >= threshold
    if not hit.any():
        return None
    return uniq[iu[hit]], uniq[ju[hit]], est[hit]


def _minhash_run_rows(batch: pa.Table, cap: int, threshold: float,
                      forest: bool = False) -> pa.Table:
    """Per sorted block: VERIFIED pairs from complete interior band-hash
    runs (signatures travel with the rows — no second corpus pass);
    first/last runs pass through as edge rows for the distributed heal.
    ``forest=True`` (the dedup/components path) collapses the block's
    verified pairs to a component-preserving star — see
    ``_forest_reduce`` — so giant near-dup cliques stay O(k) rows."""
    h = batch.column("band_hash").to_numpy()
    d = batch.column("doc_id").to_numpy().astype(np.int64)
    sigs = _sig_matrix(batch.column("sig"))
    p_a: list[np.ndarray] = []
    p_b: list[np.ndarray] = []
    p_e: list[np.ndarray] = []
    edge_idx: list[np.ndarray] = []
    if len(h):
        bnd = np.flatnonzero(np.diff(h) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(h)]
        for ri in range(len(starts)):
            s, e = int(starts[ri]), int(stops[ri])
            if ri == 0 or ri == len(starts) - 1:
                edge_idx.append(np.arange(s, min(e, s + cap + 1)))
                continue
            got = _verify_sig_run(d[s:e], sigs[s:e], cap, threshold)
            if got is not None:
                p_a.append(got[0])
                p_b.append(got[1])
                p_e.append(got[2])
    z = np.empty(0, dtype=np.int64)
    a_ = np.concatenate(p_a) if p_a else z
    b_ = np.concatenate(p_b) if p_b else z
    e_ = np.concatenate(p_e) if p_e else np.empty(0, dtype=np.float64)
    if forest and len(a_):
        a_, b_ = _forest_reduce(a_, b_)
        e_ = np.zeros(len(a_), dtype=np.float64)  # est not meaningful
    ei = np.concatenate(edge_idx) if edge_idx else z
    n_p, n_e = len(a_), len(ei)
    sig_col = pa.concat_arrays([
        pa.array([b""] * n_p, type=pa.binary()),
        batch.column("sig").combine_chunks().take(pa.array(ei)).cast(pa.binary())
        if n_e else pa.array([], type=pa.binary()),
    ])
    return pa.table({
        "kind": pa.array(np.r_[np.zeros(n_p, dtype=np.int8), np.ones(n_e, dtype=np.int8)]),
        "id_a": pa.array(np.r_[a_, d[ei]], type=pa.int64()),
        "id_b": pa.array(np.r_[b_, np.zeros(n_e, dtype=np.int64)], type=pa.int64()),
        "est_jaccard": pa.array(np.r_[e_, np.zeros(n_e)], type=pa.float64()),
        "key": pa.array(np.r_[np.zeros(n_p, dtype=np.int64), h[ei].astype(np.int64)],
                        type=pa.int64()),
        "sig": sig_col,
    })


def minhash_candidate_pairs(sf_dir: str, threshold: float = 0.8,
                            distinct: bool = True,
                            forest: bool = False) -> ray.data.Dataset:
    """(id_a, id_b, est_jaccard) for LSH-candidate pairs whose signature
    agreement >= threshold.

    ONE corpus pass: each doc's 64-lane signature travels with its 16 band
    rows through the keyed sort, so verification runs vectorized inside each
    complete sorted run.  Boundary runs are healed by a grouped stage over
    only those rows; pairs surfacing from several bands collapse in a native
    distinct groupby.  The driver holds refs only."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    a_ref, b_ref = _perm_params()

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        sigs = _batch_signatures(batch.column("text").to_pylist(), a_ref, b_ref)
        bh = _band_hashes(sigs)
        fps = _sig_fingerprints(sigs)
        sig_bytes = pa.array(
            [s.tobytes() for s in np.repeat(fps, _BANDS, axis=0)],
            type=pa.binary(_SIG_BYTES))
        return pa.table({
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(doc_ids, _BANDS)),
            "sig": sig_bytes,
        })

    sorted_rows = (ds.map_batches(band_rows, batch_format="pyarrow")
                     .sort("band_hash"))
    out = sorted_rows.map_batches(
        lambda b: _minhash_run_rows(b, _BUCKET_CAP, threshold, forest),
        batch_format="pyarrow", batch_size=None)
    interior, edges = _split_kinds(out, ["id_a", "id_b", "est_jaccard"],
                                   ["key", "id_a", "sig"])

    def heal(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "est_jaccard": pa.array([], type=pa.float64())})
        docs = group.column("id_a").to_numpy().astype(np.int64)
        got = _verify_sig_run(docs, _sig_matrix(group.column("sig")),
                              _BUCKET_CAP, threshold)
        if got is None:
            return empty
        ga, gb, ge = got
        if forest and len(ga):
            ga, gb = _forest_reduce(ga, gb)
            ge = np.zeros(len(ga), dtype=np.float64)
        return pa.table({"id_a": pa.array(ga, type=pa.int64()),
                         "id_b": pa.array(gb, type=pa.int64()),
                         "est_jaccard": pa.array(ge, type=pa.float64())})

    healed = edges.groupby("key").map_groups(heal, batch_format="pyarrow")
    both = interior.union(healed)
    # cluster resolution canonicalizes + dedupes pairs itself; the distinct
    # exchange is only for the pairs-as-output query surface
    return _distinct_pairs(both, extra="est_jaccard") if distinct else both


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> ray.data.Dataset:
    # forest=True: survivors only need components, so runs emit stars —
    # edge volume stays linear in docs even for giant near-dup families
    return _survivors(sf_dir, minhash_candidate_pairs(sf_dir, threshold,
                                                      distinct=False,
                                                      forest=True))


# ------------------------------------------------------------------- simhash
def _verify_simhash_run(docs: np.ndarray, sigs: np.ndarray, cap: int,
                        max_hamming: int):
    uniq, first = np.unique(docs, return_index=True)
    if not (2 <= len(uniq) <= cap):
        return None
    sm = sigs[first]
    iu, ju = np.triu_indices(len(uniq), k=1)
    x = sm[iu] ^ sm[ju]
    dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    hit = dist <= max_hamming
    if not hit.any():
        return None
    return uniq[iu[hit]], uniq[ju[hit]]


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3,
                      distinct: bool = True,
                      forest: bool = False) -> ray.data.Dataset:
    """SimHash near-dup pairs: 4x16-bit chunk banding (pigeonhole guarantees
    any pair within hamming<=3 shares at least one chunk).  The 8-byte
    signature travels with each chunk row through the keyed sort; exact
    hamming is verified vectorized inside each complete run, boundary runs
    heal in a grouped stage, and a native distinct groupby collapses pairs
    found by several chunks."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    cap = 512

    def chunk_rows(batch: pa.Table) -> pa.Table:
        keys, dc, sg = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            u = simhash64(text) & 0xFFFFFFFFFFFFFFFF
            s = u - (1 << 64) if u >= (1 << 63) else u
            for c in range(4):
                keys.append((c << 16) | ((u >> (16 * c)) & 0xFFFF))
                dc.append(doc_id)
                sg.append(s)
        return pa.table({"band_hash": pa.array(keys, type=pa.int64()),
                         "doc_id": pa.array(dc, type=pa.int64()),
                         "sig": pa.array(sg, type=pa.int64())})

    def run_rows(batch: pa.Table) -> pa.Table:
        h = batch.column("band_hash").to_numpy()
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        sigs = batch.column("sig").to_numpy().astype(np.int64).view(np.uint64)
        p_a, p_b, edge_idx = [], [], []
        if len(h):
            bnd = np.flatnonzero(np.diff(h) != 0) + 1
            starts = np.r_[0, bnd]
            stops = np.r_[bnd, len(h)]
            for ri in range(len(starts)):
                s, e = int(starts[ri]), int(stops[ri])
                if ri == 0 or ri == len(starts) - 1:
                    edge_idx.append(np.arange(s, min(e, s + cap + 1)))
                    continue
                got = _verify_simhash_run(d[s:e], sigs[s:e], cap, max_hamming)
                if got is not None:
                    p_a.append(got[0])
                    p_b.append(got[1])
        z = np.empty(0, dtype=np.int64)
        a_ = np.concatenate(p_a) if p_a else z
        b_ = np.concatenate(p_b) if p_b else z
        if forest and len(a_):
            a_, b_ = _forest_reduce(a_, b_)
        ei = np.concatenate(edge_idx) if edge_idx else z
        n_p, n_e = len(a_), len(ei)
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(n_p, dtype=np.int8), np.ones(n_e, dtype=np.int8)]),
            "id_a": pa.array(np.r_[a_, d[ei]], type=pa.int64()),
            "id_b": pa.array(np.r_[b_, np.zeros(n_e, dtype=np.int64)], type=pa.int64()),
            "key": pa.array(np.r_[np.zeros(n_p, dtype=np.int64), h[ei].astype(np.int64)],
                            type=pa.int64()),
            "sig": pa.array(np.r_[np.zeros(n_p, dtype=np.int64),
                                  sigs[ei].view(np.int64)], type=pa.int64()),
        })

    out = (ds.map_batches(chunk_rows, batch_format="pyarrow")
             .sort("band_hash")
             .map_batches(run_rows, batch_format="pyarrow", batch_size=None))
    interior, edges = _split_kinds(out, ["id_a", "id_b"], ["key", "id_a", "sig"])

    def heal(group: pa.Table) -> pa.Table:
        docs = group.column("id_a").to_numpy().astype(np.int64)
        sigs = group.column("sig").to_numpy().astype(np.int64).view(np.uint64)
        got = _verify_simhash_run(docs, sigs, cap, max_hamming)
        if got is None:
            return _EMPTY_PAIRS
        ga, gb = got
        if forest and len(ga):
            ga, gb = _forest_reduce(ga, gb)
        return pa.table({"id_a": pa.array(ga, type=pa.int64()),
                         "id_b": pa.array(gb, type=pa.int64())})

    healed = edges.groupby("key").map_groups(heal, batch_format="pyarrow")
    both = interior.union(healed)
    return _distinct_pairs(both) if distinct else both


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """Survivors after SimHash near-dup removal (keep min doc_id per
    cluster); cluster resolution dedupes the pair rows itself."""
    return _survivors(sf_dir, simhash_dup_pairs(sf_dir, max_hamming,
                                                distinct=False, forest=True))


# ------------------------------------------------------------ n-gram jaccard
def ngram_dup_pairs(sf_dir: str, n: int = 3, threshold: float = 0.8,
                    bucket_cap: int = 64) -> ray.data.Dataset:
    """Word n-gram Jaccard pairs >= threshold via a shared-gram inverted
    index.  Per-doc gram counts travel WITH the inverted-index rows (no
    whole-corpus broadcast); the gram exchange is the sorted-run pattern
    (vectorized per block, grouped heal of boundary runs); co-occurrence
    counts are pre-aggregated per block (combiner) and fully reduced by a
    SECOND sorted-run exchange over the packed pair key — the driver never
    sees a pair row."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

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
        edge rows (kind=1) for the grouped heal."""
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
        co-count, na, nb) — the pre-aggregation that keeps the reduce
        exchange O(distinct candidate pairs) instead of O(pair rows)."""
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
             .map_batches(gram_run_rows, batch_format="pyarrow", batch_size=None))
    pairs_ds, edges = _split_kinds(out, ["id_a", "id_b", "na", "nb"],
                                   ["key", "id_a", "na"])

    def heal(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "na": pa.array([], type=pa.int64()),
                          "nb": pa.array([], type=pa.int64())})
        docs = group.column("id_a").to_numpy().astype(np.int64)
        cnts = group.column("na").to_numpy().astype(np.int64)
        order = np.argsort(docs)
        docs, cnts = docs[order], cnts[order]
        if not (2 <= len(docs) <= bucket_cap):
            return empty
        iu, ju = np.triu_indices(len(docs), k=1)
        return pa.table({"id_a": pa.array(docs[iu], type=pa.int64()),
                         "id_b": pa.array(docs[ju], type=pa.int64()),
                         "na": pa.array(cnts[iu], type=pa.int64()),
                         "nb": pa.array(cnts[ju], type=pa.int64())})

    healed = edges.groupby("key").map_groups(heal, batch_format="pyarrow")
    part = (pairs_ds.union(healed)
                    .map_batches(partial_counts, batch_format="pyarrow"))

    # --- second sorted-run exchange: reduce partials per pair key ---
    def reduce_rows(batch: pa.Table) -> pa.Table:
        p = batch.column("pair").to_numpy()
        co = batch.column("co").to_numpy().astype(np.int64)
        na = batch.column("na").to_numpy().astype(np.int64)
        nb = batch.column("nb").to_numpy().astype(np.int64)
        if len(p) == 0:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "pair": pa.array([], type=pa.int64()),
                             "co": pa.array([], type=pa.int64()),
                             "na": pa.array([], type=pa.int64()),
                             "nb": pa.array([], type=pa.int64())})
        bnd = np.flatnonzero(np.diff(p) != 0) + 1
        starts = np.r_[0, bnd]
        sums = np.add.reduceat(co, starts)
        interior = np.arange(1, len(starts) - 1) if len(starts) > 2 else np.empty(0, dtype=np.int64)
        i_pair = p[starts[interior]]
        i_co = sums[interior]
        i_na = na[starts[interior]]
        i_nb = nb[starts[interior]]
        # first/last runs raw (kind=1) for the grouped heal
        first_stop = int(bnd[0]) if len(bnd) else len(p)
        last_start = int(bnd[-1]) if len(bnd) else 0
        ei = np.r_[np.arange(0, first_stop), np.arange(last_start, len(p))] \
            if len(starts) > 1 else np.arange(0, len(p))
        n_i, n_e = len(i_pair), len(ei)
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(n_i, dtype=np.int8), np.ones(n_e, dtype=np.int8)]),
            "pair": pa.array(np.r_[i_pair, p[ei]], type=pa.int64()),
            "co": pa.array(np.r_[i_co, co[ei]], type=pa.int64()),
            "na": pa.array(np.r_[i_na, na[ei]], type=pa.int64()),
            "nb": pa.array(np.r_[i_nb, nb[ei]], type=pa.int64()),
        })

    red = part.sort("pair").map_batches(reduce_rows, batch_format="pyarrow",
                                        batch_size=None)
    done, edge_parts = _split_kinds(red, ["pair", "co", "na", "nb"],
                                    ["pair", "co", "na", "nb"])

    def heal_reduce(group: pa.Table) -> pa.Table:
        return pa.table({
            "pair": group.column("pair").slice(0, 1),
            "co": pa.array([int(pc.sum(group.column("co")).as_py())], type=pa.int64()),
            "na": group.column("na").slice(0, 1),
            "nb": group.column("nb").slice(0, 1),
        })

    healed_parts = edge_parts.groupby("pair").map_groups(heal_reduce,
                                                         batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        packed = batch.column("pair").to_numpy().view(np.uint64)
        co = batch.column("co").to_numpy().astype(np.float64)
        na = batch.column("na").to_numpy().astype(np.float64)
        nb = batch.column("nb").to_numpy().astype(np.float64)
        denom = na + nb - co
        j = np.where(denom > 0, co / np.maximum(denom, 1), 0.0)
        keep = j >= threshold
        return pa.table({
            "id_a": pa.array((packed[keep] >> np.uint64(32)).astype(np.int64)),
            "id_b": pa.array((packed[keep] & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            "jaccard": pa.array(j[keep], type=pa.float64()),
        })

    return done.union(healed_parts).map_batches(finish, batch_format="pyarrow")


def dedup_ngram(sf_dir: str, n: int = 3, threshold: float = 0.8) -> ray.data.Dataset:
    return _survivors(sf_dir,
                      _forest_blocks(ngram_dup_pairs(sf_dir, n, threshold)))


# ------------------------------------------------------- embedding near-dup
def embedding_dup_pairs(sf_dir: str, threshold: float = 0.35) -> ray.data.Dataset:
    """Cosine-similar pairs over the embeddings table.  The full normalized
    matrix is broadcast once via ray.put (read in every task, never
    re-shipped per batch); each batch does one [B, N] float64 matmul.  The
    documented scale path for corpora whose matrix exceeds broadcast budget
    is the LSH-bucketed variant (embedding_bucket_pairs)."""
    import pyarrow.parquet as pq

    from ..ops.similarity import _mat, _normalize

    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = tab.column("vec_id").to_numpy().astype(np.int64)
    mat_ref = ray.put((ids, _normalize(_mat(tab.column("embedding")))))

    ds = _read_docs(sf_dir, ["vec_id", "embedding"], table="embeddings")

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
    """Cosine-similar pairs via multi-table random-hyperplane bucketing.

    Scale shape: the keyed exchange ships 16-byte (packed table:bucket,
    vec_id) rows — vectors are NEVER replicated per table; candidate pairs
    come from the sorted-run pattern (vectorized interior runs, grouped heal
    of boundary runs), collapse in a native distinct groupby, and are then
    verified with exact cosine against the broadcast-once normalized matrix
    (one gather + row-dot per batch).  At corpora whose matrix exceeds
    broadcast budget the verify becomes a partitioned gather-join keyed the
    same way.  Recall < 1 by design — the exact baseline is
    embedding_dup_pairs, which stays the test oracle."""
    import pyarrow.parquet as pq

    from ..ops.similarity import _mat, _normalize

    ds = _read_docs(sf_dir, ["vec_id", "embedding"], table="embeddings")
    planes_holder: dict[int, np.ndarray] = {}

    def table_rows(batch: pa.Table) -> pa.Table:
        mat = _mat(batch.column("embedding"))
        planes = planes_holder.setdefault(mat.shape[1], _dedup_planes(mat.shape[1]))
        # [T, N, P] -> per-table bucket ids; key packs (table, bucket)
        bits = np.einsum("nd,tdp->tnp", mat, planes) > 0
        buckets = (bits * (1 << np.arange(_DEDUP_PLANES))).sum(axis=2).astype(np.int64)
        keys = (np.arange(_DEDUP_TABLES, dtype=np.int64)[:, None] << 16) | buckets
        return pa.table({
            "key": pa.array(keys.reshape(-1), type=pa.int64()),
            "vec_id": pa.array(np.tile(batch.column("vec_id").to_numpy().astype(np.int64),
                                       _DEDUP_TABLES)),
        })

    out = (ds.map_batches(table_rows, batch_format="pyarrow", batch_size=1024)
             .sort("key")
             .map_batches(lambda b: _run_bucket_pairs(b, "key", bucket_cap,
                                                      id_col="vec_id"),
                          batch_format="pyarrow", batch_size=None))
    interior, edges = _split_kinds(out, ["id_a", "id_b"], ["key", "id_a"])
    healed = _heal_bucket_pairs(edges, bucket_cap)

    # exact-cosine verification BEFORE the distinct exchange: candidate
    # volume is O(bucket_size^2) per bucket while verified pairs are
    # dup-bounded, so verify (block-local packed-unique dedupe + one gather
    # per batch against the broadcast-once matrix) shrinks the exchange by
    # orders of magnitude
    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = tab.column("vec_id").to_numpy().astype(np.int64)
    order = np.argsort(ids)
    mat_ref = ray.put((ids[order], _normalize(_mat(tab.column("embedding")))[order]))

    def verify(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        a = batch.column("id_a").to_numpy().astype(np.uint64)
        b = batch.column("id_b").to_numpy().astype(np.uint64)
        u = np.unique((a << np.uint64(32)) | b)  # ids fit 32 bits
        a = (u >> np.uint64(32)).astype(np.int64)
        b = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
        sims = np.einsum("ij,ij->i", all_mat[np.searchsorted(all_ids, a)],
                         all_mat[np.searchsorted(all_ids, b)])
        hit = sims > threshold
        return pa.table({"id_a": pa.array(a[hit], type=pa.int64()),
                         "id_b": pa.array(b[hit], type=pa.int64())})

    verified = (interior.union(healed)
                        .map_batches(verify, batch_format="pyarrow"))
    return _distinct_pairs(verified)


def dedup_embedding(sf_dir: str, threshold: float = 0.35) -> ray.data.Dataset:
    """Survivors after removing cosine-near-dup embeddings (keep min vec_id
    per cluster).  Candidate generation is the bucketed LSH path — the
    O(N^2) ``embedding_dup_pairs`` scan stays exact-baseline only."""
    return _survivors(sf_dir,
                      _forest_blocks(embedding_bucket_pairs(sf_dir, threshold)),
                      table="embeddings", id_col="vec_id")


def semdedup_pairs(sf_dir: str, threshold: float = 0.35,
                   k: int | None = None,
                   bucket_cap: int = 512) -> ray.data.Dataset:
    """Semantic near-dup pairs, SemDeDup-style (Abbas et al.,
    arXiv:2303.09540): partition the embedding space with k-means, then
    compare ONLY within each cluster with exact cosine — the learned-
    partition alternative to ``embedding_bucket_pairs``' random
    hyperplanes (data-adaptive cells follow the density, so a probe
    budget of one cell catches most semantic duplicates; cross-cluster
    pairs are missed by design, the paper's stated trade).

    Scale shape: the k-means rounds are the broadcast-centroid combiner
    loop (`kmeans_embeddings`); cluster ids then key the SAME sorted-run
    exchange as every other dedup family member (16-byte rows, vectorized
    interior runs, grouped boundary heal, cap = stop-cluster), and
    candidates verify against the broadcast-once normalized matrix BEFORE
    the distinct exchange.  k scales with corpus rows (~256 vectors per
    cell) the way IVF planes scale with bytes."""
    import pyarrow.parquet as pq

    from .similarity import _mat, _normalize, kmeans_embeddings

    meta = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata
    if meta.num_rows == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    if k is None:
        k = max(8, meta.num_rows // 256)
    assign = kmeans_embeddings(sf_dir, k=k)

    rows = assign.map_batches(
        lambda b: pa.table({"key": b.column("cluster"),
                            "vec_id": b.column("vec_id")}),
        batch_format="pyarrow")
    out = (rows.sort("key")
               .map_batches(lambda b: _run_bucket_pairs(b, "key", bucket_cap,
                                                        id_col="vec_id"),
                            batch_format="pyarrow", batch_size=None))
    interior, edges = _split_kinds(out, ["id_a", "id_b"], ["key", "id_a"])
    healed = _heal_bucket_pairs(edges, bucket_cap)

    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = tab.column("vec_id").to_numpy().astype(np.int64)
    order = np.argsort(ids)
    mat_ref = ray.put((ids[order],
                       _normalize(_mat(tab.column("embedding")))[order]))

    def verify(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        a = batch.column("id_a").to_numpy().astype(np.uint64)
        b = batch.column("id_b").to_numpy().astype(np.uint64)
        u = np.unique((a << np.uint64(32)) | b)  # ids fit 32 bits
        a = (u >> np.uint64(32)).astype(np.int64)
        b = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
        sims = np.einsum("ij,ij->i", all_mat[np.searchsorted(all_ids, a)],
                         all_mat[np.searchsorted(all_ids, b)])
        hit = sims > threshold
        return pa.table({"id_a": pa.array(a[hit], type=pa.int64()),
                         "id_b": pa.array(b[hit], type=pa.int64())})

    verified = (interior.union(healed)
                        .map_batches(verify, batch_format="pyarrow"))
    return _distinct_pairs(verified)


def semdedup(sf_dir: str, threshold: float = 0.35) -> ray.data.Dataset:
    """Survivors after SemDeDup semantic dedup (keep min vec_id per
    near-dup cluster) — see ``semdedup_pairs`` for the plan."""
    return _survivors(sf_dir, _forest_blocks(semdedup_pairs(sf_dir, threshold)),
                      table="embeddings", id_col="vec_id")


# ------------------------------------------------- cross-source dup auditing
def cross_source_dups(sf_dir: str) -> ray.data.Dataset:
    """(source_a, source_b, n_pairs) — how many EXACT-duplicate document
    pairs each (unordered) source pair shares, diagonal included: the
    curation-audit matrix behind "which feeds are mirroring each other".

    Scale shape: identity is the 24-byte 128-bit content hash (bodies
    never enter the exchange); ONE (hash, hash2) sort co-locates each
    duplicate group; inside a block only rows in runs of length >= 2
    survive to the per-run source-count fold, so the Python loop is
    DUP-BOUNDED, not corpus-bounded (singleton runs — the overwhelming
    mass — are dropped vectorized).  Boundary runs ship (hash, source)
    rows to a grouped heal; pair partials (n_s x n_t cross, C(n,2)
    diagonal) then sum through a native groupby bounded by the SQUARE OF
    THE SOURCE COUNT, not the data.  A single text duplicated across a
    material fraction of the corpus would hot-spot its heal group — the
    same pathology (and the same cap-the-bucket answer) as an LSH
    stop-gram."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "text", "source"])

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib

        h1, h2 = [], []
        for t in batch.column("text").to_pylist():
            d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
            h1.append(int.from_bytes(d[:8], "little", signed=True))
            h2.append(int.from_bytes(d[8:], "little", signed=True))
        return pa.table({"h1": pa.array(h1, type=pa.int64()),
                         "h2": pa.array(h2, type=pa.int64()),
                         "source": batch.column("source")})

    srt = (ds.map_batches(add_hash, batch_format="pyarrow")
           .sort(["h1", "h2"]))

    def _run_source_pairs(srcs_by_run: list[np.ndarray]):
        sa, sb, n = [], [], []
        for s in srcs_by_run:
            u, c = np.unique(s, return_counts=True)
            for i in range(len(u)):
                if c[i] > 1:
                    sa.append(u[i]); sb.append(u[i])
                    n.append(int(c[i] * (c[i] - 1) // 2))
                for j in range(i + 1, len(u)):
                    sa.append(u[i]); sb.append(u[j])
                    n.append(int(c[i] * c[j]))
        return sa, sb, n

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "h1": pa.array([], type=pa.int64()),
                          "h2": pa.array([], type=pa.int64()),
                          "source_a": pa.array([], type=pa.string()),
                          "source_b": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        h1 = batch.column("h1").to_numpy()
        h2 = batch.column("h2").to_numpy()
        src = np.asarray(batch.column("source"))
        bnd = np.flatnonzero((np.diff(h1) != 0) | (np.diff(h2) != 0)) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(h1)]
        interior = (slice(1, len(starts) - 1) if len(starts) > 1
                    else slice(0, 0))
        ist, isp = starts[interior], stops[interior]
        big = (isp - ist) >= 2  # dup-bounded survivors
        sa, sb, n = _run_source_pairs(
            [src[s:e] for s, e in zip(ist[big], isp[big])])
        edge_idx = np.r_[np.arange(starts[0], stops[0]),
                         (np.arange(starts[-1], stops[-1])
                          if len(starts) > 1 else np.empty(0, dtype=np.int64))]
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(n), dtype=np.int8),
                                   np.ones(len(edge_idx), dtype=np.int8)]),
            "h1": pa.array(np.r_[np.zeros(len(n), dtype=np.int64),
                                 h1[edge_idx]]),
            "h2": pa.array(np.r_[np.zeros(len(n), dtype=np.int64),
                                 h2[edge_idx]]),
            "source_a": pa.array(list(sa) + [""] * len(edge_idx),
                                 type=pa.string()),
            "source_b": pa.array(list(sb) + list(src[edge_idx]),
                                 type=pa.string()),
            "n": pa.array(np.r_[np.asarray(n, dtype=np.int64),
                                np.zeros(len(edge_idx), dtype=np.int64)]),
        })

    out = srt.map_batches(block_pairs, batch_format="pyarrow",
                          batch_size=None)
    interior, edges = _split_kinds(out, ["source_a", "source_b", "n"],
                                   ["h1", "h2", "source_b"])

    def heal(group: pa.Table) -> pa.Table:
        sa, sb, n = _run_source_pairs(
            [np.asarray(group.column("source_b"))])
        return pa.table({"source_a": pa.array(list(sa), type=pa.string()),
                         "source_b": pa.array(list(sb), type=pa.string()),
                         "n": pa.array(np.asarray(n, dtype=np.int64))})

    healed = edges.groupby(["h1", "h2"]).map_groups(heal,
                                                    batch_format="pyarrow")
    # full-matrix zero seed: every (s_a <= s_b) source pair appears even
    # with no dups (matrix semantics + the output can never go empty,
    # which would drop the schema).  Source list is domain-bounded.
    from ray.data.aggregate import Count

    srcs = sorted(r["source"] for r in
                  ds.groupby("source").aggregate(Count()).take_all())
    sa = [srcs[i] for i in range(len(srcs)) for _ in range(i, len(srcs))]
    sb = [srcs[j] for i in range(len(srcs)) for j in range(i, len(srcs))]
    seed = ray.data.from_arrow(pa.table(
        {"source_a": pa.array(sa, type=pa.string()),
         "source_b": pa.array(sb, type=pa.string()),
         "n": pa.array(np.zeros(len(sa), dtype=np.int64))}))
    agg = (interior.union(healed).union(seed)
           .groupby(["source_a", "source_b"]).aggregate(Sum("n")))
    return agg.map_batches(
        lambda b: pa.table({"source_a": b.column("source_a"),
                            "source_b": b.column("source_b"),
                            "n_pairs": b.column("sum(n)")}),
        batch_format="pyarrow")


def _exact_hash_batch(batch: pa.Table) -> pa.Table:
    import hashlib

    h1, h2 = [], []
    for t in batch.column("text").to_pylist():
        d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
        h1.append(int.from_bytes(d[:8], "little", signed=True))
        h2.append(int.from_bytes(d[8:], "little", signed=True))
    return pa.table({"text_hash": pa.array(h1, type=pa.int64()),
                     "h2": pa.array(h2, type=pa.int64()),
                     "doc_id": batch.column("doc_id")})


def dedup_exact_incremental(sf_dir: str, index_dir: str,
                            update_index: bool = True,
                            broadcast_max_rows: int | None = None
                            ) -> ray.data.Dataset:
    """Exact dedup of a NEW corpus increment against a PERSISTED hash index
    (the daily-crawl pattern: at 100 TB/day you dedup each increment against
    history, never re-shuffle the history).  Output: surviving doc_ids —
    unique within the increment (smallest doc_id per text) AND unseen in the
    index.  With ``update_index`` the survivors' hashes are APPENDED as a
    new parquet file (incremental index growth, no rewrite: each run adds
    one run-stamped file, so a crashed run never corrupts prior state).

    Invariant (pinned in pytest): running increments A then B equals
    ``dedup_exact`` over A+B whenever B's doc_ids follow A's — the exact
    situation of time-ordered ingestion.

    Scale plan: the increment reduces to 24-byte (hash, min doc_id) rows
    via the same per-batch combiner + native Min groupby as ``dedup_exact``;
    the history probe is SIZE-TIERED (house rule, env override
    ``PJR_DEDUP_IDX_BROADCAST_MAX``): up to the cap the index broadcasts as
    ONE sorted packed array read zero-copy from the object store per node
    (16-byte rows — 1B historical docs ~ 16 GB); beyond it the probe runs
    as a partitioned hash ANTI-join against the index dataset, bytes-scaled
    partitions, nothing index-sized on any single node.  Tier equality is
    pinned in pytest with ``broadcast_max_rows=0``."""
    import glob

    from ray.data.aggregate import Min

    if broadcast_max_rows is None:
        broadcast_max_rows = int(os.environ.get(
            "PJR_DEDUP_IDX_BROADCAST_MAX", 5_000_000))

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    winners = (ds.map_batches(_exact_hash_batch, batch_format="pyarrow")
                 .groupby(["text_hash", "h2"]).aggregate(Min("doc_id"))
                 .map_batches(
                     lambda b: pa.table({"text_hash": b.column("text_hash"),
                                         "h2": b.column("h2"),
                                         "doc_id": b.column("min(doc_id)")}),
                     batch_format="pyarrow"))

    files = sorted(glob.glob(os.path.join(index_dir, "*.parquet")))
    import pyarrow.parquet as pq

    idx_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    if files and idx_rows > broadcast_max_rows:
        # beyond-broadcast tier: partitioned hash anti-join vs the index
        from .relational import _join_partitions

        idx_ds = ray.data.read_parquet(files, columns=["text_hash", "h2"])
        fresh = winners.join(
            idx_ds, "left_anti", on=("text_hash", "h2"),
            num_partitions=_join_partitions(winners, idx_ds))
    else:
        pair_dt = np.dtype([("h1", np.int64), ("h2", np.int64)])

        def _pack2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
            out = np.empty(len(a), dtype=pair_dt)
            out["h1"] = a
            out["h2"] = b
            return out

        if files:
            idx = pq.read_table(files, columns=["text_hash", "h2"])
            key = _pack2(idx.column("text_hash").to_numpy(),
                         idx.column("h2").to_numpy())
            key.sort()  # structured sort == lexicographic (h1, h2)
            seen_ref = ray.put(key)
        else:
            seen_ref = ray.put(np.empty(0, dtype=pair_dt))

        def unseen(batch: pa.Table, ref) -> pa.Table:
            seen = ray.get(ref)
            if len(seen):
                # one vectorized two-key membership probe: structured
                # (h1, h2) keys compare lexicographically, so a single
                # searchsorted + equality check replaces per-row run scans
                q = _pack2(batch.column("text_hash").to_numpy(),
                           batch.column("h2").to_numpy())
                pos = np.searchsorted(seen, q, side="left")
                inb = pos < len(seen)
                hit = np.zeros(len(q), dtype=bool)
                hit[inb] = seen[pos[inb]] == q[inb]
                batch = batch.filter(pa.array(~hit))
            return batch

        fresh = winners.map_batches(unseen, batch_format="pyarrow",
                                    fn_args=(seen_ref,))
    if update_index:
        os.makedirs(index_dir, exist_ok=True)
        fresh = fresh.materialize()
        fresh.select_columns(["text_hash", "h2"]).write_parquet(index_dir)
    return fresh.select_columns(["doc_id"]).sort("doc_id")


# --------------------------------------------------------------- line-level
_LINE_IDX_BITS = 22  # lines-per-doc bound (4M); doc_id then fits 41 bits


def dedup_lines(sf_dir: str, delimiter: str = "\n") -> ray.data.Dataset:
    """RefinedWeb-style exact LINE dedup: split every document into lines,
    keep only the globally FIRST occurrence of each distinct line (order =
    (doc_id, line index)), rebuild documents from their surviving lines and
    drop documents left empty.  Output: (doc_id, text, n_lines).

    The shipped corpus has no newlines (round-3 note), so the oracled query
    registers with delimiter=' ' — the exchange plan is delimiter-blind and
    the '\\n' path is pinned by pytest on newline-bearing synthetic docs.

    Scale plan (100 TB shape): two sort exchanges, ZERO joins / broadcasts /
    hashes.  The line TEXT itself is the sort key (it must travel for the
    rebuild anyway, so keying by it adds no volume and removes hash-collision
    risk entirely):
      1. explode — vectorized ``split_pattern`` per batch, one row per line
         carrying pos = doc_id << 22 | idx;
      2. sort (line, pos) — the first row of each line run is the keep-first
         winner; interior runs resolve block-locally, the <= 2 boundary runs
         per block emit ONE candidate row each, healed by a grouped min-pos
         pick (a hot line spanning B blocks costs B one-row candidates,
         never its copy count);
      3. sort survivors by pos — block-local per-doc joins, the <= 2
         boundary doc runs per block emit partials healed by a grouped
         concat in pos order (same partial-sessions shape as sessionize).
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch.column("text"), delimiter)
        flat = lists.combine_chunks() if isinstance(
            lists, pa.ChunkedArray) else lists
        if isinstance(flat, pa.ChunkedArray):  # 0-chunk edge
            flat = pa.concat_arrays(flat.chunks) if flat.num_chunks else \
                pa.array([], type=pa.list_(pa.string()))
        offs = flat.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        doc = batch.column("doc_id").to_numpy().astype(np.int64)
        if counts.size and counts.max() >= (1 << _LINE_IDX_BITS):
            raise ValueError("document exceeds the 4M lines/doc bound")
        idx = np.arange(int(offs[-1]) if len(offs) else 0,
                        dtype=np.int64) - np.repeat(offs[:-1], counts)
        pos = (np.repeat(doc, counts) << _LINE_IDX_BITS) | idx
        return pa.table({"line": flat.values, "pos": pa.array(pos)})

    srt = ds.map_batches(explode, batch_format="pyarrow").sort(
        ["line", "pos"])

    def firsts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table({"kind": pa.array([], type=pa.int8()),
                          "line": pa.array([], type=pa.string()),
                          "pos": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        lines = batch.column("line")
        neq = pc.not_equal(lines.slice(1), lines.slice(0, n - 1))
        bnd = np.flatnonzero(neq.combine_chunks().to_numpy(
            zero_copy_only=False)) + 1
        starts = np.r_[0, bnd]
        kind = np.zeros(len(starts), dtype=np.int8)
        kind[0] = kind[-1] = 1  # runs touching a block edge -> candidates
        take = pa.array(starts)
        return pa.table({"kind": pa.array(kind),
                         "line": lines.take(take),
                         "pos": batch.column("pos").take(take)})

    marked = srt.map_batches(firsts, batch_format="pyarrow",
                             batch_size=None).materialize()
    finals = marked.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(
            ["line", "pos"]), batch_format="pyarrow")
    edges = marked.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(
            ["line", "pos"]), batch_format="pyarrow")

    def heal_min(group: pa.Table) -> pa.Table:
        win = int(np.argmin(group.column("pos").to_numpy()))
        return group.slice(win, 1).select(["line", "pos"])

    survivors = finals.union(
        edges.groupby("line").map_groups(heal_min, batch_format="pyarrow"))

    rebuilt = survivors.sort("pos")

    def join_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string()),
                             "n_lines": pa.array([], type=pa.int64()),
                             "min_pos": pa.array([], type=pa.int64())})
        pos = batch.column("pos").to_numpy().astype(np.int64)
        doc = pos >> _LINE_IDX_BITS
        lines = batch.column("line").to_pylist()
        bnd = np.flatnonzero(np.diff(doc) != 0) + 1
        starts = np.r_[0, bnd]
        ends = np.r_[bnd, n]
        kind = np.zeros(len(starts), dtype=np.int8)
        kind[0] = kind[-1] = 1  # doc runs touching a block edge -> partials
        return pa.table({
            "kind": pa.array(kind),
            "doc_id": pa.array(doc[starts]),
            "text": pa.array([delimiter.join(lines[s:e])
                              for s, e in zip(starts, ends)]),
            "n_lines": pa.array((ends - starts).astype(np.int64)),
            "min_pos": pa.array(pos[starts]),
        })

    parts = rebuilt.map_batches(join_docs, batch_format="pyarrow",
                                batch_size=None).materialize()
    out_cols = ["doc_id", "text", "n_lines"]
    doc_finals = parts.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(out_cols),
        batch_format="pyarrow")
    doc_edges = parts.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)),
        batch_format="pyarrow")

    def heal_concat(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("min_pos").to_numpy())
        texts = group.column("text").to_pylist()
        n = group.column("n_lines").to_numpy()
        return pa.table({
            "doc_id": group.column("doc_id").slice(0, 1),
            "text": pa.array([delimiter.join(texts[i] for i in order)]),
            "n_lines": pa.array([int(n.sum())], type=pa.int64()),
        })

    healed = doc_edges.groupby("doc_id").map_groups(
        heal_concat, batch_format="pyarrow")
    return doc_finals.union(healed)


def dup_cluster_histogram(sf_dir: str) -> ray.data.Dataset:
    """(cluster_size, n_clusters) sorted by size — the exact-duplicate
    cluster-size DISTRIBUTION: the one-page audit behind "is my corpus 2x
    boilerplate or a few mega-mirrors?" that decides which dedup tier to
    run before paying for it.

    Scale shape: identity is the 24-byte 128-bit content hash (bodies
    never enter the exchange); per-block distinct (h1, h2, cnt) combiners
    feed ONE (h1, h2) sort; interior runs are complete so their size is
    final in-block, boundary runs heal grouped; the final histogram is a
    per-block (size, n) bincount merged on the driver — O(distinct sizes)
    rows, never O(texts)."""
    import hashlib

    ds = _read_docs(sf_dir, ["text"])

    def hash_counts(batch: pa.Table) -> pa.Table:
        h1, h2 = [], []
        for t in batch.column("text").to_pylist():
            d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
            h1.append(int.from_bytes(d[:8], "little", signed=True))
            h2.append(int.from_bytes(d[8:], "little", signed=True))
        a = np.asarray(h1, dtype=np.int64)
        b = np.asarray(h2, dtype=np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        st = (np.r_[0, np.flatnonzero((np.diff(a) != 0) | (np.diff(b) != 0))
                    + 1] if len(a) else np.empty(0, dtype=np.int64))
        return pa.table({"h1": pa.array(a[st]), "h2": pa.array(b[st]),
                         "cnt": pa.array(np.diff(np.r_[st, len(a)]))})

    empty = pa.table({"kind": pa.array([], type=pa.int8()),
                      "h1": pa.array([], type=pa.int64()),
                      "h2": pa.array([], type=pa.int64()),
                      "cnt": pa.array([], type=pa.int64())})

    def runs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        h1 = b.column("h1").to_numpy()
        h2 = b.column("h2").to_numpy()
        c = b.column("cnt").to_numpy().astype(np.int64)
        bnd = np.flatnonzero((np.diff(h1) != 0) | (np.diff(h2) != 0)) + 1
        starts = np.r_[0, bnd]
        n_runs = len(starts)
        tot = np.add.reduceat(c, starts)
        interior = np.arange(1, n_runs - 1) if n_runs > 1 else np.empty(
            0, dtype=np.int64)
        edge = np.unique(np.r_[0, n_runs - 1])
        sel = np.r_[interior, edge]
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(interior), dtype=np.int8),
                                   np.ones(len(edge), dtype=np.int8)]),
            "h1": pa.array(h1[starts[sel]].astype(np.int64)),
            "h2": pa.array(h2[starts[sel]].astype(np.int64)),
            "cnt": pa.array(tot[sel]),
        })

    out = (ds.map_batches(hash_counts, batch_format="pyarrow")
           .sort(["h1", "h2"])
           .map_batches(runs, batch_format="pyarrow", batch_size=None))
    interior, edges = _split_kinds(out, ["cnt"], ["h1", "h2", "cnt"])

    def heal(group: pa.Table) -> pa.Table:
        return pa.table({"cnt": pa.array(
            [int(pc.sum(group.column("cnt")).as_py())], type=pa.int64())})

    healed = edges.groupby(["h1", "h2"]).map_groups(heal,
                                                    batch_format="pyarrow")

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"size": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        u, c = np.unique(b.column("cnt").to_numpy().astype(np.int64),
                         return_counts=True)
        return pa.table({"size": pa.array(u), "n": pa.array(
            c.astype(np.int64))})

    parts = [t for t in (ray.get(r) for r in
                         interior.union(healed)
                         .map_batches(hist_partial, batch_format="pyarrow")
                         .to_arrow_refs()) if t.num_rows]
    if not parts:
        return ray.data.from_arrow(pa.table({
            "cluster_size": pa.array([], type=pa.int64()),
            "n_clusters": pa.array([], type=pa.int64())}))
    merged = pa.concat_tables(parts)
    sizes = merged.column("size").to_numpy().astype(np.int64)
    ns = merged.column("n").to_numpy().astype(np.int64)
    u, inv = np.unique(sizes, return_inverse=True)
    tot = np.zeros(len(u), dtype=np.int64)
    np.add.at(tot, inv, ns)
    return ray.data.from_arrow(pa.table({
        "cluster_size": pa.array(u), "n_clusters": pa.array(tot)}))
