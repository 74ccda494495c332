"""Distributed duplicate-cluster resolution — connected components over a
candidate-pair Dataset with NO driver-side union-find.

Algorithm: alternating Large-Star / Small-Star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", ACM SoCC 2014).  Both stars are per-node
neighborhood operations, so each round is expressed as the repo's
sorted-run exchange: sort the (directed) edge rows by source node,
process every COMPLETE interior run vectorized inside ``map_batches``,
and heal the (<= 2 per block) runs touching a block boundary with a
``groupby().map_groups`` over ONLY those boundary rows — per-group Python
dispatch is fine there because boundary runs are rare, and a hot node
whose run spans many blocks is healed in one distributed task instead of
on the driver.

Star semantics (min-id convention):
  * Large-Star at node u over full neighborhood G(u):
      m = min(G(u) + {u}); emit edge (m, v) for every v in G(u), v > u.
  * Small-Star at node u over smaller neighbors G-(u) = {v in G(u), v < u}:
      m = min(G-(u)); emit (m, v) for v in (G-(u) - {m}) + {u}.
Alternating the two converges in O(log^2 n) rounds to a star forest whose
centers are the component minima; duplicate-heavy graphs (near-cliques)
converge in 1-2 rounds.  Convergence is detected by a per-block FNV
checksum + count of the canonical edge set (a control-plane scalar per
block — the edge DATA never lands on the driver).

Tiering: dup-bounded edge sets (the common case — every dedup variant
verifies before clustering) solve in ONE remote worker task with a
vectorized min-hook + pointer-jumping union-find; only edge sets past
``PJR_CLUSTER_TASK_MAX`` pay the multi-round star exchange.  The driver
holds only object refs either way: ``survivor_filter`` broadcasts the
loser-id blocks via ``Dataset.to_arrow_refs`` and the filter tasks read
them zero-copy from the object store.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

_MAX_ROUNDS = 24
# Below this edge count the component solve runs in ONE remote worker task
# (hash-join build-side sized: tens of MB).  The driver still only passes
# block refs; star contraction is the beyond-threshold path and tests pin
# it via PJR_CLUSTER_TASK_MAX=0.
_TASK_MAX_EDGES = int(os.environ.get("PJR_CLUSTER_TASK_MAX", 4_000_000))
_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


# ------------------------------------------------------------------ helpers
def _snap(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize AND cut lineage.  ``materialize()`` alone keeps the full
    logical plan attached, and in an iterative loop every round's execution
    re-optimizes the whole history — measured ~4x slowdown PER ROUND on a
    constant 200-row edge set.  Rebuilding from the materialized block refs
    makes round cost flat."""
    return ray.data.from_arrow_refs(ds.materialize().to_arrow_refs())


def _edge_table(lo: np.ndarray, hi: np.ndarray) -> pa.Table:
    return pa.table({"lo": pa.array(lo, type=pa.int64()),
                     "hi": pa.array(hi, type=pa.int64())})


_EMPTY_EDGES = _edge_table(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))


def _dedupe_sorted_cols(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (a, b) rows, lexsorted — no 32-bit id-packing assumption."""
    if len(a) == 0:
        return a, b
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (np.diff(a) != 0) | (np.diff(b) != 0)]
    return a[keep], b[keep]


def _forest_reduce(ia: np.ndarray, jb: np.ndarray):
    """Component-preserving spanning star of a pair set that fits one
    task: (root, member) edges, root = component min, at most one edge per
    non-root node instead of O(k^2) clique pairs.

    Sound because connected components of a union of subgraphs are
    invariant under replacing any subgraph with a forest that keeps its
    LOCAL components — so run verifiers may emit their run's star, block
    passes may re-star their block, and the global ``resolve_clusters``
    answer is unchanged.  Giant near-dup cliques are the scale hazard this
    removes: a 500-doc family is 124,750 pairs per band but 499 star
    edges (measured on the x40 salted corpus: 8.36M pair rows -> 0.25M)."""
    ids = np.unique(np.concatenate([ia, jb]))
    a = np.searchsorted(ids, ia)
    b = np.searchsorted(ids, jb)
    parent = np.arange(len(ids))
    while True:
        pa_, pb_ = parent[a], parent[b]
        changed = pa_ != pb_
        if not changed.any():
            break
        np.minimum.at(parent, a[changed], pb_[changed])
        np.minimum.at(parent, b[changed], pa_[changed])
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
    member = parent != np.arange(len(ids))
    return ids[parent[member]], ids[member]


def _forest_edge_block(batch: pa.Table) -> pa.Table:
    """Block-local spanning star over canonical (lo, hi) edge rows."""
    if batch.num_rows == 0:
        return _EMPTY_EDGES
    lo, hi = _forest_reduce(batch.column("lo").to_numpy().astype(np.int64),
                            batch.column("hi").to_numpy().astype(np.int64))
    return _edge_table(lo, hi)


def _canon_batch(batch: pa.Table, col_a: str, col_b: str) -> pa.Table:
    """Canonical (lo < hi) edges, self-loops dropped, block-local distinct."""
    a = batch.column(col_a).to_numpy().astype(np.int64)
    b = batch.column(col_b).to_numpy().astype(np.int64)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo != hi
    lo, hi = _dedupe_sorted_cols(lo[keep], hi[keep])
    return _edge_table(lo, hi)


def _star_block(batch: pa.Table, large: bool) -> pa.Table:
    """One sorted block of directed rows (u asc): star-contract every
    complete interior u-run; pass first/last runs through as boundary rows
    (kind=1) for the distributed heal."""
    u = batch.column("u").to_numpy().astype(np.int64)
    v = batch.column("v").to_numpy().astype(np.int64)
    out_lo: list[np.ndarray] = []
    out_hi: list[np.ndarray] = []
    e_u: list[np.ndarray] = []
    e_v: list[np.ndarray] = []
    if len(u):
        bnd = np.flatnonzero(np.diff(u) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(u)]
        for ri in range(len(starts)):
            s, e = int(starts[ri]), int(stops[ri])
            if ri == 0 or ri == len(starts) - 1:
                e_u.append(u[s:e])
                e_v.append(v[s:e])
                continue
            lo, hi = _star_one(int(u[s]), v[s:e], large)
            out_lo.append(lo)
            out_hi.append(hi)
    z = np.empty(0, dtype=np.int64)
    lo = np.concatenate(out_lo) if out_lo else z
    hi = np.concatenate(out_hi) if out_hi else z
    eu = np.concatenate(e_u) if e_u else z
    ev = np.concatenate(e_v) if e_v else z
    return pa.table({
        "kind": pa.array(np.r_[np.zeros(len(lo), dtype=np.int8),
                               np.ones(len(eu), dtype=np.int8)]),
        "lo": pa.array(np.r_[lo, eu], type=pa.int64()),
        "hi": pa.array(np.r_[hi, ev], type=pa.int64()),
    })


def _star_one(u: int, nbrs: np.ndarray, large: bool) -> tuple[np.ndarray, np.ndarray]:
    """Star-contract one complete neighborhood; returns canonical (lo, hi)
    edge arrays (lo < hi everywhere by construction of m)."""
    nbrs = np.unique(nbrs)
    if large:
        m = min(int(nbrs[0]), u)
        out = nbrs[nbrs > u]
        return np.full(len(out), m, dtype=np.int64), out
    smaller = nbrs[nbrs < u]
    if len(smaller) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    m = int(smaller[0])
    out = np.r_[smaller[1:], np.int64(u)]
    return np.full(len(out), m, dtype=np.int64), out


def _star_heal_fn(large: bool):
    def heal(group: pa.Table) -> pa.Table:
        u = int(group.column("u")[0].as_py())
        v = group.column("v").to_numpy().astype(np.int64)
        lo, hi = _star_one(u, v, large)
        return _edge_table(lo, hi)

    return heal


def _star_round(edges: ray.data.Dataset, large: bool) -> ray.data.Dataset:
    """One star round: expand directions, keyed sort, vectorized complete
    runs, grouped heal of boundary runs."""

    def expand(batch: pa.Table) -> pa.Table:
        lo = batch.column("lo").to_numpy().astype(np.int64)
        hi = batch.column("hi").to_numpy().astype(np.int64)
        if large:
            # every edge seen from both endpoints (full neighborhoods)
            return pa.table({"u": pa.array(np.r_[lo, hi], type=pa.int64()),
                             "v": pa.array(np.r_[hi, lo], type=pa.int64())})
        # small-star processes each edge at its LARGER endpoint only
        return pa.table({"u": pa.array(hi, type=pa.int64()),
                         "v": pa.array(lo, type=pa.int64())})

    rows = edges.map_batches(expand, batch_format="pyarrow").sort("u")
    out = rows.map_batches(lambda b: _star_block(b, large),
                           batch_format="pyarrow", batch_size=None).materialize()
    import pyarrow.compute as pc

    interior = out.map_batches(
        lambda b: _canon_batch(b.filter(pc.equal(b.column("kind"), 0)), "lo", "hi"),
        batch_format="pyarrow")
    boundary = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)).select(["lo", "hi"])
                   .rename_columns(["u", "v"]),
        batch_format="pyarrow")
    healed = boundary.groupby("u").map_groups(_star_heal_fn(large),
                                              batch_format="pyarrow")
    return interior.union(healed)


def _checksum(edges: ray.data.Dataset) -> tuple[int, int]:
    """(n_edges, fnv-mix sum) of the DISTINCT canonical edge set — computed
    per block; the driver receives one scalar pair per block."""

    def part(batch: pa.Table) -> pa.Table:
        lo = batch.column("lo").to_numpy().astype(np.int64).view(np.uint64)
        hi = batch.column("hi").to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            h = (_FNV_OFF ^ lo) * _FNV_PRIME
            h = (h ^ hi) * _FNV_PRIME
        return pa.table({"n": pa.array([len(lo)], type=pa.int64()),
                         "s": pa.array([int(h.sum(dtype=np.uint64)) - (1 << 63)],
                                       type=pa.int64())})

    t = edges.map_batches(part, batch_format="pyarrow").to_pandas()
    if len(t) == 0:
        return 0, 0
    return int(t["n"].sum()), int(np.sum(t["s"].to_numpy().view(np.uint64),
                                         dtype=np.uint64))


def _distinct_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distinct canonical edges via the native partial-aggregating
    groupby (combiner before the exchange; no per-group Python dispatch)."""
    from ray.data.aggregate import Count

    return edges.groupby(["lo", "hi"]).aggregate(Count()).select_columns(["lo", "hi"])


# Broadcast the distinct edge set for the triangle membership test while
# it stays object-store sized (8M edges = 64 MB of packed keys); beyond,
# the hash-partitioned groupby path takes over (tests pin it via env 0).
_TRI_BROADCAST_MAX = int(os.environ.get("PJR_TRI_BROADCAST_MAX", 8_000_000))
_PACK_MAX_ID = 3_037_000_499  # floor(sqrt(2^63)) - 1: id*m + id fits int64


@ray.remote
def _tri_info_task(*blocks: pa.Table):
    """((sorted nodes, degrees, packed sorted edge keys | None, m),
    packable) of a canonical edge set — one worker task over edge block
    refs; the LUT is node/edge-bounded and stays in the object store."""
    blocks = [b for b in blocks if b.num_rows]
    lo = np.concatenate([b.column("lo").to_numpy() for b in blocks]).astype(np.int64)
    hi = np.concatenate([b.column("hi").to_numpy() for b in blocks]).astype(np.int64)
    nodes, counts = np.unique(np.r_[lo, hi], return_counts=True)
    m = int(nodes[-1]) + 1 if len(nodes) else 1
    if m > _PACK_MAX_ID:
        return (nodes, counts.astype(np.int64), None, 0), False
    keys = np.sort(lo * m + hi)
    return (nodes, counts.astype(np.int64), keys, m), True


@ray.remote
def _solve_components_task(*blocks: pa.Table) -> pa.Table:
    """Single-task component solve over a bounded edge set: vectorized
    pointer-jumping union-find (memory O(edges), never on the driver)."""
    blocks = [b for b in blocks if b.num_rows]  # empty blocks keep pre-map schema
    lo = np.concatenate([b.column("lo").to_numpy() for b in blocks]).astype(np.int64)
    hi = np.concatenate([b.column("hi").to_numpy() for b in blocks]).astype(np.int64)
    nodes, inv = np.unique(np.r_[lo, hi], return_inverse=True)
    a, b = inv[:len(lo)], inv[len(lo):]
    parent = np.arange(len(nodes))
    while True:
        # hook each edge's larger root under its smaller root, then compress
        ra, rb = parent[a], parent[b]
        lo_r, hi_r = np.minimum(ra, rb), np.maximum(ra, rb)
        changed = lo_r != hi_r
        if not changed.any():
            break
        # np.minimum.at resolves conflicting hooks to the smallest label
        np.minimum.at(parent, hi_r[changed], lo_r[changed])
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
    member = parent != np.arange(len(nodes))
    return pa.table({"node": pa.array(nodes[member], type=pa.int64()),
                     "root": pa.array(nodes[parent[member]], type=pa.int64())})


def resolve_clusters(pairs: ray.data.Dataset,
                     col_a: str = "id_a", col_b: str = "id_b",
                     task_max_edges: int | None = None) -> ray.data.Dataset:
    """Candidate duplicate pairs -> (node, root) labels, root = component
    minimum; only non-root members are returned (the loser set).  Fully
    distributed: the driver sees per-round (count, checksum) scalars only.

    Tiered: edge sets under ``PJR_CLUSTER_TASK_MAX`` solve in one remote
    worker task (the common dup-bounded case — iterating the star exchange
    on a small edge set pays ~10 fixed exchange costs per round for
    nothing); larger sets run the O(log^2 n)-round star contraction."""
    edges = _snap(pairs.map_batches(lambda b: _canon_batch(b, col_a, col_b),
                                    batch_format="pyarrow"))
    n = edges.count()  # metadata-only on a materialized dataset
    if n == 0:
        return ray.data.from_arrow(pa.table({"node": pa.array([], type=pa.int64()),
                                             "root": pa.array([], type=pa.int64())}))
    if task_max_edges is None:
        task_max_edges = _TASK_MAX_EDGES
    # Over-tier volume rounds: one skinny-row sort co-locates duplicate
    # edges (e.g. the ~16 per-band copies of each star edge), then a
    # block-local spanning star collapses duplicates AND chains in one
    # vectorized pass — the cheap alternative to a native two-key
    # distinct (measured 64 s on 8M rows) that usually demotes the edge
    # set back under the single-task tier.  Component-preserving per
    # block, so the final answer is unchanged; star contraction stays
    # the fallback if the rounds stop shrinking.
    rounds = 0
    while task_max_edges > 0 and n > task_max_edges and rounds < 3:
        reduced = _snap(edges.sort(["lo", "hi"])
                        .map_batches(_forest_edge_block,
                                     batch_format="pyarrow",
                                     batch_size=None))
        n2 = reduced.count()
        rounds += 1
        if n2 >= n:
            break
        edges, n = reduced, n2
    if n <= task_max_edges:
        refs = edges.to_arrow_refs()
        return ray.data.from_arrow_refs([_solve_components_task.remote(*refs)])
    prev = None
    for _ in range(_MAX_ROUNDS):
        # bound the physical block count each round — sort/union/groupby
        # otherwise multiply blocks geometrically across iterations
        nb = int(max(1, min(128, n // 200_000 + 1)))
        edges = _star_round(edges, large=True)
        edges = _snap(_distinct_edges(_star_round(edges, large=False))
                      .repartition(nb))
        chk = _checksum(edges)
        n = chk[0]
        if chk == prev:
            break
        prev = chk
    else:  # pragma: no cover - O(log^2 n) bound makes this unreachable
        raise RuntimeError("star contraction did not converge")
    # converged star forest: every edge is (root=component min, member)
    return edges.map_batches(
        lambda b: pa.table({"node": b.column("hi"), "root": b.column("lo")}),
        batch_format="pyarrow")


# ------------------------------------------------------- survivor filtering
def _loser_filter_fn(batch: pa.Table, loser_refs: list, id_col: str) -> pa.Table:
    """Broadcast filter: pulls the loser-id blocks from the object store
    (zero-copy plasma reads, shared across tasks on a node — the driver
    ships refs, never the data)."""
    tabs = [t for t in ray.get(list(loser_refs)) if t.num_rows]
    losers = (np.sort(pa.concat_tables(tabs).column("node").to_numpy()
                      .astype(np.int64))
              if tabs else np.empty(0, dtype=np.int64))
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    if not len(losers):
        return batch
    pos = np.minimum(np.searchsorted(losers, ids), len(losers) - 1)
    return batch.filter(pa.array(losers[pos] != ids))


def survivor_filter(ds: ray.data.Dataset, pairs: ray.data.Dataset,
                    id_col: str) -> ray.data.Dataset:
    """Drop every non-root member of every duplicate cluster from ``ds``.
    Losers are resolved distributed (star contraction / bounded task solve)
    and broadcast as object-store refs; at loser volumes beyond object-store
    budget the same labels Dataset feeds a partitioned anti-join instead.
    Task-based (not an actor pool): plasma gets are zero-copy and shared,
    and actor-pool spin-up costs seconds on short jobs."""
    labels = resolve_clusters(pairs).materialize()
    refs = labels.to_arrow_refs()
    return ds.map_batches(_loser_filter_fn, batch_format="pyarrow",
                          fn_args=(refs, id_col))


def _run_triu_pairs(vals_sorted: np.ndarray, starts: np.ndarray,
                    stops: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-run (lo, hi) pairs, vectorized per distinct run length."""
    lens = stops - starts
    out_a, out_b = [], []
    for k in np.unique(lens):
        if k < 2:
            continue
        sel = starts[lens == k]
        runs = vals_sorted[sel[:, None] + np.arange(k)]  # (R, k) sorted
        iu, ju = np.triu_indices(int(k), k=1)
        out_a.append(runs[:, iu].ravel())
        out_b.append(runs[:, ju].ravel())
    if not out_a:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(out_a), np.concatenate(out_b)


def _grouped_triu_pairs(srt: ray.data.Dataset, group_col: str,
                        val_col: str) -> ray.data.Dataset:
    """(id_a, id_b) — every within-group ordered value pair of a
    ``(group_col, val_col)``-sorted dataset, as the repo's sorted-run
    exchange: complete interior runs expand vectorized per run length;
    the (<= 2 per block) boundary runs ship whole to a grouped heal.
    Sound only while group sizes stay bounded (the callers': lines per
    order <= 7; degree-oriented out-degree = O(sqrt(edges)))."""
    import pyarrow.compute as pc

    def pairs_and_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"kind": pa.array([], type=pa.int8()),
                             "g": pa.array([], type=pa.int64()),
                             "id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        g = batch.column(group_col).to_numpy().astype(np.int64)
        v = batch.column(val_col).to_numpy().astype(np.int64)
        bnd = np.flatnonzero(np.diff(g) != 0) + 1
        starts = np.r_[0, bnd]
        stops = np.r_[bnd, len(g)]
        interior = slice(1, len(starts) - 1) if len(starts) > 1 else slice(0, 0)
        a, b = _run_triu_pairs(v, starts[interior], stops[interior])
        n_pairs = len(a)
        # boundary runs (first + last group in the block) ship whole
        edge_idx = np.r_[np.arange(starts[0], stops[0]),
                         (np.arange(starts[-1], stops[-1])
                          if len(starts) > 1 else np.empty(0, dtype=np.int64))]
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(n_pairs, dtype=np.int8),
                                   np.ones(len(edge_idx), dtype=np.int8)]),
            "g": pa.array(np.r_[np.zeros(n_pairs, dtype=np.int64),
                                g[edge_idx]]),
            "id_a": pa.array(np.r_[a, v[edge_idx]]),
            "id_b": pa.array(np.r_[b, v[edge_idx]]),
        })

    out = srt.map_batches(pairs_and_edges, batch_format="pyarrow",
                          batch_size=None).materialize()
    interior_pairs = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0))
                   .select(["id_a", "id_b"]), batch_format="pyarrow")
    boundary_rows = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["g", "id_a"]), batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        p = np.unique(group.column("id_a").to_numpy().astype(np.int64))
        if len(p) < 2:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        iu, ju = np.triu_indices(len(p), k=1)
        return pa.table({"id_a": pa.array(p[iu]), "id_b": pa.array(p[ju])})

    healed_pairs = boundary_rows.groupby("g").map_groups(
        heal, batch_format="pyarrow")
    return interior_pairs.union(healed_pairs)


def _copurchase_pairs(sf_dir: str, min_qty: float) -> ray.data.Dataset:
    """(id_a, id_b) part pairs co-purchased in one order with quantity >=
    ``min_qty`` (with duplicates — callers canonicalize/distinct)."""
    import pyarrow.compute as pc

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
                    filter=pc.field("l_quantity") >= pa.scalar(min_qty))
    return _grouped_triu_pairs(ds.sort(["l_orderkey", "l_partkey"]),
                               "l_orderkey", "l_partkey")


def copurchase_components(sf_dir: str, min_qty: float = 45.0) -> ray.data.Dataset:
    """(part_id, component) — connected components of the part
    co-purchase graph (parts linked when one order carries both with
    quantity >= ``min_qty``), component = the member minimum.  The
    GRAPH-query surface of the cluster machinery, with a recursive-CTE SQL
    oracle — dedup clusters exercise the same resolver but have no SQL
    form.

    Plan: one (orderkey, partkey) sort co-locates each order's qualifying
    rows; interior runs emit their pairs via a run-length-grouped
    vectorized expansion (order size is bounded — TPC-H caps lines per
    order at 7 — so pair volume is <= 21x run count), boundary runs ship
    whole (bounded by order size) to a grouped pair heal
    (``_grouped_triu_pairs``).  Components resolve in ``resolve_clusters``
    (task solve / star contraction), and the final label map is ONE native
    Min groupby over (self-label ∪ loser-root) rows — no join."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from ..sources.readers import read_table

    ds = read_table(sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
                    filter=pc.field("l_quantity") >= pa.scalar(min_qty))
    labels = resolve_clusters(_copurchase_pairs(sf_dir, min_qty))

    # label map: min(self, loser-root) per node through ONE native groupby
    selfs = ds.map_batches(
        lambda b: pa.table({"part_id": b.column("l_partkey"),
                            "lbl": b.column("l_partkey")}),
        batch_format="pyarrow")
    roots = labels.map_batches(
        lambda b: pa.table({"part_id": b.column("node"),
                            "lbl": b.column("root")}),
        batch_format="pyarrow")
    agg = selfs.union(roots).groupby("part_id").aggregate(Min("lbl"))
    return agg.map_batches(
        lambda b: pa.table({"part_id": b.column("part_id"),
                            "component": b.column("min(lbl)")}),
        batch_format="pyarrow")


def copurchase_triangles(sf_dir: str, min_qty: float = 40.0) -> ray.data.Dataset:
    """(n_triangles,) — exact triangle count of the part co-purchase graph
    (same edge rule as ``copurchase_components``, default threshold lower
    so the graph is dense enough to close triangles).

    Degree-oriented node-iterator (Suri & Vassilvitskii, WWW'11 — "the
    curse of the last reducer"): orient every distinct edge from its
    lower-(degree, id) endpoint to the higher, so each node's out-degree
    is O(sqrt(E)) and a hub's wedge fan-out collapses from deg^2 to E.
    Every triangle is then generated by exactly ONE pivot (its minimum
    vertex in the (degree, id) total order) as a wedge between two
    out-neighbors, and counted iff the closing pair is an edge.

    Plan: distinct canonical edges via the native partial-agg groupby;
    degrees via one remote task over the materialized edge refs
    (node-bounded output — a Count-groupby exchange costs a full fixed
    aggregation round for the same table; at corpus scale where even the
    node table outgrows the object store, orientation becomes two hash
    joins instead); wedges expand through the ``_grouped_triu_pairs``
    sorted-run exchange.  The closing-edge membership test is TIERED like
    cluster resolution: while the distinct edge set fits the object store
    (``PJR_TRI_BROADCAST_MAX``, and ids pack into int64), it broadcasts
    once as sorted packed keys and each wedge batch counts members with a
    ``searchsorted`` — no exchange at all; the beyond-threshold path is
    ONE hash-partitioned native groupby over (wedge ∪ edge) rows — Sum of
    wedge multiplicity, Max of the edge flag — so matching co-locates
    without any driver materialization of pairs (equality-tested against
    the broadcast tier)."""
    from ray.data.aggregate import Max, Sum

    pairs = _copurchase_pairs(sf_dir, min_qty)
    edges = _snap(_distinct_edges(pairs.map_batches(
        lambda b: _canon_batch(b, "id_a", "id_b"), batch_format="pyarrow")))
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table({"n_triangles": pa.array([0], type=pa.int64())}))

    lut_ref, packable_ref = _tri_info_task.options(num_returns=2).remote(
        *edges.to_arrow_refs())

    def orient(batch: pa.Table, lut) -> pa.Table:
        nd, dg, _, _ = ray.get(lut) if isinstance(lut, ray.ObjectRef) else lut
        lo = batch.column("lo").to_numpy().astype(np.int64)
        hi = batch.column("hi").to_numpy().astype(np.int64)
        swap = dg[np.searchsorted(nd, hi)] < dg[np.searchsorted(nd, lo)]
        return pa.table({"src": pa.array(np.where(swap, hi, lo)),
                         "dst": pa.array(np.where(swap, lo, hi))})

    oriented = edges.map_batches(orient, batch_format="pyarrow",
                                 fn_args=(lut_ref,))
    wedges = _grouped_triu_pairs(oriented.sort(["src", "dst"]), "src", "dst")

    if n_edges <= _TRI_BROADCAST_MAX and ray.get(packable_ref):
        def member_count(batch: pa.Table, lut) -> pa.Table:
            _, _, keys, m = ray.get(lut) if isinstance(lut, ray.ObjectRef) else lut
            a = batch.column("id_a").to_numpy().astype(np.int64)
            b = batch.column("id_b").to_numpy().astype(np.int64)
            k = a * m + b
            pos = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
            return pa.table({"c": pa.array([int((keys[pos] == k).sum())],
                                           type=pa.int64())})

        total = (wedges.map_batches(member_count, batch_format="pyarrow",
                                    fn_args=(lut_ref,))
                 .aggregate(Sum("c")))
        return ray.data.from_arrow(pa.table(
            {"n_triangles": pa.array([int(total["sum(c)"] or 0)],
                                     type=pa.int64())}))

    w_rows = wedges.map_batches(
        lambda b: pa.table({"a": b.column("id_a"), "b": b.column("id_b"),
                            "w": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                            "e": pa.array(np.zeros(b.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
    e_rows = edges.map_batches(
        lambda b: pa.table({"a": b.column("lo"), "b": b.column("hi"),
                            "w": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                            "e": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
    agg = (w_rows.union(e_rows).groupby(["a", "b"])
           .aggregate(Sum("w"), Max("e")))

    def part_count(batch: pa.Table) -> pa.Table:
        w = batch.column("sum(w)").to_numpy()
        e = batch.column("max(e)").to_numpy()
        return pa.table({"c": pa.array([int(w[e > 0].sum())], type=pa.int64())})

    total = agg.map_batches(part_count, batch_format="pyarrow").aggregate(Sum("c"))
    return ray.data.from_arrow(pa.table(
        {"n_triangles": pa.array([int(total["sum(c)"] or 0)], type=pa.int64())}))


_PR_ITERS = 8
_PR_DAMP = 0.85
_PR_TASK_MAX = int(os.environ.get("PJR_PR_TASK_MAX", 4_000_000))


@ray.remote
def _pagerank_task(iters: int, *blocks: pa.Table) -> pa.Table:
    """Power iteration over a bounded canonical edge set in one worker
    task (the common tier — mirrors _solve_components_task)."""
    blocks = [b for b in blocks if b.num_rows]
    lo = np.concatenate([b.column("lo").to_numpy() for b in blocks]).astype(np.int64)
    hi = np.concatenate([b.column("hi").to_numpy() for b in blocks]).astype(np.int64)
    nodes, inv = np.unique(np.r_[lo, hi], return_inverse=True)
    src = np.r_[inv[:len(lo)], inv[len(lo):]]   # both directions
    dst = np.r_[inv[len(lo):], inv[:len(lo)]]
    nn = len(nodes)
    deg = np.bincount(src, minlength=nn).astype(np.float64)
    r = np.full(nn, 1.0 / nn)
    for _ in range(iters):
        contrib = r[src] / deg[src]
        acc = np.bincount(dst, weights=contrib, minlength=nn)
        r = (1.0 - _PR_DAMP) / nn + _PR_DAMP * acc
    return pa.table({"part_id": pa.array(nodes, type=pa.int64()),
                     "pagerank": pa.array(np.round(r, 8), type=pa.float64())})


def copurchase_pagerank(sf_dir: str, min_qty: float = 40.0,
                        iters: int = _PR_ITERS,
                        task_max_edges: int | None = None) -> ray.data.Dataset:
    """(part_id, pagerank) — ``iters`` damped power-iteration steps over
    the (symmetrized) part co-purchase graph, uniform start: the
    ITERATIVE-algorithm surface next to the one-shot graph queries.

    Tiered like ``resolve_clusters``: edge sets under ``PJR_PR_TASK_MAX``
    run the whole power iteration in ONE remote task (vectorized bincount
    matvec — iterating a cluster-wide exchange on a bounded graph pays
    ~10 fixed overheads per step for nothing); larger graphs run each
    step as a keyed exchange — contributions fan out of an edge
    ``map_batches`` with the previous rank vector broadcast once per step
    (node-bounded refs), partial-summed into a native Sum groupby.  When
    even the node table outgrows the object store the broadcast becomes a
    rank-side hash join per step — documented, not built.  Both built
    tiers are equality-tested; the SQL oracle is the same iteration
    unrolled as CTE layers."""
    from ray.data.aggregate import Sum

    pairs = _copurchase_pairs(sf_dir, min_qty)
    edges = _snap(_distinct_edges(pairs.map_batches(
        lambda b: _canon_batch(b, "id_a", "id_b"), batch_format="pyarrow")))
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table(
            {"part_id": pa.array([], type=pa.int64()),
             "pagerank": pa.array([], type=pa.float64())}))
    if task_max_edges is None:
        task_max_edges = _PR_TASK_MAX
    if n_edges <= task_max_edges:
        return ray.data.from_arrow_refs(
            [_pagerank_task.remote(iters, *edges.to_arrow_refs())])

    # beyond-threshold tier: one keyed exchange per step
    lut_ref, _ = _tri_info_task.options(num_returns=2).remote(
        *edges.to_arrow_refs())
    nodes, degs = ray.get(lut_ref)[:2]
    nn = len(nodes)
    r_ref = ray.put(np.full(nn, 1.0 / nn))

    def contribs(batch: pa.Table, rref, lref) -> pa.Table:
        r = ray.get(rref) if isinstance(rref, ray.ObjectRef) else rref
        nd, dg = (ray.get(lref) if isinstance(lref, ray.ObjectRef) else lref)[:2]
        lo = batch.column("lo").to_numpy().astype(np.int64)
        hi = batch.column("hi").to_numpy().astype(np.int64)
        si = np.searchsorted(nd, np.r_[lo, hi])
        di = np.searchsorted(nd, np.r_[hi, lo])
        c = r[si] / dg[si]
        # in-batch combiner: partial-sum per destination before the exchange
        du, dinv = np.unique(di, return_inverse=True)
        acc = np.bincount(dinv, weights=c)
        return pa.table({"node": pa.array(nd[du], type=pa.int64()),
                         "c": pa.array(acc, type=pa.float64())})

    for _ in range(iters):
        agg = (edges.map_batches(contribs, batch_format="pyarrow",
                                 fn_args=(r_ref, lut_ref))
               .groupby("node").aggregate(Sum("c")))
        parts = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
        acc = np.zeros(nn)
        for t in parts:
            idx = np.searchsorted(nodes, t.column("node").to_numpy())
            acc[idx] = t.column("sum(c)").to_numpy()
        r_ref = ray.put((1.0 - _PR_DAMP) / nn + _PR_DAMP * acc)

    r = ray.get(r_ref)
    return ray.data.from_arrow(pa.table(
        {"part_id": pa.array(nodes, type=pa.int64()),
         "pagerank": pa.array(np.round(r, 8), type=pa.float64())}))
