"""Distributed star-contraction connected components vs the union-find oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from paddleocr_json_ray.ops.cluster import resolve_clusters, survivor_filter
from paddleocr_json_ray.ops.dedup import _union_find


def _pairs_ds(pairs, n_blocks=4):
    a = pa.array([p[0] for p in pairs], type=pa.int64())
    b = pa.array([p[1] for p in pairs], type=pa.int64())
    ds = ray.data.from_arrow(pa.table({"id_a": a, "id_b": b}))
    return ds.repartition(n_blocks) if len(pairs) else ds


def _labels(pairs, task_max=None):
    got = resolve_clusters(_pairs_ds(pairs), task_max_edges=task_max).to_pandas()
    if got.empty:
        return {}
    return dict(zip(got["node"].astype(int), got["root"].astype(int)))


def _oracle(pairs):
    roots = _union_find([(int(a), int(b)) for a, b in pairs])
    return {m: r for m, r in roots.items() if r != m}


def test_empty_and_single():
    assert _labels([]) == {}
    assert _labels([(3, 7)]) == {7: 3}
    assert _labels([(7, 3), (3, 7)]) == {7: 3}  # dupes + swapped order


def test_chain_worst_case(ray_session):
    # a long path is the diameter worst case for naive propagation;
    # task_max=0 forces the distributed star-contraction path
    pairs = [(i, i + 1) for i in range(200)]
    assert _labels(pairs, task_max=0) == _oracle(pairs)
    assert _labels(pairs) == _oracle(pairs)


def test_cliques_and_stars(ray_session):
    pairs = []
    for base in (0, 100, 200):
        ids = list(range(base, base + 12))
        pairs += [(i, j) for i in ids for j in ids if i < j]
    pairs += [(1000, 1001), (1002, 1001)]  # small star, off-center min
    assert _labels(pairs, task_max=0) == _oracle(pairs)  # star contraction
    assert _labels(pairs) == _oracle(pairs)              # single-task solve


def test_random_graphs(ray_session):
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = 300
        m = int(rng.integers(50, 400))
        pairs = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))
                 if a != b]
        assert _labels(pairs) == _oracle(pairs), f"trial {trial}"


def test_survivor_filter(ray_session):
    pairs = [(0, 1), (1, 2), (5, 9)]
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(12), type=pa.int64())}))
    kept = sorted(survivor_filter(corpus, _pairs_ds(pairs), "doc_id")
                  .to_pandas()["doc_id"].astype(int))
    assert kept == [0, 3, 4, 5, 6, 7, 8, 10, 11]


def test_copurchase_components_chain(ray_session, tmp_path):
    """A planted 100-part chain (orders linking part i to i+1) must collapse
    to ONE component even though every edge is its own order — the
    multi-hop case a pairwise heal cannot shortcut — while parts in
    singleton orders stay their own component."""
    import os

    import pyarrow.parquet as pq

    from paddleocr_json_ray.ops.cluster import copurchase_components

    rows_o, rows_p, rows_q = [], [], []
    # chain 0-1, 1-2, ..., 98-99 (one order per edge)
    for i in range(99):
        rows_o += [i, i]
        rows_p += [i, i + 1]
        rows_q += [50.0, 50.0]
    # parts 200..209: one qualifying row each, no partner
    for j in range(10):
        rows_o.append(1000 + j)
        rows_p.append(200 + j)
        rows_q.append(50.0)
    # a sub-threshold order that must NOT create an edge
    rows_o += [2000, 2000]
    rows_p += [300, 301]
    rows_q += [1.0, 1.0]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rows_o, type=pa.int64()),
        "l_partkey": pa.array(rows_p, type=pa.int64()),
        "l_quantity": pa.array(rows_q),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    got = (copurchase_components(str(tmp_path)).to_pandas()
           .set_index("part_id")["component"])
    assert len(got) == 110  # 100 chain parts + 10 singletons, no 300/301
    assert (got.loc[list(range(100))] == 0).all()
    for j in range(10):
        assert got.loc[200 + j] == 200 + j


def _write_lineitem(tmp_path, orders):
    """orders: list of part-id lists; one qualifying order per list."""
    import os

    import pyarrow.parquet as pq

    rows_o, rows_p, rows_q = [], [], []
    for o, parts in enumerate(orders):
        for p in parts:
            rows_o.append(o)
            rows_p.append(p)
            rows_q.append(50.0)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rows_o, type=pa.int64()),
        "l_partkey": pa.array(rows_p, type=pa.int64()),
        "l_quantity": pa.array(rows_q),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    return str(tmp_path)


def _brute_triangles(orders) -> int:
    from itertools import combinations

    edges = set()
    for parts in orders:
        for a, b in combinations(sorted(set(parts)), 2):
            edges.add((a, b))
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return sum(1 for a, b in edges
               for c in nbrs[a] & nbrs[b] if c > b)


def test_triangles_planted(ray_session, tmp_path):
    """K5 (10 triangles) + a 50-leaf hub star (0 — the degree-orientation
    worst case) + one triangle hanging off two hub leaves."""
    orders = []
    from itertools import combinations

    orders += [list(e) for e in combinations(range(5), 2)]       # K5
    orders += [[100, 200 + i] for i in range(50)]                # star hub
    orders += [[200, 201], [200, 202], [201, 202]]               # leaf triangle
    sf = _write_lineitem(tmp_path, orders)
    from paddleocr_json_ray.ops.cluster import copurchase_triangles

    got = copurchase_triangles(sf).to_pandas()["n_triangles"][0]
    # K5's 10 + the leaf triangle + 3 hub-leaf-leaf triangles the hub edges
    # close through the leaf clique
    assert got == 10 + 1 + 3 == _brute_triangles(orders)


def test_triangles_random_orders(ray_session, tmp_path):
    """Random multi-part orders over a small universe vs brute force —
    exercises dup edges across orders, in-order dup parts, and wedge runs
    straddling block boundaries."""
    rng = np.random.default_rng(7)
    orders = [list(rng.integers(0, 40, size=rng.integers(1, 6)))
              for _ in range(300)]
    sf = _write_lineitem(tmp_path, orders)
    from paddleocr_json_ray.ops.cluster import copurchase_triangles

    got = copurchase_triangles(sf).to_pandas()["n_triangles"][0]
    assert got == _brute_triangles(orders)


def test_triangles_empty_graph(ray_session, tmp_path):
    sf = _write_lineitem(tmp_path, [[1], [2], [3]])
    from paddleocr_json_ray.ops.cluster import copurchase_triangles

    assert copurchase_triangles(sf).to_pandas()["n_triangles"][0] == 0


def test_triangles_groupby_tier_equals_broadcast(ray_session, tmp_path, monkeypatch):
    """The beyond-threshold groupby membership path must count identically
    to the broadcast-searchsorted tier."""
    rng = np.random.default_rng(17)
    orders = [list(rng.integers(0, 30, size=rng.integers(2, 5)))
              for _ in range(200)]
    sf = _write_lineitem(tmp_path, orders)
    from paddleocr_json_ray.ops import cluster

    fast = cluster.copurchase_triangles(sf).to_pandas()["n_triangles"][0]
    monkeypatch.setattr(cluster, "_TRI_BROADCAST_MAX", 0)
    slow = cluster.copurchase_triangles(sf).to_pandas()["n_triangles"][0]
    assert fast == slow == _brute_triangles(orders)


def test_pagerank_tiers_and_brute(ray_session, tmp_path, monkeypatch):
    """Both tiers equal the numpy power iteration on a hub + clique graph
    (hub concentrates rank; 8dp rounding pins the comparison)."""
    from itertools import combinations

    orders = [[0, 100 + i] for i in range(20)]            # hub 0
    orders += [list(e) for e in combinations(range(200, 205), 2)]  # K5
    sf = _write_lineitem(tmp_path, orders)
    from paddleocr_json_ray.ops import cluster

    def brute(orders, iters=8):
        edges = set()
        for parts in orders:
            for a, b in combinations(sorted(set(parts)), 2):
                edges.add((a, b))
        nodes = sorted({x for e in edges for x in e})
        idx = {v: i for i, v in enumerate(nodes)}
        src, dst = [], []
        for a, b in edges:
            src += [idx[a], idx[b]]
            dst += [idx[b], idx[a]]
        src, dst = np.asarray(src), np.asarray(dst)
        deg = np.bincount(src, minlength=len(nodes)).astype(float)
        r = np.full(len(nodes), 1.0 / len(nodes))
        for _ in range(iters):
            r = 0.15 / len(nodes) + 0.85 * np.bincount(
                dst, weights=r[src] / deg[src], minlength=len(nodes))
        return dict(zip(nodes, np.round(r, 8)))

    want = brute(orders)
    fast = (cluster.copurchase_pagerank(sf).to_pandas()
            .set_index("part_id")["pagerank"].to_dict())
    slow = (cluster.copurchase_pagerank(sf, task_max_edges=0).to_pandas()
            .set_index("part_id")["pagerank"].to_dict())
    assert fast == want
    assert slow == want
    assert want[0] == max(want.values())  # the hub dominates
