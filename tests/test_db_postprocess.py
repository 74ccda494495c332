"""DB bitmap post-processing chain (P1-P5 math) + bitmap det backend e2e."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.functions.db_postprocess import (
    boxes_from_bitmap,
    connected_components,
    convex_hull,
    get_mini_boxes,
    min_area_rect,
    shrink_distance,
    unclip_distance,
    unclip_rect,
)


def test_connected_components_8conn():
    bm = np.zeros((10, 10), dtype=bool)
    bm[1, 1] = True
    bm[2, 2] = True          # diagonal -> same component
    bm[5:7, 5:8] = True      # separate blob
    comps = connected_components(bm)
    assert sorted(len(c) for c in comps) == [2, 6]


def test_connected_components_u_shape():
    bm = np.zeros((6, 6), dtype=bool)
    bm[0:5, 0] = True
    bm[0:5, 4] = True
    bm[4, 0:5] = True        # U: two arms joined at the bottom
    comps = connected_components(bm)
    assert len(comps) == 1


def test_connected_components_vs_bfs_floodfill():
    """Run-based union-find vs an independent BFS flood fill on random maps."""
    from collections import deque

    def bfs(bm):
        h, w = bm.shape
        seen = np.zeros_like(bm, dtype=bool)
        comps = []
        for y in range(h):
            for x in range(w):
                if bm[y, x] and not seen[y, x]:
                    q = deque([(x, y)])
                    seen[y, x] = True
                    pts = []
                    while q:
                        cx, cy = q.popleft()
                        pts.append((cx, cy))
                        for dy in (-1, 0, 1):
                            for dx in (-1, 0, 1):
                                nx, ny = cx + dx, cy + dy
                                if 0 <= nx < w and 0 <= ny < h and bm[ny, nx] and not seen[ny, nx]:
                                    seen[ny, nx] = True
                                    q.append((nx, ny))
                    comps.append(frozenset(pts))
        return set(comps)

    rng = np.random.default_rng(11)
    for _ in range(40):
        bm = rng.random((rng.integers(1, 25), rng.integers(1, 25))) < rng.uniform(0.2, 0.6)
        got = {frozenset(map(tuple, c.tolist())) for c in connected_components(bm)}
        assert got == bfs(bm)


def test_min_area_rect_axis_aligned():
    pts = np.array([[x, y] for x in range(5, 40) for y in range(10, 20)])
    (cx, cy), (w, h), ang = min_area_rect(pts)
    assert {round(w), round(h)} == {34, 9}
    assert abs(cx - 22.0) < 0.6 and abs(cy - 14.5) < 0.6


def test_min_area_rect_rotated():
    # 45-degree line of square blocks
    base = np.array([[i, i] for i in range(20)], dtype=float)
    pts = np.concatenate([base + [dx, -dx] for dx in range(4)])
    _, (w, h), ang = min_area_rect(pts)
    long_side, short_side = max(w, h), min(w, h)
    assert long_side > 3 * short_side
    assert abs(abs(math.degrees(ang)) % 90 - 45) < 1.0


def test_get_mini_boxes_order_and_ssid():
    box, ssid = get_mini_boxes(((10, 10), (8, 4), 0.0))
    assert ssid == 8
    assert box == [[6, 8], [14, 8], [14, 12], [6, 12]]  # TL,TR,BR,BL


def test_unclip_geometry():
    box = [[0, 0], [30, 0], [30, 10], [0, 10]]
    d = unclip_distance(box, 1.5)
    assert abs(d - (300 * 1.5 / 80)) < 1e-6
    (c, (w, h), a) = unclip_rect(((15, 5), (30, 10), 0.0), d)
    assert (w, h) == (30 + 2 * d, 10 + 2 * d)


def test_boxes_from_bitmap_thresholds():
    pred = np.zeros((40, 60), dtype=np.float32)
    pred[5:15, 5:45] = 0.9      # strong box
    pred[25:28, 5:12] = 0.4     # weak box (below box_thresh)
    bitmap = pred > 0.3
    boxes = boxes_from_bitmap(pred, bitmap, 0.6, 1.5, "slow")
    assert len(boxes) == 1
    quad, score = boxes[0]
    assert score == pytest.approx(0.9, abs=1e-5)
    xs = [p[0] for p in quad]
    assert min(xs) < 5 and max(xs) > 45  # unclip expanded


def test_fast_score_lower_than_slow():
    pred = np.zeros((30, 30), dtype=np.float32)
    pred[10:20, 10:20] = 0.8
    bitmap = pred > 0.3
    s_slow = boxes_from_bitmap(pred, bitmap, 0.0, 1.5, "slow")[0][1]
    s_fast = boxes_from_bitmap(pred, bitmap, 0.0, 1.5, "fast")[0][1]
    assert s_slow == pytest.approx(0.8, abs=1e-5)
    assert s_fast <= s_slow + 1e-6


def test_shrink_distance():
    assert shrink_distance(100, 20) == pytest.approx(100 * 20 * 0.84 / 240)


def test_convex_hull_is_subset():
    rng = np.random.default_rng(5)
    pts = rng.integers(0, 50, size=(200, 2))
    hull = convex_hull(pts)
    pt_set = {tuple(p) for p in pts.tolist()}
    assert all(tuple(map(int, p)) in pt_set for p in hull.tolist())


def _spans_map(tab):
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]] for r in tab.to_pylist()}


def test_pixel_backend_e2e_golden(ray_session, sf0001_dir):
    """Full pipeline with the (default) pixel det backend matches ITS golden
    (the oracle runs the same real DB chain sequentially over the raster)."""
    import pyarrow as pa
    import ray as _ray

    from paddleocr_json_ray.pipelines.ocr import run_extraction
    from paddleocr_json_ray.synth.corpus import build_corpus

    cfg = PipelineConfig()
    paths = build_corpus(sf0001_dir, cfg)
    got = pa.concat_tables(_ray.get(run_extraction(sf0001_dir, cfg).to_arrow_refs()))
    golden = pq.read_table(paths.golden_parquet)
    assert _spans_map(got) == _spans_map(golden)
    # and the bitmap chain actually recovers text on real spans
    n_with_text = sum(1 for r in golden.to_pylist()
                      for s in r["spans"] if s["kind"] == "media" and s["text"])
    assert n_with_text > 100


def test_unclip_matches_clipper_round_join_offset():
    """The reference offsets the MINI-BOX (always a rectangle — GetMiniBoxes
    output, cpp/src/postprocess_op.cpp:286-304) with Clipper's round-join
    polygon offset, then re-fits minAreaRect (:38-67).  Simulate that
    pipeline densely (many arc points per corner, as Clipper does) for
    random rotated rectangles and check the closed-form ``unclip_rect``
    agrees to sub-pixel tolerance — including concave-looking inputs, which
    cannot reach UnClip because minAreaRect precedes it."""
    import math

    from paddleocr_json_ray.functions.db_postprocess import (
        get_mini_boxes,
        min_area_rect,
        rect_points,
        unclip_distance,
        unclip_rect,
    )

    rng = np.random.default_rng(17)
    for _ in range(50):
        cx, cy = rng.uniform(50, 500, size=2)
        w, h = rng.uniform(8, 300), rng.uniform(4, 60)
        ang = rng.uniform(-math.pi, math.pi)
        rect = ((float(cx), float(cy)), (float(w), float(h)), float(ang))
        box, _ = get_mini_boxes(rect)
        d = unclip_distance(box, 1.5)
        # dense round-join offset: every rectangle edge pushed out by d plus
        # quarter-circle arcs at the corners (Clipper ArcTolerance -> dense)
        corners = rect_points(rect)
        pts = []
        for i in range(4):
            a = corners[i]
            prev_e = a - corners[(i - 1) % 4]
            next_e = corners[(i + 1) % 4] - a
            for e in (prev_e, next_e):
                n = np.array([e[1], -e[0]]) / max(np.hypot(*e), 1e-12)
                pts.append(a + d * n)
                pts.append(a - d * n)
            for t in np.linspace(0, 2 * math.pi, 64, endpoint=False):
                pts.append(a + d * np.array([math.cos(t), math.sin(t)]))
        offset_rect = min_area_rect(np.asarray(pts))
        closed = unclip_rect(rect, d)
        got_box, got_ssid = get_mini_boxes(offset_rect)
        exp_box, exp_ssid = get_mini_boxes(closed)
        assert got_ssid == pytest.approx(exp_ssid, abs=0.15)
        assert np.allclose(np.asarray(got_box), np.asarray(exp_box), atol=0.25)


def test_dilation_merges_nearby():
    from paddleocr_json_ray.synth.backend import PixelDetBackend
    from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, render_raster

    img = SimgImage(width=200, height=60, blocks=[
        SimgBlock(quad=[[10, 10], [90, 10], [90, 32], [10, 32]], text="a", det_prob=0.9)])
    raster = render_raster(img, seed=7)
    plain = PixelDetBackend(PipelineConfig()).infer(raster)
    dil = PixelDetBackend(PipelineConfig(use_dilation=True)).infer(raster)
    assert len(plain) == 1 and len(dil) == 1
    # dilated bitmap -> slightly larger recovered box
    area = lambda q: (max(p[0] for p in q) - min(p[0] for p in q)) * (max(p[1] for p in q) - min(p[1] for p in q))
    assert area(dil[0][0]) >= area(plain[0][0])

