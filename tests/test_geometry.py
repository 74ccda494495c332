"""Unit tests for box geometry: sorted_boxes bubble quirk (O1), crops (M6),
rotation normalisation (O8)."""

import random

import numpy as np

from paddleocr_json_ray.functions.geometry import (
    crop_image_xyxy,
    estimate_rotation,
    get_rotate_crop_image,
    normalized_bboxes,
    order_points_clockwise,
    quad_to_bbox,
    sorted_boxes,
    sorted_boxes_order,
)


def _ref_sorted_boxes(boxes):
    """Direct transliteration of cpp/src/utility.cpp:443-460 for parity."""
    res = sorted(boxes, key=lambda b: (b[0][1], b[0][0]))
    n = len(res)
    if n > 0:
        for i in range(n - 1):
            for j in range(i, -1, -1):
                if abs(res[j + 1][0][1] - res[j][0][1]) < 10 and res[j + 1][0][0] < res[j][0][0]:
                    res[i], res[i + 1] = res[i + 1], res[i]
    return res


def _quad(x, y, w=50, h=20):
    return [[x, y], [x + w, y], [x + w, y + h], [x, y + h]]


def test_sorted_boxes_same_line_quirk():
    # two boxes on the same visual line (tops within 10px), reversed x order
    a, b = _quad(100, 12), _quad(10, 15)
    assert sorted_boxes([a, b]) == [b, a]


def test_sorted_boxes_matches_reference_transliteration():
    rng = random.Random(0)
    for _ in range(200):
        boxes = [_quad(rng.randint(0, 300), rng.randint(0, 120)) for _ in range(rng.randint(0, 10))]
        assert sorted_boxes(list(boxes)) == _ref_sorted_boxes(list(boxes))


def test_sorted_boxes_order_is_permutation():
    boxes = [_quad(30, 5), _quad(10, 8), _quad(200, 4), _quad(5, 40)]
    order = sorted_boxes_order(boxes)
    assert sorted(order) == [0, 1, 2, 3]
    assert [boxes[i] for i in order] == sorted_boxes(boxes)


def test_axis_aligned_crop_identity():
    img = np.arange(40 * 60, dtype=np.uint8).reshape(40, 60)
    quad = [[10, 5], [30, 5], [30, 15], [10, 15]]
    crop = get_rotate_crop_image(img, quad)
    assert crop.shape == (10, 20)
    assert np.array_equal(crop, img[5:15, 10:30])


def test_tall_crop_rotates_90():
    img = np.arange(100 * 50, dtype=np.uint8).reshape(100, 50)
    quad = [[10, 10], [20, 10], [20, 90], [10, 90]]  # h=80 >= 1.5*w=15
    crop = get_rotate_crop_image(img, quad)
    assert crop.shape == (10, 80)


def test_crop_xyxy_zero_pads():
    img = np.ones((10, 10), dtype=np.uint8)
    out = crop_image_xyxy(img, [-5, -5, 5, 5])
    assert out.shape == (10, 10)
    assert out[:5].sum() == 0 and out[5:, 5:].sum() == 25


def test_rotation_below_threshold_is_bbox():
    quads = [[[0, 0], [10, 0], [10, 5], [0, 5]]]
    rot = estimate_rotation(quads)
    assert abs(rot) < 1e-9
    assert normalized_bboxes(quads, rot) == [(0, 0, 10, 5)]


def test_rotation_normalisation_shifts_nonnegative():
    import math
    ang = math.radians(10)
    c, s = math.cos(ang), math.sin(ang)

    def rot_quad(x, y, w, h):
        pts = [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]
        return [[c * px - s * py, s * px + c * py] for px, py in pts]

    quads = [rot_quad(0, 0, 100, 20), rot_quad(0, 40, 100, 20)]
    r = estimate_rotation(quads)
    assert abs(r - ang) < 0.02
    bbs = normalized_bboxes(quads, r)
    assert all(v >= -1e-6 for bb in bbs for v in bb)
    # de-rotated boxes should align horizontally
    assert abs(bbs[0][0] - bbs[1][0]) < 1.0


def test_order_points_clockwise():
    assert order_points_clockwise([[10, 10], [0, 0], [10, 0], [0, 10]]) == [
        [0, 0], [10, 0], [10, 10], [0, 10]]


def test_quad_to_bbox():
    assert quad_to_bbox([[3, 4], [9, 2], [9, 11], [3, 12]]) == (3, 2, 9, 12)


def test_det_resize_cap_and_box_rescale():
    """Images beyond limit_side_len must be capped (x32-rounded) and det
    boxes rescaled back into source coordinates (M1 + P5 interplay)."""
    from paddleocr_json_ray.config import PipelineConfig
    from paddleocr_json_ray.functions.imageops import det_resize_shape
    from paddleocr_json_ray.stages.span_ocr import items_for_raster
    from paddleocr_json_ray.synth.backend import make_backends
    from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, render_raster

    rh, rw, ratio_h, ratio_w = det_resize_shape(1600, 2000, 960)
    assert rw <= 960 and rw % 32 == 0 and rh % 32 == 0
    assert ratio_w < 1 and ratio_h < 1

    img = SimgImage(width=2000, height=1600, blocks=[
        SimgBlock(quad=[[100, 100], [900, 100], [900, 144], [100, 144]],
                  text="big page line", det_prob=0.9)])
    det_b = make_backends(PipelineConfig(), [])[0]
    items = items_for_raster(render_raster(img, seed=3), PipelineConfig(), det_b)
    assert len(items) == 1
    q = items[0].quad
    # box must land back near source coordinates despite the resize round-trip
    # (the pixel det recovers unclip(shrunk kernel), so allow the DB margin)
    assert abs(q[0][0] - 100) <= 25 and abs(q[1][0] - 900) <= 25
    assert abs(q[0][1] - 100) <= 25 and abs(q[2][1] - 144) <= 25
    # and it must genuinely come from the downscaled map: width back at
    # source scale, not resized scale
    assert q[1][0] - q[0][0] > 700
