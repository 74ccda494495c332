"""Box geometry: ordering, cropping, rotation normalisation.

Numpy re-implementations of the reference's geometry operators:

  * ``sorted_boxes`` — top-to-bottom / left-to-right ordering with the
    asymmetric 10-px same-line bubble pass (``cpp/src/utility.cpp:443-460``,
    comparator ``cpp/include/utility.h:121-136``).  The quirk (swapping
    indices ``i``/``i+1`` while scanning ``j`` downward) is replicated
    verbatim — it is part of the observable output contract.
  * ``get_rotate_crop_image`` — perspective-warp quad crop, rotate 90deg when
    h >= 1.5*w (``cpp/src/utility.cpp:163-221``), without OpenCV: homography
    solved by direct linear transform, nearest-neighbour sampling.
  * ``quad_to_bbox`` / ``estimate_rotation`` / ``normalized_bboxes`` — the
    tbpu line-preprocessing geometry
    (``api/python/tbpu/parser_tools/line_preprocessing.py:13-81``).
"""

from __future__ import annotations

import math
from statistics import median

import numpy as np

ANGLE_THRESHOLD_DEG = 3.0
ANGLE_THRESHOLD_RAD = math.radians(ANGLE_THRESHOLD_DEG)


# ---------------------------------------------------------------- sorted_boxes
def sorted_boxes_order(boxes) -> list[int]:
    """Return the permutation the reference's ``sorted_boxes`` applies.

    ``boxes``: sequence of 4x2 quads (TL,TR,BR,BL), int coords.
    Stage 1: stable sort by (top-left y, then top-left x).
    Stage 2: the reference's bubble pass — for each i, scan j from i down to
    0; whenever boxes[j+1] and boxes[j] have tops within 10px and boxes[j+1]
    is left of boxes[j], swap positions i and i+1 (NOT j/j+1 — reference
    quirk, cpp/src/utility.cpp:448-459)."""
    idx = sorted(range(len(boxes)), key=lambda i: (boxes[i][0][1], boxes[i][0][0]))
    n = len(idx)
    if n == 0:
        return idx
    for i in range(n - 1):
        for j in range(i, -1, -1):
            bj1, bj = boxes[idx[j + 1]], boxes[idx[j]]
            if abs(bj1[0][1] - bj[0][1]) < 10 and bj1[0][0] < bj[0][0]:
                idx[i], idx[i + 1] = idx[i + 1], idx[i]
    return idx


def sorted_boxes(boxes) -> list:
    return [boxes[i] for i in sorted_boxes_order(boxes)]


# ------------------------------------------------------------------- bboxes
def quad_to_bbox(quad) -> tuple[float, float, float, float]:
    xs = [p[0] for p in quad]
    ys = [p[1] for p in quad]
    return (min(xs), min(ys), max(xs), max(ys))


def _quad_angle(quad) -> float:
    """Rotation angle of one quad, normalised to [-pi/2+th, pi/2+th)
    (line_preprocessing.py:18-32 semantics)."""
    w = math.dist(quad[0], quad[1])
    h = math.dist(quad[1], quad[2])
    if w < h:
        ang = math.atan2(quad[2][1] - quad[1][1], quad[2][0] - quad[1][0])
    else:
        ang = math.atan2(quad[1][1] - quad[0][1], quad[1][0] - quad[0][0])
    if ang < -math.pi / 2 + ANGLE_THRESHOLD_RAD:
        ang += math.pi
    elif ang >= math.pi / 2 + ANGLE_THRESHOLD_RAD:
        ang -= math.pi
    return ang


def estimate_rotation(quads) -> float:
    """Median quad angle of a page (line_preprocessing.py:36-40)."""
    return median(_quad_angle(q) for q in quads)


def normalized_bboxes(quads, rotation_rad: float) -> list[tuple[float, float, float, float]]:
    """Axis-aligned bboxes after undoing the page rotation; if any coordinate
    goes negative, shift all bboxes to be non-negative
    (line_preprocessing.py:44-81)."""
    if abs(rotation_rad) <= ANGLE_THRESHOLD_RAD:
        return [quad_to_bbox(q) for q in quads]
    c, s = math.cos(-rotation_rad), math.sin(-rotation_rad)
    out = []
    min_x = min_y = math.inf
    for q in quads:
        pts = [(c * x - s * y, s * x + c * y) for x, y in q]
        xs, ys = zip(*pts)
        bb = (min(xs), min(ys), max(xs), max(ys))
        out.append(bb)
        min_x, min_y = min(min_x, bb[0]), min(min_y, bb[1])
    if min_x < 0 or min_y < 0:
        out = [(x0 - min_x, y0 - min_y, x1 - min_x, y1 - min_y) for x0, y0, x1, y1 in out]
    return out


# --------------------------------------------------------------------- crops
def _perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping src quad -> dst quad (DLT, 4 points)."""
    a = []
    b = []
    for (x, y), (u, v) in zip(src, dst):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.extend([u, v])
    h = np.linalg.solve(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64))
    return np.append(h, 1.0).reshape(3, 3)


def get_rotate_crop_image(img: np.ndarray, quad) -> np.ndarray:
    """Perspective-warp the quad region out of ``img`` (HxW or HxWxC uint8).

    Output size: width = max(top edge, bottom edge), height = max(left edge,
    right edge), as in the reference (cpp/src/utility.cpp:163-221).  If the
    resulting crop has h >= 1.5*w it is rotated 90 degrees so text runs
    horizontally."""
    q = np.asarray(quad, dtype=np.float64)
    crop_w = int(max(np.linalg.norm(q[0] - q[1]), np.linalg.norm(q[2] - q[3])))
    crop_h = int(max(np.linalg.norm(q[0] - q[3]), np.linalg.norm(q[1] - q[2])))
    crop_w, crop_h = max(crop_w, 1), max(crop_h, 1)
    dst = np.array([[0, 0], [crop_w, 0], [crop_w, crop_h], [0, crop_h]], dtype=np.float64)
    m = _perspective_matrix(dst, q)  # dst -> src so we can pull pixels
    yy, xx = np.mgrid[0:crop_h, 0:crop_w]
    ones = np.ones_like(xx, dtype=np.float64)
    pts = np.stack([xx.astype(np.float64), yy.astype(np.float64), ones])
    src = m @ pts.reshape(3, -1)
    sx = (src[0] / src[2]).round().astype(np.int64)
    sy = (src[1] / src[2]).round().astype(np.int64)
    h, w = img.shape[:2]
    np.clip(sx, 0, w - 1, out=sx)
    np.clip(sy, 0, h - 1, out=sy)
    crop = img[sy, sx].reshape((crop_h, crop_w) + img.shape[2:])
    if crop_h >= crop_w * 1.5:
        # reference does transpose + flip(axis=0) == 90deg counter-clockwise
        # (cpp/src/utility.cpp:210-215)
        crop = np.rot90(crop, k=1)
    return np.ascontiguousarray(crop)


def crop_image_xyxy(img: np.ndarray, area) -> np.ndarray:
    """Axis-aligned crop with zero padding for out-of-range regions
    (cpp/src/utility.cpp:418-441)."""
    x0, y0, x1, y1 = (int(v) for v in area)
    h, w = img.shape[:2]
    out_shape = (y1 - y0, x1 - x0) + img.shape[2:]
    out = np.zeros(out_shape, dtype=img.dtype)
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x1, w), min(y1, h)
    if sx1 > sx0 and sy1 > sy0:
        out[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = img[sy0:sy1, sx0:sx1]
    return out


def order_points_clockwise(quad) -> list[list[int]]:
    """Order 4 points as TL,TR,BR,BL (cpp/src/postprocess_op.cpp FilterTagDetRes
    ordering): sort by x then split by y."""
    pts = sorted((list(p) for p in quad), key=lambda p: (p[0], p[1]))
    left = sorted(pts[:2], key=lambda p: p[1])
    right = sorted(pts[2:], key=lambda p: p[1])
    return [left[0], right[0], right[1], left[1]]
