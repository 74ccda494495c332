"""DB detection post-processing (P1-P5) — numpy only, no OpenCV/pyclipper.

Re-implements the reference's bitmap-to-boxes chain
(``cpp/src/postprocess_op.cpp:246-352``):

  prob map -> threshold bitmap -> connected components (findContours stand-in)
  -> min-area rect (convex hull + rotating calipers == cv::minAreaRect)
  -> GetMiniBoxes point ordering + ssid=max(w,h) (:127-160)
  -> score: 'slow' = mean prob over the component region (PolygonScoreAcc),
            'fast' = mean prob over the clipped axis-aligned box (BoxScoreFast)
  -> unclip by distance = area*ratio/perimeter (:19-36); Clipper's round-join
     offset of a rectangle followed by minAreaRect is exactly the same
     rectangle grown by the distance on every side (:38-67), computed here in
     closed form
  -> candidate int rounding + clamp (:306-318).

FilterTagDetRes (clockwise order + truncating rescale + <=4px drop) stays in
``stages/span_ocr.det_items`` — shared by all det backends.
"""

from __future__ import annotations

import math

import numpy as np

MAX_CANDIDATES = 1000
MIN_SIZE = 3


# ------------------------------------------------------ connected components
def component_runs(bitmap: np.ndarray) -> list[np.ndarray]:
    """8-connected components of a boolean map as RUN lists: each component
    is an (R, 3) int array of rows (y, x0, x1) with exclusive x1, in
    top-left-first discovery order.  Runs for the whole bitmap are extracted
    in one vectorized pass (pad column prevents row wrap); only the run
    adjacency union-find is Python — runs are few."""
    h, w = bitmap.shape
    padded = np.zeros((h, w + 1), dtype=bool)
    padded[:, :w] = bitmap
    flat = padded.ravel()
    d = np.diff(flat.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if flat.size and flat[0]:
        starts = np.r_[0, starts]
    ys = starts // (w + 1)
    x0s = starts - ys * (w + 1)
    x1s = ends - ys * (w + 1)

    n = len(starts)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    prev_row = -2
    prev_runs: list[tuple[int, int, int]] = []  # (x0, x1, label) of prev row
    cur_runs: list[tuple[int, int, int]] = []
    cur_row = -2
    for i in range(n):
        y = int(ys[i])
        if y != cur_row:
            prev_row, prev_runs = cur_row, cur_runs
            cur_row, cur_runs = y, []
        x0, x1 = int(x0s[i]), int(x1s[i])
        if y - 1 == prev_row:
            # 8-connectivity with exclusive ends: touching iff x0 <= px1 && px0 <= x1
            for px0, px1, plabel in prev_runs:
                if x0 <= px1 and px0 <= x1:
                    ra, rb = find(i), find(plabel)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        cur_runs.append((x0, x1, i))

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    comps = []
    for root in sorted(groups):
        idx = np.asarray(groups[root])
        comps.append(np.stack([ys[idx], x0s[idx], x1s[idx]], axis=1).astype(np.int64))
    return comps


def _runs_to_pixels(runs: np.ndarray) -> np.ndarray:
    """(R, 3) run rows -> (N, 2) (x, y) pixel array (for tests/direct use)."""
    pts = []
    for y, x0, x1 in runs:
        xs = np.arange(x0, x1, dtype=np.int64)
        pts.append(np.stack([xs, np.full_like(xs, y)], axis=1))
    return np.concatenate(pts) if pts else np.empty((0, 2), dtype=np.int64)


def connected_components(bitmap: np.ndarray) -> list[np.ndarray]:
    """Back-compat wrapper: components as dense (N, 2) pixel arrays."""
    return [_runs_to_pixels(r) for r in component_runs(bitmap)]


# ------------------------------------------------------------- min-area rect
def _row_extremes(points: np.ndarray) -> np.ndarray:
    """Reduce a dense pixel set to per-row x extremes — every hull vertex of
    a rasterized region is extreme in x within its row, so the hull (and
    min-area rect) over the reduction is exact while the point count drops
    from O(area) to O(rows)."""
    order = np.lexsort((points[:, 0], points[:, 1]))
    p = points[order]
    first = np.flatnonzero(np.r_[True, np.diff(p[:, 1]) != 0])
    last = np.r_[first[1:] - 1, len(p) - 1]
    return np.unique(np.concatenate([p[first], p[last]]), axis=0)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices CCW (y up ambivalent —
    consistent for caliper use)."""
    pts = _row_extremes(np.asarray(points)).astype(np.float64)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2:
                ax, ay = out[-1][0] - out[-2][0], out[-1][1] - out[-2][1]
                bx, by = p[0] - out[-2][0], p[1] - out[-2][1]
                if ax * by - ay * bx > 0:
                    break
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def min_area_rect(points: np.ndarray) -> tuple[tuple[float, float], tuple[float, float], float]:
    """Smallest-area enclosing rotated rect ((cx, cy), (w, h), angle_rad) —
    cv::minAreaRect equivalent via rotating calipers over hull edges."""
    hull = convex_hull(points)
    if len(hull) == 1:
        return (float(hull[0, 0]), float(hull[0, 1])), (0.0, 0.0), 0.0
    if len(hull) == 2:
        c = hull.mean(axis=0)
        d = hull[1] - hull[0]
        return ((float(c[0]), float(c[1])),
                (float(np.hypot(*d)), 0.0), math.atan2(d[1], d[0]))
    best = None
    for i in range(len(hull)):
        edge = hull[(i + 1) % len(hull)] - hull[i]
        ang = math.atan2(edge[1], edge[0])
        c, s = math.cos(ang), math.sin(ang)
        # rotate hull by -ang: p' = (x*c + y*s, -x*s + y*c)
        rot = hull @ np.array([[c, -s], [s, c]])
        x0, y0 = rot.min(axis=0)
        x1, y1 = rot.max(axis=0)
        area = (x1 - x0) * (y1 - y0)
        if best is None or area < best[0]:
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            # inverse-rotate the center back to input coordinates
            bx = cx * c - cy * s
            by = cx * s + cy * c
            best = (area, (bx, by), (x1 - x0, y1 - y0), ang)
    _, center, size, ang = best
    return (center, size, ang)


def rect_points(rect) -> np.ndarray:
    (cx, cy), (w, h), ang = rect
    c, s = math.cos(ang), math.sin(ang)
    dx, dy = w / 2, h / 2
    corners = np.array([[-dx, -dy], [dx, -dy], [dx, dy], [-dx, dy]])
    # world = R(ang) @ local, as row vectors: (x*c - y*s, x*s + y*c)
    rot = corners @ np.array([[c, s], [-s, c]])
    return rot + np.array([cx, cy])


def get_mini_boxes(rect) -> tuple[list[list[float]], float]:
    """Reference point ordering (sort by x, pair by y) + ssid = max side
    (cpp/src/postprocess_op.cpp:127-160)."""
    ssid = max(rect[1][0], rect[1][1])
    pts = sorted(rect_points(rect).tolist(), key=lambda p: p[0])
    if pts[3][1] <= pts[2][1]:
        idx2, idx3 = pts[3], pts[2]
    else:
        idx2, idx3 = pts[2], pts[3]
    if pts[1][1] <= pts[0][1]:
        idx1, idx4 = pts[1], pts[0]
    else:
        idx1, idx4 = pts[0], pts[1]
    return [idx1, idx2, idx3, idx4], float(ssid)


# -------------------------------------------------------------------- unclip
def unclip_distance(box4: list[list[float]], unclip_ratio: float) -> float:
    """distance = area * ratio / perimeter (GetContourArea, :19-36)."""
    area = 0.0
    per = 0.0
    for i in range(4):
        x0, y0 = box4[i]
        x1, y1 = box4[(i + 1) % 4]
        area += x0 * y1 - y0 * x1
        per += math.hypot(x0 - x1, y0 - y1)
    area = abs(area / 2.0)
    return area * unclip_ratio / per if per > 0 else 0.0


def unclip_rect(rect, distance: float):
    """Round-join polygon offset of a rectangle, re-fit with minAreaRect ==
    the same rectangle grown by ``distance`` on every side."""
    (cx, cy), (w, h), ang = rect
    return ((cx, cy), (w + 2 * distance, h + 2 * distance), ang)


# ----------------------------------------------------------- main chain (P1)
def boxes_from_bitmap(pred: np.ndarray, bitmap: np.ndarray, box_thresh: float,
                      unclip_ratio: float, score_mode: str = "slow"):
    """Returns list of (int quad 4x2 in pred coords, score).  Mirrors
    BoxesFromBitmap (cpp/src/postprocess_op.cpp:246-321).  Components stay
    in run form end-to-end: hull candidates are run endpoints (exact — every
    hull vertex is row-extreme) and the slow score sums pred row slices."""
    height, width = bitmap.shape
    out = []
    for runs in component_runs(bitmap)[:MAX_CANDIDATES]:
        npix = int((runs[:, 2] - runs[:, 1]).sum())
        if npix <= 2:
            continue
        ends = np.concatenate([
            np.stack([runs[:, 1], runs[:, 0]], axis=1),
            np.stack([runs[:, 2] - 1, runs[:, 0]], axis=1)])
        rect = min_area_rect(ends)
        box, ssid = get_mini_boxes(rect)
        if ssid < MIN_SIZE:
            continue
        if score_mode == "slow":
            acc = 0.0
            for y, x0, x1 in runs:
                acc += float(pred[y, x0:x1].sum(dtype=np.float64))
            score = acc / npix
        else:
            xs = [p[0] for p in box]
            ys = [p[1] for p in box]
            x0 = int(np.clip(math.floor(min(xs)), 0, width - 1))
            x1 = int(np.clip(math.ceil(max(xs)), 0, width - 1))
            y0 = int(np.clip(math.floor(min(ys)), 0, height - 1))
            y1 = int(np.clip(math.ceil(max(ys)), 0, height - 1))
            region = pred[y0:y1 + 1, x0:x1 + 1]
            score = float(region.mean()) if region.size else 0.0
        if score < box_thresh:
            continue
        clip_rect = unclip_rect(rect, unclip_distance(box, unclip_ratio))
        if clip_rect[1][0] < 1.001 and clip_rect[1][1] < 1.001:
            continue
        clip_box, ssid2 = get_mini_boxes(clip_rect)
        if ssid2 < MIN_SIZE + 2:
            continue
        # roundf semantics: half away from zero (coords are non-negative here)
        int_box = [[int(np.clip(math.floor(p[0] + 0.5), 0, width)),
                    int(np.clip(math.floor(p[1] + 0.5), 0, height))] for p in clip_box]
        out.append((int_box, score))
    return out


# ----------------------------------------------------- DB training-style shrink
def shrink_distance(w: float, h: float, shrink_ratio: float = 0.4) -> float:
    """DB label shrink: offset = area * (1 - r^2) / perimeter."""
    area = w * h
    per = 2 * (w + h)
    return area * (1 - shrink_ratio ** 2) / per if per > 0 else 0.0
