"""Table cell matching + HTML rebuild (O4, phase-2 structure mode).

Semantics of ``PaddleStructure::rebuild_table``
(``cpp/src/paddlestructure.cpp:144-257``): each OCR box (expanded by 1px) is
assigned to the structure cell minimizing (corner L1 distance metric,
1 - IoU, cell index) lexicographically; matched texts are stitched into the
predicted ``<td>`` tag sequence with the reference's ``<b>``-merge and
blank-join rules.  Distance metric (``:259-276``): full-corner L1 plus the
smaller of the two single-corner L1s.

The structure model itself ships DISABLED in the reference
(``cpp/src/main.cpp:126-130``); this math is the in-batch broadcast
nearest-neighbour join the Ray stage would run per image (cells are
per-image — no shuffle).
"""

from __future__ import annotations


def quad_to_xyxy(box) -> list[int]:
    """8-point quad -> [xmin, ymin, xmax, ymax] (Utility::xyxyxyxy2xyxy,
    cpp/src/utility.cpp:462-480)."""
    xs = [p[0] for p in box]
    ys = [p[1] for p in box]
    return [min(xs), min(ys), max(xs), max(ys)]


def cell_distance(box1, box2) -> float:
    """cpp/src/paddlestructure.cpp:259-276."""
    d = (abs(box2[0] - box1[0]) + abs(box2[1] - box1[1])
         + abs(box2[2] - box1[2]) + abs(box2[3] - box1[3]))
    d2 = abs(box2[0] - box1[0]) + abs(box2[1] - box1[1])
    d3 = abs(box2[2] - box1[2]) + abs(box2[3] - box1[3])
    return d + min(d2, d3)


def iou_xyxy(a, b) -> float:
    """Axis-aligned IoU (Utility::iou, cpp/src/utility.cpp:540-579)."""
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    if ix1 <= ix0 or iy1 <= iy0:
        return 0.0
    inter = (ix1 - ix0) * (iy1 - iy0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


def match_cells(ocr_blocks: list[dict], cell_boxes: list[list[int]]) -> list[list[str]]:
    """Assign each OCR block's text to its nearest cell; returns per-cell
    text lists.  ``cell_boxes`` entries may be quads (8 values) or xyxy."""
    matched: list[list[str]] = [[] for _ in cell_boxes]
    for blk in ocr_blocks:
        ob = quad_to_xyxy(blk["box"])
        ob = [ob[0] - 1, ob[1] - 1, ob[2] + 1, ob[3] + 1]
        best = None
        for j, cell in enumerate(cell_boxes):
            cb = quad_to_xyxy([cell[i:i + 2] for i in range(0, 8, 2)]) if len(cell) == 8 else list(cell)
            key = (cell_distance(ob, cb), 1 - iou_xyxy(ob, cb), j)
            if best is None or key < best:
                best = key
        if best is not None:
            matched[best[2]].append(blk["text"])
    return matched


def rebuild_table_html(html_tags: list[str], matched: list[list[str]]) -> str:
    """Stitch matched cell texts into the tag sequence
    (cpp/src/paddlestructure.cpp:185-255)."""
    out = []
    td_idx = 0
    for tag in html_tags:
        if "</td>" not in tag:
            out.append(tag)
            continue
        if "<td></td>" in tag:
            out.append("<td>")
        texts = matched[td_idx] if td_idx < len(matched) else []
        if texts:
            b_with = "<b>" in texts[0] and len(texts) > 1
            if b_with:
                out.append("<b>")
            for j, content in enumerate(texts):
                if len(texts) > 1:
                    if content.startswith("<b>"):
                        content = content[3:]
                    if content.endswith("</b>"):
                        content = content[:-4]
                    if not content:
                        continue
                    if j != len(texts) - 1 and not content.endswith(" "):
                        content += " "
                out.append(content)
            if b_with:
                out.append("</b>")
        out.append("</td>" if "<td></td>" in tag else tag)
        td_idx += 1
    return "".join(out)
