"""Gap-tree reading-order sort (O5).

Re-implementation of the reference's GapTree_Sort_Algorithm
(``api/python/tbpu/parser_tools/gap_tree.py:19-330``): derive horizontal
"rows" from vertical overlap, track vertical gaps that persist across
consecutive rows ("cuts"), build a column-block tree from the cuts, and emit
blocks in pre-order traversal = human reading order.

Semantics preserved exactly (including tie-break and epsilon details):
  * rows accrete following units while ``next_top <= first_unit_bottom``;
  * page edges are padded by 1px so edge gaps never touch blocks;
  * a live gap survives a row when it intersects one of the row's gaps
    (intersection becomes the new extent); gaps that die become cuts ending
    at the previous row;
  * tree insertion: a node's parent is the lowest completed node whose
    horizontal span contains ``node.x_right - 2`` (with +1e-4 slack) and
    whose bottom row is strictly above; among equally-low candidates, the
    rightmost wins;
  * a live node ends when its left/right bounding gaps stop being continued
    or any gap opens strictly inside it;
  * children sorted left-to-right, units top-to-bottom, pre-order traversal.
"""

from __future__ import annotations

_EPS = 1e-4


def gap_tree_sort(blocks: list[dict], key: str = "normalized_bbox") -> tuple[list[dict], list[list[dict]]]:
    """Sort ``blocks`` by reading order using their ``key`` bbox.

    Returns (flat ordered blocks, per-column-node groups)."""
    if not blocks:
        return [], []
    units = [(tuple(b[key]), b) for b in blocks]
    units.sort(key=lambda u: u[0][1])
    page_l = min(u[0][0] for u in units) - 1
    page_r = max(u[0][2] for u in units) + 1

    cuts, rows = _cuts_and_rows(units, page_l, page_r)
    root = _layout_tree(cuts, rows)
    ordered_nodes = _preorder(root)
    flat = [u[1] for node in ordered_nodes for u in node["units"]]
    groups = [[u[1] for u in node["units"]] for node in ordered_nodes if node["units"]]
    return flat, groups


def _cuts_and_rows(units, page_l, page_r):
    rows = []
    completed = []          # finished cuts: (l, r, row_start, row_end)
    live = []               # gaps under consideration: (l, r, row_start)
    i = 0
    n = len(units)
    row_idx = 0
    while i < n:
        bottom = units[i][0][3]
        row = [units[i]]
        while i + 1 < n and units[i + 1][0][1] <= bottom:
            i += 1
            row.append(units[i])
        row.sort(key=lambda u: (u[0][0], u[0][2]))
        # gaps of this row: uncovered x-intervals between page_l and page_r
        row_gaps = []
        cursor = page_l
        for u in row:
            l, r = u[0][0], u[0][2]
            if l > cursor:
                row_gaps.append((cursor, l, row_idx))
            if r > cursor:
                cursor = r
        row_gaps.append((cursor, page_r, row_idx))
        # intersect live gaps with this row's gaps
        next_live = []
        new_flags = [True] * len(row_gaps)
        for l1, r1, start in live:
            survived = False
            for gi, (l2, r2, _) in enumerate(row_gaps):
                il, ir = max(l1, l2), min(r1, r2)
                if il <= ir:
                    next_live.append((il, ir, start))
                    new_flags[gi] = False
                    survived = True
            if not survived:
                completed.append((l1, r1, start, row_idx - 1))
        for gi, fresh in enumerate(new_flags):
            if fresh:
                next_live.append(row_gaps[gi])
        live = next_live
        rows.append(row)
        i += 1
        row_idx += 1
    for l, r, start in live:
        completed.append((l, r, start, len(rows) - 1))
    completed.sort(key=lambda c: c[0])
    return completed, rows


def _layout_tree(cuts, rows):
    rows_gaps: list[list[tuple[float, float]]] = [[] for _ in rows]
    for l, r, r0, r1 in cuts:
        for ri in range(r0, r1 + 1):
            rows_gaps[ri].append((l, r))

    root = {"x_left": cuts[0][0] - 1, "x_right": cuts[-1][1] + 1,
            "r_top": -1, "r_bottom": -1, "units": [], "children": []}
    done = [root]
    live: list[dict] = []

    def finish(node):
        probe = node["x_right"] - 2
        best_row = -2
        candidates = []
        for d in done:
            if probe < d["x_left"] or probe > d["x_right"] + _EPS:
                continue
            if d["r_bottom"] >= node["r_top"]:
                continue
            if d["r_bottom"] > best_row:
                best_row = d["r_bottom"]
                candidates = [d]
            elif d["r_bottom"] == best_row:
                candidates.append(d)
        parent = max(candidates, key=lambda d: d["x_right"])
        parent["children"].append(node)
        done.append(node)

    for ri, row in enumerate(rows):
        gaps = rows_gaps[ri]
        # retire live nodes whose bounding gaps stopped, or that a new gap splits
        survivors = []
        for node in live:
            xl, xr = node["x_left"], node["x_right"]
            left_cont = any(g[1] == xl for g in gaps)
            right_cont = any(g[0] == xr for g in gaps)
            split = any(xl < g[0] < xr or xl < g[1] < xr for g in gaps)
            if split or not left_cont or not right_cont:
                finish(node)
            else:
                node["r_bottom"] = ri
                survivors.append(node)
        live = survivors
        # assign this row's units to the inter-gap intervals, left to right
        ui = gi = 0
        while ui < len(row):
            unit = row[ui]
            x_l = gaps[gi][1]
            x_r = gaps[gi + 1][0]
            if unit[0][0] + _EPS > x_r:
                gi += 1
                continue
            for node in live:
                if node["x_left"] == x_l and node["x_right"] == x_r:
                    node["units"].append(unit)
                    break
            else:
                live.append({"x_left": x_l, "x_right": x_r, "r_top": ri,
                             "r_bottom": ri, "units": [unit], "children": []})
            ui += 1
    for node in live:
        finish(node)
    for node in done:
        node["children"].sort(key=lambda d: d["x_left"])
        node["units"].sort(key=lambda u: u[0][1])
    return root


def _preorder(root):
    stack = [root]
    out = []
    while stack:
        node = stack.pop()
        out.append(node)
        stack.extend(reversed(node["children"]))
    return out
