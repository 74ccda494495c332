"""Greedy line grouping (O6).

Semantics of ``SingleLine.get_lines``
(``api/python/tbpu/parser_single_line.py:13-62``): blocks sorted by left x;
repeatedly take the leftmost unconsumed block and greedily absorb blocks to
its right when

  * the candidate's left edge is not before ``current_right - h`` of the line
    so far,
  * vertical extent stays within +-0.5*h of the anchor block,
  * heights differ by less than 0.5 * min(h1, h2).

Within a line, the separator between adjacent blocks is a forced space when
the horizontal gap exceeds 1.5x the mean height, else ``word_separator``;
the last block of each line ends with a newline.  Lines are finally sorted
by their first block's top y.

Requires blocks to carry 'normalized_bbox' (run line_preprocess first).
"""

from __future__ import annotations

from .separators import word_separator


def group_lines(blocks: list[dict], set_separators: bool = True) -> list[list[dict]]:
    pool: list[dict | None] = sorted(blocks, key=lambda b: b["normalized_bbox"][0])
    lines: list[list[dict]] = []
    for i1, anchor in enumerate(pool):
        if anchor is None:
            continue
        l1, top1, r1, bottom1 = anchor["normalized_bbox"]
        h1 = bottom1 - top1
        line = [anchor]
        right = r1
        for i2 in range(i1 + 1, len(pool)):
            cand = pool[i2]
            if cand is None:
                continue
            l2, top2, r2, bottom2 = cand["normalized_bbox"]
            h2 = bottom2 - top2
            if l2 < right - h1:
                continue
            if top2 < top1 - h1 * 0.5 or bottom2 > bottom1 + h1 * 0.5:
                continue
            if abs(h1 - h2) > min(h1, h2) * 0.5:
                continue
            line.append(cand)
            pool[i2] = None
            right = r2
        if set_separators:
            _set_line_separators(line)
        lines.append(line)
        pool[i1] = None
    lines.sort(key=lambda ln: ln[0]["normalized_bbox"][1])
    return lines


def _set_line_separators(line: list[dict]) -> None:
    for i in range(len(line) - 1):
        l1, t1, r1, b1 = line[i]["normalized_bbox"]
        l2, t2, r2, b2 = line[i + 1]["normalized_bbox"]
        # reference computes the "height" for the gap test as
        # (b1 + b2 - t1 - l2) * 0.5 — note the l2 (not t2): a quirk kept
        # verbatim (parser_single_line.py:50)
        h = (b1 + b2 - t1 - l2) * 0.5
        if l2 - r1 > h * 1.5:
            line[i]["end"] = " "
            continue
        line[i]["end"] = word_separator(line[i]["text"][-1], line[i + 1]["text"][0])
    line[-1]["end"] = "\n"
