"""Paragraph grouping + end-separator prediction (O7).

Semantics of ``ParagraphParse``
(``api/python/tbpu/parser_tools/paragraph_parse.py:42-173``), re-expressed as
a function over (bbox, text) pairs:

1. Sort blocks by top y.  Walk down, accreting a block into the current
   paragraph when both left and right edges stay within 1.2x the running line
   height AND the line spacing does not exceed the running spacing + 0.5x the
   line height.  Edge/height/spacing references are updated as running
   averages.
2. Re-attach single-line paragraphs to the previous paragraph (left aligned,
   right not overhanging, spacing small enough) or the next paragraph (left
   aligned-or-indented; right aligned for multi-line next, overhang allowed
   for single-line next); when both qualify, pick the vertically nearer one.
3. Within each paragraph: separator between consecutive blocks from
   ``word_separator`` on the (last char, first char) pair; the paragraph's
   last block ends with a newline.

Returns the list of (index-lists, ends) via the ``set_end(payload, sep)``
callback so callers can attach ends to arbitrary objects.
"""

from __future__ import annotations

from typing import Callable

from .separators import word_separator

TH = 1.2  # alignment threshold in units of line height


def parse_paragraphs(units: list[tuple[tuple[float, float, float, float], tuple[str, str], object]],
                     set_end: Callable[[object, str], None]) -> None:
    """``units``: (bbox(x0,y0,x1,y1), (first_char, last_char), payload)."""
    if not units:
        return
    units = sorted(units, key=lambda u: u[0][1])
    x0, top, x1, bottom = units[0][0]
    line_h = bottom - top
    line_sp = None
    cur = [units[0]]
    paras: list[list] = []
    spaces: list[float | None] = []
    prev_bottom = bottom
    for u in units[1:]:
        l, t, r, b = u[0]
        gap = t - prev_bottom
        if (abs(x0 - l) <= line_h * TH and abs(x1 - r) <= line_h * TH
                and (line_sp is None or gap < line_sp + line_h * 0.5)):
            x0 = (x0 + l) / 2
            x1 = (x1 + r) / 2
            line_h = (line_h + (b - t)) / 2
            line_sp = gap if line_sp is None else (line_sp + gap) / 2
            cur.append(u)
        else:
            paras.append(cur)
            spaces.append(line_sp)
            cur = [u]
            x0, x1, line_h = l, r, b - t
            line_sp = None
        prev_bottom = b
    paras.append(cur)
    spaces.append(line_sp)

    # single-line paragraph re-attachment, scanned bottom-up
    for i in reversed(range(len(paras))):
        if len(paras[i]) != 1:
            continue
        l, t, r, b = paras[i][0][0]
        up_ok = down_ok = False
        if i > 0:
            ul, ut, ur, ub = paras[i - 1][-1][0]
            uh = ub - ut
            up_ok = abs(ul - l) <= uh * TH and r <= ur + uh * TH
            if spaces[i - 1] is not None and t - ub > spaces[i - 1] + uh * 0.5:
                up_ok = False
        if i < len(paras) - 1:
            dl, dt, dr, db = paras[i + 1][0][0]
            dh = db - dt
            if dl - dh * TH <= l <= dl + dh * (1 + TH):
                if len(paras[i + 1]) > 1:
                    down_ok = abs(dr - r) <= dh * TH
                else:
                    down_ok = dr - dh * TH < r
            if spaces[i + 1] is not None and dt - b > spaces[i + 1] + dh * 0.5:
                down_ok = False
        if up_ok and down_ok:
            # both qualify: vertically nearer side wins
            if t - paras[i - 1][-1][0][3] < paras[i + 1][0][0][1] - b:
                paras[i - 1].append(paras[i][0])
            else:
                paras[i + 1].insert(0, paras[i][0])
        elif up_ok:
            paras[i - 1].append(paras[i][0])
        elif down_ok:
            paras[i + 1].insert(0, paras[i][0])
        if up_ok or down_ok:
            del paras[i]
            del spaces[i]

    for para in paras:
        for a, b2 in zip(para, para[1:]):
            set_end(a[2], word_separator(a[1][1], b2[1][0]))
        set_end(para[-1][2], "\n")
