"""tbpu layout parsers (T1-T8) — the main-content extraction layer.

Registry parity with the reference (``api/python/tbpu/__init__.py:14-29``):
``none  multi_para  multi_line  multi_none  single_para  single_line
single_none  single_code``.  Contract (``api/python/tbpu/tbpu.py:9-22``):
``run(blocks) -> blocks`` where each block is
``{'box': [[x,y]*4], 'score': float, 'text': str}`` and every output block
gains an ``'end'`` separator (``''``, ``' '`` or ``'\n'``).

All parsers are document-local pure functions — they run inside per-span
batches (media) and are reused for text-span normalisation semantics; they
never touch Ray.
"""

from __future__ import annotations

from bisect import bisect_left

from .gap_tree import gap_tree_sort
from .lines import group_lines
from .paragraphs import parse_paragraphs
from .preprocessing import line_preprocess
from .separators import word_separator


def _drop_nbbox(blocks):
    for b in blocks:
        b.pop("normalized_bbox", None)
    return blocks


def parser_none(blocks: list[dict]) -> list[dict]:
    """T1: only default missing ends to newline (parser_none.py:6-14)."""
    for b in blocks:
        b.setdefault("end", "\n")
    return blocks


def parser_multi_para(blocks: list[dict]) -> list[dict]:
    """T2: gap-tree column sort, then per-column paragraph analysis
    (parser_multi_para.py:9-33)."""
    if not blocks:
        return blocks
    blocks = line_preprocess(blocks)
    ordered, groups = gap_tree_sort(blocks)
    for group in groups:
        units = [(b["normalized_bbox"], (b["text"][0], b["text"][-1]), b) for b in group]
        parse_paragraphs(units, lambda b, end: b.__setitem__("end", end))
        _drop_nbbox(group)
    return ordered


def parser_multi_line(blocks: list[dict]) -> list[dict]:
    """T3: gap-tree sort; every block ends with newline (parser_multi_line.py:8-22)."""
    if not blocks:
        return blocks
    blocks = line_preprocess(blocks)
    ordered, _ = gap_tree_sort(blocks)
    for b in ordered:
        b["end"] = "\n"
    return _drop_nbbox(ordered)


def parser_multi_none(blocks: list[dict]) -> list[dict]:
    """T4: gap-tree sort; pairwise word separators, trailing newline
    (parser_multi_none.py:9-29)."""
    if not blocks:
        return blocks
    blocks = line_preprocess(blocks)
    ordered, _ = gap_tree_sort(blocks)
    for i, b in enumerate(ordered):
        if i < len(ordered) - 1:
            b["end"] = word_separator(b["text"][-1], ordered[i + 1]["text"][0])
        else:
            b["end"] = "\n"
    return _drop_nbbox(ordered)


def parser_single_line(blocks: list[dict]) -> list[dict]:
    """T6: line grouping with in-line separators; lines end with newline
    (parser_single_line.py:8-73)."""
    if not blocks:
        return blocks
    blocks = line_preprocess(blocks)
    lines = group_lines(blocks)
    return _drop_nbbox([b for line in lines for b in line])


def parser_single_para(blocks: list[dict]) -> list[dict]:
    """T5: line grouping, then paragraph analysis over per-line pseudo-blocks
    (parser_single_para.py:8-49).  The pseudo-block bbox merge replicates the
    reference verbatim, including its use of the updated b1 in the
    max() for b2/b3 (parser_single_para.py:31-33)."""
    if not blocks:
        return blocks
    blocks = line_preprocess(blocks)
    lines = group_lines(blocks)
    pseudo = []
    for line in lines:
        b0, b1, b2, b3 = line[0]["normalized_bbox"]
        for tb in line[1:]:
            bb = tb["normalized_bbox"]
            b1 = min(b1, bb[1])
            b2 = max(b1, bb[2])
            b3 = max(b1, bb[3])
        pseudo.append({
            "bbox": (b0, b1, b2, b3),
            "edge_chars": (line[0]["text"][0], line[-1]["text"][-1]),
            "line": line,
        })
    units = [(p["bbox"], p["edge_chars"], p) for p in pseudo]
    parse_paragraphs(units, lambda p, end: p["line"][-1].__setitem__("end", end))
    return _drop_nbbox([tb for p in pseudo for tb in p["line"]])


def parser_single_none(blocks: list[dict]) -> list[dict]:
    """T7: single_line, then inner newlines replaced by word separators
    (parser_single_none.py:7-19)."""
    blocks = parser_single_line(blocks)
    for i in range(len(blocks) - 1):
        if blocks[i]["end"] == "\n":
            blocks[i]["end"] = word_separator(blocks[i]["text"][-1], blocks[i + 1]["text"][0])
    return blocks


def _merge_code_line(line: list[dict]) -> dict:
    """SingleCode line merge (parser_single_code.py:14-44): concatenate blocks
    with gap-proportional double-space runs, union the boxes, average score."""
    head = line[0]
    box = head["box"]
    h = box[3][1] - box[0][1]
    score = head["score"]
    for tb in line[1:]:
        bb = tb["box"]
        h = (h + bb[3][1] - bb[0][1]) / 2
        spaces = 0
        if bb[0][0] > box[1][0]:
            spaces = round((bb[0][0] - box[1][0]) / h)
        head["text"] += "  " * spaces + tb["text"]
        y_top = min(box[0][1], box[1][1], bb[0][1], bb[1][1])
        y_bot = max(box[2][1], box[3][1], bb[2][1], bb[3][1])
        x_l = min(box[0][0], box[3][0], bb[0][0], bb[3][0])
        x_r = max(box[1][0], box[2][0], bb[1][0], bb[2][0])
        box[0][1] = box[1][1] = y_top
        box[2][1] = box[3][1] = y_bot
        box[0][0] = box[3][0] = x_l
        box[1][0] = box[2][0] = x_r
        score += tb["score"]
    head["score"] = score / len(line)
    head.pop("normalized_bbox", None)
    head["end"] = "\n"
    return head


def parser_single_code(blocks: list[dict]) -> list[dict]:
    """T8: merge each visual line into one block, then add indent levels from
    a line-height grid via bisect (parser_single_code.py:46-74)."""
    if not blocks:
        return blocks
    blocks = line_preprocess(blocks)
    lines = group_lines(blocks)
    merged = [_merge_code_line(line) for line in lines]
    # indentation grid
    lh = sum(tb["box"][3][1] - tb["box"][0][1] for tb in merged) / len(merged)
    x_min = min(tb["box"][0][0] for tb in merged)
    x_max = max(tb["box"][0][0] for tb in merged)
    levels = []
    x = x_min
    while x < x_max:
        levels.append(x)
        x += lh
    for tb in merged:
        b = tb["box"]
        level = bisect_left(levels, b[0][0] + lh / 2) - 1
        tb["text"] = "  " * level + tb["text"]
        b[0][0] = b[3][0] = x_min
    return merged


PARSERS = {
    "none": parser_none,
    "multi_para": parser_multi_para,
    "multi_line": parser_multi_line,
    "multi_none": parser_multi_none,
    "single_para": parser_single_para,
    "single_line": parser_single_line,
    "single_none": parser_single_none,
    "single_code": parser_single_code,
}


def get_parser(key: str):
    """Factory parity with GetParser (api/python/tbpu/__init__.py:27-29)."""
    return PARSERS.get(key)


def render_text(blocks: list[dict]) -> str:
    """Join block texts with their predicted 'end' separators — the span-level
    extracted text."""
    return "".join(b["text"] + b.get("end", "") for b in blocks)
