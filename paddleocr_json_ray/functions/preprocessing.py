"""tbpu line preprocessing (O8).

Semantics of ``linePreprocessing``
(``api/python/tbpu/parser_tools/line_preprocessing.py:84-95``): estimate the
page rotation as the median box angle; if it exceeds 3 degrees, rotate all
quads to normalise and shift to non-negative coordinates; attach the
axis-aligned ``normalized_bbox`` to every block; sort blocks by bbox top y.
"""

from __future__ import annotations

from .geometry import estimate_rotation, normalized_bboxes


def line_preprocess(blocks: list[dict]) -> list[dict]:
    """Mutates each block dict, adding 'normalized_bbox'; returns the blocks
    sorted by normalized top-y."""
    if not blocks:
        return blocks
    rot = estimate_rotation([b["box"] for b in blocks])
    bboxes = normalized_bboxes([b["box"] for b in blocks], rot)
    for b, bb in zip(blocks, bboxes):
        b["normalized_bbox"] = bb
    blocks.sort(key=lambda b: b["normalized_bbox"][1])
    return blocks
