"""Sequential golden oracle (FIXTURES.md F3).

Straight-line, single-process computation of the expected per-document span
sequence — no Ray, no batching, no shuffles.  It exercises the exact same
value semantics (span_ocr math + layout parsers, themselves parity-tested
against the reference's own tbpu package) so the golden check isolates the
*distributed* concerns: explode, branch, actor batching, re-assembly order.
"""

from __future__ import annotations

from functools import lru_cache

from ..config import PipelineConfig
from ..stages.span_ocr import ocr_media_ref


@lru_cache(maxsize=8)
def load_dict_chars(dict_path: str) -> tuple[str, ...]:
    with open(dict_path, encoding="utf-8") as fh:
        return tuple(line.rstrip("\n") for line in fh if line != "\n")


def backends_for(dict_path: str, cfg: PipelineConfig):
    from .backend import make_backends

    return make_backends(cfg, list(load_dict_chars(dict_path)))


def golden_for_truths(truths: list[tuple], cfg: PipelineConfig, dict_path: str):
    """truths: generator span descriptions in TRUE offset order (corpus._generate_doc).
    Returns (golden spans list, per-span codes list)."""
    det_b, rec_b, cls_b = backends_for(dict_path, cfg)
    spans = []
    codes = []
    for order, t in enumerate(truths):
        if t[0] == "text":
            spans.append({"kind": "text", "text": t[2], "media_ref": "", "order": order})
            codes.append(0)
        else:
            ref = t[1]
            code, _msg, _blocks, text = ocr_media_ref(ref, cfg, det_b, rec_b, cls_b)
            spans.append({"kind": "media", "text": text, "media_ref": ref, "order": order})
            codes.append(code)
    return spans, codes
