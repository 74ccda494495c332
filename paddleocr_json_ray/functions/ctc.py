"""CTC greedy decode (P6).

Semantics of the reference decoder (``cpp/src/ocr_rec.cpp:94-132``):
per-timestep argmax; emit the dict char whenever argmax > 0 (index 0 is the
CTC blank) AND it is not a repeat of the previous timestep's argmax; score =
mean of the max-probs over *emitted* timesteps; if no timestep emits
(count == 0) the score is NaN and the caller must skip the slot, leaving it
empty (``cpp/src/ocr_rec.cpp:124-127``).

The label list contract (A4): dict chars with ``"#"`` prepended (blank) and
``" "`` appended (``cpp/include/ocr_rec.h:51-54``).
"""

from __future__ import annotations

import numpy as np


def ctc_greedy_decode(logits: np.ndarray, label_list: list[str]) -> tuple[str, float]:
    """Decode one [T, C] probability matrix.  Returns (text, score); score is
    NaN when nothing was emitted."""
    if logits.size == 0:
        return "", float("nan")
    arg = np.argmax(logits, axis=1)
    mx = np.max(logits, axis=1)
    emit = (arg > 0) & np.concatenate(([True], arg[1:] != arg[:-1]))
    idxs = arg[emit]
    if idxs.size == 0:
        return "", float("nan")
    text = "".join(label_list[i] for i in idxs)
    score = float(np.mean(mx[emit]))
    return text, score


def build_label_list(dict_chars: list[str]) -> list[str]:
    """blank marker + dict chars + trailing space (cpp/include/ocr_rec.h:51-54)."""
    return ["#", *dict_chars, " "]


def aspect_ratio_argsort(wh_ratios: list[float]) -> list[int]:
    """Rec batches crops sorted ascending by w/h ratio to minimise padding
    (O2, cpp/src/ocr_rec.cpp:30-35); results are written back to original
    indices by the caller."""
    return list(np.argsort(np.asarray(wh_ratios), kind="stable"))
