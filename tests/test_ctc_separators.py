"""Unit tests: CTC greedy decode (P6) and word_separator (T9) semantics."""

import math

import numpy as np
import pytest

from paddleocr_json_ray.functions.ctc import (
    aspect_ratio_argsort,
    build_label_list,
    ctc_greedy_decode,
)
from paddleocr_json_ray.functions.separators import word_separator


def _logits(rows):
    """rows: list of (argmax_index, prob) over C=5 classes."""
    out = np.full((len(rows), 5), 0.01, dtype=np.float32)
    for t, (idx, p) in enumerate(rows):
        out[t, idx] = p
    return out


LABELS = build_label_list(["a", "b", "c"])  # ['#','a','b','c',' ']


def test_repeat_collapse():
    text, score = ctc_greedy_decode(_logits([(1, 0.9), (1, 0.8), (2, 0.7)]), LABELS)
    assert text == "ab"
    assert score == pytest.approx((0.9 + 0.7) / 2)


def test_blank_separated_repeats_kept():
    text, _ = ctc_greedy_decode(_logits([(1, 0.9), (0, 0.9), (1, 0.8)]), LABELS)
    assert text == "aa"


def test_all_blank_is_nan():
    text, score = ctc_greedy_decode(_logits([(0, 0.9), (0, 0.9)]), LABELS)
    assert text == "" and math.isnan(score)


def test_trailing_space_label():
    text, _ = ctc_greedy_decode(_logits([(4, 0.9)]), LABELS)
    assert text == " "


def test_aspect_sort_stable():
    assert aspect_ratio_argsort([2.0, 1.0, 2.0, 0.5]) == [3, 1, 0, 2]


# word_separator matrix (T9)
@pytest.mark.parametrize("a,b,expect", [
    ("文", "字", ""),      # CJK x CJK
    ("た", "字", ""),      # kana x han
    ("。", "文", ""),      # fullwidth punct counts as CJK range
    ("-", "w", ""),        # hyphen wrap
    ("d", ",", ""),        # next is punctuation
    ("d", "(", ""),        # Ps category
    ("d", "w", " "),       # latin x latin
    ("文", "w", " "),      # CJK x latin
    ("w", "文", " "),      # latin x CJK
    ("1", "2", " "),
])
def test_word_separator(a, b, expect):
    assert word_separator(a, b) == expect


def test_word_separator_matches_reference(reference_tbpu):
    from tbpu.parser_tools.paragraph_parse import word_separator as ref_ws
    chars = ["a", "Z", "-", ",", ".", "(", ")", "文", "字", "た", "。", "1", " ", "ü", "—"]
    for a in chars:
        for b in chars:
            assert word_separator(a, b) == ref_ws(a, b), (a, b)
