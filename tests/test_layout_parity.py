"""Parity tests: our layout parsers (re-implemented from semantics) must
produce byte-identical output to the reference's own tbpu package on
randomized synthetic pages (SURVEY.md §5.2 item 1)."""

import copy
import io
import random
from contextlib import redirect_stdout

import pytest

from paddleocr_json_ray.functions.layout import PARSERS

KEYS = ["none", "multi_para", "multi_line", "multi_none",
        "single_para", "single_line", "single_none", "single_code"]

WORDS = ["alpha", "Beta-", "gamma.", "DELTA", "ep,si", "zeta", "中文字符", "日本語テスト",
         "mixed中en", "x", "-", "(paren)", "1234", "word!"]


def _rand_blocks(rng: random.Random, n: int, two_col: bool = False, rotate: bool = False):
    blocks = []
    for i in range(n):
        col = rng.random() < 0.5 if two_col else False
        x0 = rng.randint(300, 340) if col else rng.randint(10, 50)
        y0 = rng.randint(5, 600)
        w = rng.randint(40, 200)
        h = rng.randint(18, 30)
        box = [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]
        if rotate:
            # shear slightly to give nonzero angles
            dy = rng.randint(3, 8)
            box = [[x0, y0 + dy], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h + dy]]
        text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 4)))
        blocks.append({"box": box, "score": round(rng.random(), 4) + 0.0001, "text": text})
    return blocks


def _strip(blocks):
    return [{k: v for k, v in b.items() if k != "normalized_bbox"} for b in blocks]


@pytest.mark.parametrize("key", KEYS)
@pytest.mark.parametrize("seed", [1, 7, 42, 1234])
def test_parser_parity(reference_tbpu, key, seed):
    rng = random.Random(seed)
    for case in range(6):
        n = rng.randint(1, 14)
        blocks = _rand_blocks(rng, n, two_col=case % 2 == 1, rotate=case == 4)
        ours_in = copy.deepcopy(blocks)
        ref_in = copy.deepcopy(blocks)
        ours = PARSERS[key](ours_in)
        ref_parser = reference_tbpu.GetParser(key)
        with redirect_stdout(io.StringIO()):  # SingleCode prints debug lines
            ref = ref_parser.run(ref_in)
        assert _strip(ours) == _strip(ref), f"{key} seed={seed} case={case}"


def test_empty_blocks_do_not_crash():
    for key in KEYS:
        assert PARSERS[key]([]) == []
