"""Property-based parity fuzzing (hypothesis): the re-implemented operator
core must match the reference's Python layer on arbitrary inputs, and the
codec/minhash layers must satisfy their algebraic contracts."""

import copy
import io
from contextlib import redirect_stdout

import numpy as np
from hypothesis import given, settings, strategies as st

from paddleocr_json_ray.functions.layout import PARSERS
from paddleocr_json_ray.functions.separators import word_separator
from paddleocr_json_ray.functions.textstats import char_shingles, jaccard
from paddleocr_json_ray.ops.dedup import _perm_params, minhash_signature
from paddleocr_json_ray.synth import imaging

# text strategy mixing latin, CJK, punctuation, hyphens
_CHARS = st.sampled_from(list("abXZ19-., ()!文字間日本語한국" + "　！"))
_TEXT = st.text(alphabet=_CHARS, min_size=1, max_size=12).filter(lambda s: s.strip())


@st.composite
def _blocks(draw, max_n=10):
    n = draw(st.integers(1, max_n))
    out = []
    for _ in range(n):
        x0 = draw(st.integers(0, 400))
        y0 = draw(st.integers(0, 400))
        w = draw(st.integers(8, 220))
        h = draw(st.integers(8, 40))
        dy = draw(st.integers(0, 6))
        box = [[x0, y0 + dy], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h + dy]]
        out.append({"box": box, "score": draw(st.floats(0.01, 1.0, allow_nan=False)),
                    "text": draw(_TEXT)})
    return out


@settings(max_examples=40, deadline=None)
@given(blocks=_blocks(), key=st.sampled_from(sorted(PARSERS)))
def test_parser_parity_fuzz(reference_tbpu, blocks, key):
    ours = PARSERS[key](copy.deepcopy(blocks))
    with redirect_stdout(io.StringIO()):
        ref = reference_tbpu.GetParser(key).run(copy.deepcopy(blocks))
    strip = lambda bs: [{k: v for k, v in b.items() if k != "normalized_bbox"} for b in bs]
    assert strip(ours) == strip(ref)


@settings(max_examples=200, deadline=None)
@given(a=st.characters(), b=st.characters())
def test_word_separator_parity_fuzz(reference_tbpu, a, b):
    from tbpu.parser_tools.paragraph_parse import word_separator as ref_ws

    assert word_separator(a, b) == ref_ws(a, b)


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 500), h=st.integers(1, 500),
       texts=st.lists(st.text(max_size=20), max_size=5))
def test_simg_roundtrip_fuzz(w, h, texts):
    blocks = [imaging.SimgBlock(quad=[[1, 1], [9, 1], [9, 5], [1, 5]], text=t)
              for t in texts]
    img = imaging.SimgImage(width=w, height=h, blocks=blocks)
    out = imaging.decode(imaging.encode(img))
    assert out.width == w and out.height == h
    assert [b.text for b in out.blocks] == texts


@settings(max_examples=25, deadline=None)
@given(base=st.text(min_size=50, max_size=300), edit=st.text(max_size=10))
def test_minhash_estimates_jaccard(base, edit):
    """Signature agreement must approximate true shingle jaccard within a
    loose statistical band (64 permutations)."""
    a_chars, b_chars = _perm_params()
    s1 = char_shingles(base)
    s2 = char_shingles(base + edit)
    if s1.size == 0 or s2.size == 0:
        return
    sig1 = minhash_signature(s1, a_chars, b_chars)
    sig2 = minhash_signature(s2, a_chars, b_chars)
    est = float(np.mean(sig1 == sig2))
    true = jaccard(set(s1.tolist()), set(s2.tolist()))
    assert abs(est - true) <= 0.25
