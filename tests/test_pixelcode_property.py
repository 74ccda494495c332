"""Property fuzzing (hypothesis) of the pixel codec and image codecs:
render -> (optional real-codec roundtrip) -> detect -> warp -> decode must
be an identity on printable text for any block geometry the corpus can
emit, and the PNG/BMP codecs must be exact on arbitrary images."""

import numpy as np
from hypothesis import assume, given, settings, strategies as st

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.functions.imagecodecs import decode_bmp, decode_png, encode_bmp, encode_png
from paddleocr_json_ray.stages.span_ocr import crops_for_items, items_for_raster, rec_blocks
from paddleocr_json_ray.synth.backend import make_backends
from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, render_raster

CHARS = [chr(c) for c in range(33, 127)]  # printable, no space (texts strip-safe)
_text = st.text(alphabet=st.sampled_from(CHARS), min_size=1, max_size=48)


@settings(max_examples=40, deadline=None)
@given(text=_text,
       char_w=st.integers(6, 12),
       line_h=st.integers(18, 30),
       x0=st.integers(6, 40),
       y0=st.integers(6, 40),
       flip=st.booleans(),
       prob=st.floats(0.75, 0.99))
def test_single_block_roundtrip(text, char_w, line_h, x0, y0, flip, prob):
    cfg = PipelineConfig(cls=True)
    det_b, rec_b, cls_b = make_backends(cfg, CHARS + [" "])
    w = max(char_w * len(text), 12)
    # tall boxes trigger the reference's 90° crop rotation, after which a
    # (real or stand-in) recognizer reads sideways text as garbage — the
    # identity property only holds for non-rotating geometries
    assume(w >= line_h)
    img = SimgImage(width=x0 + w + 12, height=y0 + line_h + 12, blocks=[
        SimgBlock(quad=[[x0, y0], [x0 + w, y0], [x0 + w, y0 + line_h], [x0, y0 + line_h]],
                  text=text, det_prob=round(prob, 4), flip180=flip)])
    raster = render_raster(img, seed=17)
    items = items_for_raster(raster, cfg, det_b)
    assert len(items) == 1
    blocks = rec_blocks(items, crops_for_items(raster, items, cfg), cfg, rec_b, cls_b)
    # with cls on, a confident flip is corrected; low-confidence flips stay
    # reversed — both outcomes are legitimate, garbage is not
    from paddleocr_json_ray.synth.pixelcode import cls_truth_score

    expect = {text} if (not flip or cls_truth_score(text) > cfg.cls_thresh) else {text[::-1]}
    assert len(blocks) == 1 and blocks[0]["text"] in expect


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31),
       filter_type=st.sampled_from([0, 1, 2]))
def test_png_codec_exact(h, w, seed, filter_type):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=filter_type)), img)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31))
def test_bmp_codec_exact(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    quality=st.sampled_from([100, 85, 60, 30]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_progressive_jpeg_always_bit_equals_baseline(h, w, quality, seed):
    """Property: for ANY image and quality, the progressive (SOF2)
    encode/decode reconstructs EXACTLY the baseline decode of the same
    image — the two entropy layouts carry identical coefficients."""
    import numpy as np

    from paddleocr_json_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                   encode_jpeg_progressive)

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    assert prog is not None and base is not None
    np.testing.assert_array_equal(prog, base)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=50),
    w=st.integers(min_value=1, max_value=50),
    ncol=st.integers(min_value=1, max_value=256),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(h, w, ncol, interlace, seed):
    """Property: any palette image round-trips GIF byte-exactly, sequential
    or interlaced."""
    import numpy as np

    from paddleocr_json_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (h, w))]
    dec = decode_gif(encode_gif(img, interlace=interlace))
    assert dec is not None
    np.testing.assert_array_equal(dec, img)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    comp=st.sampled_from(["none", "packbits", "lzw"]),
    predictor=st.booleans(),
    rps=st.sampled_from([0, 3, 11]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_tiff_roundtrip_property(h, w, comp, predictor, rps, seed):
    """Property: any RGB image round-trips baseline TIFF byte-exactly under
    every compression x predictor x strip configuration."""
    import numpy as np

    from paddleocr_json_ray.functions.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    p = encode_tiff(img, compression=comp, rows_per_strip=rps,
                    predictor=predictor)
    dec = decode_tiff(p)
    assert dec is not None
    np.testing.assert_array_equal(dec, img)
