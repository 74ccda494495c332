"""Pixel codec properties: the raster is the ONLY information channel, so
render->detect->warp->decode must be an identity on the text for in-dict
content, reversal under uncorrected 180° flips, and orientation/confidence
must be recoverable from the halo."""

import random

import numpy as np
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.functions.geometry import get_rotate_crop_image
from paddleocr_json_ray.stages.span_ocr import crops_for_items, items_for_raster, rec_blocks
from paddleocr_json_ray.synth import pixelcode
from paddleocr_json_ray.synth.backend import make_backends
from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, render_raster

CHARS = [chr(c) for c in range(32, 127)]


def _image_for(texts, flips=None, probs=None, char_w=8, line_h=22, y_step=30):
    flips = flips or [False] * len(texts)
    probs = probs or [0.95] * len(texts)
    blocks = []
    for i, t in enumerate(texts):
        w = max(char_w * max(len(t), 1), 12)
        y0 = 10 + i * y_step
        blocks.append(SimgBlock(quad=[[10, y0], [10 + w, y0], [10 + w, y0 + line_h], [10, y0 + line_h]],
                                text=t, det_prob=probs[i], flip180=flips[i]))
    width = max(10 + max(len(t) for t in texts) * char_w + 10, 40)
    return SimgImage(width=width, height=10 + len(texts) * y_step, blocks=blocks)


def _pipeline(img, cfg):
    det_b, rec_b, cls_b = make_backends(cfg, CHARS)
    raster = render_raster(img, seed=11)
    items = items_for_raster(raster, cfg, det_b)
    crops = crops_for_items(raster, items, cfg)
    return rec_blocks(items, crops, cfg, rec_b, cls_b)


def test_roundtrip_identity_random_texts():
    rng = random.Random(7)
    texts = ["".join(rng.choice(CHARS[1:]) for _ in range(rng.randint(1, 60)))
             for _ in range(6)]
    blocks = _pipeline(_image_for(texts), PipelineConfig())
    assert [b["text"] for b in blocks] == texts


def test_repeated_chars_survive_parity_banding():
    texts = ["aaaaaa", "ab" * 10, "zzz zzz"]
    blocks = _pipeline(_image_for(texts), PipelineConfig())
    assert [b["text"] for b in blocks] == texts


def test_flip_reversed_without_cls_corrected_with_cls():
    texts = ["upside down line", "normal line"]
    img = _image_for(texts, flips=[True, False])
    no_cls = _pipeline(img, PipelineConfig(cls=False))
    assert [b["text"] for b in no_cls] == [texts[0][::-1], texts[1]]
    with_cls = _pipeline(img, PipelineConfig(cls=True))
    got = {b["text"]: b for b in with_cls}
    # flip corrected iff the painted confidence clears cls_thresh
    score = pixelcode.cls_truth_score(texts[0])
    expect0 = texts[0] if score > 0.9 else texts[0][::-1]
    assert expect0 in got and got[expect0]["cls_label"] == 1
    assert texts[1] in got and got[texts[1]]["cls_label"] == 0


def test_cls_score_recovered_from_halo():
    texts = ["confidence probe"]
    img = _image_for(texts)
    blocks = _pipeline(img, PipelineConfig(cls=True))
    painted = pixelcode.cls_truth_score(texts[0])
    assert blocks[0]["cls_score"] == pytest.approx(painted, abs=0.004)


def test_det_prob_thresholding_from_pixels():
    """A low-prob block's kernel must score below det_db_box_thresh and be
    dropped — decided purely by pixel values."""
    img = _image_for(["kept line here", "dropped low prob"], probs=[0.95, 0.35])
    blocks = _pipeline(img, PipelineConfig())
    assert [b["text"] for b in blocks] == ["kept line here"]


def test_out_of_dict_chars_fall_to_blank():
    det_b, rec_b, cls_b = make_backends(PipelineConfig(), list("abc "))
    img = _image_for(["abc xyz abc"])
    raster = render_raster(img, seed=11)
    items = items_for_raster(raster, PipelineConfig(), det_b)
    crops = crops_for_items(raster, items, PipelineConfig())
    blocks = rec_blocks(items, crops, PipelineConfig(), rec_b, cls_b)
    assert blocks[0]["text"] == "abc  abc"  # x/y/z have no dict slot


def test_rot90_single_cell_still_decodes():
    """Reading is always left-to-right like a real CRNN.  A 90°-rotated
    single-cell crop still decodes (cells are uniform); rotated MULTI-cell
    text garbles — exactly what a real recognizer does to sideways text
    (and why the reference rotates tall crops in the first place)."""
    tile = pixelcode.render_block("Q", 0.9, 0.95, hb=22, wb=12, flip180=False)
    rot = np.ascontiguousarray(np.rot90(tile, 1))  # the reference's CCW rotation
    assert pixelcode.decode_crop(rot) == "Q"
    multi = pixelcode.render_block("abc", 0.9, 0.95, hb=22, wb=40, flip180=False)
    assert pixelcode.decode_crop(np.ascontiguousarray(np.rot90(multi, 1))) != "abc"


def test_whole_image_decode_band_order():
    img = _image_for(["first line", "second line"])
    raster = render_raster(img, seed=3)
    assert pixelcode.decode_whole_image(raster) == "first line second line"


def test_neighbor_bleed_isolated_by_own_band():
    """Unclip margins pull neighbouring lines into a crop; decode must stick
    to the band nearest the crop centre."""
    cfg = PipelineConfig()
    det_b, rec_b, _ = make_backends(cfg, CHARS)
    img = _image_for(["top neighbour", "the target line", "bottom neighbour"],
                     y_step=26)  # tight pitch -> guaranteed bleed
    raster = render_raster(img, seed=5)
    items = items_for_raster(raster, cfg, det_b)
    crops = crops_for_items(raster, items, cfg)
    decoded = sorted(rec_b.read_crop(c) for c in crops)
    assert decoded == sorted(["top neighbour", "the target line", "bottom neighbour"])


def test_degenerate_tiny_block_no_crash():
    img = SimgImage(width=30, height=20, blocks=[
        SimgBlock(quad=[[2, 2], [4, 2], [4, 4], [2, 4]], text="q", det_prob=0.9)])
    raster = render_raster(img, seed=1)
    assert raster.shape == (20, 30, 3)
    # tiny kernels fall below the det min-size filters -> no boxes, no crash
    _pipeline(img, PipelineConfig())


def test_empty_text_block_detected_but_filtered():
    img = _image_for(["", "real text"])
    blocks = _pipeline(img, PipelineConfig())
    assert [b["text"] for b in blocks] == ["real text"]


def test_rec_tensor_decode_matches_crop_decode():
    """The rec backend consumes the crnn-resized NORMALIZED tensor (the
    real model input); its decode must equal the raw-crop decode across
    up/down-scales, including repeated chars (parity) and the padded batch
    layout."""
    from paddleocr_json_ray.functions.imageops import REC_MEAN, REC_SCALE, crnn_resize, normalize

    for text, crop_h in (("hello world", 30), ("xx yy zz", 26), ("aaa", 60),
                         ("scaled down far", 96)):
        tile = pixelcode.render_block(text, 0.95, 0.95,
                                      hb=max(crop_h - 8, 10), wb=8 * len(text) + 4,
                                      flip180=False)
        crop = np.full((crop_h, tile.shape[1] + 8, 3), 252, dtype=np.uint8)
        crop[4:4 + tile.shape[0], 4:4 + tile.shape[1]] = tile
        ratio = crop.shape[1] / crop.shape[0]
        t = normalize(crnn_resize(crop, 48, ratio * 2), REC_MEAN, REC_SCALE)  # right-padded
        assert pixelcode.decode_rec_tensor(t) == text
        assert pixelcode.decode_crop(crop) == text


def test_cls_tensor_probe_matches_crop_probe():
    """Cls consumes the real cls input (ClsResizeImg + normalize + pad
    AFTER normalize): orientation and confidence must survive the resize."""
    from paddleocr_json_ray.functions.imageops import cls_resize_normalize

    for flip in (False, True):
        tile = pixelcode.render_block("orientation probe", 0.95,
                                      pixelcode.cls_truth_score("orientation probe"),
                                      hb=22, wb=8 * 17, flip180=flip)
        crop = np.full((30, 8 * 17 + 8, 3), 252, dtype=np.uint8)
        crop[4:26, 4:4 + tile.shape[1]] = tile
        lab_c, sc_c = pixelcode.cls_probe(crop)
        lab_t, sc_t = pixelcode.cls_probe_tensor(cls_resize_normalize(crop))
        assert lab_c == lab_t == (1 if flip else 0)
        painted = pixelcode.cls_truth_score("orientation probe")
        assert sc_t == pytest.approx(painted, abs=0.02)
        assert sc_c == pytest.approx(painted, abs=0.005)


def test_warp_preserves_cells_under_offset_scale():
    """Nearest-neighbour warp with a deliberately offset/scaled quad still
    recovers the text (uniform cells tolerate ±2px and mild rescale)."""
    img = _image_for(["offset robustness"])
    raster = render_raster(img, seed=9)
    w = 8 * len("offset robustness")
    quad = [[8, 9], [14 + w, 8], [14 + w, 34], [8, 33]]
    crop = get_rotate_crop_image(raster, quad)
    assert pixelcode.decode_crop(crop) == "offset robustness"
