"""Pure-Python VP8 (lossy WebP) key-frame decoder tests.

The interop contract pins the decoded Y/U/V planes BYTE-EXACT against the
system libwebp decoder (functions/webp_native.decode_yuv) — YUV
reconstruction is normative in RFC 6386, RGB upsampling is not.  The
matrix spans qualities, content classes (flat / noise / gradient / mixed
quadrants that make libwebp's encoder enable SEGMENTATION), odd and tiny
frame sizes, and the OCR raster the envelope pipeline feeds.
"""

import base64
import struct

import numpy as np
import pytest

from paddleocr_json_ray.functions import vp8, webp_native
from paddleocr_json_ray.functions.webp import decode_webp

needs_libwebp = pytest.mark.skipif(
    not webp_native.available(), reason="system libwebp not present")


def _vp8_body(webp_bytes: bytes) -> bytes:
    assert webp_bytes[:4] == b"RIFF" and webp_bytes[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp_bytes):
        fourcc = webp_bytes[pos:pos + 4]
        size = struct.unpack_from("<I", webp_bytes, pos + 4)[0]
        if fourcc == b"VP8 ":
            return webp_bytes[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _mixed_image(h: int, w: int, seed: int) -> np.ndarray:
    """Flat / noise / gradient / dark quadrants: variance spread makes the
    libwebp encoder turn on segmentation (multiple quantizer segments),
    covering the segment-map + per-segment dequant decode paths."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    hh, ww = h // 2, w // 2
    img[:hh, :ww] = 230
    img[:hh, ww:] = rng.integers(0, 256, (hh, w - ww, 3))
    yy, xx = np.mgrid[0:h - hh, 0:ww]
    img[hh:, :ww] = np.stack([(xx * 2) % 256, (yy * 2) % 256,
                              (xx + yy) % 256], -1).astype(np.uint8)
    img[hh:, ww:] = 40
    return img


def _assert_yuv_exact(img: np.ndarray, quality: int):
    payload = webp_native.encode_lossy_rgb(img, quality=quality)
    oracle = webp_native.decode_yuv(payload)
    mine = vp8.decode_vp8_yuv(_vp8_body(payload))
    assert mine is not None
    for name, a, b in zip("YUV", mine, oracle):
        np.testing.assert_array_equal(
            a, b, err_msg=f"{name} plane differs at q{quality}")


@needs_libwebp
def test_vp8_yuv_byte_exact_matrix():
    rng = np.random.default_rng(17)
    flat = np.full((16, 16, 3), 200, np.uint8)
    noise = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    yy, xx = np.mgrid[0:56, 0:72]
    grad = np.stack([np.minimum(xx * 3, 255), np.minimum(yy * 4, 255),
                     (xx + yy) % 256], -1).astype(np.uint8)
    _assert_yuv_exact(flat, 75)
    _assert_yuv_exact(noise, 10)
    _assert_yuv_exact(noise, 90)
    _assert_yuv_exact(grad, 50)
    _assert_yuv_exact(grad, 100)


@needs_libwebp
def test_vp8_yuv_exact_segmentation_and_odd_sizes():
    # segmentation-enabled stream (verified: the header's segmentation
    # bit is set for this content) + fractional-macroblock dimensions
    mixed = _mixed_image(96, 128, seed=3)
    payload = webp_native.encode_lossy_rgb(mixed, quality=60)
    body = _vp8_body(payload)
    bd = vp8._BoolDec(body, 10, min(100, len(body) - 10))
    bd.flag()
    bd.flag()
    assert bd.flag() == 1, "expected a segmentation-enabled stream"
    _assert_yuv_exact(mixed, 60)
    rng = np.random.default_rng(23)
    for shape in ((1, 1, 3), (3, 5, 3), (15, 17, 3), (33, 31, 3)):
        _assert_yuv_exact(rng.integers(0, 256, shape).astype(np.uint8), 80)


@needs_libwebp
def test_vp8_ocr_raster_yuv_exact():
    from paddleocr_json_ray.synth.imaging import (SimgBlock, SimgImage,
                                                  render_raster)

    raster = render_raster(SimgImage(width=400, height=96, blocks=[
        SimgBlock(quad=[[10, 10], [250, 10], [250, 32], [10, 32]],
                  text="hello world", det_prob=0.95),
        SimgBlock(quad=[[10, 50], [350, 50], [350, 72], [10, 72]],
                  text="vp8 keyframe decode", det_prob=0.9),
    ]), seed=3)
    _assert_yuv_exact(raster, 92)


@needs_libwebp
def test_vp8_rgb_close_to_libwebp():
    """RGB output uses our own (nearest) chroma upsampler vs libwebp's
    fancy bilinear one — close, not byte-equal."""
    img = _mixed_image(48, 64, seed=9)
    payload = webp_native.encode_lossy_rgb(img, quality=85)
    mine = vp8.decode_vp8(_vp8_body(payload))
    ref = webp_native.decode_rgb(payload)
    assert mine.shape == ref.shape
    assert np.abs(mine.astype(int) - ref.astype(int)).mean() < 4.0


@needs_libwebp
def test_vp8_envelope_without_libwebp(monkeypatch):
    """With the ctypes delegation unavailable, decode_webp's lossy path
    falls back to the pure decoder and the OCR envelope still produces
    spans (code 100) — the seam the reference fills with cv::imdecode is
    closed with no system library at all."""
    from paddleocr_json_ray import errors
    from paddleocr_json_ray.config import PipelineConfig
    from paddleocr_json_ray.stages.span_ocr import ocr_media_ref
    from paddleocr_json_ray.synth.backend import make_backends
    from paddleocr_json_ray.synth.imaging import (SimgBlock, SimgImage,
                                                  render_raster)

    CHARS = [chr(c) for c in range(32, 127)]

    raster = render_raster(SimgImage(width=320, height=64, blocks=[
        SimgBlock(quad=[[8, 8], [220, 8], [220, 30], [8, 30]],
                  text="fallback path", det_prob=0.95),
    ]), seed=5)
    payload = webp_native.encode_lossy_rgb(raster, quality=100)
    monkeypatch.setattr(webp_native, "decode_rgb", lambda p: None)
    dec = decode_webp(payload)
    assert dec is not None and dec.shape == raster.shape
    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    ref = "b64:" + base64.b64encode(payload).decode()
    code, _, blocks, _ = ocr_media_ref(ref, cfg, *backends)
    assert code == errors.CODE_OK
    assert len(blocks) >= 1


@needs_libwebp
def test_vp8_fuzz_never_raises():
    """Truncation, garbage, and random bit flips: the decoder returns None
    or a validly-shaped plane tuple, never raises (arithmetic-coded tails
    legitimately decode to SOMETHING under corruption — structural checks,
    not overrun budgets, are the rejection surface)."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    body = _vp8_body(webp_native.encode_lossy_rgb(img, quality=70))
    uw, uh = (48 + 1) >> 1, (32 + 1) >> 1
    for cut in (0, 3, 9, 10, 15, len(body) // 2, len(body) - 1):
        got = vp8.decode_vp8_yuv(body[:cut])
        assert got is None or got[0].shape == (32, 48)
    for seed in range(20):
        r = np.random.default_rng(seed)
        bad = bytearray(body)
        for _ in range(3):
            bad[int(r.integers(0, len(bad)))] ^= int(r.integers(1, 256))
        got = vp8.decode_vp8_yuv(bytes(bad))
        if got is not None:
            assert got[0].shape == (32, 48)
            assert got[1].shape == (uh, uw)
    assert vp8.decode_vp8_yuv(bytes(rng.integers(0, 256, 200,
                                                 dtype=np.uint8))) is None


def test_vp8_structural_rejects():
    # too short / bad start code / interframe bit / absurd dimensions
    assert vp8.decode_vp8_yuv(b"") is None
    assert vp8.decode_vp8_yuv(b"\x00" * 9) is None
    good_hdr = bytearray(b"\x30\x01\x00\x9d\x01\x2a\x10\x00\x10\x00")
    bad_sc = bytearray(good_hdr)
    bad_sc[3] = 0x9C
    assert vp8.decode_vp8_yuv(bytes(bad_sc) + b"\x00" * 20) is None
    inter = bytearray(good_hdr)
    inter[0] |= 1  # frame_type = interframe
    assert vp8.decode_vp8_yuv(bytes(inter) + b"\x00" * 20) is None
    huge = bytearray(good_hdr)
    huge[6:8] = struct.pack("<H", 0x3FFF)
    huge[8:10] = struct.pack("<H", 0x3FFF)
    assert vp8.decode_vp8_yuv(bytes(huge) + b"\x00" * 20) is None
