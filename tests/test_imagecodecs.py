"""Dependency-free PNG/BMP codecs + the real-image envelope path: a
pixel-coded raster shipped as an actual PNG/BMP must OCR identically to the
SIMG payload, and corrupt real-format payloads must produce the reference's
imdecode error codes (203 path / 301 base64)."""

import base64
import struct
import zlib

import numpy as np
import pytest

from paddleocr_json_ray import errors
from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.functions.imagecodecs import (
    PNG_MAGIC,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
)
from paddleocr_json_ray.stages.span_ocr import ocr_media_ref
from paddleocr_json_ray.synth.backend import make_backends
from paddleocr_json_ray.synth.imaging import SimgBlock, SimgImage, encode, render_raster

CHARS = [chr(c) for c in range(32, 127)]


def _rand_img(h=23, w=31, seed=5):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_png_roundtrip_filters(filter_type):
    img = _rand_img()
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert np.array_equal(out, img)


def test_png_paeth_and_average_filters():
    """Hand-filter two scanlines with Average (3) and Paeth (4)."""
    img = _rand_img(h=2, w=5, seed=9)
    raw = bytearray()
    prev = np.zeros((5, 3), dtype=np.int32)
    for y, ftype in enumerate((3, 4)):
        row = img[y].astype(np.int32).reshape(-1)
        pr = prev.reshape(-1)
        filt = np.zeros(15, dtype=np.int32)
        for x in range(15):
            a = row[x - 3] if x >= 3 else 0
            b = pr[x]
            c = pr[x - 3] if x >= 3 else 0
            if ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (row[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = img[y].astype(np.int32)

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    payload = (PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)


def test_png_gray_and_rgba():
    gray = _rand_img()[:, :, 0]
    # build gray (color 0) and RGBA (color 6) by hand from the RGB encoder's shape
    def png(color, channels, px):
        h, w = px.shape[:2]
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        def chunk(ctype, data):
            body = ctype + data
            return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))
        return (PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    g = decode_png(png(0, 1, gray[..., None]))
    assert np.array_equal(g, np.repeat(gray[..., None], 3, axis=2))
    rgba = np.dstack([_rand_img(), np.full(gray.shape, 200, dtype=np.uint8)])
    assert np.array_equal(decode_png(png(6, 4, rgba)), rgba[..., :3])


def test_bmp_roundtrip():
    img = _rand_img(h=7, w=5)  # stride padding exercised (5*3=15 -> 16)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_malformed_payloads_return_none():
    assert decode_image(b"") is None
    assert decode_image(b"JUNKJUNK") is None
    assert decode_png(PNG_MAGIC + b"\x00\x00") is None
    good = encode_png(_rand_img())
    assert decode_png(good[:40]) is None  # truncated mid-chunk
    assert decode_bmp(b"BM" + b"\x00" * 20) is None


def _simg_payload():
    return encode(SimgImage(width=400, height=64, blocks=[
        SimgBlock(quad=[[10, 10], [250, 10], [250, 32], [10, 32]],
                  text="png envelope line", det_prob=0.95)]))


@pytest.mark.parametrize("codec", [encode_png, encode_bmp])
def test_real_format_through_envelope_matches_simg(codec):
    """The SAME raster shipped as PNG/BMP must extract the same spans as the
    SIMG payload — the pixel channel is codec-independent."""
    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    simg_payload = _simg_payload()
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed

    raster = render_raster(simg_decode(simg_payload), raster_seed(simg_payload))
    ref_simg = "b64:" + base64.b64encode(simg_payload).decode()
    ref_real = "b64:" + base64.b64encode(codec(raster)).decode()
    code_a, _, blocks_a, text_a = ocr_media_ref(ref_simg, cfg, *backends)
    code_b, _, blocks_b, text_b = ocr_media_ref(ref_real, cfg, *backends)
    assert code_a == code_b == errors.CODE_OK
    assert text_a == text_b == "png envelope line\n"
    assert [b["box"] for b in blocks_a] == [b["box"] for b in blocks_b]


def test_corrupt_png_envelope_codes(tmp_path):
    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    bad = encode_png(_rand_img())[:45]
    code, msg, _, _ = ocr_media_ref("b64:" + base64.b64encode(bad).decode(),
                                    cfg, *backends)
    assert code == errors.CODE_ERR_BASE64_IM_DECODE
    p = tmp_path / "bad.png"
    p.write_bytes(bad)
    code, msg, _, _ = ocr_media_ref(f"file:{p}", cfg, *backends)
    assert code == errors.CODE_ERR_PATH_DECODE and str(p) in msg


def test_media_ops_accept_real_formats(ray_session, tmp_path):
    """media_meta/thumbnails sniff PNG/BMP payloads alongside SIMG."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    import paddleocr_json_ray.ops.multimodal as mm
    from paddleocr_json_ray.ops.multimodal import ThumbnailStage
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed, render_raster as rr

    simg_payload = _simg_payload()
    raster = rr(simg_decode(simg_payload), raster_seed(simg_payload))
    tab = pa.table({
        "blob_id": pa.array(["simg", "png", "bmp", "junk"]),
        "ref_kind": pa.array(["b64"] * 4),
        "payload": pa.array([simg_payload, encode_png(raster), encode_bmp(raster), b"XX"],
                            type=pa.binary()),
    })
    got = ThumbnailStage()(tab).to_pydict()
    assert got["mean_pixel"][0] == got["mean_pixel"][1] == got["mean_pixel"][2] != -1
    assert got["mean_pixel"][3] == -1

    d = tmp_path / "blobs.parquet"
    pq.write_table(tab, str(d))
    ds = ray.data.read_parquet(str(d))
    orig = mm._read_blobs
    try:
        mm._read_blobs = lambda sf: ds  # point the op at our mixed-codec table
        out = mm.media_meta("unused").to_pandas().set_index("blob_id")
    finally:
        mm._read_blobs = orig
    assert bool(out.loc["png", "ok"]) and int(out.loc["png", "width"]) == raster.shape[1]
    assert bool(out.loc["bmp", "ok"]) and int(out.loc["bmp", "height"]) == raster.shape[0]
    assert int(out.loc["png", "n_blocks"]) == -1
    assert not bool(out.loc["junk", "ok"])
