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


# --------------------------------------------------------------------- JPEG
def _smooth_img(h=41, w=97):
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    g = ((np.sin(y[:, None]) * np.cos(x[None, :]) * 0.5 + 0.5) * 255).astype(np.uint8)
    return np.stack([g, g[::-1], np.roll(g, 7, axis=1)], axis=-1)


@pytest.mark.parametrize("subsampling,quality,bound", [
    ("444", 75, 16), ("444", 100, 3), ("420", 75, 40), ("420", 95, 24),
])
def test_jpeg_roundtrip_error_bounds(subsampling, quality, bound):
    from paddleocr_json_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_img()
    dec = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=subsampling))
    assert dec is not None and dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= bound


def test_jpeg_q100_near_lossless_on_noise():
    """Quality 100 quantizes every coefficient by 1: residual error is only
    the DCT float round-trip, bounded +-3 even on white noise (the
    DCT-hostile worst case)."""
    from paddleocr_json_ray.functions.jpeg import decode_jpeg, encode_jpeg

    noise = _rand_img(h=24, w=40, seed=17)
    dec = decode_jpeg(encode_jpeg(noise, quality=100))
    assert int(np.abs(dec.astype(int) - noise.astype(int)).max()) <= 3


def test_jpeg_odd_sizes_and_gray():
    from paddleocr_json_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_img(h=33, w=49)  # pad path for both 8- and 16-px MCUs
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
        assert dec.shape == img.shape
    gray = _smooth_img()[:, :, 0]
    dec = decode_jpeg(encode_jpeg(gray, quality=95))
    assert dec.shape == (gray.shape[0], gray.shape[1], 3)


def test_jpeg_malformed_returns_none():
    from paddleocr_json_ray.functions.jpeg import decode_jpeg, encode_jpeg

    good = encode_jpeg(_smooth_img())
    assert decode_jpeg(b"\xff\xd8\xff\xe0JUNK") is None
    assert decode_jpeg(b"notajpeg") is None
    assert decode_jpeg(good[:60]) is None  # truncated before SOS
    # progressive SOF2 is rejected, not mis-decoded
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None


def test_jpeg_through_envelope():
    """A JPEG payload flows through the envelope path: code 100, the SAME
    detected boxes as the SIMG payload (detection/cls read coarse pixel
    structure, robust to quality-100 loss), and near-identical text.  The
    glyph channel packs parity in fine pixel detail, so byte-exact text
    needs a lossless codec (PNG/BMP above) — a weights-backed CRNN at the
    backend seam is robust to JPEG like the reference's."""
    from paddleocr_json_ray.functions.jpeg import encode_jpeg

    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    simg_payload = _simg_payload()
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed
    raster = render_raster(simg_decode(simg_payload), raster_seed(simg_payload))
    ref_simg = "b64:" + base64.b64encode(simg_payload).decode()
    ref_jpeg = "b64:" + base64.b64encode(encode_jpeg(raster, quality=100)).decode()
    code_a, _, blocks_a, text_a = ocr_media_ref(ref_simg, cfg, *backends)
    code_b, _, blocks_b, text_b = ocr_media_ref(ref_jpeg, cfg, *backends)
    assert code_a == code_b == errors.CODE_OK
    assert [b["box"] for b in blocks_a] == [b["box"] for b in blocks_b]
    import difflib

    assert difflib.SequenceMatcher(None, text_a, text_b).ratio() >= 0.75

    # corrupt JPEG -> the reference's imdecode error codes
    bad = encode_jpeg(raster)[:60]
    code, _, _, _ = ocr_media_ref("b64:" + base64.b64encode(bad).decode(),
                                  cfg, *backends)
    assert code == errors.CODE_ERR_BASE64_IM_DECODE


@pytest.mark.parametrize("quality", [100, 90, 70, 35])
def test_progressive_jpeg_bit_equals_baseline(quality):
    """The progressive (SOF2) decode path reconstructs coefficients
    BIT-EXACTLY equal to the baseline decode of the same image at the same
    quality — DC/AC first passes, successive-approximation refinement and
    EOB runs all verified against the sequential pipeline."""
    from paddleocr_json_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                   encode_jpeg_progressive)

    rng = np.random.default_rng(11)
    img = (rng.integers(0, 256, size=(41, 67, 3)).astype(float) * 0.3
           + 100).astype(np.uint8)
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    assert prog is not None
    np.testing.assert_array_equal(prog, base)


def test_progressive_jpeg_edges_odd_sizes_gray():
    from paddleocr_json_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                                   encode_jpeg_progressive)

    img = np.zeros((130, 201, 3), np.uint8)
    img[10:60, 20:180] = [255, 0, 0]
    img[70:120, 40:90] = [0, 255, 128]
    img[::7, :] = 255
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=92))
    base = decode_jpeg(encode_jpeg(img, quality=92))
    np.testing.assert_array_equal(prog, base)
    gray = (np.outer(np.arange(50), np.ones(71)) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_progressive(gray, quality=88))
    assert dec is not None and dec.shape == (50, 71, 3)
    # truncated progressive payload -> None, not an exception
    good = encode_jpeg_progressive(img, quality=80)
    assert decode_jpeg(good[:100]) is None
    assert decode_jpeg(good[:len(good) // 2]) is None


def test_progressive_jpeg_through_envelope():
    """A PROGRESSIVE payload round-trips the envelope with code 100 and
    codec-independent OCR output (same det boxes as the SIMG source; text
    >= 0.75 similar — identical to the baseline-JPEG envelope contract,
    since the progressive decode is bit-equal to baseline)."""
    from paddleocr_json_ray.functions.jpeg import encode_jpeg_progressive

    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    simg_payload = _simg_payload()
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed
    raster = render_raster(simg_decode(simg_payload), raster_seed(simg_payload))
    ref_simg = "b64:" + base64.b64encode(simg_payload).decode()
    ref_prog = "b64:" + base64.b64encode(
        encode_jpeg_progressive(raster, quality=100)).decode()
    code_a, _, blocks_a, text_a = ocr_media_ref(ref_simg, cfg, *backends)
    code_b, _, blocks_b, text_b = ocr_media_ref(ref_prog, cfg, *backends)
    assert code_a == code_b == errors.CODE_OK
    assert [b["box"] for b in blocks_a] == [b["box"] for b in blocks_b]
    import difflib

    assert difflib.SequenceMatcher(None, text_a, text_b).ratio() >= 0.75


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_exact(interlace):
    """GIF is palette-indexed and LOSSLESS for <=256-color images; both the
    sequential and interlaced row orders must round-trip byte-exactly,
    including the 12-bit-code / table-reset regime on noisy images."""
    from paddleocr_json_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 256, (90, 140))]
    dec = decode_gif(encode_gif(img, interlace=interlace))
    np.testing.assert_array_equal(dec, img)
    tiny = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    dec2 = decode_gif(encode_gif(tiny, interlace=interlace))
    np.testing.assert_array_equal(dec2, np.repeat(tiny[..., None], 3, axis=2))


def test_gif_malformed_and_limits():
    from paddleocr_json_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(18)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 64, (40, 60))]
    good = encode_gif(img)
    assert decode_gif(good[:30]) is None
    assert decode_gif(good[:len(good) // 2]) is None
    assert decode_gif(b"GIF89a" + b"\x00" * 6) is None
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


def test_gif_tiff_decode_bomb_rejected():
    """Untrusted uint16 header dims (up to 65535x65535x3 ~ 12 GB) must be
    rejected BEFORE canvas allocation — both formats, both the static and
    the animated GIF path."""
    import struct

    from paddleocr_json_ray.functions.gif import decode_gif, decode_gif_frames
    from paddleocr_json_ray.functions.tiff import decode_tiff

    # GIF header claiming a 65535x65535 logical screen
    bomb_gif = (b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
                + b"\x3b")
    assert decode_gif(bomb_gif) is None
    assert decode_gif_frames(bomb_gif) is None

    # TIFF IFD claiming 65535x65535 (little-endian, tags 256/257)
    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHI4s", 256, 3, 1, struct.pack("<HH", 65535, 0))
    ifd += struct.pack("<HHI4s", 257, 3, 1, struct.pack("<HH", 65535, 0))
    ifd += struct.pack("<I", 0)
    bomb_tiff = b"II*\x00" + struct.pack("<I", 8) + ifd
    assert decode_tiff(bomb_tiff) is None


def test_gif_through_envelope_byte_exact():
    """The OCR raster has <= 256 distinct colors, so GIF carries it
    LOSSLESSLY — byte-exact spans like PNG/BMP, unlike JPEG's
    similarity-bounded contract."""
    from paddleocr_json_ray.functions.gif import encode_gif

    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    simg_payload = _simg_payload()
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed
    raster = render_raster(simg_decode(simg_payload), raster_seed(simg_payload))
    ref_simg = "b64:" + base64.b64encode(simg_payload).decode()
    ref_gif = "b64:" + base64.b64encode(encode_gif(raster)).decode()
    code_a, _, blocks_a, text_a = ocr_media_ref(ref_simg, cfg, *backends)
    code_b, _, blocks_b, text_b = ocr_media_ref(ref_gif, cfg, *backends)
    assert code_a == code_b == errors.CODE_OK
    assert text_a == text_b
    assert [b["box"] for b in blocks_a] == [b["box"] for b in blocks_b]


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("predictor", [False, True])
def test_tiff_roundtrip_exact(comp, predictor):
    """Baseline TIFF round-trips byte-exactly across all three supported
    compressions, with and without horizontal-differencing Predictor 2 and
    multi-strip organization."""
    from paddleocr_json_ray.functions.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (61, 83, 3), dtype=np.uint8)
    for rps in (0, 9):
        p = encode_tiff(img, compression=comp, rows_per_strip=rps,
                        predictor=predictor)
        np.testing.assert_array_equal(decode_tiff(p), img)


def test_tiff_malformed_and_unsupported():
    from paddleocr_json_ray.functions.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(24)
    img = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    good = encode_tiff(img, compression="lzw")
    assert decode_tiff(good[:30]) is None
    assert decode_tiff(good[:len(good) // 2]) is None
    assert decode_tiff(b"II*\x00" + b"\x00" * 8) is None
    assert decode_tiff(b"XX*\x00") is None


def test_tiff_and_gif_through_decode_image_dispatch():
    from paddleocr_json_ray.functions.gif import encode_gif
    from paddleocr_json_ray.functions.tiff import encode_tiff

    rng = np.random.default_rng(25)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 16, (20, 30))]
    np.testing.assert_array_equal(decode_image(encode_tiff(img)), img)
    np.testing.assert_array_equal(decode_image(encode_gif(img)), img)


def test_tiff_through_envelope_byte_exact():
    """TIFF is lossless: byte-exact spans like PNG/BMP/GIF."""
    from paddleocr_json_ray.functions.tiff import encode_tiff

    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    simg_payload = _simg_payload()
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed
    raster = render_raster(simg_decode(simg_payload), raster_seed(simg_payload))
    ref_simg = "b64:" + base64.b64encode(simg_payload).decode()
    ref_tiff = "b64:" + base64.b64encode(
        encode_tiff(raster, compression="lzw", predictor=True)).decode()
    code_a, _, blocks_a, text_a = ocr_media_ref(ref_simg, cfg, *backends)
    code_b, _, blocks_b, text_b = ocr_media_ref(ref_tiff, cfg, *backends)
    assert code_a == code_b == errors.CODE_OK
    assert text_a == text_b
    assert [b["box"] for b in blocks_a] == [b["box"] for b in blocks_b]


def test_gif_animation_roundtrip_and_compositing():
    """Animated GIF: full-frame and transparent-delta (sub-rect compositing)
    encodings must reconstruct every frame exactly; the delta stream is the
    compositing stress (unchanged pixels ride the transparent index)."""
    from paddleocr_json_ray.functions.gif import (decode_gif,
                                                  decode_gif_frames,
                                                  encode_gif_animation)

    rng = np.random.default_rng(33)
    pal = rng.integers(0, 256, (40, 3), dtype=np.uint8)
    base = pal[rng.integers(0, 40, (50, 70))]
    frames = [base.copy() for _ in range(5)]
    for k, f in enumerate(frames):
        f[10 + k:20 + k, 15:40] = pal[k]
    for delta in (False, True):
        p = encode_gif_animation(frames, transparent_delta=delta)
        dec = decode_gif_frames(p)
        assert dec is not None and len(dec) == 5
        for a, b in zip(dec, frames):
            np.testing.assert_array_equal(a, b)
    # static first-frame decode agrees; max_frames truncates
    np.testing.assert_array_equal(
        decode_gif(encode_gif_animation(frames)), frames[0])
    assert len(decode_gif_frames(encode_gif_animation(frames),
                                 max_frames=2)) == 2


def test_gif_frame_sample_stage_actor_pool(ray_session, tmp_path):
    """The video-style frame sampler runs as an actor-pool map_batches over
    animated-GIF payload rows: 1 payload -> ceil(n_frames/every) rows, with
    per-frame geometry and features."""
    import pyarrow as pa
    import ray.data

    from paddleocr_json_ray.functions.gif import encode_gif_animation
    from paddleocr_json_ray.ops.multimodal import GifFrameSampleStage

    rng = np.random.default_rng(34)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    ids, payloads, nframes = [], [], []
    for gi in range(6):
        n = int(rng.integers(1, 9))
        base = pal[rng.integers(0, 16, (20, 30))]
        frames = [base.copy() for _ in range(n)]
        for k, f in enumerate(frames):
            f[k:k + 4, 2:12] = pal[k % 16]
        ids.append(f"g{gi}")
        payloads.append(encode_gif_animation(frames, transparent_delta=True))
        nframes.append(n)
    tab = pa.table({"blob_id": pa.array(ids),
                    "payload": pa.array(payloads, type=pa.binary())})
    got = (ray.data.from_arrow(tab)
           .map_batches(GifFrameSampleStage, batch_format="pyarrow",
                        concurrency=2, batch_size=4,
                        fn_constructor_kwargs={"every": 2})
           .to_pandas())
    for gid, n in zip(ids, nframes):
        rows = got[got["blob_id"] == gid]
        assert len(rows) == -(-n // 2)  # every 2nd frame, ceil
        assert set(rows["frame_idx"]) == set(range(0, n, 2))
        assert (rows["height"] == 20).all() and (rows["width"] == 30).all()


# ----------------------------------------------------------------- WebP/VP8L
def test_webp_distance_map_matches_spec_prefix():
    """The 120-entry 2D distance map is generated (d^2 asc, dy desc, +dx
    first); pin the first 40 entries against the spec's literal table."""
    from paddleocr_json_ray.functions.webp import _DIST_MAP

    spec40 = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
              (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
              (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
              (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
              (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:40] == spec40


@pytest.mark.parametrize("kwargs", [
    {},
    {"transform": "subtract_green"},
    {"transform": "color"},
    {"transform": "color", "color_elem": (255, 1, 130)},
    {"cache_bits": 8},
    {"backrefs": True},
    {"backrefs": True, "cache_bits": 6},
])
def test_webp_roundtrip_exact(kwargs):
    """VP8L is lossless: every encoder surface (plain literals, subtract-
    green, cross-color, color cache, LZ77 runs) must round-trip exactly."""
    from paddleocr_json_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (29, 33, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_webp(encode_webp(img, **kwargs)), img)
    runs = np.repeat(rng.integers(0, 256, (15, 9, 3), dtype=np.uint8), 5, axis=1)
    np.testing.assert_array_equal(decode_webp(encode_webp(runs, **kwargs)), runs)


@pytest.mark.parametrize("mode", list(range(14)))
def test_webp_predictor_modes_roundtrip(mode):
    """All 14 spatial predictors (incl. Select's 2021 tie-break and the
    C-truncating ClampAddSubtractHalf) invert exactly."""
    from paddleocr_json_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(100 + mode)
    img = rng.integers(0, 256, (18, 23, 3), dtype=np.uint8)
    dec = decode_webp(encode_webp(img, transform="predictor", predictor_mode=mode))
    np.testing.assert_array_equal(dec, img)


@pytest.mark.parametrize("ncolors", [2, 3, 4, 16, 17, 256])
def test_webp_palette_roundtrip(ncolors):
    """Color-indexing transform incl. sub-pixel packing (8/4/2/1 px per
    byte) and the delta-coded palette image."""
    from paddleocr_json_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(200 + ncolors)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncolors, (21, 37))]
    np.testing.assert_array_equal(decode_webp(encode_webp(img, transform="palette")), img)
    with pytest.raises(ValueError, match="256"):
        encode_webp(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8),
                    transform="palette")


def test_webp_edge_sizes_and_gray():
    from paddleocr_json_ray.functions.webp import decode_webp, encode_webp

    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_webp(encode_webp(one)), one)
    gray = np.arange(35, dtype=np.uint8).reshape(5, 7)
    np.testing.assert_array_equal(decode_webp(encode_webp(gray)),
                                  np.repeat(gray[..., None], 3, axis=2))
    col = np.arange(9 * 3, dtype=np.uint8).reshape(9, 1, 3)
    np.testing.assert_array_equal(decode_webp(encode_webp(col)), col)


def test_webp_malformed_lossy_and_container():
    """Truncation/garbage -> None; a malformed lossy "VP8 " body -> None
    (libwebp rejects it); VP8L inside a VP8X extended container decodes."""
    from paddleocr_json_ray.functions.webp import decode_webp, encode_webp

    img = _rand_img(12, 17, seed=41)
    good = encode_webp(img)
    assert decode_webp(good[:16]) is None
    assert decode_webp(good[:len(good) // 2]) is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8) is None
    assert decode_webp(b"RIFF" + struct.pack("<I", 20) + b"WEBP"
                       + b"VP8 " + struct.pack("<I", 8) + b"\x00" * 8) is None
    # corrupt the VP8L signature byte
    bad = bytearray(good)
    bad[20] ^= 0xFF
    assert decode_webp(bytes(bad)) is None
    # re-wrap the VP8L chunk behind a VP8X header chunk
    vp8l_chunk = good[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_chunk
    ext = b"RIFF" + struct.pack("<I", len(body)) + body
    np.testing.assert_array_equal(decode_webp(ext), img)


def test_webp_through_decode_image_dispatch():
    from paddleocr_json_ray.functions.webp import encode_webp

    img = _rand_img(20, 30, seed=42)
    np.testing.assert_array_equal(decode_image(encode_webp(img)), img)


def test_webp_through_envelope_byte_exact():
    """The OCR raster has <= 256 distinct colors, so palette-mode VP8L
    carries it LOSSLESSLY — byte-exact spans like PNG/BMP/GIF/TIFF."""
    from paddleocr_json_ray.functions.webp import encode_webp

    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    simg_payload = _simg_payload()
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed
    raster = render_raster(simg_decode(simg_payload), raster_seed(simg_payload))
    ref_simg = "b64:" + base64.b64encode(simg_payload).decode()
    ref_webp = "b64:" + base64.b64encode(
        encode_webp(raster, transform="palette", backrefs=True)).decode()
    code_a, _, blocks_a, text_a = ocr_media_ref(ref_simg, cfg, *backends)
    code_b, _, blocks_b, text_b = ocr_media_ref(ref_webp, cfg, *backends)
    assert code_a == code_b == errors.CODE_OK
    assert text_a == text_b
    assert [b["box"] for b in blocks_a] == [b["box"] for b in blocks_b]


def test_webp_decode_never_raises_on_garbage():
    """Malformed payloads — random bytes behind a valid RIFF/VP8L preamble,
    and a valid stream truncated at every 7th byte — must return None (or a
    valid decode for pure-padding truncations), never raise."""
    from paddleocr_json_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    good = encode_webp(img)
    for cut in range(12, len(good), 7):
        out = decode_webp(good[:cut])
        assert out is None or np.array_equal(out, img)
    for seed in range(40):
        r = np.random.default_rng(seed)
        body = bytes(r.integers(0, 256, size=200, dtype=np.uint8))
        payload = (b"RIFF" + struct.pack("<I", len(body) + 12) + b"WEBP"
                   + b"VP8L" + struct.pack("<I", len(body)) + b"\x2f" + body)
        out = decode_webp(payload)
        assert out is None or isinstance(out, np.ndarray)
    # bit flips inside a valid stream
    for pos in range(21, min(len(good), 120), 3):
        bad = bytearray(good)
        bad[pos] ^= 0x55
        out = decode_webp(bytes(bad))
        assert out is None or isinstance(out, np.ndarray)


# ---------------------------------------------------------------------------
# libwebp interop (functions/webp_native) — lossy "VP8 " decode + the
# interop oracle for the pure-Python VP8L codec.  The reference decodes
# lossy .webp by DELEGATING to a codec library (cv::imdecode -> bundled
# libwebp, cpp/src/task_linux.cpp:67-122); webp_native is the same
# delegation via ctypes, import/load-guarded so machines without the
# shared library keep the documented seam (decode_webp -> None).

from paddleocr_json_ray.functions import webp_native

needs_libwebp = pytest.mark.skipif(
    not webp_native.available(), reason="system libwebp not present")


@needs_libwebp
def test_webp_native_interop_lossless_both_directions():
    """Pin the hand-written VP8L bitstream against the REAL library: our
    encoder's output decodes byte-exactly through libwebp, and libwebp's
    lossless encoder output decodes byte-exactly through our pure-Python
    decoder — across transform modes and image shapes."""
    from paddleocr_json_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(33)
    images = [
        rng.integers(0, 256, (37, 53, 3), dtype=np.uint8),          # noise
        np.repeat(np.repeat(rng.integers(0, 5, (6, 8)), 7, axis=0),
                  9, axis=1).astype(np.uint8)[..., None].repeat(3, 2) * 50,
        (np.add.outer(np.arange(24) * 3, np.arange(40) * 2)[..., None]
         % 256 + np.array([0, 10, 20])).astype(np.uint8),           # smooth
        np.full((1, 1, 3), 200, np.uint8),                          # 1x1
    ]
    for img in images:
        # ours -> libwebp
        for kwargs in ({}, {"transform": "predictor"},
                       {"transform": "palette"}, {"backrefs": True}):
            if kwargs.get("transform") == "palette" and len(
                    np.unique(img.reshape(-1, 3), axis=0)) > 256:
                continue
            dec = webp_native.decode_rgb(encode_webp(img, **kwargs))
            np.testing.assert_array_equal(dec, img)
        # libwebp -> ours
        np.testing.assert_array_equal(
            decode_webp(webp_native.encode_lossless_rgb(img)), img)


@needs_libwebp
def test_webp_lossy_decode_roundtrip_and_dispatch():
    """Lossy "VP8 " payloads decode through the decode_webp dispatcher with
    small error on smooth content; malformed lossy bodies return None."""
    from paddleocr_json_ray.functions.webp import decode_webp

    smooth = (np.minimum(np.add.outer(np.arange(48) * 2,
                                      np.arange(64) * 1.5), 255)[..., None]
              + np.array([0, 20, 40])).clip(0, 255).astype(np.uint8)
    payload = webp_native.encode_lossy_rgb(smooth, quality=92)
    assert payload[:4] == b"RIFF" and payload[12:16] == b"VP8 "
    dec = decode_webp(payload)
    assert dec.shape == smooth.shape
    assert np.abs(dec.astype(int) - smooth.astype(int)).mean() < 4.0
    # matches the raw binding (dispatcher adds nothing)
    np.testing.assert_array_equal(dec, webp_native.decode_rgb(payload))
    # truncation / garbage never raise
    for cut in (16, 24, len(payload) // 2):
        assert decode_webp(payload[:cut]) is None
    bad = bytearray(payload)
    bad[25] ^= 0xFF
    out = decode_webp(bytes(bad))
    assert out is None or isinstance(out, np.ndarray)


@needs_libwebp
def test_lossy_webp_through_envelope():
    """A lossy-WebP media span flows through the OCR envelope: code 100 and
    detection fires.  Unlike JPEG q100 (4:4:4, near-lossless), VP8 ALWAYS
    subsamples chroma 4:2:0, which halves the synthetic pixelcode's G/B
    glyph-cell resolution — so box/text parity with the SIMG payload is a
    property the synthetic channel cannot offer here (a weights-backed CRNN
    at the backend seam is robust to 4:2:0 like the reference's).  The
    contract is integration: the lossy path decodes and produces spans."""
    cfg = PipelineConfig()
    backends = make_backends(cfg, CHARS)
    simg_payload = _simg_payload()
    from paddleocr_json_ray.synth.imaging import decode as simg_decode, raster_seed

    raster = render_raster(simg_decode(simg_payload), raster_seed(simg_payload))
    ref = "b64:" + base64.b64encode(
        webp_native.encode_lossy_rgb(raster, quality=100)).decode()
    code, _, blocks, _ = ocr_media_ref(ref, cfg, *backends)
    assert code == errors.CODE_OK
    assert len(blocks) >= 1
    # corrupt payload -> the reference's imdecode error code
    bad = webp_native.encode_lossy_rgb(raster, quality=100)[:40]
    code, _, _, _ = ocr_media_ref(
        "b64:" + base64.b64encode(bad).decode(), cfg, *backends)
    assert code == errors.CODE_ERR_BASE64_IM_DECODE


# ---------------------------------------------------------------------------
# animated WebP (VP8X + ANIM + ANMF) — frames ride the byte-exact VP8L
# codec, so compositing (sub-rectangles, dispose-to-background) is pinned
# exactly against a numpy reference.  Completes the WebP family next to
# the animated-GIF support above.

def test_webp_animation_roundtrip_and_compositing():
    from paddleocr_json_ray.functions.webp import (decode_webp_frames,
                                                   encode_webp_anim)

    rng = np.random.default_rng(44)
    f0 = rng.integers(0, 256, (20, 24, 3)).astype(np.uint8)
    f1 = rng.integers(0, 256, (8, 10, 3)).astype(np.uint8)
    f2 = rng.integers(0, 256, (6, 6, 3)).astype(np.uint8)
    bg = (7, 8, 9)
    pay = encode_webp_anim([f0, f1, f2], offsets=[(0, 0), (4, 2), (10, 8)],
                           dispose=[False, True, False], background=bg)
    got = decode_webp_frames(pay)
    assert got is not None and len(got) == 3
    canvas = np.zeros((20, 24, 3), np.uint8)
    canvas[:] = bg
    canvas[0:20, 0:24] = f0
    np.testing.assert_array_equal(got[0], canvas)
    canvas[2:10, 4:14] = f1
    np.testing.assert_array_equal(got[1], canvas)
    canvas[2:10, 4:14] = bg  # frame 1 disposes to background
    canvas[8:14, 10:16] = f2
    np.testing.assert_array_equal(got[2], canvas)
    # max_frames truncation; odd offsets rejected by the writer
    assert len(decode_webp_frames(pay, max_frames=2)) == 2
    with pytest.raises(ValueError):
        encode_webp_anim([f1], offsets=[(3, 0)])


def test_webp_animation_still_fallback_and_fuzz():
    from paddleocr_json_ray.functions.webp import (decode_webp_frames,
                                                   encode_webp,
                                                   encode_webp_anim)

    img = _rand_img(12, 17, seed=45)
    got = decode_webp_frames(encode_webp(img))
    assert got is not None and len(got) == 1
    np.testing.assert_array_equal(got[0], img)
    pay = encode_webp_anim([img, img], offsets=[(0, 0), (0, 0)])
    # truncation / garbage / bomb never raise
    for cut in (10, 16, 30, len(pay) // 2, len(pay) - 3):
        out = decode_webp_frames(pay[:cut])
        assert out is None or isinstance(out, list)
    bad = bytearray(pay)
    bad[25] ^= 0xFF
    out = decode_webp_frames(bytes(bad))
    assert out is None or isinstance(out, list)
    # decode-bomb: canvas dims past the pixel budget reject before alloc
    bomb = bytearray(pay)
    bomb[20 + 4:20 + 10] = b"\xff\xff\xff\xff\xff\xff"  # VP8X dims
    assert decode_webp_frames(bytes(bomb)) is None


@needs_libwebp
def test_webp_animation_lossy_frame():
    """An ANMF frame carrying a lossy "VP8 " chunk decodes through the same
    delegation-then-pure dispatch as still images."""
    import struct as _s

    from paddleocr_json_ray.functions.webp import decode_webp_frames

    rng = np.random.default_rng(46)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    still = webp_native.encode_lossy_rgb(img, quality=95)
    vp8_chunk = still[12:]

    def u24(v):
        return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))

    def chunk(fourcc, body):
        return fourcc + _s.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    anmf = u24(0) + u24(0) + u24(15) + u24(15) + u24(50) + b"\x00" \
        + vp8_chunk
    body = (b"WEBP"
            + chunk(b"VP8X", bytes((0x02, 0, 0, 0)) + u24(15) + u24(15))
            + chunk(b"ANIM", bytes((0, 0, 0, 255)) + _s.pack("<H", 0))
            + chunk(b"ANMF", anmf))
    pay = b"RIFF" + _s.pack("<I", len(body)) + body
    got = decode_webp_frames(pay)
    assert got is not None and len(got) == 1
    ref = webp_native.decode_rgb(still)
    np.testing.assert_array_equal(got[0], ref)


def test_webp_frame_sample_stage_dispatch(ray_session):
    """The frame sampler handles GIF and animated-WebP payloads in the same
    batch, dispatching by magic bytes."""
    import pyarrow as pa
    import ray.data

    from paddleocr_json_ray.functions.gif import encode_gif_animation
    from paddleocr_json_ray.functions.webp import encode_webp_anim
    from paddleocr_json_ray.ops.multimodal import GifFrameSampleStage

    rng = np.random.default_rng(47)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    gif_frames = [pal[rng.integers(0, 8, (14, 18))] for _ in range(4)]
    webp_frames = [rng.integers(0, 256, (14, 18, 3)).astype(np.uint8)
                   for _ in range(5)]
    tab = pa.table({
        "blob_id": pa.array(["g0", "w0"]),
        "payload": pa.array([encode_gif_animation(gif_frames),
                             encode_webp_anim(webp_frames)],
                            type=pa.binary()),
    })
    got = (ray.data.from_arrow(tab)
           .map_batches(GifFrameSampleStage, batch_format="pyarrow",
                        concurrency=1, batch_size=2,
                        fn_constructor_kwargs={"every": 1})
           .to_pandas())
    assert len(got[got["blob_id"] == "g0"]) == 4
    assert len(got[got["blob_id"] == "w0"]) == 5
    assert (got["height"] == 14).all() and (got["width"] == 18).all()


@needs_libwebp
def test_webp_alpha_still_dispatch():
    """A VP8X container with an ALPH chunk + lossy VP8 chunk (the common
    web transparent-image layout): both libwebp and the pure fallback
    decode the RGB and DROP alpha — the reference's cv::imdecode
    IMREAD_COLOR behavior (cpp/src/task_linux.cpp:67-122)."""
    import struct as _s

    from paddleocr_json_ray.functions import vp8
    from paddleocr_json_ray.functions.webp import decode_webp

    rng = np.random.default_rng(48)
    img = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    still = webp_native.encode_lossy_rgb(img, quality=90)
    vp8_chunk = still[12:]

    def u24(v):
        return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))

    def chunk(fourcc, body):
        return fourcc + _s.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    alph = b"\x00" + b"\xff" * (16 * 24)  # raw, no filter, opaque
    body = (b"WEBP"
            + chunk(b"VP8X", bytes((0x10, 0, 0, 0)) + u24(23) + u24(15))
            + chunk(b"ALPH", alph) + vp8_chunk)
    pay = b"RIFF" + _s.pack("<I", len(body)) + body
    ref = webp_native.decode_rgb(pay)
    assert ref is not None, "libwebp rejected the VP8X+ALPH container"
    np.testing.assert_array_equal(decode_webp(pay), ref)
    # pure fallback path (no delegation): same RGB via the VP8 decoder
    raw_vp8 = still[20:20 + _s.unpack_from("<I", still, 16)[0]]
    yuv_mine = vp8.decode_vp8_yuv(raw_vp8)
    yuv_ref = webp_native.decode_yuv(still)
    for a, b in zip(yuv_mine, yuv_ref):
        np.testing.assert_array_equal(a, b)
