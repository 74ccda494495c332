"""SIMG codec + raster determinism + error-envelope decode contract."""

import numpy as np

from paddleocr_json_ray.synth.imaging import (
    SimgBlock,
    SimgImage,
    array_to_bytes,
    bytes_to_array,
    decode,
    encode,
    raster_seed,
    render_raster,
)


def _img():
    return SimgImage(width=200, height=80, blocks=[
        SimgBlock(quad=[[10, 10], [100, 10], [100, 32], [10, 32]], text="héllo 文", det_prob=0.91),
        SimgBlock(quad=[[10, 40], [60, 40], [60, 62], [10, 62]], text="x", det_prob=0.5, flip180=True),
    ])


def test_roundtrip():
    img = _img()
    out = decode(encode(img))
    assert out.width == 200 and out.height == 80
    assert len(out.blocks) == 2
    assert out.blocks[0].text == "héllo 文"
    assert abs(out.blocks[0].det_prob - 0.91) < 1e-6
    assert out.blocks[1].flip180 is True
    assert out.blocks[0].quad == img.blocks[0].quad


def test_decode_failures():
    assert decode(b"") is None
    assert decode(b"NOTANIMAGE") is None
    payload = encode(_img())
    assert decode(payload[:-3]) is None  # truncated
    assert decode(b"XIMG1\n" + payload[6:]) is None  # bad magic


def test_raster_deterministic():
    img = _img()
    payload = encode(img)
    r1 = render_raster(img, raster_seed(payload))
    r2 = render_raster(img, raster_seed(payload))
    assert np.array_equal(r1, r2)
    assert r1.shape == (80, 200, 3)
    # block regions are darkened
    assert r1[15, 50].mean() < r1[70, 150].mean()


def test_array_codec():
    for arr in (np.arange(24, dtype=np.uint8).reshape(4, 6),
                np.random.default_rng(0).random((3, 5, 3)).astype(np.float32)):
        assert np.array_equal(bytes_to_array(array_to_bytes(arr)), arr)
