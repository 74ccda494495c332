"""Hand-authored VP8 conformance streams.

libwebp's simple encoder API always emits ONE token partition, the normal
loop filter, sharpness 0 and no loop-filter deltas — so the interop matrix
in test_vp8.py never exercises those decode paths.  This file builds tiny
key-frame bitstreams with a minimal RFC 6386 bool/tree ENCODER (keyframe
headers, i16 modes, one Y2 DC coefficient per macroblock, zero AC), walks
them through BOTH decoders, and pins byte equality:

  libwebp decode  ==  functions/vp8 decode

for multi-partition (2/4), simple-filter, sharpness>0, lf-delta,
segmentation-map and per-segment-quantizer streams.  libwebp accepting the
stream at all also validates the writer itself.
"""

import struct

import numpy as np
import pytest

from paddleocr_json_ray.functions import vp8, webp_native
from paddleocr_json_ray.functions.vp8_tables import (COEFF_PROBS_DEFAULT,
                                                     COEFF_UPDATE_PROBS)

needs_libwebp = pytest.mark.skipif(
    not webp_native.available(), reason="system libwebp not present")


# ------------------------------------------------------- RFC bool encoder
class _BoolEnc:
    def __init__(self):
        self.low = 0
        self.rng = 255
        self.cnt = -24
        self.out = bytearray()

    def put(self, bit: int, prob: int):
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            if self.low & (1 << 31):  # carry out
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                if i >= 0:
                    self.out[i] += 1
            self.low = (self.low << 1) & 0xFFFFFFFF
            self.cnt += 1
            if self.cnt == 0:
                self.out.append((self.low >> 24) & 0xFF)
                self.low &= 0xFFFFFF
                self.cnt = -8
    def literal(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def tree(self, tree: tuple, probs, leaf: int):
        # find the path to -leaf, then emit it
        stack = [(0, [])]
        while stack:
            node, bits = stack.pop()
            for b in (0, 1):
                t = tree[node + b]
                if t <= 0:
                    if -t == leaf:
                        for n2, b2 in bits + [(node, b)]:
                            self.put(b2, probs[n2 >> 1])
                        return
                else:
                    stack.append((t, bits + [(node, b)]))
        raise AssertionError(f"leaf {leaf} not in tree")

    def flush(self) -> bytes:
        for _ in range(32):
            self.put(0, 128)
        return bytes(self.out)


def _encode_block_tokens(be: _BoolEnc, plane: int, first: int, ctx: int,
                         dc_value: int):
    """One block's tokens: a single DC coefficient (may be 0 -> immediate
    EOB) then EOB.  Mirrors the decoder's band/ctx walk.  Returns nz."""
    bands = vp8._BANDS
    tree = vp8._COEFF_TREE
    probs = COEFF_PROBS_DEFAULT

    def base(i, c):
        return ((plane * 8 + bands[i]) * 3 + c) * 11

    if dc_value == 0:
        be.tree(tree, probs[base(first, ctx):], vp8._EOB)
        return False
    v = abs(dc_value)
    assert 1 <= v <= 4, "writer supports literal tokens only"
    be.tree(tree, probs[base(first, ctx):], v)
    be.put(1 if dc_value < 0 else 0, 128)
    nctx = 2 if v > 1 else 1
    be.tree(tree, probs[base(first + 1, nctx):], vp8._EOB)
    return True


def build_stream(mb_w: int, mb_h: int, *, nparts: int = 1,
                 filter_type: int = 0, filter_level: int = 26,
                 sharpness: int = 0, lf_delta: int = 0,
                 seg_quants=None, seg_map: bool = False,
                 yac_qi: int = 20, dc_cycle=(1, -2, 3, 0)) -> bytes:
    """A W=16*mb_w x H=16*mb_h key frame: every MB is i16 DC_PRED with one
    Y2 DC coefficient cycling through ``dc_cycle``; chroma is DC_PRED with
    zero coefficients; all Y AC blocks are empty."""
    seg_enabled = seg_quants is not None
    # ---- token partitions (modes stay in partition 0)
    parts = [_BoolEnc() for _ in range(nparts)]
    above_y2 = np.zeros(mb_w, dtype=bool)
    above_y = np.zeros((mb_w, 4), dtype=bool)
    above_uv = np.zeros((mb_w, 4), dtype=bool)
    mbi = 0
    for my in range(mb_h):
        te = parts[my % nparts]
        left_y2 = False
        left_y = np.zeros(4, dtype=bool)
        left_uv = np.zeros(4, dtype=bool)
        for mx in range(mb_w):
            dc = dc_cycle[mbi % len(dc_cycle)]
            mbi += 1
            ctx = int(above_y2[mx]) + int(left_y2)
            nz = _encode_block_tokens(te, 1, 0, ctx, dc)
            above_y2[mx] = left_y2 = nz
            for r in range(4):
                for c in range(4):
                    a = above_y[mx, c] if r == 0 else False
                    lf = left_y[r] if c == 0 else False
                    _encode_block_tokens(te, 0, 1, int(a) + int(lf), 0)
            above_y[mx] = False
            left_y[:] = False
            for pl in range(2):
                for r in range(2):
                    for c in range(2):
                        a = above_uv[mx, 2 * pl + c] if r == 0 else False
                        lf = left_uv[2 * pl + r] if c == 0 else False
                        _encode_block_tokens(te, 2, 0, int(a) + int(lf), 0)
            above_uv[mx] = False
            left_uv[:] = False
    token_bytes = [p.flush() for p in parts]

    # ---- partition 0: headers + modes
    h = _BoolEnc()
    h.literal(0, 1)  # color space
    h.literal(0, 1)  # clamping
    h.literal(1 if seg_enabled else 0, 1)
    if seg_enabled:
        h.literal(1 if seg_map else 0, 1)   # update_mb_segmentation_map
        h.literal(1, 1)                     # update_segment_feature_data
        h.literal(1, 1)                     # abs values
        for q in seg_quants:                # 4 quantizer values
            h.literal(1, 1)
            h.literal(abs(q), 7)
            h.literal(1 if q < 0 else 0, 1)
        for _ in range(4):                  # 4 loop-filter values: absent
            h.literal(0, 1)
        if seg_map:
            for _ in range(3):              # tree probs: keep 255
                h.literal(0, 1)
    h.literal(filter_type, 1)
    h.literal(filter_level, 6)
    h.literal(sharpness, 3)
    h.literal(1 if lf_delta else 0, 1)
    if lf_delta:
        h.literal(1, 1)                     # update
        # ref deltas: [0] = INTRA
        h.literal(1, 1)
        h.literal(abs(lf_delta), 6)
        h.literal(1 if lf_delta < 0 else 0, 1)
        for _ in range(3):
            h.literal(0, 1)
        for _ in range(4):                  # mode deltas absent
            h.literal(0, 1)
    h.literal({1: 0, 2: 1, 4: 2, 8: 3}[nparts], 2)
    h.literal(yac_qi, 7)
    for _ in range(5):                      # all quantizer deltas absent
        h.literal(0, 1)
    h.literal(0, 1)                         # refresh entropy probs
    for i in range(1056):                   # no coeff prob updates
        h.put(0, COEFF_UPDATE_PROBS[i])
    h.literal(0, 1)                         # mb_no_coeff_skip OFF
    # modes, raster
    for my in range(mb_h):
        for mx in range(mb_w):
            if seg_enabled and seg_map:
                sid = (my * mb_w + mx) % 4
                h.put(sid >> 1, 255)
                h.put(sid & 1, 255)
            h.tree(vp8._KF_YMODE_TREE, vp8._KF_YMODE_PROBS, vp8._DC)
            h.tree(vp8._UV_TREE, vp8._KF_UV_PROBS, vp8._DC)
    part0 = h.flush()

    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += b"\x9d\x01\x2a"
    out += struct.pack("<HH", mb_w * 16, mb_h * 16)
    out += part0
    for tb in token_bytes[:-1]:
        out += bytes((len(tb) & 0xFF, (len(tb) >> 8) & 0xFF,
                      (len(tb) >> 16) & 0xFF))
    for tb in token_bytes:
        out += tb
    return bytes(out)


def _wrap_webp(body: bytes) -> bytes:
    if len(body) & 1:
        chunk = body + b"\x00"
    else:
        chunk = body
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(body)) + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _assert_both_decoders_agree(body: bytes):
    oracle = webp_native.decode_yuv(_wrap_webp(body))
    assert oracle is not None, "libwebp rejected the hand-built stream"
    mine = vp8.decode_vp8_yuv(body)
    assert mine is not None
    for name, a, b in zip("YUV", mine, oracle):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} differs")


@needs_libwebp
def test_conformance_baseline():
    _assert_both_decoders_agree(build_stream(4, 3))


@needs_libwebp
def test_conformance_multi_partition():
    for nparts in (2, 4):
        _assert_both_decoders_agree(build_stream(4, 5, nparts=nparts))


@needs_libwebp
def test_conformance_simple_filter_and_sharpness():
    _assert_both_decoders_agree(build_stream(4, 3, filter_type=1,
                                             filter_level=40))
    for sharp in (3, 7):
        _assert_both_decoders_agree(build_stream(4, 3, sharpness=sharp,
                                                 filter_level=32))


@needs_libwebp
def test_conformance_lf_delta_and_zero_level():
    _assert_both_decoders_agree(build_stream(4, 3, lf_delta=-8))
    _assert_both_decoders_agree(build_stream(4, 3, lf_delta=20))
    _assert_both_decoders_agree(build_stream(4, 3, filter_level=0))


@needs_libwebp
def test_conformance_segmentation():
    # per-segment absolute quantizers, no map (all MBs segment 0)
    _assert_both_decoders_agree(build_stream(4, 3,
                                             seg_quants=(30, 80, 10, 120)))
    # coded segment map cycling all 4 segments
    _assert_both_decoders_agree(build_stream(4, 3,
                                             seg_quants=(30, 80, 10, 120),
                                             seg_map=True))


def test_conformance_pure_decoder_standalone():
    """The writer/decoder pair also pins itself without libwebp: a known
    stream decodes to the DC-prediction + Y2-residual pattern."""
    body = build_stream(2, 2, filter_level=0, dc_cycle=(4,))
    got = vp8.decode_vp8_yuv(body)
    assert got is not None
    y, u, v = got
    assert y.shape == (32, 32) and u.shape == (16, 16)
    # chroma has zero residual and DC prediction from 127/129 borders
    assert len(np.unique(u)) <= 4 and len(np.unique(v)) <= 4
