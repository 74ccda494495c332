"""Pure-Python VP8 key-frame (lossy WebP) decoder — RFC 6386, from scratch.

Decodes the intra-only key frame every lossy .webp carries: boolean
arithmetic decoder, segmentation/filter/quantizer headers, keyframe mode
parsing, token (DCT coefficient) decode with per-context probabilities,
dequantization, inverse WHT (Y2) + inverse DCT, all 16x16 / 4x4 / chroma
intra predictors, and the in-loop deblocking filter (normal and simple
profiles), then BT.601 YUV 4:2:0 -> RGB.

Normative constant tables live in functions/vp8_tables.py (RFC 6386
values).  Interop contract: tests/test_vp8.py pins the decoded Y/U/V
planes BYTE-EXACT against the system libwebp decoder across qualities,
image sizes (including non-multiple-of-16 and tiny frames) and content
classes (flat, gradient, noise, OCR rasters).

Reference parity: hiroi-sora/PaddleOCR-json decodes lossy .webp by
delegating to a codec library (cv::imdecode -> OpenCV's bundled libwebp,
cpp/src/task_linux.cpp:67-122).  functions/webp.py keeps that delegation
(webp_native, ctypes) as the FAST path; this module is the fallback, so
the lossy path no longer needs any system library at all — the last
delegated codec seam, closed.

Performance note: the boolean decoder is inherently bit-serial, so this
is a correctness/portability path, not the media hot path; the actor-pool
decode stage prefers webp_native when the shared library is present.
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (AC_QLOOKUP, COEFF_BANDS, COEFF_PROBS_DEFAULT,
                         COEFF_UPDATE_PROBS, DC_QLOOKUP, KF_BMODE_PROBS)


class _Corrupt(Exception):
    pass


# ------------------------------------------------------------- bool decoder
class _BoolDec:
    """RFC 6386 section 7 boolean arithmetic decoder.  Reads past the
    partition end yield zero bytes — the spec's virtual trailing zeros.
    This is NOT a truncation signal: an all-EOB tail legitimately reads
    one virtual byte per few bool reads, unboundedly many on large
    frames, so corruption detection lives in the structural checks
    (partition sizes, dimension caps), never in an overrun budget."""

    __slots__ = ("d", "pos", "end", "rng", "value", "count", "over")

    def __init__(self, d: bytes, start: int, size: int):
        if start + size > len(d):
            raise _Corrupt("partition exceeds buffer")
        self.d = d
        self.pos = start
        self.end = start + size
        self.rng = 255
        self.count = 0
        self.over = 0
        v = self._byte() << 8
        self.value = v | self._byte()

    def _byte(self) -> int:
        if self.pos < self.end:
            b = self.d[self.pos]
        else:
            b = 0
            self.over += 1
        self.pos += 1
        return b

    def get(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.rng -= split
            self.value -= big
        else:
            ret = 0
            self.rng = split
        # renormalize
        rng = self.rng
        while rng < 128:
            self.value <<= 1
            rng <<= 1
            self.count += 1
            if self.count == 8:
                self.count = 0
                self.value |= self._byte()
        self.rng = rng
        return ret

    def flag(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def sign_mag(self, n: int) -> int:
        """Flagged signed literal: 0 when the update flag is clear, else
        an n-bit magnitude followed by a sign bit."""
        if not self.get(128):
            return 0
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


# ------------------------------------------------------------- mode tables
_DC, _V, _H, _TM, _B_PRED = 0, 1, 2, 3, 4
_KF_YMODE_TREE = (-_B_PRED, 2, 4, 6, -_DC, -_V, -_H, -_TM)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_TREE = (-_DC, 2, -_V, 4, -_H, -_TM)
_KF_UV_PROBS = (142, 114, 183)

# 4x4 sub-modes, spec order
(_B_DC, _B_TM, _B_VE, _B_HE, _B_LD, _B_RD,
 _B_VR, _B_VL, _B_HD, _B_HU) = range(10)
_BMODE_TREE = (-_B_DC, 2, -_B_TM, 4, -_B_VE, 6, 8, 12,
               -_B_HE, 10, -_B_RD, -_B_VR,
               -_B_LD, 14, -_B_VL, 16, -_B_HD, -_B_HU)
# 16x16 mode -> equivalent sub-mode for neighbor context (RFC 11.3)
_YMODE_TO_B = (_B_DC, _B_VE, _B_HE, _B_TM)

# token tree (RFC 13.2); token ids: 0..4 literal, 5..10 cat1..6, 11 EOB
_EOB = 11
_COEFF_TREE = (-_EOB, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4,
               14, 16, -5, -6, 18, 20, -7, -8, -9, -10)
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_CAT_PROBS = ((159,), (165, 145), (173, 148, 140), (176, 155, 140, 135),
              (180, 157, 141, 134, 130),
              (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
_BANDS = tuple(COEFF_BANDS)


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


# --------------------------------------------------------------- transforms
def _iwht4x4(c: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard (Y2 DC scatter), RFC 14.3. int32 [16]."""
    ip = c.reshape(4, 4).astype(np.int64)
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    t = np.empty((4, 4), dtype=np.int64)
    t[0] = a1 + b1
    t[1] = c1 + d1
    t[2] = a1 - b1
    t[3] = d1 - c1
    a1 = t[:, 0] + t[:, 3]
    b1 = t[:, 1] + t[:, 2]
    c1 = t[:, 1] - t[:, 2]
    d1 = t[:, 0] - t[:, 3]
    out = np.empty((4, 4), dtype=np.int64)
    out[:, 0] = (a1 + b1 + 3) >> 3
    out[:, 1] = (c1 + d1 + 3) >> 3
    out[:, 2] = (a1 - b1 + 3) >> 3
    out[:, 3] = (d1 - c1 + 3) >> 3
    return out.reshape(16)


_C1 = 20091  # (sqrt(2) * cos(pi/8) - 1) << 16
_C2 = 35468  # (sqrt(2) * sin(pi/8)) << 16


def _idct4x4(c: np.ndarray) -> np.ndarray:
    """Inverse DCT, RFC 14.3 exact integer version. [16] -> 4x4 int."""
    ip = c.reshape(4, 4).astype(np.int64)
    # vertical pass (over columns)
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    t1 = (ip[1] * _C2) >> 16
    t2 = ip[3] + ((ip[3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = ip[1] + ((ip[1] * _C1) >> 16)
    t2 = (ip[3] * _C2) >> 16
    d1 = t1 + t2
    t = np.empty((4, 4), dtype=np.int64)
    t[0] = a1 + d1
    t[3] = a1 - d1
    t[1] = b1 + c1
    t[2] = b1 - c1
    # horizontal pass (over rows)
    a1 = t[:, 0] + t[:, 2]
    b1 = t[:, 0] - t[:, 2]
    t1 = (t[:, 1] * _C2) >> 16
    t2 = t[:, 3] + ((t[:, 3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = t[:, 1] + ((t[:, 1] * _C1) >> 16)
    t2 = (t[:, 3] * _C2) >> 16
    d1 = t1 + t2
    out = np.empty((4, 4), dtype=np.int64)
    out[:, 0] = (a1 + d1 + 4) >> 3
    out[:, 3] = (a1 - d1 + 4) >> 3
    out[:, 1] = (b1 + c1 + 4) >> 3
    out[:, 2] = (b1 - c1 + 4) >> 3
    return out


def _add_residual(plane: np.ndarray, y0: int, x0: int, res: np.ndarray):
    blk = plane[y0:y0 + 4, x0:x0 + 4].astype(np.int64) + res
    plane[y0:y0 + 4, x0:x0 + 4] = np.clip(blk, 0, 255).astype(np.uint8)


# --------------------------------------------------------- intra prediction
def _avg2(a, b):
    return (int(a) + int(b) + 1) >> 1


def _avg3(a, b, c):
    return (int(a) + 2 * int(b) + int(c) + 2) >> 2


def _pred16(plane: np.ndarray, y0: int, x0: int, mode: int, size: int):
    """Whole-block DC/V/H/TM prediction (16x16 luma / 8x8 chroma) into the
    bordered plane.  y0/x0 are bordered coords of the block's top-left;
    row y0-1 / col x0-1 always exist (127/129 borders)."""
    above = plane[y0 - 1, x0:x0 + size].astype(np.int32)
    left = plane[y0:y0 + size, x0 - 1].astype(np.int32)
    if mode == _DC:
        on_top = y0 == 1
        on_left = x0 == 1
        if on_top and on_left:
            val = 128
        elif on_top:
            val = (int(left.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        elif on_left:
            val = (int(above.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        else:
            val = (int(above.sum()) + int(left.sum()) + size) >> size.bit_length()
        plane[y0:y0 + size, x0:x0 + size] = val
    elif mode == _V:
        plane[y0:y0 + size, x0:x0 + size] = above.astype(np.uint8)[None, :]
    elif mode == _H:
        plane[y0:y0 + size, x0:x0 + size] = left.astype(np.uint8)[:, None]
    else:  # TM
        c = int(plane[y0 - 1, x0 - 1])
        v = left[:, None] + above[None, :] - c
        plane[y0:y0 + size, x0:x0 + size] = np.clip(v, 0, 255).astype(np.uint8)


def _pred_b(plane: np.ndarray, y0: int, x0: int, mode: int, tr: np.ndarray):
    """4x4 sub-block prediction (RFC 12.3).  ``tr`` is the 4-pixel
    above-right row to use when the sub-block sits in the macroblock's
    rightmost column (the VP8 quirk: those always read the MB's top row)."""
    A = plane[y0 - 1, x0:x0 + 4].astype(np.int32)
    AR = tr.astype(np.int32)
    L = plane[y0:y0 + 4, x0 - 1].astype(np.int32)
    C = int(plane[y0 - 1, x0 - 1])
    p = np.empty((4, 4), dtype=np.int32)
    if mode == _B_DC:
        p[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
    elif mode == _B_TM:
        p[:] = np.clip(L[:, None] + A[None, :] - C, 0, 255)
    elif mode == _B_VE:
        e = [C, A[0], A[1], A[2], A[3], AR[0]]
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        p[:] = np.array(row, dtype=np.int32)[None, :]
    elif mode == _B_HE:
        e = [C, L[0], L[1], L[2], L[3], L[3]]
        col = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        p[:] = np.array(col, dtype=np.int32)[:, None]
    elif mode == _B_LD:
        a = [A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3]]
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r, c] = _avg3(a[i], a[i + 1], a[min(i + 2, 7)])
    elif mode == _B_RD:
        e = [L[3], L[2], L[1], L[0], C, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                p[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == _B_VR:
        p[0, 0] = _avg2(C, A[0])
        p[0, 1] = _avg2(A[0], A[1])
        p[0, 2] = _avg2(A[1], A[2])
        p[0, 3] = _avg2(A[2], A[3])
        p[1, 0] = _avg3(L[0], C, A[0])
        p[1, 1] = _avg3(C, A[0], A[1])
        p[1, 2] = _avg3(A[0], A[1], A[2])
        p[1, 3] = _avg3(A[1], A[2], A[3])
        p[2, 0] = _avg3(L[1], L[0], C)
        p[2, 1:] = p[0, :3]
        p[3, 0] = _avg3(L[2], L[1], L[0])
        p[3, 1:] = p[1, :3]
    elif mode == _B_VL:
        p[0, 0] = _avg2(A[0], A[1])
        p[0, 1] = _avg2(A[1], A[2])
        p[0, 2] = _avg2(A[2], A[3])
        p[0, 3] = _avg2(A[3], AR[0])
        p[1, 0] = _avg3(A[0], A[1], A[2])
        p[1, 1] = _avg3(A[1], A[2], A[3])
        p[1, 2] = _avg3(A[2], A[3], AR[0])
        p[1, 3] = _avg3(A[3], AR[0], AR[1])
        p[2, :3] = p[0, 1:]
        p[2, 3] = _avg3(AR[0], AR[1], AR[2])
        p[3, :3] = p[1, 1:]
        p[3, 3] = _avg3(AR[1], AR[2], AR[3])
    elif mode == _B_HD:
        p[0, 0] = _avg2(L[0], C)
        p[0, 1] = _avg3(L[0], C, A[0])
        p[0, 2] = _avg3(C, A[0], A[1])
        p[0, 3] = _avg3(A[0], A[1], A[2])
        p[1, 0] = _avg2(L[1], L[0])
        p[1, 1] = _avg3(L[1], L[0], C)
        p[1, 2:] = p[0, :2]
        p[2, 0] = _avg2(L[2], L[1])
        p[2, 1] = _avg3(L[2], L[1], L[0])
        p[2, 2:] = p[1, :2]
        p[3, 0] = _avg2(L[3], L[2])
        p[3, 1] = _avg3(L[3], L[2], L[1])
        p[3, 2:] = p[2, :2]
    else:  # _B_HU
        p[0, 0] = _avg2(L[0], L[1])
        p[0, 1] = _avg3(L[0], L[1], L[2])
        p[0, 2] = _avg2(L[1], L[2])
        p[0, 3] = _avg3(L[1], L[2], L[3])
        p[1, 0] = p[0, 2]
        p[1, 1] = p[0, 3]
        p[1, 2] = _avg2(L[2], L[3])
        p[1, 3] = _avg3(L[2], L[3], L[3])
        p[2, 0] = p[1, 2]
        p[2, 1] = p[1, 3]
        p[2, 2:] = L[3]
        p[3, :] = L[3]
    plane[y0:y0 + 4, x0:x0 + 4] = p.astype(np.uint8)


# ------------------------------------------------------------- token decode
def _decode_block(bd: _BoolDec, probs: bytes, plane: int, first: int,
                  ctx: int, dq_dc: int, dq_ac: int,
                  out: np.ndarray) -> bool:
    """Decode one 4x4 block's tokens into ``out`` (len-16 int32, natural
    order, dequantized).  Returns True if any coefficient is nonzero."""
    i = first
    nz = False
    skip_eob = False
    tree = _COEFF_TREE
    get = bd.get
    while i < 16:
        base = ((plane * 8 + _BANDS[i]) * 3 + ctx) * 11
        n = 2 if skip_eob else 0
        while True:
            n = tree[n + get(probs[base + (n >> 1)])]
            if n <= 0:
                break
        tok = -n
        if tok == _EOB:
            break
        if tok == 0:
            i += 1
            ctx = 0
            skip_eob = True
            continue
        if tok <= 4:
            v = tok
        else:
            cat = tok - 5
            e = 0
            for pr in _CAT_PROBS[cat]:
                e = (e << 1) | get(pr)
            v = _CAT_BASE[cat] + e
        ctx = 2 if v > 1 else 1
        if get(128):
            v = -v
        out[_ZIGZAG[i]] = v * (dq_dc if i == 0 else dq_ac)
        nz = True
        skip_eob = False
        i += 1
    return nz


# ---------------------------------------------------------------- loop filter
def _c128(v: np.ndarray) -> np.ndarray:
    return np.clip(v, -128, 127)


def _normal_filter(slab: np.ndarray, limit: int, ilim: int, hev_t: int,
                   mb_edge: bool) -> np.ndarray:
    """RFC 15.2/15.3 normal loop filter over an (N, 8) slab of pixels
    p3 p2 p1 p0 q0 q1 q2 q3 per row.  Returns the filtered slab."""
    s = slab.astype(np.int32)
    p3, p2, p1, p0, q0, q1, q2, q3 = (s[:, k] for k in range(8))
    mask = ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit)
    for a, b in ((p3, p2), (p2, p1), (p1, p0), (q1, q0), (q2, q1), (q3, q2)):
        mask &= np.abs(a - b) <= ilim
    if not mask.any():
        return slab
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    p2s, p1s, p0s = p2 - 128, p1 - 128, p0 - 128
    q0s, q1s, q2s = q0 - 128, q1 - 128, q2 - 128
    out = s.copy()

    def common_adjust(use_outer: np.ndarray):
        f = np.where(use_outer, _c128(p1s - q1s), 0)
        a = _c128(f + 3 * (q0s - p0s))
        f1 = _c128(a + 4) >> 3
        e1 = _c128(a + 3) >> 3
        nq0 = _c128(q0s - f1) + 128
        np0 = _c128(p0s + e1) + 128
        return f1, nq0, np0

    if mb_edge:
        # hev rows: common_adjust with outer taps; non-hev: 27/18/9 taps
        f1, nq0, np0 = common_adjust(np.ones_like(mask))
        w = _c128(_c128(p1s - q1s) + 3 * (q0s - p0s))
        a27 = _c128((27 * w + 63) >> 7)
        a18 = _c128((18 * w + 63) >> 7)
        a9 = _c128((9 * w + 63) >> 7)
        sel_h = mask & hev
        sel_w = mask & ~hev
        out[:, 3] = np.where(sel_h, np0, out[:, 3])
        out[:, 4] = np.where(sel_h, nq0, out[:, 4])
        out[:, 3] = np.where(sel_w, _c128(p0s + a27) + 128, out[:, 3])
        out[:, 4] = np.where(sel_w, _c128(q0s - a27) + 128, out[:, 4])
        out[:, 2] = np.where(sel_w, _c128(p1s + a18) + 128, out[:, 2])
        out[:, 5] = np.where(sel_w, _c128(q1s - a18) + 128, out[:, 5])
        out[:, 1] = np.where(sel_w, _c128(p2s + a9) + 128, out[:, 1])
        out[:, 6] = np.where(sel_w, _c128(q2s - a9) + 128, out[:, 6])
    else:
        f1, nq0, np0 = common_adjust(hev)
        out[:, 3] = np.where(mask, np0, out[:, 3])
        out[:, 4] = np.where(mask, nq0, out[:, 4])
        a2 = (f1 + 1) >> 1
        sel = mask & ~hev
        out[:, 5] = np.where(sel, _c128(q1s - a2) + 128, out[:, 5])
        out[:, 2] = np.where(sel, _c128(p1s + a2) + 128, out[:, 2])
    return out.astype(np.uint8)


def _simple_filter(slab: np.ndarray, limit: int) -> np.ndarray:
    """RFC 15.1 simple filter (luma only): p0/q0 adjust under the
    two-tap mask."""
    s = slab.astype(np.int32)
    p1, p0, q0, q1 = s[:, 1], s[:, 2], s[:, 3], s[:, 4]
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
    if not mask.any():
        return slab
    p1s, p0s, q0s, q1s = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _c128(_c128(p1s - q1s) + 3 * (q0s - p0s))
    f1 = _c128(a + 4) >> 3
    e1 = _c128(a + 3) >> 3
    out = s.copy()
    # slab layout is p1 p0 | q0 q1 at cols 1..4: p0 lives at col 2, q0 at 3
    out[:, 2] = np.where(mask, _c128(p0s + e1) + 128, out[:, 2])
    out[:, 3] = np.where(mask, _c128(q0s - f1) + 128, out[:, 3])
    return out.astype(np.uint8)


def _filter_v(plane, y0, rows, x, limit, ilim, hev_t, mb_edge, simple):
    slab = plane[y0:y0 + rows, x - 4:x + 4]
    if simple:
        sl = plane[y0:y0 + rows, x - 2:x + 2]
        padded = np.empty((rows, 6), dtype=np.uint8)
        padded[:, 1:5] = sl
        out = _simple_filter(padded, limit)
        plane[y0:y0 + rows, x - 2:x + 2] = out[:, 1:5]
    else:
        plane[y0:y0 + rows, x - 4:x + 4] = _normal_filter(
            slab, limit, ilim, hev_t, mb_edge)


def _filter_h(plane, x0, cols, y, limit, ilim, hev_t, mb_edge, simple):
    if simple:
        sl = plane[y - 2:y + 2, x0:x0 + cols].T
        padded = np.empty((cols, 6), dtype=np.uint8)
        padded[:, 1:5] = sl
        out = _simple_filter(padded, limit)
        plane[y - 2:y + 2, x0:x0 + cols] = out[:, 1:5].T
    else:
        slab = plane[y - 4:y + 4, x0:x0 + cols].T
        plane[y - 4:y + 4, x0:x0 + cols] = _normal_filter(
            slab, limit, ilim, hev_t, mb_edge).T


# ------------------------------------------------------------------ decoder
def decode_vp8_yuv(data: bytes):
    """Decode a VP8 key-frame payload (the bytes after the 'VP8 ' RIFF
    chunk header) to (y, u, v) uint8 planes at (H, W) and
    ((H+1)//2, (W+1)//2), or None if malformed."""
    try:
        return _decode(bytes(data))
    except (_Corrupt, IndexError, ValueError, ZeroDivisionError):
        return None


def _decode(data: bytes):
    if len(data) < 10:
        return None
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:  # not a key frame
        return None
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        return None
    wv = data[6] | (data[7] << 8)
    hv = data[8] | (data[9] << 8)
    w, h = wv & 0x3FFF, hv & 0x3FFF
    if w == 0 or h == 0 or w * h > 1 << 26:
        return None
    bd = _BoolDec(data, 10, part0_size)

    bd.flag()  # color space
    bd.flag()  # clamping type

    # ---- segmentation
    seg_enabled = bd.flag()
    update_map = 0
    seg_abs = 0
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree = [255, 255, 255]
    if seg_enabled:
        update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            seg_abs = bd.flag()
            for i in range(4):
                seg_q[i] = bd.sign_mag(7)
            for i in range(4):
                seg_lf[i] = bd.sign_mag(6)
        if update_map:
            for i in range(3):
                seg_tree[i] = bd.literal(8) if bd.flag() else 255

    # ---- loop filter header
    simple_filter = bd.flag()
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta = bd.flag()
    ref_deltas = [0, 0, 0, 0]
    mode_deltas = [0, 0, 0, 0]
    if lf_delta:
        if bd.flag():
            for i in range(4):
                ref_deltas[i] = bd.sign_mag(6)
            for i in range(4):
                mode_deltas[i] = bd.sign_mag(6)

    # ---- token partitions
    nparts = 1 << bd.literal(2)
    part_tab = 10 + part0_size
    data_start = part_tab + 3 * (nparts - 1)
    if data_start > len(data):
        return None
    sizes = []
    off = data_start
    for i in range(nparts):
        if i < nparts - 1:
            p = part_tab + 3 * i
            sz = data[p] | (data[p + 1] << 8) | (data[p + 2] << 16)
        else:
            sz = len(data) - off
        if sz < 0 or off + sz > len(data):
            return None
        sizes.append((off, sz))
        off += sz
    parts = [_BoolDec(data, o, s) for o, s in sizes]

    # ---- quantizers
    yac_qi = bd.literal(7)
    ydc_d = bd.sign_mag(4)
    y2dc_d = bd.sign_mag(4)
    y2ac_d = bd.sign_mag(4)
    uvdc_d = bd.sign_mag(4)
    uvac_d = bd.sign_mag(4)

    dq = []
    for s in range(4):
        q = (seg_q[s] if seg_abs else yac_qi + seg_q[s]) \
            if seg_enabled else yac_qi
        q = _clamp_q(q)
        y1dc = DC_QLOOKUP[_clamp_q(q + ydc_d)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + y2dc_d)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + y2ac_d)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + uvdc_d)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(q + uvac_d)]
        dq.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))

    bd.flag()  # refresh entropy probs (keyframe: no-op for us)

    # ---- coefficient probability updates
    probs = bytearray(COEFF_PROBS_DEFAULT)
    upd = COEFF_UPDATE_PROBS
    for i in range(1056):
        if bd.get(upd[i]):
            probs[i] = bd.literal(8)
    probs = bytes(probs)

    mb_no_skip = bd.flag()
    prob_skip = bd.literal(8) if mb_no_skip else 0

    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4

    # ---- pass 1: modes (partition 0, raster order)
    ymodes = np.zeros((mb_h, mb_w), dtype=np.int8)
    uvmodes = np.zeros((mb_h, mb_w), dtype=np.int8)
    segs = np.zeros((mb_h, mb_w), dtype=np.int8)
    skips = np.zeros((mb_h, mb_w), dtype=bool)
    bmodes = np.zeros((mb_h, mb_w, 4, 4), dtype=np.int8)
    above_b = np.full((mb_w, 4), _B_DC, dtype=np.int8)  # bottom row per col
    kfb = KF_BMODE_PROBS
    for my in range(mb_h):
        left_b = np.full(4, _B_DC, dtype=np.int8)
        for mx in range(mb_w):
            if update_map:
                if bd.get(seg_tree[0]):
                    segs[my, mx] = 2 + bd.get(seg_tree[2])
                else:
                    segs[my, mx] = bd.get(seg_tree[1])
            if mb_no_skip:
                skips[my, mx] = bd.get(prob_skip)
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            ymodes[my, mx] = ym
            if ym == _B_PRED:
                bm = bmodes[my, mx]
                for r in range(4):
                    for c in range(4):
                        a = above_b[mx, c] if r == 0 else bm[r - 1, c]
                        lft = left_b[r] if c == 0 else bm[r, c - 1]
                        base = (int(a) * 10 + int(lft)) * 9
                        bm[r, c] = bd.tree(_BMODE_TREE, kfb[base:base + 9])
                above_b[mx] = bm[3]
                left_b[:] = bm[:, 3]
            else:
                b = _YMODE_TO_B[ym]
                bmodes[my, mx] = b
                above_b[mx] = b
                left_b[:] = b
            uvmodes[my, mx] = bd.tree(_UV_TREE, _KF_UV_PROBS)

    # ---- pass 2: tokens
    coeffs = np.zeros((mb_h, mb_w, 25, 16), dtype=np.int32)
    has_coeff = np.zeros((mb_h, mb_w), dtype=bool)
    # nz contexts: per MB column, 4 Y + 2 U + 2 V + 1 Y2
    above_nz = np.zeros((mb_w, 9), dtype=bool)
    for my in range(mb_h):
        left_nz = np.zeros(9, dtype=bool)
        td = parts[my % nparts]
        for mx in range(mb_w):
            ym = ymodes[my, mx]
            i16 = ym != _B_PRED
            if skips[my, mx]:
                above_nz[mx, :8] = False
                left_nz[:8] = False
                if i16:
                    above_nz[mx, 8] = False
                    left_nz[8] = False
                continue
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[segs[my, mx]]
            mbc = coeffs[my, mx]
            any_nz = False
            nzs = np.zeros((4, 4), dtype=bool)  # y blocks
            if i16:
                ctx = int(above_nz[mx, 8]) + int(left_nz[8])
                nz = _decode_block(td, probs, 1, 0, ctx, y2dc, y2ac,
                                   mbc[24])
                above_nz[mx, 8] = nz
                left_nz[8] = nz
                any_nz |= nz
                plane, first = 0, 1
            else:
                plane, first = 3, 0
            for r in range(4):
                for c in range(4):
                    a = above_nz[mx, c] if r == 0 else nzs[r - 1, c]
                    lft = left_nz[r] if c == 0 else nzs[r, c - 1]
                    nz = _decode_block(td, probs, plane, first,
                                       int(a) + int(lft), y1dc, y1ac,
                                       mbc[r * 4 + c])
                    nzs[r, c] = nz
                    any_nz |= nz
            above_nz[mx, :4] = nzs[3]
            left_nz[:4] = nzs[:, 3]
            for pl in range(2):  # U then V
                nzc = np.zeros((2, 2), dtype=bool)
                for r in range(2):
                    for c in range(2):
                        a = above_nz[mx, 4 + 2 * pl + c] if r == 0 \
                            else nzc[r - 1, c]
                        lft = left_nz[4 + 2 * pl + r] if c == 0 \
                            else nzc[r, c - 1]
                        nz = _decode_block(td, probs, 2, 0,
                                           int(a) + int(lft), uvdc, uvac,
                                           mbc[16 + 4 * pl + r * 2 + c])
                        nzc[r, c] = nz
                        any_nz |= nz
                above_nz[mx, 4 + 2 * pl:6 + 2 * pl] = nzc[1]
                left_nz[4 + 2 * pl:6 + 2 * pl] = nzc[:, 1]
            has_coeff[my, mx] = any_nz

    # ---- pass 3: reconstruction (bordered planes)
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    Y = np.empty((yh + 1, yw + 5), dtype=np.uint8)
    U = np.empty((ch + 1, cw + 1), dtype=np.uint8)
    Vp = np.empty((ch + 1, cw + 1), dtype=np.uint8)
    for P in (Y, U, Vp):
        P[0, :] = 127
        P[1:, 0] = 129
    for my in range(mb_h):
        for mx in range(mb_w):
            ym = ymodes[my, mx]
            y0, x0 = 1 + my * 16, 1 + mx * 16
            mbc = coeffs[my, mx]
            # above-right 4 pixels from the MB's top row; the rightmost
            # MB replicates the last above pixel (frame-edge convention)
            if mx == mb_w - 1:
                Y[y0 - 1, x0 + 16:x0 + 20] = Y[y0 - 1, x0 + 15]
            if ym != _B_PRED:
                _pred16(Y, y0, x0, ym, 16)
                y2 = _iwht4x4(mbc[24])
                for b in range(16):
                    blk = mbc[b].copy()
                    blk[0] = y2[b]
                    res = _idct4x4(blk)
                    _add_residual(Y, y0 + (b >> 2) * 4, x0 + (b & 3) * 4,
                                  res)
            else:
                tr = Y[y0 - 1, x0 + 16:x0 + 20].copy()
                bm = bmodes[my, mx]
                for r in range(4):
                    for c in range(4):
                        by, bx = y0 + r * 4, x0 + c * 4
                        _pred_b(Y, by, bx, int(bm[r, c]),
                                tr if c == 3 else Y[by - 1, bx + 4:bx + 8])
                        _add_residual(Y, by, bx, _idct4x4(mbc[r * 4 + c]))
            # chroma
            uvm = int(uvmodes[my, mx])
            cy0, cx0 = 1 + my * 8, 1 + mx * 8
            for pi, P in ((0, U), (1, Vp)):
                _pred16(P, cy0, cx0, uvm, 8)
                for b in range(4):
                    _add_residual(P, cy0 + (b >> 1) * 4, cx0 + (b & 1) * 4,
                                  _idct4x4(mbc[16 + 4 * pi + b]))

    # ---- pass 4: loop filter
    if filter_level:
        for my in range(mb_h):
            for mx in range(mb_w):
                if seg_enabled:
                    s = segs[my, mx]
                    lvl = seg_lf[s] if seg_abs else filter_level + seg_lf[s]
                    lvl = min(max(lvl, 0), 63)
                else:
                    lvl = filter_level
                if lf_delta:
                    lvl += ref_deltas[0]
                    if ymodes[my, mx] == _B_PRED:
                        lvl += mode_deltas[0]
                    lvl = min(max(lvl, 0), 63)
                if lvl == 0:
                    continue
                ilim = lvl
                if sharpness:
                    ilim >>= 1 if sharpness <= 4 else 2
                    if ilim > 9 - sharpness:
                        ilim = 9 - sharpness
                if ilim < 1:
                    ilim = 1
                hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
                mb_lim = 2 * (lvl + 2) + ilim
                sb_lim = 2 * lvl + ilim
                interior = bool(has_coeff[my, mx]) or \
                    ymodes[my, mx] == _B_PRED
                y0, x0 = 1 + my * 16, 1 + mx * 16
                cy0, cx0 = 1 + my * 8, 1 + mx * 8
                sf = bool(simple_filter)
                if mx > 0:
                    _filter_v(Y, y0, 16, x0, mb_lim, ilim, hev_t, True, sf)
                    if not sf:
                        _filter_v(U, cy0, 8, cx0, mb_lim, ilim, hev_t,
                                  True, False)
                        _filter_v(Vp, cy0, 8, cx0, mb_lim, ilim, hev_t,
                                  True, False)
                if interior:
                    for dx in (4, 8, 12):
                        _filter_v(Y, y0, 16, x0 + dx, sb_lim, ilim, hev_t,
                                  False, sf)
                    if not sf:
                        _filter_v(U, cy0, 8, cx0 + 4, sb_lim, ilim, hev_t,
                                  False, False)
                        _filter_v(Vp, cy0, 8, cx0 + 4, sb_lim, ilim, hev_t,
                                  False, False)
                if my > 0:
                    _filter_h(Y, x0, 16, y0, mb_lim, ilim, hev_t, True, sf)
                    if not sf:
                        _filter_h(U, cx0, 8, cy0, mb_lim, ilim, hev_t,
                                  True, False)
                        _filter_h(Vp, cx0, 8, cy0, mb_lim, ilim, hev_t,
                                  True, False)
                if interior:
                    for dy in (4, 8, 12):
                        _filter_h(Y, x0, 16, y0 + dy, sb_lim, ilim, hev_t,
                                  False, sf)
                    if not sf:
                        _filter_h(U, cx0, 8, cy0 + 4, sb_lim, ilim, hev_t,
                                  False, False)
                        _filter_h(Vp, cx0, 8, cy0 + 4, sb_lim, ilim, hev_t,
                                  False, False)

    uw, uh = (w + 1) >> 1, (h + 1) >> 1
    return (Y[1:h + 1, 1:w + 1].copy(),
            U[1:uh + 1, 1:uw + 1].copy(),
            Vp[1:uh + 1, 1:uw + 1].copy())


# ------------------------------------------------------------- YUV -> RGB
def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 studio-range YUV 4:2:0 -> RGB uint8 (nearest-neighbor chroma
    upsample; the envelope contract is box equality + text similarity, not
    byte equality with any particular upsampler)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yy = (y.astype(np.int32) - 16) * 298
    cb = uu.astype(np.int32) - 128
    cr = vv.astype(np.int32) - 128
    r = (yy + 409 * cr + 128) >> 8
    g = (yy - 100 * cb - 208 * cr + 128) >> 8
    b = (yy + 516 * cb + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_vp8(data: bytes) -> np.ndarray | None:
    """Decode a VP8 key-frame payload to an RGB uint8 array, or None."""
    got = decode_vp8_yuv(data)
    if got is None:
        return None
    return yuv420_to_rgb(*got)
