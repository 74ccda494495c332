"""Dependency-free WebP lossless (VP8L) codec — decoder per the public
"WebP Lossless Bitstream Specification", plus an encoder for round-trips.

The reference accepts WebP through ``cv::imdecode`` (cpp/src/task_linux.cpp:
67-122).  This module covers the LOSSLESS half of the format, which is the
one that fits the repo's byte-exact envelope contract for <=256-color OCR
rasters (same contract as PNG/GIF/TIFF):

  * Decoder: full VP8L — all four transforms (predictor / color /
    subtract-green / color-indexing with sub-pixel packing), color cache,
    meta-Huffman (entropy image), LZ77 backward references with the 120-entry
    2D distance map, simple and normal Huffman codes (code-length codes with
    16/17/18 repeats and the max_symbol escape).  Handles plain VP8L files
    and VP8L inside a VP8X extended container.
  * Lossy "VP8 " payloads delegate to the system libwebp via ctypes
    (functions/webp_native) — the same delegation the reference makes
    through cv::imdecode — and return ``None`` only where that library is
    absent.  webp_native doubles as the interop oracle for this module:
    tests round-trip our VP8L encoder output through libwebp's decoder and
    libwebp's lossless output through our decoder, both byte-exact.
  * Encoder: real histogram-derived canonical Huffman codes (length-limited,
    complete), optional single transform (palette / predictor mode /
    cross-color / subtract-green), optional color cache and RLE backward
    references — enough surface to exercise every decoder path in tests.

Bit order: LSB-first within bytes; Huffman codes are canonical (deflate
convention) read MSB-of-code-first, so lookup tables store bit-reversed
codes exactly like zlib's inflate.
"""

from __future__ import annotations

import struct

import numpy as np

# Code-length-code symbol transmission order (spec section 5.2.2).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 120-entry 2D distance map (spec 5.2.2): neighborhood offsets (dx, dy),
# dx in [-7, 8], dy in [0, 7], causal only (dy > 0, or dy == 0 and dx >= 1),
# ordered by squared distance then larger dy then positive dx first.
_DIST_MAP: list[tuple[int, int]] = sorted(
    ((x, y) for y in range(8) for x in range(-7, 9) if y > 0 or x >= 1),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
assert len(_DIST_MAP) == 120


# ------------------------------------------------------------------ bit I/O
class _Bits:
    """LSB-first bit reader; reads past the end yield zeros (the final
    bounds check catches truncation)."""

    def __init__(self, data: bytes):
        self.d = data + b"\x00" * 8
        self.n = len(data) * 8
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        w = int.from_bytes(self.d[p >> 3:(p >> 3) + 8], "little")
        return (w >> (p & 7)) & ((1 << n) - 1)

    def peek15(self) -> int:
        p = self.pos
        w = int.from_bytes(self.d[p >> 3:(p >> 3) + 4], "little")
        return (w >> (p & 7)) & 0x7FFF

    def ok(self) -> bool:
        return self.pos <= self.n


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ------------------------------------------------------------ Huffman codes
# A decode table is ('tbl', maxlen, lookup) with lookup[bits] = (sym << 4) |
# len, or ('const', sym) for zero-bit single-symbol codes (simple codes with
# num_symbols == 1 consume no bits per spec).
def _canonical_codes(lengths: list[int]) -> list[int]:
    """Deflate-convention canonical codes (MSB-first) for each symbol."""
    maxlen = max(lengths, default=0)
    bl_count = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (maxlen + 2)
    for ln in range(1, maxlen + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = [0] * len(lengths)
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


def _rev(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _build_table(lengths: list[int]):
    """Build the bit-reversed lookup table; None for invalid codes.

    Exactly one used symbol is accepted as a code of its declared length
    whose every bit pattern decodes to that symbol (covers the trivial
    trees real encoders express via 1-symbol simple codes)."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        return None
    maxlen = max(ln for _, ln in used)
    if maxlen > 15:
        return None
    if len(used) == 1:
        sym, ln = used[0]
        return ("tbl", ln, [(sym << 4) | ln] * (1 << ln))
    codes = _canonical_codes(lengths)
    size = 1 << maxlen
    lookup = [-1] * size
    filled = 0
    for sym, ln in used:
        base = _rev(codes[sym], ln)
        if codes[sym] >> ln:
            return None  # over-subscribed
        step = 1 << ln
        entry = (sym << 4) | ln
        for k in range(base, size, step):
            lookup[k] = entry
        filled += size >> ln
    if filled != size:
        return None  # incomplete code
    return ("tbl", maxlen, lookup)


def _read_sym(br: _Bits, table) -> int:
    if table[0] == "const":
        return table[1]
    _, maxlen, lookup = table
    e = lookup[br.peek15() & ((1 << maxlen) - 1)]
    br.pos += e & 15
    return e >> 4


def _read_code(br: _Bits, alphabet_size: int):
    """One Huffman code: simple (1-2 symbols) or normal (code-length coded)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        if num_symbols == 1:
            if sym0 >= alphabet_size:
                return None
            return ("const", sym0)
        sym1 = br.read(8)
        if sym0 == sym1 or max(sym0, sym1) >= alphabet_size:
            return None
        lengths = [0] * alphabet_size
        lengths[sym0] = lengths[sym1] = 1
        return _build_table(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_table = _build_table(cl_lengths)
    if cl_table is None:
        return None
    if br.read(1):
        nbits = 2 + 2 * br.read(3)
        max_tokens = 2 + br.read(nbits)
    else:
        max_tokens = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size and max_tokens > 0:
        max_tokens -= 1
        s = _read_sym(br, cl_table)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_len = s
        elif s == 16:
            rep, val = 3 + br.read(2), prev_len
            lengths[symbol:symbol + rep] = [val] * min(rep, alphabet_size - symbol)
            symbol += rep
        elif s == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
        if not br.ok():
            return None
    return _build_table(lengths)


# ----------------------------------------------------------------- decoding
def _lz77_value(sym: int, br: _Bits) -> int:
    if sym < 4:
        return sym + 1
    eb = (sym - 2) >> 1
    return ((2 + (sym & 1)) << eb) + br.read(eb) + 1


def _plane_to_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * width + dx)


def _read_groups(br: _Bits, num_groups: int, cache_bits: int):
    groups = []
    cache_size = (1 << cache_bits) if cache_bits else 0
    for _ in range(num_groups):
        trees = []
        for alpha in (256 + 24 + cache_size, 256, 256, 256, 40):
            t = _read_code(br, alpha)
            if t is None or not br.ok():
                return None
            trees.append(t)
        groups.append(trees)
    return groups


def _decode_image_stream(br: _Bits, w: int, h: int, level0: bool):
    """Returns (argb uint32 ndarray [h*w], inverse-transform list, width).

    Sub-images (transform data, entropy image, palette) recurse with
    level0=False: no transforms, no meta-Huffman bit."""
    transforms: list[tuple] = []
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                return None
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                size_bits = br.read(3) + 2
                bw = (w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                sub = _decode_image_stream(br, bw, bh, False)
                if sub is None:
                    return None
                transforms.append((ttype, size_bits, sub[0], bw))
            elif ttype == 2:  # subtract green
                transforms.append((2,))
            else:  # color indexing
                n_colors = br.read(8) + 1
                sub = _decode_image_stream(br, n_colors, 1, False)
                if sub is None:
                    return None
                deltas = sub[0]
                palette = np.zeros(n_colors, np.uint32)
                prev = 0
                for i in range(n_colors):
                    # per-channel modular cumulative sum
                    d = int(deltas[i])
                    prev = (((prev & 0xFF00FF00) + (d & 0xFF00FF00)) & 0xFF00FF00) | \
                           (((prev & 0x00FF00FF) + (d & 0x00FF00FF)) & 0x00FF00FF)
                    palette[i] = prev
                width_bits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else \
                    1 if n_colors <= 16 else 0
                transforms.append((3, width_bits, palette, w))
                if width_bits:
                    w = (w + (1 << width_bits) - 1) >> width_bits
            if not br.ok():
                return None
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            return None
    meta = None
    hb = 0
    num_groups = 1
    if level0 and br.read(1):
        hb = br.read(3) + 2
        mw = (w + (1 << hb) - 1) >> hb
        mh = (h + (1 << hb) - 1) >> hb
        sub = _decode_image_stream(br, mw, mh, False)
        if sub is None:
            return None
        meta = ((sub[0] >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1
        meta_w = mw
    groups = _read_groups(br, num_groups, cache_bits)
    if groups is None:
        return None

    total = w * h
    pixels = np.zeros(total, np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    x = 0
    y = 0
    g_tree, r_tree, b_tree, a_tree, d_tree = groups[0]
    while pos < total:
        if meta is not None:
            gi = int(meta[(y >> hb) * meta_w + (x >> hb)])
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[gi]
        g = _read_sym(br, g_tree)
        if g < 256:
            r = _read_sym(br, r_tree)
            b = _read_sym(br, b_tree)
            a = _read_sym(br, a_tree)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            pixels[pos] = argb
            if cache is not None:
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> cache_shift] = argb
            pos += 1
            x += 1
        elif g < 280:
            length = _lz77_value(g - 256, br)
            dist = _plane_to_dist(_lz77_value(_read_sym(br, d_tree), br), w)
            if dist > pos or pos + length > total:
                return None
            if cache is None:
                if dist >= length:
                    pixels[pos:pos + length] = pixels[pos - dist:pos - dist + length]
                else:  # overlapping copy replicates already-written pixels
                    for i in range(length):
                        pixels[pos + i] = pixels[pos + i - dist]
            else:
                for i in range(length):
                    v = int(pixels[pos + i - dist])
                    pixels[pos + i] = v
                    cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> cache_shift] = v
            pos += length
            x += length
            y += x // w
            x %= w
            continue
        else:
            if cache is None or g - 280 >= len(cache):
                return None
            pixels[pos] = cache[g - 280]
            pos += 1
            x += 1
        if x == w:
            x = 0
            y += 1
        if not br.ok():
            return None
    return pixels, transforms, w


def _avg2(a: tuple, b: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L: tuple, T: tuple, TL: tuple, TR: tuple) -> tuple:
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select (2021 amendment: strict < picks L)
        p = tuple(l + t - tl for l, t, tl in zip(L, T, TL))
        pL = sum(abs(pc - lc) for pc, lc in zip(p, L))
        pT = sum(abs(pc - tc) for pc, tc in zip(p, T))
        return L if pL < pT else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(_clip255(l + t - tl) for l, t, tl in zip(L, T, TL))
    if mode == 13:  # ClampAddSubtractHalf (C truncating /2)
        ave = _avg2(L, T)
        out = []
        for a, b in zip(ave, TL):
            d = a - b
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(_clip255(a + half))
        return tuple(out)
    return (0, 0, 0, 0)


def _unpack(v: int) -> tuple:
    return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)


def _pack(t: tuple) -> int:
    return ((t[0] & 0xFF) << 24) | ((t[1] & 0xFF) << 16) | \
           ((t[2] & 0xFF) << 8) | (t[3] & 0xFF)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: both args as int8, arithmetic >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_inverse_transforms(pixels: np.ndarray, transforms: list,
                              w: int, h: int) -> tuple[np.ndarray, int]:
    for tr in reversed(transforms):
        ttype = tr[0]
        if ttype == 3:  # color indexing
            _, width_bits, palette, orig_w = tr
            if width_bits:
                per = 1 << width_bits
                depth = 8 >> width_bits
                mask = (1 << depth) - 1
                packed_w = w
                green = ((pixels >> 8) & 0xFF).reshape(h, packed_w)
                idx = np.zeros((h, packed_w * per), np.int64)
                for k in range(per):
                    idx[:, k::per] = (green >> (k * depth)) & mask
                idx = idx[:, :orig_w]
                w = orig_w
            else:
                idx = ((pixels >> 8) & 0xFF).reshape(h, w).astype(np.int64)
            safe = np.where(idx < len(palette), idx, 0)
            pixels = np.where(idx < len(palette), palette[safe],
                              np.uint32(0)).astype(np.uint32).ravel()
        elif ttype == 2:  # add green back
            g = (pixels >> 8) & 0xFF
            r = (((pixels >> 16) & 0xFF) + g) & 0xFF
            b = ((pixels & 0xFF) + g) & 0xFF
            pixels = (pixels & 0xFF00FF00) | (r << 16) | b
        elif ttype == 0:  # predictor
            _, size_bits, modes, bw = tr
            px = pixels  # in-place reconstruction, scan order
            for y in range(h):
                base = y * w
                for x in range(w):
                    p = base + x
                    if x == 0 and y == 0:
                        pred = (255, 0, 0, 0)
                    elif y == 0:
                        pred = _unpack(int(px[p - 1]))
                    elif x == 0:
                        pred = _unpack(int(px[p - w]))
                    else:
                        mode = (int(modes[(y >> size_bits) * bw
                                          + (x >> size_bits)]) >> 8) & 0xFF
                        L = _unpack(int(px[p - 1]))
                        T = _unpack(int(px[p - w]))
                        TL = _unpack(int(px[p - w - 1]))
                        TR = _unpack(int(px[p - w + 1]))
                        pred = _predict(mode, L, T, TL, TR)
                    res = _unpack(int(px[p]))
                    px[p] = _pack(tuple((rc + pc) & 0xFF
                                        for rc, pc in zip(res, pred)))
            pixels = px
        elif ttype == 1:  # cross-color
            _, size_bits, elems, bw = tr
            for y in range(h):
                base = y * w
                for x in range(w):
                    p = base + x
                    e = int(elems[(y >> size_bits) * bw + (x >> size_bits)])
                    g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
                    v = int(pixels[p])
                    g = (v >> 8) & 0xFF
                    red = ((v >> 16) & 0xFF) + _ct_delta(g2r, g)
                    red &= 0xFF
                    blue = (v & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, red)
                    pixels[p] = (v & 0xFF00FF00) | (red << 16) | (blue & 0xFF)
    return pixels, w


def decode_vp8l(data: bytes) -> np.ndarray | None:
    """Decode a raw VP8L payload to HxWx3 uint8 RGB (alpha dropped, like
    imdecode IMREAD_COLOR)."""
    try:
        if len(data) < 5 or data[0] != 0x2F:
            return None
        br = _Bits(data[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha hint
        if br.read(3) != 0:  # version
            return None
        res = _decode_image_stream(br, w, h, True)
        if res is None or not br.ok():
            return None
        pixels, transforms, cur_w = res
        pixels, cur_w = _apply_inverse_transforms(pixels, transforms, cur_w, h)
        if cur_w != w or pixels.size != w * h:
            return None
        argb = pixels.reshape(h, w)
        out = np.empty((h, w, 3), np.uint8)
        out[..., 0] = (argb >> 16) & 0xFF
        out[..., 1] = (argb >> 8) & 0xFF
        out[..., 2] = argb & 0xFF
        return out
    except (IndexError, ValueError, OverflowError):
        return None


def decode_webp(payload: bytes) -> np.ndarray | None:
    """RIFF container walk: VP8L (plain or inside VP8X) decodes through the
    pure-Python decoder above; lossy "VP8 " prefers delegation to the
    system libwebp via ctypes (functions/webp_native, fast — the same
    delegation the reference makes through cv::imdecode,
    cpp/src/task_linux.cpp:67-122) and falls back to the pure-Python VP8
    key-frame decoder (functions/vp8, byte-exact-YUV interop-tested
    against libwebp), so the lossy path needs no system library at all.
    Returns None when the payload is malformed."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            return None
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            from .webp_native import decode_rgb

            got = decode_rgb(payload)
            if got is not None:
                return got
            from .vp8 import decode_vp8

            return decode_vp8(body)
        pos += 8 + size + (size & 1)
    return None


# ----------------------------------------------------------------- encoding
def _code_lengths(freqs: list[int], cap: int) -> list[int]:
    """Complete, length-limited canonical code lengths from frequencies.
    True Huffman when its depth fits the cap; otherwise a balanced complete
    profile (2^L - n symbols one level shorter, most frequent first)."""
    import heapq

    used = [s for s, f in enumerate(freqs) if f > 0]
    lengths = [0] * len(freqs)
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        other = 0 if used[0] != 0 else 1
        lengths[other] = 1  # keep the code complete (2 symbols at length 1)
        return lengths
    heap = [(freqs[s], s, (s,)) for s in used]
    heapq.heapify(heap)
    depth = {s: 0 for s in used}
    while len(heap) > 1:
        f1, t1, m1 = heapq.heappop(heap)
        f2, t2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), m1 + m2))
    if max(depth.values()) <= cap:
        for s, ln in depth.items():
            lengths[s] = ln
        return lengths
    n = len(used)
    level = max(1, (n - 1).bit_length())
    shorter = (1 << level) - n
    by_freq = sorted(used, key=lambda s: -freqs[s])
    for i, s in enumerate(by_freq):
        lengths[s] = level - 1 if i < shorter else level
    return lengths


def _write_code(bw: _BitWriter, freqs: list[int]) -> list[tuple[int, int]]:
    """Write one Huffman code header; returns (code, len) per symbol."""
    used = [s for s, f in enumerate(freqs) if f > 0]
    if 1 <= len(used) <= 2 and max(used) <= 255:
        # simple code (1-symbol codes are 0 bits per use)
        bw.write(1, 1)
        bw.write(len(used) - 1, 1)
        if len(used) == 1 and used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 1:
            return [(0, 0)] * len(freqs)
        bw.write(used[1], 8)
        out = [(0, 0)] * len(freqs)
        out[used[0]] = (0, 1)  # canonical: smaller symbol gets code 0
        out[used[1]] = (1, 1)
        return out
    lengths = _code_lengths(freqs, 15)
    codes = _canonical_codes(lengths)
    bw.write(0, 1)  # normal code
    last_nz = max(s for s, ln in enumerate(lengths) if ln)
    n_tokens = max(last_nz + 1, 2)
    use_escape = len(lengths) - n_tokens >= 8  # worth the 3+nbits header
    written = lengths[:n_tokens] if use_escape else lengths
    cl_freq = [0] * 19
    for ln in written:
        cl_freq[ln] += 1
    cl_lengths = _code_lengths(cl_freq, 7)
    bw.write(19 - 4, 4)
    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    if use_escape:
        # max_symbol escape: transmit only the leading n_tokens lengths;
        # the decoder zero-fills the trailing alphabet (and our writer is
        # literal-only, so token count == symbol count in both readings)
        bw.write(1, 1)
        nbits = 2
        while n_tokens - 2 >= (1 << nbits):
            nbits += 2
        bw.write((nbits - 2) // 2, 3)
        bw.write(n_tokens - 2, nbits)
    else:
        bw.write(0, 1)
    cl_codes = _canonical_codes(cl_lengths)
    for ln in written:
        bw.write(_rev(cl_codes[ln], cl_lengths[ln]), cl_lengths[ln])
    return [(codes[s], lengths[s]) for s in range(len(lengths))]


def _lz77_code(value: int) -> tuple[int, int, int]:
    """value -> (prefix symbol, extra bits value, extra bits count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    eb = v.bit_length() - 2
    hi = v >> eb  # 2 or 3
    sym = 2 * eb + 2 + (hi & 1)
    offset = (2 + (hi & 1)) << eb
    return sym, v - offset, eb


def _tokenize(pixels: np.ndarray, cache_bits: int, backrefs: bool) -> list:
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    total = len(pixels)
    pos = 0
    vals = pixels.tolist()
    while pos < total:
        v = vals[pos]
        if backrefs and pos + 2 < total and vals[pos + 1] == v and vals[pos + 2] == v:
            run = 3
            while pos + run < total and vals[pos + run] == v and run < 4097:
                run += 1
            # literal for the first pixel handled below; copy the rest
            tokens.append(("lit", v))
            if cache is not None:
                cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> shift] = v
            length = run - 1
            tokens.append(("copy", length, 2))  # dist_code 2 = map (1,0) = 1
            pos += run
            continue
        if cache is not None:
            idx = (0x1E35A7BD * v & 0xFFFFFFFF) >> shift
            if cache[idx] == v:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = v
        tokens.append(("lit", v))
        pos += 1
    return tokens


def _write_entropy_image(bw: _BitWriter, pixels: np.ndarray, level0: bool,
                         cache_bits: int = 0, backrefs: bool = False) -> None:
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta-Huffman
    tokens = _tokenize(pixels, cache_bits, backrefs)
    cache_size = (1 << cache_bits) if cache_bits else 0
    freqs = [[0] * (256 + 24 + cache_size), [0] * 256, [0] * 256,
             [0] * 256, [0] * 40]
    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            freqs[0][(v >> 8) & 0xFF] += 1
            freqs[1][(v >> 16) & 0xFF] += 1
            freqs[2][v & 0xFF] += 1
            freqs[3][(v >> 24) & 0xFF] += 1
        elif tok[0] == "cache":
            freqs[0][280 + tok[1]] += 1
        else:
            lsym, _, _ = _lz77_code(tok[1])
            freqs[0][256 + lsym] += 1
            dsym, _, _ = _lz77_code(tok[2])
            freqs[4][dsym] += 1
    if not any(freqs[4]):
        freqs[4][0] = 1  # unused distance tree still needs a valid code
    tables = [_write_code(bw, f) for f in freqs]
    g_t, r_t, b_t, a_t, d_t = tables
    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            for t, sym in ((g_t, (v >> 8) & 0xFF), (r_t, (v >> 16) & 0xFF),
                           (b_t, v & 0xFF), (a_t, (v >> 24) & 0xFF)):
                c, ln = t[sym]
                bw.write(_rev(c, ln), ln)
        elif tok[0] == "cache":
            c, ln = g_t[280 + tok[1]]
            bw.write(_rev(c, ln), ln)
        else:
            lsym, lextra, lebits = _lz77_code(tok[1])
            c, ln = g_t[256 + lsym]
            bw.write(_rev(c, ln), ln)
            bw.write(lextra, lebits)
            dsym, dextra, debits = _lz77_code(tok[2])
            c, ln = d_t[dsym]
            bw.write(_rev(c, ln), ln)
            bw.write(dextra, debits)


def _to_argb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
    h, w, _ = img.shape
    a = np.full((h, w), 255, np.uint32)
    return ((a << 24) | (img[..., 0].astype(np.uint32) << 16)
            | (img[..., 1].astype(np.uint32) << 8)
            | img[..., 2].astype(np.uint32)).ravel(), w, h


def encode_webp(img: np.ndarray, *, transform: str | None = None,
                predictor_mode: int = 2,
                color_elem: tuple[int, int, int] = (16, 8, 4),
                cache_bits: int = 0, backrefs: bool = False) -> bytes:
    """Lossless VP8L encoder.  ``transform`` is one of None, 'palette',
    'subtract_green', 'predictor' (fixed ``predictor_mode`` 0..13 per
    block), or 'color' (fixed ``color_elem`` = (g2r, g2b, r2b))."""
    pixels, w, h = _to_argb(img)
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        g = (pixels >> 8) & 0xFF
        r = (((pixels >> 16) & 0xFF) - g) & 0xFF
        b = ((pixels & 0xFF) - g) & 0xFF
        pixels = (pixels & 0xFF00FF00) | (r << 16) | b
    elif transform == "predictor":
        size_bits = 4
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        bwid = (w + 15) >> size_bits
        bhei = (h + 15) >> size_bits
        modes = np.full(bwid * bhei,
                        0xFF000000 | (predictor_mode << 8), np.uint32)
        _write_entropy_image(bw, modes, False)
        res = np.zeros_like(pixels)
        for y in range(h):
            for x in range(w):
                p = y * w + x
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = _unpack(int(pixels[p - 1]))
                elif x == 0:
                    pred = _unpack(int(pixels[p - w]))
                else:
                    pred = _predict(predictor_mode,
                                    _unpack(int(pixels[p - 1])),
                                    _unpack(int(pixels[p - w])),
                                    _unpack(int(pixels[p - w - 1])),
                                    _unpack(int(pixels[p - w + 1])))
                cur = _unpack(int(pixels[p]))
                res[p] = _pack(tuple((c - pc) & 0xFF
                                     for c, pc in zip(cur, pred)))
        pixels = res
    elif transform == "color":
        size_bits = 4
        g2r, g2b, r2b = color_elem
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(size_bits - 2, 3)
        bwid = (w + 15) >> size_bits
        bhei = (h + 15) >> size_bits
        elems = np.full(bwid * bhei,
                        0xFF000000 | ((r2b & 0xFF) << 16)
                        | ((g2b & 0xFF) << 8) | (g2r & 0xFF), np.uint32)
        _write_entropy_image(bw, elems, False)
        res = pixels.copy()
        for p in range(len(pixels)):
            v = int(pixels[p])
            g = (v >> 8) & 0xFF
            red = (v >> 16) & 0xFF
            blue = v & 0xFF
            nr = (red - _ct_delta(g2r, g)) & 0xFF
            nb = (blue - _ct_delta(g2b, g) - _ct_delta(r2b, red)) & 0xFF
            res[p] = (v & 0xFF00FF00) | (nr << 16) | nb
        pixels = res
    elif transform == "palette":
        colors, inverse = np.unique(pixels, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette transform needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), np.uint32)
        prev = 0
        for i, c in enumerate(colors.tolist()):
            d = 0  # channel-wise modular difference
            for sh in (0, 8, 16, 24):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas[i] = d
            prev = c
        _write_entropy_image(bw, deltas, False)
        n = len(colors)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        idx = inverse.reshape(h, w).astype(np.uint32)
        if width_bits:
            per = 1 << width_bits
            depth = 8 >> width_bits
            packed_w = (w + per - 1) // per
            padded = np.zeros((h, packed_w * per), np.uint32)
            padded[:, :w] = idx
            packed = np.zeros((h, packed_w), np.uint32)
            for k in range(per):
                packed |= padded[:, k::per] << (k * depth)
            pixels = (packed << 8).ravel().astype(np.uint32)
        else:
            pixels = (idx << 8).ravel().astype(np.uint32)
    elif transform is not None:
        raise ValueError(f"unknown transform {transform!r}")
    bw.write(0, 1)  # end of transforms
    _write_entropy_image(bw, pixels, True, cache_bits=cache_bits,
                         backrefs=backrefs)
    body = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --------------------------------------------------------------- animation
import os as _os

# same decode-bomb budget knob as GIF/TIFF (ADVICE r4): reject before
# allocating canvases from untrusted header dimensions
_MAX_PIXELS = int(_os.environ.get("PJR_DECODE_MAX_PIXELS",
                                  str(64 * 1024 * 1024)))


def _decode_frame_chunk(fourcc: bytes, body: bytes) -> np.ndarray | None:
    """One ANMF sub-image (VP8L or VP8) -> RGB, via the same dispatch as
    decode_webp (delegation first for lossy, pure fallback)."""
    if fourcc == b"VP8L":
        return decode_vp8l(body)
    if fourcc == b"VP8 ":
        from .webp_native import decode_rgb

        pad = body + (b"\x00" if len(body) & 1 else b"")
        mini = (b"RIFF" + struct.pack("<I", 4 + 8 + len(pad)) + b"WEBP"
                + b"VP8 " + struct.pack("<I", len(body)) + pad)
        got = decode_rgb(mini)
        if got is not None:
            return got
        from .vp8 import decode_vp8

        return decode_vp8(body)
    return None


def decode_webp_frames(payload: bytes,
                       max_frames: int | None = None) -> list | None:
    """All frames of an animated WebP (VP8X + ANIM + ANMF chunks), each a
    full canvas-sized HxWx3 uint8 RGB array after compositing: frames draw
    into their (x, y, w, h) sub-rectangle, dispose-to-background restores
    the ANIM background color's RGB over the rectangle afterwards (the
    spec's transparent-black, projected onto this engine's opaque RGB
    pipeline), dispose-none leaves the canvas.  Opaque frames (no ALPH
    chunk) make the blend flag a no-op overwrite, matching the spec's
    alpha-blend with alpha == 255.  A plain still WebP returns [image].
    Returns None if malformed.

    Reference parity note: the reference's cv::imdecode returns only the
    FIRST frame of an animation; this is the engine's video-style
    extension, mirroring decode_gif_frames (functions/gif.py)."""
    try:
        return _decode_webp_frames_inner(payload, max_frames)
    except (IndexError, ValueError, struct.error):
        return None


def _decode_webp_frames_inner(payload, max_frames):
    if len(payload) < 20 or payload[:4] != b"RIFF" or \
            payload[8:12] != b"WEBP":
        return None
    # walk top-level chunks
    pos = 12
    canvas = None
    bg = np.zeros(3, dtype=np.uint8)
    frames = []
    saw_anim = False
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            return None
        if fourcc == b"VP8X":
            if size < 10:
                return None
            cw = 1 + (body[4] | (body[5] << 8) | (body[6] << 16))
            ch = 1 + (body[7] | (body[8] << 8) | (body[9] << 16))
            if cw * ch > _MAX_PIXELS:
                return None
            canvas = np.zeros((ch, cw, 3), dtype=np.uint8)
        elif fourcc == b"ANIM":
            if size < 6 or canvas is None:
                return None
            saw_anim = True
            # background is stored B, G, R, A
            bg = np.array([body[2], body[1], body[0]], dtype=np.uint8)
            canvas[:] = bg
        elif fourcc == b"ANMF":
            if not saw_anim or size < 16:
                return None
            fx = 2 * (body[0] | (body[1] << 8) | (body[2] << 16))
            fy = 2 * (body[3] | (body[4] << 8) | (body[5] << 16))
            fw = 1 + (body[6] | (body[7] << 8) | (body[8] << 16))
            fh = 1 + (body[9] | (body[10] << 8) | (body[11] << 16))
            flags = body[15]
            if fw * fh > _MAX_PIXELS:
                return None
            sub = None
            ipos = 16
            while ipos + 8 <= len(body):
                ifour = body[ipos:ipos + 4]
                isize = struct.unpack_from("<I", body, ipos + 4)[0]
                ibody = body[ipos + 8:ipos + 8 + isize]
                if len(ibody) != isize:
                    return None
                if ifour in (b"VP8L", b"VP8 "):
                    sub = _decode_frame_chunk(ifour, ibody)
                    break
                ipos += 8 + isize + (isize & 1)
            if sub is None or sub.shape[:2] != (fh, fw):
                return None
            if fy + fh > canvas.shape[0] or fx + fw > canvas.shape[1]:
                return None
            canvas[fy:fy + fh, fx:fx + fw] = sub
            frames.append(canvas.copy())
            if flags & 0x01:  # dispose to background
                canvas[fy:fy + fh, fx:fx + fw] = bg
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        pos += 8 + size + (size & 1)
    if frames:
        return frames
    still = decode_webp(payload)
    return [still] if still is not None else None


def encode_webp_anim(frames, offsets=None, durations_ms=None,
                     dispose=None, background=(0, 0, 0),
                     loop: int = 0) -> bytes:
    """Animated-WebP writer (VP8X + ANIM + ANMF, lossless VP8L frame
    payloads — frames survive byte-exactly, so compositing is testable
    exactly).  ``offsets`` are (x, y) pairs with EVEN coordinates (the
    container stores them divided by 2); ``dispose[i]`` True = dispose to
    background after frame i.  Canvas size = max extent of the frames."""
    n = len(frames)
    offsets = offsets or [(0, 0)] * n
    durations_ms = durations_ms or [100] * n
    dispose = dispose or [False] * n
    cw = max(off[0] + f.shape[1] for off, f in zip(offsets, frames))
    ch = max(off[1] + f.shape[0] for off, f in zip(offsets, frames))

    def u24(v):
        return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    out = bytearray()
    out += chunk(b"VP8X", bytes((0x02, 0, 0, 0)) + u24(cw - 1) + u24(ch - 1))
    r, g, b = background
    out += chunk(b"ANIM", bytes((b, g, r, 255)) + struct.pack("<H", loop))
    for f, (x, y), dur, disp in zip(frames, offsets, durations_ms, dispose):
        if x & 1 or y & 1:
            raise ValueError("ANMF offsets must be even")
        still = encode_webp(np.asarray(f, dtype=np.uint8))
        vp8l = still[12:]  # the VP8L chunk (with its own header + padding)
        hdr = (u24(x // 2) + u24(y // 2) + u24(f.shape[1] - 1)
               + u24(f.shape[0] - 1) + u24(dur)
               + bytes((0x01 if disp else 0x00,)))
        out += chunk(b"ANMF", hdr + vp8l)
    body = b"WEBP" + bytes(out)
    return b"RIFF" + struct.pack("<I", len(body)) + body
