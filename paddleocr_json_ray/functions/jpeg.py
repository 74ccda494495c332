"""Dependency-free baseline JPEG codec (pure numpy).

Implements the baseline sequential DCT process of ITU-T T.81 (ISO/IEC
10918-1) with the Annex K example quantization and Huffman tables — the
most common real-world payload format the reference accepts via OpenCV
(``cpp/src/task_linux.cpp:67-122``).

  * Encoder: 8-bit YCbCr 4:4:4, single interleaved scan, quality-scaled
    Annex K quant tables (libjpeg's 5000/Q | 200-2Q curve), standard
    Huffman tables, byte stuffing.  Quality 100 quantizes every
    coefficient by 1 — error is then only DCT float round-trip (max ~±2
    per sample).
  * Decoder: baseline SOF0/SOF1 and PROGRESSIVE SOF2 (spectral selection +
    successive approximation, DC/AC first and refinement scans, EOB runs —
    T.81 Annex G, the format libjpeg writes by default for web images and
    the reference accepts via ``cv::imdecode``), 1- or 3-component,
    sampling factors 1 or 2 (4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT
    segments, restart markers, 16-bit quant precision.  Returns HxWx3
    uint8 RGB or ``None`` for malformed/unsupported payloads (arithmetic,
    12-bit, lossless).
  * ``encode_jpeg_progressive``: SOF2 writer (4:4:4) with a scan script
    covering all four progressive scan types (DC first at Al=1, per-
    component AC first at Al=1 with EOB runs, DC refinement, AC
    refinement) — exists so the decoder's progressive paths are
    round-trip-testable without external codecs.

The JPEG DCT is the orthonormal DCT-II: with T[k,n] = c(k) sqrt(2/8)
cos((2n+1) k pi / 16), c(0)=1/sqrt2, FDCT(B) = T B T', IDCT(S) = T' S T.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# ---------------------------------------------------------- spec constants
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))

_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    t = np.sqrt(2.0 / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
    t[0] /= np.sqrt(2.0)
    return t


_T = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUM, _Q_CHROM):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


# ------------------------------------------------------------ huffman utils
def _code_lengths(bits: list[int]) -> list[int]:
    sizes = []
    for l, n in enumerate(bits, start=1):
        sizes.extend([l] * n)
    return sizes


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order per T.81 C.2."""
    sizes = _code_lengths(bits)
    table = {}
    code = 0
    prev = sizes[0] if sizes else 0
    for sym, size in zip(vals, sizes):
        code <<= (size - prev)
        table[sym] = (code, size)
        code += 1
        prev = size
    return table


class _DecodeTable:
    """mincode/maxcode/valptr arrays per T.81 F.2.2.3."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        idx = 0
        for l in range(1, 17):
            if bits[l - 1] == 0:
                self.maxcode[l] = -1
            else:
                self.valptr[l] = idx
                self.mincode[l] = code
                code += bits[l - 1]
                idx += bits[l - 1]
                self.maxcode[l] = code - 1
            code <<= 1


# ------------------------------------------------------------------ encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blockify(chan: np.ndarray) -> np.ndarray:
    """[H, W] (multiples of 8) -> [n_blocks, 8, 8], row-major block order."""
    h, w = chan.shape
    return (chan.reshape(h // 8, 8, w // 8, 8)
                .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _mag_cat(diff)
    code, ln = dc_tab[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.flatnonzero(zz[1:]) + 1
    last = int(nz[-1]) if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s = _mag_cat(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _quant_blocks(chan: np.ndarray, q: np.ndarray) -> np.ndarray:
    """[H, W] channel -> [grid_h*grid_w, 64] quantized zigzag blocks."""
    blocks = _blockify(chan - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
    quant = np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)
    return quant.reshape(-1, 64)[:, _ZIGZAG].astype(np.int64)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """8-bit RGB (or gray) -> baseline JFIF JPEG, YCbCr 4:4:4 or 4:2:0."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
    h, w, _ = img.shape
    qlum, qchrom = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(img)
    mcu = 8 if subsampling == "444" else 16
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    pad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    dc_lum = _build_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _build_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chrom = _build_encode_table(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_chrom = _build_encode_table(_AC_CHROM_BITS, _AC_CHROM_VALS)

    qy = qlum.reshape(8, 8).astype(np.float64)
    qc = qchrom.reshape(8, 8).astype(np.float64)
    ygrid_w = pw // 8
    ycomp = _quant_blocks(pad[..., 0], qy)
    if subsampling == "444":
        comps = [ycomp,
                 _quant_blocks(pad[..., 1], qc),
                 _quant_blocks(pad[..., 2], qc)]
        y_hv = 0x11
    else:
        # chroma: 2x2 box average, one block per 16x16 MCU
        sub = pad.reshape(ph // 2, 2, pw // 2, 2, 3).mean(axis=(1, 3))
        comps = [ycomp,
                 _quant_blocks(sub[..., 1], qc),
                 _quant_blocks(sub[..., 2], qc)]
        y_hv = 0x22

    bw = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(dc_lum, ac_lum), (dc_chrom, ac_chrom), (dc_chrom, ac_chrom)]
    mcux, mcuy = pw // mcu, ph // mcu
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        if subsampling == "444":
            order = [(0, m), (1, m), (2, m)]
        else:
            order = [(0, (2 * my + by) * ygrid_w + 2 * mx + bx)
                     for by in range(2) for bx in range(2)]
            order += [(1, m), (2, m)]
        for ci, bi in order:
            preds[ci] = _encode_block(bw, comps[ci][bi], preds[ci], *tabs[ci])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum[_ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qchrom[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (hv, tq) in enumerate([(y_hv, 0), (0x11, 1), (0x11, 1)], start=1):
        sof += bytes([cid, hv, tq])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0x00, _DC_LUM_BITS, _DC_LUM_VALS))
    out += seg(0xFFC4, dht(0x10, _AC_LUM_BITS, _AC_LUM_VALS))
    out += seg(0xFFC4, dht(0x01, _DC_CHROM_BITS, _DC_CHROM_VALS))
    out += seg(0xFFC4, dht(0x11, _AC_CHROM_BITS, _AC_CHROM_VALS))
    sos = b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder
class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at any marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-stuffed marker is hit

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self):
        """Skip to just past the next RST marker, byte-aligned."""
        d = self.data
        self.acc = 0
        self.nbits = 0
        self.marker = None
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode(br: _BitReader, tab: _DecodeTable) -> int:
    code = br.bits(1)
    l = 1
    while code > tab.maxcode[l]:
        code = (code << 1) | br.bits(1)
        l += 1
        if l > 16:
            raise ValueError("bad huffman code")
    return tab.vals[tab.valptr[l] + code - tab.mincode[l]]


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br: _BitReader, dc_tab: _DecodeTable, ac_tab: _DecodeTable,
                  pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    s = _huff_decode(br, dc_tab)
    dc = pred + _extend(br.bits(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index out of range")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz, dc


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG -> HxWx3 uint8 RGB; None if malformed/unsupported."""
    try:
        return _decode_jpeg_inner(payload)
    except (ValueError, IndexError, KeyError, struct.error, ZeroDivisionError):
        return None


def _decode_jpeg_inner(payload: bytes) -> np.ndarray | None:
    if not payload.startswith(b"\xff\xd8"):
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _DecodeTable] = {}
    frame = None
    restart_interval = 0
    coeffs = None  # progressive: per-component accumulated zigzag coeffs
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            if coeffs is not None:  # progressive: all scans accumulated
                return _reconstruct_progressive(frame, coeffs, qtabs)
            return None  # EOI before SOS
        if pos + 2 > len(payload):
            return None
        seglen = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i:i + n]
                i += n
                vals = (np.frombuffer(raw, dtype=">u2").astype(np.int64)
                        if pq else np.frombuffer(raw, dtype=np.uint8).astype(np.int64))
                qtabs[tq] = vals
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                htabs[(tc, th)] = _DecodeTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless/arithmetic unsupported
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c:3 + 2 * c]
                comp = next((i for i, cc in enumerate(frame["comps"])
                             if cc["id"] == cs), None)
                if comp is None:
                    return None
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            if not frame.get("progressive"):
                scan_b = [(frame["comps"][i], td, ta) for i, td, ta in scan]
                return _decode_scan(payload, pos + seglen, frame, scan_b,
                                    qtabs, htabs, restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if coeffs is None:
                coeffs = _alloc_progressive_coeffs(frame)
            pos = _decode_progressive_scan(
                payload, pos + seglen, frame, scan, ss, se,
                ahal >> 4, ahal & 0x0F, htabs, restart_interval, coeffs)
            continue
        pos += seglen
    return None


def _decode_scan(payload, pos, frame, scan, qtabs, htabs, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax not in (1, 2) or vmax not in (1, 2):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for comp, _, _ in scan:
        planes.append(np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8)))
    br = _BitReader(payload, pos)
    preds = [0] * len(scan)
    qnat = {}
    for tq, vals in qtabs.items():
        qn = np.empty(64, dtype=np.int64)
        qn[_ZIGZAG] = vals
        qnat[tq] = qn.reshape(8, 8)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, (comp, td, ta) in enumerate(scan):
            q = qnat.get(comp["tq"])
            if q is None:
                return None
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz, preds[ci] = _decode_block(
                        br, htabs[(0, td)], htabs[(1, ta)], preds[ci])
                    nat = np.zeros(64, dtype=np.float64)
                    nat[_ZIGZAG] = zz
                    block = _T.T @ (nat.reshape(8, 8) * q) @ _T + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    out = []
    for ci, (comp, _, _) in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(out, axis=-1))


# ------------------------------------------------- progressive (T.81 G.2)
def _comp_geometry(frame, ci):
    """Per-component block geometry: (padded_bw, padded_bh) sized to the
    interleaved MCU grid, (nw, nh) the non-interleaved block counts."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    c = comps[ci]
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    comp_w = -(-frame["w"] * c["h"] // hmax)   # ceil(w * h_i / hmax)
    comp_h = -(-frame["h"] * c["v"] // vmax)
    nw = -(-comp_w // 8)
    nh = -(-comp_h // 8)
    return mcux * c["h"], mcuy * c["v"], nw, nh, mcux, mcuy


def _alloc_progressive_coeffs(frame):
    """One (padded_bh, padded_bw, 64) int array per component, zigzag
    coefficient order, accumulated across scans."""
    out = []
    for ci in range(len(frame["comps"])):
        bw, bh, _, _, _, _ = _comp_geometry(frame, ci)
        out.append(np.zeros((bh, bw, 64), dtype=np.int64))
    return out


def _next_marker_pos(payload: bytes, pos: int) -> int:
    """First byte of the next real marker at/after ``pos`` (skips entropy
    data, stuffed 0xFF00 and RSTn)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _decode_progressive_scan(payload, pos, frame, scan, ss, se, ah, al,
                             htabs, restart_interval, coeffs) -> int:
    """Decode one progressive scan into ``coeffs``; returns the position of
    the marker following the scan's entropy data.

    Four scan types (T.81 G.2 / libjpeg jdphuff.c): DC first (Ss=0, Ah=0,
    possibly interleaved), DC refinement (one bit per block), AC first
    (single component, EOB runs), AC refinement (correction bits woven
    between newly-nonzero coefficients)."""
    br = _BitReader(payload, pos)
    if ss == 0:  # ---- DC scan (interleaved or single-component)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        interleaved = len(scan) > 1
        preds = [0] * len(scan)
        if interleaved:
            _, _, _, _, mcux, mcuy = _comp_geometry(frame, scan[0][0])
            n_mcu = mcux * mcuy
        else:
            _, _, nw, nh, _, _ = _comp_geometry(frame, scan[0][0])
            n_mcu = nw * nh
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                br.restart()
                preds = [0] * len(scan)
            for si, (ci, td, _ta) in enumerate(scan):
                comp = frame["comps"][ci]
                if interleaved:
                    my, mx = divmod(m, mcux)
                    blocks = [(my * comp["v"] + by, mx * comp["h"] + bx)
                              for by in range(comp["v"])
                              for bx in range(comp["h"])]
                else:
                    _, _, nw, _, _, _ = _comp_geometry(frame, ci)
                    blocks = [divmod(m, nw)]
                for by, bx in blocks:
                    if ah == 0:  # first pass
                        s = _huff_decode(br, htabs[(0, td)])
                        diff = _extend(br.bits(s), s)
                        preds[si] += diff
                        coeffs[ci][by, bx, 0] = preds[si] << al
                    else:  # refinement: one bit
                        if br.bits(1):
                            coeffs[ci][by, bx, 0] |= 1 << al
        return _next_marker_pos(payload, br.pos)

    # ---- AC scan: single component only (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("interleaved AC progressive scan")
    ci, _td, ta = scan[0]
    actab = htabs[(1, ta)]
    _, _, nw, nh, _, _ = _comp_geometry(frame, ci)
    plane = coeffs[ci]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    for m in range(nw * nh):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            eobrun = 0
        by, bx = divmod(m, nw)
        blk = plane[by, bx]
        if ah == 0:  # ---- AC first pass
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(br, actab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC index out of band")
                blk[k] = _extend(br.bits(s), s) << al
                k += 1
        else:  # ---- AC refinement pass
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(br, actab)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("bad refinement size")
                        val = p1 if br.bits(1) else m1
                    while k <= se:
                        c = blk[k]
                        if c != 0:
                            if br.bits(1) and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                if s:
                                    blk[k] = val
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:
                    c = blk[k]
                    if c != 0:
                        if br.bits(1) and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1
    return _next_marker_pos(payload, br.pos)


def _reconstruct_progressive(frame, coeffs, qtabs):
    """Dequantize + IDCT the accumulated coefficients, assemble planes."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for ci, comp in enumerate(comps):
        q = qtabs.get(comp["tq"])
        if q is None:
            return None
        zz = coeffs[ci].reshape(-1, 64) * q[None, :]
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[:, _ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _T, blocks, _T) + 128.0
        bh, bw = coeffs[ci].shape[:2]
        plane = (spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                        .reshape(bh * 8, bw * 8))
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(out, axis=-1))


# --------------------------------------------------- progressive encoder
# Flat 9-bit AC Huffman table covering every symbol a progressive AC scan
# can emit (EOB runs r<<4 for r<=14, ZRL 0xF0, (run, size) pairs) — the
# standard Annex K tables lack the EOB-run symbols, and correctness (not
# compression) is what this writer exists for.
_AC_PROG_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
_AC_PROG_BITS = [0] * 16
_AC_PROG_BITS[8] = len(_AC_PROG_VALS)  # all codes 9 bits long


def _emit_eobrun(bw: _BitWriter, actab: dict, state: dict):
    """Flush a pending EOB run and the correction bits riding with it."""
    if state["eobrun"] > 0:
        nb = state["eobrun"].bit_length() - 1
        code, ln = actab[nb << 4]
        bw.put(code, ln)
        if nb:
            bw.put(state["eobrun"] & ((1 << nb) - 1), nb)
        state["eobrun"] = 0
        for b in state["be"]:
            bw.put(b, 1)
        state["be"] = []


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """8-bit RGB (or gray) -> PROGRESSIVE (SOF2) JFIF JPEG, YCbCr 4:4:4.

    Scan script exercises every progressive scan type the decoder
    implements: (1) interleaved DC first at Al=1; (2-4) per-component AC
    first Ss=1..63 at Al=1 (EOB-run coded); (5) DC refinement Ah=1->Al=0;
    (6-8) per-component AC refinement with buffered correction bits
    (T.81 G.1.2.2-3, the libjpeg jcphuff algorithm)."""
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
    h, w, _ = img.shape
    qlum, qchrom = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(img)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    qy = qlum.reshape(8, 8).astype(np.float64)
    qc = qchrom.reshape(8, 8).astype(np.float64)
    comps = [_quant_blocks(pad[..., 0], qy),
             _quant_blocks(pad[..., 1], qc),
             _quant_blocks(pad[..., 2], qc)]
    n_blk = comps[0].shape[0]

    dc_tabs = [_build_encode_table(_DC_LUM_BITS, _DC_LUM_VALS),
               _build_encode_table(_DC_CHROM_BITS, _DC_CHROM_VALS),
               _build_encode_table(_DC_CHROM_BITS, _DC_CHROM_VALS)]
    actab = _build_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int, entropy: bytes) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body) + entropy

    # ---- scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    preds = [0, 0, 0]
    for m in range(n_blk):
        for ci in range(3):
            v = int(comps[ci][m, 0]) >> 1        # point transform
            diff = v - preds[ci]
            preds[ci] = v
            s = _mag_cat(diff)
            code, ln = dc_tabs[ci][s]
            bw.put(code, ln)
            if s:
                bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    dc_first = bw.out

    # ---- scans 2-4: AC first per component, Ss=1..63, Al=1
    ac_first = []
    for ci in range(3):
        bw = _BitWriter()
        state = {"eobrun": 0, "be": []}
        for m in range(n_blk):
            blk = comps[ci][m]
            r = 0
            wrote = False
            for k in range(1, 64):
                v = int(blk[k])
                t = (abs(v) >> 1) * (1 if v >= 0 else -1)
                if t == 0:
                    r += 1
                    continue
                _emit_eobrun(bw, actab, state)
                while r > 15:
                    code, ln = actab[0xF0]
                    bw.put(code, ln)
                    r -= 16
                s = _mag_cat(t)
                code, ln = actab[(r << 4) | s]
                bw.put(code, ln)
                bw.put(t if t >= 0 else t + (1 << s) - 1, s)
                r = 0
                wrote = True
            if r > 0 or not wrote:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    _emit_eobrun(bw, actab, state)
        _emit_eobrun(bw, actab, state)
        bw.flush()
        ac_first.append(bw.out)

    # ---- scan 5: DC refinement, interleaved, Ah=1 -> Al=0
    bw = _BitWriter()
    for m in range(n_blk):
        for ci in range(3):
            bw.put(int(comps[ci][m, 0]) & 1, 1)
    bw.flush()
    dc_refine = bw.out

    # ---- scans 6-8: AC refinement per component, Ah=1 -> Al=0
    ac_refine = []
    for ci in range(3):
        bw = _BitWriter()
        state = {"eobrun": 0, "be": []}
        for m in range(n_blk):
            blk = comps[ci][m]
            ab = np.abs(blk[1:64])
            nz = np.flatnonzero(ab)
            eob = int(nz[-1]) + 1 if len(nz) else 0
            r = 0
            br: list[int] = []
            for k in range(1, 64):
                temp = int(ab[k - 1])
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    _emit_eobrun(bw, actab, state)
                    code, ln = actab[0xF0]
                    bw.put(code, ln)
                    r -= 16
                    for b in br:
                        bw.put(b, 1)
                    br = []
                if temp > 1:  # history-nonzero: buffer the correction bit
                    br.append(temp & 1)
                    continue
                _emit_eobrun(bw, actab, state)
                code, ln = actab[(r << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if int(blk[k]) >= 0 else 0, 1)
                for b in br:
                    bw.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                state["eobrun"] += 1
                state["be"].extend(br)
                if state["eobrun"] == 0x7FFF:
                    _emit_eobrun(bw, actab, state)
        _emit_eobrun(bw, actab, state)
        bw.flush()
        ac_refine.append(bw.out)

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum[_ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qchrom[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg(0xFFC2, sof)  # SOF2: progressive
    out += seg(0xFFC4, dht(0x00, _DC_LUM_BITS, _DC_LUM_VALS))
    out += seg(0xFFC4, dht(0x01, _DC_CHROM_BITS, _DC_CHROM_VALS))
    out += seg(0xFFC4, dht(0x10, _AC_PROG_BITS, _AC_PROG_VALS))
    out += bytes(sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1, dc_first))
    for ci, cid in enumerate((1, 2, 3)):
        out += bytes(sos([(cid, 0, 0)], 1, 63, 0, 1, ac_first[ci]))
    out += bytes(sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0, dc_refine))
    for ci, cid in enumerate((1, 2, 3)):
        out += bytes(sos([(cid, 0, 0)], 1, 63, 1, 0, ac_refine[ci]))
    out += b"\xff\xd9"
    return bytes(out)
