"""Dependency-free baseline TIFF codec (pure numpy).

The reference accepts TIFF through ``cv::imdecode`` (cpp/src/task_linux.cpp:
67-122); this decoder covers the baseline-TIFF profile real writers emit:
both byte orders, the first IFD, strip organization (chunky planar config),
8-bit grayscale / palette / RGB / RGBA samples, Compression 1 (none),
5 (LZW, MSB-first with the spec's "early change" width growth), and
32773 (PackBits), plus horizontal-differencing Predictor 2.  Returns
HxWx3 uint8 RGB or ``None`` for malformed/unsupported payloads (tiles,
planar=2, 16-bit, JPEG-in-TIFF).

TIFF LZW differs from GIF LZW in THREE ways (TIFF 6.0 §13): codes pack
MSB-first, strings index a byte table seeded 0..255 with CLEAR=256/EOI=257,
and the code width grows one code EARLY (at table size 2^w - 1).

The encoder exists so the decoder is round-trip testable without external
codecs: little-endian, chunky RGB, strip-based, compression selectable
(none / PackBits / LZW), optional Predictor 2.
"""

from __future__ import annotations

import os
import struct

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

# decode-bomb guard (see functions/gif.py): cap pixels before allocating
# a canvas from untrusted header dims.
_MAX_PIXELS = int(os.environ.get("PJR_DECODE_MAX_PIXELS",
                                 str(64 * 1024 * 1024)))


# --------------------------------------------------------------- LZW (TIFF)
def _lzw_decode_tiff(data: bytes, max_bytes: int) -> bytearray | None:
    CLEAR, EOI = 256, 257
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for b in data:
        acc = (acc << 8) | b
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if len(out) > max_bytes:
                return out
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            # EARLY CHANGE: width grows when ONE MORE entry would overflow
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
            prev = entry
    return out


def _lzw_encode_tiff(raw: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    run = b""
    for v in raw:
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = next_code
        next_code += 1
        # encoder mirrors the decoder's early change: the decoder's table
        # lags ours by one entry, so it hits 2^w - 1 when we hit 2^w
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # keep margin, emit CLEAR like libtiff
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([v])
    if run:
        put(table[run], width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- PackBits
def _packbits_decode(data: bytes, max_bytes: int) -> bytearray | None:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < max_bytes:
        c = data[i]
        i += 1
        if c == 128:
            continue
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                return None
            out += data[i:i + c + 1]
            i += c + 1
        else:  # replicate next byte 257-c times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return out


def _packbits_encode(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        # find replicate run
        j = i
        while j + 1 < n and raw[j + 1] == raw[i] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 >= 2
            out.append(257 - (j - i + 1))
            out.append(raw[i])
            i = j + 1
            continue
        # literal run until next replicate pair (or 128 bytes)
        j = i
        while (j + 1 < n and not (j + 2 < n and raw[j + 1] == raw[j + 2])
               and j - i < 127):
            j += 1
        out.append(j - i)
        out += raw[i:j + 1]
        i = j + 1
    return bytes(out)


# ------------------------------------------------------------------- decode
def decode_tiff(payload: bytes) -> np.ndarray | None:
    """First IFD of a baseline TIFF -> HxWx3 uint8 RGB; None if
    malformed/unsupported."""
    try:
        return _decode_tiff_inner(payload)
    except (ValueError, IndexError, struct.error, OverflowError):
        return None


def _read_ifd(payload: bytes, off: int, e: str) -> dict[int, tuple[int, list[int]]]:
    (count,) = struct.unpack_from(e + "H", payload, off)
    tags: dict[int, tuple[int, list[int]]] = {}
    sizes = {1: 1, 2: 1, 3: 2, 4: 4}
    fmts = {1: "B", 3: "H", 4: "I"}
    for i in range(count):
        base = off + 2 + 12 * i
        tag, typ, n = struct.unpack_from(e + "HHI", payload, base)
        if typ not in sizes:
            continue
        total = sizes[typ] * n
        voff = base + 8 if total <= 4 else struct.unpack_from(e + "I", payload, base + 8)[0]
        if typ == 2:
            tags[tag] = (typ, list(payload[voff:voff + n]))
            continue
        vals = list(struct.unpack_from(e + fmts[typ] * n, payload, voff))
        tags[tag] = (typ, vals)
    return tags


def _decode_tiff_inner(payload: bytes) -> np.ndarray | None:
    if payload[:4] not in TIFF_MAGICS:
        return None
    e = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    tags = _read_ifd(payload, ifd_off, e)

    def val(tag: int, default=None):
        t = tags.get(tag)
        return t[1] if t else default

    w = val(256, [0])[0]
    h = val(257, [0])[0]
    if not (0 < w and 0 < h):
        return None
    if w * h > _MAX_PIXELS:
        return None
    bps = val(258, [8])
    if any(b != 8 for b in bps):
        return None  # 8-bit only
    comp = val(259, [1])[0]
    photo = val(262, [1])[0]
    spp = val(277, [len(bps) if bps else 1])[0]
    planar = val(284, [1])[0]
    if planar != 1:
        return None
    if 322 in tags or 323 in tags:
        return None  # tiled
    offsets = val(273)
    counts = val(279)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    rows_per_strip = val(278, [h])[0] or h
    predictor = val(317, [1])[0]
    if predictor not in (1, 2):
        return None
    if comp not in (1, 5, 32773):
        return None
    stride = w * spp
    rows = []
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        if nrows <= 0:
            break
        need = nrows * stride
        chunk = payload[so:so + sc]
        if len(chunk) < sc:
            return None
        if comp == 1:
            raw = chunk
        elif comp == 5:
            raw = _lzw_decode_tiff(chunk, need)
        else:
            raw = _packbits_decode(chunk, need)
        if raw is None or len(raw) < need:
            return None
        rows.append(np.frombuffer(bytes(raw[:need]), dtype=np.uint8)
                    .reshape(nrows, w, spp))
    img = np.concatenate(rows, axis=0)
    if img.shape[0] != h:
        return None
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8)
    if photo == 3:  # palette
        cmap = val(320)
        if not cmap or len(cmap) < 3 * 256:
            return None
        pal = (np.array(cmap[:3 * 256], dtype=np.uint32)
               .reshape(3, 256).T >> 8).astype(np.uint8)
        return np.ascontiguousarray(pal[img[..., 0]])
    if photo in (0, 1):  # grayscale
        g = img[..., 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[..., None], 3, axis=2)
    if photo == 2:  # RGB / RGBA (alpha dropped, imdecode-style)
        if spp < 3:
            return None
        return np.ascontiguousarray(img[..., :3])
    return None


# ------------------------------------------------------------------- encode
def encode_tiff(img: np.ndarray, compression: str = "none",
                rows_per_strip: int = 0, predictor: bool = False) -> bytes:
    """8-bit RGB (or gray) -> little-endian chunky baseline TIFF.
    ``compression``: 'none' | 'packbits' | 'lzw'."""
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
    h, w, spp = img.shape
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    rps = rows_per_strip or h
    data = img
    if predictor:
        d = img.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d & 0xFF).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rps):
        raw = data[y0:y0 + rps].tobytes()
        if comp_id == 1:
            strips.append(raw)
        elif comp_id == 5:
            strips.append(_lzw_encode_tiff(raw))
        else:
            strips.append(_packbits_encode(raw))

    n_tags = 11
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    # strip offset/count arrays (LONGs) live right after the IFD
    n_strips = len(strips)
    arr_bytes = 0
    if n_strips > 1:
        arr_bytes = 2 * 4 * n_strips
    strip_data_off = data_off + arr_bytes
    offsets = []
    pos = strip_data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    def tag(tid: int, typ: int, n: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, typ, n, value)

    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_tags)
    out += tag(256, 4, 1, w)
    out += tag(257, 4, 1, h)
    # BitsPerSample: 3 SHORTs don't fit in the 4 inline bytes, so the tag
    # points at a 6-byte block carved between the strip arrays and the
    # strip data (recompute offsets to make room)
    if n_strips == 1:
        strip_data_off = data_off + 6
        offsets = []
        pos = strip_data_off
        for s in strips:
            offsets.append(pos)
            pos += len(s)
        bps_off = data_off
    else:
        # carve 6 extra bytes before strips for BPS
        strip_data_off += 6
        offsets = []
        pos = strip_data_off
        for s in strips:
            offsets.append(pos)
            pos += len(s)
        bps_off = data_off + arr_bytes
    out += tag(258, 3, 3, bps_off)
    out += tag(259, 3, 1, comp_id)
    out += tag(262, 3, 1, 2)  # RGB
    if n_strips == 1:
        out += tag(273, 4, 1, offsets[0])
    else:
        out += tag(273, 4, n_strips, data_off)
    out += tag(277, 3, 1, spp)
    out += tag(278, 4, 1, rps)
    if n_strips == 1:
        out += tag(279, 4, 1, len(strips[0]))
    else:
        out += tag(279, 4, n_strips, data_off + 4 * n_strips)
    out += tag(284, 3, 1, 1)  # chunky
    out += tag(317, 3, 1, 2 if predictor else 1)
    out += struct.pack("<I", 0)  # next IFD
    if n_strips > 1:
        out += struct.pack("<" + "I" * n_strips, *offsets)
        out += struct.pack("<" + "I" * n_strips, *(len(s) for s in strips))
    out += struct.pack("<HHH", 8, 8, 8)
    for s in strips:
        out += s
    return bytes(out)
