"""Dependency-free PNG + BMP codecs (zlib is in the stdlib), plus the
baseline JPEG codec from ``functions.jpeg``.

Makes the real-image seam exercisable in-sandbox: the reference decodes any
OpenCV-sniffable payload (``cpp/src/task_linux.cpp:67-122``); this module
covers the formats a pure-Python decoder can do —

  * PNG: 8-bit gray / palette / RGB / RGBA (+alpha variants), non-interlaced,
    all five scanline filters (spec: RFC 2083).  Encoder writes filter-0
    8-bit RGB (optionally Sub/Up for filter-path tests).
  * BMP: uncompressed BI_RGB 24/32-bit, bottom-up or top-down rows.
  * JPEG: baseline sequential DCT per ITU-T T.81 (see functions/jpeg.py) —
    the most common real-world payload format.

Decoders return HxWx3 uint8 RGB, or ``None`` for malformed payloads — the
caller maps that to the reference's imdecode error codes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# -------------------------------------------------------------------- decode
def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray | None:
    """Undo per-scanline filtering; returns [H, stride] uint8."""
    if len(raw) < height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            recon = line
        elif ftype == 1:  # Sub: cumulative along the row with bpp stride
            recon = line.copy()
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[x] = (recon[x] + pred) & 0xFF
        else:
            return None
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out


def decode_png(payload: bytes) -> np.ndarray | None:
    if not payload.startswith(PNG_MAGIC):
        return None
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = []
    plte = None
    try:
        while pos + 8 <= len(payload):
            length, ctype = struct.unpack_from(">I4s", payload, pos)
            pos += 8
            data = payload[pos:pos + length]
            if len(data) != length:
                return None
            pos += length + 4  # skip CRC
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
        if ihdr is None or not idat:
            return None
        width, height, depth, color, comp, filt, interlace = ihdr
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
        if channels is None or width == 0 or height == 0:
            return None
        raw = zlib.decompress(b"".join(idat))
        stride = width * channels
        grid = _png_unfilter(raw, height, stride, channels)
        if grid is None:
            return None
        px = grid.reshape(height, width, channels)
        if color == 2:
            return px.copy()
        if color == 6:
            return px[..., :3].copy()
        if color == 0:
            return np.repeat(px, 3, axis=2)
        if color == 4:
            return np.repeat(px[..., :1], 3, axis=2)
        if color == 3:
            if plte is None or int(px.max()) >= len(plte):
                return None
            return plte[px[..., 0]]
        return None
    except (struct.error, zlib.error, ValueError):
        return None


def decode_bmp(payload: bytes) -> np.ndarray | None:
    try:
        if len(payload) < 54 or payload[:2] != b"BM":
            return None
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            return None
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
            return None
        bottom_up = height > 0
        height = abs(height)
        nch = bpp // 8
        stride = (width * nch + 3) & ~3
        need = data_off + stride * height
        if len(payload) < need:
            return None
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                             offset=data_off).reshape(height, stride)
        px = rows[:, :width * nch].reshape(height, width, nch)
        if bottom_up:
            px = px[::-1]
        return np.ascontiguousarray(px[..., 2::-1])  # BGR(A) -> RGB
    except (struct.error, ValueError):
        return None


def decode_image(payload: bytes) -> np.ndarray | None:
    """Sniff + decode (PNG, BMP, JPEG incl. progressive, GIF, TIFF, lossless
    WebP); None for anything else/malformed."""
    if payload.startswith(PNG_MAGIC):
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload.startswith(b"\xff\xd8\xff"):
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"GIF8"):
        from .gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp

        return decode_webp(payload)
    return None


# -------------------------------------------------------------------- encode
def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit RGB PNG writer (filter 0 by default; 1/2 supported so the
    decoder's filter paths can be round-trip tested)."""
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
    h, w, _ = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    if filter_type == 0:
        filt = img
    elif filter_type == 1:  # Sub — uint8 subtraction wraps mod 256
        filt = img.copy()
        filt[:, 1:] = img[:, 1:] - img[:, :-1]
    elif filter_type == 2:  # Up
        filt = img.copy()
        filt[1:] = img[1:] - img[:-1]
    else:
        raise ValueError("encoder supports filters 0/1/2")
    scan = np.empty((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = filt.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
            + chunk(b"IEND", b""))


def encode_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP writer."""
    img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixels = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return hdr + dib + pixels
