"""Deterministic synthetic media codec ("SIMG").

No image codec libraries exist in this environment, so media spans carry a
compact deterministic format the decode stage understands.  The pipeline
plumbing around it — ref resolution, base64 path, error envelopes, raster
preprocessing, batch sizing — is the real thing; a real-image backend (PNG +
Paddle models) is a drop-in replacement for this codec plus the synthetic
model backends (SURVEY.md §7.4).

Layout (little-endian):
  magic  b"SIMG1\\n"
  u16 width, u16 height, u16 n_blocks
  per block: 8 x i16 quad coords (TL,TR,BR,BL), f32 det_prob, u8 flip180,
             u16 text_len, utf-8 text bytes

Decode failures return ``None`` — the stage maps that to the reference's
imdecode error codes (203 path / 301 base64, ``cpp/include/task.h:25,52``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"SIMG1\n"
_HDR = struct.Struct("<HHH")
_BLK = struct.Struct("<8hfBH")


@dataclass
class SimgBlock:
    quad: list  # 4x[x,y] int
    text: str
    det_prob: float = 0.95
    flip180: bool = False


@dataclass
class SimgImage:
    width: int
    height: int
    blocks: list = field(default_factory=list)


def encode(img: SimgImage) -> bytes:
    parts = [MAGIC, _HDR.pack(img.width, img.height, len(img.blocks))]
    for b in img.blocks:
        flat = [int(c) for pt in b.quad for c in pt]
        tb = b.text.encode("utf-8")
        parts.append(_BLK.pack(*flat, float(b.det_prob), 1 if b.flip180 else 0, len(tb)))
        parts.append(tb)
    return b"".join(parts)


def decode(data: bytes) -> SimgImage | None:
    if not data or len(data) < len(MAGIC) + _HDR.size or not data.startswith(MAGIC):
        return None
    try:
        off = len(MAGIC)
        w, h, n = _HDR.unpack_from(data, off)
        off += _HDR.size
        blocks = []
        for _ in range(n):
            vals = _BLK.unpack_from(data, off)
            off += _BLK.size
            tlen = vals[-1]
            if off + tlen > len(data):
                return None
            text = data[off:off + tlen].decode("utf-8")
            off += tlen
            quad = [[vals[0], vals[1]], [vals[2], vals[3]], [vals[4], vals[5]], [vals[6], vals[7]]]
            blocks.append(SimgBlock(quad=quad, text=text, det_prob=vals[8], flip180=bool(vals[9])))
        return SimgImage(width=w, height=h, blocks=blocks)
    except (struct.error, UnicodeDecodeError):
        return None


def render_raster(img: SimgImage, seed: int) -> np.ndarray:
    """Deterministic uint8 HxWx3 raster (synth/pixelcode layout).  After
    rendering, the pixels are the ONLY information channel: det probability,
    glyph content, orientation and cls confidence are all painted in, and
    the model backends read them back from rasters/crops alone."""
    from .pixelcode import render_raster as _render

    return _render(img, seed)


def raster_seed(data: bytes) -> int:
    """Stable raster seed from the payload bytes."""
    h = 1469598103934665603
    for byte in data[:256]:
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


# ---- tiny ndarray <-> bytes codec for shipping crops between actor stages ----
def array_to_bytes(a: np.ndarray) -> bytes:
    a = np.ascontiguousarray(a)
    hdr = struct.pack("<B", a.ndim) + b"".join(struct.pack("<I", d) for d in a.shape)
    return struct.pack("<B", {"uint8": 0, "float32": 1}[a.dtype.name]) + hdr + a.tobytes()


def bytes_to_array(data: bytes) -> np.ndarray:
    dt = np.uint8 if data[0] == 0 else np.float32
    ndim = data[1]
    shape = struct.unpack_from("<" + "I" * ndim, data, 2)
    return np.frombuffer(data, dtype=dt, offset=2 + 4 * ndim).reshape(shape)
