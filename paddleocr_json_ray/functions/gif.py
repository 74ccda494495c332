"""Dependency-free GIF codec (pure numpy) — GIF87a/89a static decode plus a
writer for round-trip tests.

The reference accepts GIF through ``cv::imdecode`` (cpp/src/task_linux.cpp:
67-122), which renders the FIRST frame over the logical screen; this decoder
matches that: first image descriptor wins, local color table overrides the
global one, interlaced row order is undone (the four GIF passes), and the
graphic-control transparent index renders as its palette color (imdecode
without IMREAD_UNCHANGED drops alpha the same way).  Returns HxWx3 uint8 RGB
or ``None`` for malformed/unsupported payloads.

LZW is the GIF variant of T.81's neighbor: variable code width starting at
``min_code_size + 1`` growing to 12 bits, CLEAR resets the table, EOI ends
the stream; codes beyond the current table (the k-omega-k case) reproduce
``prev + prev[0]``.

The encoder exists so the decoder is testable without external codecs:
palette-quantized images (<= 256 distinct colors), optional interlacing to
exercise the deinterlace path, GIF89a with a graphic-control block.
"""

from __future__ import annotations

import os
import struct

import numpy as np

GIF_MAGIC = b"GIF8"

# decode-bomb guard: untrusted uint16 header dims allow 65535x65535x3
# (~12 GB) per frame; reject anything past this pixel budget before
# allocating.  Env-overridable for legitimate giant scans.
_MAX_PIXELS = int(os.environ.get("PJR_DECODE_MAX_PIXELS",
                                 str(64 * 1024 * 1024)))


# ------------------------------------------------------------------ decode
def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray | None:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # table: list of byte strings; rebuilt on CLEAR.  ``running`` counts
    # codes PROCESSED since the clear (giflib's RunningCode): width growth
    # follows it, not the entry count — the encoder adds an entry on every
    # emit including the first after clear, so a decoder that grows on
    # entries-added lags one code behind at each width boundary.
    table: list[bytes] = []

    def reset():
        nonlocal table, width, running
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        running = eoi + 1

    width = min_code_size + 1
    running = eoi + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for b in data:
        acc |= b << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # k-omega-k
            else:
                return None
            out += entry
            if len(out) > max_pixels:
                return out  # defensive: never overrun the raster
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            running += 1
            if running == (1 << width) and width < 12:
                width += 1
            prev = entry
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = np.r_[np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
    out[rows] = idx
    return out


def decode_gif(payload: bytes) -> np.ndarray | None:
    """First frame of a GIF -> HxWx3 uint8 RGB; None if malformed."""
    try:
        return _decode_gif_inner(payload)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_gif_inner(payload: bytes) -> np.ndarray | None:
    if not payload.startswith(b"GIF87a") and not payload.startswith(b"GIF89a"):
        return None
    if len(payload) < 13:
        return None
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if sw * sh > _MAX_PIXELS:
        return None
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while p < len(payload):
            sz = payload[p]
            p += 1
            if sz == 0:
                return p
            p += sz
        return p

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                return None
            pos = skip_subblocks(pos + 1)
        elif b == 0x2C:  # image descriptor — first frame wins
            left, top, w, h, ipack = struct.unpack_from("<HHHHB", payload, pos)
            if w * h > _MAX_PIXELS:
                return None
            pos += 9
            pal = gct
            if ipack & 0x80:
                n = 2 << (ipack & 0x07)
                pal = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                    offset=pos).reshape(n, 3)
                pos += 3 * n
            if pal is None or w == 0 or h == 0:
                return None
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                return None
            chunks = []
            while pos < len(payload):
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                chunks.append(payload[pos:pos + sz])
                pos += sz
            raw = _lzw_decode(b"".join(chunks), min_code, w * h)
            if raw is None or len(raw) < w * h:
                return None
            idx = np.frombuffer(bytes(raw[:w * h]), dtype=np.uint8).reshape(h, w)
            if ipack & 0x40:
                idx = _deinterlace(idx)
            idx = np.minimum(idx, len(pal) - 1)
            frame = pal[idx]
            if (left, top, w, h) == (0, 0, sw, sh) or sw == 0 or sh == 0:
                return np.ascontiguousarray(frame)
            # frame smaller than the logical screen: composite over bg color
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and bg < len(gct):
                canvas[:] = gct[bg]
            canvas[top:top + h, left:left + w] = frame[:max(0, sh - top),
                                                       :max(0, sw - left)]
            return canvas
        elif b == 0x3B:  # trailer before any image
            return None
        else:
            return None
    return None


# ------------------------------------------------------------------ encode
def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    run = b""
    for v in idx.ravel().tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # width grows when the table reaches the current code range —
            # same point (add, increment, then check) as the decoder
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([v])
    if run:
        put(table[run], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """8-bit RGB (or gray) -> single-frame GIF89a.  The image must use
    <= 256 distinct colors (GIF is palette-indexed; raise otherwise)."""
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    img = np.ascontiguousarray(img[..., :3], dtype=np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF needs <= 256 colors, image has {len(pal)}")
    bits = max(1, int(len(pal) - 1).bit_length())
    n = 1 << bits
    pal_out = np.zeros((n, 3), dtype=np.uint8)
    pal_out[:len(pal)] = pal
    idx = inv.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = np.r_[np.arange(0, h, 8), np.arange(4, h, 8),
                     np.arange(2, h, 4), np.arange(1, h, 2)]
        idx = idx[rows]
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_out.tobytes()
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control (no transparency)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0x00)
    min_code = max(2, bits)
    out.append(min_code)
    data = _lzw_encode(idx, min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# -------------------------------------------------------------- animation
def decode_gif_frames(payload: bytes,
                      max_frames: int | None = None) -> list[np.ndarray] | None:
    """All frames of an animated GIF (or [frame] for a static one), each a
    full HxWx3 uint8 RGB canvas after compositing: sub-rectangle frames
    draw over the previous canvas, the graphic-control transparent index
    leaves underlying pixels visible, disposal 2 restores the background
    color after the frame, disposal 3 restores the previous canvas.
    Returns None if malformed."""
    try:
        return _decode_gif_frames_inner(payload, max_frames)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_gif_frames_inner(payload, max_frames):
    if not payload.startswith(b"GIF87a") and not payload.startswith(b"GIF89a"):
        return None
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if sw * sh > _MAX_PIXELS:
        return None
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[np.ndarray] = []
    disposal = 0
    transparent = -1
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                flags = payload[pos + 1]
                disposal = (flags >> 2) & 0x07
                transparent = payload[pos + 4] if flags & 0x01 else -1
            while pos < len(payload):
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
        elif b == 0x2C:
            left, top, w, h, ipack = struct.unpack_from("<HHHHB", payload, pos)
            if w * h > _MAX_PIXELS:
                return None
            pos += 9
            pal = gct
            if ipack & 0x80:
                n = 2 << (ipack & 0x07)
                pal = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                    offset=pos).reshape(n, 3)
                pos += 3 * n
            if pal is None or w == 0 or h == 0:
                return None
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                return None
            chunks = []
            while pos < len(payload):
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                chunks.append(payload[pos:pos + sz])
                pos += sz
            raw = _lzw_decode(b"".join(chunks), min_code, w * h)
            if raw is None or len(raw) < w * h:
                return None
            idx = np.frombuffer(bytes(raw[:w * h]), dtype=np.uint8).reshape(h, w)
            if ipack & 0x40:
                idx = _deinterlace(idx)
            prev = canvas.copy() if disposal == 3 else None
            hh = min(h, sh - top)
            ww = min(w, sw - left)
            region = canvas[top:top + hh, left:left + ww]
            sub = np.minimum(idx[:hh, :ww], len(pal) - 1)
            px = pal[sub]
            if transparent >= 0:
                opaque = idx[:hh, :ww] != transparent
                region[opaque] = px[opaque]
            else:
                region[:] = px
            frames.append(canvas.copy())
            if max_frames is not None and len(frames) >= max_frames:
                return frames
            if disposal == 2:
                canvas[top:top + hh, left:left + ww] = bg_rgb
            elif disposal == 3 and prev is not None:
                canvas = prev
            disposal = 0
            transparent = -1
        elif b == 0x3B:
            break
        else:
            return None
    return frames or None


def encode_gif_animation(frames: list[np.ndarray],
                         transparent_delta: bool = False) -> bytes:
    """Frames (equal-size 8-bit RGB, <= 255 distinct colors TOTAL so a
    transparent slot fits) -> animated GIF89a.  ``transparent_delta``
    encodes each frame after the first as a delta: unchanged pixels become
    the transparent index (exercises the decoder's compositing path)."""
    if not frames:
        raise ValueError("no frames")
    imgs = []
    for f in frames:
        if f.ndim == 2:
            f = np.repeat(f[..., None], 3, axis=2)
        imgs.append(np.ascontiguousarray(f[..., :3], dtype=np.uint8))
    h, w, _ = imgs[0].shape
    allpix = np.concatenate([f.reshape(-1, 3) for f in imgs])
    pal, allinv = np.unique(allpix, axis=0, return_inverse=True)
    if len(pal) > 255:
        raise ValueError(f"animation needs <= 255 colors, has {len(pal)}")
    # per-frame palette indices come straight from the unique() inverse —
    # no per-pixel Python lookups
    frame_idx = allinv.reshape(len(imgs), h, w).astype(np.uint8)
    trans = len(pal)  # one extra palette slot for transparency
    bits = max(1, int(trans).bit_length())
    n = 1 << bits
    pal_out = np.zeros((n, 3), dtype=np.uint8)
    pal_out[:len(pal)] = pal
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_out.tobytes()
    min_code = max(2, bits)
    prev_img = None
    for fi, img in enumerate(imgs):
        idx = frame_idx[fi]
        use_trans = transparent_delta and fi > 0
        if use_trans:
            same = (img == prev_img).all(axis=2)
            idx = np.where(same, np.uint8(trans), idx)
        out += bytes([0x21, 0xF9, 0x04,
                      (1 << 2) | (1 if use_trans else 0),  # disposal 1
                      0x00, 0x00, trans if use_trans else 0x00, 0x00])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x00)
        out.append(min_code)
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0x00)  # per-frame data terminator
        prev_img = img
    out += b"\x3b"
    return bytes(out)
