"""Pixel codec: the raster IS the information channel.

The renderer paints each text block so that every signal the OCR stages need
is recoverable from pixels alone — detection probability, glyph content,
orientation, and classifier confidence.  The det/cls/rec backends
(synth/backend.py) read ONLY rasters/crops; no ground-truth side channel
crosses a stage boundary.  This is the deterministic stand-in for the
reference's real models (DB det ``cpp/src/ocr_det.cpp:80-166``, cls
``cpp/src/ocr_cls.cpp:20-105``, CRNN ``cpp/src/ocr_rec.cpp:20-137``) in an
environment that ships no NN runtime: the "model" is an exactly-decodable
pixel code, but everything around it — resize/normalize kernels, bitmap
post-processing, crop warps, CTC decode, batching — is the real math.

Channel layout per block (axis-aligned bbox of the quad):

  R — detection signal.  Background noise in [250, 255].  The block interior
      is a "halo" (212 above the kernel, 208 below — the 4-unit asymmetry is
      the orientation cue), and a vertically-shrunk full-width KERNEL band
      carries ``round(250 - 180 * det_prob)`` — the DB-style shrunk text
      kernel a trained DB head would output.  ``pred = (250 - R) / 180``
      reconstructs the probability map: background ~0, halo ~0.22 (below the
      0.3 bitmap threshold), kernel = det_prob.
  G — in halo rows: ``round(cls_score * 255)`` (classifier confidence);
      in kernel rows: glyph low byte (``cp & 0xFF``), filler 230.
  B — halo/filler 230; glyph cells ``0x40 | (parity << 5) | ((cp >> 8) & 0x1F)``
      (range [64, 127], disjoint from filler and background).  The parity bit
      alternates per cell so equal adjacent characters still produce a value
      edge; cells are UNIFORM, which makes the code invariant under the
      nearest-neighbour perspective warp, 90°/180° rotations, and clamping.

A 180°-flipped block is painted rotated, so an uncorrected crop decodes to
the reversed string — the same observable the reference produces when angle
classification is disabled.  Codepoints are carried mod 2^13 (13 bits); the
rec dictionary then drops anything it cannot express, like a real model.
"""

from __future__ import annotations

import numpy as np

from ..functions.db_postprocess import shrink_distance

BG_MIN = 250          # background R/G/B noise floor
HALO_TOP_R = 212      # halo row value above the kernel (upright)
HALO_BOT_R = 208      # below the kernel
KERNEL_R_BASE = 250.0  # pred = (KERNEL_R_BASE - R) / KERNEL_R_SPAN
KERNEL_R_SPAN = 180.0
FILLER_GB = 230
GLYPH_B_MIN, GLYPH_B_MAX = 64, 127
CP_MOD = 1 << 13      # codepoints carried mod 2^13
MAX_CELL_W = 8


def _hash32(s: str, salt: int = 0) -> int:
    h = 2166136261 ^ salt
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def cls_truth_score(text: str) -> float:
    """Deterministic per-block classifier confidence painted into the halo:
    ~10% of texts score in [0.80, 0.85) (below cls_thresh -> the
    not-confident branch, cpp/src/paddleocr.cpp:126-137), the rest in
    [0.91, 0.99)."""
    h = _hash32(text, salt=0xC15)
    if h % 10 == 0:
        return 0.80 + (h % 50) / 1000.0
    return 0.91 + (h % 80) / 1000.0


def render_block(text: str, det_prob: float, cls_score: float,
                 hb: int, wb: int, flip180: bool) -> np.ndarray:
    """Paint one block's (hb, wb, 3) uint8 tile."""
    tile = np.empty((hb, wb, 3), dtype=np.uint8)
    if hb < 3 or wb < 2:  # degenerate: kernel only, no halo/orientation
        tile[..., 0] = int(np.clip(round(KERNEL_R_BASE - KERNEL_R_SPAN * det_prob), 5, 255))
        tile[..., 1] = FILLER_GB
        tile[..., 2] = FILLER_GB
        return tile
    d = shrink_distance(wb, hb)
    ky0 = min(max(int(round(d)), 1), max((hb - 3) // 2, 1))
    ky1 = hb - ky0  # symmetric => geometry is invariant under the 180° flip
    r_val = int(np.clip(round(KERNEL_R_BASE - KERNEL_R_SPAN * det_prob), 5, 255))
    g_score = int(np.clip(round(cls_score * 255), 0, 255))

    tile[:ky0, :, 0] = HALO_TOP_R
    tile[ky1:, :, 0] = HALO_BOT_R
    tile[ky0:ky1, :, 0] = r_val
    tile[:ky0, :, 1] = g_score
    tile[ky1:, :, 1] = g_score
    tile[ky0:ky1, :, 1] = FILLER_GB
    tile[..., 2] = FILLER_GB

    n = min(len(text), wb)  # at 1px/cell the bbox is out of room
    if n:
        cw = max(1, min(wb // n, MAX_CELL_W))
        for ci in range(min(n, wb // cw)):
            cp = ord(text[ci]) % CP_MOD
            tile[ky0:ky1, ci * cw:(ci + 1) * cw, 1] = cp & 0xFF
            tile[ky0:ky1, ci * cw:(ci + 1) * cw, 2] = (
                0x40 | ((ci & 1) << 5) | ((cp >> 8) & 0x1F))
    if flip180:
        tile = tile[::-1, ::-1]
    return np.ascontiguousarray(tile)


def render_raster(simg, seed: int) -> np.ndarray:
    """Deterministic uint8 HxWx3 raster for a decoded SIMG struct.  After
    this call the struct is dead weight: every downstream signal lives in the
    pixels."""
    rng = np.random.Generator(np.random.Philox(seed))
    raster = rng.integers(BG_MIN, 256, size=(simg.height, simg.width, 3), dtype=np.uint8)
    for b in simg.blocks:
        xs = [p[0] for p in b.quad]
        ys = [p[1] for p in b.quad]
        x0, x1 = max(min(xs), 0), min(max(xs), simg.width)
        y0, y1 = max(min(ys), 0), min(max(ys), simg.height)
        if x1 > x0 and y1 > y0:
            raster[y0:y1, x0:x1] = render_block(
                b.text, float(b.det_prob), cls_truth_score(b.text),
                y1 - y0, x1 - x0, bool(b.flip180))
    return raster


def pred_from_raster(raster: np.ndarray) -> np.ndarray:
    """Reconstruct the DB probability map a trained det head would emit."""
    return np.clip((KERNEL_R_BASE - raster[..., 0].astype(np.float32)) / KERNEL_R_SPAN,
                   0.0, 1.0)


# ----------------------------------------------------------------- decoding
def _kernel_mask(img: np.ndarray) -> np.ndarray:
    return img[..., 0] < 200


def _runs(idx: np.ndarray) -> list[tuple[int, int]]:
    """Contiguous runs [(start, stop)) of a sorted index array."""
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    out = []
    s = 0
    for b in list(breaks) + [idx.size - 1]:
        out.append((int(idx[s]), int(idx[b]) + 1))
        s = b + 1
    return out


def _nearest(runs: list[tuple[int, int]], center: int) -> tuple[int, int]:
    return min(runs, key=lambda r: 0 if r[0] <= center < r[1]
               else min(abs(r[0] - center), abs(r[1] - 1 - center)))


def own_kernel_bbox(km: np.ndarray, cy: int, cx: int) -> tuple[int, int, int, int] | None:
    """Bounding box (r0, r1, c0, c1) of the kernel band/segment nearest the
    crop centre — isolates this box's content from neighbouring lines the
    unclip margin may have pulled into the crop."""
    rows = np.flatnonzero(km.any(axis=1))
    if rows.size == 0:
        return None
    r0, r1 = _nearest(_runs(rows), cy)
    cols = np.flatnonzero(km[r0:r1].any(axis=0))
    c0, c1 = _nearest(_runs(cols), cx)
    return r0, r1, c0, c1


def _cells_text(crop: np.ndarray, r0: int, r1: int, c0: int, c1: int,
                ramp_filter: bool = False) -> str:
    """Read the glyph cell sequence of one kernel segment, ALWAYS
    left-to-right along x like a real CRNN: a crop the reference rotated 90°
    still decodes its single-cell content (cells are uniform), and would
    garble multi-cell rotated text exactly as a real recognizer would.
    ``ramp_filter`` drops runs shorter than a third of the longest glyph
    run: bilinear resampling (the CRNN input build) turns each cell boundary
    into a ~1-pixel-per-scale transition ramp, while real cells stay ~8x
    wider than the ramps at any uniform scale."""
    line = crop[(r0 + r1) // 2, c0:c1, 1:3]
    g = np.rint(line[:, 0]).astype(np.int32)
    b = np.rint(line[:, 1]).astype(np.int32)
    v = (b << 8) | g
    starts = np.concatenate([[0], np.flatnonzero(np.diff(v) != 0) + 1])
    glyph = (b[starts] >= GLYPH_B_MIN) & (b[starts] <= GLYPH_B_MAX)
    if ramp_filter and glyph.any():
        lens = np.diff(np.r_[starts, len(v)])
        min_len = max(2, int(round(lens[glyph].max() / 3)))
        glyph &= lens >= min_len
    vals = v[starts[glyph]]
    if ramp_filter and len(vals):
        # a dropped ramp/jitter run can split one cell in two: merge
        # adjacent surviving runs with the SAME code (true repeated chars
        # always differ in the parity bit, so they never merge)
        vals = vals[np.r_[True, np.diff(vals) != 0]]
    return "".join(chr(int(((int(val) >> 8 & 0x1F) << 8) | (int(val) & 0xFF)))
                   for val in vals)


def decode_crop(crop: np.ndarray) -> str:
    """Glyph decode of a single det crop (the stand-in for CRNN inference)."""
    km = _kernel_mask(crop)
    bb = own_kernel_bbox(km, crop.shape[0] // 2, crop.shape[1] // 2)
    return _cells_text(crop, *bb) if bb else ""


def decode_rec_tensor(tensor: np.ndarray) -> str:
    """Glyph decode from the REAL CRNN input: the crnn-resized,
    REC-normalized (48, W, 3) float32 batch slice, right-padded with zeros.
    This is what a trained recognizer consumes — the pixel stand-in reads
    the same tensor, so the input build is live code, not cost theatre.
    Un-normalizes ((t/2 + 0.5) * 255), masks the zero padding, and reads
    ramp-filtered cell runs (bilinear resampling blurs cell boundaries)."""
    img = (tensor.astype(np.float32) / 2.0 + 0.5) * 255.0
    pad = (img[..., 0] < 0.5) & (img[..., 1] < 0.5) & (img[..., 2] < 0.5)
    km = (img[..., 0] < 200) & ~pad
    width = int((~pad).any(axis=0).sum())
    bb = own_kernel_bbox(km, img.shape[0] // 2, max(width // 2, 0))
    return _cells_text(img, *bb, ramp_filter=True) if bb else ""


def decode_whole_image(raster: np.ndarray) -> str:
    """Whole-image recognition (det disabled): every kernel segment, read in
    band-major top-to-bottom / left-to-right order, joined by spaces."""
    km = _kernel_mask(raster)
    texts = []
    for r0, r1 in _runs(np.flatnonzero(km.any(axis=1))):
        for c0, c1 in _runs(np.flatnonzero(km[r0:r1].any(axis=0))):
            t = _cells_text(raster, r0, r1, c0, c1)
            if t:
                texts.append(t)
    return " ".join(texts)


def cls_probe_tensor(tensor: np.ndarray) -> tuple[int, float]:
    """Classifier probe over the REAL cls input: the cls-resized
    REC-normalized (48, 192, 3) tensor, zero-padded AFTER normalisation
    (pad pixels are exactly 0.0 — no painted integer normalizes to that).
    Un-normalizes and runs the halo-asymmetry probe."""
    img = (tensor.astype(np.float32) / 2.0 + 0.5) * 255.0
    pad = (tensor[..., 0] == 0.0) & (tensor[..., 1] == 0.0) & (tensor[..., 2] == 0.0)
    img[pad] = 255.0  # make padding read as background
    return cls_probe(img)


def cls_probe(crop: np.ndarray) -> tuple[int, float]:
    """Orientation + confidence from the halo asymmetry: label 1 means the
    crop is currently upside-down (the reference's label%2==1 contract).
    Returns (0, 0.0) when the halo is not recoverable (tightly clipped crop)
    — the not-confident branch leaves the crop untouched."""
    km = _kernel_mask(crop)
    bb = own_kernel_bbox(km, crop.shape[0] // 2, crop.shape[1] // 2)
    if bb is None:
        return 0, 0.0
    r0, r1, c0, c1 = bb
    r_ch = crop[..., 0].astype(np.float32)
    g_ch = crop[..., 1].astype(np.float32)
    halo = (crop[..., 0] > 200) & (crop[..., 0] < 240)

    def probe(a_sl, b_sl):
        a_m, b_m = halo[a_sl], halo[b_sl]
        return (r_ch[a_sl][a_m], r_ch[b_sl][b_m],
                np.concatenate([g_ch[a_sl][a_m], g_ch[b_sl][b_m]]))

    # window scales with the kernel so an upscaled (cls-resized) halo is
    # covered, but stays bounded so a neighbouring line's halo (pulled in by
    # the unclip margin) is not; MEDIANS reject the kernel/background blend
    # rows resampling creates at the band edges
    win = max(3, (r1 - r0) // 3)
    # horizontal layout first (halo rows above/below the kernel); a crop the
    # reference rotated 90° has its halo on the SIDES instead — fall back
    a_v, b_v, g_v = probe((slice(max(r0 - win, 0), r0), slice(c0, c1)),
                          (slice(r1, r1 + win), slice(c0, c1)))
    if a_v.size == 0 and b_v.size == 0:
        a_v, b_v, g_v = probe((slice(r0, r1), slice(max(c0 - win, 0), c0)),
                              (slice(r0, r1), slice(c1, c1 + win)))
    if a_v.size == 0 and b_v.size == 0:
        return 0, 0.0
    if a_v.size and b_v.size:
        a, b = float(np.median(a_v)), float(np.median(b_v))
        if abs(a - b) < 1.0:
            return 0, 0.0
        return (0 if a > b else 1), float(np.median(g_v)) / 255.0
    # ONE visible band (a tight det box can unclip past only one halo edge):
    # the band VALUE alone decides — top/left halo paints HALO_TOP_R (212),
    # bottom/right HALO_BOT_R (208); the 210 midpoint splits them and the
    # median rejects resize blend at the band edges
    first = a_v.size > 0
    m = float(np.median(a_v if first else b_v))
    reads_top = m > (HALO_TOP_R + HALO_BOT_R) / 2.0
    return (0 if reads_top == first else 1), float(np.median(g_v)) / 255.0
