"""Image preprocessing kernels (M1-M5) — numpy only (no OpenCV in this
environment; nearest/bilinear resampling implemented directly).

  * ``det_resize_shape``/``resize_image`` — ResizeImgType0: cap the longest
    side at ``limit_side_len``, round H and W to multiples of 32, keep the
    (ratio_h, ratio_w) pair for box rescaling (cpp/src/preprocess_op.cpp:56-91).
  * ``normalize`` — x/255 then per-channel (x-mean)*scale
    (cpp/src/preprocess_op.cpp:40-54); det uses ImageNet stats
    (cpp/include/ocr_det.h:89-90), cls/rec use 0.5/0.5
    (cpp/include/ocr_rec.h:75-76).
  * ``to_chw`` — HWC->CHW float32 (cpp/src/preprocess_op.cpp:19-38).
  * ``crnn_resize`` — resize a crop to (48, W) with W from the batch max
    w/h ratio, right-pad (cpp/src/preprocess_op.cpp:93-116).
"""

from __future__ import annotations

import numpy as np

DET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
DET_SCALE = np.array([1 / 0.229, 1 / 0.224, 1 / 0.225], dtype=np.float32)
REC_MEAN = np.array([0.5, 0.5, 0.5], dtype=np.float32)
REC_SCALE = np.array([2.0, 2.0, 2.0], dtype=np.float32)


def det_resize_shape(h: int, w: int, limit_side_len: int = 960) -> tuple[int, int, float, float]:
    """Target (resize_h, resize_w, ratio_h, ratio_w) for the det input."""
    ratio = 1.0
    if max(h, w) > limit_side_len:
        ratio = limit_side_len / h if h > w else limit_side_len / w
    resize_h = max(int(round(int(h * ratio) / 32) * 32), 32)
    resize_w = max(int(round(int(w * ratio) / 32) * 32), 32)
    return resize_h, resize_w, resize_h / h, resize_w / w


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, vectorized numpy (HxW or HxWxC), separable: blend
    along y first, then x — half the gathers of the naive 4-corner form."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    f = img.astype(np.float32)
    # blends run as in-place chains (t = a*(1-w); t += b*w) — identical
    # expression tree to a*(1-w) + b*w, so bit-identical, fewer temporaries
    if out_h != h:
        ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)[:, None]
        if img.ndim == 3:
            wy = wy[..., None]
        t = f[y0]
        t *= (1 - wy)
        u = f[y1]
        u *= wy
        t += u
        f = t
    if out_w != w:
        xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)[None, :]
        if img.ndim == 3:
            wx = wx[..., None]
        t = f[:, x0]
        t *= (1 - wx)
        u = f[:, x1]
        u *= wx
        t += u
        f = t
    # round, don't truncate: a blend of equal integers can land at v-1e-7
    # and truncation would bias exact plateaus down by one
    return np.rint(f).astype(img.dtype) if np.issubdtype(img.dtype, np.integer) else f


def normalize(img: np.ndarray, mean: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """uint8 HxWx3 -> float32 normalized.  In-place op chain (one
    allocation); the op ORDER matches the original ``(x/255 - mean) *
    scale`` expression exactly, so results are bit-identical (pixel-golden
    stability depends on that)."""
    out = img.astype(np.float32)
    out /= 255.0
    out -= mean
    out *= scale
    return out


def to_chw(img: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(img.transpose(2, 0, 1))


def cls_resize_normalize(crop: np.ndarray, img_h: int = 48, img_w: int = 192) -> np.ndarray:
    """ClsResizeImg + Normalize + right-pad (M5, cpp/src/preprocess_op.cpp:118-135
    + cpp/src/ocr_cls.cpp:41-55): resize to height ``img_h`` with width
    min(ceil(img_h*ratio), img_w), normalize with the 0.5/0.5 stats, THEN
    pad with zeros to ``img_w`` — the reference pads AFTER normalising, so
    the pad value is 0.0 in normalized space (unlike the rec build)."""
    h, w = crop.shape[:2]
    ratio = w / float(max(h, 1))
    resize_w = img_w if int(np.ceil(img_h * ratio)) > img_w else int(np.ceil(img_h * ratio))
    resized = resize_image(crop, img_h, max(resize_w, 1))
    norm = normalize(resized, REC_MEAN, REC_SCALE)
    if norm.shape[1] < img_w:
        pad = np.zeros((img_h, img_w - norm.shape[1], 3), dtype=np.float32)
        norm = np.concatenate([norm, pad], axis=1)
    return norm


def crnn_resize(crop: np.ndarray, img_h: int, max_wh_ratio: float) -> np.ndarray:
    """Resize a crop to (img_h, ceil(img_h*ratio)) capped at the batch width
    img_h*max_wh_ratio, right-padded with zeros to the batch width."""
    h, w = crop.shape[:2]
    batch_w = int(img_h * max_wh_ratio)
    ratio = w / float(h)
    resize_w = batch_w if int(np.ceil(img_h * ratio)) > batch_w else int(np.ceil(img_h * ratio))
    resize_w = max(resize_w, 1)
    resized = resize_image(crop, img_h, resize_w)
    if resize_w < batch_w:
        pad = np.zeros((img_h, batch_w - resize_w) + crop.shape[2:], dtype=resized.dtype)
        resized = np.concatenate([resized, pad], axis=1)
    return resized
