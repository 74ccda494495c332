"""Per-span OCR math shared by the Ray actor stages and the golden oracle.

This module holds the *geometry/decode* semantics — everything that
determines output values.  The Ray stages add the physical execution around
it (Arrow batches, actor state); the oracle calls these functions
sequentially.  Both paths are PIXEL-DRIVEN: the rendered raster flows
through the real resize kernel into the det backend, crops are warped out
of the raster by the real perspective kernel, and cls/rec read only those
crop pixels (synth/pixelcode) — no ground-truth side channel.

Reference semantics carried here:
  * media-ref resolution with the error-code contract
    (path codes 200/202/203 — cpp/src/task_linux.cpp:67-122; base64 codes
    300/301 — cpp/src/task.cpp:111-138);
  * det post: BoxesFromBitmap int rounding + clamp to the det input,
    FilterTagDetRes clockwise ordering, truncating rescale by 1/ratio, clamp
    to [0, orig-1], drop boxes with int side <= 4
    (cpp/src/postprocess_op.cpp:246-352);
  * sorted_boxes ordering (O1);
  * crop shape + >=1.5 aspect rotation (M6, cpp/src/utility.cpp:163-221);
  * cls flip decision label%2==1 && score>cls_thresh
    (cpp/src/paddleocr.cpp:126-137);
  * rec aspect-ratio micro-batching (O2) + CTC greedy decode with NaN skip
    (P6, cpp/src/ocr_rec.cpp:94-132);
  * sink filters: drop empty-box rows when det is on, drop score<=0 / empty
    text when rec is on (M9, cpp/src/task.cpp:73-90); empty result => code
    101 (cpp/src/task.cpp:101-105).
"""

from __future__ import annotations

import base64
import math
import os
from typing import NamedTuple

import numpy as np

from .. import errors
from ..config import PipelineConfig
from ..functions.ctc import aspect_ratio_argsort, ctc_greedy_decode
from ..functions.geometry import get_rotate_crop_image, order_points_clockwise, sorted_boxes_order
from ..functions.imageops import det_resize_shape, resize_image
from ..functions.layout import PARSERS, render_text
from ..synth import imaging
from ..synth.backend import PixelClsBackend, PixelDetBackend, PixelRecBackend


def _roundf(x: float) -> int:
    """C roundf: half away from zero (Python round() is half-to-even)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


class ResolvedMedia(NamedTuple):
    code: int
    msg: str
    payload: bytes | None
    path: str  # for MSG_OK_NONE parity ("" for base64 refs)


def resolve_media_ref(ref: str) -> ResolvedMedia:
    """media_ref -> payload bytes with the reference's error-code contract.

    ``b64:<data>`` is the image_base64 path, ``file:<path>`` the image_path
    path; anything else is a no-valid-task error (cpp/src/task.cpp:141-212).
    """
    if ref.startswith("b64:"):
        try:
            payload = base64.b64decode(ref[4:], validate=True)
        except Exception:
            return ResolvedMedia(errors.CODE_ERR_BASE64_DECODE, errors.MSG_BASE64_DECODE, None, "")
        return ResolvedMedia(0, "", payload, "")
    if ref.startswith("file:"):
        path = ref[5:]
        if not os.path.exists(path):
            return ResolvedMedia(errors.CODE_ERR_PATH_EXIST, errors.msg_path_exist(path), None, path)
        try:
            with open(path, "rb") as fh:
                payload = fh.read()
        except OSError:
            return ResolvedMedia(errors.CODE_ERR_PATH_READ, errors.msg_path_read(path), None, path)
        return ResolvedMedia(0, "", payload, path)
    return ResolvedMedia(errors.CODE_ERR_NO_TASK, errors.MSG_NO_TASK, None, "")


def raster_for_payload(payload: bytes):
    """Payload bytes -> uint8 HxWx3 raster, or None if undecodable.  SIMG
    payloads render the pixel-coded raster; PNG/BMP payloads decode natively
    (functions/imagecodecs — the reference accepts any cv2-sniffable format,
    cpp/src/task_linux.cpp:67-122)."""
    simg = imaging.decode(payload)
    if simg is not None:
        return imaging.render_raster(simg, imaging.raster_seed(payload))
    from ..functions.imagecodecs import decode_image

    return decode_image(payload)


def decode_payload(payload: bytes, path: str):
    """imdecode equivalent; returns (code, msg, raster).  Failure code
    differs by source kind (203 for paths, 301 for base64)."""
    raster = raster_for_payload(payload)
    if raster is None:
        if path:
            return errors.CODE_ERR_PATH_DECODE, errors.msg_path_decode(path), None
        return errors.CODE_ERR_BASE64_IM_DECODE, errors.MSG_BASE64_IM_DECODE, None
    return 0, "", raster


class DetItem(NamedTuple):
    quad: list          # 4x2 int, TL,TR,BR,BL
    det_score: float


def det_items(raster, cfg: PipelineConfig,
              backend: PixelDetBackend) -> list[DetItem]:
    """Detection candidates -> filtered, reference-ordered box items.

    Runs the real det input build (ResizeImgType0, M1) on the raster, feeds
    the resized raster to the backend (the stand-in for the DB forward
    pass), then the shared FilterTagDetRes path (P5) + sorted_boxes (O1)."""
    h, w = raster.shape[:2]
    resize_h, resize_w, ratio_h, ratio_w = det_resize_shape(h, w, cfg.limit_side_len)
    resized = resize_image(raster, resize_h, resize_w)
    survivors: list[DetItem] = []
    for quad, prob in backend.infer(resized):
        if prob < cfg.det_db_box_thresh:
            continue
        # BoxesFromBitmap int rounding (roundf = half away from zero, NOT
        # Python's banker's rounding), clamp to det-input extent
        int_quad = [[int(min(max(_roundf(x), 0), resize_w)),
                     int(min(max(_roundf(y), 0), resize_h))]
                    for x, y in quad]
        # FilterTagDetRes: order, truncating rescale, clamp to source extent
        oq = order_points_clockwise(int_quad)
        oq = [[int(min(max(int(x / ratio_w), 0), w - 1)), int(min(max(int(y / ratio_h), 0), h - 1))]
              for x, y in oq]
        side_w = int(math.sqrt((oq[0][0] - oq[1][0]) ** 2 + (oq[0][1] - oq[1][1]) ** 2))
        side_h = int(math.sqrt((oq[0][0] - oq[3][0]) ** 2 + (oq[0][1] - oq[3][1]) ** 2))
        if side_w <= 4 or side_h <= 4:
            continue
        survivors.append(DetItem(oq, float(prob)))
    order = sorted_boxes_order([it.quad for it in survivors])
    return [survivors[i] for i in order]


EMPTY_BOX = [[-1, -1], [-1, -1], [-1, -1], [-1, -1]]


def items_for_raster(raster, cfg: PipelineConfig,
                     backend: PixelDetBackend) -> list[DetItem]:
    """Det-enabled: full det path.  Det-disabled: the whole image becomes one
    crop with the empty-box sentinel (cpp/src/task.cpp:73-81); whole-image
    recognition then reads every kernel segment of the raster in order."""
    if cfg.det:
        return det_items(raster, cfg, backend)
    return [DetItem([list(p) for p in EMPTY_BOX], 1.0)]


def crops_for_items(raster, items: list[DetItem], cfg: PipelineConfig) -> list:
    """Perspective-warp each det quad out of the raster (M6); det-disabled
    passes the whole raster as the single 'crop'."""
    if not cfg.det:
        return [raster for _ in items]
    return [get_rotate_crop_image(raster, it.quad) for it in items]


def crop_shape(quad) -> tuple[int, int, bool]:
    """(width, height, rotated90) of the perspective crop for ``quad`` —
    analytically identical to get_rotate_crop_image's output shape."""
    q = np.asarray(quad, dtype=np.float64)
    cw = max(int(max(np.linalg.norm(q[0] - q[1]), np.linalg.norm(q[2] - q[3]))), 1)
    ch = max(int(max(np.linalg.norm(q[0] - q[3]), np.linalg.norm(q[1] - q[2]))), 1)
    if ch >= cw * 1.5:
        return ch, cw, True
    return cw, ch, False


def rec_blocks(items: list[DetItem], crops: list, cfg: PipelineConfig,
               rec_backend: PixelRecBackend,
               cls_backend: PixelClsBackend | None) -> list[dict]:
    """cls + rec over the ordered det items and their warped crops; returns
    reference-shaped block dicts after the sink filters (M9/M10).  Crops are
    the only information channel: cls reads the orientation cue from pixels
    and physically rotates the crop 180° on a confident hit
    (cpp/src/paddleocr.cpp:126-137); rec decodes the corrected pixels."""
    n = len(items)
    texts = [""] * n
    scores = [-1.0] * n
    cls_labels = [-1] * n
    cls_scores = [0.0] * n

    crops = list(crops)
    if cfg.cls and cls_backend is not None and n:
        from ..functions.imageops import cls_resize_normalize

        # cls runs in micro-batches of cls_batch_num (default 1,
        # cpp/src/args.cpp:57) — batching never changes per-crop results.
        # The backend consumes the real cls input build (M5 + M2 + pad).
        for beg in range(0, n, max(cfg.cls_batch_num, 1)):
            chunk = crops[beg:beg + max(cfg.cls_batch_num, 1)]
            labels, conf = cls_backend.infer([cls_resize_normalize(c) for c in chunk])
            for off in range(len(chunk)):
                i = beg + off
                cls_labels[i] = int(labels[off])
                cls_scores[i] = float(conf[off])
                if labels[off] % 2 == 1 and conf[off] > cfg.cls_thresh:
                    crops[i] = np.ascontiguousarray(np.rot90(crops[i], 2))

    if cfg.rec and n:
        from ..functions.imageops import REC_MEAN, REC_SCALE, crnn_resize, normalize

        ratios = [c.shape[1] / max(c.shape[0], 1) for c in crops]
        order = aspect_ratio_argsort(ratios)
        for beg in range(0, n, cfg.rec_batch_num):
            chunk = order[beg:beg + cfg.rec_batch_num]
            if cfg.det:
                # the REAL rec input build (M4 + M2): aspect-grouped resize
                # to (rec_img_h, batch_w) + normalize; the pixel backend
                # decodes THIS tensor (cpp/src/ocr_rec.cpp:74-93)
                max_ratio = max(ratios[pos] for pos in chunk)
                batch_t = np.stack([
                    normalize(crnn_resize(crops[pos], cfg.rec_img_h, max_ratio),
                              REC_MEAN, REC_SCALE) for pos in chunk])
            for off, pos in enumerate(chunk):
                if cfg.det and hasattr(rec_backend, "logits_from_tensor"):
                    # real-model backends (onnx) emit CTC logits directly
                    logits = rec_backend.logits_from_tensor(batch_t[off])
                elif cfg.det:
                    raw = rec_backend.read_tensor(batch_t[off])
                    logits = rec_backend.logits_for(raw)
                else:  # whole-image mode reads the raster's kernel bands
                    raw = rec_backend.read_crop(crops[pos], whole_image=True)
                    logits = rec_backend.logits_for(raw)
                text, score = ctc_greedy_decode(logits, rec_backend.label_list)
                if math.isnan(score):
                    continue  # slot stays empty (cpp/src/ocr_rec.cpp:124-127)
                texts[pos] = text
                scores[pos] = score

    blocks = []
    for i, it in enumerate(items):
        if cfg.rec and (scores[i] <= 0 or texts[i] == ""):
            continue  # cpp/src/task.cpp:82-90
        blk = {"box": [list(p) for p in it.quad],
               "score": scores[i] if cfg.rec else float(it.det_score),
               "text": texts[i]}
        if cls_labels[i] != -1:
            blk["cls_label"] = cls_labels[i]
            blk["cls_score"] = cls_scores[i]
        blocks.append(blk)
    return blocks


def ocr_media_ref(ref: str, cfg: PipelineConfig,
                  det_backend: PixelDetBackend,
                  rec_backend: PixelRecBackend,
                  cls_backend: PixelClsBackend | None) -> tuple[int, str, list[dict], str]:
    """Full single-span OCR: returns (code, msg, blocks-with-end, text).

    This is the oracle's entry point; the Ray pipeline computes the same
    values via the staged det/rec actors.  Render -> det over the resized
    raster -> warp crops -> cls/rec over crop pixels: the struct is dead
    after rendering."""
    resolved = resolve_media_ref(ref)
    if resolved.code != 0:
        return resolved.code, resolved.msg, [], ""
    code, msg, raster = decode_payload(resolved.payload, resolved.path)
    if code != 0:
        return code, msg, [], ""
    items = items_for_raster(raster, cfg, det_backend)
    crops = crops_for_items(raster, items, cfg)
    blocks = rec_blocks(items, crops, cfg, rec_backend, cls_backend)
    if not blocks:
        return errors.CODE_OK_NONE, errors.msg_ok_none(resolved.path), [], ""
    if cfg.rec and cfg.det:
        # layout parse needs text AND geometry: rec-off blocks are box-only,
        # det-off emits the whole-image sentinel box with no layout to sort
        blocks = PARSERS[cfg.parser](blocks)
    return errors.CODE_OK, "", blocks, render_text(blocks)
