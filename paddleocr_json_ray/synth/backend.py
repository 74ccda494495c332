"""Deterministic synthetic model backends (det / cls / rec).

Same interfaces and post-processing math as the real model stages — only the
NN inference itself is synthesized from the SIMG ground truth (SURVEY.md
§7.4: "deterministic synthetic backend, same interfaces, same
post-processing math").  A Paddle/ONNX backend would implement the same
three classes against real tensors.

  * ``SynthDetBackend``  — stands in for DBDetector (cpp/src/ocr_det.cpp:80-166):
    consumes the det-resized input geometry, emits candidate boxes in
    resized-image coordinates with per-box probabilities.
  * ``SynthClsBackend``  — Classifier (cpp/src/ocr_cls.cpp:20-105): per-crop
    angle label + confidence.
  * ``SynthRecBackend``  — CRNN logits (cpp/src/ocr_rec.cpp:20-137): [T, C]
    probability matrix per crop whose greedy-CTC decode yields the crop's
    text; repeats and blanks are woven in deterministically so the decode
    path (P6) is genuinely exercised.
"""

from __future__ import annotations

import numpy as np

from ..functions.ctc import build_label_list


def _hash32(s: str, salt: int = 0) -> int:
    h = 2166136261 ^ salt
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def make_backends(cfg, dict_chars: list[str]):
    """Backend factory — the seam where a real-model backend plugs in.

    ``backend='synthetic'`` returns the deterministic trio below;
    ``backend='paddle'`` is the drop-in slot for Paddle-Inference/ONNX
    weights (``cfg.models_path``), unavailable in this container."""
    if cfg.backend == "paddle":
        raise NotImplementedError(
            "paddle backend requires paddle-inference/onnxruntime + model "
            "weights (cfg.models_path); this environment ships neither — "
            "the synthetic backend exercises the same interfaces and all "
            "pre/post-processing math (SURVEY.md §7.4)")
    det = BitmapDetBackend(cfg) if cfg.backend == "bitmap" else SynthDetBackend()
    return (det, SynthRecBackend(dict_chars),
            SynthClsBackend() if cfg.cls else None)


class SynthDetBackend:
    """Emit (quad, prob, truth_idx) candidates in det-input (resized)
    coordinates straight from the decoded SIMG truth; the det stage then
    runs the real FilterTagDetRes rescale/clamp/min-size path (P5) and
    sorted_boxes (O1) on them."""

    def infer(self, simg, ratio_h: float, ratio_w: float):
        out = []
        for i, b in enumerate(simg.blocks):
            quad = [[p[0] * ratio_w, p[1] * ratio_h] for p in b.quad]
            out.append((quad, float(b.det_prob), i))
        return out


class BitmapDetBackend:
    """DB-style detection through the REAL bitmap post-processing chain
    (functions/db_postprocess.py): render a DB-shrunk probability map from
    the truth, threshold it, and recover boxes via connected components ->
    min-area rect -> score -> unclip — exactly BoxesFromBitmap
    (cpp/src/postprocess_op.cpp:246-321).  Candidates are associated back to
    truth blocks by IoU for the synthetic rec stage."""

    def __init__(self, cfg):
        self.cfg = cfg

    def infer(self, simg, ratio_h: float, ratio_w: float):
        from ..functions.db_postprocess import boxes_from_bitmap, shrink_distance

        cfg = self.cfg
        rh = max(int(round(simg.height * ratio_h)), 1)
        rw = max(int(round(simg.width * ratio_w)), 1)
        pred = np.zeros((rh, rw), dtype=np.float32)
        truth_bboxes = []
        for b in simg.blocks:
            xs = [p[0] * ratio_w for p in b.quad]
            ys = [p[1] * ratio_h for p in b.quad]
            x0, x1 = min(xs), max(xs)
            y0, y1 = min(ys), max(ys)
            truth_bboxes.append((x0, y0, x1, y1))
            d = shrink_distance(x1 - x0, y1 - y0)
            sx0 = int(np.clip(round(x0 + d), 0, rw - 1))
            sx1 = int(np.clip(round(x1 - d), 0, rw))
            sy0 = int(np.clip(round(y0 + d), 0, rh - 1))
            sy1 = int(np.clip(round(y1 - d), 0, rh))
            if sx1 > sx0 and sy1 > sy0:
                np.maximum(pred[sy0:sy1, sx0:sx1], b.det_prob,
                           out=pred[sy0:sy1, sx0:sx1])
        bitmap = pred > cfg.det_db_thresh
        if cfg.use_dilation:
            # 2x2 structuring element dilation (cpp/src/ocr_det.cpp dilation path)
            d = bitmap.copy()
            d[1:, :] |= bitmap[:-1, :]
            d[:, 1:] |= bitmap[:, :-1]
            d[1:, 1:] |= bitmap[:-1, :-1]
            bitmap = d
        cands = boxes_from_bitmap(pred, bitmap, 0.0, cfg.det_db_unclip_ratio,
                                  cfg.det_db_score_mode)
        out = []
        for quad, score in cands:
            qx = [p[0] for p in quad]
            qy = [p[1] for p in quad]
            cb = (min(qx), min(qy), max(qx), max(qy))
            best_idx, best_iou = None, 0.0
            for i, tb in enumerate(truth_bboxes):
                ix0, iy0 = max(cb[0], tb[0]), max(cb[1], tb[1])
                ix1, iy1 = min(cb[2], tb[2]), min(cb[3], tb[3])
                if ix1 <= ix0 or iy1 <= iy0:
                    continue
                inter = (ix1 - ix0) * (iy1 - iy0)
                ua = ((cb[2] - cb[0]) * (cb[3] - cb[1])
                      + (tb[2] - tb[0]) * (tb[3] - tb[1]) - inter)
                i_iou = inter / ua if ua > 0 else 0.0
                if i_iou > best_iou:
                    best_iou, best_idx = i_iou, i
            out.append(([list(map(float, p)) for p in quad], score, best_idx))
        return out


class SynthClsBackend:
    """Angle classifier: flipped crops score high on label 1; a deterministic
    ~10% slice scores below the 0.9 cls_thresh so the not-confident branch
    (crop left unrotated, cpp/src/paddleocr.cpp:126-137) is exercised."""

    def infer(self, texts_flips: list[tuple[str, bool]]):
        labels = np.empty(len(texts_flips), dtype=np.int32)
        scores = np.empty(len(texts_flips), dtype=np.float32)
        for i, (text, flip) in enumerate(texts_flips):
            h = _hash32(text, salt=0xC15)
            low_conf = (h % 10) == 0
            labels[i] = 1 if flip else 0
            scores[i] = 0.80 + (h % 50) / 1000.0 if low_conf else 0.91 + (h % 80) / 1000.0
        return labels, scores


class SynthRecBackend:
    """Builds a [T, C] probability matrix whose greedy decode equals the
    crop's effective text.  Chars absent from the dictionary produce blank
    frames (the real model cannot emit out-of-dict chars either)."""

    def __init__(self, dict_chars: list[str]):
        self.label_list = build_label_list(dict_chars)
        self.char_to_idx = {c: i for i, c in enumerate(self.label_list)}
        self.num_classes = len(self.label_list)

    def logits_for(self, text: str) -> np.ndarray:
        h = _hash32(text, salt=0x2EC)
        frames: list[tuple[int, float]] = [(0, 0.99)]  # leading blank
        prev_idx = 0
        for ci, ch in enumerate(text):
            idx = self.char_to_idx.get(ch, 0)
            conf = 0.90 + ((h >> (ci % 16)) % 90) / 1000.0
            if idx != 0 and idx == prev_idx:
                frames.append((0, 0.98))  # blank to split genuine repeats
            frames.append((idx, conf))
            if (h >> (ci % 8)) & 1 and idx != 0:
                frames.append((idx, conf))  # duplicated frame -> collapse path
            prev_idx = idx
        frames.append((0, 0.99))
        logits = np.full((len(frames), self.num_classes), 1e-4, dtype=np.float32)
        for t, (idx, conf) in enumerate(frames):
            logits[t, idx] = conf
        return logits
