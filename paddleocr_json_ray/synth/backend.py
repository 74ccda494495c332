"""Deterministic pixel-driven model backends (det / cls / rec).

Same interfaces and post-processing math as the real model stages; the NN
forward pass is replaced by an exactly-decodable pixel code (synth/pixelcode)
— **the rendered raster is the only information channel**.  A Paddle/ONNX
backend would implement the same three classes against real tensors
(``cfg.backend='paddle'`` is the seam; this container ships no NN runtime).

  * ``PixelDetBackend`` — stands in for DBDetector
    (cpp/src/ocr_det.cpp:80-166): consumes the det-resized raster (the real
    ResizeImgType0 output, M1), reconstructs the probability map from the R
    channel, and recovers candidate boxes through the REAL bitmap chain —
    threshold -> connected components -> minAreaRect -> score -> unclip
    (functions/db_postprocess == cpp/src/postprocess_op.cpp:246-321).
  * ``PixelClsBackend`` — Classifier (cpp/src/ocr_cls.cpp:20-105): reads the
    halo-asymmetry orientation cue + painted confidence from each crop.
  * ``PixelRecBackend`` — CRNN (cpp/src/ocr_rec.cpp:20-137): decodes the
    glyph cells from the warped crop raster, then emits a [T, C] probability
    matrix whose greedy-CTC decode yields that text; repeats and blanks are
    woven in deterministically so the decode path (P6) is genuinely
    exercised, and out-of-dictionary characters fall to blank frames (a real
    model cannot emit them either).
"""

from __future__ import annotations

import numpy as np

from ..functions.ctc import build_label_list
from . import pixelcode


def make_backends(cfg, dict_chars: list[str]):
    """Backend factory — the seam where a real-model backend plugs in.

    ``backend='pixel'`` returns the pixel-driven trio below;
    ``backend='onnx'`` loads real exported weights from ``cfg.models_path``
    through stages/onnx_backend (import-guarded; the seam is contract-
    tested with a mocked session in tests/test_onnx_backend.py);
    ``backend='paddle'`` is the Paddle-Inference slot, unavailable here."""
    if cfg.backend == "onnx":
        from ..stages.onnx_backend import make_onnx_backends

        return make_onnx_backends(cfg, dict_chars)
    if cfg.backend == "paddle":
        raise NotImplementedError(
            "paddle backend requires paddle-inference + model weights "
            "(cfg.models_path); this environment ships neither — use "
            "backend='onnx' for exported weights, or the pixel backend "
            "which exercises the same interfaces and all pre/post-"
            "processing math (SURVEY.md §7.4)")
    return (PixelDetBackend(cfg), PixelRecBackend(dict_chars),
            PixelClsBackend() if cfg.cls else None)


class PixelDetBackend:
    """Emit (quad, prob) candidates in det-input (resized) coordinates by
    running the real DB post-processing chain over the probability map
    reconstructed from the resized raster; the det stage then applies
    FilterTagDetRes rescale/clamp/min-size (P5) and sorted_boxes (O1)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def infer(self, resized_raster: np.ndarray):
        from ..functions.db_postprocess import boxes_from_bitmap

        cfg = self.cfg
        pred = pixelcode.pred_from_raster(resized_raster)
        bitmap = pred > cfg.det_db_thresh
        if cfg.use_dilation:
            # 2x2 structuring element dilation (cpp/src/ocr_det.cpp dilation path)
            d = bitmap.copy()
            d[1:, :] |= bitmap[:-1, :]
            d[:, 1:] |= bitmap[:, :-1]
            d[1:, 1:] |= bitmap[:-1, :-1]
            bitmap = d
        return boxes_from_bitmap(pred, bitmap, 0.0, cfg.det_db_unclip_ratio,
                                 cfg.det_db_score_mode)


class PixelClsBackend:
    """Angle classifier over the REAL cls input tensors (ClsResizeImg +
    Normalize + zero-pad, cpp/src/ocr_cls.cpp:41-55): halo asymmetry gives
    the orientation label (1 = currently upside-down), the painted halo G
    value the confidence.  ~10% of blocks are rendered below the 0.9
    cls_thresh so the not-confident branch (crop left unrotated,
    cpp/src/paddleocr.cpp:126-137) is exercised."""

    def infer(self, tensors: list[np.ndarray]):
        labels = np.empty(len(tensors), dtype=np.int32)
        scores = np.empty(len(tensors), dtype=np.float32)
        for i, t in enumerate(tensors):
            labels[i], scores[i] = pixelcode.cls_probe_tensor(t)
        return labels, scores


class PixelRecBackend:
    """Crop raster -> text via the glyph-cell decode, then a [T, C]
    probability matrix whose greedy decode equals that text.  Chars absent
    from the dictionary produce blank frames."""

    def __init__(self, dict_chars: list[str]):
        self.label_list = build_label_list(dict_chars)
        self.char_to_idx = {c: i for i, c in enumerate(self.label_list)}
        self.num_classes = len(self.label_list)

    def read_crop(self, crop: np.ndarray, whole_image: bool = False) -> str:
        if whole_image:
            return pixelcode.decode_whole_image(crop)
        return pixelcode.decode_crop(crop)

    def read_tensor(self, tensor: np.ndarray) -> str:
        """Decode from the crnn-resized normalized batch slice — the real
        model input (cpp/src/ocr_rec.cpp:74-93's resize+normalize output)."""
        return pixelcode.decode_rec_tensor(tensor)

    def logits_for(self, text: str) -> np.ndarray:
        h = pixelcode._hash32(text, salt=0x2EC)
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
