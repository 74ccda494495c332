"""Real-model ONNX backends for the det / cls / rec stages — the proven
drop-in seam behind ``make_backends(cfg)`` (``cfg.backend='onnx'``).

The pixel backends (synth/backend.py) stand in for the NN forward pass with
an exactly-decodable raster code; these classes run the SAME stage
interfaces against an ONNX Runtime session over exported PaddleOCR weights,
with identical input tensor builds and identical post-processing:

  * ``OnnxDetBackend``   — DBDetector forward (cpp/src/ocr_det.cpp:80-166):
    det-resized raster -> ImageNet-normalized NCHW float32 [1,3,H,W]
    (H, W multiples of 32) -> session -> probability map [1,1,H,W] ->
    the REAL bitmap chain (functions/db_postprocess ==
    cpp/src/postprocess_op.cpp:246-321).
  * ``OnnxClsBackend``   — angle classifier (cpp/src/ocr_cls.cpp:20-105):
    list of cls-resized normalized HWC tensors -> NCHW [N,3,48,192] ->
    session -> [N,2] probabilities -> (argmax labels, max scores).
  * ``OnnxRecBackend``   — CRNN (cpp/src/ocr_rec.cpp:20-137): crnn-resized
    normalized HWC tensor -> NCHW [1,3,48,W] -> session -> CTC logits
    [T, num_classes]; the stage's shared greedy decode (P6) consumes them
    via ``logits_from_tensor`` (the capability probe rec_blocks branches
    on).

Sessions are injectable (tests/test_onnx_backend.py keeps mocked-session
contract tests asserting the exact tensor shapes/dtypes exported Paddle
models take); when no session is passed, ``_load_session`` uses
onnxruntime if installed and otherwise the pure-numpy ONNX evaluator
(functions/onnx_numpy) — so backend='onnx' executes REAL serialized
.onnx files in this environment too.  synth/onnx_models.py builds tiny
real graphs whose det head is proven box- and score-exact against the
pixel backend end-to-end through the Ray pipeline.

Model files are looked up under ``cfg.models_path`` with the reference's
config-key naming (det/cls/rec model dirs, api/python/PPOCR_api.py usage):
``det.onnx``, ``cls.onnx``, ``rec.onnx``.
"""

from __future__ import annotations

import os

import numpy as np

from ..functions.ctc import build_label_list
from ..functions.imageops import DET_MEAN, DET_SCALE, normalize, to_chw


def _load_session(model_path: str):
    """Session factory: onnxruntime when installed, else the pure-numpy
    ONNX evaluator (functions/onnx_numpy.NumpyOnnxSession) — so
    backend='onnx' runs REAL serialized model files in both environments.
    The numpy fallback covers the op set tiny exported graphs use; a model
    needing more raises NotImplementedError naming the op."""
    if not os.path.isfile(model_path):
        raise FileNotFoundError(f"ONNX model not found: {model_path}")
    try:
        import onnxruntime  # type: ignore
    except ImportError:
        from ..functions.onnx_numpy import NumpyOnnxSession

        return NumpyOnnxSession(model_path)
    return onnxruntime.InferenceSession(
        model_path, providers=["CPUExecutionProvider"])


def _run(session, tensor: np.ndarray) -> np.ndarray:
    """Feed the session's (single) input, return its first output."""
    name = session.get_inputs()[0].name
    return session.run(None, {name: tensor})[0]


class OnnxDetBackend:
    """DB text detector over a real ONNX session.  ``infer`` consumes the
    det-resized raster the stage already built (M1) and returns (quad,
    prob) candidates in det-input coordinates — identical contract to
    PixelDetBackend, so det_items' FilterTagDetRes path is shared."""

    def __init__(self, cfg, session=None):
        self.cfg = cfg
        self.session = session if session is not None else _load_session(
            os.path.join(cfg.models_path, "det.onnx"))

    def infer(self, resized_raster: np.ndarray):
        from ..functions.db_postprocess import boxes_from_bitmap

        cfg = self.cfg
        # the real det input build: /255, ImageNet mean/scale, HWC->CHW,
        # leading batch dim (cpp/src/ocr_det.cpp:80-118)
        tensor = to_chw(normalize(resized_raster, DET_MEAN, DET_SCALE))[None]
        assert tensor.dtype == np.float32
        assert tensor.shape[2] % 32 == 0 and tensor.shape[3] % 32 == 0
        pred = _run(self.session, tensor)
        pred = np.asarray(pred, dtype=np.float32).reshape(
            pred.shape[-2], pred.shape[-1])
        bitmap = pred > cfg.det_db_thresh
        if cfg.use_dilation:
            d = bitmap.copy()
            d[1:, :] |= bitmap[:-1, :]
            d[:, 1:] |= bitmap[:, :-1]
            d[1:, 1:] |= bitmap[:-1, :-1]
            bitmap = d
        return boxes_from_bitmap(pred, bitmap, 0.0, cfg.det_db_unclip_ratio,
                                 cfg.det_db_score_mode)


class OnnxClsBackend:
    """Angle classifier over a real ONNX session.  ``infer`` consumes the
    list of cls-resized normalized HWC tensors the stage built (M5 + M2 +
    pad) — identical contract to PixelClsBackend."""

    def __init__(self, cfg, session=None):
        self.cfg = cfg
        self.session = session if session is not None else _load_session(
            os.path.join(cfg.models_path, "cls.onnx"))

    def infer(self, tensors: list[np.ndarray]):
        batch = np.stack([to_chw(t) for t in tensors])  # [N,3,48,192]
        assert batch.dtype == np.float32
        probs = np.asarray(_run(self.session, batch), dtype=np.float32)
        labels = probs.argmax(axis=1).astype(np.int32)
        scores = probs.max(axis=1).astype(np.float32)
        return labels, scores


class OnnxRecBackend:
    """CRNN recognizer over a real ONNX session.  Exposes
    ``logits_from_tensor`` — the richer capability rec_blocks probes for —
    so the model's own CTC logits flow into the shared greedy decode
    instead of the pixel backend's text->logits synthesis."""

    def __init__(self, cfg, dict_chars: list[str], session=None):
        self.cfg = cfg
        self.label_list = build_label_list(dict_chars)
        self.num_classes = len(self.label_list)
        self.session = session if session is not None else _load_session(
            os.path.join(cfg.models_path, "rec.onnx"))

    def logits_from_tensor(self, tensor: np.ndarray) -> np.ndarray:
        """crnn-resized normalized HWC tensor -> [T, num_classes] logits."""
        nchw = to_chw(np.ascontiguousarray(tensor, dtype=np.float32))[None]
        assert nchw.dtype == np.float32 and nchw.ndim == 4
        out = np.asarray(_run(self.session, nchw), dtype=np.float32)
        return out.reshape(out.shape[-2], out.shape[-1])

    def read_crop(self, crop: np.ndarray, whole_image: bool = False) -> str:
        raise NotImplementedError(
            "whole-image recognition (det=False) is a pixel-backend mode; "
            "the onnx backend recognizes det crops only — enable detection "
            "or use backend='pixel'")


def make_onnx_backends(cfg, dict_chars: list[str]):
    """(det, rec, cls-or-None) trio over real sessions — the factory
    ``synth.backend.make_backends`` dispatches to for backend='onnx'."""
    if not cfg.det and cfg.rec:
        # fail at factory time, not deep inside an actor: whole-image
        # recognition (det=False) reads raster kernel bands — a
        # pixel-backend capability with no CRNN equivalent
        raise ValueError(
            "backend='onnx' requires det=True when rec is enabled "
            "(whole-image recognition is pixel-backend only)")
    return (OnnxDetBackend(cfg),
            OnnxRecBackend(cfg, dict_chars),
            OnnxClsBackend(cfg) if cfg.cls else None)
