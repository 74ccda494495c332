"""Contract tests for the ONNX real-model backend seam
(stages/onnx_backend.py) with MOCKED sessions — proving the drop-in works
without onnxruntime installed: exact input tensor shapes/dtypes (the builds
of cpp/src/ocr_det.cpp:80-118, ocr_cls.cpp:41-55, ocr_rec.cpp:74-93), the
shared post-processing chain, and the end-to-end rec_blocks flow."""

import math

import numpy as np
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.stages.onnx_backend import (OnnxClsBackend,
                                                    OnnxDetBackend,
                                                    OnnxRecBackend)


class _FakeInput:
    name = "x"


class _FakeSession:
    """Records every input fed to it and returns a canned output."""

    def __init__(self, respond):
        self.respond = respond
        self.seen = []

    def get_inputs(self):
        return [_FakeInput()]

    def run(self, _out, feeds):
        t = feeds["x"]
        self.seen.append(t)
        return [self.respond(t)]


def test_det_contract_shapes_and_postprocess():
    """Det feeds NCHW float32 with H, W multiples of 32; the session's
    probability map flows through the REAL boxes_from_bitmap chain."""
    cfg = PipelineConfig()

    def det_model(t):
        assert t.dtype == np.float32
        assert t.ndim == 4 and t.shape[0] == 1 and t.shape[1] == 3
        assert t.shape[2] % 32 == 0 and t.shape[3] % 32 == 0
        pred = np.zeros((1, 1, t.shape[2], t.shape[3]), dtype=np.float32)
        pred[0, 0, 16:40, 24:120] = 0.95  # one confident text region
        return pred

    sess = _FakeSession(det_model)
    backend = OnnxDetBackend(cfg, session=sess)
    raster = np.full((64, 128, 3), 255, dtype=np.uint8)
    boxes = backend.infer(raster)
    assert len(sess.seen) == 1
    assert len(boxes) == 1
    quad, prob = boxes[0]
    assert prob > 0.9
    xs = [p[0] for p in quad]
    ys = [p[1] for p in quad]
    # unclip expands outward; the box must cover the painted region
    assert min(xs) <= 24 and max(xs) >= 119
    assert min(ys) <= 16 and max(ys) >= 39


def test_cls_contract_batch_and_labels():
    """Cls feeds NCHW float32 [N,3,48,192] (the padded cls build) and maps
    [N,2] probabilities to (labels, scores)."""
    cfg = PipelineConfig()

    def cls_model(t):
        assert t.dtype == np.float32
        assert t.shape[1:] == (3, 48, 192)
        out = np.tile(np.array([[0.2, 0.8]], dtype=np.float32), (t.shape[0], 1))
        out[0] = [0.9, 0.1]  # first crop upright
        return out

    sess = _FakeSession(cls_model)
    backend = OnnxClsBackend(cfg, session=sess)
    from paddleocr_json_ray.functions.imageops import cls_resize_normalize

    crops = [np.full((20, 60, 3), 128, dtype=np.uint8) for _ in range(3)]
    labels, scores = backend.infer([cls_resize_normalize(c) for c in crops])
    assert labels.tolist() == [0, 1, 1]
    assert scores.dtype == np.float32
    assert abs(scores[1] - 0.8) < 1e-6


def _rec_logits_for(text, label_list, T=24):
    """[T, C] logits whose greedy decode is ``text``."""
    C = len(label_list)
    idx = {c: i for i, c in enumerate(label_list)}
    frames = [0]
    for ch in text:
        frames.extend([idx[ch], 0])
    frames.extend([0] * (T - len(frames)))
    logits = np.full((len(frames), C), 1e-4, dtype=np.float32)
    for t, i in enumerate(frames):
        logits[t, i] = 0.97
    return logits


def test_rec_contract_logits_decode():
    """Rec feeds NCHW float32 [1,3,48,W]; the session's CTC logits decode
    through the shared greedy path."""
    cfg = PipelineConfig()
    dict_chars = list("abcdefghij")

    def rec_model(t):
        assert t.dtype == np.float32
        assert t.ndim == 4 and t.shape[:3] == (1, 3, 48)
        return _rec_logits_for("hi", ["#", *dict_chars, " "])[None]

    sess = _FakeSession(rec_model)
    backend = OnnxRecBackend(cfg, dict_chars, session=sess)
    from paddleocr_json_ray.functions.ctc import ctc_greedy_decode
    from paddleocr_json_ray.functions.imageops import (REC_MEAN, REC_SCALE,
                                                       crnn_resize, normalize)

    crop = np.full((30, 90, 3), 200, dtype=np.uint8)
    tensor = normalize(crnn_resize(crop, cfg.rec_img_h, 3.0), REC_MEAN, REC_SCALE)
    logits = backend.logits_from_tensor(tensor)
    text, score = ctc_greedy_decode(logits, backend.label_list)
    assert text == "hi"
    assert not math.isnan(score) and score > 0.9


def test_rec_blocks_uses_onnx_logits_end_to_end():
    """rec_blocks probes logits_from_tensor: with the mocked trio a full
    det-crops-cls-rec pass yields reference-shaped blocks whose text came
    from the session's logits (not the pixel synthesis)."""
    from paddleocr_json_ray.stages.span_ocr import DetItem, rec_blocks

    cfg = PipelineConfig(cls=True, cls_batch_num=2)
    dict_chars = list("hello wrd")
    label_list = ["#", *dict_chars, " "]

    rec_sess = _FakeSession(
        lambda t: _rec_logits_for("hello", label_list)[None])
    cls_sess = _FakeSession(
        lambda t: np.tile(np.array([[0.95, 0.05]], dtype=np.float32),
                          (t.shape[0], 1)))
    rec_backend = OnnxRecBackend(cfg, dict_chars, session=rec_sess)
    cls_backend = OnnxClsBackend(cfg, session=cls_sess)

    items = [DetItem([[2, 2], [60, 2], [60, 18], [2, 18]], 0.9)]
    crops = [np.full((16, 58, 3), 230, dtype=np.uint8)]
    blocks = rec_blocks(items, crops, cfg, rec_backend, cls_backend)
    assert len(blocks) == 1
    assert blocks[0]["text"] == "hello"
    assert blocks[0]["cls_label"] == 0
    assert set(blocks[0]) >= {"box", "score", "text"}
    assert len(rec_sess.seen) == 1 and len(cls_sess.seen) == 1


def test_onnx_backend_without_runtime_raises_clear_error(tmp_path):
    """Without onnxruntime installed, the factory raises an actionable
    error naming the missing dependency (not an opaque ImportError)."""
    import builtins

    real_import = builtins.__import__

    def block_ort(name, *a, **k):
        if name == "onnxruntime":
            raise ImportError("No module named 'onnxruntime'")
        return real_import(name, *a, **k)

    cfg = PipelineConfig(backend="onnx", models_path=str(tmp_path))
    from paddleocr_json_ray.synth.backend import make_backends

    import unittest.mock as mock

    with mock.patch.object(builtins, "__import__", side_effect=block_ort):
        with pytest.raises(RuntimeError, match="onnxruntime"):
            make_backends(cfg, list("ab"))
