"""Tiny REAL ONNX model graphs for the backend seam (stages/onnx_backend).

These are actual serialized ONNX files (built with functions/onnx_numpy's
protobuf writer, runnable by onnxruntime or the numpy session) whose
weights are CONSTRUCTED, not trained:

* ``det.onnx`` — a 1x1 Conv + Clip that analytically inverts the det input
  build: the pipeline feeds ``(x/255 - mean) * (1/std)`` (M2,
  cpp/src/ocr_det.cpp:80-118) and the pixelcode raster carries the DB
  probability map in the R channel as ``pred = (KERNEL_R_BASE - R) /
  KERNEL_R_SPAN`` (synth/pixelcode.py).  Composing the two affine maps
  gives a single conv weight/bias, so a REAL conv forward emits the same
  probability map a trained DB head would; a Mul/Round/Div dequantization
  tail snaps the conv's float noise back onto the exact 1/KERNEL_R_SPAN
  grid (R is uint8), making the output BIT-EQUAL to the pixel path —
  det boxes and scores from this model match the pixel backend's
  end-to-end exactly (tests/test_onnx_backend.py).

* ``cls.onnx`` — GlobalAveragePool -> Flatten -> Gemm -> Softmax emitting
  a constant confident "upright" [0.9, 0.1]: real graph execution with
  the exporter's [N,2] contract (cpp/src/ocr_cls.cpp:20-105).

* ``rec.onnx`` — AveragePool (48x4 columns) -> Reshape -> Transpose ->
  MatMul + Add producing input-dependent CTC logits [T, num_classes]
  (cpp/src/ocr_rec.cpp:20-137's output contract).  The weights are a
  seeded random projection: the logits are arbitrary but deterministic,
  which is enough to prove the serialized-model shape/dtype path (greedy
  decode consumes them through ``logits_from_tensor``).
"""

from __future__ import annotations

import os

import numpy as np

from ..functions.imageops import DET_MEAN, DET_SCALE
from ..functions.onnx_numpy import (model_proto, node_proto, tensor_proto,
                                    value_info)
from . import pixelcode

FLOAT = 1


def det_model_bytes() -> bytes:
    std_r = 1.0 / float(DET_SCALE[0])
    mean_r = float(DET_MEAN[0])
    w = np.zeros((1, 3, 1, 1), dtype=np.float32)
    w[0, 0, 0, 0] = -(255.0 * std_r) / pixelcode.KERNEL_R_SPAN
    b = np.array([(pixelcode.KERNEL_R_BASE - 255.0 * mean_r)
                  / pixelcode.KERNEL_R_SPAN], dtype=np.float32)
    # Dequantization tail: R is uint8, so the true probability map is
    # quantized at 1/KERNEL_R_SPAN steps — Mul/Round/Div snaps the conv's
    # float noise (~1e-6) back onto the exact grid, making the model's
    # output BIT-EQUAL to the pixel path's f32((BASE - R) / SPAN) at
    # every pixel (so boxes AND scores match exactly, no threshold-seam
    # epsilon needed on either det_db_thresh or box_thresh).
    span = np.float32(pixelcode.KERNEL_R_SPAN).reshape(())
    nodes = [
        node_proto("Conv", ["x", "w", "b"], ["lin"], name="head",
                   kernel_shape=[1, 1], strides=[1, 1], pads=[0, 0, 0, 0]),
        node_proto("Mul", ["lin", "span"], ["k_approx"]),
        node_proto("Round", ["k_approx"], ["k"]),
        node_proto("Div", ["k", "span"], ["deq"]),
        node_proto("Clip", ["deq", "lo", "hi"], ["prob"], name="clip"),
    ]
    inits = [tensor_proto("w", w), tensor_proto("b", b),
             tensor_proto("span", span),
             tensor_proto("lo", np.float32(0.0).reshape(())),
             tensor_proto("hi", np.float32(1.0).reshape(()))]
    return model_proto(
        nodes,
        [value_info("x", FLOAT, [1, 3, "H", "W"])],
        [value_info("prob", FLOAT, [1, 1, "H", "W"])],
        inits, graph_name="tiny_db_det")


def cls_model_bytes(p_upright: float = 0.9) -> bytes:
    w = np.zeros((2, 3), dtype=np.float32)
    b = np.log(np.array([p_upright, 1.0 - p_upright], dtype=np.float32))
    nodes = [
        node_proto("GlobalAveragePool", ["x"], ["gap"]),
        node_proto("Flatten", ["gap"], ["flat"], axis=1),
        node_proto("Gemm", ["flat", "w", "b"], ["logits"], transB=1),
        node_proto("Softmax", ["logits"], ["prob"], axis=1),
    ]
    inits = [tensor_proto("w", w), tensor_proto("b", b.astype(np.float32))]
    return model_proto(
        nodes,
        [value_info("x", FLOAT, ["N", 3, 48, 192])],
        [value_info("prob", FLOAT, ["N", 2])],
        inits, graph_name="tiny_cls")


def rec_model_bytes(num_classes: int, col_stride: int = 4,
                    seed: int = 7) -> bytes:
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((3, num_classes)).astype(np.float32)
    b = rng.standard_normal(num_classes).astype(np.float32) * 0.1
    nodes = [
        node_proto("AveragePool", ["x"], ["cols"],
                   kernel_shape=[48, col_stride],
                   strides=[48, col_stride]),            # [1,3,1,T]
        node_proto("Reshape", ["cols", "shape_ct"], ["ct"]),   # [3,T]
        node_proto("Transpose", ["ct"], ["tc"], perm=[1, 0]),  # [T,3]
        node_proto("MatMul", ["tc", "w"], ["proj"]),           # [T,C]
        node_proto("Add", ["proj", "b"], ["logits"]),
    ]
    inits = [tensor_proto("shape_ct", np.array([3, -1], dtype=np.int64)),
             tensor_proto("w", w), tensor_proto("b", b)]
    return model_proto(
        nodes,
        [value_info("x", FLOAT, [1, 3, 48, "W"])],
        [value_info("logits", FLOAT, ["T", num_classes])],
        inits, graph_name="tiny_crnn")


def write_tiny_models(models_dir: str, num_rec_classes: int) -> dict[str, str]:
    """Write det.onnx / cls.onnx / rec.onnx under ``models_dir`` with the
    reference's config-key file naming; returns {stage: path}."""
    os.makedirs(models_dir, exist_ok=True)
    out = {}
    for name, payload in (("det", det_model_bytes()),
                          ("cls", cls_model_bytes()),
                          ("rec", rec_model_bytes(num_rec_classes))):
        path = os.path.join(models_dir, f"{name}.onnx")
        with open(path, "wb") as f:
            f.write(payload)
        out[name] = path
    return out
