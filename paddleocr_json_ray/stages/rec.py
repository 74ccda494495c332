"""cls + rec stage — stateful actor pool (A2/A3 equivalents,
cpp/src/ocr_cls.cpp:20-105 / cpp/src/ocr_rec.cpp:20-137) fused with the
per-span layout parse (tbpu) and envelope build (W1).

The recognizer dictionary (A4) and backends load once per actor in
``__init__``.  Value semantics come from the shared ``span_ocr.rec_blocks``
(pixel cls + 180° crop correction, aspect-sorted micro-batches, the real
CrnnResize + Normalize input build (M4/M2) whose tensor the pixel backend
DECODES, CTC greedy decode with NaN skip, sink filters).

Output: ``blocks`` (nested Arrow list<struct>), ``span_text``, final
``code``/``msg`` per span; intermediate crop columns are dropped.
"""

from __future__ import annotations

import pyarrow as pa

from .. import errors
from ..config import PipelineConfig
from ..synth import imaging
from ..synth.backend import make_backends
from .span_ocr import DetItem, rec_blocks

BLOCK_STRUCT = pa.struct([
    ("box", pa.list_(pa.list_(pa.int32()))),
    ("text", pa.string()),
    ("score", pa.float32()),
    ("end", pa.string()),
    ("cls_label", pa.int32()),
    ("cls_score", pa.float32()),
])
BLOCKS_TYPE = pa.list_(BLOCK_STRUCT)


class RecStage:
    def __init__(self, cfg: PipelineConfig, dict_path: str):
        from ..synth.oracle import load_dict_chars

        self.cfg = cfg
        _, self.rec_backend, self.cls_backend = make_backends(
            cfg, list(load_dict_chars(dict_path)))
        from ..functions.layout import PARSERS, render_text

        self.parser = PARSERS[cfg.parser]
        self.render_text = render_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        kinds = batch.column("kind").to_pylist()
        codes = batch.column("code").to_pylist()
        msgs = batch.column("msg").to_pylist()
        paths = batch.column("src_path").to_pylist()
        quads = batch.column("det_quads").to_pylist()
        scores = batch.column("det_scores").to_pylist()
        crop_blobs = batch.column("crop_blobs").to_pylist()
        texts_out = batch.column("span_text").to_pylist()

        n = len(kinds)
        blocks_col: list[list[dict] | None] = [None] * n
        for i in range(n):
            if kinds[i] != "media" or codes[i] != 0:
                continue
            items = [DetItem([[q[0], q[1]], [q[2], q[3]], [q[4], q[5]], [q[6], q[7]]], s)
                     for q, s in zip(quads[i], scores[i])]
            crops = [imaging.bytes_to_array(b) for b in (crop_blobs[i] or [])]
            blocks = rec_blocks(items, crops, cfg, self.rec_backend, self.cls_backend)
            if not blocks:
                codes[i] = errors.CODE_OK_NONE
                msgs[i] = errors.msg_ok_none(paths[i])
                texts_out[i] = ""
                blocks_col[i] = []
                continue
            if cfg.rec and cfg.det:  # layout parse needs text AND geometry
                blocks = self.parser(blocks)
            codes[i] = errors.CODE_OK
            texts_out[i] = self.render_text(blocks)
            blocks_col[i] = [{
                "box": b["box"],
                "text": b["text"],
                "score": float(b["score"]),
                "end": b.get("end", ""),
                "cls_label": int(b.get("cls_label", -1)),
                "cls_score": float(b.get("cls_score", 0.0)),
            } for b in blocks]

        out = batch.drop_columns(["det_quads", "det_scores", "crop_blobs",
                                  "span_text", "code", "msg", "src_path"])
        return out.append_column("span_text", pa.array(texts_out, type=pa.string())) \
                  .append_column("code", pa.array(codes, type=pa.int32())) \
                  .append_column("msg", pa.array(msgs, type=pa.string())) \
                  .append_column("blocks", pa.array(blocks_col, type=BLOCKS_TYPE))
