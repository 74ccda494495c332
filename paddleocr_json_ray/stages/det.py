"""Det stage — stateful actor pool (A1 equivalent of DBDetector,
cpp/src/ocr_det.cpp:80-166).

One actor per ``concurrency`` slot; the backend is constructed once in
``__init__`` (the reference loads model weights once per process,
cpp/src/task.cpp:243-250).  Per batch: for each decodable media span, render
the raster, run the REAL det input resize (ResizeImgType0, M1, inside
span_ocr.det_items), recover boxes from the resized raster's pixels via the
DB bitmap chain (P1-P5 + sorted_boxes), then perspective-warp the crops
(M6) so the rec stage receives crop pixels.

Output columns added: ``det_quads`` (list of 8-int flattened quads),
``det_scores``, ``crop_blobs`` (serialized crop rasters).  The crops are the
ONLY channel into cls/rec — no ground-truth columns cross this boundary.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..synth import imaging
from ..synth.backend import make_backends
from .span_ocr import crops_for_items, items_for_raster, raster_for_payload


class DetStage:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.backend = make_backends(cfg, [])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        kinds = batch.column("kind").to_pylist()
        codes = batch.column("code").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n = len(kinds)
        quads_col: list[list[list[int]] | None] = [None] * n
        scores_col: list[list[float] | None] = [None] * n
        crops_col: list[list[bytes] | None] = [None] * n

        for i in range(n):
            if kinds[i] != "media" or codes[i] != 0 or payloads[i] is None:
                continue
            raster = raster_for_payload(payloads[i])
            if raster is None:
                continue  # decode stage already coded this; defensive
            items = items_for_raster(raster, cfg, self.backend)
            crops = crops_for_items(raster, items, cfg)
            quads_col[i] = [[c for pt in it.quad for c in pt] for it in items]
            scores_col[i] = [it.det_score for it in items]
            crops_col[i] = [imaging.array_to_bytes(c) for c in crops]

        out = batch.drop_columns(["payload"])
        return out.append_column("det_quads", pa.array(quads_col, type=pa.list_(pa.list_(pa.int32())))) \
                  .append_column("det_scores", pa.array(scores_col, type=pa.list_(pa.float32()))) \
                  .append_column("crop_blobs", pa.array(crops_col, type=pa.list_(pa.binary())))
