"""Det stage — stateful actor pool (A1 equivalent of DBDetector,
cpp/src/ocr_det.cpp:80-166).

One actor per ``concurrency`` slot; the backend is constructed once in
``__init__`` (the reference loads model weights once per process,
cpp/src/task.cpp:243-250).  Per batch: for each decodable media span, run the
REAL preprocessing path (raster decode -> ResizeImgType0 -> Normalize ->
Permute, M1-M3) on the synthetic raster, infer boxes via the backend, apply
the BoxesFromBitmap/FilterTagDetRes post math + sorted_boxes (shared
span_ocr.det_items), then perspective-warp the crops (M6) so the rec stage
receives ready crop tensors.

Output columns added: ``det_quads`` (list of 8-int flattened quads),
``det_scores``, ``crop_blobs`` (serialized crop rasters), ``truth_texts`` /
``flips`` (synthetic-backend channel: stands in for pixel content a real
model would read — a Paddle backend would ignore these columns).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.geometry import get_rotate_crop_image
from ..functions.imageops import DET_MEAN, DET_SCALE, det_resize_shape, normalize, resize_image, to_chw
from ..synth import imaging
from ..synth.backend import make_backends
from .span_ocr import items_for_simg


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
        truths_col: list[list[str] | None] = [None] * n
        flips_col: list[list[bool] | None] = [None] * n

        for i in range(n):
            if kinds[i] != "media" or codes[i] != 0 or payloads[i] is None:
                continue
            simg = imaging.decode(payloads[i])
            if simg is None:
                continue  # decode stage already coded this; defensive
            raster = imaging.render_raster(simg, imaging.raster_seed(payloads[i]))
            if cfg.det:
                # real preprocessing on the deterministic raster (M1-M3)
                rh, rw, _, _ = det_resize_shape(simg.height, simg.width, cfg.limit_side_len)
                resized = resize_image(raster, rh, rw)
                _ = to_chw(normalize(resized, DET_MEAN, DET_SCALE))  # det input tensor
            items = items_for_simg(simg, cfg, self.backend)
            quads_col[i] = [[c for pt in it.quad for c in pt] for it in items]
            scores_col[i] = [it.det_score for it in items]
            truths_col[i] = [it.truth_text for it in items]
            flips_col[i] = [it.flip180 for it in items]
            crops_col[i] = [
                imaging.array_to_bytes(
                    get_rotate_crop_image(raster, it.quad) if cfg.det else raster)
                for it in items]

        out = batch.drop_columns(["payload"])
        return out.append_column("det_quads", pa.array(quads_col, type=pa.list_(pa.list_(pa.int32())))) \
                  .append_column("det_scores", pa.array(scores_col, type=pa.list_(pa.float32()))) \
                  .append_column("crop_blobs", pa.array(crops_col, type=pa.list_(pa.binary()))) \
                  .append_column("truth_texts", pa.array(truths_col, type=pa.list_(pa.string()))) \
                  .append_column("flips", pa.array(flips_col, type=pa.list_(pa.bool_())))
