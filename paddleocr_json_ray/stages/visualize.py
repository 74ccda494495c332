"""Debug visualization sink (W5/W6).

The reference draws boxes over the source image and saves a PNG
(``Utility::VisualizeBboxes`` cpp/src/utility.cpp:59-120, Python
``PPOCR_visualize.py``).  The debug sink writes real PNGs via the
dependency-free encoder (functions/imagecodecs) with the detected quads
stroked in red.  Off the hot path: an optional map over span results.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..synth import imaging


def draw_boxes(raster: np.ndarray, quads: list) -> np.ndarray:
    out = raster.copy()
    h, w = out.shape[:2]
    for quad in quads:
        pts = np.asarray(quad, dtype=np.int64)
        for a, b in zip(pts, np.roll(pts, -1, axis=0)):
            n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1))
            xs = np.clip(np.linspace(a[0], b[0], n * 2).astype(np.int64), 0, w - 1)
            ys = np.clip(np.linspace(a[1], b[1], n * 2).astype(np.int64), 0, h - 1)
            out[ys, xs] = (255, 0, 0)
    return out


def write_png(path: str, raster: np.ndarray) -> None:
    from ..functions.imagecodecs import encode_png

    with open(path, "wb") as fh:
        fh.write(encode_png(raster))


def write_ppm(path: str, raster: np.ndarray) -> None:
    h, w = raster.shape[:2]
    with open(path, "wb") as fh:
        fh.write(f"P6\n{w} {h}\n255\n".encode())
        fh.write(np.ascontiguousarray(raster, dtype=np.uint8).tobytes())


def make_visualize_stage(out_dir: str, limit_per_task: int = 16):
    """Returns a map_batches fn writing annotated PNGs for media spans whose
    payload decodes; passes the batch through unchanged."""
    os.makedirs(out_dir, exist_ok=True)

    def visualize(batch: pa.Table) -> pa.Table:
        written = 0
        for i in range(batch.num_rows):
            if written >= limit_per_task or batch.column("kind")[i].as_py() != "media":
                continue
            payload = batch.column("payload")[i].as_py() if "payload" in batch.column_names else None
            if not payload:
                continue
            simg = imaging.decode(payload)
            if simg is None:
                continue
            raster = imaging.render_raster(simg, imaging.raster_seed(payload))
            quads = [b.quad for b in simg.blocks]
            doc = batch.column("doc_id")[i].as_py()
            off = batch.column("offset")[i].as_py()
            write_png(os.path.join(out_dir, f"{doc}-s{off}.png"), draw_boxes(raster, quads))
            written += 1
        return batch

    return visualize
