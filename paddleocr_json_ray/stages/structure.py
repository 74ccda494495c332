"""Structure mode (A5/A6, P8/P9, O4) — implemented pixel-backed, gated
DEFAULT-OFF to match the reference's shipped contract.

The reference SHIPS its layout/table models but hard-disables the mode at
the CLI (``-type=structure`` rejected, ``cpp/src/main.cpp:126-130``), so
structure stays off the equality-critical path and the default pipeline is
byte-identical with the flag unset.  With ``cfg.structure_enabled`` the
stage runs the full structure flow over pixels alone:

  * layout detection (A5, ``cpp/src/structure_layout.cpp:20-99`` role):
    grid-line-mask connected components propose table regions, scored by
    in-box line density and pruned with the greedy IoU-NMS the picodet
    decoder uses (P9, ``cpp/src/postprocess_op.cpp:552-573`` →
    functions/mathutil.nms); text regions come from the det kernel mask
    outside every table box;
  * table recognition (A6/P8, ``cpp/src/structure_table.cpp:20-123``,
    ``postprocess_op.cpp:354-440`` role): projection profiles of the line
    mask inside a table box yield the ruled row/col edges; cells between
    adjacent edges become cell boxes and the ``<tr>/<td></td>`` tag
    sequence — the same (tags, cell boxes) contract the table model's
    decoder emits;
  * text matching (O4, ``cpp/src/paddlestructure.cpp:144-276``): the
    standard det/cls/rec path OCRs the raster; per-table blocks match to
    cells by the reference's (corner-L1, 1-IoU, index) metric and rebuild
    HTML (functions/table_match).

Ray shape: ``StructureStage`` is an actor-pool ``map_batches`` class —
backends and dictionary load once in ``__init__``; each batch decodes
payloads and emits one row per region.  Cells are per-image, so the cell
match is an in-batch broadcast nearest-neighbour join: no shuffle.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig

_MIN_TABLE_LINE_PX = 200      # candidate threshold: line pixels per component
_LINE_COVERAGE = 0.6          # fraction of span a ruled line must cover
_NMS_IOU = 0.5


def line_mask(raster: np.ndarray) -> np.ndarray:
    """Exact grid-line mask — see synth/tablecode.py for why (G<16, R>200)
    is unreachable by every other painted signal."""
    return (raster[..., 1] < 16) & (raster[..., 0] > 200)


# ------------------------------------------------------------- layout (A5)
def detect_layout(raster: np.ndarray) -> list[dict]:
    """Typed regions [{type, box(xyxy), score}]: tables from line-mask
    components + density score + NMS; text regions from det-kernel
    components outside every table."""
    from ..functions.db_postprocess import component_runs
    from ..functions.mathutil import nms

    lm = line_mask(raster)
    boxes, scores = [], []
    for runs in component_runs(lm):
        n_px = int((runs[:, 2] - runs[:, 1]).sum())
        if n_px < _MIN_TABLE_LINE_PX:
            continue
        x0, x1 = int(runs[:, 1].min()), int(runs[:, 2].max())
        y0, y1 = int(runs[:, 0].min()), int(runs[:, 0].max()) + 1
        area = max((x1 - x0) * (y1 - y0), 1)
        boxes.append([x0, y0, x1, y1])
        scores.append(min(1.0, 4.0 * n_px / area))  # ruled grids are sparse
    regions = []
    if boxes:
        keep = nms(np.asarray(boxes, dtype=np.float64),
                   np.asarray(scores, dtype=np.float64), _NMS_IOU)
        regions = [{"type": "table", "box": boxes[i], "score": scores[i]}
                   for i in keep]

    # text regions: det kernel mask outside every table box
    km = raster[..., 0] < 200
    for x0, y0, x1, y1 in (r["box"] for r in regions):
        km[y0:y1, x0:x1] = False
    from ..functions.db_postprocess import component_runs as _cr

    for runs in _cr(km):
        if int((runs[:, 2] - runs[:, 1]).sum()) < 16:
            continue
        x0, x1 = int(runs[:, 1].min()), int(runs[:, 2].max())
        y0, y1 = int(runs[:, 0].min()), int(runs[:, 0].max()) + 1
        regions.append({"type": "text", "box": [x0, y0, x1, y1], "score": 1.0})
    regions.sort(key=lambda r: (r["box"][1], r["box"][0]))
    return regions


# ----------------------------------------------------- table structure (A6)
def _line_centers(profile: np.ndarray, min_cover: float) -> list[int]:
    """Centers of profile runs covering >= min_cover of the span."""
    hit = profile >= min_cover
    idx = np.flatnonzero(hit)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.r_[idx[0], idx[breaks + 1]]
    stops = np.r_[idx[breaks], idx[-1]] + 1
    return [int((s + e) // 2) for s, e in zip(starts, stops)]


def table_structure(raster: np.ndarray, box: list[int]) -> tuple[list[list[int]], list[str]]:
    """(cell_boxes xyxy in image coords, html tag sequence) for one table
    region — the P8 decoder's output contract, from projection profiles of
    the ruled grid."""
    x0, y0, x1, y1 = box
    sub = line_mask(raster)[y0:y1, x0:x1]
    h, w = sub.shape
    row_lines = _line_centers(sub.sum(axis=1), _LINE_COVERAGE * w)
    col_lines = _line_centers(sub.sum(axis=0), _LINE_COVERAGE * h)
    if len(row_lines) < 2 or len(col_lines) < 2:
        return [], []
    cell_boxes = []
    tags = ["<table>", "<tbody>"]
    for r in range(len(row_lines) - 1):
        tags.append("<tr>")
        for c in range(len(col_lines) - 1):
            cell_boxes.append([x0 + col_lines[c], y0 + row_lines[r],
                               x0 + col_lines[c + 1], y0 + row_lines[r + 1]])
            tags.append("<td></td>")
        tags.append("</tr>")
    tags += ["</tbody>", "</table>"]
    return cell_boxes, tags


# --------------------------------------------------------- full flow (O4)
def structure_for_raster(raster: np.ndarray, cfg: PipelineConfig,
                         det_backend, rec_backend, cls_backend) -> list[dict]:
    """StructurePredictResult rows (``cpp/include/utility.h:45-54`` shape):
    one per region — tables carry cell boxes + rebuilt html, text regions
    carry their OCR blocks."""
    from ..functions.table_match import match_cells, rebuild_table_html
    from .span_ocr import crops_for_items, items_for_raster, rec_blocks

    items = items_for_raster(raster, cfg, det_backend)
    crops = crops_for_items(raster, items, cfg)
    blocks = rec_blocks(items, crops, cfg, rec_backend, cls_backend)

    def center_in(blk, box):
        xs = [p[0] for p in blk["box"]]
        ys = [p[1] for p in blk["box"]]
        cx, cy = sum(xs) / 4.0, sum(ys) / 4.0
        return box[0] <= cx < box[2] and box[1] <= cy < box[3]

    out = []
    for region in detect_layout(raster):
        row = {"type": region["type"], "box": region["box"],
               "confidence": float(region["score"])}
        mine = [b for b in blocks if center_in(b, region["box"])]
        if region["type"] == "table":
            cell_boxes, tags = table_structure(raster, region["box"])
            row["cell_box"] = cell_boxes
            row["html"] = rebuild_table_html(tags, match_cells(mine, cell_boxes)) \
                if cell_boxes else ""
        else:
            row["text_res"] = mine
        out.append(row)
    return out


class StructureStage:
    """Actor-pool stage for structure mode — constructing it with the flag
    unset raises the same "unsupported" contract the reference's CLI
    enforces (``cpp/src/main.cpp:126-130``)."""

    def __init__(self, cfg: PipelineConfig, dict_chars: list[str] | None = None):
        if not getattr(cfg, "structure_enabled", False):
            raise NotImplementedError(
                "structure mode is disabled by default, matching the "
                "reference (cpp/src/main.cpp:126-130: only -type=ocr is "
                "accepted); set PipelineConfig(structure_enabled=True) to "
                "run the pixel-backed structure flow")
        from ..synth.backend import make_backends

        self.cfg = cfg
        chars = dict_chars or [chr(c) for c in range(32, 127)]
        self.det_b, self.rec_b, self.cls_b = make_backends(cfg, chars)

    def __call__(self, batch):
        """pyarrow batch with (blob_id, payload) -> one row per region."""
        import pyarrow as pa

        from .span_ocr import raster_for_payload

        ids, types, boxes, htmls, texts, conf = [], [], [], [], [], []
        for blob_id, payload in zip(batch.column("blob_id").to_pylist(),
                                    batch.column("payload").to_pylist()):
            raster = raster_for_payload(payload)
            if raster is None:
                continue
            for row in structure_for_raster(np.asarray(raster), self.cfg,
                                            self.det_b, self.rec_b, self.cls_b):
                ids.append(blob_id)
                types.append(row["type"])
                boxes.append(row["box"])
                htmls.append(row.get("html", ""))
                texts.append("\n".join(b["text"] for b in row.get("text_res", [])))
                conf.append(row["confidence"])
        return pa.table({
            "blob_id": pa.array(ids, type=pa.string()),
            "region_type": pa.array(types, type=pa.string()),
            "box": pa.array(boxes, type=pa.list_(pa.int64())),
            "html": pa.array(htmls, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "confidence": pa.array(conf, type=pa.float64()),
        })


def rebuild_table(ocr_blocks: list[dict], cell_boxes: list[list[int]],
                  html_tags: list[str]) -> str:
    """Pure-function structure-mode core (usable today given cell boxes +
    tag sequence from any table model)."""
    from ..functions.table_match import match_cells, rebuild_table_html

    return rebuild_table_html(html_tags, match_cells(ocr_blocks, cell_boxes))
