"""Structure mode e2e: pixel-rendered ruled tables -> layout detection ->
grid recognition -> OCR text matched into rebuilt HTML.  Default-off parity
with the reference CLI is pinned too."""

import numpy as np
import pyarrow as pa
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.stages.structure import (
    StructureStage,
    detect_layout,
    structure_for_raster,
    table_structure,
)
from paddleocr_json_ray.synth.backend import make_backends
from paddleocr_json_ray.synth.imaging import SimgBlock
from paddleocr_json_ray.synth.tablecode import TableSpec, render_structure_raster

CHARS = [chr(c) for c in range(32, 127)]


def _demo_scene():
    """One 2x3 ruled table + one free text line."""
    table = TableSpec(
        row_edges=[40, 80, 120],
        col_edges=[30, 150, 270, 390],
        cells={(0, 0): "name", (0, 1): "qty", (0, 2): "price",
               (1, 0): "bolt", (1, 1): "42", (1, 2): "9.50"},
    )
    caption = SimgBlock(quad=[[30, 140], [300, 140], [300, 162], [30, 162]],
                        text="table one caption", det_prob=0.95)
    raster = render_structure_raster(430, 180, [table], [caption])
    return raster, table


def test_structure_disabled_matches_reference_contract():
    with pytest.raises(NotImplementedError):
        StructureStage(PipelineConfig())


def test_layout_detects_table_and_text_regions():
    raster, table = _demo_scene()
    regions = detect_layout(raster)
    tables = [r for r in regions if r["type"] == "table"]
    texts = [r for r in regions if r["type"] == "text"]
    assert len(tables) == 1
    x0, y0, x1, y1 = tables[0]["box"]
    assert abs(x0 - 30) <= 2 and abs(y0 - 40) <= 2
    assert abs(x1 - 392) <= 2 and abs(y1 - 122) <= 2
    # the caption line is found OUTSIDE the table box
    assert any(r["box"][1] >= 130 for r in texts)


def test_table_structure_recovers_grid():
    raster, table = _demo_scene()
    region = [r for r in detect_layout(raster) if r["type"] == "table"][0]
    cell_boxes, tags = table_structure(raster, region["box"])
    assert len(cell_boxes) == 6
    assert tags == table.expected_tags()


def test_structure_e2e_html():
    raster, table = _demo_scene()
    cfg = PipelineConfig(structure_enabled=True)
    det_b, rec_b, cls_b = make_backends(cfg, CHARS)
    rows = structure_for_raster(raster, cfg, det_b, rec_b, cls_b)
    tbl = [r for r in rows if r["type"] == "table"][0]
    expected = ("<table><tbody>"
                "<tr><td>name</td><td>qty</td><td>price</td></tr>"
                "<tr><td>bolt</td><td>42</td><td>9.50</td></tr>"
                "</tbody></table>")
    assert tbl["html"] == expected
    txt = [r for r in rows if r["type"] == "text"]
    assert any("table one caption" in r["text_res"][0]["text"]
               for r in txt if r.get("text_res"))


def test_structure_stage_over_dataset(ray_session):
    """Ray-side plumbing: actor-pool map_batches over PNG payloads."""
    import ray.data

    from paddleocr_json_ray.functions.imagecodecs import encode_png

    raster, _ = _demo_scene()
    tab = pa.table({
        "blob_id": pa.array(["t0", "t1"]),
        "payload": pa.array([encode_png(raster)] * 2, type=pa.binary()),
    })
    cfg = PipelineConfig(structure_enabled=True)
    ds = ray.data.from_arrow(tab).map_batches(
        StructureStage, batch_format="pyarrow", concurrency=1,
        fn_constructor_args=(cfg,))
    got = ds.to_pandas()
    assert set(got["blob_id"]) == {"t0", "t1"}
    per_blob = got[got["blob_id"] == "t0"]
    assert (per_blob["region_type"] == "table").sum() == 1
    assert per_blob[per_blob["region_type"] == "table"]["html"].iloc[0].startswith("<table>")
