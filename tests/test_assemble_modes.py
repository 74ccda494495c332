"""Both assembly paths (zero-shuffle block-local vs general groupby) must
produce identical documents."""

import pyarrow as pa
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.pipelines.ocr import run_extraction


def _spans_map(tab):
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]] for r in tab.to_pylist()}


def test_auto_equals_shuffle(ray_session, sf0001_dir):
    import ray as _ray

    a = pa.concat_tables(_ray.get(
        run_extraction(sf0001_dir, PipelineConfig(assemble_mode="auto")).to_arrow_refs()))
    b = pa.concat_tables(_ray.get(
        run_extraction(sf0001_dir, PipelineConfig(assemble_mode="shuffle")).to_arrow_refs()))
    assert _spans_map(a) == _spans_map(b)
    ca = {r["doc_id"]: r["codes"] for r in a.to_pylist()}
    cb = {r["doc_id"]: r["codes"] for r in b.to_pylist()}
    assert ca == cb


def test_invalid_assemble_mode_rejected():
    with pytest.raises(ValueError):
        PipelineConfig(assemble_mode="bogus").validated()


def test_split_pools_equal_fused(ray_session, sf0001_dir):
    """cfg.fuse_ocr_stages=False (separate det and cls+rec actor pools, crop
    blobs crossing the stage boundary) must produce exactly the fused
    pipeline's output — the physical split may never change values."""
    import pyarrow as pa
    import ray as _ray

    from paddleocr_json_ray.config import PipelineConfig
    from paddleocr_json_ray.pipelines.ocr import run_extraction

    def spans_map(tab):
        return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                              for s in r["spans"]] for r in tab.to_pylist()}

    fused = pa.concat_tables(_ray.get(
        run_extraction(sf0001_dir, PipelineConfig(fuse_ocr_stages=True)).to_arrow_refs()))
    split = pa.concat_tables(_ray.get(
        run_extraction(sf0001_dir, PipelineConfig(fuse_ocr_stages=False)).to_arrow_refs()))
    assert spans_map(fused) == spans_map(split)
