"""E2E golden equality under non-default configs: cls enabled (A2 path:
flip correction, cls_label/cls_score fields) and an alternate layout parser.
Each config gets its own deterministically generated corpus + golden."""

import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.pipelines.ocr import run_extraction
from paddleocr_json_ray.synth.backend import make_backends
from paddleocr_json_ray.synth.corpus import build_corpus


def _spans_map(tab):
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]] for r in tab.to_pylist()}


@pytest.mark.parametrize("cfg", [
    PipelineConfig(cls=True),
    PipelineConfig(parser="single_line"),
    PipelineConfig(det=False),   # whole-image recognition (cpp/src/task.cpp:73-81)
    PipelineConfig(rec=False),   # detection-only boxes (empty text, det score)
    PipelineConfig(use_dilation=True),          # 2x2 bitmap dilation branch
    PipelineConfig(det_db_score_mode="fast"),   # BoxScoreFast rect-mean branch
], ids=["cls_on", "parser_single_line", "det_off", "rec_off", "dilation", "score_fast"])
def test_variant_matches_golden(ray_session, sf0001_dir, cfg):
    import pyarrow as pa
    import ray as _ray

    paths = build_corpus(sf0001_dir, cfg)
    got = pa.concat_tables(_ray.get(run_extraction(sf0001_dir, cfg).to_arrow_refs()))
    golden = pq.read_table(paths.golden_parquet)
    assert _spans_map(got) == _spans_map(golden)


def test_cls_changes_flipped_output(ray_session, sf0001_dir):
    """cls on vs off must differ somewhere: flipped crops get corrected."""
    a = build_corpus(sf0001_dir, PipelineConfig(cls=True))
    b = build_corpus(sf0001_dir, PipelineConfig(cls=False))
    ga = {r["doc_id"]: [s["text"] for s in r["spans"]]
          for r in pq.read_table(a.golden_parquet).to_pylist()}
    gb = {r["doc_id"]: [s["text"] for s in r["spans"]]
          for r in pq.read_table(b.golden_parquet).to_pylist()}
    assert ga != gb  # some flipped crop was reversed without cls


def test_paddle_backend_gated():
    with pytest.raises(NotImplementedError):
        make_backends(PipelineConfig(backend="paddle"), ["a"])
