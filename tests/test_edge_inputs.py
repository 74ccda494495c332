"""Edge-input robustness: malformed interleaved documents must flow through
the whole pipeline as data, never exceptions."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.pipelines.ocr import build_pipeline
from paddleocr_json_ray.synth.corpus import INTERLEAVED_SCHEMA, build_corpus


def _edge_table():
    rows = [
        {"doc_id": "edge-empty", "spans": []},                       # zero spans
        {"doc_id": "edge-only-corrupt", "spans": [
            {"kind": "media", "text": "", "media_ref": "b64:@@@", "offset": 0}]},
        {"doc_id": "edge-dup-offsets", "spans": [
            {"kind": "text", "text": "<p>aaa</p>", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "<p>bbb</p>", "media_ref": "", "offset": 0}]},
        {"doc_id": "edge-unknown-kind", "spans": [
            {"kind": "video", "text": "", "media_ref": "x", "offset": 0}]},
        {"kind": None, "doc_id": "edge-empty-html", "spans": [
            {"kind": "text", "text": "", "media_ref": "", "offset": 0}]},
    ]
    for r in rows:
        r.pop("kind", None)
    return pa.Table.from_pylist(rows, schema=INTERLEAVED_SCHEMA)


def test_edge_documents_survive(ray_session, sf0001_dir, tmp_path):
    import ray.data

    paths = build_corpus(sf0001_dir)  # reuse its dict
    src = os.path.join(str(tmp_path), "edge.parquet")
    pq.write_table(_edge_table(), src)
    ds = ray.data.read_parquet(src)
    out = build_pipeline(PipelineConfig(), paths.dict_path)(ds).to_pandas()
    by_id = {r.doc_id: r for r in out.itertuples()}

    # empty-span doc vanishes from span-level output (nothing to assemble)
    assert "edge-empty" not in by_id
    assert by_id["edge-only-corrupt"].codes[0] == 300
    assert by_id["edge-only-corrupt"].n_errors == 1
    dup = by_id["edge-dup-offsets"]
    assert sorted(s["text"] for s in dup.spans) == ["aaa", "bbb"]
    # unknown span kind passes through untouched (kind preserved, no OCR)
    assert by_id["edge-unknown-kind"].spans[0]["kind"] == "video"
    assert by_id["edge-empty-html"].spans[0]["text"] == ""
