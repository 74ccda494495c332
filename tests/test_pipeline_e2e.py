"""End-to-end golden test: the distributed pipeline's output must equal the
sequential oracle's expected span sequence for EVERY document —
span-sequence equality on (kind, text, media_ref, order) (BASELINE.json
invariant; FIXTURES.md F3)."""

import pyarrow.parquet as pq
import pytest

from paddleocr_json_ray.config import PipelineConfig
from paddleocr_json_ray.pipelines.ocr import run_extraction, span_level_results
from paddleocr_json_ray.synth.corpus import build_corpus


@pytest.fixture(scope="module")
def smoke_corpus(sf0001_dir):
    return build_corpus(sf0001_dir)


def _spans_map(table):
    out = {}
    for row in table.to_pylist():
        out[row["doc_id"]] = [(s["kind"], s["text"], s["media_ref"], s["order"])
                              for s in row["spans"]]
    return out


def test_span_sequence_equality(ray_session, sf0001_dir, smoke_corpus):
    result = run_extraction(sf0001_dir).to_arrow_refs()
    import ray as _ray
    import pyarrow as pa
    got = pa.concat_tables([_ray.get(r) for r in result])
    golden = pq.read_table(smoke_corpus.golden_parquet)
    got_map = _spans_map(got)
    exp_map = _spans_map(golden)
    assert set(got_map) == set(exp_map)
    mismatches = [d for d in exp_map if got_map[d] != exp_map[d]]
    assert not mismatches, f"{len(mismatches)} docs mismatch, first: {mismatches[:1]}"


def test_codes_match_golden(ray_session, sf0001_dir, smoke_corpus):
    import pyarrow as pa
    import ray as _ray
    got = pa.concat_tables([_ray.get(r) for r in run_extraction(sf0001_dir).to_arrow_refs()])
    golden = pq.read_table(smoke_corpus.golden_parquet)
    got_codes = {r["doc_id"]: r["codes"] for r in got.to_pylist()}
    exp_codes = {r["doc_id"]: r["codes"] for r in golden.to_pylist()}
    assert got_codes == exp_codes


def test_span_level_envelope_contract(ray_session, sf0001_dir, smoke_corpus):
    """Every span yields an envelope row; error codes appear as data; blocks
    are typed nested Arrow."""
    ds = span_level_results(sf0001_dir)
    tab = ds.to_pandas()
    assert (tab["code"].isin([0, 100, 101, 200, 201, 202, 203, 300, 301])).all()
    media = tab[tab["kind"] == "media"]
    assert (media["code"] != 0).all()  # every media span got a verdict
    errs = media[media["code"] >= 200]
    assert len(errs) > 0, "corpus should include corrupted refs"
    assert (errs["msg"] != "").all()
    ok = media[media["code"] == 100]
    assert (ok["span_text"].str.len() > 0).all()
