"""Composed curation pipeline invariants."""

from paddleocr_json_ray.pipelines.curation import curate


def test_curation_pipeline(ray_session, sf0001_dir):
    out = curate(sf0001_dir).to_pandas()
    assert len(out) > 100
    assert (out["quality_milli"] >= 400).all()
    assert (out["n_tokens"] >= 3).all()
    assert out["doc_id"].is_unique
    assert set(out.columns) == {"doc_id", "n_tokens", "quality_milli", "lang_pred"}
    # deterministic across runs
    out2 = curate(sf0001_dir).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
