"""paddleocr_json_ray — a Ray-Data-native document OCR + main-content
extraction engine with the query/data-processing capabilities of
hiroi-sora/PaddleOCR-json, built from scratch (NOT a port).

The reference is a single-process C++ JSON-over-pipe server handling one
image per request; this engine processes Parquet tables of interleaved
text + media documents (``doc_id, spans: list<struct<kind, text,
media_ref, offset>>``) as streaming ``ray.data.Dataset`` pipelines.

Layout:
  functions/   pure, numpy-vectorized operator semantics (box geometry,
               CTC decode, tbpu layout parsers, separators, HTML strip)
  stages/      Ray Data map_batches stages (stateless tasks + stateful
               actor pools for the det/cls/rec model stages)
  sources/     readers for the interleaved corpus tables
  pipelines/   end-to-end pipeline builders (build_pipeline)
  synth/       deterministic synthetic corpus + media codec + golden oracle
  ops/         large-scale training-data ops (dedup, similarity, text stats)
  state/       partitioned checkpoint writer with per-partition lineage

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
caller (driver, bench.py, tests' conftest) owns the Ray session.
"""

from .config import PipelineConfig
from .pipelines.ocr import build_pipeline

__all__ = ["PipelineConfig", "build_pipeline"]
__version__ = "0.1.0"
