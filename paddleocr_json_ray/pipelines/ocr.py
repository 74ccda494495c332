"""End-to-end extraction pipeline builder.

Ray-Data lifecycle (SURVEY.md §3, "Ray-Data lifecycle equivalent"):

  read_parquet(interleaved)                        # streaming blocks
    -> explode spans + inline text-span extraction  (stateless task)
    -> media ref resolve + payload validation       (stateless task)
    -> det actor pool                               (stateful, A1)
    -> cls+rec+layout actor pool                    (stateful, A2/A3 + tbpu)
    -> groupby(doc_id).map_groups(assemble)         # THE shuffle (O3)

No stage materializes the dataset; consumers stream via write_parquet /
iter_batches.  Text rows pass through the media stages untouched, keeping
the whole job a single pass over the input (no branch + union re-read).
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..stages.assemble import assemble_document
from ..stages.decode import decode_media
from ..stages.det import DetStage
from ..stages.explode import explode_and_clean
from ..stages.rec import RecStage


def build_pipeline(cfg: PipelineConfig | None = None, dict_path: str | None = None):
    """Returns run(ds) -> Dataset of assembled documents.

    ``ds`` must have the interleaved schema (doc_id, spans).  ``dict_path``
    is the rec dictionary (A4); defaults to cfg.rec_char_dict_path.
    """
    cfg = (cfg or PipelineConfig()).validated()
    dpath = dict_path or cfg.rec_char_dict_path
    if not dpath:
        raise ValueError("a rec character dict is required (dict_path or cfg.rec_char_dict_path)")

    def run(ds: ray.data.Dataset) -> ray.data.Dataset:
        if cfg.explode_override_num_blocks:
            ds = ds.repartition(cfg.explode_override_num_blocks)
        spans = ds.map_batches(explode_and_clean, batch_format="pyarrow",
                               batch_size=cfg.text_batch_size)
        decoded = spans.map_batches(decode_media, batch_format="pyarrow",
                                    batch_size=cfg.det_batch_size * 4)
        det = decoded.map_batches(
            DetStage,
            fn_constructor_args=(cfg,),
            concurrency=(1, cfg.det_concurrency),
            batch_size=cfg.det_batch_size,
            batch_format="pyarrow",
            num_cpus=cfg.num_cpus_per_actor,
        )
        rec = det.map_batches(
            RecStage,
            fn_constructor_args=(cfg, dpath),
            concurrency=(1, cfg.rec_concurrency),
            batch_size=cfg.rec_batch_size,
            batch_format="pyarrow",
            num_cpus=cfg.num_cpus_per_actor,
        )
        docs = rec.groupby("doc_id").map_groups(assemble_document, batch_format="pyarrow")
        return docs

    return run


def run_extraction(sf_dir: str, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """Convenience: build (or reuse) the deterministic corpus for ``sf_dir``,
    then run the full pipeline over it."""
    from ..synth.corpus import build_corpus

    cfg = (cfg or PipelineConfig()).validated()
    paths = build_corpus(sf_dir, cfg)
    ds = ray.data.read_parquet(paths.interleaved_dir)
    return build_pipeline(cfg, paths.dict_path)(ds)


def span_level_results(sf_dir: str, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """The span-level OCR result table (pre-assembly): one row per span with
    code/msg/blocks/span_text — the reference's per-request envelope as a
    table."""
    from ..synth.corpus import build_corpus

    cfg = (cfg or PipelineConfig()).validated()
    paths = build_corpus(sf_dir, cfg)
    ds = ray.data.read_parquet(paths.interleaved_dir)
    spans = ds.map_batches(explode_and_clean, batch_format="pyarrow",
                           batch_size=cfg.text_batch_size)
    decoded = spans.map_batches(decode_media, batch_format="pyarrow",
                                batch_size=cfg.det_batch_size * 4)
    det = decoded.map_batches(DetStage, fn_constructor_args=(cfg,),
                              concurrency=(1, cfg.det_concurrency),
                              batch_size=cfg.det_batch_size, batch_format="pyarrow",
                              num_cpus=cfg.num_cpus_per_actor)
    return det.map_batches(RecStage, fn_constructor_args=(cfg, paths.dict_path),
                           concurrency=(1, cfg.rec_concurrency),
                           batch_size=cfg.rec_batch_size, batch_format="pyarrow",
                           num_cpus=cfg.num_cpus_per_actor)
