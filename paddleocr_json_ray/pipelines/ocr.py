"""End-to-end extraction pipeline builder.

Ray-Data lifecycle (SURVEY.md §3, "Ray-Data lifecycle equivalent"):

  read_parquet(interleaved)                        # streaming blocks
    -> explode spans + inline text-span extraction  (stateless task)
    -> media ref resolve + payload validation       (stateless task)
    -> OCR actor pool: det + cls + rec + layout     (stateful, A1-A3 + tbpu;
       fused by default — one actor owns all model state, the reference's
       process shape; cfg.fuse_ocr_stages=False splits det and rec pools)
    -> groupby(doc_id).map_groups(assemble)         # THE shuffle (O3)

No stage materializes the dataset; consumers stream via write_parquet /
iter_batches.  Text rows pass through the media stages untouched, keeping
the whole job a single pass over the input (no branch + union re-read).

Parallelism notes (measured, BENCH):
  * block count bounds task parallelism -> read with override_num_blocks;
  * Ray bundles input rows per actor task up to the largest fused
    batch_size, so cfg.text_batch_size (doc rows) is the effective task
    grain for the fused explode->decode->OCR chain;
  * actor pools autoscale (min = concurrency//4) so small test clusters
    never block waiting for a full pool.
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..stages.assemble import assemble_block, assemble_document
from ..stages.decode import decode_media
from ..stages.det import DetStage
from ..stages.explode import explode_and_clean
from ..stages.ocr_fused import OcrStage
from ..stages.rec import RecStage


def _want(n: int) -> int:
    """Resolve a configured pool size: 0 = auto, size to the cluster — the
    serialized config stays cluster-independent and the default pipeline
    (curate, entry(), CLI) uses the whole box instead of a constant that
    under-fills any cluster wider than it (measured: curate at the old
    constant 8 ran the 27 s extraction in ~80 s on 32 CPUs)."""
    if n > 0:
        return n
    try:
        import ray as _ray

        return int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _pool_size(want: int) -> int:
    """Fixed-size pool capped to the cluster: Ray Data's autoscaling pool
    ramps too slowly for second-scale tasks (measured ~12/32 actors busy),
    so we pin min=max but leave headroom for read/shuffle tasks."""
    try:
        import ray as _ray

        avail = int(_ray.cluster_resources().get("CPU", want))
    except Exception:
        avail = want
    return max(1, min(want, avail - 2))


def _span_stage(ds: ray.data.Dataset, cfg: PipelineConfig, dict_path: str) -> ray.data.Dataset:
    """explode -> decode -> OCR actor pool(s); returns span-level results."""
    spans = ds.map_batches(explode_and_clean, batch_format="pyarrow",
                           batch_size=cfg.text_batch_size)
    decoded = spans.map_batches(decode_media, batch_format="pyarrow",
                                batch_size=cfg.det_batch_size * 4)
    if cfg.fuse_ocr_stages:
        pool = _pool_size(_want(cfg.det_concurrency))
        return decoded.map_batches(
            OcrStage,
            fn_constructor_args=(cfg, dict_path),
            concurrency=(pool, pool),
            batch_size=cfg.det_batch_size,
            batch_format="pyarrow",
            num_cpus=cfg.num_cpus_per_actor,
        )
    # two pools must LEAVE CPUs for read/assemble tasks or the pipeline
    # deadlocks on small clusters: cap each pool at half the task headroom
    per_pool = max(1, _pool_size(_want(cfg.det_concurrency) * 2) // 2)
    det = decoded.map_batches(
        DetStage,
        fn_constructor_args=(cfg,),
        concurrency=(1, min(_want(cfg.det_concurrency), per_pool)),
        batch_size=cfg.det_batch_size,
        batch_format="pyarrow",
        num_cpus=cfg.num_cpus_per_actor,
    )
    return det.map_batches(
        RecStage,
        fn_constructor_args=(cfg, dict_path),
        concurrency=(1, min(_want(cfg.rec_concurrency), per_pool)),
        batch_size=cfg.rec_batch_size,
        batch_format="pyarrow",
        num_cpus=cfg.num_cpus_per_actor,
    )


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
        rec = _span_stage(ds, cfg, dpath)
        if cfg.assemble_mode == "auto":
            # spans stay doc-contiguous per block for the one-row-per-doc
            # input -> block-local assembly, no all-to-all (see assemble.py)
            return rec.map_batches(assemble_block, batch_size=None,
                                   batch_format="pyarrow")
        # general path: span results are tiny vs the media they came from;
        # coalesce before the sort-shuffle — its overhead scales with block
        # count, and the OCR stage leaves one small block per task
        rec = rec.repartition(_pool_size(_want(cfg.det_concurrency)))
        return rec.groupby("doc_id").map_groups(assemble_document, batch_format="pyarrow")

    return run


def _read_blocks_for(cfg: PipelineConfig, path: str | None = None) -> int:
    """Read with enough blocks that the actor pools can actually spread:
    block count bounds task parallelism in Ray Data, and corpus files are
    few — ~8 docs-per-task granularity at the default pool size, scaled by
    on-disk bytes (~32 MB/block) so block size stays bounded at 100x."""
    floor = max(64, _want(cfg.det_concurrency) * 8)
    if path is None:
        return floor
    from ..sources.readers import blocks_for_paths

    return blocks_for_paths(path, floor=floor)


def run_extraction(sf_dir: str, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """Convenience: build (or reuse) the deterministic corpus for ``sf_dir``,
    then run the full pipeline over it."""
    from ..synth.corpus import build_corpus

    cfg = (cfg or PipelineConfig()).validated()
    paths = build_corpus(sf_dir, cfg)
    ds = ray.data.read_parquet(
        paths.interleaved_dir,
        override_num_blocks=_read_blocks_for(cfg, paths.interleaved_dir))
    return build_pipeline(cfg, paths.dict_path)(ds)


def span_level_results(sf_dir: str, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """The span-level OCR result table (pre-assembly): one row per span with
    code/msg/blocks/span_text — the reference's per-request envelope as a
    table."""
    from ..synth.corpus import build_corpus

    cfg = (cfg or PipelineConfig()).validated()
    paths = build_corpus(sf_dir, cfg)
    ds = ray.data.read_parquet(
        paths.interleaved_dir,
        override_num_blocks=_read_blocks_for(cfg, paths.interleaved_dir))
    return _span_stage(ds, cfg, paths.dict_path)
