"""Dump the flagship pipeline's per-stage ``Dataset.stats()`` to
BENCH/STATS_FLAGSHIP.txt — the committed evidence for the "wall-time is
dominated by useful compute" claim (the OCR actor-pool stage should own
the wall; reads/assembly/sink should be thin).

Usage: python scripts/stats_report.py [sf_dir] [num_cpus]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from paddleocr_json_ray.config import PipelineConfig
    from paddleocr_json_ray.pipelines.ocr import run_extraction

    cfg = PipelineConfig(det_concurrency=num_cpus, rec_concurrency=num_cpus)
    ds = run_extraction(sf_dir, cfg)
    t0 = time.time()
    n_docs = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        n_docs += batch.num_rows
    wall = time.time() - t0

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "STATS_FLAGSHIP.txt")
    with open(out, "w") as f:
        f.write(f"# flagship per-stage stats — {sf_dir}, num_cpus={num_cpus}\n")
        f.write(f"# {n_docs} docs in {wall:.1f} s = {n_docs / wall:.1f} docs/s\n\n")
        f.write(ds.stats())
        f.write("\n")
    print(f"wrote {out}: {n_docs} docs, {wall:.1f} s")
    ray.shutdown()


if __name__ == "__main__":
    main()
