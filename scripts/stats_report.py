"""Dump a pipeline's per-stage ``Dataset.stats()`` to BENCH/STATS_*.txt —
the committed evidence for the "wall-time is dominated by useful compute"
claim (the OCR actor-pool stage should own the flagship's wall;
reads/assembly/sink should be thin).

Usage: python scripts/stats_report.py [sf_dir] [num_cpus]           # flagship
       python scripts/stats_report.py --query NAME [sf_dir] [num_cpus]

Caveat: queries whose result dataset is rebuilt from collected Arrow refs
(e.g. the dedup family's from_arrow_refs survivor filter) report empty
stats — Ray's stats lineage ends at the rebuild; profile their internal
stages by instrumenting the op instead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _report_query(name: str, sf_dir: str, num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    t0 = time.time()
    ds = entrymod.queries()[name](sf_dir)
    n = ds.count()
    wall = time.time() - t0
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", f"STATS_{name.upper()}.txt")
    with open(out, "w") as f:
        f.write(f"# {name} per-stage stats — {sf_dir}, num_cpus={num_cpus}\n")
        f.write(f"# {n} result rows in {wall:.1f} s\n\n")
        f.write(ds.stats())
        f.write("\n")
    print(f"wrote {out}: {n} rows, {wall:.1f} s")
    ray.shutdown()


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--query":
        name = args[1]
        sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
        num_cpus = int(args[3]) if len(args) > 3 else 32
        _report_query(name, sf_dir, num_cpus)
        return
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
