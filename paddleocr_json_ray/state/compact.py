"""Small-file compaction — the table-maintenance pass every long-running
ingestion needs: thousands of tiny parquet files (one per task per run)
degrade read parallelism bookkeeping and metadata load; compaction rewrites
a directory into ~target-size files without changing content.

Ray-native shape: one streaming read (block count derived from BYTES, the
repo's standard bounded-read rule), ``repartition`` WITHOUT shuffle (block
coalescing — no exchange, rows keep their relative order), one write.
"""

from __future__ import annotations

import glob
import os


def compact_parquet(in_dir: str, out_dir: str,
                    target_mb: int = 64) -> dict:
    """Rewrite ``in_dir``'s parquet files into ``out_dir`` at ~``target_mb``
    per file.  Returns a summary dict (files before/after, rows, bytes).

    ``out_dir`` must not already contain parquet files (write_parquet
    APPENDS into existing dirs — the repo's documented footgun)."""
    import ray.data

    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    if glob.glob(os.path.join(out_dir, "*.parquet")):
        raise ValueError(f"{out_dir} already holds parquet files "
                         "(write_parquet appends; refuse to double rows)")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total_bytes // (target_mb << 20)))
    ds = ray.data.read_parquet(files)
    n_rows = ds.count()
    os.makedirs(out_dir, exist_ok=True)
    ds.repartition(n_out).write_parquet(out_dir)
    return {"files_in": len(files), "files_out": len(
        glob.glob(os.path.join(out_dir, "*.parquet"))),
        "n_rows": n_rows, "bytes_in": total_bytes, "target_files": n_out}
