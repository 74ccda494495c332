"""Input readers (S5/S6 equivalents).

The reference parses one JSON task line per request (``imread_json``,
cpp/src/task.cpp:141-212) and has an unused directory walker
(``GetAllFiles``, cpp/src/utility.cpp:123-160); here the unit of ingest is a
table.  ``read_interleaved`` accepts a file, a directory of parquet parts,
or a glob — path expansion is Ray Data's native reader behaviour."""

from __future__ import annotations

import glob as _glob
import os

import ray.data


def expand_paths(path: str) -> list[str]:
    """GetAllFiles parity: file -> [file]; dir -> its parquet files; glob ->
    matches.  Deterministic (sorted)."""
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    if any(ch in path for ch in "*?["):
        return sorted(_glob.glob(path))
    return [path]


def blocks_for_paths(path: str | list[str], floor: int = 64,
                     target_bytes: int = 32 << 20) -> int:
    """Read-block count derived from on-disk bytes (~32 MB per block), with
    a parallelism floor: block count bounds task parallelism in Ray Data,
    so few-file corpora need the floor, while at 100x the data the ratio
    keeps blocks memory-bounded instead of letting per-block size grow with
    the corpus (same sizing rule as relational._join_partitions)."""
    files = []
    for p_ in ([path] if isinstance(path, str) else path):
        files.extend(expand_paths(p_))
    total = 0
    for f in files:
        try:
            total += os.path.getsize(f)
        except OSError:
            pass
    return max(floor, -(-total // max(1, target_bytes)))


def read_table(sf_dir: str, table: str, columns=None,
               target_bytes: int = 16 << 20, **kw) -> ray.data.Dataset:
    """Pruned, block-bounded read of one scale-factor table: columns pruned
    at the read, block count derived from on-disk bytes with a
    cluster-CPU floor.  Ray's default ~200-block read makes every
    downstream exchange schedule hundreds of micro-tasks on megabyte-scale
    tables (measured: the dedup suite was block-count-bound, not
    data-bound)."""
    import ray as _ray

    lance_path = os.path.join(sf_dir, f"{table}.lance")
    if os.path.isdir(lance_path):
        # Lance is the north rule's preferred storage; dispatch to it when a
        # .lance dataset exists (column pruning passes through).  Block
        # bounding applies here too — Ray's default ~200-block read is the
        # documented micro-task regression this function exists to prevent.
        # This sandbox ships no lance package, so the parquet branch below
        # is the tested path — same seam rule as read_interleaved.
        nbytes = sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(lance_path) for f in fs)
        cpus_l = (int(_ray.cluster_resources().get("CPU", 8))
                  if _ray.is_initialized() else 8)
        blocks = max(cpus_l, -(-nbytes // max(1, target_bytes)))
        try:
            return ray.data.read_lance(
                lance_path,
                columns=list(columns) if columns is not None else None,
                override_num_blocks=blocks, **kw)
        except (AttributeError, ImportError) as exc:
            raise NotImplementedError(
                f"{lance_path} exists but no lance reader is available in "
                "this environment; store the table as parquet") from exc
    path = os.path.join(sf_dir, f"{table}.parquet")
    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return ray.data.read_parquet(
        path, columns=list(columns) if columns is not None else None,
        override_num_blocks=blocks_for_paths(path, floor=cpus,
                                             target_bytes=target_bytes), **kw)


def read_interleaved(path: str, override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Read the interleaved table.  Lance datasets (the north rule's
    preferred format) are used when the path is a .lance dataset AND the
    lance reader is available; this sandbox ships no lance, so parquet is
    the tested path — the seam is this one function."""
    if path.rstrip("/").endswith(".lance"):
        try:
            return ray.data.read_lance(path)
        except (AttributeError, ImportError) as exc:
            raise NotImplementedError(
                "lance reader unavailable in this environment; store the "
                "interleaved table as parquet") from exc
    files = expand_paths(path)
    if not files:
        raise FileNotFoundError(f"no parquet inputs under {path!r}")
    return ray.data.read_parquet(files, override_num_blocks=override_num_blocks)


def tasks_from_json_lines(lines: list[str]) -> ray.data.Dataset:
    """S5 parity: a batch of reference-style request lines
    ``{"image_path": p}`` / ``{"image_base64": b}`` becomes a one-doc-per-line
    interleaved dataset (errors 401/402/403 surface as error-code spans
    downstream via invalid refs)."""
    import json

    rows = []
    for i, line in enumerate(lines):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            ref = "invalid:json_parse"  # -> CODE_ERR_NO_TASK downstream
        else:
            if "image_path" in obj:
                ref = f"file:{obj['image_path']}"
            elif "image_base64" in obj:
                ref = f"b64:{obj['image_base64']}"
            else:
                ref = "invalid:no_task"
        rows.append({"doc_id": f"task-{i:06d}",
                     "spans": [{"kind": "media", "text": "", "media_ref": ref, "offset": 0}]})
    return ray.data.from_items(rows)


def read_documents_any(path: str, columns=None) -> ray.data.Dataset:
    """Format-dispatched corpus ingest — parquet, JSONL (.jsonl/.json
    lines) or CSV — under the same bytes-derived block bounding as
    ``read_table``.  Raw text corpora overwhelmingly arrive as JSONL;
    this is the one-stop ingest seam for them.

    Parquet prunes columns AT the read (projection pushdown); the text
    formats have no pushdown, so pruning happens in a fused select right
    after parse — the bytes still leave disk once either way.  Mixed
    directories dispatch on the majority extension; text formats get a
    2x block multiplier (row materialization inflates heap vs columnar
    parquet)."""
    import ray as _ray

    files: list[str] = []
    for pat in ("*.parquet", "*.jsonl", "*.json", "*.csv"):
        if os.path.isdir(path):
            files.extend(sorted(_glob.glob(os.path.join(path, "**", pat),
                                           recursive=True)))
    if not files:
        files = expand_paths(path)
    if not files:
        raise FileNotFoundError(f"no corpus inputs under {path!r}")
    exts = [os.path.splitext(f)[1].lower() for f in files]
    ext = max(set(exts), key=exts.count)
    chosen = [f for f, e in zip(files, exts) if e == ext]
    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    nb = blocks_for_paths(chosen, floor=cpus, target_bytes=16 << 20)
    if ext == ".parquet":
        return ray.data.read_parquet(
            chosen, columns=list(columns) if columns is not None else None,
            override_num_blocks=nb)
    if ext in (".jsonl", ".json"):
        ds = ray.data.read_json(chosen, override_num_blocks=nb * 2)
    elif ext == ".csv":
        ds = ray.data.read_csv(chosen, override_num_blocks=nb * 2)
    else:
        raise ValueError(f"unsupported corpus format {ext!r}")
    return ds.select_columns(list(columns)) if columns is not None else ds
