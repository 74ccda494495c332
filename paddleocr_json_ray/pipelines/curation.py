"""Training-data curation pipeline — the composed "what this engine is for"
demo: interleaved docs -> extraction -> per-document text -> quality scoring
+ language ID -> quality filter -> exact dedup -> curated corpus.

Single streaming job: extraction feeds a flat-map to document text, scoring
is a stateless map, dedup is the hash-keyed groupby over a 128-bit
content identity (16-byte keys in the exchange, never document text); no
stage materializes the full dataset.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..config import PipelineConfig
from ..functions.textstats import lang_id, quality_stats
from .ocr import run_extraction


def _doc_text(batch: pa.Table) -> pa.Table:
    """Assembled docs -> (doc_id, text) where text joins span texts in order."""
    texts = []
    for spans in batch.column("spans").to_pylist():
        texts.append("\n".join(s["text"] for s in spans if s["text"]))
    return pa.table({"doc_id": batch.column("doc_id"),
                     "text": pa.array(texts, type=pa.string())})


def _score(batch: pa.Table) -> pa.Table:
    import hashlib

    texts = batch.column("text").to_pylist()
    stats = [quality_stats(t) for t in texts]
    digests = [hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest() for t in texts]
    # 128-bit content identity: the dedup exchange ships 16 bytes, not text
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array([s["n_tokens"] for s in stats], type=pa.int64()),
        "quality_milli": pa.array([s["quality_milli"] for s in stats], type=pa.int64()),
        "lang_pred": pa.array([lang_id(t) for t in texts], type=pa.string()),
        "text_hash": pa.array([int.from_bytes(d[:8], "little", signed=True) for d in digests],
                              type=pa.int64()),
        "h2": pa.array([int.from_bytes(d[8:], "little", signed=True) for d in digests],
                       type=pa.int64()),
    })


def _first_per_hash_block(batch: pa.Table) -> pa.Table:
    """One (hash-sorted) block: the first row of every content-hash run —
    doc_id ascending within the run, so the first row IS the run's winner.
    Interior runs (kind=0) are final; the block's first/last runs emit ONE
    candidate row each (kind=1, a block-local sufficient statistic) for the
    grouped heal — a hot hash spanning B blocks costs B rows, never its
    duplicate count."""
    import numpy as np

    h1 = batch.column("text_hash").to_numpy()
    h2 = batch.column("h2").to_numpy()
    n = len(h1)
    if n == 0:
        return batch.append_column("kind", pa.array([], type=pa.int8()))
    bnd = np.flatnonzero((np.diff(h1) != 0) | (np.diff(h2) != 0)) + 1
    starts = np.r_[0, bnd]
    kind = np.zeros(len(starts), dtype=np.int8)
    kind[0] = kind[-1] = 1
    return (batch.take(pa.array(starts))
                 .append_column("kind", pa.array(kind)))


def curate(sf_dir: str, cfg: PipelineConfig | None = None,
           min_quality_milli: int = 400, min_tokens: int = 3) -> ray.data.Dataset:
    """Returns the curated corpus: (doc_id, n_tokens, quality_milli,
    lang_pred) for quality-passing, deduplicated documents.

    The exact dedupe is the sorted-run first-per-key pattern: one keyed
    sort by (content-hash, doc_id), each block keeps the first row of every
    complete interior run, and runs touching a block boundary are healed by
    a grouped min-doc_id pick over their one-row-per-block candidates — no
    per-group dispatch over high-cardinality hashes, no winner-set
    broadcast, no driver state."""
    import pyarrow.compute as pc

    cfg = cfg or PipelineConfig()
    docs = run_extraction(sf_dir, cfg)
    scored = (docs.map_batches(_doc_text, batch_format="pyarrow")
                  .map_batches(_score, batch_format="pyarrow"))
    kept = scored.filter(
        expr=f"quality_milli >= {min_quality_milli} and n_tokens >= {min_tokens}")
    out = (kept.sort(["text_hash", "h2", "doc_id"])
               .map_batches(_first_per_hash_block, batch_format="pyarrow",
                            batch_size=None)
               .materialize())
    payload = ["doc_id", "n_tokens", "quality_milli", "lang_pred"]
    finals = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)).select(payload),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1))
                   .select(["text_hash", "h2"] + payload),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        idx = pc.index(group.column("doc_id"),
                       pc.min(group.column("doc_id")).as_py()).as_py()
        return group.slice(idx, 1).select(payload)

    healed = edges.groupby(["text_hash", "h2"]).map_groups(
        heal, batch_format="pyarrow")
    return finals.union(healed)


def export_partition_keys(doc_ids: list, shards: int):
    """(split array, shard array) from md5 of each string doc id: split
    8/1/1 from the first digest word, shard from the second — the same
    engine-independent keyed-hash style as ``sample_docs``."""
    import hashlib

    import numpy as np

    h = [hashlib.md5(str(i).encode()).hexdigest() for i in doc_ids]
    w1 = np.array([int(x[:8], 16) for x in h], dtype=np.int64)
    w2 = np.array([int(x[8:16], 16) for x in h], dtype=np.int64)
    r = w1 % 10
    split = np.where(r <= 7, "train", np.where(r == 8, "val", "test"))
    return split, w2 % shards


def export_corpus(sf_dir: str, out_dir: str, shards: int = 8,
                  cfg: PipelineConfig | None = None,
                  fmt: str = "parquet") -> dict:
    """Training-export sink: the curated corpus written hive-partitioned
    (``split=train|val|test / shard=NN``) as parquet (default) or JSONL
    (``fmt="jsonl"`` — what most tokenizer/training stacks ingest) — the
    end of the extract -> score -> filter -> dedup -> export chain.

    Deterministic end to end: split (8/1/1) and shard both derive from
    md5 of the string doc id (independent digest slices), so a re-run
    reproduces byte-identical partition membership — consumers (and
    resumed runs) can skip finished partition directories, and at 100 TB
    the shard count bounds per-file size and writer parallelism instead of
    producing one giant file.  Returns a summary dict (the written data
    stays distributed; nothing rows-level lands on the driver)."""
    import numpy as np

    cur = curate(sf_dir, cfg)

    def assign(batch: pa.Table) -> pa.Table:
        sp, sh = export_partition_keys(batch.column("doc_id").to_pylist(),
                                       shards)
        return (batch.append_column("split", pa.array(sp))
                     .append_column("shard", pa.array(sh.astype(np.int64))))

    ds = cur.map_batches(assign, batch_format="pyarrow").materialize()
    if fmt == "parquet":
        ds.write_parquet(out_dir, partition_cols=["split", "shard"])
    elif fmt == "jsonl":
        # Ray's write_json has no partition_cols; a map-based sink writes
        # each block's (split, shard) groups into the same hive layout
        # (row serialization is inherent to JSONL — sink-only cost)
        def write_block(batch: pa.Table) -> pa.Table:
            import json as _json
            import os as _os
            import uuid as _uuid

            import numpy as _np

            sp = _np.asarray(batch.column("split"))
            sh = batch.column("shard").to_numpy()
            key = _np.asarray([f"{a}\x00{b}" for a, b in zip(sp, sh)],
                              dtype=object)
            for k in _np.unique(key):
                s_, n_ = k.split("\x00")
                d = _os.path.join(out_dir, f"split={s_}", f"shard={n_}")
                _os.makedirs(d, exist_ok=True)
                sub = batch.filter(pa.array(key == k)) \
                           .drop_columns(["split", "shard"])
                fn = _os.path.join(d, f"part-{_uuid.uuid4().hex}.jsonl")
                with open(fn, "w") as fh:
                    for row in sub.to_pylist():
                        fh.write(_json.dumps(row, ensure_ascii=False) + "\n")
            return pa.table({"n": pa.array([batch.num_rows])})

        for _ in ds.map_batches(write_block,
                                batch_format="pyarrow").iter_batches():
            pass
    else:
        raise ValueError(f"unsupported export format {fmt!r}")
    from ray.data.aggregate import Count

    counts = {r["split"]: r["count()"]
              for r in ds.groupby("split").aggregate(Count()).take_all()}
    return {"out_dir": out_dir, "shards": shards,
            "n_docs": int(sum(counts.values())),
            "n_train": int(counts.get("train", 0)),
            "n_val": int(counts.get("val", 0)),
            "n_test": int(counts.get("test", 0))}
