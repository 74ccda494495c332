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


def _first_per_hash(group: pa.Table) -> pa.Table:
    best: dict[int, tuple] = {}
    for i in range(group.num_rows):
        h2 = group.column("h2")[i].as_py()
        doc_id = group.column("doc_id")[i].as_py()
        if h2 not in best or doc_id < best[h2][0]:
            best[h2] = (doc_id, i)
    idx = sorted(i for _, i in best.values())
    return group.take(idx).drop_columns(["text_hash", "h2"])


def curate(sf_dir: str, cfg: PipelineConfig | None = None,
           min_quality_milli: int = 400, min_tokens: int = 3) -> ray.data.Dataset:
    """Returns the curated corpus: (doc_id, n_tokens, quality_milli,
    lang_pred) for quality-passing, deduplicated documents."""
    cfg = cfg or PipelineConfig()
    docs = run_extraction(sf_dir, cfg)
    scored = (docs.map_batches(_doc_text, batch_format="pyarrow")
                  .map_batches(_score, batch_format="pyarrow"))
    kept = scored.filter(
        expr=f"quality_milli >= {min_quality_milli} and n_tokens >= {min_tokens}")
    return kept.groupby("text_hash").map_groups(_first_per_hash, batch_format="pyarrow")
