"""Explode interleaved documents into span rows (vectorized Arrow) and
normalise text spans inline.

Design note (scale): text-span extraction is a cheap stateless regex pass, so
it runs fused into the explode stage — this keeps the whole pipeline a single
streaming pass over the input (no branch + union, which in Ray Data would
re-execute the read per consumer).  The heavy media stages later pass text
rows through untouched.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.html import strip_boilerplate

EXPLODED_FIELDS = [
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("kind", pa.string()),
    ("media_ref", pa.string()),
    ("span_text", pa.string()),
    ("code", pa.int32()),
    ("msg", pa.string()),
]


def explode_and_clean(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) -> one row per span; text spans get their main content
    extracted immediately (M12); media spans flow on for the OCR stages."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    flat = pc.list_flatten(spans)
    kind = flat.field("kind")
    raw_text = flat.field("text")
    is_text = pc.equal(kind, "text")
    cleaned = pa.array(
        [strip_boilerplate(t) if m else "" for t, m in zip(raw_text.to_pylist(), is_text.to_pylist())],
        type=pa.string(),
    )
    n = len(parent)
    return pa.table({
        "doc_id": doc_ids,
        "offset": flat.field("offset"),
        "kind": kind,
        "media_ref": flat.field("media_ref"),
        "span_text": cleaned,
        "code": pa.array([0] * n, type=pa.int32()),
        "msg": pa.array([""] * n, type=pa.string()),
    })
