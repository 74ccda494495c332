"""Document re-assembly — THE semantic shuffle (O3).

``groupby(doc_id).map_groups``: within each document, spans are sorted by
``offset`` and re-emitted as the ordered span sequence ``(kind, text,
media_ref, order)`` — the reference's per-request FIFO ordering guarantee
(docs/详细使用指南.md:37) recovered by keys instead of arrival order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..synth.corpus import GOLDEN_SPAN_STRUCT

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(GOLDEN_SPAN_STRUCT)),
    ("codes", pa.list_(pa.int32())),
    ("n_spans", pa.int32()),
    ("n_media", pa.int32()),
    ("n_errors", pa.int32()),
])


def assemble_block(batch: pa.Table) -> pa.Table:
    """Zero-shuffle assembly for doc-contiguous blocks — fully vectorized.

    The interleaved input stores ONE ROW PER DOCUMENT, and every map stage
    (explode included) emits a document's spans contiguously inside the same
    task output block — Ray bundles whole input rows per task and preserves
    in-block row order.  So when the pipeline input is the interleaved table,
    each block contains only complete documents and assembly is a per-block
    sort + list re-slice with NO all-to-all exchange
    (cfg.assemble_mode='auto').  The general groupby(doc_id) path
    (assemble_document) remains for inputs where one document's spans may be
    scattered across blocks; both paths are asserted equal in tests.

    Validity bound: Ray splits a task's output into multiple blocks only
    past DataContext.target_max_block_size (128 MiB default).  A task here
    holds cfg.text_batch_size (64) docs of span-result rows (~KB each, the
    heavy payload/crop columns are dropped before this stage), orders of
    magnitude under the split threshold — so a document never straddles a
    block boundary.  Inputs that violate this (giant documents, tiny block
    size) must use assemble_mode='shuffle'."""
    if batch.num_rows == 0:
        return pa.Table.from_pylist([], schema=DOC_SCHEMA)
    tab = batch.sort_by([("doc_id", "ascending"), ("offset", "ascending")]).combine_chunks()
    doc_ids = np.asarray(tab.column("doc_id").to_pylist(), dtype=object)
    uniq, starts = np.unique(doc_ids, return_index=True)
    starts = np.sort(starts)
    n = len(doc_ids)
    bounds = np.append(starts, n).astype(np.int64)
    counts = np.diff(bounds)
    # per-span rank within its document = position - segment start
    ranks = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)

    kind_arr = tab.column("kind").combine_chunks()
    codes_arr = tab.column("code").combine_chunks().cast(pa.int32())
    struct = pa.StructArray.from_arrays(
        [kind_arr,
         tab.column("span_text").combine_chunks(),
         tab.column("media_ref").combine_chunks(),
         pa.array(ranks, type=pa.int32())],
        fields=list(GOLDEN_SPAN_STRUCT),
    )
    offsets = pa.array(bounds, type=pa.int32())
    spans_col = pa.ListArray.from_arrays(offsets, struct)
    codes_col = pa.ListArray.from_arrays(offsets, codes_arr)

    is_media = pc.equal(kind_arr, "media").to_numpy(zero_copy_only=False).astype(np.int64)
    is_err = (codes_arr.to_numpy(zero_copy_only=False) >= 200).astype(np.int64)
    n_media = np.add.reduceat(is_media, starts) if n else np.array([], dtype=np.int64)
    n_err = np.add.reduceat(is_err, starts) if n else np.array([], dtype=np.int64)

    return pa.table({
        "doc_id": pa.array([doc_ids[s] for s in starts], type=pa.string()),
        "spans": spans_col,
        "codes": codes_col,
        "n_spans": pa.array(counts, type=pa.int32()),
        "n_media": pa.array(n_media, type=pa.int32()),
        "n_errors": pa.array(n_err, type=pa.int32()),
    })


def assemble_document(group: pa.Table) -> pa.Table:
    order = np.argsort(group.column("offset").to_numpy(), kind="stable")
    kinds = group.column("kind").to_pylist()
    texts = group.column("span_text").to_pylist()
    refs = group.column("media_ref").to_pylist()
    codes = group.column("code").to_pylist()
    spans = []
    out_codes = []
    n_media = n_err = 0
    for rank, idx in enumerate(order):
        idx = int(idx)
        spans.append({"kind": kinds[idx], "text": texts[idx],
                      "media_ref": refs[idx], "order": rank})
        out_codes.append(codes[idx])
        if kinds[idx] == "media":
            n_media += 1
        if codes[idx] >= 200:
            n_err += 1
    return pa.table({
        "doc_id": [group.column("doc_id")[0].as_py()],
        "spans": pa.array([spans], type=pa.list_(GOLDEN_SPAN_STRUCT)),
        "codes": pa.array([out_codes], type=pa.list_(pa.int32())),
        "n_spans": pa.array([len(spans)], type=pa.int32()),
        "n_media": pa.array([n_media], type=pa.int32()),
        "n_errors": pa.array([n_err], type=pa.int32()),
    })
