"""Document re-assembly — THE semantic shuffle (O3).

``groupby(doc_id).map_groups``: within each document, spans are sorted by
``offset`` and re-emitted as the ordered span sequence ``(kind, text,
media_ref, order)`` — the reference's per-request FIFO ordering guarantee
(docs/详细使用指南.md:37) recovered by keys instead of arrival order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..synth.corpus import GOLDEN_SPAN_STRUCT

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(GOLDEN_SPAN_STRUCT)),
    ("codes", pa.list_(pa.int32())),
    ("n_spans", pa.int32()),
    ("n_media", pa.int32()),
    ("n_errors", pa.int32()),
])


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
