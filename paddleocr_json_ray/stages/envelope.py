"""JSON envelope writer (W1/W2/W3) — CLI-equivalence output format.

Produces the reference's exact per-request JSON line from a span-level result
row: ``{"code": 100, "data": [{"box": [[..]x4], "score": s, "text": t,
...}]}`` with ``ensure_ascii`` \\uXXXX escaping (cpp/src/task.cpp:22-37,
61-108).  Typed Arrow columns remain the primary sink; this writer exists so
a reference client can diff outputs byte-for-byte.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .. import errors


def result_to_json_line(code: int, msg: str, blocks: list[dict] | None,
                        ensure_ascii: bool = True) -> str:
    """One span result -> the reference's JSON envelope line."""
    if code == errors.CODE_OK and blocks:
        data = []
        for b in blocks:
            j = {"text": b["text"], "score": b["score"], "box": b["box"]}
            if b.get("cls_label", -1) != -1:
                j["cls_label"] = b["cls_label"]
                j["cls_score"] = b["cls_score"]
            data.append(j)
        out = {"code": errors.CODE_OK, "data": data}
    else:
        out = {"code": code, "data": msg}
    try:
        return json.dumps(out, ensure_ascii=ensure_ascii, separators=(",", ":"))
    except (TypeError, ValueError):
        return json.dumps({"code": errors.CODE_ERR_JSON_DUMP,
                           "data": "Json dump failed."}, ensure_ascii=ensure_ascii)


def envelope_json_batch(batch: pa.Table, ensure_ascii: bool = True) -> pa.Table:
    """Span-result rows -> (doc_id, offset, json_line); media spans only."""
    out_doc, out_off, out_json = [], [], []
    blocks_col = batch.column("blocks").to_pylist()
    for i in range(batch.num_rows):
        if batch.column("kind")[i].as_py() != "media":
            continue
        code = batch.column("code")[i].as_py()
        msg = batch.column("msg")[i].as_py()
        blocks = blocks_col[i]
        out_doc.append(batch.column("doc_id")[i].as_py())
        out_off.append(batch.column("offset")[i].as_py())
        out_json.append(result_to_json_line(code, msg, blocks, ensure_ascii))
    return pa.table({"doc_id": pa.array(out_doc, type=pa.string()),
                     "offset": pa.array(out_off, type=pa.int32()),
                     "json": pa.array(out_json, type=pa.string())})
