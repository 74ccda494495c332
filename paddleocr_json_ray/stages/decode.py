"""Media resolution + decode stage (S1/S3 equivalents).

Stateless ``map_batches`` task: resolves each media span's ref (inline base64
or file path), validates the payload, and attaches the raw bytes for the det
stage.  Errors become code/msg columns — never exceptions (the reference's
envelope contract, cpp/include/task.h:12-61).
"""

from __future__ import annotations

import pyarrow as pa

from .. import errors
from ..synth import imaging
from .span_ocr import resolve_media_ref


def _payload_decodable(payload: bytes) -> bool:
    """Validity check without rendering (the det stage renders once)."""
    if imaging.decode(payload) is not None:
        return True
    from ..functions.imagecodecs import decode_image

    return decode_image(payload) is not None


def decode_media(batch: pa.Table) -> pa.Table:
    kinds = batch.column("kind").to_pylist()
    refs = batch.column("media_ref").to_pylist()
    codes = batch.column("code").to_pylist()
    msgs = batch.column("msg").to_pylist()
    payloads: list[bytes | None] = []
    paths: list[str] = []
    for i, (kind, ref) in enumerate(zip(kinds, refs)):
        if kind != "media":
            payloads.append(None)
            paths.append("")
            continue
        resolved = resolve_media_ref(ref)
        if resolved.code != 0:
            codes[i], msgs[i] = resolved.code, resolved.msg
            payloads.append(None)
            paths.append(resolved.path)
            continue
        # validate now so det only sees decodable payloads
        if not _payload_decodable(resolved.payload):
            if resolved.path:
                codes[i] = errors.CODE_ERR_PATH_DECODE
                msgs[i] = errors.msg_path_decode(resolved.path)
            else:
                codes[i] = errors.CODE_ERR_BASE64_IM_DECODE
                msgs[i] = errors.MSG_BASE64_IM_DECODE
            payloads.append(None)
        else:
            payloads.append(resolved.payload)
        paths.append(resolved.path)
    out = batch.drop_columns(["code", "msg"])
    return out.append_column("code", pa.array(codes, type=pa.int32())) \
              .append_column("msg", pa.array(msgs, type=pa.string())) \
              .append_column("payload", pa.array(payloads, type=pa.binary())) \
              .append_column("src_path", pa.array(paths, type=pa.string()))
