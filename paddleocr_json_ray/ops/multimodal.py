"""Multimodal column ops: opaque binary payloads + typed metadata, processed
by actor-pool ``map_batches`` stages.

Real image/audio codecs are not available in this container, so the pixel
decode for real formats is STUBBED behind ``decode_real_image`` (raises
NotImplementedError unless cv2/PIL appears); all Ray-side plumbing — binary
schema, actor signature, batch sizing, output layout — is real and tested
against the deterministic SIMG payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.imageops import resize_image
from ..synth import imaging
from ..synth.corpus import build_corpus


def decode_real_image(payload: bytes) -> "np.ndarray":
    """Real-image decode seam: cv2 when present; otherwise the
    dependency-free PNG/BMP/JPEG codecs (functions/imagecodecs).  Only
    formats neither path can read (WebP/TIFF/...) raise."""
    try:
        import cv2  # type: ignore

        arr = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            raise ValueError("imdecode failed")
        return arr[..., ::-1]  # BGR -> RGB
    except ImportError:
        pass
    from ..functions.imagecodecs import decode_image

    arr = decode_image(payload)
    if arr is None:
        raise NotImplementedError(
            "only PNG/BMP/JPEG decode without cv2/PIL in this environment "
            "(functions/imagecodecs); other formats need a real codec lib")
    return arr


def _read_blobs(sf_dir: str) -> ray.data.Dataset:
    # single-file table: without override_num_blocks the block count (1)
    # would bound task parallelism and starve any downstream actor pool;
    # derived from bytes so blocks stay ~32 MB at any corpus size
    from ..sources.readers import blocks_for_paths

    paths = build_corpus(sf_dir)
    return ray.data.read_parquet(
        paths.media_blobs_parquet,
        override_num_blocks=blocks_for_paths(paths.media_blobs_parquet))


def media_meta(sf_dir: str) -> ray.data.Dataset:
    """Typed metadata per media payload (codec-sniffing: SIMG header, else
    PNG/BMP decode via functions/imagecodecs); n_blocks is -1 for real-image
    formats that carry no block structure."""
    def fn(batch: pa.Table) -> pa.Table:
        ok, w, h, nb = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            simg = imaging.decode(payload)
            if simg is not None:
                ok.append(True)
                w.append(simg.width)
                h.append(simg.height)
                nb.append(len(simg.blocks))
                continue
            from ..functions.imagecodecs import decode_image

            arr = decode_image(payload)
            ok.append(arr is not None)
            w.append(arr.shape[1] if arr is not None else -1)
            h.append(arr.shape[0] if arr is not None else -1)
            nb.append(-1)
        return pa.table({
            "blob_id": batch.column("blob_id"),
            "ref_kind": batch.column("ref_kind"),
            "ok": pa.array(ok, type=pa.bool_()),
            "width": pa.array(w, type=pa.int32()),
            "height": pa.array(h, type=pa.int32()),
            "n_blocks": pa.array(nb, type=pa.int32()),
        })

    return _read_blobs(sf_dir).map_batches(fn, batch_format="pyarrow")


class ThumbnailStage:
    """Actor-pool stage: full raster decode + bilinear resize to a fixed
    thumbnail — the shape of any real feature-extract/resize stage (small
    batches because payload rows are heavy)."""

    def __init__(self, thumb: int = 64):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.span_ocr import raster_for_payload

        means = []
        for payload in batch.column("payload").to_pylist():
            raster = raster_for_payload(payload)  # SIMG render or PNG/BMP decode
            if raster is None:
                means.append(-1)
                continue
            th = resize_image(raster, self.thumb, self.thumb)
            means.append(int(th.astype(np.int64).mean()))
        return pa.table({
            "blob_id": batch.column("blob_id"),
            "thumb_side": pa.array([self.thumb] * batch.num_rows, type=pa.int32()),
            "mean_pixel": pa.array(means, type=pa.int64()),
        })


def media_thumbnails(sf_dir: str, concurrency: int | None = None) -> ray.data.Dataset:
    """Pool pinned to the cluster like the OCR stage (autoscaling pools
    plateau on second-scale tasks — measured in BENCH); small batches
    because payload rows are heavy."""
    from ..pipelines.ocr import _pool_size

    pool = _pool_size(concurrency or 32)
    return _read_blobs(sf_dir).map_batches(
        ThumbnailStage, concurrency=(pool, pool), batch_size=32,
        batch_format="pyarrow", num_cpus=1)


def frame_sample(sf_dir: str, every: int = 2) -> ray.data.Dataset:
    """Frame-sampling plumbing demo: treat each payload's blocks as frames,
    keep every ``every``-th — flat_map shape (1 payload -> N frame rows)."""
    def fn(batch: pa.Table) -> pa.Table:
        ids, idxs, texts = [], [], []
        for blob_id, payload in zip(batch.column("blob_id").to_pylist(),
                                    batch.column("payload").to_pylist()):
            simg = imaging.decode(payload)
            if simg is None:
                continue
            for i, blk in enumerate(simg.blocks):
                if i % every == 0:
                    ids.append(blob_id)
                    idxs.append(i)
                    texts.append(blk.text)
        return pa.table({"blob_id": pa.array(ids, type=pa.string()),
                         "frame_idx": pa.array(idxs, type=pa.int32()),
                         "frame_text": pa.array(texts, type=pa.string())})

    return _read_blobs(sf_dir).map_batches(fn, batch_format="pyarrow")
