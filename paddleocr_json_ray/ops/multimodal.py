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
    """Drop-in for cv2.imdecode/PIL for real image bytes (PNG/JPEG).  The
    container ships no image codec; a deployment with cv2 or PIL installed
    gets the real decode via this single seam."""
    try:
        import cv2  # type: ignore

        arr = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            raise ValueError("imdecode failed")
        return arr
    except ImportError as exc:
        raise NotImplementedError(
            "real image codecs unavailable in this environment; SIMG payloads "
            "are decoded via synth.imaging.decode") from exc


def _read_blobs(sf_dir: str) -> ray.data.Dataset:
    paths = build_corpus(sf_dir)
    return ray.data.read_parquet(paths.media_blobs_parquet)


def media_meta(sf_dir: str) -> ray.data.Dataset:
    """Typed metadata per media payload: decode header only (cheap task)."""
    def fn(batch: pa.Table) -> pa.Table:
        ok, w, h, nb = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            simg = imaging.decode(payload)
            ok.append(simg is not None)
            w.append(simg.width if simg else -1)
            h.append(simg.height if simg else -1)
            nb.append(len(simg.blocks) if simg else -1)
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
        means = []
        for payload in batch.column("payload").to_pylist():
            simg = imaging.decode(payload)
            if simg is None:
                means.append(-1)
                continue
            raster = imaging.render_raster(simg, imaging.raster_seed(payload))
            th = resize_image(raster, self.thumb, self.thumb)
            means.append(int(th.astype(np.int64).mean()))
        return pa.table({
            "blob_id": batch.column("blob_id"),
            "thumb_side": pa.array([self.thumb] * batch.num_rows, type=pa.int32()),
            "mean_pixel": pa.array(means, type=pa.int64()),
        })


def media_thumbnails(sf_dir: str, concurrency: int = 8) -> ray.data.Dataset:
    return _read_blobs(sf_dir).map_batches(
        ThumbnailStage, concurrency=(1, concurrency), batch_size=32,
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
