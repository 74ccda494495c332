"""Multimodal column ops: opaque binary payloads + typed metadata, processed
by actor-pool ``map_batches`` stages.

Image formats decode via the in-repo PNG/BMP/JPEG codecs (cv2 slots in when
present); audio decodes via the in-repo RIFF/WAV PCM parser
(``functions/audiocodecs``); lossy WebP delegates to the system libwebp
(``functions/webp_native``); remaining compressed codecs (MP3/...) raise
NotImplementedError at the same clearly-marked seams a codec lib would
fill.
All Ray-side plumbing — binary schema, actor signature, batch sizing,
output layout — is real and tested.
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
    dependency-free PNG/BMP/JPEG (baseline + progressive)/GIF/TIFF/lossless-
    WebP codecs (functions/imagecodecs), with lossy WebP delegated to the
    system libwebp (functions/webp_native).  Only formats no path can read
    (exotica, or lossy WebP on a machine without libwebp) raise."""
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
            "only PNG/BMP/JPEG/GIF/TIFF/WebP (lossless VP8L + lossy VP8) "
            "decode without cv2/PIL in this environment "
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


class GifFrameSampleStage:
    """Actor-pool stage: VIDEO-style frame sampling over animated-GIF OR
    animated-WebP payloads (dispatched by magic bytes) — full multi-frame
    decode with compositing (sub-rectangle frames, transparency,
    disposal), keep every ``every``-th frame, emit
    one row per kept frame with a small per-frame feature (mean RGB +
    resized thumbnail mean).  1 payload -> N rows: the flat_map shape of a
    real video frame-extract stage; small batches because payloads are
    heavy, state-free but actor-pool shaped so a model-based frame scorer
    drops in at ``__init__``."""

    def __init__(self, every: int = 2, thumb: int = 32,
                 max_frames: int | None = 64):
        self.every = max(1, every)
        self.thumb = thumb
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.gif import decode_gif_frames
        from ..functions.webp import decode_webp_frames

        rows = {"blob_id": [], "frame_idx": [], "height": [], "width": [],
                "mean_pixel": [], "thumb_mean": []}
        for blob_id, payload in zip(batch.column("blob_id").to_pylist(),
                                    batch.column("payload").to_pylist()):
            dec = decode_webp_frames if payload[:4] == b"RIFF" \
                else decode_gif_frames
            frames = dec(payload, max_frames=self.max_frames)
            if not frames:
                continue
            for i in range(0, len(frames), self.every):
                f = frames[i]
                th = resize_image(f, self.thumb, self.thumb)
                rows["blob_id"].append(blob_id)
                rows["frame_idx"].append(i)
                rows["height"].append(f.shape[0])
                rows["width"].append(f.shape[1])
                rows["mean_pixel"].append(int(f.astype(np.int64).mean()))
                rows["thumb_mean"].append(int(th.astype(np.int64).mean()))
        return pa.table({
            "blob_id": pa.array(rows["blob_id"], type=pa.string()),
            "frame_idx": pa.array(rows["frame_idx"], type=pa.int32()),
            "height": pa.array(rows["height"], type=pa.int32()),
            "width": pa.array(rows["width"], type=pa.int32()),
            "mean_pixel": pa.array(rows["mean_pixel"], type=pa.int64()),
            "thumb_mean": pa.array(rows["thumb_mean"], type=pa.int64()),
        })


_AUDIO_SR = 16_000


def _clip_wav(clip_id: int) -> bytes:
    """Deterministic synthetic speech-band clip (REAL WAV bytes): a seeded
    fundamental + two harmonics + noise floor, 0.2-0.6 s at 16 kHz.  The
    audio analogue of the SIMG raster generator — the payload column is a
    genuine container format so the decode stage does real parsing."""
    from ..functions.audiocodecs import encode_wav

    rng = np.random.default_rng(0xA0D10 + clip_id)
    dur = rng.uniform(0.2, 0.6)
    f0 = rng.uniform(100.0, 1200.0)
    t = np.arange(int(dur * _AUDIO_SR)) / _AUDIO_SR
    sig = (0.6 * np.sin(2 * np.pi * f0 * t)
           + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
           + 0.1 * np.sin(2 * np.pi * 3 * f0 * t)
           + 0.02 * rng.standard_normal(len(t)))
    return encode_wav(0.7 * sig, _AUDIO_SR)


def audio_clips(sf_dir: str) -> ray.data.Dataset:
    """Opaque-binary audio column keyed to the documents table: one WAV
    payload per doc_id (task-based generation — the ingest-side stand-in
    for reading an audio blob store)."""
    from ..sources.readers import read_table

    ids = read_table(sf_dir, "documents", ["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "clip_id": pa.array(doc_ids, type=pa.int64()),
            "payload": pa.array([_clip_wav(i) for i in doc_ids], type=pa.binary()),
        })

    return ids.map_batches(gen, batch_format="pyarrow")


class AudioFeatureStage:
    """Actor-pool stage: WAV decode -> framed DSP features.  The FFT window
    and bin-frequency vectors are built ONCE per actor in __init__; per
    payload the frames are a zero-copy stride view and the FFT runs over
    all frames in one vectorized rfft call."""

    def __init__(self, frame: int = 512, hop: int = 256):
        self.frame = frame
        self.hop = hop
        self.window = np.hanning(frame)
        self.freqs = np.fft.rfftfreq(frame, d=1.0 / _AUDIO_SR)

    def _features(self, payload: bytes):
        from ..functions.audiocodecs import decode_wav

        try:
            pcm, sr = decode_wav(payload)
        except (ValueError, NotImplementedError):
            return None
        x = pcm.astype(np.float64).mean(axis=1) / 32768.0  # downmix
        n = len(x)
        if n < self.frame:
            x = np.pad(x, (0, self.frame - n))
        n_frames = 1 + (len(x) - self.frame) // self.hop
        frames = np.lib.stride_tricks.as_strided(
            x, shape=(n_frames, self.frame),
            strides=(x.strides[0] * self.hop, x.strides[0]))
        rms = float(np.sqrt(np.mean(x * x)))
        zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        spec = np.abs(np.fft.rfft(frames * self.window, axis=1))
        power = spec.sum(axis=1)
        cent = float(np.mean((spec @ self.freqs)[power > 0] / power[power > 0])) \
            if (power > 0).any() else 0.0
        return (sr, n, int(n * 1000 // sr), int(round(rms * 1000)),
                int(round(zc * 1000)), int(round(cent)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._features(p) for p in batch.column("payload").to_pylist()]
        ok = [r is not None for r in rows]
        filled = [r if r is not None else (0, 0, 0, -1, -1, -1) for r in rows]
        cols = list(zip(*filled)) if filled else [[]] * 6
        return pa.table({
            "clip_id": batch.column("clip_id"),
            "ok": pa.array(ok, type=pa.bool_()),
            "sample_rate": pa.array(cols[0], type=pa.int32()),
            "n_samples": pa.array(cols[1], type=pa.int64()),
            "duration_ms": pa.array(cols[2], type=pa.int64()),
            "rms_milli": pa.array(cols[3], type=pa.int64()),
            "zcr_milli": pa.array(cols[4], type=pa.int64()),
            "centroid_hz": pa.array(cols[5], type=pa.int64()),
        })


def audio_features(sf_dir: str, concurrency: int | None = None) -> ray.data.Dataset:
    """Per-clip DSP features over the audio column — the audio leg of the
    multimodal triad (image thumbnails / video frame-sample / audio
    features).  Same pool sizing rule as the other heavy-payload stages."""
    from ..pipelines.ocr import _pool_size

    pool = _pool_size(concurrency or 32)
    return audio_clips(sf_dir).map_batches(
        AudioFeatureStage, concurrency=(pool, pool), batch_size=64,
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
