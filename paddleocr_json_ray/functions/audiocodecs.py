"""Dependency-free RIFF/WAVE PCM codec (decode + encode).

The audio analogue of ``functions/imagecodecs``: real container parsing so
audio payloads are genuine WAV bytes, not a bespoke format.  Scope is
integer PCM (16-bit, mono or stereo) — the overwhelmingly common case for
speech-corpus payloads; compressed codecs (MP3/AAC/FLAC) raise
NotImplementedError at the same seam where a codec lib would slot in.

Layout per the RIFF spec: 'RIFF' <size> 'WAVE', then chunks; the 'fmt '
chunk carries (audio_format, channels, sample_rate, ...), 'data' carries
little-endian interleaved samples.  Chunks are iterated (not assumed at
fixed offsets) so writers that insert LIST/INFO chunks still parse.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 WAV bytes from (n,) mono or (n, ch) interleaved samples.
    Float input in [-1, 1] is scaled; integer input is cast."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if np.issubdtype(arr.dtype, np.floating):
        arr = np.clip(arr, -1.0, 1.0)
        arr = np.round(arr * 32767.0)
    pcm = arr.astype("<i2")
    n, ch = pcm.shape
    data = pcm.tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples (n, ch) int16, sample_rate) from WAV bytes.  Raises
    ValueError on malformed RIFF and NotImplementedError on non-PCM16."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 decodes without a codec lib (format={audio_format}, "
            f"bits={bits}); MP3/AAC/FLAC need a real decoder here")
    if channels < 1:
        raise ValueError("zero channels")
    usable = (len(data) // (2 * channels)) * 2 * channels
    pcm = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, channels)
    return pcm, sample_rate
