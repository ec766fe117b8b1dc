"""Multimodal (image/audio/video) stages — schema-real, decode-stubbed.

Media travel as opaque ``binary`` columns with typed metadata columns,
processed by actor-pool map_batches stages. The image/audio codec
libraries are NOT in this container, so the decode kernels are
deterministic fakes behind ``STUB_DECODE`` (clearly marked): they
produce stable pseudo-features from the bytes so the Ray-side plumbing
— schema, batch sizing for large binary payloads, actor signature,
output layout — is real and tested end-to-end. Swapping in a real
decoder is a one-function change per stage.

Batch-size guidance (memory-aware): media rows are MBs each, so these
stages run with small ``batch_size`` (e.g. 8-32) and
``batch_format="pyarrow"`` to keep the binary payloads zero-copy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

STUB_DECODE = True  # no codec libs in this environment


def _stable_floats(data: bytes, n: int, scale: float = 1.0) -> np.ndarray:
    """Deterministic pseudo-signal derived from the payload bytes."""
    h = hashlib.blake2b(data, digest_size=32).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return (rng.random(n, dtype=np.float64) * scale).astype(np.float32)


class ImageDecodeStage:
    """binary image bytes -> (width, height, channels, mean_pixel).

    Real decode would use PIL/libvips here; the stub derives stable
    pseudo-dimensions from the payload hash.
    """

    def __init__(self, image_col: str = "image"):
        self.image_col = image_col
        if not STUB_DECODE:  # pragma: no cover
            raise NotImplementedError("real decoder not wired")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.image_col].to_pylist()
        w = np.empty(len(payloads), np.int32)
        h = np.empty(len(payloads), np.int32)
        mean = np.empty(len(payloads), np.float32)
        for i, b in enumerate(payloads):
            b = b or b""
            f = _stable_floats(b, 3)
            w[i] = 64 + int(f[0] * 1984)
            h[i] = 64 + int(f[1] * 1984)
            mean[i] = f[2]
        return (batch.append_column("width", pa.array(w))
                .append_column("height", pa.array(h))
                .append_column("mean_pixel", pa.array(mean)))


class ImageEmbedStage:
    """binary image bytes -> embedding list<float32>[dim].

    Stands in for batched model inference: the model handle would be
    loaded once in __init__ (the actor-pool pattern); the stub emits a
    stable pseudo-embedding.
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
    """binary audio bytes -> frame-sampled stats (n_frames, rms)."""

    def __init__(self, audio_col: str = "audio", frame_ms: int = 25):
        self.audio_col = audio_col
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.audio_col].to_pylist()
        n_frames = np.empty(len(payloads), np.int32)
        rms = np.empty(len(payloads), np.float32)
        for i, b in enumerate(payloads):
            b = b or b""
            n_frames[i] = max(len(b) // 800, 1)  # fake 16kHz/25ms framing
            rms[i] = float(_stable_floats(b, 1)[0])
        return (batch.append_column("n_frames", pa.array(n_frames))
                .append_column("rms", pa.array(rms)))


def media_dataset_example(n: int = 64, seed: int = 42):
    """A small synthetic media table for tests: (media_id, image bytes)."""
    rng = np.random.default_rng(seed)
    rows = [{"media_id": i,
             "image": rng.bytes(int(rng.integers(100, 2000)))}
            for i in range(n)]
    return pa.Table.from_pylist(rows)
