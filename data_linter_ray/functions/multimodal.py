"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata
(kind, media_ref) — the engine's Ray-side plumbing (schemas, actor-pool
signatures, batch sizing, output layout) is real and tested; the codec
step itself is stubbed: the image/audio libraries are not in this
container, so decoding uses PIL/soundfile when importable and otherwise
a clearly-marked deterministic fake decoder (or ``NotImplementedError``
in strict mode).

Stages are callable CLASSES for ``map_batches(..., concurrency=N)``
actor pools: codec/init work happens once per actor in ``__init__``,
per-batch work in ``__call__``. Batch sizes should be small for large
payloads (bytes-based batching; see ``suggested_batch_size``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
    ]
)

FEATURE_DIM = 32


def suggested_batch_size(avg_payload_bytes: int, budget_bytes: int = 64 * 1024 * 1024) -> int:
    """Rows per batch so one batch stays within a worker-heap budget."""
    return max(1, budget_bytes // max(1, avg_payload_bytes))


def _fake_decode(payload: bytes, out_pixels: int = 64) -> np.ndarray:
    """Deterministic stand-in for a real codec: derive a fixed-size
    float32 'pixel' array from the payload bytes via hashing."""
    h = hashlib.sha256(payload).digest()
    seed = np.frombuffer(h[:8], dtype=np.uint64)[0]
    rng = np.random.RandomState(int(seed % (2**32)))
    return rng.rand(out_pixels).astype(np.float32)


class ImageDecoder:
    """Actor-pool stage: binary payload → decoded pixel array column.

    ``strict=True`` raises NotImplementedError when no real codec is
    available (production posture); default falls back to the
    deterministic fake so pipelines stay testable in this container.
    """

    def __init__(self, payload_col: str = "payload", strict: bool = False, size: tuple = (8, 8)):
        self.payload_col = payload_col
        self.size = size
        self.codec = None
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self.codec = "pil"
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "no image codec available (PIL not installed); "
                    "install pillow or use strict=False for the fake decoder"
                )
            self.codec = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n_px = self.size[0] * self.size[1]
        if self.codec == "pil":  # pragma: no cover
            import io

            from PIL import Image

            arrays = [
                np.asarray(
                    Image.open(io.BytesIO(p)).convert("L").resize(self.size),
                    dtype=np.float32,
                ).ravel()
                / 255.0
                for p in payloads
            ]
        else:
            arrays = [_fake_decode(p, n_px) for p in payloads]
        flat = np.concatenate(arrays) if arrays else np.empty(0, np.float32)
        pixels = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), n_px)
        return batch.append_column("pixels", pixels)


class FeatureExtractor:
    """Actor-pool stage: decoded pixels → small feature vector (mean/std
    pooled blocks — a deterministic stand-in for model inference; the
    model-load slot is ``__init__``)."""

    def __init__(self, pixels_col: str = "pixels", dim: int = FEATURE_DIM):
        self.pixels_col = pixels_col
        self.dim = dim
        # model-load stand-in: projections built ONCE per actor per input
        # width and cached (never rebuilt per batch)
        self._proj: dict[int, np.ndarray] = {
            64: np.random.RandomState(42).randn(64, dim).astype(np.float32)
        }

    def _projection(self, width: int) -> np.ndarray:
        if width not in self._proj:
            self._proj[width] = (
                np.random.RandomState(42).randn(width, self.dim).astype(np.float32)
            )
        return self._proj[width]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.pixels_col].combine_chunks()
        # FixedSizeList<float32> → [n, width] zero-copy reshape
        width = col.type.list_size
        m = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), width)
        feats = m.astype(np.float32, copy=False) @ self._projection(width)
        flat = pa.array(feats.ravel(), pa.float32())
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.dim)
        )


class FrameSampler:
    """Actor-pool stage for video payloads: emit one row per sampled
    frame (flat_map-style expansion inside map_batches)."""

    def __init__(self, payload_col: str = "payload", frames_per_video: int = 4):
        self.payload_col = payload_col
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, frames, payloads = [], [], []
        ref_col = batch["media_ref"].to_pylist()
        for ref, p in zip(ref_col, batch[self.payload_col].to_pylist()):
            for f in range(self.k):
                refs.append(ref)
                frames.append(f)
                # fake frame extraction: deterministic slice of payload
                chunk = len(p) // self.k or 1
                payloads.append(p[f * chunk : (f + 1) * chunk] or p[:1])
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame": pa.array(frames, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def synth_media_dataset(n: int, kind: str = "image", payload_bytes: int = 256) -> Dataset:
    """Deterministic synthetic media table (binary payloads)."""
    import ray.data

    def gen(batch: dict) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        rng_bytes = [
            hashlib.sha256(f"media-{kind}-{i}".encode()).digest() * (payload_bytes // 32 + 1)
            for i in ids
        ]
        return pa.table(
            {
                "media_ref": pa.array([f"media://cat/{i % 10_000:08d}" for i in ids]),
                "kind": pa.array([kind] * len(ids)),
                "payload": pa.array([b[:payload_bytes] for b in rng_bytes], pa.binary()),
            }
        )

    return ray.data.range(n).map_batches(gen, batch_format="numpy")


def decode_pipeline(
    media: Dataset,
    concurrency: int = 4,
    batch_size: int | None = None,
    num_cpus: float = 0.5,
) -> Dataset:
    """media table → decode (actor pool) → features (actor pool).

    Size ``concurrency × num_cpus`` per stage so the two pools plus the
    upstream read tasks fit the node — actor pools that reserve every
    CPU deadlock the streaming executor (the read can never run).
    """
    batch_size = batch_size or 1024
    # max_restarts=0: the stages are deterministic and Ray Data's actor
    # pool replaces dead workers itself; the default (restartable actors
    # whose constructor args live in the object store) logs a restart-
    # will-fail error per actor (ray#53727)
    decoded = media.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        max_restarts=0,
    )
    return decoded.map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        max_restarts=0,
    )
