"""Multimodal (image/audio/video) stages.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages.  The actual codecs are NOT available in this container, so the
decode kernels are stubbed: ``RealCodecStage`` raises
``NotImplementedError`` at the exact call site a codec library would
occupy, and ``FakeFeatureExtractor`` produces deterministic
hash-derived features so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested end-to-end.

Scale notes baked into the defaults: media rows are wide, so
``MEDIA_BATCH_SIZE`` is small (batch x concurrency must fit worker
heaps) and stages run as actor pools (model/codec state loads once per
actor in ``__init__``, never per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

MEDIA_BATCH_SIZE = 64  # wide binary rows: keep batches small
FEATURE_DIM = 64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)


class RealCodecStage:
    """Where a real decoder would live.  __init__ is the once-per-actor
    codec/model load; __call__ the per-batch decode."""

    def __init__(self, kind: str = "image"):
        self.kind = kind
        # e.g. self.decoder = PIL.Image / soundfile / pyav — not in
        # this container:
        self.decoder = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "media codecs (PIL/soundfile/pyav) are not available in this "
            "environment; use FakeFeatureExtractor for plumbing tests"
        )


class FakeFeatureExtractor:
    """Deterministic stand-in decoder: payload bytes -> FEATURE_DIM
    float32 vector derived from a seeded hash of the payload.  Exactly
    the actor signature / batch shape a real extractor would have."""

    def __init__(self, dim: int = FEATURE_DIM, seed: int = 42):
        self.dim = dim
        self.seed = seed

    def _features(self, payload: bytes) -> np.ndarray:
        h = pd.util.hash_array(np.array([payload], dtype=object))[0]
        rng = np.random.default_rng(np.random.PCG64(int(h) ^ self.seed))
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def extract_features(
    media: Dataset, concurrency: int = 4, extractor=FakeFeatureExtractor
) -> Dataset:
    """media table -> (media_id, kind, feature list<float32>)."""
    return media.map_batches(
        extractor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency),
    )


class FrameSampler:
    """Video -> sampled frame rows (1 row per sampled frame).  The
    decode is the deterministic fake (slices of payload bytes); the
    fan-out layout (one input row -> N output rows) is real."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, ts = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            n = max(1, int((dur or 0) // self.every_ms))
            step = max(1, len(payload) // n) if payload else 1
            for i in range(n):
                ids.append(mid)
                ts.append(i * self.every_ms)
                frames.append(payload[i * step:(i + 1) * step] if payload else b"")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_ts_ms": pa.array(ts, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(media: Dataset, every_ms: int = 1000, concurrency: int = 2) -> Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency),
    )


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.bytes(int(rng.integers(64, 512))) for _ in range(n)]
    return pa.table(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds,
            "payload": pa.array(payloads, pa.binary()),
            "mime": np.where(kinds == "image", "image/png", "application/octet-stream"),
            "width": rng.integers(16, 256, n).astype(np.int32),
            "height": rng.integers(16, 256, n).astype(np.int32),
            "duration_ms": np.where(
                kinds == "video", rng.integers(1000, 10_000, n), 0
            ).astype(np.int64),
        },
        schema=MEDIA_SCHEMA,
    )
