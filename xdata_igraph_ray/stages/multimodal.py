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


# ---------------------------------------------------------------------------
# REAL codecs for container-friendly formats.  PPM (P6) and WAV (PCM16)
# decode with numpy + the stdlib alone, so this path is a real decode ->
# feature pipeline, not a stub; RealCodecStage above remains the honest
# NotImplementedError for formats that need external libraries
# (JPEG/PNG/MP4).


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 (pure numpy parse)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end:end + 1].isspace():
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, _maxval = parts
    px = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float [-1, 1] mono -> WAV PCM16 bytes (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM16 -> (float samples, rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    return np.frombuffer(raw, "<i2").astype(np.float64) / 32767.0, rate


_VID_MAGIC = b"XRV0"


def encode_rawvideo(frames: list[np.ndarray]) -> bytes:
    """Concatenated-PPM 'video': magic + frame count + u32 sizes."""
    blobs = [encode_ppm(f) for f in frames]
    head = _VID_MAGIC + np.uint32(len(blobs)).tobytes()
    sizes = np.array([len(b) for b in blobs], "<u4").tobytes()
    return head + sizes + b"".join(blobs)


def decode_rawvideo_frames(payload: bytes) -> list[bytes]:
    if not payload.startswith(_VID_MAGIC):
        raise ValueError("not an XRV0 raw video")
    nf = int(np.frombuffer(payload, "<u4", count=1, offset=4)[0])
    sizes = np.frombuffer(payload, "<u4", count=nf, offset=8)
    out = []
    pos = 8 + 4 * nf
    for s in sizes:
        out.append(payload[pos:pos + int(s)])
        pos += int(s)
    return out


class ImageFeatureExtractor:
    """REAL decode -> feature stage for PPM images: per-channel
    mean/std + a 16-bin luminance histogram + dimensions, padded to
    ``dim`` (deterministic, pure numpy; once-per-actor init)."""

    def __init__(self, dim: int = FEATURE_DIM):
        self.dim = dim

    def features_of(self, payload: bytes) -> np.ndarray:
        px = decode_ppm(payload).astype(np.float64)
        lum = px.mean(axis=2)
        hist, _ = np.histogram(lum, bins=16, range=(0, 255))
        f = np.concatenate(
            (
                px.reshape(-1, 3).mean(axis=0) / 255.0,
                px.reshape(-1, 3).std(axis=0) / 255.0,
                hist / max(lum.size, 1),
                [px.shape[0] / 4096.0, px.shape[1] / 4096.0],
            )
        )
        out = np.zeros(self.dim, np.float32)
        out[:len(f)] = f
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.features_of(p) for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class AudioFeatureExtractor:
    """REAL decode -> feature stage for WAV PCM16: RMS, zero-crossing
    rate, 16-bin |FFT| band energies, duration."""

    def __init__(self, dim: int = FEATURE_DIM):
        self.dim = dim

    def features_of(self, payload: bytes) -> np.ndarray:
        x, rate = decode_wav(payload)
        rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
        zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        spec = np.abs(np.fft.rfft(x))
        bands = np.array_split(spec, 16)
        be = np.array([b.mean() if len(b) else 0.0 for b in bands])
        be = be / (be.sum() + 1e-12)
        f = np.concatenate(([rms, zcr, len(x) / rate / 60.0], be))
        out = np.zeros(self.dim, np.float32)
        out[:len(f)] = f
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.features_of(p) for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class RealFrameSampler:
    """XRV0 raw video -> one PPM frame row per sampled frame."""

    def __init__(self, every_n: int = 1):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for i, fr in enumerate(decode_rawvideo_frames(payload)):
                if i % self.every_n == 0:
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(idxs, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def synth_media_real(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL media table: decodable PPM images, WAV PCM16
    audio, XRV0 raw videos (pure function of (n, seed))."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads, mimes, widths, heights, durs = [], [], [], [], []
    for i in range(n):
        if kinds[i] == "image":
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            grad = np.linspace(0, 255, w)[None, :, None]
            px = (
                grad + rng.integers(0, 64, (h, w, 3))
            ).clip(0, 255).astype(np.uint8)
            payloads.append(encode_ppm(px))
            mimes.append("image/x-portable-pixmap")
            widths.append(w)
            heights.append(h)
            durs.append(0)
        elif kinds[i] == "audio":
            dur_s = float(rng.uniform(0.05, 0.3))
            t = np.arange(int(16000 * dur_s)) / 16000.0
            freq = float(rng.uniform(100, 2000))
            x = 0.5 * np.sin(2 * np.pi * freq * t) \
                + 0.1 * rng.standard_normal(len(t))
            payloads.append(encode_wav(x))
            mimes.append("audio/wav")
            widths.append(0)
            heights.append(0)
            durs.append(int(dur_s * 1000))
        else:
            nf = int(rng.integers(2, 6))
            frames = [
                rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
                for _ in range(nf)
            ]
            payloads.append(encode_rawvideo(frames))
            mimes.append("video/x-raw-ppm")
            widths.append(8)
            heights.append(8)
            durs.append(nf * 1000)
    return pa.table(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds,
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durs, pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_and_featurize(media: Dataset, concurrency: int = 4) -> Dataset:
    """Kind-routed REAL decode + features: images through the PPM
    extractor, audio through WAV, videos through frame-sampling + PPM
    on their first frame — one actor-pool stage per modality, unioned."""
    import pyarrow.compute as pc
    import ray.data as rd

    images = media.filter(expr="kind == 'image'").map_batches(
        ImageFeatureExtractor, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=(1, concurrency),
    )
    audio = media.filter(expr="kind == 'audio'").map_batches(
        AudioFeatureExtractor, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=(1, concurrency),
    )

    class _FirstFrame:
        def __init__(self):
            self.img = ImageFeatureExtractor()

        def __call__(self, batch: pa.Table) -> pa.Table:
            feats = [
                self.img.features_of(decode_rawvideo_frames(p)[0])
                for p in batch["payload"].to_pylist()
            ]
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "feature": pa.array(
                        [f.tolist() for f in feats], pa.list_(pa.float32())
                    ),
                }
            )

    video = media.filter(expr="kind == 'video'").map_batches(
        _FirstFrame, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=(1, concurrency),
    )
    return images.union(audio).union(video)
