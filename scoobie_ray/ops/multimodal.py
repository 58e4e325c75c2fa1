"""Multimodal column plumbing — decode / feature-extract / resize /
frame-sample stages over opaque binary media payloads.

Media rides as opaque ``binary`` columns (or ``media_ref`` pointers in the
interleaved span model) with typed metadata.  The Ray-side plumbing —
schema contracts, actor-pool signatures, small batch sizes for wide binary
rows, output layout — is real and tested; the codec kernels themselves are
STUBBED (no image/audio libraries in this container): `DecodeImage` etc.
raise ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake (seeded by the payload digest) produces stable feature
vectors so downstream stages are exercisable end-to-end.

Batch-size guidance (SURVEY.md §7.4 "wide rows"): with B-byte payloads,
choose batch_size so batch_size × B × concurrency stays well under worker
heap; callers pass e.g. ``batch_size=32`` for multi-MB images.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_FEATURE_DIM = 64
AUDIO_FEATURE_DIM = 32

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _digest_floats(seed_bytes: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-features from a payload digest."""
    h = hashlib.sha256(seed_bytes).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(n).astype(np.float32)


class DecodeImage:
    """Actor-pool stage: payload -> decoded dims + feature vector.

    Real codec work would load the decoder once here in ``__init__``
    (the load-once actor contract); ``fake=True`` substitutes the
    deterministic digest-based fake."""

    def __init__(self, fake: bool = False, feature_dim: int = IMAGE_FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an image codec library not present "
                "in this environment; construct with fake=True for the "
                "deterministic test double"
            )
        feats = [
            _digest_floats(p or b"", self.feature_dim).tolist()
            for p in batch["payload"].to_pylist()
        ]
        return batch.append_column(
            "image_features", pa.array(feats, pa.list_(pa.float32()))
        )


class ResizeImage:
    """Stub resize stage: contract only (w, h) -> (target_w, target_h)."""

    def __init__(self, target_w: int, target_h: int, fake: bool = False):
        self.target = (target_w, target_h)
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an image library")
        n = len(batch)
        return batch.set_column(
            batch.schema.get_field_index("width"),
            "width",
            pa.array([self.target[0]] * n, pa.int32()),
        ).set_column(
            batch.schema.get_field_index("height"),
            "height",
            pa.array([self.target[1]] * n, pa.int32()),
        )


class SampleFrames:
    """Video frame sampling contract: emits one row per sampled frame
    (media_ref, frame_idx, ts_ms) — explode layout used by real pipelines."""

    def __init__(self, fps: float = 1.0, fake: bool = False):
        self.fps = fps
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("frame sampling requires a video library")
        refs, idxs, tss = [], [], []
        for ref, dur in zip(
            batch["media_ref"].to_pylist(), batch["duration_ms"].to_pylist()
        ):
            n = max(1, int((dur or 0) / 1000 * self.fps))
            for i in range(n):
                refs.append(ref)
                idxs.append(i)
                tss.append(int(i * 1000 / self.fps))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_ms": pa.array(tss, pa.int32()),
            }
        )


class ExtractAudioFeatures:
    def __init__(self, fake: bool = False, feature_dim: int = AUDIO_FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("audio features require an audio library")
        feats = [
            _digest_floats(p or b"", self.feature_dim).tolist()
            for p in batch["payload"].to_pylist()
        ]
        return batch.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float32()))
        )


def media_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
