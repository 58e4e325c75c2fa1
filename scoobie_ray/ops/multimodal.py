"""Multimodal column operators — decode / feature-extract / resize /
frame-sample stages over opaque binary media payloads.

Media rides as opaque ``binary`` columns (or ``media_ref`` pointers in the
interleaved span model) with typed metadata.  The codec layer is REAL for
the dependency-free formats (no image/audio libraries exist in this
container, so the kernels are implemented directly):

- images: PPM (P6 binary / P3 ascii), PGM (P5) and uncompressed 24-bit
  BMP decode to ``(H, W, 3) uint8`` numpy; features are a real 4×4-grid
  color/contrast descriptor; resize is numpy nearest-neighbor with PPM
  re-encode;
- audio: RIFF/WAV 16-bit PCM via the stdlib ``wave`` module; features are
  real windowed RMS-energy + zero-crossing-rate descriptors;
- video: a concatenated-PPM frame stream (the synthetic container used by
  the fixtures) demuxes for real; general containers (mp4 …) still need a
  demuxer library.

For payloads in formats that DO need external codecs (JPEG, MP3, MP4 …),
the stages raise ``NotImplementedError`` unless ``fake=True``, which
substitutes a deterministic digest-seeded fake so downstream plumbing is
exercisable.

Batch-size guidance (SURVEY.md §7.4 "wide rows"): with B-byte payloads,
choose batch_size so batch_size × B × concurrency stays well under worker
heap; callers pass e.g. ``batch_size=32`` for multi-MB images.
"""

from __future__ import annotations

import hashlib
import io
import re
import struct

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
    """Deterministic pseudo-features from a payload digest (fake path)."""
    h = hashlib.sha256(seed_bytes).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(n).astype(np.float32)


# ---------------------------------------------------------------------------
# real codecs (dependency-free formats)

_PNM_HEADER_RE = re.compile(rb"^(P[3566])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s")


def decode_pnm(payload: bytes) -> np.ndarray | None:
    """PPM P6/P3 (RGB) or PGM P5 (gray, expanded to RGB) -> (H, W, 3)
    uint8; None if not a PNM payload."""
    m = _PNM_HEADER_RE.match(payload)
    if not m:
        return None
    magic, w, h, maxval = m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxval > 255:
        return None
    body = payload[m.end():]
    if magic == b"P6":
        arr = np.frombuffer(body[: w * h * 3], dtype=np.uint8)
        if arr.size < w * h * 3:
            return None
        return arr.reshape(h, w, 3).copy()
    if magic == b"P5":
        arr = np.frombuffer(body[: w * h], dtype=np.uint8)
        if arr.size < w * h:
            return None
        return np.repeat(arr.reshape(h, w, 1), 3, axis=2)
    if magic == b"P3":
        vals = np.array(body.split()[: w * h * 3], dtype=np.uint8)
        if vals.size < w * h * 3:
            return None
        return vals.reshape(h, w, 3)
    return None


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BMP -> (H, W, 3) uint8 RGB; None otherwise."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        return None
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0  # positive height = bottom-up row order
    h_abs = abs(h)
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_off + row_size * h_abs
    if len(payload) < need:
        return None
    rows = np.frombuffer(payload[data_off:need], dtype=np.uint8).reshape(h_abs, row_size)
    bgr = rows[:, : w * 3].reshape(h_abs, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


def decode_image(payload: bytes) -> np.ndarray | None:
    """Best-effort real decode (PNM / BMP); None for other formats."""
    return decode_pnm(payload) if payload[:1] == b"P" else decode_bmp(payload)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAV 16-bit PCM -> (mono float32 samples in [-1, 1], rate)."""
    if payload[:4] != b"RIFF":
        return None
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                return None
            n = wf.getnframes()
            raw = wf.readframes(n)
            rate = wf.getframerate()
            ch = wf.getnchannels()
    except Exception:
        return None
    samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    if ch > 1:
        samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return samples, rate


def image_features(img: np.ndarray, dim: int = IMAGE_FEATURE_DIM) -> np.ndarray:
    """Real 4×4-grid descriptor: per cell mean R, G, B + gray std
    (= 64 floats), all values scaled to [0, 1]-ish."""
    grid = 4
    h, w = img.shape[:2]
    feats = np.empty((grid, grid, 4), dtype=np.float32)
    ys = np.linspace(0, h, grid + 1, dtype=np.int64)
    xs = np.linspace(0, w, grid + 1, dtype=np.int64)
    for gy in range(grid):
        for gx in range(grid):
            cell = img[ys[gy] : max(ys[gy + 1], ys[gy] + 1), xs[gx] : max(xs[gx + 1], xs[gx] + 1)]
            cellf = cell.reshape(-1, 3).astype(np.float32) / 255.0
            feats[gy, gx, :3] = cellf.mean(axis=0)
            feats[gy, gx, 3] = float(cellf.mean(axis=1).std())
    out = feats.reshape(-1)
    if len(out) != dim:
        out = np.resize(out, dim)
    return out


def audio_features(samples: np.ndarray, dim: int = AUDIO_FEATURE_DIM) -> np.ndarray:
    """Real windowed descriptor: RMS energy over dim/2 windows + zero
    crossing rate over dim/2 windows."""
    half = dim // 2
    n = max(1, len(samples))
    bounds = np.linspace(0, n, half + 1, dtype=np.int64)
    rms = np.empty(half, dtype=np.float32)
    zcr = np.empty(half, dtype=np.float32)
    for i in range(half):
        seg = samples[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        if len(seg) == 0:
            seg = np.zeros(1, dtype=np.float32)
        rms[i] = float(np.sqrt(np.mean(seg * seg)))
        zcr[i] = float(np.mean(np.abs(np.diff(np.signbit(seg).astype(np.int8))))) if len(seg) > 1 else 0.0
    return np.concatenate([rms, zcr])


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Demux the synthetic concatenated-PPM 'video' container: a sequence
    of back-to-back P6 documents."""
    frames = []
    pos = 0
    while pos < len(payload):
        m = _PNM_HEADER_RE.match(payload[pos:])
        if not m or m.group(1) != b"P6":
            break
        w, h = int(m.group(2)), int(m.group(3))
        end = pos + m.end() + w * h * 3
        if end > len(payload):
            break
        frames.append(payload[pos:end])
        pos = end
    return frames


# ---------------------------------------------------------------------------
# stages


class DecodeImage:
    """Actor-pool stage: payload -> decoded dims + feature vector.

    PNM/BMP payloads decode for REAL (dims from the header, features from
    the pixels); other formats raise unless ``fake=True`` substitutes the
    digest fake.  Codec state (nothing heavy here, but the contract
    stands) is constructed once per actor."""

    def __init__(self, fake: bool = False, feature_dim: int = IMAGE_FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_dims = "width" in batch.column_names
        w_col = batch["width"].to_pylist() if has_dims else [0] * len(batch)
        h_col = batch["height"].to_pylist() if has_dims else [0] * len(batch)
        feats, widths, heights = [], [], []
        for p, w0, h0 in zip(batch["payload"].to_pylist(), w_col, h_col):
            img = decode_image(p) if p else None
            if img is not None:
                feats.append(image_features(img, self.feature_dim).tolist())
                heights.append(img.shape[0])
                widths.append(img.shape[1])
            elif self.fake:
                feats.append(_digest_floats(p or b"", self.feature_dim).tolist())
                widths.append(w0)
                heights.append(h0)
            else:
                raise NotImplementedError(
                    "payload is not PNM/BMP; decoding other image formats "
                    "requires a codec library not present in this "
                    "environment (construct with fake=True for the "
                    "deterministic test double)"
                )
        out = batch.append_column(
            "image_features", pa.array(feats, pa.list_(pa.float32()))
        )
        if not has_dims:
            return out
        out = out.set_column(
            out.schema.get_field_index("width"), "width", pa.array(widths, pa.int32())
        )
        return out.set_column(
            out.schema.get_field_index("height"), "height", pa.array(heights, pa.int32())
        )


class ResizeImage:
    """Nearest-neighbor resize for PNM/BMP payloads (numpy index gather),
    re-encoded as binary PPM; other formats need ``fake=True``."""

    def __init__(self, target_w: int, target_h: int, fake: bool = False):
        self.target = (target_w, target_h)
        self.fake = fake

    def _resize(self, img: np.ndarray) -> np.ndarray:
        tw, th = self.target
        h, w = img.shape[:2]
        yi = np.minimum((np.arange(th) * h) // th, h - 1)
        xi = np.minimum((np.arange(tw) * w) // tw, w - 1)
        return img[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        payloads = []
        for p in batch["payload"].to_pylist():
            img = decode_image(p) if p else None
            if img is not None:
                payloads.append(encode_ppm(self._resize(img)))
            elif self.fake:
                payloads.append(p)
            else:
                raise NotImplementedError(
                    "resize of non-PNM/BMP payloads requires an image library"
                )
        out = batch.set_column(
            batch.schema.get_field_index("payload"),
            "payload",
            pa.array(payloads, pa.binary()),
        )
        out = out.set_column(
            out.schema.get_field_index("width"),
            "width",
            pa.array([self.target[0]] * n, pa.int32()),
        )
        return out.set_column(
            out.schema.get_field_index("height"),
            "height",
            pa.array([self.target[1]] * n, pa.int32()),
        )


class SampleFrames:
    """Video frame sampling: emits one row per sampled frame (media_ref,
    frame_idx, ts_ms, frame payload).  The synthetic concatenated-PPM
    container demuxes for real (every k-th frame per ``fps`` against the
    declared duration); general containers need ``fake=True`` (rows
    without payloads, timing-only contract)."""

    def __init__(self, fps: float = 1.0, fake: bool = False):
        self.fps = fps
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, tss, frames = [], [], [], []
        for ref, p, dur in zip(
            batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            stream = split_ppm_stream(p) if p else []
            if stream:
                # declared duration wins; absent metadata falls back to
                # one source frame per 1/fps
                dur_s = (dur / 1000.0) if dur else len(stream) / max(self.fps, 1e-9)
                n = max(1, int(dur_s * self.fps))
                src_fps = len(stream) / dur_s
                for i in range(n):
                    ts = i / self.fps
                    fi = min(int(ts * src_fps), len(stream) - 1)
                    refs.append(ref)
                    idxs.append(fi)
                    tss.append(int(ts * 1000))
                    frames.append(stream[fi])
            elif self.fake:
                n = max(1, int((dur or 0) / 1000 * self.fps))
                for i in range(n):
                    refs.append(ref)
                    idxs.append(i)
                    tss.append(int(i * 1000 / self.fps))
                    frames.append(None)
            else:
                raise NotImplementedError(
                    "payload is not a concatenated-PPM stream; demuxing real "
                    "video containers requires a library not present here"
                )
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_ms": pa.array(tss, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


class ExtractAudioFeatures:
    """WAV 16-bit PCM payloads get REAL windowed RMS/ZCR features; other
    formats need ``fake=True``."""

    def __init__(self, fake: bool = False, feature_dim: int = AUDIO_FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            decoded = decode_wav(p) if p else None
            if decoded is not None:
                feats.append(audio_features(decoded[0], self.feature_dim).tolist())
            elif self.fake:
                feats.append(_digest_floats(p or b"", self.feature_dim).tolist())
            else:
                raise NotImplementedError(
                    "payload is not RIFF/WAV PCM; other audio formats "
                    "require a codec library not present here"
                )
        return batch.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float32()))
        )


def media_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
