"""Real dependency-free multimodal codecs: PPM/PGM/BMP decode, numpy
nearest-neighbor resize with PPM re-encode, WAV PCM decode + windowed
RMS/ZCR features, concatenated-PPM video demux — payloads constructed
byte-by-byte in the test, no image/audio libraries involved."""

import io
import struct
import wave

import numpy as np
import pytest

from scoobie_ray.ops.multimodal import (
    DecodeImage,
    ExtractAudioFeatures,
    ResizeImage,
    SampleFrames,
    audio_features,
    decode_bmp,
    decode_image,
    decode_pnm,
    decode_wav,
    encode_ppm,
    image_features,
    media_table,
    split_ppm_stream,
)


def _img(h, w, rgb):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = rgb
    return img


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Hand-rolled 24-bit uncompressed BMP (bottom-up, padded rows)."""
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # BGR
        data += row + b"\x00" * (row_size - len(row))
    pixel_off = 54
    file_size = pixel_off + len(data)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(data)


def _wav_bytes(samples: np.ndarray, rate=8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((samples * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_and_bmp_decode():
    img = _img(4, 6, (10, 200, 30))
    img[0, 0] = (255, 0, 0)
    ppm = encode_ppm(img)
    assert np.array_equal(decode_pnm(ppm), img)
    bmp = _bmp_bytes(img)
    assert np.array_equal(decode_bmp(bmp), img)
    assert np.array_equal(decode_image(bmp), img)
    # PGM gray expands to 3 channels
    pgm = b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255])
    g = decode_pnm(pgm)
    assert g.shape == (2, 2, 3) and g[1, 1, 0] == 255
    assert decode_pnm(b"nonsense") is None
    assert decode_bmp(b"BMshort") is None


def test_decode_image_stage_real_features():
    red = encode_ppm(_img(8, 8, (255, 0, 0)))
    blue = _bmp_bytes(_img(8, 8, (0, 0, 255)))
    t = media_table(
        [
            {"media_ref": "m1", "kind": "image", "payload": red, "width": 0, "height": 0, "duration_ms": 0},
            {"media_ref": "m2", "kind": "image", "payload": blue, "width": 0, "height": 0, "duration_ms": 0},
        ]
    )
    out = DecodeImage()(t)  # no fake needed: real decode
    assert out["width"].to_pylist() == [8, 8]
    f1 = np.array(out["image_features"].to_pylist()[0]).reshape(4, 4, 4)
    f2 = np.array(out["image_features"].to_pylist()[1]).reshape(4, 4, 4)
    assert np.allclose(f1[..., 0], 1.0) and np.allclose(f1[..., 2], 0.0)  # red cells
    assert np.allclose(f2[..., 2], 1.0) and np.allclose(f2[..., 0], 0.0)  # blue cells


def test_resize_real():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = (255, 255, 255)  # top-left white quadrant
    t = media_table(
        [{"media_ref": "m", "kind": "image", "payload": encode_ppm(img), "width": 4, "height": 4, "duration_ms": 0}]
    )
    out = ResizeImage(8, 8)(t)
    assert out["width"].to_pylist() == [8] and out["height"].to_pylist() == [8]
    resized = decode_pnm(out["payload"].to_pylist()[0])
    assert resized.shape == (8, 8, 3)
    assert resized[0, 0, 0] == 255 and resized[7, 7, 0] == 0


def test_wav_decode_and_features():
    tsig = np.linspace(0, 1, 8000, endpoint=False)
    loud = np.sin(2 * np.pi * 440 * tsig) * 0.9
    quiet = np.sin(2 * np.pi * 440 * tsig) * 0.05
    samples = np.concatenate([loud[:4000], quiet[:4000]]).astype(np.float32)
    payload = _wav_bytes(samples)
    dec = decode_wav(payload)
    assert dec is not None
    got, rate = dec
    assert rate == 8000 and len(got) == 8000
    assert np.allclose(got, samples, atol=2e-4)
    feats = audio_features(got)
    assert len(feats) == 32
    # loud first half -> higher RMS in early windows than late
    assert feats[0] > feats[15] * 5


def test_audio_stage_real():
    payload = _wav_bytes(np.zeros(1000, dtype=np.float32))
    t = media_table(
        [{"media_ref": "a", "kind": "audio", "payload": payload, "width": 0, "height": 0, "duration_ms": 125}]
    )
    out = ExtractAudioFeatures()(t)
    assert np.allclose(out["audio_features"].to_pylist()[0], 0.0)
    bad = media_table(
        [{"media_ref": "b", "kind": "audio", "payload": b"mp3data", "width": 0, "height": 0, "duration_ms": 0}]
    )
    with pytest.raises(NotImplementedError):
        ExtractAudioFeatures()(bad)


def test_sample_frames_ppm_stream():
    frames = [encode_ppm(_img(2, 2, (i * 20, 0, 0))) for i in range(10)]
    stream = b"".join(frames)
    assert len(split_ppm_stream(stream)) == 10
    t = media_table(
        [{"media_ref": "v", "kind": "video", "payload": stream, "width": 2, "height": 2, "duration_ms": 5000}]
    )
    out = SampleFrames(fps=1.0)(t)  # 5s at 1fps -> 5 sampled frames
    rows = out.to_pylist()
    assert len(rows) == 5
    assert rows[0]["frame_idx"] == 0 and rows[-1]["frame_idx"] == 8
    # sampled frame payloads decode back to images
    assert decode_pnm(rows[2]["frame"]).shape == (2, 2, 3)


def test_media_pipeline_with_real_payloads(ray_session):
    """End-to-end through Ray Data: binary payload column, small batches,
    actor-pool decode stage."""
    import ray.data

    rows = [
        {
            "media_ref": f"m{i}",
            "kind": "image",
            "payload": encode_ppm(_img(6, 6, (i * 10 % 256, 100, 50))),
            "width": 0,
            "height": 0,
            "duration_ms": 0,
        }
        for i in range(20)
    ]
    ds = ray.data.from_arrow(media_table(rows))
    out = ds.map_batches(
        DecodeImage, batch_size=4, batch_format="pyarrow", concurrency=2
    ).take_all()
    assert len(out) == 20
    assert all(len(r["image_features"]) == 64 for r in out)
    assert all(r["width"] == 6 for r in out)
