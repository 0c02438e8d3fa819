"""Real stdlib media codecs (functions/codecs.py): PNG round-trips, all five
PNG scanline filters invert correctly, WAV round-trips — plus the 2x2-PNG
golden through the full image_features operator (bytes checked in)."""

import struct
import zlib

import numpy as np
import pytest

from automatedreclin_spark.functions.codecs import (
    PNG_SIGNATURE,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    is_png,
    is_wav,
)

# Real 2x2 RGB PNG: [[red, green], [blue, white]] — bytes pinned so the test
# exercises decode of on-disk content, not just our own encoder output.
PNG_2X2 = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000002000000020802000000fdd49a73"
    "0000001249444154789c63f8cfc0c000c20cff8100001fee05fb0bd9688b"
    "0000000049454e44ae426082"
)
PX_2X2 = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)


def test_png_2x2_golden_bytes():
    assert is_png(PNG_2X2)
    assert (decode_png(PNG_2X2) == PX_2X2).all()


@pytest.mark.parametrize("shape", [(1, 1, 1), (2, 2, 3), (7, 5, 4), (16, 16, 3)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(sum(shape))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()


def _encode_with_filter(arr: np.ndarray, filter_type: int) -> bytes:
    """Hand-build a PNG whose every scanline uses ``filter_type`` — applies
    the PNG filter forward per spec so decode_png's inverse is tested against
    an independent forward implementation."""
    h, w, c = arr.shape
    bpp = c
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int64)
    out = b""
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        filt = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (cur[x] - pred) & 0xFF
        out += bytes([filter_type]) + bytes(filt.astype(np.uint8))
        prev = cur

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(out)) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_all_filters_invert(filter_type):
    rng = np.random.default_rng(filter_type + 10)
    arr = rng.integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    assert (decode_png(_encode_with_filter(arr, filter_type)) == arr).all()


def test_wav_roundtrip():
    rng = np.random.default_rng(5)
    samples = np.clip(rng.standard_normal(4000) * 0.3, -1, 1)
    data = encode_wav(samples, 16000)
    assert is_wav(data)
    back, rate = decode_wav(data)
    assert rate == 16000
    assert len(back) == 4000
    # PCM16 truncation (1/32767) + the 32767-encode/32768-decode scale
    assert np.abs(back - samples).max() < 1e-4


def test_image_features_png_golden(spark):
    """The full Spark operator over a REAL 2x2 PNG: dimensions come from the
    decoded image (not metadata), luma stats match the hand-computed golden
    (luma = [[85, 85], [85, 255]] -> mean 127.5, std 73.612159)."""
    import pandas as pd

    from automatedreclin_spark.ops.multimodal import MEDIA_SCHEMA, image_features

    media = spark.createDataFrame(pd.DataFrame([{
        "media_id": 1, "kind": "image", "content": PNG_2X2,
        "meta": {"width": 99, "height": 99, "channels": 3, "sample_rate": 0,
                 "duration_ms": 0, "codec": "png"},   # wrong on purpose
    }]), schema=MEDIA_SCHEMA)
    out = image_features(media, resize_to=2).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["width"], row["height"]) == (2, 2)    # decoded, not meta
    assert row["mean_luma"] == pytest.approx(127.5, abs=1e-9)
    assert row["std_luma"] == pytest.approx(73.612159, abs=1e-6)


def test_audio_features_real_wav(spark):
    """audio_features over a REAL PCM16 WAV: RMS of a 0.5-amplitude sine is
    0.5/sqrt(2) ~ 0.3536 — a value the fake byte-stream path could never
    produce from these bytes."""
    import pandas as pd

    from automatedreclin_spark.ops.multimodal import MEDIA_SCHEMA, audio_features

    t = np.arange(16000) / 16000.0
    data = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), 16000)
    media = spark.createDataFrame(pd.DataFrame([{
        "media_id": 7, "kind": "audio", "content": data,
        "meta": {"width": 0, "height": 0, "channels": 1, "sample_rate": 16000,
                 "duration_ms": 1000, "codec": "pcm16"},
    }]), schema=MEDIA_SCHEMA)
    out = audio_features(media).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert out.iloc[0]["n_samples"] == 16000
