"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode resolution order per modality (functions/codecs.py):

- image: REAL stdlib PNG decoder (zlib inflate + scanline unfiltering — no
  external libs needed) → Pillow if installed → deterministic fake for
  other formats (clearly marked; this container has no image libraries).
- audio: REAL stdlib WAV/PCM decoder (``wave`` module) → deterministic
  byte-stream interpretation for other codecs.
- video: deterministic fake only (no pure-stdlib codec exists for any
  mainstream video format); the sampling arithmetic and fan-out are real.

Media table schema (the ``binary`` + typed-metadata convention):
    media(media_id long, kind string, content binary,
          meta struct<width:int, height:int, channels:int,
                      sample_rate:int, duration_ms:long, codec:string>)
"""

from __future__ import annotations

import hashlib
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from automatedreclin_spark.functions import codecs

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ])),
])


def _try_real_image_decoder():
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401
        return True
    except ImportError:
        return False

HAS_PIL = _try_real_image_decoder()


def _fake_decode(content: bytes, h: int, w: int, c: int) -> np.ndarray:
    """DETERMINISTIC FAKE decoder: derives pixel bytes from sha256 of the
    content — stands in for a real codec so the distributed plumbing
    (batching, shapes, feature math) is fully exercised."""
    seed = int.from_bytes(hashlib.sha256(content or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def decode_image(content: bytes, meta: dict, fallback_size: int = 32) -> np.ndarray:
    """Decode image bytes to (H, W, C) uint8.

    PNG bytes take the REAL stdlib decoder; Pillow handles other formats when
    installed; anything else falls back to the deterministic fake sized from
    the metadata (marked — feature values for non-PNG content without Pillow
    are synthetic)."""
    content = bytes(content or b"")
    if codecs.is_png(content):
        try:
            return codecs.decode_png(content)
        except (ValueError, zlib.error, struct.error, IndexError):
            pass  # exotic/corrupt PNG (bad deflate stream, truncated
            # chunks) → fall through to the fake, don't kill the task
    if HAS_PIL:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
        return img if img.ndim == 3 else img[:, :, None]
    h = int(meta.get("height") or fallback_size) or fallback_size
    w = int(meta.get("width") or fallback_size) or fallback_size
    c = int(meta.get("channels") or 3) or 3
    return _fake_decode(content, h, w, c)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests. Image rows carry REAL
    PNG bytes and audio rows REAL PCM16 WAV bytes (functions/codecs.py
    encoders), so the feature operators exercise the real decode paths;
    video content stays opaque bytes (fake-decoded downstream)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            h, w = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            content = codecs.encode_png(pixels)
            meta = {"width": w, "height": h, "channels": 3, "sample_rate": 0,
                    "duration_ms": 0, "codec": "png"}
        elif kind == "audio":
            dur_ms = int(rng.integers(1000, 60000))
            t = np.arange(int(16000 * dur_ms / 1000) % 48000 + 1600) / 16000.0
            wave_f = float(rng.uniform(100, 1000))
            samples = 0.5 * np.sin(2 * np.pi * wave_f * t) \
                + 0.05 * rng.standard_normal(len(t))
            content = codecs.encode_wav(samples, 16000)
            meta = {"width": 0, "height": 0, "channels": 1,
                    "sample_rate": 16000, "duration_ms": dur_ms,
                    "codec": "pcm16"}
        else:
            content = bytes(rng.integers(0, 256, size=int(rng.integers(128, 1024)),
                                         dtype=np.uint8))
            meta = {"width": int(rng.integers(16, 64)),
                    "height": int(rng.integers(16, 64)), "channels": 3,
                    "sample_rate": 0,
                    "duration_ms": int(rng.integers(1000, 60000)),
                    "codec": "h264"}
        rows.append({"media_id": i, "kind": kind, "content": content, "meta": meta})
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, std_luma double, "
    "phash long"
)


def image_features(media: DataFrame, resize_to: int = 32) -> DataFrame:
    """Decode → resize → luminance stats + perceptual-hash-style signature,
    as an Arrow-batched mapInPandas over image rows.

    With a real codec the decode line is the only change; everything
    downstream (resize by slicing, vectorized stats, bit-packing) is live
    numpy exercised by the tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                img = decode_image(bytes(row.content), dict(row.meta),
                                   fallback_size=resize_to)
                h, w = img.shape[0], img.shape[1]
                # nearest-neighbor resize to resize_to×resize_to
                yi = (np.arange(resize_to) * h // resize_to)
                xi = (np.arange(resize_to) * w // resize_to)
                small = img[yi][:, xi]
                luma = small.astype(np.float64).mean(axis=2)
                mean, std = float(luma.mean()), float(luma.std())
                bits = (luma > luma.mean()).flatten()[:64]
                phash = int(np.packbits(bits).tobytes()[:8].hex() or "0", 16) - (1 << 63)
                out.append({
                    "media_id": row.media_id, "width": w, "height": h,
                    "mean_luma": round(mean, 6), "std_luma": round(std, 6),
                    "phash": phash,
                })
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame_sha string"


def video_frame_sample(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling plan + (stubbed) frame extraction: one output row per
    sampled timestamp. The sampling arithmetic and batch fan-out are real;
    the frame bytes are the deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                duration = int(row.meta["duration_ms"] or 0)
                for i, ts in enumerate(range(0, duration, every_ms)):
                    frame = _fake_decode(bytes(row.content) + ts.to_bytes(8, "big"), 8, 8, 3)
                    out.append({
                        "media_id": row.media_id, "frame_idx": i, "ts_ms": ts,
                        "frame_sha": hashlib.sha256(frame.tobytes()).hexdigest(),
                    })
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=["media_id", "frame_idx", "ts_ms", "frame_sha"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = "media_id long, n_samples long, rms double, zero_crossings long"


def audio_features(media: DataFrame) -> DataFrame:
    """Sample-stream stats (RMS, zero crossings). WAV content takes the REAL
    stdlib PCM decoder; other codecs use the deterministic raw-byte
    interpretation (marked fallback)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                content = bytes(row.content)
                x = None
                if codecs.is_wav(content):
                    try:
                        x, _rate = codecs.decode_wav(content)
                    except (wave.Error, EOFError, ValueError, struct.error):
                        x = None  # malformed RIFF → raw-byte fallback
                if x is None:
                    raw = np.frombuffer(content, dtype=np.uint8).astype(np.float64)
                    x = (raw - 127.5) / 127.5
                zc = int(((x[:-1] * x[1:]) < 0).sum())
                out.append({
                    "media_id": row.media_id, "n_samples": len(x),
                    "rms": round(float(np.sqrt((x ** 2).mean())), 6) if len(x) else 0.0,
                    "zero_crossings": zc,
                })
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )
