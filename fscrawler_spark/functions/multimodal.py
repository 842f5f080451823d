"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` /
pandas UDFs.

The container has no image/audio libraries, so the DECODERS are
stubbed: real codec paths raise ``NotImplementedError`` behind an
import-try (drop-in once PIL/libsndfile/av are present), and a
clearly-marked DETERMINISTIC FAKE format stands in so the Spark-side
plumbing — schema, partitioning, UDF signatures, Arrow batch shape —
is real and fully tested.

Fake container formats (little-endian u32 fields):
  image:  b"FAKEIMG" | width | height | channels | payload (w*h*c bytes)
  audio:  b"FAKEAUD" | sample_rate | n_samples   | payload (n samples u8)
  video:  b"FAKEVID" | n_frames | frame_w | frame_h | frames (w*h each)

This generalizes the reference's binary-content processors (thumbnail
generation via ffmpeg, app/processors/preview_file_processor.py:17-62;
MIME detection from bytes, extended_attributes_file_processor.py:28-45)
into the column shapes a multimodal training-data pipeline needs.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder path — absent in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        # exact sum of decoded payload bytes: an integer "feature" the
        # DuckDB oracle can recompute digit-exactly from the raw blob
        T.StructField("px_sum", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Fake codecs (deterministic stand-ins; scalar, shared with the datagen)

def encode_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    payload = rng.integers(0, 256, width * height * channels, dtype=np.uint8)
    return b"FAKEIMG" + struct.pack("<III", width, height, channels) + payload.tobytes()


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    payload = rng.integers(0, 256, n_samples, dtype=np.uint8)
    return b"FAKEAUD" + struct.pack("<II", sample_rate, n_samples) + payload.tobytes()


def encode_fake_video(n_frames: int, w: int, h: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    frames = rng.integers(0, 256, n_frames * w * h, dtype=np.uint8)
    return b"FAKEVID" + struct.pack("<III", n_frames, w, h) + frames.tobytes()


def decode_image_py(data: bytes | None) -> tuple[int, int, int, np.ndarray] | None:
    """STUB DECODER.  Real path: PIL.Image.open(BytesIO(data)) — raises
    NotImplementedError until PIL ships; fake path: parse FAKEIMG."""
    if data is None:
        return None
    if data[:7] == b"FAKEIMG":
        w, h, c = struct.unpack_from("<III", data, 7)
        arr = np.frombuffer(data, np.uint8, w * h * c, 19).reshape(h, w, c)
        return w, h, c, arr
    if HAVE_PIL:  # pragma: no cover - not in this container
        raise NotImplementedError("real image decode: wire PIL here")
    raise NotImplementedError("no image decoder available for real formats")


# ---------------------------------------------------------------------------
# mapInPandas stages (Arrow-batched; iterator-of-DataFrames shape)

def image_info(media: DataFrame) -> DataFrame:
    """Decode image headers -> (width, height, channels, n_bytes).
    mapInPandas so each Arrow batch is decoded in one numpy pass."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [],
                   "n_bytes": [], "px_sum": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                dec = decode_image_py(data)
                out["media_id"].append(mid)
                out["width"].append(dec[0] if dec else None)
                out["height"].append(dec[1] if dec else None)
                out["channels"].append(dec[2] if dec else None)
                out["n_bytes"].append(len(data) if data is not None else None)
                out["px_sum"].append(int(dec[3].sum()) if dec else None)
            yield pd.DataFrame(out)

    return (
        media.where(F.col("media_type") == "image")
        .select("media_id", "data")
        .mapInPandas(gen, IMAGE_INFO_SCHEMA)
    )


def image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode -> resize (mean-pool to dim buckets) -> unit-norm float
    vector.  The 'feature extractor' is the fake decoder's payload
    pooled deterministically — the plumbing (batch iteration, numpy
    vectorization, array<float> output) is exactly what a real
    embedding UDF uses."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                dec = decode_image_py(data)
                if dec is None:
                    ids.append(mid)
                    feats.append(None)
                    continue
                flat = dec[3].astype(np.float32).ravel()
                pooled = np.array(
                    [chunk.mean() for chunk in np.array_split(flat, dim)],
                    dtype=np.float32,
                )
                norm = float(np.linalg.norm(pooled)) or 1.0
                ids.append(mid)
                feats.append((pooled / norm).tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return (
        media.where(F.col("media_type") == "image")
        .select("media_id", "data")
        .mapInPandas(gen, FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: 1 row in -> ceil(n_frames/every_n) rows out
    (the table-function shape; explode-like via mapInPandas)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None or data[:7] != b"FAKEVID":
                    continue
                n, w, h = struct.unpack_from("<III", data, 7)
                fsz = w * h
                for k in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(bytes(data[19 + k * fsz: 19 + (k + 1) * fsz]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        media.where(F.col("media_type") == "video")
        .select("media_id", "data")
        .mapInPandas(gen, FRAMES_SCHEMA)
    )


def audio_duration(media: DataFrame) -> DataFrame:
    """Audio metadata: duration seconds from the fake header — Column
    arithmetic over JVM byte-slicing, no Python at all (headers are
    fixed-offset, so substring + conversion suffices)."""
    sr = _le_u32(F.col("data"), 8)
    n = _le_u32(F.col("data"), 12)
    return (
        media.where(F.col("media_type") == "audio")
        .select(
            "media_id",
            sr.alias("sample_rate"),
            n.alias("n_samples"),
            F.round(n.cast("double") / sr, 6).alias("duration_sec"),
        )
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.IntegerType()),
        T.StructField("window", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


def audio_features(media: DataFrame, n_windows: int = 8) -> DataFrame:
    """Windowed audio features: per-window RMS energy and zero-crossing
    rate over the PCM samples (centered at the uint8 midpoint 128).
    The DSP is real and format-independent — only the decode step is
    the sandbox fake (header parse instead of a codec); a real pipeline
    swaps the decode and keeps this function byte-for-byte."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "window": [], "rms": [], "zcr": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None or bytes(data[:7]) != b"FAKEAUD":
                    continue
                n = struct.unpack("<I", bytes(data[11:15]))[0]
                pcm = (
                    np.frombuffer(bytes(data[15 : 15 + n]), dtype=np.uint8)
                    .astype(np.float64)
                    - 128.0
                )
                for w, chunk in enumerate(np.array_split(pcm, n_windows)):
                    if not len(chunk):
                        continue
                    signs = np.sign(chunk)
                    nz = signs != 0
                    crossings = int(
                        (np.diff(signs[nz]) != 0).sum()
                    ) if nz.sum() > 1 else 0
                    out["media_id"].append(mid)
                    out["window"].append(w)
                    out["rms"].append(float(np.sqrt((chunk**2).mean())))
                    out["zcr"].append(
                        crossings / max(1, len(chunk) - 1)
                    )
            yield pd.DataFrame(out)

    return (
        media.where(F.col("media_type") == "audio")
        .select("media_id", "data")
        .mapInPandas(gen, AUDIO_FEATURES_SCHEMA)
    )


def _le_u32(data, pos1: int):
    """Little-endian u32 at 1-based byte offset pos1 of a binary column,
    as a JVM-side Column expression: slice 4 bytes, hex them (big-endian
    order), swap to LE, parse base-16."""
    hexed = F.hex(F.substring(data, pos1, 4))
    b = [F.substring(hexed, i * 2 + 1, 2) for i in range(4)]
    return F.conv(F.concat(b[3], b[2], b[1], b[0]), 16, 10).cast("long")
