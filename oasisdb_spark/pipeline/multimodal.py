"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

No counterpart in the reference (vectors only); this is the north-star
training-data-pipeline extension. The Spark-side plumbing — schema,
Arrow batch shape, partition sizing — is real and tested; the actual
codec work is STUBBED behind a provider seam because the image/audio
libraries are not in this container:

- ``FakeCodec`` (default, deterministic): parses the tiny header format
  used by the test fixtures and "decodes" to deterministic feature
  vectors — exercises every seam end-to-end.
- ``PillowCodec`` / ``AvCodec``: raise NotImplementedError with the
  dependency name; drop-in once PIL / pyav exist.

Scale notes: binary payloads dominate row size, so ops use mapInPandas
(Arrow-batched, streaming per batch, never collecting a partition into
one list) and `spark.sql.files.maxPartitionBytes` governs scan split
size. Metadata (width/height/duration/format) lives in plain columns so
filters prune BEFORE any decode happens — decode-after-filter is the
whole game at 100 TB.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA", "FakeCodec", "PillowCodec",
    "make_fake_media", "decode_features", "resize_images", "sample_frames",
]

# media row: opaque payload + typed, filterable metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("format", T.StringType(), False),     # fake-rgb | fake-pcm | fake-h264
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_MAGIC = b"FAKE"


class FakeCodec:
    """Deterministic stand-in codec. Payload layout:
    b'FAKE' + u32 seed + u16 width + u16 height + u16 n_frames."""

    def encode(self, media_id: int, width: int, height: int, n_frames: int = 1) -> bytes:
        seed = int.from_bytes(hashlib.blake2b(str(media_id).encode(), digest_size=4).digest(), "big")
        return _MAGIC + struct.pack("<IHHH", seed, width, height, n_frames)

    def decode_features(self, payload: bytes, dim: int = 16) -> np.ndarray:
        if payload[:4] != _MAGIC:
            raise ValueError("not a FAKE payload")
        seed, w, h, nf = struct.unpack("<IHHH", payload[4:14])
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        seed, _, _, nf = struct.unpack("<IHHH", payload[4:14])
        return _MAGIC + struct.pack("<IHHH", seed, width, height, nf)

    def frame_count(self, payload: bytes) -> int:
        return struct.unpack("<IHHH", payload[4:14])[3]


class PillowCodec:
    """Real image codec seam — requires Pillow (not in this container)."""

    def __init__(self):
        raise NotImplementedError(
            "PillowCodec requires the 'Pillow' package; use FakeCodec in this environment"
        )


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic media fixture (images with varying dims + videos)."""
    codec = FakeCodec()
    rows = []
    for i in range(n):
        kind = "video" if i % 5 == 0 else "image"
        w, h = 64 + (i % 4) * 32, 64 + (i % 3) * 32
        nf = 30 if kind == "video" else 1
        rows.append((i, kind, "fake-rgb", w, h, nf, bytearray(codec.encode(i, w, h, nf))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_features(df: DataFrame, dim: int = 16, payload_col: str = "payload") -> DataFrame:
    """payload → feature vector (the embed step of a multimodal pipeline).
    Arrow-batched; schema = input + features ARRAY<FLOAT>."""
    codec = FakeCodec()
    schema = T.StructType(df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), False)])

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [list(codec.decode_features(bytes(p), dim)) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(_map, schema=schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-aware resize: rows already at target size pass through
    untouched (filter-before-decode), others go through the codec."""
    codec = FakeCodec()

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            need = ((pdf["width"] != width) | (pdf["height"] != height)).tolist()
            pdf["payload"] = [
                bytearray(codec.resize(bytes(p), width, height)) if n else p
                for n, p in zip(need, pdf["payload"])
            ]
            pdf["width"], pdf["height"] = width, height
            yield pdf

    return df.mapInPandas(_map, schema=df.schema)


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame
    (frame_idx column added); non-video rows pass through with
    frame_idx=0. Row-expanding mapInPandas."""
    codec = FakeCodec()
    schema = T.StructType(df.schema.fields + [T.StructField("frame_idx", T.IntegerType(), False)])

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if row["kind"] == "video":
                    nf = codec.frame_count(bytes(row["payload"]))
                    for fi in range(0, nf, every_nth):
                        r = row.copy()
                        r["frame_idx"] = fi
                        out.append(r)
                else:
                    r = row.copy()
                    r["frame_idx"] = 0
                    out.append(r)
            if out:
                yield pd.DataFrame(out)

    return df.mapInPandas(_map, schema=schema)
