"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

No counterpart in the reference (vectors only); this is the north-star
training-data-pipeline extension. The Spark-side plumbing — schema,
Arrow batch shape, partition sizing — is real and tested, and so is
the codec path, behind a provider seam:

- ``PillowCodec``: REAL image decode/encode/resize — Pillow when
  installed, else the dependency-free PNG codec in pipeline/codecs.py.
- ``WavCodec`` / ``FrameContainer``: real RIFF/WAVE PCM audio and a
  length-prefixed PNG-frame video container (seek-skip demuxing).
- ``FakeCodec`` (legacy test stand-in): parses a tiny header format and
  "decodes" to deterministic feature vectors — kept for the
  feature-extraction seam tests.

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
    "MEDIA_SCHEMA", "FakeCodec", "PillowCodec", "WavCodec", "FrameContainer",
    "make_fake_media", "decode_features", "resize_images", "sample_frames",
    "make_media", "decode_image_stats", "resize_decode_stats",
    "sample_video_frames", "audio_stats", "make_patterned_media", "image_dhash",
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
    """Real image codec: Pillow when installed, else the dependency-free
    PNG implementation in pipeline/codecs.py (stdlib zlib + numpy; all
    five scanline filters on decode). Either way the operators below
    work on REAL compressed image bytes — the provider seam only decides
    which library does the pixel work."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def encode_image(self, arr: np.ndarray) -> bytes:
        from oasisdb_spark.pipeline.codecs import png_encode

        if self._pil is not None:
            import io

            buf = io.BytesIO()
            self._pil.fromarray(np.asarray(arr, dtype=np.uint8)).save(buf, format="PNG")
            return buf.getvalue()
        return png_encode(arr)

    def decode_image(self, payload: bytes) -> np.ndarray:
        from oasisdb_spark.pipeline.codecs import png_decode

        if self._pil is not None:
            import io

            return np.asarray(self._pil.open(io.BytesIO(payload)).convert("RGB"))
        return png_decode(payload)

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        from oasisdb_spark.pipeline.codecs import nearest_resize

        return self.encode_image(nearest_resize(self.decode_image(payload), width, height))


class WavCodec:
    """Real audio codec: RIFF/WAVE PCM-16 via pipeline/codecs.py."""

    def encode_audio(self, samples: np.ndarray, rate: int = 16_000) -> bytes:
        from oasisdb_spark.pipeline.codecs import wav_encode

        return wav_encode(samples, rate)

    def decode_audio(self, payload: bytes):
        from oasisdb_spark.pipeline.codecs import wav_decode

        return wav_decode(payload)


_VID_MAGIC = b"VID0"


class FrameContainer:
    """Minimal real video container: b'VID0' + u32 n_frames, then each
    frame as u32 length + PNG bytes. Frame-sampling decodes ONLY the
    sampled frames' bytes (offsets are walked, payloads skipped) — the
    seek-then-decode pattern a real demuxer gives you."""

    def encode(self, frames: list[np.ndarray]) -> bytes:
        img = PillowCodec()
        parts = [_VID_MAGIC + struct.pack("<I", len(frames))]
        for f in frames:
            b = img.encode_image(f)
            parts.append(struct.pack("<I", len(b)) + b)
        return b"".join(parts)

    def frame_count(self, payload: bytes) -> int:
        if payload[:4] != _VID_MAGIC:
            raise ValueError("not a VID0 container")
        return struct.unpack("<I", payload[4:8])[0]

    def decode_frame(self, payload: bytes, idx: int) -> np.ndarray:
        n = self.frame_count(payload)
        if not 0 <= idx < n:
            raise IndexError(f"frame {idx} of {n}")
        pos = 8
        for i in range(idx):
            (length,) = struct.unpack("<I", payload[pos : pos + 4])
            pos += 4 + length
        (length,) = struct.unpack("<I", payload[pos : pos + 4])
        return PillowCodec().decode_image(payload[pos + 4 : pos + 4 + length])


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


# ---------------------------------------------------------------------------
# real-codec fixture + operators (PNG / WAV / VID0 payloads)
# ---------------------------------------------------------------------------

def _md5_byte(key: str) -> int:
    """md5-derived value in [0, 256) — reproducible by any engine with
    md5() (DuckDB: ('0x' || substr(md5(key), 1, 15))::BIGINT % 256)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 256


def make_media(spark, n: int = 200) -> DataFrame:
    """Deterministic REAL-payload media fixture: solid-color PNGs,
    constant-amplitude PCM WAVs, and VID0 frame containers of PNGs.
    Pixel colors / amplitudes derive from md5 of the media id, so a SQL
    oracle can recompute what a correct decode must produce — the
    fixture is how the real codec path gets VALUE-verified, not just
    row-counted. kind cycles video/audio/image by media_id % 5."""
    img, aud, vid = PillowCodec(), WavCodec(), FrameContainer()
    rows = []
    for i in range(n):
        sel = i % 5
        if sel == 0:
            nf = 12 + (i % 3) * 6
            w, h = 24, 16
            frames = [
                np.full((h, w, 3), [_md5_byte(f"{i}:{f}:{c}") for c in "rgb"], dtype=np.uint8)
                for f in range(nf)
            ]
            rows.append((i, "video", "vid0", w, h, nf, bytearray(vid.encode(frames))))
        elif sel == 1:
            n_samp = 800 + (i % 7) * 400
            amp = _md5_byte(f"{i}:a") * 16
            samples = np.full(n_samp, amp, dtype=np.int16)
            rows.append((i, "audio", "wav", None, None, None, bytearray(aud.encode_audio(samples))))
        else:
            w, h = 32 + (i % 4) * 16, 32 + (i % 3) * 16
            color = [_md5_byte(f"{i}:{c}") for c in "rgb"]
            arr = np.full((h, w, 3), color, dtype=np.uint8)
            rows.append((i, "image", "png", w, h, 1, bytearray(img.encode_image(arr))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode: PNG bytes → per-channel means + decoded dims.
    Arrow-batched mapInPandas; rows should be metadata-filtered to
    kind='image' BEFORE this op (decode-after-filter)."""
    codec = PillowCodec()
    schema = T.StructType(
        [df.schema["media_id"], df.schema["kind"], df.schema["format"]]
        + [
            T.StructField("dec_width", T.IntegerType(), False),
            T.StructField("dec_height", T.IntegerType(), False),
            T.StructField("mean_r", T.DoubleType(), False),
            T.StructField("mean_g", T.DoubleType(), False),
            T.StructField("mean_b", T.DoubleType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                arr = codec.decode_image(bytes(row[payload_col]))
                out.append(
                    (
                        row["media_id"], row["kind"], row["format"],
                        arr.shape[1], arr.shape[0],
                        float(arr[:, :, 0].mean()), float(arr[:, :, 1].mean()),
                        float(arr[:, :, 2].mean()),
                    )
                )
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(_map, schema=schema)


def resize_decode_stats(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize round-trip: decode → nearest-neighbor resize →
    re-encode → decode again → stats. Exercises both codec directions
    inside one Arrow-batched pass."""
    codec = PillowCodec()
    schema = T.StructType(
        [
            df.schema["media_id"],
            T.StructField("dec_width", T.IntegerType(), False),
            T.StructField("dec_height", T.IntegerType(), False),
            T.StructField("mean_r", T.DoubleType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                resized = codec.resize(bytes(row["payload"]), width, height)
                arr = codec.decode_image(resized)
                out.append((row["media_id"], arr.shape[1], arr.shape[0], float(arr[:, :, 0].mean())))
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(_map, schema=schema)


def sample_video_frames(df: DataFrame, every_nth: int = 5) -> DataFrame:
    """REAL frame sampling: walk the VID0 container, decode ONLY every
    n-th frame's PNG (seek-skip over the rest), one output row per
    sampled frame with that frame's mean red channel."""
    vid = FrameContainer()
    schema = T.StructType(
        [
            df.schema["media_id"], df.schema["kind"],
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("mean_r", T.DoubleType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                nf = vid.frame_count(payload)
                for fi in range(0, nf, every_nth):
                    arr = vid.decode_frame(payload, fi)
                    out.append((row["media_id"], row["kind"], fi, float(arr[:, :, 0].mean())))
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(_map, schema=schema)


def audio_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode: WAV bytes → sample count, rate, mean |amp|."""
    codec = WavCodec()
    schema = T.StructType(
        [
            df.schema["media_id"],
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("rate", T.IntegerType(), False),
            T.StructField("mean_abs", T.DoubleType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                samples, rate = codec.decode_audio(bytes(row[payload_col]))
                out.append(
                    (row["media_id"], samples.shape[0], rate,
                     float(np.abs(samples.astype(np.float64)).mean()))
                )
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(_map, schema=schema)


def make_patterned_media(spark, n: int = 64) -> DataFrame:
    """Block-patterned grayscale PNG fixture for perceptual hashing:
    image i is 32x32, an 8x8 grid of 4x4 blocks, block (bx, by) filled
    with the md5-derived gray _md5_byte(f"{i}:{bx}:{by}") in all three
    channels. Solid-color images (make_media) hash identically under
    any gradient hash; these have md5-recomputable STRUCTURE, so a SQL
    oracle can derive the exact dHash a correct decode+resize must
    produce. The second half of the fixture (i >= n/2) repeats image
    i - n/2 with ONE block changed — planted near-duplicates for the
    hamming-dedup path."""
    img = PillowCodec()
    rows = []
    for i in range(n):
        src = i if i < n // 2 else i - n // 2
        arr = np.zeros((32, 32, 3), dtype=np.uint8)
        for by in range(8):
            for bx in range(8):
                g = _md5_byte(f"{src}:{bx}:{by}")
                if i >= n // 2 and bx == 0 and by == 0:
                    g = (g + 128) % 256  # the planted single-block edit
                arr[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4, :] = g
        rows.append((i, "image", "png", 32, 32, 1, bytearray(img.encode_image(arr))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def image_dhash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Perceptual difference hash (dHash) over REAL decoded images:
    decode -> grayscale (channel mean) -> nearest-neighbor resize to
    9x8 -> 64 horizontal-gradient bits (bit r*8+c set iff
    gray[r][c] < gray[r][c+1]). Returns (media_id, dhash_hi, dhash_lo)
    — two unsigned 32-bit halves in BIGINTs, avoiding sign games with
    a full 64-bit code. Arrow-batched mapInPandas; filter to
    kind='image' BEFORE this op (decode-after-filter).

    Near-identical images differ in few bits, so downstream dedup is
    the existing hamming machinery (pipeline/ann.py packed kernel /
    simhash-style banding) over the codes."""
    codec = PillowCodec()
    schema = "media_id BIGINT, dhash_hi BIGINT, dhash_lo BIGINT"

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                arr = codec.decode_image(bytes(row[payload_col]))
                gray = arr.astype(np.float64).mean(axis=2)
                h, w = gray.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, :-1] < g[:, 1:]).astype(np.uint64).ravel()  # k = r*8+c
                code = int((bits << np.arange(64, dtype=np.uint64)).sum())
                out.append((row["media_id"], (code >> 32) & 0xFFFFFFFF, code & 0xFFFFFFFF))
            if out:
                yield pd.DataFrame(out, columns=["media_id", "dhash_hi", "dhash_lo"])

    return df.mapInPandas(_map, schema=schema)
