"""Real media codecs, dependency-free: PNG (RFC 2083) and WAV (RIFF).

These back the multimodal operators (pipeline/multimodal.py) with a
genuine decode path — actual compressed bytes in, pixel/sample arrays
out — using only the stdlib (zlib, struct) + numpy. Pillow/pyav remain
the preferred providers when installed (see PillowCodec); this module
is the always-available fallback, so the Spark-side plumbing can be
exercised end-to-end on real payloads in any environment.

PNG support: 8-bit RGB (color type 2) and RGBA (6), all five scanline
filters on decode (None/Sub/Up/Average/Paeth), filter 0 on encode.
WAV support: PCM 16-bit mono/stereo.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "png_encode", "png_decode", "wav_encode", "wav_decode", "nearest_resize",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(arr: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 → PNG bytes (filter 0 scanlines, one IDAT)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"expected (H, W, 3|4) uint8, got {arr.shape}")
    h, w, ch = arr.shape
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw: (h, 1+stride) with filter byte."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            out[y] = line.astype(np.uint8)
        elif ftype == 1:  # Sub
            acc = out[y]
            for x in range(stride):
                left = int(acc[x - bpp]) if x >= bpp else 0
                acc[x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype == 3:  # Average
            acc = out[y]
            for x in range(stride):
                left = int(acc[x - bpp]) if x >= bpp else 0
                acc[x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            acc = out[y]
            for x in range(stride):
                a = int(acc[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                acc[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3|4) uint8. 8-bit RGB/RGBA, non-interlaced."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _, _, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color_type}, interlace={interlace})")
    ch = 3 if color_type == 2 else 4
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + w * ch).copy()
    return _unfilter(raw, h, w * ch, ch).reshape(h, w, ch)


def nearest_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) — pure index arithmetic."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """(N,) or (N, channels) int16 → RIFF/WAVE PCM bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes → ((N, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, ch, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif tag == b"data":
            pcm = payload
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(pcm, dtype=np.int16).reshape(-1, ch), rate
