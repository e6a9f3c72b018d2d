"""Pure-codec tests: PNG encode/decode (all five scanline filters),
WAV round-trip, VID0 container, and the real-codec Spark operators."""

import struct
import zlib

import numpy as np
import pytest

from oasisdb_spark.pipeline.codecs import (
    nearest_resize, png_decode, png_encode, wav_decode, wav_encode,
)


def test_png_roundtrip_rgb_and_rgba():
    rng = np.random.default_rng(11)
    for shape in [(8, 8, 3), (5, 13, 3), (1, 1, 3), (16, 4, 4)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(a)), a)


def _encode_with_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Build a valid PNG using one non-trivial filter on every scanline
    (our encoder only emits filter 0; a spec-conformant decoder must
    handle all five)."""
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        filt = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
    raw = b"".join(lines)

    def chunk(tag, payload):
        crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_decode_all_filters(ftype):
    rng = np.random.default_rng(ftype)
    a = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(_encode_with_filter(a, ftype)), a)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, 500, dtype=np.int16)
    d, rate = wav_decode(wav_encode(mono, 44_100))
    assert rate == 44_100 and np.array_equal(d[:, 0], mono)
    stereo = rng.integers(-32768, 32767, (256, 2), dtype=np.int16)
    d2, _ = wav_decode(wav_encode(stereo))
    assert np.array_equal(d2, stereo)


def test_nearest_resize_solid_invariant():
    a = np.full((20, 30, 3), [9, 8, 7], dtype=np.uint8)
    r = nearest_resize(a, 16, 16)
    assert r.shape == (16, 16, 3) and (r == [9, 8, 7]).all()


def test_frame_container_seek_decode():
    from oasisdb_spark.pipeline.multimodal import FrameContainer

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(7)]
    vc = FrameContainer()
    payload = vc.encode(frames)
    assert vc.frame_count(payload) == 7
    for i in (0, 3, 6):
        assert np.array_equal(vc.decode_frame(payload, i), frames[i])
    with pytest.raises(IndexError):
        vc.decode_frame(payload, 7)


def test_real_media_operators(spark):
    from oasisdb_spark.pipeline.multimodal import (
        audio_stats, decode_image_stats, make_media, resize_decode_stats,
        sample_video_frames,
    )

    media = make_media(spark, 30)
    imgs = media.filter("kind = 'image'")
    stats = {r["media_id"]: r for r in decode_image_stats(imgs).collect()}
    meta = {r["media_id"]: r for r in imgs.collect()}
    assert set(stats) == set(meta)
    for mid, r in stats.items():
        assert r["dec_width"] == meta[mid]["width"]
        assert r["dec_height"] == meta[mid]["height"]
        assert float(r["mean_r"]).is_integer()  # solid color decodes exactly

    rs = resize_decode_stats(imgs, 16, 16).collect()
    assert all(r["dec_width"] == 16 and r["dec_height"] == 16 for r in rs)

    fr = sample_video_frames(media.filter("kind = 'video'"), every_nth=5).collect()
    assert fr and all(r["frame_idx"] % 5 == 0 for r in fr)

    au = audio_stats(media.filter("kind = 'audio'")).collect()
    assert au and all(r["rate"] == 16_000 for r in au)


def test_png_roundtrip_property():
    """Property: any uint8 RGB/RGBA image round-trips bit-exactly."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from oasisdb_spark.pipeline.codecs import png_decode, png_encode

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        ch=st.sampled_from([3, 4]), seed=st.integers(0, 2**31),
    )
    def check(h, w, ch, seed):
        a = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(a)), a)

    check()


def test_wav_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from oasisdb_spark.pipeline.codecs import wav_decode, wav_encode

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 2000), ch=st.sampled_from([1, 2]),
           rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31))
    def check(n, ch, rate, seed):
        s = np.random.default_rng(seed).integers(-32768, 32767, (n, ch), dtype=np.int16)
        d, r = wav_decode(wav_encode(s, rate))
        assert r == rate and np.array_equal(d, s)

    check()
