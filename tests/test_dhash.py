"""Tests for image_dhash (pipeline/multimodal.py perceptual hashing)."""

import hashlib

import numpy as np
import pytest

from oasisdb_spark.pipeline.multimodal import image_dhash, make_patterned_media


def _md5b(key):
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 256


def expected_dhash(src_id, edited=False):
    """Recompute the dHash straight from the md5 construction (no
    decode): 32x32 image, block (bx, by) gray = md5b(f"{id}:{bx}:{by}");
    NN-resize picks pixel (r*4, c*32//9) -> block (c*32//9)//4, r."""
    def gray(r, c):
        bx = ((c * 32) // 9) // 4
        g = _md5b(f"{src_id}:{bx}:{r}")
        if edited and bx == 0 and r == 0:
            g = (g + 128) % 256
        return g

    code = 0
    for r in range(8):
        for c in range(8):
            if gray(r, c) < gray(r, c + 1):
                code |= 1 << (r * 8 + c)
    return (code >> 32) & 0xFFFFFFFF, code & 0xFFFFFFFF


@pytest.fixture(scope="module")
def hashed(spark):
    media = make_patterned_media(spark, n=32)
    return {r["media_id"]: (r["dhash_hi"], r["dhash_lo"])
            for r in image_dhash(media).collect()}


def test_matches_md5_construction(hashed):
    for i in range(16):
        assert hashed[i] == expected_dhash(i), i


def test_planted_neardups_are_close(hashed):
    def pop(h):
        return bin(h[0])[2:].count("1") + bin(h[1])[2:].count("1")

    def ham(a, b):
        return pop(((a[0] ^ b[0]) & 0xFFFFFFFF, (a[1] ^ b[1]) & 0xFFFFFFFF))

    dups = [ham(hashed[i], hashed[i + 16]) for i in range(16)]
    assert max(dups) <= 6  # one edited block touches few gradient bits
    # unrelated pairs are far apart on average
    import itertools

    others = [ham(hashed[a], hashed[b]) for a, b in itertools.combinations(range(16), 2)]
    assert np.mean(others) > 20


def test_hash_is_decode_derived_not_payload_hash(spark):
    """Identical pixel content in different PNG encodings (filter
    choices) must hash identically — re-encode via resize round trip."""
    from oasisdb_spark.pipeline.multimodal import PillowCodec

    codec = PillowCodec()
    media = make_patterned_media(spark, n=2)
    rows = media.collect()
    arr = codec.decode_image(bytes(rows[0]["payload"]))
    # re-encode the same pixels (fresh encoder pass)
    import pandas as pd
    re_rows = [(99, "image", "png", 32, 32, 1, bytearray(codec.encode_image(arr)))]
    df2 = spark.createDataFrame(re_rows, media.schema)
    h1 = image_dhash(media.limit(1)).collect()[0]
    h2 = image_dhash(df2).collect()[0]
    assert (h1["dhash_hi"], h1["dhash_lo"]) == (h2["dhash_hi"], h2["dhash_lo"])
