"""Embedding providers — mirrors the stub-provider test pattern
(internal/db/additional_test.go:15-35) + auto-embed rule (document.go:55-68)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oasisdb_spark.embed import HashEmbedder, HttpEmbedder, auto_embed, embed_column


def test_hash_embedder_deterministic():
    e = HashEmbedder(dim=16)
    a = e.embed_batch(["hello", "world"])
    b = e.embed_batch(["hello", "world"])
    assert np.array_equal(a, b)
    assert a.shape == (2, 16)
    assert not np.array_equal(a[0], a[1])
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_embed_column(spark, documents):
    out = documents.limit(10).withColumn("vector", embed_column(HashEmbedder(32), "text"))
    rows = out.select("doc_id", "vector").collect()
    assert all(len(r["vector"]) == 32 for r in rows)
    # same text → same vector across runs (distributed determinism)
    again = {r["doc_id"]: r["vector"] for r in
             documents.limit(10).withColumn("vector", embed_column(HashEmbedder(32), "text"))
             .select("doc_id", "vector").collect()}
    assert all(again[r["doc_id"]] == r["vector"] for r in rows)


def test_auto_embed_only_fills_missing(spark):
    df = spark.createDataFrame(
        [("a", None, "some text"), ("b", [1.0, 2.0], "other")],
        "id STRING, vector ARRAY<FLOAT>, text STRING",
    )
    out = {r["id"]: r["vector"] for r in auto_embed(df, HashEmbedder(2)).collect()}
    assert out["b"] == [1.0, 2.0]  # existing vector untouched
    assert out["a"] is not None and len(out["a"]) == 2


def test_http_embedder_unconfigured_raises():
    with pytest.raises(NotImplementedError):
        HttpEmbedder().embed_batch(["x"])
