"""Tests for pipeline/semantic_dedup.py (SemDeDup-style dedup)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.semantic_dedup import semantic_dedup


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),     # orthogonal, unique
        (4, [0.0, 1.0, 0.001]),   # near-dup of 3
        (5, [0.0, 0.0, 0.0]),     # zero vector: similarity 0 to all
        (6, [-1.0, 0.0, 0.0]),    # anti-parallel to 1: cos -1
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def test_exact_mode_verdicts(vecs):
    out = {r["vec_id"]: r for r in semantic_dedup(vecs, threshold=0.99).collect()}
    assert out[1]["kept"] and out[1]["n_dups"] == 0
    assert not out[2]["kept"] and out[2]["n_dups"] == 1  # dup of smaller id 1
    assert out[3]["kept"]
    assert not out[4]["kept"]
    assert out[5]["kept"]   # zero vector similar to nothing
    assert out[6]["kept"]   # cos(-1) is below any positive threshold


def test_verdict_independent_of_dropped_rows(spark):
    """x is dropped if ANY smaller id is near — even one itself dropped
    (chain a~b, b~c, a!~c: b and c both dropped under this rule)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9397, 0.342]),   # ~20 deg from 1: cos ~0.94
        (3, [0.766, 0.6428]),   # ~40 deg from 1: cos(2,3) ~0.94, cos(1,3) ~0.77
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(df, threshold=0.9).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_exact_mode_matches_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {r["vec_id"]: (r["n_dups"], r["kept"])
           for r in semantic_dedup(emb, threshold=0.4).collect()}
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    x = np.array([rows[i]["embedding"] for i in order], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    safe = np.where(norms == 0, 1.0, norms)
    sims = np.round((x @ x.T) / (safe[:, None] * safe[None, :]), 6)
    sims[norms == 0, :] = 0
    sims[:, norms == 0] = 0
    for i, vid in enumerate(ids):
        nd = int((sims[i, :i] >= 0.4).sum())
        assert got[vid] == (nd, nd == 0), vid


def test_clustered_mode_scopes_comparisons(vecs):
    """With enough clusters the near-dup pairs land in the same cell
    (they're nearest neighbors of the same centroid); verdicts for
    separable fixture rows match exact mode."""
    out = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(vecs, threshold=0.99, n_clusters=2).collect()}
    exact = {r["vec_id"]: r["kept"]
             for r in semantic_dedup(vecs, threshold=0.99).collect()}
    assert out == exact


def test_row_chunking_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = semantic_dedup(emb, threshold=0.4, row_chunk=7)
    b = semantic_dedup(emb, threshold=0.4, row_chunk=100000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kept_count_via_filter(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = semantic_dedup(emb, threshold=0.4)
    total = emb.count()
    assert df.count() == total
    assert df.filter(F.col("kept")).count() <= total
