"""Hard-negative mining (pipeline/mining.py): exclusion-before-ranking
semantics vs brute force."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.mining import hard_negatives


@pytest.fixture(scope="module")
def vecs(spark):
    # 2-d points; label = cluster. Query 0 at origin, its own cluster
    # (label 0) is nearest — so same-label exclusion MUST change results.
    rows = [
        (0, [0.0, 0.0], 0), (1, [0.1, 0.0], 0), (2, [0.0, 0.2], 0),
        (3, [1.0, 0.0], 1), (4, [1.1, 0.1], 1),
        (5, [0.0, 3.0], 2), (6, [0.1, 3.0], 2),
    ]
    return spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>, label INT")


def q(vecs, ids):
    return vecs.filter(F.col("id").isin(ids)).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )


def test_same_label_excluded_before_ranking(spark, vecs):
    out = hard_negatives(
        q(vecs, [0]), vecs, k=3, neq_pair=("qlabel", "label")
    ).collect()
    got = [(r["rank"], r["id"]) for r in sorted(out, key=lambda r: r["rank"])]
    # nearest overall are 1, 2 (label 0 — excluded); negatives are 3, 4, then 5
    assert got == [(1, 3), (2, 4), (3, 5)]


def test_exclude_pairs_drops_known_positives(spark, vecs):
    ex = spark.createDataFrame([(0, 3), (0, 4)], "query_id LONG, id LONG")
    out = hard_negatives(
        q(vecs, [0]), vecs, k=2, neq_pair=("qlabel", "label"), exclude_pairs=ex
    ).collect()
    got = [(r["rank"], r["id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, 5), (2, 6)]


def test_no_exclusions_equals_knn_flat(spark, vecs):
    from oasisdb_spark.index.flat import knn_flat

    queries = q(vecs, [0, 3]).drop("qlabel")
    a = sorted(map(tuple, hard_negatives(queries, vecs, k=4).collect()))
    b = sorted(
        (r["query_id"], r["id"], r["rank"], float(r["distance"]))
        for r in knn_flat(queries, vecs, k=4).select(
            "query_id", "id", "rank", F.col("distance").cast("double").alias("distance")
        ).collect()
    )
    assert a == b


def test_short_of_k_returns_what_exists(spark, vecs):
    # query labeled 0 with all of labels 1 and 2 excluded -> only 4 rows
    ex = spark.createDataFrame([(0, i) for i in (3, 4)], "query_id LONG, id LONG")
    out = hard_negatives(
        q(vecs, [0]), vecs, k=10, neq_pair=("qlabel", "label"), exclude_pairs=ex
    ).collect()
    assert sorted(r["id"] for r in out) == [5, 6]


def test_candidates_path_matches_exact_when_candidates_complete(spark, vecs):
    """hard_negatives_from_candidates over a COMPLETE scored candidate
    set must equal the exact operator (the ANN composition's recall
    loss comes only from shortlist truncation, not the re-rank)."""
    from oasisdb_spark.functions.distance import distance_expr
    from oasisdb_spark.pipeline.mining import hard_negatives_from_candidates

    queries = q(vecs, [0, 5])
    full = vecs.crossJoin(
        queries.withColumnRenamed("qlabel", "qlabel")
    ).select(
        "query_id", "id", F.col("qlabel"), F.col("label").alias("blabel"),
        distance_expr("l2", "query_vec", "vector").alias("distance"),
    )
    a = sorted(map(tuple, hard_negatives_from_candidates(
        full, k=3, neq_pair=("qlabel", "blabel")).collect()))
    b = sorted(map(tuple, hard_negatives(
        queries, vecs, k=3, neq_pair=("qlabel", "label")).collect()))
    assert a == b
