"""Flat exact kNN vs the closed-form F1 fixture (FIXTURES.md) —
mirrors internal/index/flat_test.go:22-130 expectations."""

from pyspark.sql import functions as F

from oasisdb_spark.index.flat import knn_flat


def _queries(spark, ids):
    rows = [(str(i), [float(i), 0.0, 0.0, 0.0]) for i in ids]
    return spark.createDataFrame(rows, "query_id STRING, query_vec ARRAY<FLOAT>")


def test_knn_flat_exact_neighbors(spark, tiny_vectors):
    res = knn_flat(_queries(spark, [10]), tiny_vectors, k=3).orderBy("rank").collect()
    # v[0]=i ⇒ top-1 is 10 (d=0), then 9/11 (d=1) with id tiebreak "11"<"9" lexicographic? No:
    # distances: id 9 → 1, id 11 → 1; tiebreak ascending id string: "11" < "9"
    assert [r["id"] for r in res] == ["10", "11", "9"]
    assert [r["distance"] for r in res] == [0.0, 1.0, 1.0]
    assert [r["rank"] for r in res] == [1, 2, 3]


def test_knn_flat_multi_query(spark, tiny_vectors):
    res = knn_flat(_queries(spark, [1, 5, 20]), tiny_vectors, k=1)
    got = {r["query_id"]: r["id"] for r in res.collect()}
    assert got == {"1": "1", "5": "5", "20": "20"}


def test_knn_flat_k_larger_than_n(spark, tiny_vectors):
    res = knn_flat(_queries(spark, [1]), tiny_vectors, k=100)
    assert res.count() == 20


def test_knn_flat_cosine(spark):
    base = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [-1.0, 0.0])],
        "id STRING, vector ARRAY<FLOAT>",
    )
    q = spark.createDataFrame([("q", [2.0, 0.0])], "query_id STRING, query_vec ARRAY<FLOAT>")
    res = knn_flat(q, base, k=3, space="cos").orderBy("rank").collect()
    assert [r["id"] for r in res] == ["a", "b", "c"]


def test_knn_flat_plan_broadcasts_queries(spark, tiny_vectors):
    """The physical plan must broadcast the query side (scale contract:
    the base table is never shuffled for the distance stage)."""
    plan = knn_flat(_queries(spark, [1]), tiny_vectors, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_null_base_vector_ranks_last(spark):
    # NULL vector -> NULL distance; plain asc sorted it FIRST (and
    # DuckDB sorts NULLs LAST -- cross-engine divergence)
    from oasisdb_spark.index.flat import knn_flat

    base = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0, 0.0])],
        "id LONG, vector ARRAY<FLOAT>",
    )
    q = spark.createDataFrame([(0, [0.0, 0.0])], "query_id LONG, query_vec ARRAY<FLOAT>")
    rows = {r["rank"]: r["id"] for r in knn_flat(q, base, k=3).collect()}
    assert rows[1] == 1 and rows[2] == 3 and rows[3] == 2
