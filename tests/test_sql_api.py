"""SQL-surface parity: SQL UDF distances equal the Column expressions,
and ORDER BY distance LIMIT k plans as TakeOrdered (no global sort)."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.functions.distance import distance_expr
from oasisdb_spark.sql_api import register_sql_functions, register_views


@pytest.fixture(scope="module", autouse=True)
def sql_env(spark):
    register_sql_functions(spark)
    register_views(spark, "/root/testdata/sf0.001")


@pytest.mark.parametrize(
    "fn,space",
    [("l2_sq", "l2"), ("neg_dot", "ip"), ("cos_dist", "cos"), ("hamming", "hamming")],
)
def test_sql_udf_matches_column_expr(spark, fn, space):
    pairs = spark.sql(
        "SELECT a.embedding AS va, b.embedding AS vb FROM embeddings a"
        " JOIN embeddings b ON b.vec_id = a.vec_id + 1 WHERE a.vec_id < 20"
    )
    got = pairs.selectExpr(f"{fn}(va, vb) AS d").collect()
    want = pairs.select(distance_expr(space, "va", "vb").alias("d")).collect()
    assert [r["d"] for r in got] == [r["d"] for r in want]  # bit-identical


def test_order_by_distance_limit_is_takeordered(spark):
    q = spark.sql("SELECT embedding FROM embeddings WHERE vec_id = 0").first()["embedding"]
    lit = "array(" + ",".join(f"CAST({x} AS FLOAT)" for x in q) + ")"
    df = spark.sql(
        f"SELECT vec_id, l2_sq(embedding, {lit}) AS d FROM embeddings ORDER BY d LIMIT 5"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no full sort
    rows = df.collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["d"] == 0.0
    assert [r["d"] for r in rows] == sorted(r["d"] for r in rows)


def test_pure_sql_end_to_end(spark):
    # a reference user's whole flow in SQL only: filter + knn + join-back.
    # (Spark SQL UDFs are not allowed directly inside Sort — order by the
    # select-list alias instead, which also keeps the TakeOrdered plan.)
    out = spark.sql(
        """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7)
        SELECT vec_id, label FROM (
          SELECT e.vec_id, e.label, l2_sq(e.embedding, q.qv) AS d
          FROM embeddings e, q
          WHERE e.label = (SELECT label FROM embeddings WHERE vec_id = 7)
        ) ORDER BY d, vec_id LIMIT 3
        """
    ).collect()
    assert out[0]["vec_id"] == 7 and len(out) == 3
