"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2
(vector-search core) or the LLM-data-pipeline extension scope; each
``oracle_sql()`` entry is the equivalent DuckDB SQL. Vector distances are
computed in float64 on both sides (bit-identical left-fold arithmetic —
verified), so hash-matching is exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from oasisdb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 exact kNN (the reference's core query —
    search_vectors, internal/server/handlers.go:36-74) over the sf0.001
    embeddings, first 5 vectors as the query batch."""
    return _knn_flat(spark, SF0001, space="l2", n_queries=5, k=10)


# ---------------------------------------------------------------------------
# vector search surface (SURVEY.md §2.2)
# ---------------------------------------------------------------------------

def _knn_flat(spark: SparkSession, sf_dir: str, space: str, n_queries: int = 10, k: int = 10) -> DataFrame:
    from oasisdb_spark.index.flat import knn_flat

    emb = _table(spark, sf_dir, "embeddings")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = knn_flat(q, base, k=k, space=space)
    return res.select("query_id", "id", "rank", F.col("distance").cast("double").alias("distance"))


_KNN_ORACLE_TMPL = """
WITH scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS id, {dist} AS distance
  FROM (SELECT * FROM embeddings WHERE vec_id < {nq}) q
  CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, id, distance,
         row_number() OVER (PARTITION BY query_id ORDER BY distance ASC, id ASC) AS rank
  FROM scored
)
SELECT query_id, id, rank, distance FROM ranked WHERE rank <= {k}
"""

_L2_SQL = (
    "list_sum(list_transform(list_zip(q.embedding, e.embedding),"
    " p -> (CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))*(CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))))"
)
_DOT_SQL = (
    "list_sum(list_transform(list_zip(q.embedding, e.embedding),"
    " p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))"
)
_NORM_SQL = (
    "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
)
_COS_SQL = (
    f"CASE WHEN {_NORM_SQL.format(v='q.embedding')} = 0 OR {_NORM_SQL.format(v='e.embedding')} = 0"
    f" THEN 1.0 ELSE 1.0 - ({_DOT_SQL}) / ({_NORM_SQL.format(v='q.embedding')} * {_NORM_SQL.format(v='e.embedding')}) END"
)


# ---------------------------------------------------------------------------
# relational / pipeline extension surface
# ---------------------------------------------------------------------------

def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_flat_l2": lambda s, d: _knn_flat(s, d, "l2"),
        "knn_flat_cos": lambda s, d: _knn_flat(s, d, "cos"),
        "knn_flat_ip": lambda s, d: _knn_flat(s, d, "ip"),
        "q1_pricing_summary": _q1_pricing_summary,
        "top3_orders_per_customer": _top3_orders_per_customer,
        "events_hourly": _events_hourly,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "knn_flat_l2": _KNN_ORACLE_TMPL.format(dist=_L2_SQL, nq=10, k=10),
        "knn_flat_cos": _KNN_ORACLE_TMPL.format(dist=_COS_SQL, nq=10, k=10),
        "knn_flat_ip": _KNN_ORACLE_TMPL.format(dist=f"-({_DOT_SQL})", nq=10, k=10),
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top3_orders_per_customer": """
            SELECT o_custkey, o_orderkey, rank, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders
            ) WHERE rank <= 3
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
    }
