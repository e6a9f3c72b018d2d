"""Pure-SQL surface: distance functions + fixture views.

The reference is API-only (REST handlers); this engine is also usable
from bare ``spark.sql`` — the stretch goal in SURVEY.md §7 ("SQL TVF
registration and an ORDER BY distance LIMIT k" path). SQL UDFs
(CREATE TEMPORARY FUNCTION ... RETURN <expr>, Spark 4) expand to the
same Catalyst expressions as functions/distance.py, so a plain

    SELECT vec_id FROM embeddings
    ORDER BY l2_sq(embedding, <query literal>) LIMIT 10

plans as TakeOrderedAndProject — per-partition top-k, no global sort,
the right single-query plan at any scale (the batch-query path stays
index/flat.py's windowed top-k).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["register_sql_functions", "register_views"]

_D = "CAST({v} AS DOUBLE)"

_FUNCS: dict[str, str] = {
    # in-order float64 folds — bit-identical to functions/distance.py
    "l2_sq": (
        "CREATE OR REPLACE TEMPORARY FUNCTION l2_sq(a ARRAY<FLOAT>, b ARRAY<FLOAT>)"
        " RETURNS DOUBLE RETURN aggregate(zip_with(a, b,"
        " (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " 0D, (s, v) -> s + v)"
    ),
    "dot_ip": (
        "CREATE OR REPLACE TEMPORARY FUNCTION dot_ip(a ARRAY<FLOAT>, b ARRAY<FLOAT>)"
        " RETURNS DOUBLE RETURN aggregate(zip_with(a, b,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    ),
    "neg_dot": (
        "CREATE OR REPLACE TEMPORARY FUNCTION neg_dot(a ARRAY<FLOAT>, b ARRAY<FLOAT>)"
        " RETURNS DOUBLE RETURN -dot_ip(a, b)"
    ),
    "vec_norm": (
        "CREATE OR REPLACE TEMPORARY FUNCTION vec_norm(a ARRAY<FLOAT>)"
        " RETURNS DOUBLE RETURN sqrt(dot_ip(a, a))"
    ),
    "cos_dist": (
        # zero-norm guard = distance 1.0, matching distance.go semantics
        "CREATE OR REPLACE TEMPORARY FUNCTION cos_dist(a ARRAY<FLOAT>, b ARRAY<FLOAT>)"
        " RETURNS DOUBLE RETURN CASE WHEN vec_norm(a) = 0D OR vec_norm(b) = 0D THEN 1.0D"
        " ELSE 1.0D - dot_ip(a, b) / (vec_norm(a) * vec_norm(b)) END"
    ),
    "hamming": (
        "CREATE OR REPLACE TEMPORARY FUNCTION hamming(a ARRAY<FLOAT>, b ARRAY<FLOAT>)"
        " RETURNS DOUBLE RETURN aggregate(zip_with(a, b,"
        " (x, y) -> CASE WHEN x <=> y THEN 0D ELSE 1D END), 0D, (s, v) -> s + v)"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the distance library as session SQL functions; returns
    the registered names. Dependency order matters (cos_dist/neg_dot
    reference dot_ip)."""
    for name in ("l2_sq", "dot_ip", "neg_dot", "vec_norm", "cos_dist", "hamming"):
        spark.sql(_FUNCS[name])
    return list(_FUNCS)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose the fixture tables as temp views for pure-SQL querying."""
    from oasisdb_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES)
