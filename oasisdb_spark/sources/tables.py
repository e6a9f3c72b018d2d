"""Readers for the driver's synthetic star schema (TESTDATA.md).

The reference's only ingest paths are its REST API + SSTable/WAL files
(SURVEY.md §2.1 S13); those formats are replaced wholesale by Parquet.
This module is the engine's scan layer for the test fixtures.

Note: ``events.parquet`` is written with TIMESTAMP(NANOS), which Spark 4
refuses to read natively; with spark.sql.legacy.parquet.nanosAsLong the
column arrives as INT64 nanoseconds and is converted here to a proper
timestamp (microsecond truncation — all fixture queries bucket to ≥1s
granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception as e:  # driver sessions may lack the nanos conf
        if "NANOS" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        except Exception:
            df = _load_via_arrow(spark, path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not float `/`: epoch nanos exceed a double's 53-bit
        # integer range, so float division can drift the microsecond by ±1
        # vs DuckDB's exact nanos->micros truncation. Produce TIMESTAMP_NTZ
        # (pure calendar arithmetic, no session-timezone dependence) — the
        # same type Spark 4.1 yields when it reads TIMESTAMP(NANOS) natively,
        # so downstream code sees one canonical ts type either way.
        df = df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return df


def event_time_micros(df: DataFrame, col: str = "ts"):
    """Microseconds-since-epoch Column for either timestamp flavor.
    TIMESTAMP_NTZ (the canonical events `ts` type) uses pure calendar
    arithmetic — session-timezone independent, unlike unix_micros, which
    only accepts (and shifts by the zone of) TIMESTAMP_LTZ."""
    dtype = dict(df.dtypes).get(col, "")
    if dtype == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    return F.unix_micros(F.col(col))


def event_time_seconds(df: DataFrame, col: str = "ts"):
    """Whole seconds since epoch (floor), matching DuckDB's
    epoch(date_trunc('second', ts)) — timezone-independent for NTZ."""
    dtype = dict(df.dtypes).get(col, "")
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', date_trunc('SECOND', {col}))"
        )
    return F.unix_timestamp(F.col(col))


def _load_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Last-resort reader: pyarrow → microsecond timestamps → DataFrame.
    Only used when the session cannot be reconfigured for NANOS parquet;
    fixture tables at test scale fit comfortably in driver memory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    fields = []
    for f in t.schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            fields.append(pa.field(f.name, pa.timestamp("us")))
        else:
            fields.append(f)
    return spark.createDataFrame(t.cast(pa.schema(fields)).to_pandas())


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
