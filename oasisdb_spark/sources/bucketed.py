"""Bucketed-table sink: pre-shuffle once, join forever shuffle-free.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders,
events x sessions) is shuffling BOTH sides on the key every time the
join runs. Bucketing pays that shuffle once at write time: rows are
hash-partitioned into a fixed number of buckets on the join key and
sorted within each bucket, so a later join of two tables bucketed the
same way is a zero-Exchange sort-merge join — each task zips bucket i
of A with bucket i of B. The same property serves repeated groupBy on
the bucket key.

Bucket-count guidance: buckets are the unit of join parallelism and
are fixed at write time — size them so one bucket of the LARGER table
fits an executor core's working set at full scale (e.g. 100 TB / 4096
buckets ≈ 25 GB per bucket pre-compression; prefer more, smaller
buckets). Both join sides must agree on bucket count or Spark falls
back to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (saveAsTable is
    required — plain .parquet() writes drop bucket metadata, and without
    it the reader cannot prove the layout and must re-shuffle)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its layout metadata intact."""
    return spark.table(table)
