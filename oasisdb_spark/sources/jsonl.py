"""JSONL corpus source: the de-facto interchange format for training
corpora (one JSON document per line).

The reference ingests only via REST request bodies (handlers.go:185-213,
:305-321) — files never enter it. A Spark-native corpus engine needs a
bulk file path with the properties REST ingest gives the reference:
schema enforcement (dimension/type checks) and explicit rejection of
malformed input (the reference 400s bad JSON; wal/reader.go rejects
malformed records). Here that is:

- an explicit schema (no runtime inference scan — at 100 TB, schema
  inference means reading the data twice),
- PERMISSIVE parse with a _corrupt_record column: bad lines are
  captured, not dropped (badRecordsPath-style triage without a vendor
  runtime), and split off for inspection,
- line-splittable input: uncompressed/bgzip JSONL parallelizes by
  byte range — maxPartitionBytes governs task sizing exactly like
  parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOC_JSONL_SCHEMA", "read_jsonl_corpus"]

# documents-table shape plus the capture column
DOC_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_JSONL_SCHEMA,
    require: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → (good, bad). A row is bad if it failed to
    parse (_corrupt_record captured) or misses a required field — both
    land in `bad` with the raw line preserved where available; `good`
    drops the capture column."""
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark only populates _corrupt_record when the row is materialized
    # with it selected; cache so good/bad split reads one parse
    df = df.cache()
    missing = [F.col(c).isNull() for c in require]
    is_bad = F.col("_corrupt_record").isNotNull()
    for m in missing:
        is_bad = is_bad | m
    good = df.filter(~is_bad).drop("_corrupt_record")
    bad = df.filter(is_bad)
    return good, bad
