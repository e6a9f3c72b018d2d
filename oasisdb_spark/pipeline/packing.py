"""Sequence packing for LLM training-data pipelines.

Turns a document table into fixed-length training sequences. Two
strategies, matching the two shapes real pipelines use:

- ``chunk_pack``: GPT-style concat-and-chop. Documents are hashed into
  ``n_buckets`` independent streams, concatenated in deterministic
  (doc_id) order, and the token stream is chopped every ``seq_len``
  tokens; each document is labeled with the chunk range it lands in.
  Pure window arithmetic (one shuffle on bucket, cumulative sum, no
  Python) — fully SQL-expressible, so it carries a DuckDB oracle.
  Buckets are the unit of parallelism: at 100 TB you raise n_buckets
  so each stream's window sort fits an executor; chunk ids are
  bucket-local by design, so no cross-bucket coordination exists.

- ``greedy_pack``: whole-document packing (no splits). Per bucket,
  first-fit-decreasing over token counts via applyInPandas —
  sequential by nature, Arrow-batched, deterministic given the
  (tokens desc, doc_id) order. Bin ids are bucket-local. Documents
  longer than the capacity get a singleton bin (truncation is the
  trainer's call, not the packer's).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oasisdb_spark.pipeline.text import token_count

__all__ = ["chunk_pack", "greedy_pack", "next_fit_pack"]


def chunk_pack(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Label each doc with its bucket-local chunk span after concat-and-chop.

    Returns (id_col, bucket, n_tokens, start_chunk, end_chunk): the doc's
    tokens occupy stream positions [cum - n, cum) of its bucket, i.e.
    chunks floor((cum-n)/seq_len) .. floor((cum-1)/seq_len). Empty docs
    attach to the chunk at their stream position.
    """
    # identifiable docs only (greedy/next-fit parity): the cumulative
    # window orders by id, and NULL ids make the tie-order — hence the
    # chunk boundaries — engine-ambiguous
    docs = docs.where(F.col(id_col).isNotNull())
    t = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).alias("bucket"),
        # NULL text = 0 tokens (the sampling.py convention — a NULL
        # n_tokens would NaN-poison the pandas fill accumulators)
        F.coalesce(token_count(text_col).cast("bigint"), F.lit(0)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return c.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / seq_len).alias("start_chunk"),
        F.floor((F.greatest(F.col("cum"), F.col("cum") - F.col("n_tokens") + 1) - 1) / seq_len).alias("end_chunk"),
    )


def greedy_pack(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """First-fit-decreasing whole-document packing per hash bucket.

    Returns (id_col, bucket, n_tokens, bin_id) with bucket-local bin
    ids; sum(n_tokens) per bin <= capacity whenever every member fits
    the capacity individually.
    """
    # identifiable docs only: a packed sequence references documents
    # by id (the oracle's per-bucket recursion joins on it) — NULL
    # ids cannot be packed
    docs = docs.where(F.col(id_col).isNotNull())
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_buckets).alias("bucket"),
        # NULL text = 0 tokens (the sampling.py convention — a NULL
        # n_tokens would NaN-poison the pandas fill accumulators)
        F.coalesce(token_count(text_col).cast("bigint"), F.lit(0)).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort")
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        for n in pdf["n_tokens"]:
            for i, rem in enumerate(bins):
                if n <= rem:
                    bins[i] = rem - n
                    assigned.append(i)
                    break
            else:
                bins.append(max(capacity - n, 0))
                assigned.append(len(bins) - 1)
        pdf = pdf.assign(bin_id=assigned)
        return pdf[["doc_id", "bucket", "n_tokens", "bin_id"]]

    out = t.groupBy("bucket").applyInPandas(
        pack, "doc_id BIGINT, bucket BIGINT, n_tokens BIGINT, bin_id BIGINT"
    )
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out


def next_fit_pack(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Next-fit whole-document packing per hash bucket: walk docs in
    (doc_id) order, open a new bin whenever the current one can't take
    the next doc. One sequential pass per bucket (applyInPandas),
    parallel across buckets — the streaming-friendly packer (bins close
    as the scan advances; FFD must keep every bin open).

    ~2x looser than FFD on skewed lengths, but fully deterministic from
    the scan order alone, which makes it the one packing strategy a SQL
    engine can replay exactly (recursive CTE) — so this variant is the
    oracle-verified member of the packing family. Oversized docs get a
    singleton bin.

    Returns (id_col, bucket, n_tokens, bin_id), bucket-local bin ids.
    """
    # identifiable docs only: a packed sequence references documents
    # by id (the oracle's per-bucket recursion joins on it) — NULL
    # ids cannot be packed
    docs = docs.where(F.col(id_col).isNotNull())
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_buckets).alias("bucket"),
        # NULL text = 0 tokens (the sampling.py convention — a NULL
        # n_tokens would NaN-poison the pandas fill accumulators)
        F.coalesce(token_count(text_col).cast("bigint"), F.lit(0)).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        fill, bin_id, assigned = 0, 0, []
        first = True
        for n in pdf["n_tokens"]:
            if not first and fill + n > capacity:
                bin_id += 1
                fill = 0
            fill += n
            first = False
            assigned.append(bin_id)
        return pdf.assign(bin_id=assigned)[["doc_id", "bucket", "n_tokens", "bin_id"]]

    out = t.groupBy("bucket").applyInPandas(
        pack, "doc_id BIGINT, bucket BIGINT, n_tokens BIGINT, bin_id BIGINT"
    )
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out
