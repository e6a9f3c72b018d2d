"""Binary quantization (BQ) index tier: one sign bit per dimension.

Extension beyond the reference's four index types (flat/ivf/ivfpq/hnsw —
SURVEY.md §2.2), filling the modern vector-DB "BQ" slot (RaBitQ-style
binary quantization): each dimension quantizes to `vector[d] > mean[d]`
(per-dim corpus means as thresholds), codes pack into uint64 words, and
search is an XOR-popcount hamming scan over codes **32× smaller than
the float32 vectors**, followed by an exact re-rank of a
k·refine_factor shortlist against the original vectors (the same
IVFPQR refine pattern as ivfpq/ivfsq).

Where IVF tiers prune WHICH rows are read (probe-shaped), BQ shrinks
HOW MUCH is read per row (scan-shaped, like SQ8 but 8× smaller again).
At 100 TB of float32 vectors the code table is ~3 TB — a full exact-ish
scan becomes IO-feasible with no recall cliff from centroid skew, the
standard tier for filtered / hard-to-cluster workloads.

Scale shape: codes are scanned once per query batch inside Arrow-batched
mapInPandas (queries broadcast, XOR+popcount per batch, local shortlist
per partition — knn_brute_batched's plan with a 32× lighter scan); the
only shuffle is the per-query shortlist window (O(partitions·nq·r·k)
rows), then the refine join touches k·refine_factor full vectors per
query, id-pruned at the parquet scan.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oasisdb_spark.index.ivf import deterministic_sample, run_query_chunks
from oasisdb_spark.pipeline.ann import _packbits64, _popcount64

__all__ = ["train_binq", "encode_binq", "build_binq", "knn_binq"]

TRAIN_SAMPLE_CAP = 200_000


def train_binq(base: DataFrame, vec_col: str = "vector", sample_cap: int = TRAIN_SAMPLE_CAP) -> np.ndarray:
    """Per-dimension thresholds = corpus means, fit on the same
    deterministic content-hash sample as the SQ/IVF trainers (unbiased
    wrt storage order, reproducible under any partitioning). Returns
    (dim,) float32."""
    n = base.count()
    sample = deterministic_sample(base.select(vec_col), n, sample_cap, vec_col)
    x = np.array(sample.toPandas()[vec_col].tolist(), dtype=np.float32)
    return x.mean(axis=0).astype(np.float32)


def _pack_rows(X: np.ndarray, means: np.ndarray) -> np.ndarray:
    """(n, dim) floats → (n, ceil(dim/64)) int64 code words (sign bits
    vs per-dim means; int64 view because Spark has no unsigned type —
    XOR/popcount are bit-level, signedness never matters)."""
    return _packbits64((X > means[None, :]).astype(np.float64)).view(np.int64)


def encode_binq(
    df: DataFrame, means: np.ndarray, id_col: str = "id", vec_col: str = "vector"
) -> DataFrame:
    """Encode vectors to packed sign-bit codes: (id, code ARRAY<BIGINT>).
    One Arrow-batched pass, means broadcast, no shuffle."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(means, dtype=np.float32))
    schema = T.StructType([
        T.StructField("id", df.schema[id_col].dataType, True),
        T.StructField("code", T.ArrayType(T.LongType()), False),
    ])
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vector"))

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["vector"].tolist(), dtype=np.float32)
            codes = _pack_rows(X, m)
            yield pd.DataFrame({"id": pdf["id"].values, "code": list(codes)})

    return src.mapInPandas(_map, schema=schema)


def build_binq(
    base: DataFrame,
    id_col: str = "id",
    vec_col: str = "vector",
    out_dir: str | None = None,
) -> tuple[np.ndarray, DataFrame]:
    """Index build (S8 shape): returns (means, code_df). With out_dir,
    persists model/means.npy + codes/ parquet (S12 persistence shape,
    matching the ivfsq/ivfpq model+lists layout)."""
    means = train_binq(base, vec_col)
    codes = encode_binq(base, means, id_col, vec_col)
    if out_dir:
        model_dir = os.path.join(out_dir, "model")
        os.makedirs(model_dir, exist_ok=True)
        np.save(os.path.join(model_dir, "means.npy"), means)
        codes.write.mode("overwrite").parquet(os.path.join(out_dir, "codes"))
        codes = base.sparkSession.read.parquet(os.path.join(out_dir, "codes"))
    return means, codes


def knn_binq(
    queries: DataFrame,
    means: np.ndarray,
    code_df: DataFrame,
    k: int,
    refine_base: DataFrame | None = None,
    refine_factor: int = 4,
    space: str = "l2",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_rows: int = 65_536,
    id_filter: DataFrame | None = None,
) -> DataFrame:
    """BQ search: hamming scan over packed codes → per-query shortlist of
    k·refine_factor → exact re-rank against refine_base in the declared
    space. Without refine_base, ranks by the hamming proxy itself
    (distance = code hamming — recall measured in RECALL.md).

    id_filter (filtered ANN): semi-joins the CODE scan before scoring —
    unlike the IVF tiers there is no probe stage to defer it past, but
    the reshuffle it costs is over 32×-compressed codes.

    max_query_rows: ann.py's chunk guard — larger query batches run as
    unioned chunks."""
    if space not in ("l2", "ip", "cos"):
        raise ValueError(f"knn_binq refines in l2/ip/cos, got {space!r}")
    spark = queries.sparkSession
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    chunked = run_query_chunks(
        spark, q_rows, queries.select(query_id_col, query_vec_col).schema, max_query_rows,
        lambda chunk: knn_binq(
            chunk, means, code_df, k, refine_base, refine_factor, space,
            query_id_col, query_vec_col, max_query_rows, id_filter,
        ),
    )
    if chunked is not None:
        return chunked
    qids = [r[query_id_col] for r in q_rows]
    Q = np.array([r[query_vec_col] for r in q_rows], dtype=np.float32)
    q_codes = _pack_rows(Q, np.ascontiguousarray(means, dtype=np.float32))
    bc_q = spark.sparkContext.broadcast((np.array(qids, dtype=object), q_codes))
    shortlist = max(k, k * max(refine_factor, 1)) if refine_base is not None else k

    if id_filter is not None:
        code_df = code_df.join(id_filter.select("id"), on="id", how="left_semi")

    out_schema = T.StructType([
        T.StructField("query_id", queries.schema[query_id_col].dataType, True),
        T.StructField("id", code_df.schema["id"].dataType, True),
        T.StructField("distance", T.LongType(), False),
    ])

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_arr, qc = bc_q.value
        qc64 = qc.view(np.uint64)
        nq = len(ids_arr)
        if nq == 0:
            return
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf["code"].tolist(), dtype=np.int64).view(np.uint64)
            # (nb, nq) hamming distances via XOR + popcount
            D = _popcount64(codes[:, None, :] ^ qc64[None, :, :])
            kk = min(shortlist, len(pdf))
            part = np.argpartition(D, kk - 1, axis=0)[:kk]
            yield pd.DataFrame({
                "query_id": np.repeat(ids_arr, kk),
                "id": pdf["id"].values[part.T.reshape(-1)],
                "distance": D[part.T.reshape(-1), np.repeat(np.arange(nq), kk)],
            })

    scored = code_df.mapInPandas(_scan, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc_nulls_last(), F.col("id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= shortlist)

    if refine_base is None:
        return top.filter(F.col("rank") <= k).select(
            "query_id", "id", "rank", F.col("distance").cast("double").alias("distance")
        )

    from oasisdb_spark.functions.distance import distance_expr

    qdf = spark.createDataFrame(
        list(zip(qids, [[float(v) for v in row] for row in Q])),
        T.StructType([
            T.StructField("query_id", queries.schema[query_id_col].dataType, True),
            T.StructField("query_vec", T.ArrayType(T.FloatType()), True),
        ]),
    )
    cand = (
        top.select("query_id", "id")
        .join(F.broadcast(qdf), on="query_id")
        .join(refine_base.select(F.col("id"), F.col("vector")), on="id")
    )
    exact = cand.select(
        "query_id", "id", distance_expr(space, "query_vec", "vector").alias("distance")
    )
    # asc_nulls_last: a NULL refine vector yields a NULL exact distance,
    # which must rank WORST (the topk_per_query rule)
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc_nulls_last(), F.col("id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "rank", "distance")
    )
