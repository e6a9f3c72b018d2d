"""Late-interaction (ColBERT-style MaxSim) retrieval over multi-vector
documents.

Modern retrieval stacks store a MATRIX of token-level vectors per
document (ColBERT/PLAID) and score a query's token vectors against them
with MaxSim:

    score(q, d) = Σ_i  max_j  q_i · d_j

Extension beyond the reference's single-vector search surface (SURVEY.md
§2.2 Q1-Q6) — the operator its users adopt next after dense retrieval.

Scale shape (the knn_brute_batched plan, generalized to segments):
queries' token matrices broadcast once; every Arrow batch of documents
flattens its token vectors into one (d_tokens × dim) block and scores a
SINGLE GEMM against the flattened query tokens, then two `reduceat`
passes turn token-level similarities into doc-level MaxSim scores
(max over each doc's token segment, sum over each query's token
segment). The base table is scanned once and never shuffled; the only
shuffle is the per-query top-k window over O(partitions·nq·k) local
winners. Python cost is numpy-BLAS per batch — no per-row work.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["maxsim_topk"]


def maxsim_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vecs_col: str = "query_vecs",
    id_col: str = "id",
    vecs_col: str = "vectors",
    max_query_tokens: int = 65_536,
) -> DataFrame:
    """Top-k MaxSim: (query_id, id, rank, distance) with
    distance = -score (ascending rank = best match), rounded to 3 dp for
    cross-engine comparability (the knn_brute convention — GEMM fold
    order differs from a SQL fold in the last ulp).

    queries: (query_id, query_vecs ARRAY<ARRAY<FLOAT>>); base:
    (id, vectors ARRAY<ARRAY<FLOAT>>). Empty token lists score 0.
    max_query_tokens bounds the broadcast query matrix."""
    spark = queries.sparkSession
    # indexable-rows contract (the _emb_base convention): NULL ids /
    # NULL token-vector lists are excluded on both sides (EMPTY lists
    # stay: they are defined to score 0 on the base side and rejected
    # on the query side below)
    queries = queries.where(
        F.col(query_id_col).isNotNull() & F.col(query_vecs_col).isNotNull()
    )
    base = base.where(F.col(id_col).isNotNull() & F.col(vecs_col).isNotNull())
    q_rows = queries.select(query_id_col, query_vecs_col).collect()
    qids = [r[query_id_col] for r in q_rows]
    q_mats = [np.array(r[query_vecs_col] or [], dtype=np.float64) for r in q_rows]
    n_tok = sum(len(m) for m in q_mats)
    if n_tok > max_query_tokens:
        raise ValueError(
            f"query batch has {n_tok} token vectors > max_query_tokens={max_query_tokens}; "
            "split the query batch"
        )
    dim = next((m.shape[1] for m in q_mats if m.size), 0)
    Qflat = (
        np.concatenate([m for m in q_mats if m.size], axis=0)
        if n_tok else np.zeros((0, dim))
    )
    # query token segment boundaries for add.reduceat (per-query sum)
    q_lens = np.array([len(m) for m in q_mats], dtype=np.int64)
    if len(q_lens) and (q_lens == 0).any():
        # reduceat treats an empty segment as a 1-element one (numpy
        # semantics), which would silently mis-score — reject instead
        raise ValueError("queries with zero token vectors are not supported")
    q_off = np.concatenate([[0], np.cumsum(q_lens)[:-1]])
    bc = spark.sparkContext.broadcast((np.array(qids, dtype=object), Qflat, q_lens, q_off))

    out_schema = T.StructType([
        T.StructField("query_id", queries.schema[query_id_col].dataType, True),
        T.StructField("id", base.schema[id_col].dataType, True),
        T.StructField("distance", T.DoubleType(), False),
    ])
    src = base.select(F.col(id_col).alias("id"), F.col(vecs_col).alias("vectors"))

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_arr, Qf, qlens, qoff = bc.value
        nq = len(ids_arr)
        if nq == 0 or Qf.shape[0] == 0:
            return
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # Arrow yields nested columns as ndarrays-of-ndarrays; `v or
            # []` is ambiguous on those — test length explicitly. NULL
            # token elements inside a non-NULL list are dropped (they
            # carry no similarity; an all-NULL list degrades to the
            # empty-list score-0 path instead of poisoning the packer
            # with a ragged object array)
            d_mats = [
                np.array([t for t in v if t is not None], dtype=np.float64)
                if v is not None and len(v) and any(t is not None for t in v)
                else np.zeros((0, 0))
                for v in pdf["vectors"]
            ]
            d_lens = np.array([len(m) for m in d_mats], dtype=np.int64)
            keep = d_lens > 0
            if not keep.any():
                continue
            mats = [m for m in d_mats if m.size]
            Dflat = np.concatenate(mats, axis=0)
            d_off = np.concatenate([[0], np.cumsum(d_lens[keep])[:-1]])
            S = Dflat @ Qf.T                      # (d_tokens, q_tokens)
            # max over each doc's token segment → (n_docs, q_tokens)
            M = np.maximum.reduceat(S, d_off, axis=0)
            # sum over each query's token segment → (n_docs, nq)
            scores = np.add.reduceat(M, qoff, axis=1)
            D = -scores                           # ascending = best
            kk = min(k, M.shape[0])
            part = np.argpartition(D, kk - 1, axis=0)[:kk]
            doc_ids = pdf["id"].values[keep]
            yield pd.DataFrame({
                "query_id": np.repeat(ids_arr, kk),
                "id": doc_ids[part.T.reshape(-1)],
                "distance": D[part.T.reshape(-1), np.repeat(np.arange(nq), kk)],
            })

    scored = src.mapInPandas(_score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "rank", F.round("distance", 3).alias("distance"))
    )
