"""Similarity search over embedding columns — the scale paths.

Three tiers (SURVEY.md Q3-Q6 capability, re-shaped for 100 TB):
1. knn_brute_batched (here): exact top-k via per-partition numpy GEMM —
   queries broadcast, each Arrow batch of the base table scored as one
   (batch x dim) @ (dim x nq) matrix multiply (BLAS = the reference's
   SIMD kernels, space_l2.h, but batched), local top-k per partition,
   then a global top-k over num_partitions*k rows. The base table is
   scanned once, never shuffled; shuffle volume is O(partitions*nq*k).
   This is the throughput-optimal exact path.
2. index/ivf.knn_ivf: probe-pruned approximate path (scan nprobe/nlist
   of the data).
3. index/ivfpq.knn_ivfpq: compressed-scan path (32x smaller reads)
   + exact refine.

knn_flat (index/flat.py) remains the expression-based executable spec —
bit-reproducible against SQL oracles; this module is the fast twin
(float32 GEMM, last-ulp differences from fold order, identical id sets
on non-degenerate data).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["knn_brute_batched", "cosine_topk_batched"]


def _topk_merge(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _packbits64(M: np.ndarray) -> np.ndarray:
    """(n, dim) 0/1 floats → (n, ceil(dim/64)) uint64 bit words."""
    bits = (M != 0).astype(np.uint8)
    pad = (-bits.shape[1]) % 64
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1).view(np.uint64)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(words: np.ndarray) -> np.ndarray:
    """Popcount over the last axis of a uint64 array via a byte LUT."""
    b = words.view(np.uint8).reshape(*words.shape[:-1], -1)
    return _POP8[b].sum(axis=-1, dtype=np.int64)


def _emit_topk(pdf: pd.DataFrame, qids, D: np.ndarray, k: int, select_key: np.ndarray | None = None):
    """Local top-k per query inside one Arrow batch (shared by the GEMM
    and hamming kernels): (nb, nq) distances → <= k rows per query.
    select_key: optional tie-deterministic selection key (same shape as
    D); defaults to D itself (fine for continuous distances)."""
    nq = D.shape[1]
    kk = min(k, len(pdf))
    part = np.argpartition(D if select_key is None else select_key, kk - 1, axis=0)[:kk]
    yield pd.DataFrame(
        {
            "query_id": np.repeat(qids, kk),
            "id": pdf["id"].values[part.T.reshape(-1)],
            "distance": D[part.T.reshape(-1), np.repeat(np.arange(nq), kk)],
        }
    )


def knn_brute_batched(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    space: str = "l2",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "id",
    vec_col: str = "vector",
    max_query_rows: int = 65_536,
    gemm_dtype: str = "float32",
    hard_query_cap: int | None = None,
) -> DataFrame:
    """Exact kNN via broadcast queries + per-batch GEMM + two-level top-k.

    space: l2 (squared) | ip (-dot) | cos (1-cos) | hamming (#unequal
    components, distance.go:5-41 parity).

    hamming takes a batch kernel of its own: when both sides are binary
    (every component 0/1 — the usual hamming regime), components pack
    into uint64 words and distance is XOR + popcount over the packed
    words, a 64x cut in compared elements; general float vectors use a
    vectorized elementwise-inequality count. Both scan the base once
    with broadcast queries — same shape as the GEMM spaces.

    max_query_rows bounds the broadcast: a query batch larger than this
    runs as ceil(nq/max) chunks, each its own broadcast + base scan,
    results unioned. At 64-d float32 the default keeps each broadcast
    ~16 MB; the trade (extra base scans vs unbounded broadcast) is the
    scale guard SCALING.md documents.

    gemm_dtype: 'float32' (default — half the memory traffic, 2x BLAS
    throughput; last-ulp distance noise ~1e-7 relative) or 'float64'
    (noise ~1e-14 — use when downstream ROUNDS distances for a hash
    gate and a 1e-7 wobble could flip a rounding boundary, as
    mutual_knn_pairs does).

    hard_query_cap: raise (instead of chunking) when the collected
    query batch exceeds it — the loud-guard hook for callers whose
    query set IS the base (mutual_knn_pairs' self-kNN): checking the
    length of the collect this kernel pays anyway costs no extra job.
    """
    if space not in ("l2", "ip", "cos", "hamming"):
        raise ValueError(f"knn_brute_batched supports l2/ip/cos/hamming, got {space!r}")
    spark = base.sparkSession
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if hard_query_cap is not None and len(q_rows) > hard_query_cap:
        raise ValueError(
            f"knn_brute_batched: query batch has {len(q_rows)} rows, over the "
            f"caller's hard cap {hard_query_cap} — brute scoring at this size "
            "is quadratic; use the IVF composition or raise the cap explicitly"
        )
    if len(q_rows) > max_query_rows:
        out = None
        for lo in range(0, len(q_rows), max_query_rows):
            chunk = spark.createDataFrame(
                q_rows[lo : lo + max_query_rows], queries.select(query_id_col, query_vec_col).schema
            )
            part = knn_brute_batched(
                chunk, base, k, space, query_id_col, query_vec_col, id_col, vec_col, max_query_rows, gemm_dtype
            )
            out = part if out is None else out.unionByName(part)
        return out
    q_ids = [r[query_id_col] for r in q_rows]
    _dt = np.float64 if gemm_dtype == "float64" else np.float32
    Q = np.array([r[query_vec_col] for r in q_rows], dtype=_dt)
    bc = spark.sparkContext.broadcast((q_ids, Q))

    id_type = base.schema[id_col].dataType
    qid_type = queries.schema[query_id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type, True),
            T.StructField("id", id_type, True),
            T.StructField("distance", T.DoubleType(), True),
        ]
    )
    b = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vector"))

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, Qm = bc.value
        Qt = Qm.T  # (dim, nq)
        q_sq = (Qm.astype(np.float64) ** 2).sum(axis=1)  # (nq,)
        q_norm = np.sqrt(q_sq)
        nq = len(qids)
        q_binary = space == "hamming" and bool(np.isin(Qm, (0.0, 1.0)).all())
        q_packed = _packbits64(Qm) if q_binary else None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["vector"].tolist(), dtype=Qm.dtype)  # (nb, dim)
            if space == "hamming":
                # integer distances tie constantly: pre-sort the batch by
                # id and select on the composite key dist*nb + row, so the
                # local top-k keeps boundary ties in (distance, id) order
                # — the same total order the global merge (and the SQL
                # oracle) uses. Still O(nb) selection per query.
                order = np.argsort(pdf["id"].values, kind="stable")
                pdf = pdf.iloc[order]
                X = X[order]
                if q_binary and bool(np.isin(X, (0.0, 1.0)).all()):
                    # packed-bits path: XOR + popcount over uint64 words
                    xp = _packbits64(X)
                    D = _popcount64(xp[:, None, :] ^ q_packed[None, :, :])
                else:
                    # general floats: elementwise-inequality count, chunked
                    # over queries to bound the (nb, chunk, dim) bool cube
                    cols = []
                    step = max(1, (1 << 24) // max(1, X.shape[0] * X.shape[1]))
                    for lo in range(0, nq, step):
                        cols.append(
                            (X[:, None, :] != Qm[None, lo : lo + step, :]).sum(axis=2)
                        )
                    D = np.concatenate(cols, axis=1)
                nb = len(pdf)
                key = D.astype(np.int64) * nb + np.arange(nb, dtype=np.int64)[:, None]
                yield from _emit_topk(pdf, qids, D.astype(np.float64), k, select_key=key)
                continue
            G = (X @ Qt).astype(np.float64)  # (nb, nq) dot products
            if space == "l2":
                x_sq = (X.astype(np.float64) ** 2).sum(axis=1)
                # clamp: ||x||²+||q||²-2x·q can go slightly negative from
                # cancellation when x≈q; true squared distance is >= 0
                D = np.maximum(x_sq[:, None] + q_sq[None, :] - 2.0 * G, 0.0)
            elif space == "ip":
                D = -G
            else:  # cos
                x_norm = np.sqrt((X.astype(np.float64) ** 2).sum(axis=1))
                denom = x_norm[:, None] * q_norm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    D = np.where(denom > 0, 1.0 - G / denom, 1.0)
            yield from _emit_topk(pdf, qids, D, k)

    scored = b.mapInPandas(_score, schema=out_schema)
    return _topk_merge(scored, k)


def cosine_topk_batched(
    queries: DataFrame, base: DataFrame, k: int, **kw
) -> DataFrame:
    """Cosine top-k — the embedding-similarity-search entry point."""
    return knn_brute_batched(queries, base, k, space="cos", **kw)
