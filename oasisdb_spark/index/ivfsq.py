"""IVF-SQ8: inverted file + per-dimension scalar quantization.

No direct counterpart in the reference (it ships flat/ivf_flat/ivfpq/
hnsw); SQ8 is the standard middle tier between IVF-Flat and IVF-PQ
(FAISS `IndexIVFScalarQuantizer`): each float32 component quantizes to
one uint8 against a per-dimension [vmin, vmax] range learned at train
time — 4× smaller list scans than raw float32 with far less distortion
than PQ's 32× (one code per component vs one per 8-dim subspace), so
recall stays near-exact without a refine pass.

Spark design mirrors index/ivf.py: the index is a DataFrame
(cluster_id, id, codes BINARY) partitioned by cluster_id (partition-
pruned probes), the quantizer state (centroids + vmin/vmax vectors) is
broadcast, and search decodes candidates batch-wise in an Arrow pass —
dequantize is a fused multiply-add, then the same GEMM + top-k shape as
the other kernels.

Add-after-build quantizes arrivals against the TRAINED [vmin, vmax]
(values outside the trained range clamp to the boundary code — the same
drift-until-rebuild semantics as IVF centroids; periodic build_index
refreshes both).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oasisdb_spark.index.flat import topk_per_query
from oasisdb_spark.index.ivf import (
    apply_id_filter, deterministic_sample, rank_probes, run_query_chunks, train_centroids,
)

__all__ = ["train_sq", "encode_sq", "build_ivfsq", "knn_ivfsq"]


def train_sq(base: DataFrame, vec_col: str = "vector", sample_cap: int = 65_536):
    """Per-dimension [vmin, vmax] from a deterministic content-hash
    sample, widened by 1% margin so out-of-sample values clamp rather
    than fold. Returns (vmin, vmax) float32 vectors."""
    sample = deterministic_sample(base.select(vec_col), base.count(), sample_cap, vec_col)
    x = np.array(sample.toPandas()[vec_col].tolist(), dtype=np.float32)
    vmin, vmax = x.min(axis=0), x.max(axis=0)
    span = np.maximum(vmax - vmin, 1e-12)
    return (vmin - 0.01 * span).astype(np.float32), (vmax + 0.01 * span).astype(np.float32)


def _quantize(x: np.ndarray, vmin: np.ndarray, vmax: np.ndarray) -> np.ndarray:
    scale = (vmax - vmin).astype(np.float64)
    q = np.rint((x.astype(np.float64) - vmin) / scale * 255.0)
    return np.clip(q, 0, 255).astype(np.uint8)


def _dequantize(codes: np.ndarray, vmin: np.ndarray, vmax: np.ndarray) -> np.ndarray:
    scale = (vmax - vmin).astype(np.float64) / 255.0
    return codes.astype(np.float64) * scale + vmin.astype(np.float64)


def encode_sq(
    df: DataFrame,
    centroids: np.ndarray,
    vmin: np.ndarray,
    vmax: np.ndarray,
    vec_col: str = "vector",
) -> DataFrame:
    """Assign cluster + quantize in one Arrow pass. Output: input
    columns − vector + (cluster_id INT, codes BINARY dim bytes)."""
    spark = df.sparkSession
    bc_c = spark.sparkContext.broadcast(centroids.astype(np.float32))
    bc_r = spark.sparkContext.broadcast((vmin, vmax))
    keep = [f.name for f in df.schema.fields if f.name != vec_col]
    out_fields = [f for f in df.schema.fields if f.name != vec_col] + [
        T.StructField("cluster_id", T.IntegerType(), False),
        T.StructField("codes", T.BinaryType(), False),
    ]

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc_c.value.astype(np.float64)
        c2 = (c**2).sum(1)[None, :]
        lo, hi = bc_r.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float32)
            xd = x.astype(np.float64)
            assign = ((xd**2).sum(1)[:, None] + c2 - 2.0 * (xd @ c.T)).argmin(1)
            codes = _quantize(x, lo, hi)
            out = pdf[keep].copy()
            out["cluster_id"] = assign.astype(np.int32)
            out["codes"] = [bytearray(row.tobytes()) for row in codes]
            yield out

    return df.mapInPandas(_map, schema=T.StructType(out_fields))


def build_ivfsq(
    base: DataFrame,
    nlist: int = 100,
    id_col: str = "id",
    vec_col: str = "vector",
    out_dir: str | None = None,
):
    """Returns (centroids, vmin, vmax, index_df(cluster_id, id, codes)).
    Same persistence layout as the other tiers: cluster_id-partitioned
    lists + npy quantizer state."""
    centroids = train_centroids(base, nlist, vec_col)
    vmin, vmax = train_sq(base, vec_col)
    index_df = encode_sq(
        base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vector")),
        centroids, vmin, vmax,
    )
    if out_dir:
        spark = base.sparkSession
        index_df.repartition("cluster_id").write.mode("overwrite").partitionBy("cluster_id").parquet(
            os.path.join(out_dir, "lists")
        )
        np_dir = os.path.join(out_dir, "model")
        os.makedirs(np_dir, exist_ok=True)
        np.save(os.path.join(np_dir, "centroids.npy"), centroids)
        np.save(os.path.join(np_dir, "vmin.npy"), vmin)
        np.save(os.path.join(np_dir, "vmax.npy"), vmax)
        index_df = spark.read.parquet(os.path.join(out_dir, "lists"))
    return centroids, vmin, vmax, index_df


def knn_ivfsq(
    queries: DataFrame,
    centroids: np.ndarray,
    vmin: np.ndarray,
    vmax: np.ndarray,
    index_df: DataFrame,
    k: int,
    nprobe: int = 10,
    space: str = "l2",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    refine_base: DataFrame | None = None,
    refine_factor: int = 4,
    max_query_rows: int = 65_536,
    id_filter: DataFrame | None = None,
) -> DataFrame:
    """Probe-pruned search with asymmetric distance (exact query vs
    dequantized candidates): probes broadcast-join the partition-pruned
    lists, each Arrow batch dequantizes its codes and scores one GEMM
    against the broadcast query block, then the usual top-k merge.

    space: l2 (squared) | ip (-dot) | cos (1-cos) — the collection's
    declared metric is honored end-to-end (probe ranking stays L2-to-
    centroid, as in knn_ivf / the reference ivf.go:186-195). Hamming is
    rejected: SQ8 codes are not a binary representation (Catalog.
    create_collection enforces the same rule at declaration time).

    refine_base: optional (id, vector) table. When given, a k*refine_
    factor shortlist of dequantized-distance candidates is re-ranked
    with the EXACT metric against original vectors (same FAISS IVFPQR
    pattern as knn_ivfpq) — with refine_factor*k >= N this makes the
    search metric-exact end-to-end, the driver-gate configuration.

    max_query_rows bounds the driver collect/broadcast of the query
    batch: larger batches run as chunks, each its own probe join,
    results unioned (ann.py's scale guard)."""
    if space not in ("l2", "ip", "cos"):
        raise ValueError(f"knn_ivfsq supports l2/ip/cos, got {space!r}")
    spark = queries.sparkSession
    dim = centroids.shape[1]
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    chunked = run_query_chunks(
        spark, q_rows, queries.select(query_id_col, query_vec_col).schema, max_query_rows,
        lambda chunk: knn_ivfsq(
            chunk, centroids, vmin, vmax, index_df, k, nprobe, space,
            query_id_col, query_vec_col, refine_base, refine_factor, max_query_rows, id_filter,
        ),
    )
    if chunked is not None:
        return chunked
    qids = [r[query_id_col] for r in q_rows]
    Q = np.array([r[query_vec_col] for r in q_rows], dtype=np.float64)
    bc_q = spark.sparkContext.broadcast((qids, Q))
    bc_r = spark.sparkContext.broadcast((vmin, vmax))

    probes = rank_probes(queries, centroids, nprobe, query_id_col, query_vec_col).select(
        "query_id", "cluster_id"
    )
    cand = apply_id_filter(F.broadcast(probes).join(index_df, on="cluster_id"), id_filter)
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id_col].dataType, True),
            T.StructField("id", index_df.schema["id"].dataType, True),
            T.StructField("distance", T.DoubleType(), False),
        ]
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_qids, Qm = bc_q.value
        qpos = {q: i for i, q in enumerate(all_qids)}
        q_sq = (Qm**2).sum(axis=1)
        q_norm = np.sqrt(q_sq)
        lo, hi = bc_r.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(b"".join(bytes(b) for b in pdf["codes"]), dtype=np.uint8)
            X = _dequantize(codes.reshape(len(pdf), dim), lo, hi)
            cols = np.array([qpos[q] for q in pdf["query_id"]])
            # row-wise distance to each row's own query (candidates come
            # pre-paired with a query by the probe join)
            dot = np.einsum("ij,ij->i", X, Qm[cols])
            if space == "l2":
                x_sq = (X**2).sum(axis=1)
                d = np.maximum(x_sq + q_sq[cols] - 2.0 * dot, 0.0)
            elif space == "ip":
                d = -dot
            else:  # cos
                x_norm = np.sqrt((X**2).sum(axis=1))
                denom = np.maximum(x_norm * q_norm[cols], 1e-30)
                d = 1.0 - dot / denom
            yield pd.DataFrame({"query_id": pdf["query_id"], "id": pdf["id"], "distance": d})

    scored = cand.mapInPandas(_score, schema=out_schema)
    if refine_base is None:
        return topk_per_query(scored, k)
    shortlist = topk_per_query(scored, k * refine_factor).select("query_id", "id")
    from oasisdb_spark.functions.distance import distance_expr

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("query_vec")
    )
    rescored = (
        shortlist.join(refine_base.select("id", "vector"), on="id")
        .join(F.broadcast(q), on="query_id")
        .select("query_id", "id", distance_expr(space, "query_vec", "vector").alias("distance"))
    )
    return topk_per_query(rescored, k)
