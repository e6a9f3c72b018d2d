"""Embedding-space corpus curation on an INTEGER-EXACT k-means.

The D4 recipe (Tirumala et al. 2023, arXiv:2308.12284) for pretraining
corpora: cluster the embedding space, then (a) drop the most
PROTOTYPICAL members of each cluster — near-centroid points are
template-like, low-information examples (SSL-prototypes, Sorscher et
al. 2022, arXiv:2206.14486) — and (b) rebalance what remains so no one
cluster dominates an epoch. This module provides both steps plus the
clusterer they share, as the embedding-space siblings of
`pipeline/sampling.py topic_balanced_sample` (SimHash proxy buckets)
and `pipeline/semantic_dedup.py` (which reuses the FLOAT kmeans for
near-dup dropping; here the goal is distribution shaping, not dedup).

Why a second k-means: `index/kmeans.py kmeans_fit` (the IVF coarse
quantizer, float32, driver-side over a bounded sample) is deliberately
NOT reproducible across engines — float reductions differ in the last
ulp. Curation decisions should be auditable ("exactly these doc ids
were dropped, and an independent engine agrees"), so this fit follows
the quantized-PCA idiom (functions/dimred.py): inputs quantize to
int64 micro-units (floor(x*1e6 + 0.5)); assignment distance, centroid
sums, and the floor-division centroid update are pure int64 arithmetic
— associative, partition-order-exact, and replayable bit-for-bit by
the DuckDB oracle, which re-runs the full Lloyd's loop as UNROLLED SQL
(one CTE chain per iteration) from the same parquet. Lloyd semantics
match index/kmeans.py / the reference ivf.go:317-377: first-k init
(smallest ids), squared-L2 argmin with lowest-cluster tie-break, empty
clusters keep their previous centroid; iteration count is FIXED (no
early stop) so both engines run the identical number of updates.

Scale: each iteration is one scan — assignment + per-cluster partial
sums fold inside mapInPandas (Arrow-batched int64 GEMM), emitting k
rows per partition; only O(partitions * k * d) ints reach the driver,
where the update is exact Python-int arithmetic. The per-partition
int64 sum bound (n_rows_per_cluster * max|xq| < 2^63) holds to ~1e13
unit-scale rows per cluster; the loud KM_LIMIT guard enforces the
unit-scale assumption the same way pca_project_quantized guards
PCA_OFF (ADVICE r05). Downstream operators are one cluster-keyed
window shuffle each (WindowGroupLimit-trimmable for the cap path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oasisdb_spark.functions.dimred import quantize_vectors_np
from oasisdb_spark.functions.distance import vector_indexable

__all__ = [
    "QuantizedKMeansModel",
    "KM_LIMIT",
    "kmeans_fit_quantized",
    "assign_clusters_quantized",
    "kmeans_cells",
    "prototype_prune",
    "cluster_balanced_sample",
]

# |quantized component| must stay below KM_LIMIT so (a) squared-L2 over
# d dims fits int64: d*(2*KM_LIMIT)^2 = 64*4e16 = 2.6e18 < 2^63, and
# (b) the positive-offset floor-division centroid update
# (s + KM_LIMIT*n)//n - KM_LIMIT has a positive dividend, making
# truncating and flooring division agree across engines (the PCA_OFF
# trick, functions/dimred.py). Unit-scale embeddings quantize to ~1e6,
# two orders inside the limit.
KM_LIMIT = 10**8


@dataclass
class QuantizedKMeansModel:
    """Integer k-means model: centroids in micro-units (SX=1e6).

    A pure deterministic function of the input table (integer
    arithmetic end to end), so an independent engine re-running the
    same Lloyd's loop derives the same bits — the property the
    kmeans_cells / proto_prune / cluster_balanced driver oracles gate.
    """

    centroids: np.ndarray  # (k, d) int64, micro-units
    iters: int

    @property
    def k(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]


def _quantize_guarded(vecs: list) -> np.ndarray:
    xq = quantize_vectors_np(np.asarray(vecs))
    if np.abs(xq).max(initial=0) >= KM_LIMIT:
        raise ValueError(
            f"cluster_curate: |quantized vector| >= KM_LIMIT ({np.abs(xq).max()}); "
            "inputs exceed the ~unit-scale range the int64 distance/update "
            "arithmetic assumes"
        )
    return xq


def _assign_int(xq: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """argmin_c ||xq-c||^2 in EXACT int64 (integer GEMM; no float
    rounding anywhere). Ties break to the lowest cluster id — numpy
    argmin's first-occurrence rule, mirrored by the oracle's
    ORDER BY d2, cluster. Returns (assign int64, d2 int64)."""
    x2 = np.einsum("ij,ij->i", xq, xq)
    c2 = np.einsum("ij,ij->i", cent, cent)
    d2 = x2[:, None] + c2[None, :] - 2 * (xq @ cent.T)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(a)), a]


def kmeans_fit_quantized(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> QuantizedKMeansModel:
    """Distributed integer Lloyd's: ``iters`` passes, each one scan.

    Init = the quantized vectors of the ``k`` smallest ids (the
    deterministic first-k rule of index/kmeans.py / ivf.go:321-328,
    made storage-order-free by keying on the id column). Per pass,
    partitions fold (cluster, per-dim int64 sums, count) locally and
    the driver finishes the update in arbitrary-precision Python ints;
    empty clusters keep their previous centroid.
    """
    if k < 1 or iters < 1:
        raise ValueError(f"kmeans_fit_quantized: need k>=1, iters>=1, got {k}, {iters}")
    # NULL vectors carry no moments and np.asarray dies opaquely on a
    # None row -- exclude them from seeding and every Lloyd pass (the
    # fit_pca convention); a NULL id would also break the first-k rule
    # (Spark sorts NULLs first, DuckDB last)
    df = df.where(vector_indexable(vec_col) & F.col(id_col).isNotNull())
    seed_rows = df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"kmeans_fit_quantized: k={k} but only {len(seed_rows)} rows")
    cent = _quantize_guarded([r[vec_col] for r in seed_rows])
    d = cent.shape[1]
    spark = df.sparkSession
    schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("s", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
        ]
    )
    vecs = df.select(vec_col)

    for _ in range(iters):
        b_cent = spark.sparkContext.broadcast(cent)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = b_cent.value
            sums = np.zeros((k, d), dtype=np.int64)
            cnt = np.zeros(k, dtype=np.int64)
            seen = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                xq = _quantize_guarded(pdf[vec_col].tolist())
                a, _ = _assign_int(xq, c)
                np.add.at(sums, a, xq)
                cnt += np.bincount(a, minlength=k)
                seen = True
            if seen:
                yield pd.DataFrame(
                    {"cluster": range(k), "s": [r.tolist() for r in sums], "n": cnt}
                )

        rows = vecs.mapInPandas(partials, schema=schema).collect()
        s = [[0] * d for _ in range(k)]
        n = [0] * k
        for r in rows:  # exact Python-int fold: no overflow at any scale
            c_i = r["cluster"]
            n[c_i] += r["n"]
            rs = r["s"]
            sc = s[c_i]
            for j in range(d):
                sc[j] += rs[j]
        new = cent.copy()
        for c_i in range(k):
            if n[c_i] > 0:  # empty clusters keep their centroid
                new[c_i] = [
                    (s[c_i][j] + KM_LIMIT * n[c_i]) // n[c_i] - KM_LIMIT for j in range(d)
                ]
        cent = new
    return QuantizedKMeansModel(centroids=cent, iters=iters)


def assign_clusters_quantized(
    df: DataFrame,
    model: QuantizedKMeansModel,
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One Arrow-batched scan: + (cluster INT, d2 LONG) — the exact
    int64 squared-L2 to the assigned centroid. No shuffle."""
    if keep_cols is None:
        keep_cols = [c for c in df.columns if c != vec_col]
    spark = df.sparkSession
    b_cent = spark.sparkContext.broadcast(model.centroids)
    in_schema = df.select(*keep_cols, vec_col).schema
    out_schema = T.StructType(
        [f for f in in_schema if f.name != vec_col]
        + [T.StructField("cluster", T.IntegerType()), T.StructField("d2", T.LongType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_cent.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xq = _quantize_guarded(pdf[vec_col].tolist())
            a, d2 = _assign_int(xq, c)
            out = pdf[keep_cols].copy()
            out["cluster"] = a.astype(np.int32)
            out["d2"] = d2
            yield out

    # a row without an embedding has no cell: excluded (documented
    # contract -- the ohlc_bars NULL-ts convention; np.asarray would
    # otherwise die opaquely on the None row)
    return (
        df.where(vector_indexable(vec_col))
        .select(*keep_cols, vec_col)
        .mapInPandas(assign, schema=out_schema)
    )


def kmeans_cells(
    df: DataFrame,
    model: QuantizedKMeansModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Long-form model + occupancy: (cluster, dim, centroid, n_points)
    — k*d rows. The cell map a curation run records next to its outputs
    (and the first hash-oracled view of a distributed k-means FIT:
    earlier kmeans oracles only ever checked exact-mode searches)."""
    # identifiable-rows contract: a NULL id cannot be curated (and the
    # SQL oracle's GROUP BY vec_id would collapse all NULL-id rows into
    # one) — the same exclusion kmeans_fit_quantized applies
    df = df.where(F.col(id_col).isNotNull())
    spark = df.sparkSession
    cent_long = spark.createDataFrame(
        [
            (c, j, int(model.centroids[c, j]))
            for c in range(model.k)
            for j in range(model.dim)
        ],
        schema="cluster INT, dim INT, centroid LONG",
    )
    sizes = (
        assign_clusters_quantized(df, model, vec_col=vec_col, keep_cols=[id_col])
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    return cent_long.join(F.broadcast(sizes), "cluster", "left").select(
        "cluster", "dim", "centroid", F.coalesce("n_points", F.lit(0)).cast("long").alias("n_points")
    )


def prototype_prune(
    df: DataFrame,
    model: QuantizedKMeansModel,
    drop_num: int = 1,
    drop_den: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Drop the drop_num/drop_den most PROTOTYPICAL rows of each
    cluster — the nearest-to-centroid fraction (SSL-prototypes: easy,
    template-like examples teach the least; at web scale pruning easy
    examples beats random subsampling). Exactly floor(n_c*num/den)
    rows drop per cluster: survivors satisfy rank*den > num*n_c with
    rank ordered by (d2 asc, id asc) — all-integer, so the kept SET is
    engine-exact, not just approximately sized. One window shuffle on
    cluster. Flip to outlier trimming by ranking d2 desc upstream if
    needed; D4 prunes the prototypical side, so that is the one shipped.
    """
    if not (0 <= drop_num and 0 < drop_den):
        raise ValueError(f"prototype_prune: bad fraction {drop_num}/{drop_den}")
    # identifiable-rows contract (see kmeans_cells): NULL ids can't be
    # pruned or survive — and they'd poison the (d2, id) tie-break
    df = df.where(F.col(id_col).isNotNull())
    asg = assign_clusters_quantized(df, model, vec_col=vec_col)
    w = Window.partitionBy("cluster").orderBy(F.col("d2").asc(), F.col(id_col).asc())
    wc = Window.partitionBy("cluster")
    return (
        asg.withColumn("c_rank", F.row_number().over(w))
        .withColumn("n_c", F.count(F.lit(1)).over(wc))
        .filter(F.col("c_rank") * drop_den > drop_num * F.col("n_c"))
        .drop("c_rank", "n_c")
    )


def cluster_balanced_sample(
    df: DataFrame,
    model: QuantizedKMeansModel,
    cap: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "cluster-balance",
) -> DataFrame:
    """Cap rows kept per k-means cell — the learned-cluster form of
    topic_balanced_sample (same md5-salted, storage-order-independent
    survivor rule; same one WindowGroupLimit-trimmed shuffle), for when
    an embedding space exists and buckets should follow it rather than
    SimHash. Returns input columns + (cluster, c_rank)."""
    if cap < 1:
        raise ValueError(f"cluster_balanced_sample: cap must be >= 1, got {cap}")
    # NULL ids hash to NULL and would hog the front of every cell's
    # sample (Spark asc = nulls first; DuckDB sorts them last) -- the
    # bottomk_sample exclusion
    asg = assign_clusters_quantized(
        df.where(F.col(id_col).isNotNull()), model, vec_col=vec_col
    ).drop("d2")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("cluster").orderBy(h.asc(), F.col(id_col).asc())
    return (
        asg.withColumn("c_rank", F.row_number().over(w))
        .filter(F.col("c_rank") <= cap)
    )
