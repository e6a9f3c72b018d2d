"""IVF-Flat: inverted-file index with coarse quantization.

Reference: internal/index/ivf.go —
- Train: k-means over the data (ivf.go:99-127,317-377)
- Add: assign each vector to its nearest centroid's inverted list
  (ivf.go:304-315 closestCentroid)
- Search: rank centroids by distance to the query (ivf.go:186-195), scan
  the nprobe nearest lists (ivf.go:197-209), sort candidates, take k
  (ivf.go:211-227).

Spark design (SURVEY.md §4 row 1):
- The index is a DataFrame (cluster_id, id, vector) written PARTITIONED
  BY cluster_id, plus a tiny centroids table. Partitioning by cluster_id
  is the inverted list: a probe of p clusters reads only p/nlist of the
  data — partition pruning does at scan time what the reference's
  in-memory list indirection does in RAM.
- Assignment and probe-selection are vectorized numpy against BROADCAST
  centroids inside mapInPandas (nlist x dim floats ~ KBs) — no shuffle,
  no nlist-fold row blowup.
- The search is then an equi-join (query x probed cluster_id) against
  the partition-pruned index table + the same top-k window as flat.
  Shuffle volume is bounded by candidates-after-pruning, i.e. ~nprobe/
  nlist of the base table per query batch.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oasisdb_spark.index.flat import topk_per_query
from oasisdb_spark.index.kmeans import kmeans_fit

__all__ = ["train_centroids", "assign_clusters", "build_ivf", "add_to_ivf", "knn_ivf", "rank_probes", "deterministic_sample", "ivf_search_stats"]

DEFAULT_NLIST = 100  # const.go:26-30
DEFAULT_NPROBE = 10
TRAIN_SAMPLE_CAP = 200_000  # rows collected to the driver for kmeans fit


def train_centroids(
    base: DataFrame, nlist: int, vec_col: str = "vector", sample_cap: int | None = None
) -> np.ndarray:
    """Fit coarse centroids on a deterministic UNBIASED sample: rows
    whose content hash falls under cap/n of the hash space (xxhash64 of
    the vector — reproducible across runs/partitionings, no storage-
    order bias; the reference trains on first-k rows, ivf.go:321-328,
    which skews centroids toward ingest order). Returns (nlist, dim)
    float32.

    sample_cap defaults to min(TRAIN_SAMPLE_CAP, 256·nlist) — ~256
    training points per centroid is the standard coarse-quantizer
    budget (what FAISS recommends); more rows sharpen centroids
    negligibly while the fit cost grows linearly."""
    if sample_cap is None:
        sample_cap = min(TRAIN_SAMPLE_CAP, max(10_000, 256 * nlist))
    n = base.count()
    sample = deterministic_sample(base.select(vec_col), n, sample_cap, vec_col)
    x = np.array(sample.toPandas()[vec_col].tolist(), dtype=np.float32)
    return kmeans_fit(x, nlist)


def deterministic_sample(df: DataFrame, n: int, cap: int, vec_col: str) -> DataFrame:
    """~cap rows chosen by content hash: the threshold ALONE defines the
    sample (no trailing .limit, whose partition-order dependence would
    make trained centroids/SQ ranges vary across runs — round-2 advisory
    fix), so membership is a pure function of row content:
    deterministic, partitioning-independent, unbiased wrt storage order.
    Yields ~cap rows in expectation (training is insensitive to a few %
    jitter). The filter runs distributed; only the survivors move."""
    if n <= cap:
        return df
    space = 1 << 20
    thresh = min(space, int(space * (cap / n)) + 1)
    return df.where(F.pmod(F.xxhash64(F.col(vec_col)), F.lit(space)) < thresh)


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "vector",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Nearest-centroid assignment (ivf.go:304-315) as a vectorized
    Arrow-batched map — one pass over the data, centroids broadcast."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(centroids, dtype=np.float32))
    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.IntegerType(), False)])
    cols = df.columns

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value.astype(np.float64)
        c2 = (c**2).sum(axis=1)[None, :]
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float32).astype(np.float64)
            if len(x) == 0:
                pdf[out_col] = np.array([], dtype=np.int32)
                yield pdf
                continue
            d = (x**2).sum(axis=1)[:, None] + c2 - 2.0 * (x @ c.T)
            pdf = pdf.copy()
            pdf[out_col] = d.argmin(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(_map, schema=schema).select(*cols, out_col)


def build_ivf(
    base: DataFrame,
    nlist: int = DEFAULT_NLIST,
    id_col: str = "id",
    vec_col: str = "vector",
    out_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Index build (S8 / ivf.go Train+AddBatch): returns
    (centroids_df(cluster_id, centroid), index_df(cluster_id, id, vector)).
    If out_dir is given, both are persisted — index partitioned by
    cluster_id (the on-disk inverted lists)."""
    spark = base.sparkSession
    centroids = train_centroids(base, nlist, vec_col)
    cent_df = spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cluster_id INT, centroid ARRAY<FLOAT>",
    )
    index_df = assign_clusters(
        base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vector")), centroids
    )
    if out_dir:
        cent_df.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
        # repartition on the partition column first: one task writes each
        # inverted list (one file per cluster) instead of every task
        # opening every partition dir — measured 2.4× faster at 200k/256
        index_df.repartition("cluster_id").write.mode("overwrite").partitionBy("cluster_id").parquet(
            os.path.join(out_dir, "lists")
        )
        cent_df = spark.read.parquet(os.path.join(out_dir, "centroids"))
        index_df = spark.read.parquet(os.path.join(out_dir, "lists"))
    return cent_df, index_df


def add_to_ivf(
    new_df: DataFrame,
    centroids_df: DataFrame,
    lists_dir: str,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Add-after-build (ivf.go:99-127 Add/AddBatch; exercised by the
    reference's add-after-train test, ivf_test.go:96): assign new vectors
    to the EXISTING centroids — no retrain — and append them to the
    on-disk inverted lists.

    The append writes new immutable parquet files into the matching
    cluster_id partition dirs; a subsequent read of the lists sees them.
    Centroids drift as data grows, so periodic build_index rebuilds stay
    the compaction analogue; this is the cheap write path between them.
    Returns a fresh reader over the updated lists."""
    spark = new_df.sparkSession
    centroids = np.array(
        [r["centroid"] for r in centroids_df.orderBy("cluster_id").collect()], dtype=np.float32
    )
    assigned = assign_clusters(
        new_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vector")), centroids
    )
    assigned.repartition("cluster_id").write.mode("append").partitionBy("cluster_id").parquet(
        lists_dir
    )
    return spark.read.parquet(lists_dir)


def rank_probes(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-nprobe nearest centroids per query (ivf.go:186-195) —
    vectorized against broadcast centroids; output one row per
    (query, probed cluster)."""
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(centroids, dtype=np.float32))
    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id_col].dataType, True),
            T.StructField("query_vec", T.ArrayType(T.FloatType()), True),
            T.StructField("cluster_id", T.IntegerType(), False),
        ]
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("query_vec")
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value.astype(np.float64)
        c2 = (c**2).sum(axis=1)[None, :]
        p = min(nprobe, c.shape[0])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["query_vec"].tolist(), dtype=np.float32).astype(np.float64)
            d = (x**2).sum(axis=1)[:, None] + c2 - 2.0 * (x @ c.T)
            # deterministic top-p: argsort on (distance, cluster_id)
            probes = np.argsort(d, axis=1, kind="stable")[:, :p]
            out = pdf.loc[pdf.index.repeat(p)].reset_index(drop=True)
            out["cluster_id"] = probes.reshape(-1).astype(np.int32)
            yield out

    return q.mapInPandas(_map, schema=schema)


def knn_ivf(
    queries: DataFrame,
    centroids_df: DataFrame,
    index_df: DataFrame,
    k: int,
    nprobe: int = DEFAULT_NPROBE,
    space: str = "l2",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    kernel: str = "expr",
    id_filter: DataFrame | None = None,
    broadcast_probes: bool = True,
) -> DataFrame:
    """IVF search (ivf.go:175-228): probe-pruned equi-join + exact
    distance on the candidates + per-query top-k.

    Note: probe ranking always uses L2 to centroids (as the reference
    does); the candidate re-ranking uses `space`.

    kernel: 'expr' = oracle-bit-exact fold expression (default, fine
    while nprobe/nlist keeps candidates small); 'pandas' = Arrow-batched
    numpy kernel for large candidate volumes (see distance_udf);
    'gemm' = cogrouped per-cluster GEMM (l2/ip/cos) — probes and index
    cogroup on cluster_id and each cluster scores as ONE matrix
    multiply with a local top-k trim, so each base vector crosses
    Arrow once per CLUSTER instead of once per candidate row
    (~|cluster| fewer vector transfers than 'pandas'; the right shape
    for table-sized query sets like whole-base self-kNN). GEMM carries
    the usual last-ulp summation noise vs the fold expression — keep
    oracle-gated runs on 'expr'.

    id_filter: optional one-column (id) frame — filtered ANN: candidates
    are semi-joined against it AFTER probe pruning, so the filter costs
    |probed candidates|, never a reshuffle of the whole index (AQE turns
    the semi-join into a broadcast when the filter is selective — the
    common case). With nprobe=nlist this is exact filtered kNN; at
    partial probes it inherits IVF recall, and selective filters warrant
    a higher nprobe (the standard filtered-ANN tradeoff).

    broadcast_probes: True (default) broadcasts the probe edge list —
    right for interactive query batches (|queries|·nprobe rows, KBs–MBs).
    Set False when the query set is table-sized (e.g. whole-base
    self-kNN in mutual_knn_pairs_ivf): the candidate join then shuffles
    on cluster_id, co-located with the index's cluster_id partitioning,
    instead of broadcasting a base-sized frame.
    """
    from oasisdb_spark.functions.distance import distance_expr, distance_udf

    if kernel not in ("expr", "pandas", "gemm"):
        raise ValueError(
            f"knn_ivf: kernel must be expr|pandas|gemm, got {kernel!r}"
        )
    centroids = np.array(
        [r["centroid"] for r in centroids_df.orderBy("cluster_id").collect()], dtype=np.float32
    )
    probes = rank_probes(queries, centroids, nprobe, query_id_col, query_vec_col)
    if kernel == "gemm":
        return _knn_ivf_gemm(probes, index_df, k, space, id_filter)
    if broadcast_probes:
        probes = F.broadcast(probes)
    cand = apply_id_filter(probes.join(index_df, on="cluster_id"), id_filter)
    dist = (
        distance_expr(space, "query_vec", "vector")
        if kernel == "expr"
        else distance_udf(space)("query_vec", "vector")
    )
    scored = cand.select("query_id", "id", dist.alias("distance"))
    return topk_per_query(scored, k)


def _knn_ivf_gemm(
    probes: DataFrame,
    index_df: DataFrame,
    k: int,
    space: str,
    id_filter: DataFrame | None,
) -> DataFrame:
    """The cogrouped per-cluster GEMM scorer behind knn_ivf's
    kernel='gemm': probes (query_id, query_vec, cluster_id) cogroup
    with the inverted lists on cluster_id; each cluster batch scores as
    one float64 matrix multiply and emits only its local top-k per
    query (candidates never materialize as rows), then the global
    topk_per_query window merges the per-cluster shortlists —
    <= nprobe·k rows per query reach the final shuffle. Arrow traffic
    is |probes| + |index| vectors total, vs 2 vectors PER CANDIDATE
    ROW in the join+UDF shape. Tie handling matches topk_per_query:
    the local trim selects by (distance, id), so boundary ties survive
    to the global merge in the same total order."""
    if space not in ("l2", "ip", "cos"):
        raise ValueError(
            f"knn_ivf kernel='gemm' supports l2/ip/cos, got {space!r}; "
            "use kernel='pandas' for hamming"
        )
    idx = index_df
    if id_filter is not None:
        idx = idx.join(id_filter.select("id"), on="id", how="left_semi")
    qid_type = probes.schema["query_id"].dataType
    id_type = idx.schema["id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type, True),
            T.StructField("id", id_type, True),
            T.StructField("distance", T.DoubleType(), True),
        ]
    )

    def _score(key, probe_pdf: pd.DataFrame, index_pdf: pd.DataFrame):
        if len(probe_pdf) == 0 or len(index_pdf) == 0:
            return pd.DataFrame({"query_id": [], "id": [], "distance": []})
        Q = np.array(probe_pdf["query_vec"].tolist(), dtype=np.float64)
        X = np.array(index_pdf["vector"].tolist(), dtype=np.float64)
        G = X @ Q.T  # (nb, nq)
        if space == "l2":
            x_sq = (X**2).sum(axis=1)
            q_sq = (Q**2).sum(axis=1)
            # clamp: cancellation can push x²+q²-2xq slightly negative
            D = np.maximum(x_sq[:, None] + q_sq[None, :] - 2.0 * G, 0.0)
        elif space == "ip":
            D = -G
        else:  # cos
            x_norm = np.sqrt((X**2).sum(axis=1))
            q_norm = np.sqrt((Q**2).sum(axis=1))
            denom = x_norm[:, None] * q_norm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                D = np.where(denom > 0, 1.0 - G / denom, 1.0)
        ids = index_pdf["id"].to_numpy()
        # local top-k by (distance, id): pre-sort rows by id (stable),
        # then argsort on distance keeps the id order among ties
        order = np.argsort(ids, kind="stable")
        ids, D = ids[order], D[order]
        nb = len(ids)
        kk = min(k, nb)
        sel = np.argsort(D, axis=0, kind="stable")[:kk]  # (kk, nq)
        nq = len(probe_pdf)
        qids = probe_pdf["query_id"].to_numpy()
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk),
                "id": ids[sel.T.reshape(-1)],
                "distance": D[sel.T.reshape(-1), np.repeat(np.arange(nq), kk)],
            }
        )

    shortlists = (
        probes.groupBy("cluster_id")
        .cogroup(idx.groupBy("cluster_id"))
        .applyInPandas(_score, schema=out_schema)
    )
    return topk_per_query(shortlists, k)


def ivf_search_stats(
    queries: DataFrame,
    centroids_df: DataFrame,
    index_df: DataFrame,
    nprobe: int = DEFAULT_NPROBE,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Per-query search-cost counters — the Spark analogue of the
    reference's HNSW runtime statistics (avg hops / distance
    computations / query count, hnswalg.h:67-68,215-221, surfaced via
    hnsw_go_api.go:247-257). In a probe-pruned plan the 'distance
    computations' a query pays is exactly its probed-candidate volume;
    'hops' has no analogue in a flat probe join.

    Returns (query_id, n_probes, n_candidates). Cost: one probe ranking
    pass + a broadcast join against the per-cluster size table (nlist
    rows) — the index itself is scanned only for its per-cluster counts
    (metadata-level parquet count), never for vectors."""
    sizes = index_df.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    centroids = np.array(
        [r["centroid"] for r in centroids_df.orderBy("cluster_id").collect()], dtype=np.float32
    )
    probes = rank_probes(queries, centroids, nprobe, query_id_col, query_vec_col)
    return (
        probes.join(F.broadcast(sizes), on="cluster_id", how="left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.coalesce(F.sum("cluster_size"), F.lit(0)).cast("bigint").alias("n_candidates"),
        )
    )


def apply_id_filter(cand: DataFrame, id_filter: DataFrame | None) -> DataFrame:
    """Filtered ANN, shared by knn_ivf / knn_ivfsq / knn_ivfpq: semi-join
    candidates against the filter id set AFTER probe pruning, so the
    filter costs |probed candidates|, never a reshuffle of the whole
    index (AQE broadcasts the filter side when it is selective — the
    common case)."""
    if id_filter is None:
        return cand
    return cand.join(id_filter.select("id"), on="id", how="left_semi")


def run_query_chunks(spark, q_rows, schema, max_rows: int, search_chunk):
    """Scale guard shared by the collect-and-broadcast searchers: if the
    collected query batch exceeds max_rows, re-run `search_chunk` per
    max_rows-sized chunk DataFrame and union the results; returns None
    when the batch fits (caller proceeds unchunked)."""
    if len(q_rows) <= max_rows:
        return None
    out = None
    for lo in range(0, len(q_rows), max_rows):
        part = search_chunk(spark.createDataFrame(q_rows[lo : lo + max_rows], schema))
        out = part if out is None else out.unionByName(part)
    return out
