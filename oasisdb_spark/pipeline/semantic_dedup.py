"""SemDeDup-style semantic deduplication: cluster the embedding space
with the IVF coarse quantizer, then deduplicate WITHIN each cluster by
exact pairwise cosine (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" — public
arXiv:2303.09540).

Physical plan: one k-means fit on a deterministic sample (reused from
``index/ivf.py`` — the same coarse quantizer that backs the IVF index
tiers), one Arrow-batched assignment pass, then ONE shuffle on
``cluster_id``; each cluster group runs a row-chunked float64 GEMM and
emits its verdicts. No pair-level rows ever cross a shuffle — the
quadratic work lives inside balanced per-cluster tasks, exactly the
shape the paper runs on GPU shards.

Keep rule (deterministic, SQL-expressible, non-recursive): a row is
dropped iff SOME row with a smaller id in the same cluster has cosine
similarity >= threshold — independent of whether that smaller row was
itself dropped, so the oracle is one theta-join aggregate rather than
a recursion. The graph-aware alternative (keep one per connected
component) already exists as ``dedup_clusters``.

``n_clusters=1`` is EXACT mode (whole table is one comparison scope —
what the correctness gate runs); real deployments size clusters so a
c x c float64 block fits a task (~4k rows / 128 MB), trading recall
across cluster boundaries for (N/k)^2-per-task instead of N^2 total.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.functions.distance import vector_indexable

__all__ = ["semantic_dedup", "embedding_centroid_drift"]

_OUT_SCHEMA = "vec_id BIGINT, cluster_id INT, n_dups INT, kept BOOLEAN"


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    row_chunk: int = 1024,
) -> DataFrame:
    """Per-row dedup verdicts: (vec_id, cluster_id, n_dups, kept).

    ``n_dups`` counts smaller-id rows in the same cluster with
    round(cosine, 6) >= threshold; ``kept`` is n_dups == 0. Zero-norm
    vectors have similarity 0 to everything (matching the SQL oracle's
    CASE). Rounding to 6dp before the threshold makes the float64 GEMM
    bit-stable against the oracle's fold-ordered sums.

    ``row_chunk`` bounds per-task memory: a cluster of c rows computes
    its c x c similarities in (row_chunk x c) strips, so peak extra
    memory is row_chunk*c*8 bytes regardless of cluster size.

    Rows with a NULL id or NULL embedding are EXCLUDED (no verdict row):
    similarity is undefined without a vector, the smaller-id keep rule
    is undefined without an id, and np.array would otherwise die
    opaquely on the None row (the cluster_curate convention).
    """
    src = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec")
    ).where(F.col(id_col).isNotNull() & vector_indexable(vec_col))
    if n_clusters <= 1:
        assigned = src.withColumn("cluster_id", F.lit(0))
    else:
        from oasisdb_spark.index.ivf import assign_clusters, train_centroids

        cents = train_centroids(src, n_clusters, "_vec")
        assigned = assign_clusters(src, cents, vec_col="_vec")

    thr = float(threshold)

    def _dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        x = np.array(pdf["_vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(x, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        n = len(ids)
        n_dups = np.zeros(n, dtype=np.int64)
        for lo in range(0, n, row_chunk):
            hi = min(lo + row_chunk, n)
            sims = (x[lo:hi] @ x.T) / (safe[lo:hi, None] * safe[None, :])
            sims[norms[lo:hi] == 0.0, :] = 0.0
            sims[:, norms == 0.0] = 0.0
            sims = np.round(sims, 6)
            # strictly-lower triangle: columns j < global row index
            cols = np.arange(n)[None, :]
            rows = np.arange(lo, hi)[:, None]
            n_dups[lo:hi] = ((sims >= thr) & (cols < rows)).sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster_id": pdf["cluster_id"].to_numpy(dtype=np.int32),
                "n_dups": n_dups.astype(np.int32),
                "kept": n_dups == 0,
            }
        )

    return (
        assigned.groupBy("cluster_id")
        .applyInPandas(lambda _, pdf: _dedup(pdf), schema=_OUT_SCHEMA)
        .select("vec_id", "cluster_id", "n_dups", "kept")
    )


def embedding_centroid_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """Embedding-space drift monitor: per-DIMENSION centroid shift
    between two vector snapshots (yesterday's corpus vs today's, base
    model vs re-embedded) — the embedding sibling of the scalar PSI
    gate, exact end-to-end:

    components quantize to integers (``round(x·quant)`` of the
    identical IEEE float on both engines), per-dimension sums and
    counts fold in ONE partial agg per side, and the centroid
    difference emits as the exact rational

        diff_dim = (s_a·n_b − s_b·n_a) / (n_a·n_b)

    — callers fold Σ diff² by cross-multiplication (or one float at
    display time) and alarm on the shift. No float mean anywhere, so
    the per-dimension evidence hash-matches cross-engine.

    Shape: ``posexplode`` fans each vector into (dim, component) rows
    — a ×dim scan cost, the price of exact per-dim aggregation — then
    dim-keyed partial aggs collapse each side to a dim-cardinality
    frame before the join; the raw vectors never co-shuffle. int64
    budget: |s| ≤ n·quant·|x| — at unit-scale embeddings and quant
    10⁶, fine to ~10¹¹ vectors per side; diff_num multiplies two such
    — use a smaller quant or DECIMAL widening beyond ~10⁵ vectors at
    full precision (documented, like every integer budget here).
    """

    def side(d: DataFrame, s_name: str, n_name: str) -> DataFrame:
        # indexable vectors only: one NaN component is an ANSI overflow
        # in the micro-unit quantization
        d = d.where(vector_indexable(vec_col))
        comp = d.select(
            F.posexplode(F.col(vec_col)).alias("dim", "_x")
        ).select(
            "dim",
            F.round(F.col("_x").cast("double") * quant).cast("long").alias("_q"),
        )
        return comp.groupBy("dim").agg(
            F.sum("_q").alias(s_name), F.count(F.lit(1)).alias(n_name)
        )
    a = side(df_a, "s_a", "n_a")
    b = side(df_b, "s_b", "n_b")
    j = a.join(b, on="dim", how="full_outer")
    return j.select(
        "dim",
        "s_a",
        "n_a",
        "s_b",
        "n_b",
        (F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")).alias(
            "diff_num"
        ),
        (F.col("n_a") * F.col("n_b")).alias("diff_den"),
    )
