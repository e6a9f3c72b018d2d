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

__all__ = ["semantic_dedup"]

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
    """
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec"))
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
