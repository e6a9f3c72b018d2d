"""Retrieval evaluation metrics, computed in-engine.

The reference treats recall as its correctness oracle, but computes it
driver-side in the benchmark harness (`benchmarks/run_benchmarks.py:
126-142`: brute-force ground truth, set-intersection recall@k). At
corpus scale the ground truth and the candidate sets are themselves
distributed tables, so the evaluation must be a join, not a Python
loop — these operators are that join.

- ``recall_at_k``: per-query recall of a ranked result table against a
  ranked ground-truth table (the ANN-evaluation shape).
- ``pair_retrieval_metrics``: recall/precision of an unordered
  candidate-PAIR set against an exact pair set (the dedup-evaluation
  shape: how much of the true near-dup graph did the LSH banding keep).

Both reduce to one broadcast/shuffle join over keys plus a tiny
aggregate — no driver-side materialization of either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recall_at_k", "pair_retrieval_metrics"]


def recall_at_k(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall@k: |top-k(results) ∩ top-k(truth)| / k.

    Both inputs are (query_col, id_col, rank_col) tables; rows with
    rank > k are ignored on both sides, so callers can pass full result
    tables. Returns (query_col, n_hits, recall) with one row per query
    present in ``truth`` — queries the results table missed entirely
    score 0, not absent (left join from truth keys).
    """
    t = truth.filter(F.col(rank_col) <= k).select(query_col, id_col)
    r = results.filter(F.col(rank_col) <= k).select(
        query_col, id_col, F.lit(1).alias("_hit")
    )
    return (
        t.join(r, on=[query_col, id_col], how="left")
        .groupBy(query_col)
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_hits"))
        .select(
            query_col,
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("recall"),
        )
    )


def pair_retrieval_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Recall/precision of a candidate pair set vs an exact pair set.

    Pairs are normalized to (min, max) order before comparison so the
    two sides need not agree on orientation. Returns one row:
    (n_truth, n_candidates, n_hits, recall, precision) — precision is
    null when there are no candidates, recall null when no truth pairs.
    """

    def norm(df: DataFrame) -> DataFrame:
        a, b = F.col(left_col), F.col(right_col)
        return df.select(
            F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b")
        ).distinct()

    t = norm(truth).withColumn("_t", F.lit(1))
    c = norm(candidates).withColumn("_c", F.lit(1))
    joined = t.join(c, on=["_a", "_b"], how="full")
    return joined.agg(
        F.sum("_t").cast("bigint").alias("n_truth"),
        F.sum("_c").cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("_t").isNotNull() & F.col("_c").isNotNull(), 1))
        .cast("bigint")
        .alias("n_hits"),
    ).select(
        F.coalesce("n_truth", F.lit(0)).alias("n_truth"),
        F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
    ).select(
        "n_truth",
        "n_candidates",
        "n_hits",
        F.round(F.try_divide("n_hits", "n_truth"), 6).alias("recall"),
        F.round(F.try_divide("n_hits", "n_candidates"), 6).alias("precision"),
    )
