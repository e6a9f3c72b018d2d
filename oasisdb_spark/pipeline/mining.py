"""Hard-negative mining for retrieval/embedding training.

Contrastive training of retrieval embedders (DPR, E5/GTE-class models)
needs, for every query, the nearest candidates that are NOT relevant —
"hard negatives". This operator is exact top-k with exclusions applied
BEFORE ranking (over-fetch-then-filter is wrong: a query whose k
nearest are all positives would return fewer than k negatives).

Two exclusion mechanisms, composable:
- ``exclude_pairs``: an explicit (query_id, id) relevance set (known
  positives) dropped by a broadcast anti-join — relevance sets are
  O(queries x positives-per-query), dimension-sized next to the corpus.
- ``neq_pair``: a (query_col, base_col) pair whose EQUALITY excludes
  the candidate (e.g. same class label, same source document) — a
  scan-stage filter on the pair join, zero extra cost.

Scale shape mirrors index/flat.py knn_flat: queries broadcast, the base
streams through once, the only shuffle is the per-query top-k whose
input the window's partial rank already cut to k rows per partition.
For 100 TB bases swap the scorer for the IVF probe join and apply the
same exclusions to its candidate set (the filters are plain Columns /
anti-joins over (query_id, id) and compose with any candidate
generator).

Distances are in-order float64 fold Column expressions
(functions/distance.py), bit-reproducible vs the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.functions.distance import distance_expr
from oasisdb_spark.index.flat import topk_per_query

__all__ = ["hard_negatives", "hard_negatives_from_candidates"]


def hard_negatives_from_candidates(
    candidates: DataFrame,
    k: int,
    exclude_pairs: DataFrame | None = None,
    neq_pair: tuple[str, str] | None = None,
    query_id_col: str = "query_id",
    id_col: str = "id",
    dist_col: str = "distance",
) -> DataFrame:
    """Exclusion + top-k over an EXTERNALLY generated candidate set —
    the 100 TB composition: feed it `index/ivf.py knn_ivf` shortlists
    (over-fetch k' > k so exclusions don't starve the list; mining from
    an ANN shortlist is the standard approximate practice) or any other
    scored (query_id, id, distance, *meta) frame. ``neq_pair`` names
    two columns OF THE CANDIDATE FRAME whose equal values disqualify
    the row; ``exclude_pairs`` anti-joins known positives. Ranks are
    renumbered 1..k after exclusion."""
    pairs = candidates
    if neq_pair is not None:
        pairs = pairs.filter(~F.col(neq_pair[0]).eqNullSafe(F.col(neq_pair[1])))
    if exclude_pairs is not None:
        ex = exclude_pairs.select(
            F.col(query_id_col).alias(query_id_col), F.col(id_col).alias(id_col)
        )
        pairs = pairs.join(F.broadcast(ex), on=[query_id_col, id_col], how="left_anti")
    return topk_per_query(
        pairs, k, query_col=query_id_col, dist_col=dist_col, id_col=id_col
    ).select(
        query_id_col, id_col, "rank", F.col(dist_col).cast("double").alias(dist_col)
    )


def hard_negatives(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    space: str = "l2",
    exclude_pairs: DataFrame | None = None,
    neq_pair: tuple[str, str] | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Top-k nearest NON-relevant candidates per query.

    Returns (query_id, id, rank, distance) with rank 1..k over the
    candidates that survive the exclusions (deterministic: distance,
    then id). ``exclude_pairs`` must have columns (query_id_col,
    id_col); ``neq_pair`` names (query-side column, base-side column)
    whose equal values disqualify the pair.
    """
    q_cols = [F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("query_vec")]
    b_cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("vector")]
    if neq_pair is not None:
        q_cols.append(F.col(neq_pair[0]).alias("_q_meta"))
        b_cols.append(F.col(neq_pair[1]).alias("_b_meta"))
    pairs = base.select(*b_cols).crossJoin(F.broadcast(queries.select(*q_cols)))
    if neq_pair is not None:
        # NULL meta never disqualifies (NULL <=> NULL is true equality
        # under null-safe compare; we exclude only definite matches)
        pairs = pairs.filter(~F.col("_q_meta").eqNullSafe(F.col("_b_meta")))
    if exclude_pairs is not None:
        ex = exclude_pairs.select(
            F.col(query_id_col).alias("query_id"), F.col(id_col).alias("id")
        )
        pairs = pairs.join(F.broadcast(ex), on=["query_id", "id"], how="left_anti")
    scored = pairs.select(
        "query_id",
        "id",
        distance_expr(space, "query_vec", "vector").alias("distance"),
    )
    return topk_per_query(scored, k).select(
        "query_id", "id", "rank", F.col("distance").cast("double").alias("distance")
    )
