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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recall_at_k", "pair_retrieval_metrics", "rank_eval_at_k", "cohen_kappa", "DISCOUNT_MICRO"]

# nDCG discount table, micro-quantized at BUILD time: disc[i] for rank
# i+1 is round(1e6 / log2(rank+1)). Shipping the same INTEGER constants
# to Spark (array literal) and the DuckDB oracle (list literal) makes
# DCG sums engine-exact — the lm.py micro-nat trick applied to ranking
# (log2 itself differs between JVM and C libm at the ulp level).
DISCOUNT_MICRO: tuple[int, ...] = tuple(
    round(1_000_000 / math.log2(i + 1)) for i in range(1, 1025)
)


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
    # distinct on BOTH sides: a duplicated (query, id) row -- the same
    # id listed at two ranks <= k, or a duplicated truth row -- used to
    # multiply through the join and push n_hits past k (recall > 1)
    t = truth.filter(F.col(rank_col) <= k).select(query_col, id_col).distinct()
    r = (
        results.filter(F.col(rank_col) <= k)
        .select(query_col, id_col)
        .distinct()
        .withColumn("_hit", F.lit(1))
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
        # drop one-sided-NULL pairs BEFORE normalizing: Spark's
        # least/greatest skip NULLs, so (NULL, b) used to collapse to a
        # fabricated self-pair (b, b) that could even spuriously HIT
        return (
            df.where(a.isNotNull() & b.isNotNull())
            .select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
            .distinct()
        )

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


def rank_eval_at_k(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Binary-relevance ranking metrics per query, one join + one agg:
    recall@k, MRR@k and nDCG@k of a ranked result table against a
    ranked ground-truth table (both (query, id, rank); rows with rank
    > k ignored on either side).

    Returns (query_col, n_hits, recall, first_rank, rr, dcg_micro,
    ndcg) with one row per query present in ``truth``; queries the
    results missed score zeros. dcg_micro is the integer micro-DCG
    (engine-exact, see DISCOUNT_MICRO); ndcg/rr are IEEE divisions of
    exact integers, so they too reproduce bit-for-bit cross-engine.
    IDCG uses min(k, |truth rows for the query|) ideal hits. Shape:
    both sides prune to <= k rows per query BEFORE the equi-join, so
    the eval costs O(queries x k) regardless of corpus size."""
    if k > len(DISCOUNT_MICRO):
        raise ValueError(f"k must be <= {len(DISCOUNT_MICRO)}")
    disc = F.array(*[F.lit(int(d)) for d in DISCOUNT_MICRO[:k]])
    prefix = [0]
    for d in DISCOUNT_MICRO[:k]:
        prefix.append(prefix[-1] + int(d))
    idcg_arr = F.array(*[F.lit(p) for p in prefix])  # idcg_arr[n+1] = ideal dcg of n hits

    # dedup both sides: duplicate truth rows inflated _nt (wrong IDCG),
    # and the same result id at two ranks <= k double-counted n_hits
    # and dcg (recall/ndcg > 1 were reachable). A duplicated result id
    # keeps its BEST rank -- the standard convention.
    # t is referenced twice (the IDCG denominator agg and the hit
    # join); left lazy, the WHOLE truth plan — typically an expensive
    # ranking query — is replayed per reference. The pruned frame is
    # <= queries x k rows at any scale, so a lazy localCheckpoint
    # truncates the replay for free. Rows unchanged; blocks tracked
    # for release at the harness's next between-queries point
    # (ckpt.track — OPTIMIZATION r13, guide §5).
    from oasisdb_spark.ckpt import track

    t = track(
        truth.filter(F.col(rank_col) <= k)
        .select(query_col, id_col)
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_t = t.groupBy(query_col).agg(F.count(F.lit(1)).alias("_nt"))
    r = (
        results.filter(F.col(rank_col) <= k)
        .groupBy(query_col, id_col)
        .agg(F.min(rank_col).alias("_rnk"))
    )
    hits = (
        t.join(r, on=[query_col, id_col], how="inner")
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("_nh"),
            F.min("_rnk").alias("_fr"),
            F.sum(F.element_at(disc, F.col("_rnk").cast("int"))).cast("bigint").alias("_dcg"),
        )
    )
    return (
        n_t.join(hits, on=query_col, how="left")
        .select(
            query_col,
            F.coalesce("_nh", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce("_nh", F.lit(0)) / F.least(F.col("_nt"), F.lit(k)), 6
            ).alias("recall"),
            F.coalesce("_fr", F.lit(0)).cast("bigint").alias("first_rank"),
            F.when(F.col("_fr").isNotNull(), F.lit(1.0) / F.col("_fr"))
            .otherwise(F.lit(0.0))
            .alias("rr"),
            F.coalesce("_dcg", F.lit(0)).cast("bigint").alias("dcg_micro"),
            F.round(
                F.coalesce("_dcg", F.lit(0))
                / F.element_at(idcg_arr, (F.least(F.col("_nt"), F.lit(k)) + 1).cast("int")),
                6,
            ).alias("ndcg"),
        )
    )


def cohen_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa inter-rater agreement (Cohen, 1960) between two
    categorical columns — the standard chance-corrected metric for
    label-pipeline QA (human-vs-model, declared-vs-detected metadata) —
    as an EXACT RATIONAL:

        kappa = (p_o − p_e) / (1 − p_e)
              = (agree·n − Σ_k ra_k·rb_k) / (n² − Σ_k ra_k·rb_k)

    where ``agree`` counts identical pairs and ra/rb are the per-
    category marginals: multiplying through by n² leaves pure integer
    arithmetic, so the emitted (kappa_num, kappa_den) hash-match
    cross-engine and the caller keeps exactness through sign and
    threshold tests (divide once at display time). NULL labels count
    as their own category via null-safe equality — two NULLs agree.

    Shape: one pair-keyed partial agg builds the confusion cells
    (|A|·|B| rows); marginals and the diagonal fold over the CELL
    frame; the single output row assembles from three tiny aggregates.
    int64 budget: n ≤ ~3·10⁹ (n² must fit; kappa is an eval-set
    metric — beyond that, pre-sample or widen to DECIMAL(38) as the
    chi² operator does).

    Returns ONE row: (n, agree, s_marginal, kappa_num, kappa_den).
    """
    cells = df.groupBy(
        F.col(rater_a_col).alias("_a"), F.col(rater_b_col).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_c"))
    tot = cells.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_a").eqNullSafe(F.col("_b")), F.col("_c")
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("agree"),
    )
    ra = cells.groupBy("_a").agg(F.sum("_c").alias("_ra"))
    rb = cells.groupBy("_b").agg(F.sum("_c").alias("_rb"))
    s = (
        ra.join(rb, ra["_a"].eqNullSafe(rb["_b"]))
        .agg(F.coalesce(F.sum(F.col("_ra") * F.col("_rb")), F.lit(0)).cast("long").alias("s_marginal"))
    )
    row = tot.crossJoin(F.broadcast(s))
    return row.select(
        "n",
        "agree",
        "s_marginal",
        (F.col("agree") * F.col("n") - F.col("s_marginal")).alias("kappa_num"),
        (F.col("n") * F.col("n") - F.col("s_marginal")).alias("kappa_den"),
    )
