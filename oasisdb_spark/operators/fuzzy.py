"""Approximate (edit-distance) string joins, blocked so the quadratic
pair space never materializes.

Shapes:

- ``fuzzy_self_join``: pairs of rows whose strings are within
  ``max_dist`` Levenshtein edits, restricted to a caller-supplied
  blocking key (the key is part of the query semantics — "duplicate
  part names within a brand" — so the equi-join on it is exact, not a
  lossy candidate filter).
- ``fuzzy_join``: the two-table variant.

Both push a length-difference prune (|len(a) - len(b)| <= max_dist is
a necessary condition for edit distance <= max_dist) into the join
condition ahead of the O(len^2) Levenshtein evaluation, and use
Spark's bounded ``levenshtein(l, r, threshold)`` form, which
early-exits the DP once the running distance exceeds the threshold
(O(max_dist * len) instead of O(len^2)).

100 TB posture: the only shuffle is the equi-join on the blocking
key; within a block the pair count is quadratic, so block choice is
the scale knob (same contract as ``jaccard_pairs``' df cap). AQE
skew-join splits oversized blocks. No UDFs — ``levenshtein`` is a
JVM intrinsic inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_self_join", "fuzzy_join"]


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """Distinct unordered pairs (id_a < id_b) sharing all ``block_cols``
    with levenshtein(text_a, text_b) <= max_dist. Returns
    (id_a, id_b, dist) plus the blocking columns."""
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_len"), *block_cols,
    )
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_txt").alias("_txt_a"),
        F.col("_len").alias("_len_a"), *block_cols,
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_txt").alias("_txt_b"),
        F.col("_len").alias("_len_b"), *block_cols,
    )
    joined = a.join(b, on=block_cols, how="inner").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("_len_a") - F.col("_len_b")) <= max_dist)
    )
    dist = F.levenshtein(F.col("_txt_a"), F.col("_txt_b"), max_dist)
    return (
        joined.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)  # bounded form returns -1 past threshold
        .select("id_a", "id_b", *block_cols, "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    block_cols: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """Two-table fuzzy equi-block join: (left_id, right_id, dist) for
    rows sharing ``block_cols`` (present in both inputs) within
    ``max_dist`` edits."""
    a = left.select(
        F.col(left_id).alias("id_l"), F.col(left_text).alias("_txt_l"),
        F.length(left_text).alias("_len_l"), *block_cols,
    )
    b = right.select(
        F.col(right_id).alias("id_r"), F.col(right_text).alias("_txt_r"),
        F.length(right_text).alias("_len_r"), *block_cols,
    )
    dist = F.levenshtein(F.col("_txt_l"), F.col("_txt_r"), max_dist)
    return (
        a.join(b, on=block_cols, how="inner")
        .filter(F.abs(F.col("_len_l") - F.col("_len_r")) <= max_dist)
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_l", "id_r", *block_cols, "dist")
    )
