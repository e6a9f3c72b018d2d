"""Skew mitigation for joins and heavy-state aggregations.

At 100 TB a handful of hot keys (one power user, one default value)
can pin an entire stage on one task. Two standard remedies, both
result-identical to the unsalted plan:

- ``salted_join``: left rows get a random salt in [0, n_salts); the
  (smaller, but not broadcastable) right side is replicated n_salts
  times with every salt value; the join key becomes (key, salt), so a
  hot key's rows spread over n_salts tasks. Use when AQE skew-join
  splitting is unavailable or insufficient (e.g. the skew is in a
  single shuffle block that AQE cannot subdivide further, or the
  engine must not rely on runtime re-planning). Cost: right side
  shuffled n_salts x — keep n_salts modest (8-64) and the right side
  the smaller input.

- ``salted_distinct_count``: exact count(DISTINCT col) per key without
  a single-task hot-key dedup: pre-aggregate on (key, col) — Spark's
  partial hash aggregate dedups map-side — then count per key. Two
  light shuffles instead of one skew-bound one.

Salting is deterministic here (hash of a row id, not rand()) so plans
stay replayable and results hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_distinct_count"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right side
    replicated across ``n_salts`` buckets. ``salt_source`` names a left
    column whose hash picks the salt (defaults to the whole-row hash of
    the join key side being monotonically spread via
    ``spark_partition_id``-free xxhash64 of all left columns).
    """
    if how not in ("inner", "left"):
        # right/full outer would emit n_salts copies of every UNMATCHED
        # right row (each replica fails the join independently) — a
        # silent row-multiplication bug, so refuse loudly
        raise ValueError(
            f"salted_join: how must be inner|left, got {how!r} — the "
            "replicated right side cannot express right/full outer"
        )
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    l_s = left.withColumn("__salt", salt_col.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_s.join(r_s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame, key: str, col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count as two partial-aggregated shuffles
    (groupBy(key, col) then groupBy(key)) — equivalent to
    ``count(DISTINCT col)`` but never funnels a hot key's full value
    set through one task. NULLs are excluded, matching COUNT(DISTINCT)
    semantics exactly (the (key, NULL) group would otherwise count as
    one extra "value"); keys whose values are ALL NULL therefore emit
    no row, as COUNT(DISTINCT)-over-groupBy does for empty groups."""
    return (
        df.select(key, col)
        .where(F.col(col).isNotNull())
        .groupBy(key, col)
        .agg(F.lit(1))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
