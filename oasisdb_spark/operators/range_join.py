"""Point-in-interval (range) join.

Spark's built-in join on ``lo <= x AND x < hi`` with no equi-key falls
back to BroadcastNestedLoopJoin (fine when one side is tiny) or a
cartesian product (catastrophic at scale). This operator makes the
strategy explicit:

- ``strategy='broadcast'``: broadcast the interval side and let the
  nested-loop join scan each row against the (small) interval list.
  Right for dimension-style band tables (10s-1000s of intervals).
- ``strategy='bucket'``: overlay a fixed-width grid; every interval is
  exploded to the buckets it overlaps and every point maps to exactly
  one bucket, so the join becomes a plain hash equi-join on bucket id
  with a residual range filter. Shuffle cost is O(points + intervals x
  avg_buckets_per_interval) — this is the 100 TB path when BOTH sides
  are large (e.g. event-to-session attribution). Pick ``bucket_width``
  near the median interval width so intervals explode to O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join", "interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    strategy: str = "bucket",
    bucket_width: float | None = None,
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join (half-open: overlap iff
    ``left_lo < right_hi AND right_lo < left_hi``) — the
    session-vs-window / downtime-vs-deploy analytics shape. Column
    names must be disjoint across the two sides (alias beforehand).

    Degenerate intervals (``lo >= hi`` — empty under half-open
    semantics) match nothing under BOTH strategies: the broadcast
    theta-join carries an explicit non-emptiness conjunct and the
    bucket path filters them before the grid explode (which also
    prevents a reversed interval from generating a huge DESCENDING
    ``F.sequence`` — one bad row must not explode into |lo-hi|/w rows).

    - ``strategy='broadcast'``: theta-join against the broadcast right
      side — fine when one side is dimension-sized.
    - ``strategy='bucket'``: both sides explode to the grid buckets
      they overlap and the join becomes a hash equi-join on bucket id.
      A pair sharing k buckets would duplicate k times; instead of a
      distinct shuffle, each pair is emitted ONLY in the bucket that
      contains the overlap start max(left_lo, right_lo) — that bucket
      is unique and both sides overlap it, so every true pair appears
      exactly once with zero dedup cost. The 100 TB path when both
      sides are large; pick ``bucket_width`` near the median interval
      width so explosion stays O(1) per interval.

    Grid-edge exactness: each side's bucket range is the plain
    ``[floor(lo/w), floor(hi/w)]`` — NO float epsilon on the upper
    bound. An interval ending exactly on a grid line emits at most one
    spurious trailing bucket, which the overlap + canonical filters
    discard for free; in exchange coverage is exact for ALL numeric
    bound types (the previous ``floor((hi - 1e-9)/w)`` silently dropped
    true pairs whose float bounds sat within 1e-9 above a grid line).
    The canonical bucket floor(max(lo_l, lo_r)/w) is always inside both
    ranges: max_lo >= lo on each side, and overlap gives max_lo < hi so
    floor(max_lo/w) <= floor(hi/w).
    """
    overlap = (F.col(left_lo) < F.col(right_hi)) & (F.col(right_lo) < F.col(left_hi))
    nonempty_l = F.col(left_lo) < F.col(left_hi)
    nonempty_r = F.col(right_lo) < F.col(right_hi)
    if strategy == "broadcast":
        return left.join(F.broadcast(right), overlap & nonempty_l & nonempty_r, "inner")
    if strategy != "bucket":
        raise ValueError(f"strategy must be broadcast|bucket, got {strategy!r}")
    if not bucket_width or bucket_width <= 0:
        raise ValueError("bucket strategy requires a positive bucket_width")
    w = float(bucket_width)

    def gridded(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.col(lo) < F.col(hi)).withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / w),
                    F.floor(F.col(hi) / w),
                )
            ),
        )

    lb, rb = gridded(left, left_lo, left_hi), gridded(right, right_lo, right_hi)
    canonical = F.col("__bkt") == F.floor(
        F.greatest(F.col(left_lo), F.col(right_lo)) / w
    )
    return (
        lb.join(rb.withColumnRenamed("__bkt", "__bkt_r"),
                F.col("__bkt") == F.col("__bkt_r"), "inner")
        .filter(overlap & canonical)
        .drop("__bkt", "__bkt_r")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    strategy: str = "broadcast",
    bucket_width: float | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo_col <= point < hi_col`` (half-open).

    Bucket-strategy grid edge: intervals explode to the plain
    ``[floor(lo/w), floor(hi/w)]`` bucket range with no float epsilon —
    an interval ending exactly on a grid line emits one spurious
    trailing bucket that the residual range filter discards, and
    coverage is exact for all numeric bound types. Degenerate intervals
    (``lo >= hi``, unsatisfiable under the half-open condition) are
    filtered before the explode so a reversed interval cannot generate
    a descending ``F.sequence`` blowup; the broadcast path yields
    nothing for them anyway, so the strategies stay equivalent.
    """
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if strategy == "broadcast":
        return points.join(F.broadcast(intervals), cond, how)
    if strategy != "bucket":
        raise ValueError(f"strategy must be broadcast|bucket, got {strategy!r}")
    if not bucket_width or bucket_width <= 0:
        raise ValueError("bucket strategy requires a positive bucket_width")
    w = float(bucket_width)
    pb = points.withColumn("__bkt", F.floor(F.col(point_col) / w))
    ib = intervals.filter(F.col(lo_col) < F.col(hi_col)).withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w),
                F.floor(F.col(hi_col) / w),
            )
        ),
    )
    joined = pb.join(ib, "__bkt", "inner").filter(cond).drop("__bkt")
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        missing = points.join(
            joined.select(*points.columns).distinct(), points.columns, "left_anti"
        )
        for c in intervals.columns:
            missing = missing.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
        return matched.unionByName(missing)
    raise ValueError(f"how must be inner|left, got {how!r}")
