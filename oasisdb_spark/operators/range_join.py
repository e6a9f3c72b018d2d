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

__all__ = ["range_join"]


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
    ib = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w),
                # hi is exclusive: an interval ending exactly on a grid
                # line does not reach into the next bucket
                F.floor((F.col(hi_col) - F.lit(1e-9)) / w),
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
