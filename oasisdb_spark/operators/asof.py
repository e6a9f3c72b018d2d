"""Distributed as-of join (backward, inclusive).

Spark has no ASOF JOIN (DuckDB/Pandas/kdb do); this implements the
standard distributed formulation as a composition of built-in operators
per the engine's "custom operator = DataFrame composition first" rule:

    union(left, right) sorted by (key, ts, side)
      -> last(right_payload IGNORE NULLS) over rows-unbounded-preceding
      -> keep left rows

which is ONE shuffle (the window's hash-partition by key), no range
explosion, no per-row Python. Semantics match DuckDB
``l ASOF JOIN r ON l.key = r.key AND l.ts >= r.ts``: each left row gets
the right row with the greatest ``r.ts <= l.ts`` for its key (right rows
sort before left rows at equal ts, making the match inclusive).

At 100 TB scale this is the shape you want: the window shuffle
hash-partitions by key (skew-safe for user-keyed event data where no
key dominates), both inputs are filtered/pruned before the union, and
the sort within each partition is the only O(n log n) cost — the same
plan a native sort-merge as-of would produce. Ties on (key, ts) within
the right side must be pre-deduplicated by the caller if determinism
is required (DuckDB picks an arbitrary row; we'd pick the last by
union order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward inclusive as-of join.

    Every non-key, non-ts column of ``right`` is attached to each left
    row as ``{right_prefix}{col}``, taken from the right row with the
    greatest ``right.ts_col <= left.ts_col`` within the same key group;
    ``{right_prefix}{ts_col}`` carries the matched right timestamp.
    ``how='inner'`` drops left rows with no prior right row,
    ``how='left'`` keeps them with nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != ts_col]
    out_cols = [f"{right_prefix}{c}" for c in payload + [ts_col]]

    l_tag = left.select(
        *keys, ts_col, F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}") for c in payload],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{right_prefix}{ts_col}"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in keys and c != ts_col],
    )
    r_tag = right.select(
        *keys, ts_col, F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
        F.col(ts_col).alias(f"{right_prefix}{ts_col}"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns if c not in keys and c != ts_col],
    )
    # right rows (__side=0) sort before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tag.unionByName(r_tag)
    for c in out_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    res = u.filter(F.col("__side") == 1).drop("__side")
    for c in left.columns:
        if c not in keys and c != ts_col:
            res = res.withColumnRenamed(f"__l_{c}", c)
    if how == "inner":
        res = res.filter(F.col(f"{right_prefix}{ts_col}").isNotNull())
    return res.select(*left.columns, *out_cols)
