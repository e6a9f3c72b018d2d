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
    ``how='left'`` keeps them with nulls. The match is ROW-consistent:
    all attached columns come from the single matched right row, even
    when some of its fields are NULL. Right rows with NULL ``ts_col``
    are unordered observations and never match; left rows with NULL
    ``ts_col`` match nothing (dropped under inner, NULL-filled under
    left).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != ts_col]
    out_cols = [f"{right_prefix}{c}" for c in payload + [ts_col]]

    # the matched right row travels as ONE struct, so last(ignorenulls)
    # carries the whole row or nothing: per-column LOCF would fill a
    # NULL field of the matched row from an OLDER right row, silently
    # mixing fields across rows. NULL-ts right rows are unordered
    # observations and never match (they'd sort first and leak payload).
    r_struct = F.struct(
        *[F.col(c) for c in payload], F.col(ts_col).alias("__ts")
    )
    l_tag = left.select(
        *keys, ts_col, F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in keys and c != ts_col],
    )
    # SQL join semantics on the equi-keys: a NULL key never matches
    # (the union/window plan would otherwise pair NULL-key left rows
    # with NULL-key right rows inside the NULL partition); NULL-key
    # LEFT rows then find no right row — dropped under inner,
    # NULL-filled under left, exactly like a real join
    r_keep = F.col(ts_col).isNotNull()
    for k in keys:
        r_keep = r_keep & F.col(k).isNotNull()
    r_tag = right.where(r_keep).select(
        *keys, ts_col, F.lit(0).alias("__side"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns if c not in keys and c != ts_col],
    )
    # right rows (__side=0) sort before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tag.unionByName(r_tag).withColumn(
        "__r", F.last("__r", ignorenulls=True).over(w)
    )
    res = u.filter(F.col("__side") == 1).drop("__side")
    for c in left.columns:
        if c not in keys and c != ts_col:
            res = res.withColumnRenamed(f"__l_{c}", c)
    if how == "inner":
        res = res.filter(F.col("__r").isNotNull())
    for c in payload:
        res = res.withColumn(f"{right_prefix}{c}", F.col("__r")[c])
    res = res.withColumn(f"{right_prefix}{ts_col}", F.col("__r")["__ts"])
    return res.select(*left.columns, *out_cols)
