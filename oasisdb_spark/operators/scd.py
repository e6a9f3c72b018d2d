"""SCD Type-2 history construction — collapse an ordered change log
into versioned validity intervals (Kimball slowly-changing-dimension
type 2), the standard warehouse shape for "what was this entity's
attribute at time T".

Semantics: per key, order the observations by `order_cols`; a new
version OPENS at every observation whose tracked attribute differs from
the previous observation's (consecutive equal values collapse into one
interval); each version's `effective_to` is the next version's
`effective_from`, NULL for the current (open) version. `version` is the
1-based interval sequence per key. Attribute comparison is
null-safe (NULL -> value is a change, value -> NULL is a change,
NULL -> NULL is not).

Scale: ONE shuffle on the key column. Both windows (the change filter's
lag and the interval close's lead) share the identical partitionBy, so
Catalyst reuses the exchange — plan-asserted in scripts/plan_audit.py.
State per key is zero (pure windowing); skewed keys are bounded by that
key's own history length, the same posture as sessionization.

Joining facts to the history is a plain as-of/range join on
(key, effective_from <= t < effective_to) — `operators/asof.py` /
`operators/range_join.py` already cover that side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    attr_col: str,
) -> DataFrame:
    """(key, attr, effective_from, effective_to, version) validity
    intervals. `order_cols` must totally order each key's observations
    (include a tie-breaker id); effective_from is the FIRST order
    column's value at the version's opening observation."""
    if not order_cols:
        raise ValueError("scd2_history: order_cols must be non-empty")
    # an observation with a NULL order value has no position on the
    # validity timeline (and Spark sorts NULLs first while DuckDB sorts
    # them last -- effective_from/version would diverge cross-engine):
    # excluded, the NULL-ts convention of the sequence operators
    for c in order_cols:
        df = df.where(F.col(c).isNotNull())
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    prev: Column = F.lag(F.col(attr_col)).over(w)
    first_row = F.row_number().over(w) == 1
    changed = first_row | ~F.col(attr_col).eqNullSafe(prev)
    opens = df.select(key_col, attr_col, *order_cols).withColumn(
        "_chg", changed
    ).where("_chg")
    # same partitionBy -> the exchange from the first window is reused
    w2 = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    eff_from = F.col(order_cols[0])
    return opens.select(
        F.col(key_col),
        F.col(attr_col),
        eff_from.alias("effective_from"),
        F.lead(eff_from).over(w2).alias("effective_to"),
        F.row_number().over(w2).cast("int").alias("version"),
    )
