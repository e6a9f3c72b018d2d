"""Table profiler: per-column statistics in one pass.

The data-quality step every ingest pipeline runs before heavier
curation: for each column, non-null/null counts, distinct cardinality,
and min/max (stringified so heterogeneous columns share one output
schema). Output is long-form — one row per column — so downstream
checks join/filter on (column, metric) instead of parsing a wide row.

Scale shape:
- One aggregation job. With ``exact_distinct=True`` Spark plans the
  multi-column COUNT(DISTINCT) via Expand (one input replica per
  distinct aggregate) — exact, cross-engine-reproducible, and the right
  default at audit scale; the gate oracle verifies this path.
- At 100 TB, profile with ``exact_distinct=False``: distinct counts
  come from approx_count_distinct (HLL++, single replica, no Expand),
  everything else unchanged. The switch only changes n_distinct.
- The result is len(columns) rows — never collect-heavy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns (column, n_rows, n_nulls, n_distinct, min_value, max_value)
    with one row per profiled column; min/max are cast to string after
    being taken in the column's native type (so numeric columns order
    numerically, not lexically). n_distinct ignores nulls (COUNT
    DISTINCT semantics).
    """
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if not cols:
        raise ValueError("no columns to profile")

    def _ref(c: str):
        # backtick-quote so the EXACT column name resolves (bare F.col /
        # df[...] re-parse dots as struct-field access); literal
        # backticks escape by doubling, per SQL identifier rules
        return F.col("`" + c.replace("`", "``") + "`")

    distinct = (
        (lambda c: F.count_distinct(_ref(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(_ref(c)))
    )
    # internal aliases are INDEX-based (the check_constraints rule):
    # interpolating the column name would break on dots/backticks
    # (F.col("__cnt_a.b") parses as a nested-field reference) and on
    # case-only-distinct pairs ("A"/"a" collide under Spark's default
    # case-insensitive resolution)
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(_ref(c)).alias(f"__cnt_{i}"),
            distinct(c).cast("bigint").alias(f"__nd_{i}"),
            F.min(_ref(c)).cast("string").alias(f"__min_{i}"),
            F.max(_ref(c)).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__total").alias("n_rows"),
            (F.col("__total") - F.col(f"__cnt_{i}")).alias("n_nulls"),
            F.col(f"__nd_{i}").alias("n_distinct"),
            F.col(f"__min_{i}").alias("min_value"),
            F.col(f"__max_{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
