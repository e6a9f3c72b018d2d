"""Time-series operators: dense bucket grids over sparse aggregates.

``time_bucket_gapfill`` is the TimescaleDB hypertable op of the same
name re-expressed Spark-first: given a per-(series, bucket) aggregate
that only has rows where data exists, produce the DENSE bucket grid per
series and fill the holes — count-like columns become 0 via plain
coalesce downstream, value-like columns carry the last observation
forward (LOCF). Dashboards and downsampling cascades need the dense
grid; naive chart code silently interpolates over missing buckets.

Plan shape: one partial-agg shuffle for the per-series [min, max]
bucket span, a scan-stage ``sequence``+``explode`` to materialize the
grid (no shuffle — the grid derives from the span row alone), one
equi-join back to the sparse aggregate, and one LOCF window per series.
Row count is Σ_series (span) — inherent to gap fill; at 100 TB pick the
bucket width so spans stay sane (the same judgement TimescaleDB asks
for), and note the grid rows never carry payload wider than the
aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["time_bucket_gapfill"]


def time_bucket_gapfill(
    df: DataFrame,
    bucket_col: str,
    series_cols: list[str],
    locf_cols: list[str] | None = None,
) -> DataFrame:
    """Densify ``df`` (one row per existing (series, bucket); bucket an
    INTEGER bucket id, e.g. floor(epoch/width)) to every bucket in each
    series' [min, max] span. Adds ``is_gap`` (true on fabricated rows);
    columns in ``locf_cols`` are filled with the last non-null earlier
    value in the series, all other value columns stay NULL on gaps
    (coalesce to 0 downstream for count semantics)."""
    span = df.groupBy(*series_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    dense = span.select(
        *series_cols, F.explode(F.sequence("_lo", "_hi")).alias(bucket_col)
    )
    marked = df.withColumn("_present", F.lit(True))
    out = dense.join(marked, on=[*series_cols, bucket_col], how="left").withColumn(
        "is_gap", F.col("_present").isNull()
    ).drop("_present")
    for v in locf_cols or []:
        w = (
            Window.partitionBy(*series_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return out
