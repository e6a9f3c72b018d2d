"""Time-series operators: dense bucket grids over sparse aggregates,
and OHLC downsampling bars.

``time_bucket_gapfill`` is the TimescaleDB hypertable op of the same
name re-expressed Spark-first: given a per-(series, bucket) aggregate
that only has rows where data exists, produce the DENSE bucket grid per
series and fill the holes — count-like columns become 0 via plain
coalesce downstream, value-like columns carry the last observation
forward (LOCF). Dashboards and downsampling cascades need the dense
grid; naive chart code silently interpolates over missing buckets.

``ohlc_bars`` is the classic market-data downsample (TimescaleDB
``candlestick_agg`` / kdb+ bar builds): per (series, time bucket), the
first/max/min/last observation of a value. First/last are selected by
``min_by``/``max_by`` over a (ts, tie...) STRUCT key — a total order
when the tie columns make rows unique — so the whole bar is ONE
partial-aggregating shuffle on (series, bucket): no window sort, and
map-side combine collapses each scan partition to at most one
candidate row per bar before anything moves. At 100 TB that's the
difference between a bar build that shuffles 8 aggregate fields per
bar and one that sorts every tick twice.

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

__all__ = ["time_bucket_gapfill", "ohlc_bars"]


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


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    series_cols: list[str],
    bucket_width: str = "hour",
    tie_cols: list[str] | None = None,
    extra_aggs: list | None = None,
) -> DataFrame:
    """Downsample ``df`` to one OHLC bar per (series, ``bucket_width``
    truncation of ``ts_col``): ``open``/``close`` are the value at the
    first/last (ts, *tie_cols) key in the bar — a TOTAL order whenever
    the tie columns distinguish equal-timestamp rows, so first/last are
    engine-exact, not "whichever row the aggregate saw first" —
    ``high``/``low`` are plain max/min, ``n_obs`` the bar row count.
    ``extra_aggs`` (already-aliased aggregate Columns, e.g. an integer
    micro-unit sum) ride the SAME groupBy, so adding volume metrics
    costs zero extra shuffles. ``bar_start`` is emitted as a formatted
    string (the repo's timezone-free timestamp rendering idiom). NULL
    values never win min_by/max_by keys here because the key is the
    row's (ts, ties), not the value.

    Plan: scan-stage date_trunc + ONE partial-agg shuffle on
    (series, bar). No windows, no second pass.
    """
    key = F.struct(F.col(ts_col), *[F.col(c) for c in (tie_cols or [])])
    bar = F.date_format(
        F.date_trunc(bucket_width, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
    ).alias("bar_start")
    return df.groupBy(*series_cols, bar).agg(
        F.min_by(F.col(value_col), key).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), key).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
        *(extra_aggs or []),
    )
