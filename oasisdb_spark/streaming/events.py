"""Structured Streaming extension over the events table.

The reference has NO streaming surface (SURVEY.md §2.4: its only
async machinery is LSM compaction and index-snapshot goroutines,
tree_compact.go / index_manager.go:387-438). This module is the
north-star extension scope: the same event analytics the batch queries
compute (__spark_entry__._events_hourly/_events_sessionize), expressed
as incremental streaming plans with watermarks — the Spark-idiomatic
continuous version of "keep the derived table fresh".

Design notes for scale:
- file source reads the events directory incrementally (maxFilesPerTrigger
  bounds batch size); in production this is Kafka/Kinesis — swap the
  reader, the plan is unchanged.
- windowed_counts: tumbling windows + watermark bound state; late rows
  beyond the watermark are dropped deterministically.
- sessionize_stream: session windows via the built-in F.session_window
  (gap-based), watermark-bounded — the streaming twin of the batch
  lag/gap sessionizer, same 30-min gap semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Incremental parquet-directory source with the events schema.
    (The driver fixture's TIMESTAMP(NANOS) requires the nanos-as-long
    conf; streaming tests write their own micros fixtures.)"""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (n_events, sum_value) maintained across micro-batches —
    the arbitrary-state API the built-in window aggs can't express
    (e.g. for CDC-style accumulators or custom eviction policies).

    Emits one updated row per user per micro-batch (output mode
    'update'). State is a (n LONG, s DOUBLE) tuple per user_id; at
    scale state is partitioned by the grouping key across executors and
    checkpointed by the state store — no driver-side accumulation."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
    )

    def fn(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once dedup on event_id with BOUNDED state:
    dropDuplicatesWithinWatermark keeps each key only until the
    watermark passes it, so state size tracks the watermark horizon
    (events/sec x watermark), not the full stream history — the only
    formulation that survives an unbounded stream. Duplicates arriving
    within the watermark window are dropped; the first arrival wins."""
    # a NULL id is not a duplicate of another NULL id (Spark's
    # dropDuplicates treats NULL keys as equal and would collapse ALL
    # NULL-id rows to one), and a NULL ts never passes the watermark —
    # both are excluded, the identity + events-time contracts
    events = events.where(
        F.col("event_id").isNotNull() & F.col("ts").isNotNull()
    )
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def purchase_attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with every
    click by the same user in the preceding attribution window. The
    time-range predicate lets Spark evict join state on both sides once
    the watermark passes (unbounded state otherwise); at scale both
    streams hash-partition on user_id — one co-partitioned stateful
    join, no broadcast."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id", "purchase_ts", "click_ts", "amount"
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — streaming twin of the
    batch sessionizer (__spark_entry__._events_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


def run_to_parquet_sink(
    agg: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """PRODUCTION sink shape: watermarked aggregation → append-mode
    parquet file sink with a checkpoint. Unlike the memory/complete
    combo used by correctness entries (which re-emits full state each
    trigger and holds it on the driver), append mode writes each window
    exactly once when the watermark closes it, the checkpoint makes the
    query restartable, and output lands as immutable files a downstream
    batch reader picks up — constant driver memory at any scale.
    Drains with trigger=availableNow; returns the finished query.
    """
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming ordered funnel: per-user (stage, last_ts) carried
    across micro-batches via applyInPandasWithState — the stateful twin
    of the batch fold (operators/funnel.py funnel_steps), emitting the
    user's current stage each time it can change.

    Order-robustness: the greedy fold only advances on STRICTLY
    increasing timestamps, and within one timestamp at most one advance
    is possible — so any batch split or same-ts reordering yields the
    same final stage as the global batch fold (the property the entry's
    shared oracle checks). Events should be pre-filtered to the step
    types before the groupBy, and batches must arrive in ts order
    (stage the source in ts-ranged files); late events BEFORE the
    state's last_ts cannot rewind a stage — that is inherent to any
    single-pass funnel and documented here rather than hidden.

    State per user is two scalars; at scale it lives partitioned in the
    state store, checkpointed, never on the driver."""
    # batch-twin parity (operators/funnel.py funnel_steps): a journey
    # needs an identifiable user and timestamped steps
    events = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("stage", T.IntegerType())]
    )
    state_schema = T.StructType(
        [T.StructField("stage", T.IntegerType()), T.StructField("last_us", T.LongType())]
    )
    n = len(steps)

    def fn(key, pdfs, state: GroupState):
        stage, last_us = state.get if state.exists else (0, None)
        for pdf in pdfs:
            # NULL timestamps: NaT.astype(int64) is INT64_MIN, which
            # would advance a stage with a garbage last_ts -- drop them,
            # the batch funnel's convention
            pdf = pdf.dropna(subset=[ts_col])
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values([ts_col, id_col])
            # Arrow may hand datetime64[ns] or [us]; normalize to ns first
            us = pd.to_datetime(pdf[ts_col]).astype("datetime64[ns]").astype("int64") // 1000
            types = pdf[type_col].tolist()
            for t_us, typ in zip(us.tolist(), types):
                if stage < n and typ == steps[stage] and (last_us is None or t_us > last_us):
                    stage += 1
                    last_us = t_us
        state.update((stage, last_us if last_us is not None else -1))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return events.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
