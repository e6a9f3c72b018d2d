"""Structured Streaming ops: windowed counts and session windows must
produce the same results as their batch twins when the stream drains."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.streaming.events import (
    read_events_stream,
    sessionize_stream,
    windowed_counts,
)


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Micros-timestamp events fixture (3 files → 3 incremental batches)."""
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    p = str(tmp_path / "events_stream")
    ev.repartition(3).write.parquet(p)
    return p


def _drain(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_windowed_counts_matches_batch(spark, tmp_path, events_dir):
    stream = read_events_stream(spark, events_dir)
    _drain(windowed_counts(stream), tmp_path, "win_counts")
    got = spark.sql("SELECT sum(n_events) AS n FROM win_counts").first()["n"]
    batch_total = spark.read.parquet(events_dir).count()
    assert got == batch_total  # every event lands in exactly one window

    # per-(window, type) equality with the batch groupBy
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    stream_rows = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT window_start, event_type, n_events FROM win_counts").collect()
    }
    for r in batch.collect():
        assert stream_rows[(r["window_start"], r["event_type"])] == r["n_events"]


def test_sessionize_stream_total_events(spark, tmp_path):
    """Single time-ordered batch: no late data, every event lands in a
    session. (The 3-file out-of-order case above exercises the
    watermark's late-drop path instead.)"""
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    events_dir = str(tmp_path / "events_sorted")
    ev.orderBy("ts").coalesce(1).write.parquet(events_dir)
    stream = read_events_stream(spark, events_dir)
    _drain(sessionize_stream(stream), tmp_path, "sessions")
    total = spark.sql("SELECT sum(n_events) AS n FROM sessions").first()["n"]
    assert total == spark.read.parquet(events_dir).count()
    # session bounds are consistent: start <= end, no zero-event sessions
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert all(r["sess_start"] <= r["sess_end"] and r["n_events"] > 0 for r in rows)


def test_user_running_totals_state_accumulates(spark, tmp_path, events_dir):
    """applyInPandasWithState: state carries across micro-batches — the
    final emitted totals per user equal the batch aggregation."""
    from oasisdb_spark.streaming.events import user_running_totals

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_rt"))
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 3  # maxFilesPerTrigger=1 over 3 files → incremental

    # running totals are monotone in n_events: the max row per user is
    # the final state (collect order across batches is not guaranteed)
    final: dict = {}
    for r in spark.sql("SELECT * FROM running_totals").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["sum_value"])
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    for r in batch.collect():
        n, s = final[r["user_id"]]
        assert n == r["n"]
        assert abs(s - r["s"]) < 0.02


def test_dedup_stream_drops_replayed_file(spark, tmp_path):
    """An at-least-once source replaying the same rows must dedup to
    one row per event_id (bounded state via watermark)."""
    from oasisdb_spark.sources.tables import load_table
    from oasisdb_spark.streaming.events import dedup_stream

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(200)
    d = str(tmp_path / "dup_events")
    ev.coalesce(1).write.parquet(d)
    ev.coalesce(1).write.mode("append").parquet(d)  # the "replay"
    assert spark.read.parquet(d).count() == 400

    stream = read_events_stream(spark, d, max_files_per_trigger=1)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT event_id FROM deduped").collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == 200 and len(set(ids)) == 200


def test_purchase_attribution_matches_batch_join(spark, tmp_path):
    """Stream-stream interval join drains to the same pairs as the
    equivalent batch range join."""
    from oasisdb_spark.sources.tables import load_table
    from oasisdb_spark.streaming.events import purchase_attribution_stream

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    cd, pd_ = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    ev.filter(F.col("event_type") == "click").coalesce(1).write.parquet(cd)
    ev.filter(F.col("event_type") == "purchase").coalesce(1).write.parquet(pd_)

    joined = purchase_attribution_stream(
        read_events_stream(spark, cd), read_events_stream(spark, pd_)
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_at"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT purchase_id, click_id FROM attrib").collect()
    )

    c = spark.read.parquet(cd).select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = spark.read.parquet(pd_).select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    want = sorted(
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_upsert_makes_arrivals_searchable(spark, tmp_path, embeddings):
    """Streaming ingest (foreachBatch → upsert + incremental index add):
    after the stream drains, arrivals are searchable against the BUILT
    index without a rebuild, and a replayed micro-batch is idempotent."""
    from pyspark.sql import functions as F

    from oasisdb_spark.catalog import Catalog
    from oasisdb_spark.search import build_index, search_vectors
    from oasisdb_spark.streaming.ingest import stream_upsert

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_collection("s", dimension=64, index_type="ivf_flat",
                          params={"nlist": 4, "nprobe": 4})
    first = embeddings.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    cat.upsert_documents("s", first)
    build_index(cat, "s")

    src = tmp_path / "arrivals"
    src.mkdir()
    arrivals = embeddings.filter(F.col("vec_id").between(100, 139)).select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    arrivals.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))
    stream = spark.readStream.schema("id STRING, vector ARRAY<FLOAT>").parquet(str(src / "batch1"))
    q = stream_upsert(cat, "s", stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert cat.count_documents("s") == 140
    probe = embeddings.filter(F.col("vec_id") == 120).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = search_vectors(cat, "s", probe, k=1).collect()
    assert res[0]["id"] == "120" and abs(res[0]["distance"]) < 1e-6

    # replay the same micro-batch manually: both sides idempotent
    cat.upsert_documents("s", arrivals)
    from oasisdb_spark.search import add_to_index
    add_to_index(cat, "s", arrivals)
    assert cat.count_documents("s") == 140
    lists = spark.read.parquet(
        cat.index_path("s", cat.get_collection("s").index_version) + "/lists"
    )
    assert lists.count() == 140  # no duplicate index entries


def test_windowed_counts_parquet_sink_append(spark, tmp_path):
    """Production sink shape: append-mode file sink + checkpoint emits
    exactly the windows the watermark has closed, as immutable parquet;
    a second run with the same checkpoint is a no-op (exactly-once)."""
    import datetime as dt

    from oasisdb_spark.streaming.events import (
        EVENT_SCHEMA, read_events_stream, run_to_parquet_sink, windowed_counts,
    )

    src = tmp_path / "src"
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i * 5), i % 7, "click", float(i), "{}")
        for i in range(100)
    ]
    # late sentinel far ahead so every earlier 1h window is watermark-closed
    rows.append((999, base + dt.timedelta(hours=24), 1, "click", 1.0, "{}"))
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(str(src))

    ev = read_events_stream(spark, str(src), max_files_per_trigger=10)
    agg = windowed_counts(ev, window="1 hour", watermark="2 hours")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    run_to_parquet_sink(agg, str(out), str(ckpt))

    got = spark.read.parquet(str(out))
    # 100 events over ~8.3h -> windows 0..8 exist; watermark = 24h-2h
    # closes all of them (the sentinel's own window stays open)
    closed = got.filter("window_start < timestamp'2024-01-01 22:00:00'")
    assert closed.count() == 9
    assert got.agg({"n_events": "sum"}).collect()[0][0] == 100  # sentinel window open
    # restart with same checkpoint: no new files, same counts
    ev2 = read_events_stream(spark, str(src), max_files_per_trigger=10)
    run_to_parquet_sink(windowed_counts(ev2, "1 hour", "2 hours"), str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == got.count()


def test_funnel_stream_state_carries_across_batches(spark, tmp_path):
    """Split a funnel across three micro-batches: stage state must
    carry (view in batch 1, click in batch 2, purchase in batch 3) and
    out-of-order step types must not advance."""
    import os
    import time
    from datetime import datetime

    from oasisdb_spark.streaming.events import funnel_stream

    steps = ["view", "click", "purchase"]
    d = str(tmp_path / "funnel_src")
    os.makedirs(d)
    batches = [
        # u1 progresses one step per batch; u2 does click-first (stuck at 0 until its view)
        [(1, datetime(2024, 1, 1, 9), 1, "view"), (2, datetime(2024, 1, 1, 9), 2, "click")],
        [(3, datetime(2024, 1, 1, 10), 1, "click"), (4, datetime(2024, 1, 1, 10), 2, "view")],
        [(5, datetime(2024, 1, 1, 11), 1, "purchase"), (6, datetime(2024, 1, 1, 11), 2, "click")],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        tmp = str(tmp_path / f"w{i}")
        spark.createDataFrame(
            rows, "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob, shutil

        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(d, f"b{i}.parquet")
        shutil.copyfile(src, dst)
        os.utime(dst, (now - (3 - i) * 10, now - (3 - i) * 10))
    ev = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        funnel_stream(ev, steps)
        .writeStream.format("memory").queryName("funnel_state_test")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("funnel_state_test").collect()
    import collections

    final = collections.defaultdict(int)
    for r in rows:
        final[r["user_id"]] = max(final[r["user_id"]], r["stage"])
    assert final[1] == 3   # advanced once per batch — state carried
    assert final[2] == 2   # click-before-view ignored; view then click counted
    # more than one micro-batch actually ran (one update row per user per batch)
    assert len(rows) >= 4


def test_funnel_stream_ignores_null_timestamps(spark, tmp_path):
    # NaT.astype(int64) is INT64_MIN: a NULL-ts event used to advance a
    # stage with a garbage last_ts (batch funnel drops NULL ts)
    import pandas as pd

    from oasisdb_spark.streaming.events import EVENT_SCHEMA, funnel_stream, read_events_stream

    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        # user 7: NULL-ts 'view' must NOT advance; then a real funnel
        (1, None, 7, "view", 1.0, "{}"),
        (2, pd.Timestamp("2024-01-01 10:00:00"), 7, "view", 1.0, "{}"),
        (3, pd.Timestamp("2024-01-01 10:01:00"), 7, "cart", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    spark.createDataFrame(pdf, EVENT_SCHEMA).coalesce(1).write.parquet(str(src / "b0"))
    ev = read_events_stream(spark, str(src / "b0"))
    out_rows = {}

    def sink(batch, _):
        for r in batch.collect():
            out_rows[r["user_id"]] = r["stage"]

    q = (
        funnel_stream(ev, ["view", "cart", "purchase"])
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert out_rows[7] == 2  # view@10:00 then cart@10:01; NULL row ignored
