"""Fixture loader + NTZ-safe event-time helpers."""

from pyspark.sql import functions as F


def test_events_ts_is_ntz_and_helpers_are_tz_independent(spark):
    from oasisdb_spark.sources.tables import event_time_micros, event_time_seconds, load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"

    rows = (
        ev.orderBy("event_id").limit(5)
        .select(
            "ts",
            event_time_micros(ev).alias("us"),
            event_time_seconds(ev).alias("s"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("wall"),
        )
        .collect()
    )
    for r in rows:
        # seconds = floor(micros/1e6); both pure NTZ calendar arithmetic
        assert r["s"] == r["us"] // 1_000_000
        # round-trip: micros re-render to the same wall-clock second
        import datetime as dt

        assert dt.datetime.utcfromtimestamp(r["s"]).strftime("%Y-%m-%d %H:%M:%S") == r["wall"]


def test_helpers_do_not_shift_across_session_timezones(spark):
    """The helpers must return identical values whatever the session
    timezone is set to (the driver's session TZ is unknown)."""
    from oasisdb_spark.sources.tables import event_time_micros, load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        vals = {}
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            vals[tz] = [
                r["us"]
                for r in ev.orderBy("event_id").limit(20).select(event_time_micros(ev).alias("us")).collect()
            ]
        assert vals["UTC"] == vals["America/New_York"] == vals["Asia/Tokyo"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
