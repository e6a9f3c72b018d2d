"""time_bucket_gapfill (operators/timeseries.py)."""

from pyspark.sql import functions as F

from oasisdb_spark.operators.timeseries import time_bucket_gapfill


def test_gapfill_densifies_and_locf(spark):
    rows = [
        ("a", 10, 5, 1.5),
        ("a", 13, 2, 7.0),   # gap at 11, 12
        ("b", 100, 1, 9.0),  # single-bucket series: no gaps
    ]
    df = spark.createDataFrame(rows, "s STRING, b LONG, n LONG, v DOUBLE")
    out = {(r["s"], r["b"]): r for r in
           time_bucket_gapfill(df, "b", ["s"], locf_cols=["v"]).collect()}
    assert len(out) == 5  # a:10..13 dense + b:100
    assert not out[("a", 10)]["is_gap"] and out[("a", 11)]["is_gap"]
    # LOCF carries v across the gap; n stays NULL on gaps
    assert out[("a", 11)]["v"] == 1.5 and out[("a", 12)]["v"] == 1.5
    assert out[("a", 13)]["v"] == 7.0
    assert out[("a", 11)]["n"] is None and out[("a", 13)]["n"] == 2
    assert not out[("b", 100)]["is_gap"]


def test_gapfill_leading_gap_stays_null_without_prior_observation(spark):
    # LOCF has nothing to carry before the first observation; the span
    # starts AT the first observation so no leading gap can exist —
    # assert the invariant: min bucket per series is never a gap
    df = spark.createDataFrame([("a", 5, 1.0), ("a", 8, 2.0)], "s STRING, b LONG, v DOUBLE")
    out = time_bucket_gapfill(df, "b", ["s"], locf_cols=["v"]).collect()
    first = min(out, key=lambda r: r["b"])
    assert first["b"] == 5 and not first["is_gap"]
    assert all(r["v"] is not None for r in out)  # locf covers every grid row
