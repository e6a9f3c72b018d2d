"""Tests for functions/sketch.py heavy_hitters (candidates + exact verify)."""

import math

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.functions.sketch import heavy_hitters


def brute(df, col, phi):
    n = df.count()
    t = math.ceil(phi * n)
    return {
        (r[col], r["cnt"])
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= t).collect()
    }


def test_exact_vs_bruteforce_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {(r["value"], r["cnt"]) for r in heavy_hitters(ev, "user_id", 0.01).collect()}
    assert got == brute(ev, "user_id", 0.01)


def test_partitioning_invariance(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = {(r["value"], r["cnt"]) for r in heavy_hitters(ev, "event_type", 0.1).collect()}
    b = {(r["value"], r["cnt"])
         for r in heavy_hitters(ev.repartition(13), "event_type", 0.1).collect()}
    assert a == b and a


def test_skewed_key_found(spark):
    rows = [(1,)] * 500 + [(i,) for i in range(2, 400)]
    df = spark.createDataFrame(rows, "v BIGINT").repartition(8)
    out = {r["value"]: r["cnt"] for r in heavy_hitters(df, "v", 0.5).collect()}
    assert out == {1: 500}


def test_share_column(spark):
    df = spark.createDataFrame([(1,)] * 8 + [(2,)] * 2, "v BIGINT")
    out = {r["value"]: r for r in heavy_hitters(df, "v", 0.2).collect()}
    assert out[1]["share"] == pytest.approx(0.8)
    assert 2 in out and out[2]["share"] == pytest.approx(0.2)


def test_nulls_ignored(spark):
    df = spark.createDataFrame([(1,), (1,), (None,), (None,), (None,)], "v BIGINT")
    out = heavy_hitters(df, "v", 0.3).collect()
    assert {r["value"] for r in out} == {1}


def test_mg_cap_under_high_cardinality(spark):
    """Adversarial: ~50k near-unique values around two true hitters —
    the Misra-Gries summary (cap = ceil(2/phi)) must still surface
    both, exactly."""
    rows = [(f"hot{i % 2}",) for i in range(20000)] + [(f"u{i}",) for i in range(50000)]
    df = spark.createDataFrame(rows, "v STRING").repartition(16)
    out = {r["value"]: r["cnt"] for r in heavy_hitters(df, "v", 0.1).collect()}
    assert out == {"hot0": 10000, "hot1": 10000}
