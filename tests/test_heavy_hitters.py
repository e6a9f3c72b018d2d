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


def test_stream_equals_batch(spark, tmp_path):
    """heavy_hitters_stream over 3 mtime-ordered chunks == batch
    heavy_hitters — the MG-merge superset + exact-verify identity."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from oasisdb_spark.functions.sketch import heavy_hitters, heavy_hitters_stream

    rows = [(i, f"hot{i % 3}") for i in range(3000)]
    rows += [(10000 + i, f"rare{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "id LONG, v STRING")

    d = tmp_path / "chunks"
    d.mkdir()
    now = time.time()
    for i in range(3):
        tmp = str(tmp_path / f"_w{i}")
        df.where(F.col("id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = str(d / f"chunk_{i}.parquet")
        shutil.copyfile(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (now - (3 - i) * 10, now - (3 - i) * 10))
    stream = spark.readStream.schema("id LONG, v STRING").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(d))

    got = sorted(
        map(tuple, heavy_hitters_stream(stream, "v", 0.1, verify_df=df).collect())
    )
    want = sorted(map(tuple, heavy_hitters(df, "v", 0.1).collect()))
    assert got == want
    assert {t[0] for t in got} == {"hot0", "hot1", "hot2"}


def test_stream_phi_validation(spark):
    import pytest as _pytest

    from oasisdb_spark.functions.sketch import heavy_hitters_stream

    df = spark.createDataFrame([(1,)], "v LONG")
    with _pytest.raises(ValueError):
        heavy_hitters_stream(df, "v", 0.0, verify_df=df)


def test_batch_phi_validation_and_nonnull_n(spark):
    """r07 review: batch phi gets the same (0,1] validation as the
    stream, and N counts NON-NULL values (SQL COUNT(value) semantics),
    so batch and stream agree on threshold/share with nulls present."""
    import pytest

    df = spark.createDataFrame([(1,), (1,), (None,), (None,), (None,)], "v BIGINT")
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "v", 0.0)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "v", -0.5)
    # 2 non-null rows, value 1 occurs 2x -> share 2/2 = 1.0 (was 2/5
    # when N counted null rows)
    out = {r["value"]: r["share"] for r in heavy_hitters(df, "v", 0.9).collect()}
    assert out == {1: 1.0}
