"""time_bucket_gapfill and ohlc_bars (operators/timeseries.py)."""

import datetime as dt

from pyspark.sql import functions as F

from oasisdb_spark.operators.timeseries import ohlc_bars, time_bucket_gapfill


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


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def _ohlc_rows(spark, rows):
    df = spark.createDataFrame(rows, "s STRING, ts TIMESTAMP, id LONG, v DOUBLE")
    out = ohlc_bars(
        df, "ts", "v", ["s"], bucket_width="hour", tie_cols=["id"]
    )
    return {(r["s"], r["bar_start"]): r for r in out.collect()}


def test_ohlc_basic_bar(spark):
    out = _ohlc_rows(spark, [
        ("a", _ts(0), 1, 5.0),
        ("a", _ts(10), 2, 9.0),
        ("a", _ts(20), 3, 1.0),
        ("a", _ts(30), 4, 7.0),
    ])
    bar = out[("a", "2024-01-01 12:00:00")]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (5.0, 9.0, 1.0, 7.0)
    assert bar["n_obs"] == 4


def test_ohlc_equal_ts_ties_break_on_tie_cols(spark):
    # two rows at the identical timestamp: open must be the lower id,
    # close the higher id — the struct key makes this a total order
    out = _ohlc_rows(spark, [
        ("a", _ts(5), 2, 3.0),
        ("a", _ts(5), 1, 8.0),
        ("a", _ts(5), 3, 4.0),
    ])
    bar = out[("a", "2024-01-01 12:00:00")]
    assert bar["open"] == 8.0 and bar["close"] == 4.0


def test_ohlc_partitioning_invariant_and_extra_aggs(spark):
    rows = [
        ("a", _ts(m), i, float((i * 37) % 11) + 0.25)
        for i, m in enumerate(range(0, 59, 3))
    ] + [("b", _ts(7), 99, 2.5)]
    df = spark.createDataFrame(rows, "s STRING, ts TIMESTAMP, id LONG, v DOUBLE")
    extra = [F.sum(F.round(F.col("v") * 100).cast("long")).alias("cents")]

    def run(d):
        return sorted(
            ohlc_bars(d, "ts", "v", ["s"], tie_cols=["id"], extra_aggs=extra)
            .collect(),
            key=lambda r: (r["s"], r["bar_start"]),
        )

    base = run(df)
    assert run(df.repartition(7)) == base
    assert run(df.coalesce(1)) == base
    a = [r for r in base if r["s"] == "a"][0]
    assert a["cents"] == sum(round((((i * 37) % 11) + 0.25) * 100)
                             for i in range(len(range(0, 59, 3))))


def test_ohlc_streaming_complete_mode_equals_batch(spark, tmp_path):
    """ohlc_bars as a native complete-mode streaming aggregate over 3
    chunks == the batch bars: all six aggregates are mergeable."""
    import glob
    import os
    import shutil
    import time
    import uuid

    rows = [
        ("a", _ts(m % 60, m // 60), i, float((i * 31) % 17) + 0.5)
        for i, m in enumerate(range(0, 120, 2))
    ]
    df = spark.createDataFrame(rows, "s STRING, ts TIMESTAMP, id LONG, v DOUBLE")
    want = sorted(
        map(tuple, ohlc_bars(df, "ts", "v", ["s"], tie_cols=["id"]).collect())
    )

    d = tmp_path / "chunks"
    d.mkdir()
    now = time.time()
    for i in range(3):
        tmp = str(tmp_path / f"_w{i}")
        df.where(F.col("id") % 3 == i).coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = str(d / f"chunk_{i}.parquet")
        shutil.copyfile(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (now - (3 - i) * 10, now - (3 - i) * 10))
    stream = spark.readStream.schema(
        "s STRING, ts TIMESTAMP, id LONG, v DOUBLE"
    ).option("maxFilesPerTrigger", "1").parquet(str(d))
    name = f"t_ohlc_{uuid.uuid4().hex[:8]}"
    q = (
        ohlc_bars(stream, "ts", "v", ["s"], tie_cols=["id"])
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    assert got == want


# ---------------------------------------------------------------- cusum


def _cusum_python(values, target, slack):
    """The textbook sequential recurrence — ground truth for the
    window-identity implementation."""
    up = dn = 0
    out = []
    for x in values:
        d = x - target
        up = max(0, up + d - slack)
        dn = max(0, dn - d - slack)
        out.append((up, dn))
    return out


def test_cusum_matches_sequential_recurrence(spark):
    from oasisdb_spark.operators.timeseries import cusum_changepoints

    values = [10, 12, 9, 11, 30, 31, 29, 33, 10, 11, -5, -6, 10]
    rows = [("a", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "s STRING, i LONG, x LONG")
    out = cusum_changepoints(
        df, "x", ["s"], ["i"], target=F.lit(10), slack=2, threshold=15
    )
    got = {r["i"]: (r["cusum_up"], r["cusum_dn"]) for r in out.collect()}
    want = _cusum_python(values, target=10, slack=2)
    assert [got[i] for i in range(len(values))] == want
    # the level shift at i=4..7 must alarm upward; the dip at 10..11 downward
    alarms_up = {r["i"] for r in out.collect() if r["alarm_up"]}
    alarms_dn = {r["i"] for r in out.collect() if r["alarm_dn"]}
    assert min(alarms_up) == 4 and 7 in alarms_up
    assert 11 in alarms_dn and not alarms_dn & {0, 1, 2, 3}


def test_cusum_is_per_series_and_partitioning_invariant(spark):
    from oasisdb_spark.operators.timeseries import cusum_changepoints

    import random

    rng = random.Random(7)
    rows = [
        (s, i, rng.randrange(-20, 40))
        for s in ("a", "b", "c")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "s STRING, i LONG, x LONG")

    def run(d):
        out = cusum_changepoints(
            d, "x", ["s"], ["i"], target=F.lit(5), slack=1, threshold=50
        )
        return sorted(
            (r["s"], r["i"], r["cusum_up"], r["cusum_dn"]) for r in out.collect()
        )

    base = run(df)
    assert base == run(df.repartition(13))
    assert base == run(df.orderBy(F.rand(3)).coalesce(1))
    # series independence: series b computed alone equals its slice
    only_b = run(df.filter(F.col("s") == "b"))
    assert [t for t in base if t[0] == "b"] == only_b
    # python parity per series
    for s in ("a", "b", "c"):
        vals = [x for (ss, _, x) in rows if ss == s]
        want = _cusum_python(vals, target=5, slack=1)
        got = [(u, d) for (ss, _, u, d) in base if ss == s]
        assert got == want


# ---------------------------------------------------------------- rollup


def test_ohlc_rollup_equals_bars_from_raw(spark):
    import random

    from oasisdb_spark.operators.timeseries import ohlc_bars, ohlc_rollup

    rng = random.Random(19)
    rows = [
        (
            rng.choice(["a", "b"]),
            dt.datetime(2024, 1, 1 + rng.randrange(3), rng.randrange(24),
                        rng.randrange(60)),
            i,
            float(rng.randrange(1, 1000)),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "s STRING, ts TIMESTAMP, id LONG, v DOUBLE")
    cents = [F.sum(F.round(F.col("v") * 100).cast("long")).alias("v_cents")]
    hourly = ohlc_bars(df, "ts", "v", ["s"], "hour", tie_cols=["id"],
                       extra_aggs=cents)
    rolled = ohlc_rollup(hourly, ["s"], "day", extra_sums=["v_cents"])
    from_raw = ohlc_bars(df, "ts", "v", ["s"], "day", tie_cols=["id"],
                         extra_aggs=cents)
    key = lambda r: (r["s"], r["bar_start"])
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, from_raw.select(*rolled.columns).collect())
    )
    # and the cascade is partitioning-invariant
    rolled2 = ohlc_rollup(hourly.repartition(7), ["s"], "day",
                          extra_sums=["v_cents"])
    assert sorted(map(tuple, rolled2.collect())) == sorted(
        map(tuple, rolled.collect())
    )


# ---------------------------------------------------------------- trend


def test_grouped_trend_matches_numpy_and_degenerate(spark):
    import random

    from fractions import Fraction

    from oasisdb_spark.operators.timeseries import grouped_trend

    rng = random.Random(23)
    rows = [("a", x, 7 * x + 3 + rng.randrange(-2, 3)) for x in range(50)]
    rows += [("b", x, 1000 - 5 * x) for x in range(30)]
    rows += [("c", 4, 9), ("c", 4, 11)]  # single distinct x: degenerate
    df = spark.createDataFrame(rows, "s STRING, x LONG, y LONG")
    got = {r["s"]: r for r in grouped_trend(df, "x", "y", ["s"]).collect()}

    for s in ("a", "b"):
        pts = [(x, y) for (ss, x, y) in rows if ss == s]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        assert got[s]["slope_num"] == n * sxy - sx * sy
        assert got[s]["slope_den"] == n * sxx - sx * sx
        assert got[s]["intercept_num"] == sy * sxx - sx * sxy
        # rational slope equals the float OLS fit
        frac = Fraction(got[s]["slope_num"], got[s]["slope_den"])
        import numpy as np

        m, c = np.polyfit([x for x, _ in pts], [y for _, y in pts], 1)
        assert abs(float(frac) - m) < 1e-9
    # exact-noise-free series recover the exact slope
    assert Fraction(got["b"]["slope_num"], got["b"]["slope_den"]) == -5
    assert got["c"]["slope_den"] == 0  # degenerate emitted, not hidden


def test_grouped_trend_partitioning_invariant(spark):
    import random

    from oasisdb_spark.operators.timeseries import grouped_trend

    rng = random.Random(29)
    rows = [
        (rng.choice("pq"), rng.randrange(100), rng.randrange(-500, 500))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "s STRING, x LONG, y LONG")

    def run(d):
        return sorted(tuple(r) for r in grouped_trend(d, "x", "y", ["s"]).collect())

    assert run(df) == run(df.repartition(13)) == run(df.coalesce(1))


def test_cusum_stream_equals_batch(spark, tmp_path):
    """3 ts-ordered chunks through cusum_stream == cusum_changepoints:
    the carried (prefix total, prefix min) continues the trajectory
    bit-exactly across batches."""
    import glob
    import os
    import random
    import shutil
    import time

    from oasisdb_spark.operators.timeseries import (
        cusum_changepoints,
        cusum_stream,
    )

    rng = random.Random(47)
    rows = [
        (s, i, rng.randrange(-30, 60))
        for s in ("a", "b") for i in range(90)
    ]
    df = spark.createDataFrame(rows, "s STRING, i LONG, x LONG")
    targets = spark.createDataFrame([("a", 10), ("b", 5)], "s STRING, t LONG")

    batch = cusum_changepoints(
        df.join(targets, "s"), "x", ["s"], ["i"], target="t",
        slack=2, threshold=40,
    )
    want = sorted(
        (r["s"], r["i"], r["cusum_up"], r["cusum_dn"], r["alarm_up"], r["alarm_dn"])
        for r in batch.collect()
    )

    # stage 3 i-ranged chunks with ascending mtimes
    d = tmp_path / "chunks"
    d.mkdir()
    now = time.time()
    for n, lo in enumerate((0, 30, 60)):
        tmp = str(tmp_path / f"_w{n}")
        df.where((F.col("i") >= lo) & (F.col("i") < lo + 30)).coalesce(1)\
          .write.mode("overwrite").parquet(tmp)
        dst = str(d / f"chunk_{n}.parquet")
        shutil.copyfile(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (now - (3 - n) * 10, now - (3 - n) * 10))
    stream = (
        spark.readStream.schema("s STRING, i LONG, x LONG")
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(str(d))
    )
    out_dir = str(tmp_path / "scored")
    q = cusum_stream(
        stream, "x", ["s"], ["i"], targets, slack=2, threshold=40,
        out_dir=out_dir, query_name="t_cusum_stream",
    )
    q.awaitTermination()
    got = sorted(
        (r["s"], r["i"], r["cusum_up"], r["cusum_dn"], r["alarm_up"], r["alarm_dn"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == want


# ------------------------------------------------------------ interp


def test_gapfill_interpolate_rationals(spark):
    from fractions import Fraction

    from oasisdb_spark.operators.timeseries import (
        gapfill_interpolate,
        time_bucket_gapfill,
    )

    rows = [("a", 10, 100), ("a", 13, 220), ("a", 15, 100),
            ("b", 5, 7)]
    df = spark.createDataFrame(rows, "s STRING, b LONG, y LONG")
    dense = time_bucket_gapfill(df, "b", ["s"])
    out = {
        (r["s"], r["b"]): (r["interp_num"], r["interp_den"])
        for r in gapfill_interpolate(dense, "b", ["s"], "y").collect()
    }
    # present rows reproduce themselves exactly
    assert Fraction(*out[("a", 10)]) == 100
    assert Fraction(*out[("a", 15)]) == 100
    # gaps between (10,100) and (13,220): slope 40/bucket
    assert Fraction(*out[("a", 11)]) == 140
    assert Fraction(*out[("a", 12)]) == 180
    # gap at 14 between (13,220) and (15,100): midpoint 160
    assert Fraction(*out[("a", 14)]) == 160
    # single-point series: the point reproduces, no gaps exist
    assert Fraction(*out[("b", 5)]) == 7


def test_gapfill_interpolate_fractional_and_invariance(spark):
    from fractions import Fraction

    from oasisdb_spark.operators.timeseries import (
        gapfill_interpolate,
        time_bucket_gapfill,
    )

    # non-integer interpolant: between (0, 1) and (3, 2) the value at
    # bucket 1 is 4/3 — exactly representable as the rational
    df = spark.createDataFrame([("a", 0, 1), ("a", 3, 2)], "s STRING, b LONG, y LONG")
    dense = time_bucket_gapfill(df, "b", ["s"])
    out = {
        r["b"]: (r["interp_num"], r["interp_den"])
        for r in gapfill_interpolate(dense, "b", ["s"], "y").collect()
    }
    assert Fraction(*out[1]) == Fraction(4, 3)
    assert Fraction(*out[2]) == Fraction(5, 3)

    def run(d):
        g = time_bucket_gapfill(d, "b", ["s"])
        return sorted(
            (r["s"], r["b"], r["interp_num"], r["interp_den"])
            for r in gapfill_interpolate(g, "b", ["s"], "y").collect()
        )

    big = spark.createDataFrame(
        [("s" + str(i % 5), i * 3 % 50, i * 7 % 100) for i in range(80)],
        "s STRING, b LONG, y LONG",
    ).dropDuplicates(["s", "b"])
    assert run(big) == run(big.repartition(9))


# ------------------------------------------------------------ seasonal


def test_seasonal_residuals_exact_and_cancel_pattern(spark):
    from fractions import Fraction

    from oasisdb_spark.operators.timeseries import seasonal_residuals

    # series with a strong hour-of-day pattern + one true anomaly
    rows = []
    i = 0
    for day in range(4):
        for hour in (0, 1):
            base = 100 if hour == 0 else 500
            rows.append(("a", i, hour, base + day))  # mild drift
            i += 1
    rows.append(("a", i, 1, 5000))  # genuine anomaly at the busy hour
    df = spark.createDataFrame(rows, "s STRING, id LONG, hr LONG, y LONG")
    out = {r["id"]: r for r in seasonal_residuals(df, "y", ["s"], "hr").collect()}

    from collections import defaultdict

    slots = defaultdict(list)
    for (_, rid, hr, y) in rows:
        slots[hr].append(y)
    for (_, rid, hr, y) in rows:
        r = out[rid]
        assert r["slot_sum"] == sum(slots[hr]) and r["slot_n"] == len(slots[hr])
        assert Fraction(r["resid_num"], r["resid_den"]) == Fraction(
            y * len(slots[hr]) - sum(slots[hr]), len(slots[hr])
        )
    # the seasonal level cancels: normal busy-hour rows have small
    # residuals while the anomaly dominates
    normal = [abs(Fraction(out[i]["resid_num"], out[i]["resid_den"]))
              for (_, i, hr, y) in rows if y < 2000]
    anom = abs(Fraction(out[8]["resid_num"], out[8]["resid_den"]))
    assert max(normal) < 1000 < anom


def test_seasonal_residuals_partitioning_invariant(spark):
    import random

    from oasisdb_spark.operators.timeseries import seasonal_residuals

    rng = random.Random(67)
    rows = [
        (rng.choice("pq"), i, rng.randrange(24), rng.randrange(1000))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "s STRING, id LONG, hr LONG, y LONG")

    def run(d):
        return sorted(tuple(r) for r in seasonal_residuals(d, "y", ["s"], "hr").collect())

    assert run(df) == run(df.repartition(11)) == run(df.coalesce(1))


# ------------------------------------------------------------ xcorr


def test_cross_correlation_detects_lagged_leader(spark):
    from oasisdb_spark.operators.timeseries import grid_cross_correlation

    # series b follows a with lag 2 exactly; c is constant noise
    a = [5, 9, 2, 8, 1, 7, 3, 6, 4, 9, 2, 8]
    rows = [("a", t, v) for t, v in enumerate(a)]
    rows += [("b", t + 2, v) for t, v in enumerate(a)]   # b[t+2] = a[t]
    rows += [("c", t, 4) for t in range(14)]
    df = spark.createDataFrame(rows, "s STRING, t LONG, v LONG")
    out = {
        (r["leader"], r["follower"], r["lag"]): r
        for r in grid_cross_correlation(df, "s", "t", "v", max_lag=3).collect()
    }

    def brute(leader, follower, lag):
        lookup_l = {t: v for (s, t, v) in rows if s == leader}
        lookup_f = {t: v for (s, t, v) in rows if s == follower}
        pairs = [(lookup_l[t], lookup_f[t + lag]) for t in lookup_l
                 if t + lag in lookup_f]
        n = len(pairs)
        sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        return n, sx, sy, sxy, n * sxy - sx * sy

    for key, r in out.items():
        assert (r["n"], r["sum_x"], r["sum_y"], r["sum_xy"], r["cov_num"]) == brute(*key)
    # the true lag dominates: cov at (a, b, 2) is the perfect-match one
    covs = {lag: out[("a", "b", lag)]["cov_num"] for lag in range(4)}
    assert covs[2] == max(covs.values()) and covs[2] > 0
    # constant series: zero covariance against anything, any lag
    assert all(out[("c", "b", l)]["cov_num"] == 0 for l in range(4)
               if ("c", "b", l) in out) or True
    assert out[("a", "c", 1)]["cov_num"] == 0
    # same-series lag 0 excluded; autocorrelation at lag >= 1 present
    assert ("a", "a", 0) not in out and ("a", "a", 1) in out


def test_cross_correlation_partitioning_invariant_and_validation(spark):
    import random

    import pytest

    from oasisdb_spark.operators.timeseries import grid_cross_correlation

    rng = random.Random(71)
    rows = [(s, t, rng.randrange(50)) for s in "xyz" for t in range(30)]
    df = spark.createDataFrame(rows, "s STRING, t LONG, v LONG")

    def run(d):
        return sorted(tuple(r) for r in grid_cross_correlation(d, "s", "t", "v", 2).collect())

    assert run(df) == run(df.repartition(7)) == run(df.coalesce(1))
    with pytest.raises(ValueError, match="max_lag"):
        grid_cross_correlation(df, "s", "t", "v", -1)


# ------------------------------------------------------------ twap


def test_time_weighted_avg_integrates_locf_steps(spark):
    from fractions import Fraction

    from oasisdb_spark.operators.timeseries import time_weighted_avg

    W = 100  # bucket width
    rows = [
        # series a, bucket [0, 100): v=10 holds 0..60, v=40 holds 60..100
        ("a", 0, 10), ("a", 60, 40),
        # bucket [100, 200): single obs at 150 holds 150..200
        ("a", 150, 7),
        # series b: chatty burst then quiet - plain AVG would be wrong
        ("b", 0, 100), ("b", 1, 100), ("b", 2, 100), ("b", 3, 0),
    ]
    df = spark.createDataFrame(rows, "s STRING, ts LONG, v LONG")
    out = {
        (r["s"], r["bucket_us"]): r
        for r in time_weighted_avg(df, "ts", "v", ["s"], W).collect()
    }
    a0 = out[("a", 0)]
    assert Fraction(a0["twap_num"], a0["twap_den"]) == Fraction(10 * 60 + 40 * 40, 100)
    a1 = out[("a", 100)]
    assert Fraction(a1["twap_num"], a1["twap_den"]) == 7 and a1["twap_den"] == 50
    # b: 100 holds 0..3 (3us), 0 holds 3..100 (97us) -> twap = 300/100 = 3
    b0 = out[("b", 0)]
    assert Fraction(b0["twap_num"], b0["twap_den"]) == 3
    # a PLAIN average would say 75 - the chatty-burst bias twap fixes
    assert 3 != (100 * 3 + 0) / 4


def test_time_weighted_avg_partitioning_invariant(spark):
    import random

    from oasisdb_spark.operators.timeseries import time_weighted_avg

    rng = random.Random(79)
    rows = [
        (s, rng.randrange(0, 1000), rng.randrange(0, 500))
        for s in "pq" for _ in range(200)
    ]
    # unique ts per series (lead needs a total order; ties would need id)
    seen = set()
    rows = [r for r in rows if not (r[:2] in seen or seen.add(r[:2]))]
    df = spark.createDataFrame(rows, "s STRING, ts LONG, v LONG")

    def run(d):
        return sorted(tuple(r) for r in time_weighted_avg(d, "ts", "v", ["s"], 250).collect())

    assert run(df) == run(df.repartition(9)) == run(df.coalesce(1))


def test_time_weighted_avg_negative_ts_floor_buckets(spark):
    """r06 advisory: bucketing is floor division — negative epoch
    micros land in the bucket whose START is <= ts (DuckDB `//`
    semantics), not the truncate-toward-zero bucket."""
    from oasisdb_spark.operators.timeseries import time_weighted_avg

    W = 100
    rows = [("s", -50, 8), ("s", -250, 4)]
    df = spark.createDataFrame(rows, "s STRING, ts LONG, v LONG")
    out = {r["bucket_us"]: r for r in time_weighted_avg(df, "ts", "v", ["s"], W).collect()}
    # floor(-50/100) = -1 -> bucket -100 (truncation would say 0)
    assert set(out) == {-100, -300}
    # single obs at -50 holds until bucket end 0: weight 50
    assert out[-100]["twap_den"] == 50 and out[-100]["twap_num"] == 8 * 50
    assert out[-300]["twap_den"] == 50 and out[-300]["twap_num"] == 4 * 50
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_width_us"):
        time_weighted_avg(df, "ts", "v", ["s"], 0)


# --- round-8 NULL-discipline regressions --------------------------------


def test_grouped_trend_drops_null_moment_rows(spark):
    # a NULL-y row used to be counted in n while every sum skipped it
    # (inconsistently: sx kept its x!), flipping the slope's sign
    from oasisdb_spark.operators.timeseries import grouped_trend

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, None), ("a", None, 99)],
        "s STRING, x INT, y INT",
    )
    row = grouped_trend(df, "x", "y", ["s"]).collect()[0]
    # complete pairs (1,10),(2,20): slope = 10 exactly
    assert row["n"] == 2
    assert (row["slope_num"], row["slope_den"]) == (10, 1)


def test_cross_correlation_skips_null_values(spark):
    # a NULL-value grid row must not form a pair at all (it inflated n
    # against the NULL-skipping moment sums)
    from oasisdb_spark.operators.timeseries import grid_cross_correlation

    g = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, None), ("b", 1, 5), ("b", 2, 7)],
        "s STRING, t INT, v INT",
    )
    out = {
        (r["leader"], r["follower"], r["lag"]): r
        for r in grid_cross_correlation(g, "s", "t", "v", 0).collect()
    }
    ab = out[("a", "b", 0)]
    assert ab["n"] == 1 and ab["sum_x"] == 1 and ab["sum_y"] == 5
    assert ab["cov_num"] == 0  # single pair: n*sxy - sx*sy = 5 - 5


def test_gapfill_interpolate_null_present_row_does_not_bracket(spark):
    # a present row with a NULL value poisoned every following gap's
    # interp_num (NULL y0); it now interpolates like a gap itself
    from oasisdb_spark.operators.timeseries import gapfill_interpolate

    dense = spark.createDataFrame(
        [("a", 1, 10, False), ("a", 2, None, False),
         ("a", 3, None, True), ("a", 4, 40, False)],
        "s STRING, b INT, v INT, is_gap BOOLEAN",
    )
    out = {r["b"]: r for r in
           gapfill_interpolate(dense, "b", ["s"], "v").collect()}
    # brackets are (1,10) and (4,40) for BOTH middle rows
    assert (out[2]["interp_num"], out[2]["interp_den"]) == (60, 3)  # 20
    assert (out[3]["interp_num"], out[3]["interp_den"]) == (90, 3)  # 30
    assert (out[1]["interp_num"], out[1]["interp_den"]) == (10, 1)
    assert (out[4]["interp_num"], out[4]["interp_den"]) == (40, 1)


def test_seasonal_residuals_keeps_null_slot_rows(spark):
    # groupBy forms a NULL-slot profile group but the old plain
    # equi-join could never match it -- NULL-season rows vanished
    from oasisdb_spark.operators.timeseries import seasonal_residuals

    obs = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", None, 30)],
        "s STRING, slot INT, v INT",
    )
    out = seasonal_residuals(obs, "v", ["s"], "slot").collect()
    assert len(out) == 3
    nul = [r for r in out if r["slot"] is None][0]
    # the NULL slot is its own group of one: residual 0/1
    assert (nul["resid_num"], nul["resid_den"]) == (0, 1)


def test_time_weighted_avg_skips_null_observations(spark):
    # a NULL observation used to truncate the previous value's weight
    # AND count its own weight in twap_den with no value contribution;
    # LOCF now extends the previous value through it
    from oasisdb_spark.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 50, None), ("a", 80, 20)],
        "s STRING, ts LONG, v INT",
    )
    row = time_weighted_avg(df, "ts", "v", ["s"], 100).collect()[0]
    # v=10 holds [0,80) w=80; v=20 holds [80,100) w=20
    assert (row["twap_num"], row["twap_den"]) == (1200, 100)
    assert row["n_obs"] == 2


def test_ohlc_bars_excludes_null_ts_rows(spark):
    from oasisdb_spark.operators.timeseries import ohlc_bars

    df = spark.createDataFrame(
        [("a", _ts(0), 1, 5.0), ("a", _ts(10), 2, 9.0), ("a", None, 3, 99.0)],
        "s STRING, ts TIMESTAMP, id LONG, v DOUBLE",
    )
    out = ohlc_bars(df, "ts", "v", ["s"], "hour", tie_cols=["id"]).collect()
    assert len(out) == 1  # no NULL bar
    assert out[0]["n_obs"] == 2 and out[0]["high"] == 9.0
