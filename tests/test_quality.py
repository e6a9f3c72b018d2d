"""Data-quality gates (operators/quality.py)."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.operators.quality import check_constraints, snapshot_diff


def test_check_constraints_counts_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 3.0)], "id LONG, v DOUBLE"
    )
    out = {r["constraint"]: r for r in check_constraints(
        df, {"v_pos": F.col("v") > 0, "id_small": F.col("id") <= 4}
    ).collect()}
    assert out["v_pos"]["n_rows"] == 4
    # -5.0 violates; NULL is a violation too (unknown is not a pass)
    assert out["v_pos"]["n_violations"] == 2
    assert out["v_pos"]["violation_rate"] == 0.5
    assert out["id_small"]["n_violations"] == 0


def test_check_constraints_single_scan(spark):
    df = spark.createDataFrame([(1, 2.0)], "id LONG, v DOUBLE")
    res = check_constraints(df, {f"c{i}": F.col("v") > i for i in range(10)})
    plan = res._jdf.queryExecution().executedPlan().toString()
    # one aggregate pass: a single scan of the input however many rules
    assert plan.count("Scan ExistingRDD") == 1
    assert res.count() == 10


def test_check_constraints_empty_raises(spark):
    df = spark.createDataFrame([(1,)], "id LONG")
    with pytest.raises(ValueError):
        check_constraints(df, {})


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k LONG, s STRING, v DOUBLE"
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 99.0), (4, "d", 4.0)], "k LONG, s STRING, v DOUBLE"
    )
    out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_vs_value_and_explicit_cols(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k LONG, s STRING")
    new = spark.createDataFrame([(1, "x"), (2, "x")], "k LONG, s STRING")
    out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "changed", 2: "unchanged"}
    # restricting compare_cols to nothing shared -> everything unchanged
    old2 = old.withColumn("extra", F.lit(1))
    new2 = new.withColumn("extra", F.lit(1))
    out2 = {r["k"]: r["status"]
            for r in snapshot_diff(old2, new2, ["k"], compare_cols=["extra"]).collect()}
    assert out2 == {1: "unchanged", 2: "unchanged"}


def test_check_constraints_arbitrary_rule_names(spark):
    df = spark.createDataFrame([(1, 2.0)], "id LONG, v DOUBLE")
    out = {r["constraint"]: r["n_violations"] for r in check_constraints(
        df, {"v > 0 (sanity.check)": F.col("v") > 0, "weird `name`": F.col("id") < 0}
    ).collect()}
    assert out == {"v > 0 (sanity.check)": 0, "weird `name`": 1}


def test_check_constraints_empty_table_reports_zero(spark):
    """ADVICE r04: SUM over zero rows is NULL — an empty snapshot must
    report 0 violations / rate 0.0 so `n_violations == 0` gates pass."""
    df = spark.createDataFrame([], "id LONG, v DOUBLE")
    out = {r["constraint"]: r for r in check_constraints(
        df, {"v_pos": F.col("v") > 0}).collect()}
    assert out["v_pos"]["n_rows"] == 0
    assert out["v_pos"]["n_violations"] == 0
    assert out["v_pos"]["violation_rate"] == 0.0


def test_snapshot_diff_separator_adversarial(spark):
    """ADVICE r04 / VERDICT r04 #4: values containing the old \\x1f
    separator (or equal to the old \\x00 NULL marker) must not alias
    row fingerprints."""
    # old row ("a\x1fb", "c") vs new row ("a", "b\x1fc"): same naive
    # concat_ws bytes, genuinely different rows -> must be 'changed'
    old = spark.createDataFrame([(1, "a\x1fb", "c"), (2, "\x00", "z")],
                                "k LONG, s1 STRING, s2 STRING")
    new = spark.createDataFrame([(1, "a", "b\x1fc"), (2, None, "z")],
                                "k LONG, s1 STRING, s2 STRING")
    out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=2: literal "\x00" string vs real NULL must also differ
    assert out == {1: "changed", 2: "changed"}


def test_psi_drift_identical_halves_near_zero(spark, sf_dir):
    from oasisdb_spark.operators.quality import psi_drift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = psi_drift(
        ev.where(F.col("event_id") % 2 == 0),
        ev.where(F.col("event_id") % 2 == 1),
        "value",
        n_buckets=10,
    ).collect()
    assert len(out) == 10
    total = sum(r["psi_contrib_micro"] for r in out)
    assert 0 <= total < 100_000  # same distribution: PSI well under 0.1


def test_psi_drift_detects_shift(spark, sf_dir):
    from oasisdb_spark.operators.quality import psi_drift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.where(F.col("event_id") % 2 == 0)
    shifted = ev.where(F.col("event_id") % 2 == 1).withColumn(
        "value", F.col("value") * 2 + 10
    )
    total = sum(
        r["psi_contrib_micro"]
        for r in psi_drift(base, shifted, "value", n_buckets=10).collect()
    )
    assert total > 250_000  # PSI > 0.25: strong shift


def test_psi_drift_matches_python(spark):
    """Per-bucket contribs equal the documented integer recurrence."""
    import math

    from oasisdb_spark.operators.quality import psi_drift

    base_rows = [(i, float(i % 7)) for i in range(100)]
    cur_rows = [(i, float((i % 5) + 1)) for i in range(80)]
    b = spark.createDataFrame(base_rows, "id LONG, value DOUBLE")
    c = spark.createDataFrame(cur_rows, "id LONG, value DOUBLE")
    n = 4
    got = {
        r["bucket"]: (r["base_cnt"], r["cur_cnt"], r["psi_contrib_micro"])
        for r in psi_drift(b, c, "value", n_buckets=n).collect()
    }
    mn = min(v for _, v in base_rows)
    mx = max(v for _, v in base_rows)

    def bucket(v):
        return min(n - 1, max(0, int(math.floor((v - mn) * n / (mx - mn)))))

    bc = [0] * n
    cc = [0] * n
    for _, v in base_rows:
        bc[bucket(v)] += 1
    for _, v in cur_rows:
        cc[bucket(v)] += 1
    A1 = sum(bc) + n
    B1 = sum(cc) + n

    def lmic(x):
        return int(round(math.log(float(x)) * 1e6))

    for i in range(n):
        a1, b1 = bc[i] + 1, cc[i] + 1
        contrib = ((a1 * B1 - b1 * A1) * (lmic(a1 * B1) - lmic(b1 * A1))) // (A1 * B1)
        assert got[i] == (bc[i], cc[i], contrib), i


def test_psi_drift_constant_baseline_and_params(spark):
    from oasisdb_spark.operators.quality import psi_drift

    b = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id LONG, value DOUBLE")
    c = spark.createDataFrame([(1, 5.0)], "id LONG, value DOUBLE")
    out = psi_drift(b, c, "value", n_buckets=3).collect()
    # constant baseline: everything lands in bucket 0
    got = {r["bucket"]: (r["base_cnt"], r["cur_cnt"]) for r in out}
    assert got[0] == (2, 1) and got[1] == (0, 0) and got[2] == (0, 0)
    with pytest.raises(ValueError):
        psi_drift(b, c, "value", n_buckets=1)


def test_psi_drift_stream_matches_batch(spark, sf_dir, tmp_path):
    """Additive bucket counts through 3 forced micro-batches must give
    the identical PSI table to batch psi_drift."""
    import glob
    import os
    import shutil
    import time

    from oasisdb_spark.operators.quality import psi_drift, psi_drift_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.where(F.col("event_id") % 2 == 0)
    cur = ev.where(F.col("event_id") % 2 == 1).select("event_id", "value")
    d = tmp_path / "chunks"
    d.mkdir()
    now = time.time()
    for i in range(3):
        tmp = str(tmp_path / f"_w{i}")
        cur.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        dst = str(d / f"chunk_{i}.parquet")
        shutil.copyfile(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (now - (3 - i) * 10, now - (3 - i) * 10))
    stream = (
        spark.readStream.schema("event_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    got = sorted(map(tuple, psi_drift_stream(base, stream, "value", 10).collect()))
    want = sorted(
        map(tuple, psi_drift(base, ev.where(F.col("event_id") % 2 == 1), "value", 10).collect())
    )
    assert got == want


# --- grouped_median_exact / mad_outliers ---------------------------------


def _py_lower_median(xs):
    s = sorted(xs)
    return s[(len(s) + 1) // 2 - 1]


def test_grouped_median_exact_matches_python(spark):
    from oasisdb_spark.operators.quality import grouped_median_exact

    groups = {
        "odd": [5, 1, 9, 3, 7],
        "even": [4, 2, 8, 6],          # lower median = 4, not 5.0
        "dupes": [2, 2, 2, 9, 9],
        "single": [42],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    out = {r["g"]: r["median"] for r in
           grouped_median_exact(df, "v", ["g"]).collect()}
    assert out == {g: _py_lower_median(vs) for g, vs in groups.items()}


def test_mad_outliers_matches_python_and_is_partition_invariant(spark):
    from oasisdb_spark.operators.quality import mad_outliers

    vals = [10, 11, 12, 10, 11, 12, 13, 9, 500, -480]
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    rows += [(100 + i, "b", v) for i, v in enumerate([5, 5, 5, 5])]  # mad 0
    df = spark.createDataFrame(rows, "id LONG, g STRING, v LONG")

    med = _py_lower_median(vals)
    mad = _py_lower_median([abs(v - med) for v in vals])
    want = {i for i, v in enumerate(vals) if abs(v - med) > 3 * mad}
    assert want  # the 500 / -480 rows must actually flag

    def run(d):
        return {r["id"] for r in mad_outliers(d, "v", ["g"]).collect()}

    assert run(df) == want                      # zero-MAD group: equal
    assert run(df.repartition(7)) == want       # values never flag (dev=0)


def test_mad_outliers_zero_mad_group_flags_any_deviation(spark):
    from oasisdb_spark.operators.quality import mad_outliers

    # constant group + one deviant: MAD = 0, so ANY nonzero deviation
    # flags — the documented strictness of the integer gate
    rows = [(i, "c", 7) for i in range(9)] + [(99, "c", 8)]
    df = spark.createDataFrame(rows, "id LONG, g STRING, v LONG")
    out = mad_outliers(df, "v", ["g"]).collect()
    assert [r["id"] for r in out] == [99]
    assert out[0]["median"] == 7 and out[0]["mad"] == 0 and out[0]["dev"] == 1


# ----------------------------------------------------------- rolling z


def _rolling_z_brute(vals, w, k_num, k_den, min_obs):
    out = []
    for i, y in enumerate(vals):
        win = vals[max(0, i - w): i]
        n = len(win)
        s, q = sum(win), sum(v * v for v in win)
        dev_n = y * n - s
        var_n = n * q - s * s
        if n < min_obs:
            up = dn = None
        else:
            exceeded = dev_n * dev_n * k_den**2 > k_num**2 * var_n
            up, dn = exceeded and dev_n > 0, exceeded and dev_n < 0
        out.append((n, dev_n, var_n, up, dn))
    return out


def test_rolling_zscore_matches_brute_and_flags_spike(spark):
    from oasisdb_spark.operators.quality import rolling_zscore_flags

    # the dip sits 6 rows after the spike so its trailing window is
    # clean (a dip right after a spike is MASKED by the inflated sigma
    # - the classic z-gate failure mode mad_outliers exists to fix)
    vals = [100, 102, 98, 101, 99, 100, 300, 100, 101, 99, 100, 100, 20]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "s STRING, i LONG, y LONG")
    out = rolling_zscore_flags(
        df, "y", ["s"], ["i"], window_rows=5, k_num=3, k_den=1
    )
    got = {
        r["i"]: (r["n_win"], r["dev_n"], r["var_n"], r["anomaly_up"], r["anomaly_dn"])
        for r in out.collect()
    }
    want = _rolling_z_brute(vals, 5, 3, 1, 2)
    assert [got[i] for i in range(len(vals))] == want
    assert got[6][3] is True and got[12][4] is True  # spike up, dip down
    assert got[0][3] is None                          # warm-up emitted as NULL
    assert not any(got[i][3] or got[i][4] for i in (1, 2, 3, 4, 5, 9))
    # the spike MASKS anything in its shadow: i=9's window contains 300


def test_rolling_zscore_constant_window_and_rational_k(spark):
    from oasisdb_spark.operators.quality import rolling_zscore_flags

    # constant baseline: ANY deviation is infinite z -> must flag
    rows = [("c", i, 50) for i in range(6)] + [("c", 6, 51)]
    df = spark.createDataFrame(rows, "s STRING, i LONG, y LONG")
    out = {r["i"]: r for r in rolling_zscore_flags(
        df, "y", ["s"], ["i"], window_rows=4, k_num=3).collect()}
    assert out[6]["anomaly_up"] is True and out[5]["anomaly_up"] is False
    # rational k = 5/2 tightens vs k = 3 on a borderline point
    vals = [10, 12, 8, 11, 9, 14]  # z = 2.83: between 5/2 and 3
    df2 = spark.createDataFrame(
        [("r", i, v) for i, v in enumerate(vals)], "s STRING, i LONG, y LONG"
    )
    loose = rolling_zscore_flags(df2, "y", ["s"], ["i"], 5, k_num=3).collect()
    tight = rolling_zscore_flags(df2, "y", ["s"], ["i"], 5, k_num=5, k_den=2).collect()
    l6 = [r for r in loose if r["i"] == 5][0]
    t6 = [r for r in tight if r["i"] == 5][0]
    assert (l6["anomaly_up"], t6["anomaly_up"]) == (False, True)


def test_rolling_zscore_partitioning_invariant(spark):
    import random

    from oasisdb_spark.operators.quality import rolling_zscore_flags

    rng = random.Random(31)
    rows = [
        (s, i, rng.randrange(0, 200))
        for s in ("a", "b") for i in range(80)
    ]
    df = spark.createDataFrame(rows, "s STRING, i LONG, y LONG")

    def run(d):
        return sorted(
            tuple(r)
            for r in rolling_zscore_flags(d, "y", ["s"], ["i"], 10).collect()
        )

    assert run(df) == run(df.repartition(11)) == run(df.coalesce(1))


# ------------------------------------------------------------ chi-square


def test_chi2_matches_scipy_style_reference(spark):
    import random

    from oasisdb_spark.operators.quality import chi2_independence

    rng = random.Random(43)
    # dependent-ish data: b correlates with a
    rows = [
        (a, (a + rng.randrange(3)) % 4)
        for a in (rng.randrange(3) for _ in range(2000))
    ]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    out = chi2_independence(df, "a", "b").collect()

    from collections import Counter

    obs = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    # python 128-bit-free exact replay (ints are unbounded in python)
    want = {
        (a, b): (o * n - ra[a] * cb[b]) ** 2 * 1_000_000
        // (n * ra[a] * cb[b])
        for (a, b), o in obs.items()
    }
    got = {(r["a"], r["b"]): r["chi2_contrib_micro"] for r in out}
    assert got == want
    # total agrees with the float chi2 formula to the floor precision
    total = sum(got.values()) / 1e6
    float_chi2 = sum(
        (o - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for (a, b), o in obs.items()
    )
    assert abs(total - float_chi2) < 1e-3
    # dependence must be detected: chi2 >> df at (3-1)(4-1)=6 dof
    assert total > 100
    # marginals exact
    r0 = [r for r in out if r["a"] == 0][0]
    assert r0["row_tot"] == ra[0] and r0["n_total"] == n


def test_chi2_independent_data_small_and_invariance(spark):
    from pyspark.sql import functions as F

    from oasisdb_spark.operators.quality import chi2_independence

    # perfectly independent uniform grid: every contrib is exactly 0
    rows = [(a, b) for a in range(3) for b in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    out = chi2_independence(df, "a", "b").collect()
    assert all(r["chi2_contrib_micro"] == 0 for r in out)
    assert len(out) == 12

    def run(d):
        return sorted(tuple(r) for r in chi2_independence(d, "a", "b").collect())

    assert run(df.repartition(7)) == run(df.orderBy(F.rand(9)).coalesce(1))


# ------------------------------------------------------------ benford


def test_goodness_of_fit_matches_bigint_replay_and_edges(spark):
    import random

    from oasisdb_spark.operators.quality import BENFORD_MICRO, goodness_of_fit

    rng = random.Random(59)
    # Benford-ish sample: leading digits of exponentially spread values
    digits = [int(str(int(10 ** (rng.random() * 6) + 1))[0]) for _ in range(3000)]
    df = spark.createDataFrame([(d,) for d in digits], "d LONG")
    out = {r["category"]: r for r in goodness_of_fit(df, "d", BENFORD_MICRO).collect()}
    from collections import Counter

    cnt = Counter(digits)
    n = len(digits)
    for d in range(1, 10):
        o, p = cnt.get(d, 0), BENFORD_MICRO[d]
        want = (o * 10**6 - n * p) ** 2 // (n * p)
        r = out[d]
        assert (r["observed"], r["n_total"], r["chi2_contrib_micro"]) == (o, n, want)
    # float chi2 agreement at floor precision
    total = sum(r["chi2_contrib_micro"] for r in out.values()) / 1e6
    fchi = sum(
        (cnt.get(d, 0) - n * p / 1e6) ** 2 / (n * p / 1e6)
        for d, p in BENFORD_MICRO.items()
    )
    assert abs(total - fchi) < 1e-2
    # a Benford-conforming sample passes a generous gate (chi2 << 100)
    assert total < 50


def test_goodness_of_fit_unexpected_and_missing_categories(spark):
    import pytest

    from oasisdb_spark.operators.quality import goodness_of_fit

    df = spark.createDataFrame([("a",)] * 9 + [("x",)], "c STRING")
    exp = {"a": 500_000, "b": 500_000}
    out = {r["category"]: r for r in goodness_of_fit(df, "c", exp).collect()}
    # missing expected category still contributes (O=0 -> n*p term)
    assert out["b"]["observed"] == 0 and out["b"]["chi2_contrib_micro"] > 0
    # observed-but-unexpected category surfaces with NULL contrib
    assert out["x"]["p_micro"] is None and out["x"]["chi2_contrib_micro"] is None
    # n_total counts EVERY observation including unexpected ones
    assert out["a"]["n_total"] == 10
    with pytest.raises(ValueError, match="sum"):
        goodness_of_fit(df, "c", {"a": 1})


# ------------------------------------------------------------ repeats


def test_rapid_repeats_flags_and_evidence(spark):
    from oasisdb_spark.operators.quality import rapid_repeats

    rows = [
        (1, 500, 100, 10), (1, 500, 103, 11),   # same key 3s apart: flag
        (1, 500, 500, 12),                      # same key much later: no
        (2, 500, 100, 20),                      # different user: never
        (3, 700, 100, 30), (3, 700, 100, 31),   # equal ts: flags (id tie)
    ]
    df = spark.createDataFrame(rows, "u LONG, amt LONG, ts LONG, id LONG")
    out = {r["id"]: r for r in rapid_repeats(
        df, ["u", "amt"], "ts", "id", within=10).collect()}
    assert out[11]["is_rapid_repeat"] is True and out[11]["prev_id"] == 10
    assert out[11]["gap"] == 3
    assert out[12]["is_rapid_repeat"] is False and out[12]["gap"] == 397
    assert out[10]["is_rapid_repeat"] is None  # first occurrence: no flag
    assert out[20]["is_rapid_repeat"] is None
    assert out[31]["is_rapid_repeat"] is True and out[31]["gap"] == 0
    # partitioning invariance
    a = sorted(tuple(r) for r in rapid_repeats(df, ["u", "amt"], "ts", "id", 10).collect())
    b = sorted(tuple(r) for r in rapid_repeats(
        df.repartition(5), ["u", "amt"], "ts", "id", 10).collect())
    assert a == b


def test_psi_from_counts_high_drift_millions_no_overflow(spark):
    """r06 advisory: the contrib numerator ~ N²·1e⁷ overflowed int64 at
    ~2M fully-drifted rows per snapshot; the DECIMAL(38,0) products
    must now match Python's unbounded integers exactly."""
    import math

    from oasisdb_spark.operators.quality import _psi_from_counts

    n = 10
    # fully drifted: all baseline mass in bucket 0, all current in 9
    rows = [(0, 2_000_000, 0), (9, 0, 2_000_000)] + [
        (i, 0, 0) for i in range(1, 9)
    ]
    counts = spark.createDataFrame(rows, "bucket INT, base_cnt LONG, cur_cnt LONG")
    got = {
        r["bucket"]: r["psi_contrib_micro"]
        for r in _psi_from_counts(counts, n).collect()
    }
    A1 = 2_000_000 + n
    B1 = 2_000_000 + n

    def lmic(x):
        return int(round(math.log(float(x)) * 1e6))

    for b, bc, cc in rows:
        a1, b1 = bc + 1, cc + 1
        want = ((a1 * B1 - b1 * A1) * (lmic(a1 * B1) - lmic(b1 * A1))) // (A1 * B1)
        assert got[b] == want, b
    # sanity: strong drift actually alarms
    assert sum(got.values()) > 250_000


def test_psi_drift_empty_baseline_raises_loudly(spark):
    """r06 advisory: an all-NULL baseline must raise, not silently
    score the current side against a NULL range."""
    from pyspark.sql import functions as F  # noqa: F811

    from oasisdb_spark.operators.quality import psi_drift

    b = spark.createDataFrame(
        [(1, None), (2, None)], "id LONG, value DOUBLE"
    )
    c = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id LONG, value DOUBLE")
    with pytest.raises(Exception, match="no non-NULL"):
        psi_drift(b, c, "value", n_buckets=4).collect()


def test_psi_drift_stream_empty_baseline_valueerror(spark):
    """The streaming twin must fail BEFORE starting the stream."""
    from oasisdb_spark.operators.quality import psi_drift_stream

    b = spark.createDataFrame([(1, None)], "id LONG, value DOUBLE")
    with pytest.raises(ValueError, match="no non-NULL"):
        psi_drift_stream(b, b, "value", n_buckets=4)


# --- round-8 NULL/empty-input regressions ---------------------------------


def test_grouped_median_ignores_null_values(spark):
    # NULL histogram buckets sorted FIRST in the cumulative window and
    # shifted every rank: median of {NULL, NULL, 1, 2, 3} came back 1
    from oasisdb_spark.operators.quality import grouped_median_exact

    df = spark.createDataFrame(
        [("g", None), ("g", None), ("g", 1), ("g", 2), ("g", 3)],
        "k STRING, v INT",
    )
    assert grouped_median_exact(df, "v", ["k"]).collect()[0]["median"] == 2


def test_mad_outliers_with_null_values(spark):
    from oasisdb_spark.operators.quality import mad_outliers

    df = spark.createDataFrame(
        [("g", None), ("g", 10), ("g", 11), ("g", 12), ("g", 13),
         ("g", 14), ("g", 1000)],
        "k STRING, v INT",
    )
    flagged = mad_outliers(df, "v", ["k"]).collect()
    assert [r["v"] for r in flagged] == [1000]


def test_goodness_of_fit_empty_table_null_contribs(spark):
    from oasisdb_spark.operators.quality import BENFORD_MICRO, goodness_of_fit

    e = spark.createDataFrame([], "d INT")
    rows = goodness_of_fit(e, "d", BENFORD_MICRO).collect()
    assert len(rows) == 9
    assert all(r["observed"] == 0 and r["n_total"] == 0 for r in rows)
    assert all(r["chi2_contrib_micro"] is None for r in rows)
