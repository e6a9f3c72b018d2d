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
