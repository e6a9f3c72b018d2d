"""Salted join / distinct-count must be result-identical to the plain ops."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.operators import salted_distinct_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 1 is hot (500 rows), keys 2..10 have one row each; key 99 unmatched
    rows = [(1, i) for i in range(500)] + [(k, k * 1000) for k in range(2, 11)] + [(99, 0)]
    left = spark.createDataFrame(rows, "k LONG, payload LONG")
    right = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 11)], "k LONG, name STRING")
    return left, right


def test_salted_join_matches_plain_inner(skewed):
    left, right = skewed
    plain = sorted(map(tuple, left.join(right, "k").select("k", "payload", "name").collect()))
    salted = sorted(
        map(tuple, salted_join(left, right, on="k", n_salts=8).select("k", "payload", "name").collect())
    )
    assert salted == plain and len(salted) == 509


def test_salted_join_matches_plain_left(skewed):
    left, right = skewed
    plain = sorted(
        map(tuple, left.join(right, "k", "left").select("k", "payload", "name").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(left, right, on="k", n_salts=4, how="left")
            .select("k", "payload", "name")
            .collect(),
        )
    )
    assert salted == plain  # unmatched key 99 survives exactly once with null


def test_salted_join_spreads_hot_key(skewed):
    left, right = skewed
    out = salted_join(left, right, on="k", n_salts=8, salt_source="payload")
    # the hot key's 500 rows must use >1 salt bucket internally: verify by
    # recomputing the salt expression the operator uses
    salts = (
        left.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64(F.col("payload")), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert salts > 1 and out.count() == 509


def test_salted_distinct_count_exact(spark):
    rows = [("a", v) for v in [1, 1, 2, 3, 3, 3]] + [("b", v) for v in range(100)]
    df = spark.createDataFrame(rows, "k STRING, v LONG")
    got = {r["k"]: r["n_distinct"] for r in salted_distinct_count(df, "k", "v").collect()}
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want == {"a": 3, "b": 100}


def test_salted_join_rejects_right_and_full_outer(skewed):
    left, right = skewed
    import pytest as _pt
    for how in ("right", "full", "full_outer"):
        with _pt.raises(ValueError, match="inner|left"):
            salted_join(left, right, on="k", how=how)


def test_salted_distinct_count_ignores_nulls_like_count_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, None), (2, None), (3, "x"), (3, "y")],
        "k LONG, v STRING",
    )
    got = {r["k"]: r["n_distinct"]
           for r in salted_distinct_count(df, "k", "v").collect()}
    want = {r["k"]: r["n"] for r in
            df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
            if r["n"] > 0}
    assert got == want  # k=1 -> 1 (NULL excluded), k=2 absent, k=3 -> 2
