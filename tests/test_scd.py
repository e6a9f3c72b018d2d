"""SCD Type-2 history construction (operators/scd.py)."""

from __future__ import annotations

import pytest

from oasisdb_spark.operators.scd import scd2_history


def _hist(spark, rows):
    df = spark.createDataFrame(rows, schema="k LONG, t INT, id INT, a STRING")
    out = scd2_history(df, key_col="k", order_cols=["t", "id"], attr_col="a")
    return sorted(map(tuple, out.collect()), key=lambda t: (t[0], t[4]))


def test_consecutive_equal_collapse(spark):
    rows = [(1, 1, 1, "x"), (1, 2, 2, "x"), (1, 3, 3, "y"), (1, 4, 4, "x")]
    assert _hist(spark, rows) == [
        (1, "x", 1, 3, 1),
        (1, "y", 3, 4, 2),
        (1, "x", 4, None, 3),
    ]


def test_single_observation_is_open_version(spark):
    assert _hist(spark, [(7, 5, 1, "z")]) == [(7, "z", 5, None, 1)]


def test_null_transitions_are_null_safe(spark):
    rows = [(1, 1, 1, None), (1, 2, 2, None), (1, 3, 3, "x"), (1, 4, 4, None)]
    assert _hist(spark, rows) == [
        (1, None, 1, 3, 1),
        (1, "x", 3, 4, 2),
        (1, None, 4, None, 3),
    ]


def test_keys_independent(spark):
    rows = [(1, 1, 1, "a"), (2, 1, 2, "a"), (1, 2, 3, "b"), (2, 2, 4, "a")]
    assert _hist(spark, rows) == [
        (1, "a", 1, 2, 1),
        (1, "b", 2, None, 2),
        (2, "a", 1, None, 1),
    ]


def test_intervals_tile_each_key(spark, sf_dir):
    """Versions per key are contiguous 1..n; effective_to of version v
    equals effective_from of version v+1; only the last is open."""
    docs = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hist = scd2_history(
        docs, "o_custkey", ["o_orderdate", "o_orderkey"], "o_orderstatus"
    ).collect()
    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r["o_custkey"], []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["effective_to"] == b["effective_from"], k
            assert a["o_orderstatus"] != b["o_orderstatus"], k
        assert rs[-1]["effective_to"] is None


def test_partitioning_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/orders.parquet")
    args = ("o_custkey", ["o_orderdate", "o_orderkey"], "o_orderstatus")
    a = sorted(map(tuple, scd2_history(docs.repartition(1), *args).collect()))
    b = sorted(map(tuple, scd2_history(docs.repartition(7), *args).collect()))
    assert a == b


def test_bad_params_raise(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError):
        scd2_history(docs, "o_custkey", [], "o_orderstatus")


def test_scd2_ignores_null_order_rows(spark):
    # a NULL-ts observation sorted FIRST and opened a bogus version with
    # a NULL effective_from (DuckDB sorts NULLs last -- divergence too)
    from oasisdb_spark.operators.scd import scd2_history

    df = spark.createDataFrame(
        [(1, None, 0, "a"), (1, 10, 1, "a"), (1, 20, 2, "b")],
        "k INT, ts LONG, i INT, attr STRING",
    )
    rows = sorted(
        scd2_history(df, "k", ["ts", "i"], "attr").collect(),
        key=lambda r: r["version"],
    )
    assert len(rows) == 2
    assert rows[0]["effective_from"] == 10 and rows[0]["version"] == 1
    assert rows[1]["effective_from"] == 20 and rows[1]["effective_to"] is None
