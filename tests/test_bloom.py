"""Tests for functions/bloom.py (Bloom semi-join reduction)."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.functions.bloom import (
    bloom_prune,
    bloom_pruned_join,
    build_key_bloom,
)


@pytest.fixture(scope="module")
def keyed(spark):
    dim = spark.createDataFrame([(i,) for i in range(0, 1000, 7)], "k BIGINT")
    fact = spark.createDataFrame(
        [(i, i % 10) for i in range(1000)], "k BIGINT, v INT"
    ).repartition(4)
    return fact, dim


def test_no_false_negatives(keyed):
    fact, dim = keyed
    bloom = build_key_bloom(dim, "k", num_bits=1 << 14)
    kept = {r["k"] for r in bloom_prune(fact, "k", bloom).collect()}
    member = {i for i in range(0, 1000, 7)}
    assert member <= kept  # every true key survives


def test_prune_actually_prunes(keyed):
    fact, dim = keyed
    # generous sizing -> false-positive rate well under 50%
    bloom = build_key_bloom(dim, "k", num_bits=1 << 16)
    n = bloom_prune(fact, "k", bloom).count()
    assert n < 400  # 143 true keys + few FPs out of 1000


def test_join_result_exact(keyed):
    fact, dim = keyed
    got = sorted(
        (r["k"], r["v"])
        for r in bloom_pruned_join(fact, dim, "k", "k", num_bits=1 << 14)
        .select(dim["k"], "v").collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in fact.join(dim, on=fact["k"] == dim["k"]).select(dim["k"], "v").collect()
    )
    assert got == want


def test_empty_dim(keyed, spark):
    fact, _ = keyed
    empty = spark.createDataFrame([], "k BIGINT")
    bloom = build_key_bloom(empty, "k", num_bits=1 << 12)
    assert bloom_prune(fact, "k", bloom).count() == 0


def test_negative_keys(spark):
    dim = spark.createDataFrame([(-5,), (-1_000_000_007,)], "k BIGINT")
    fact = spark.createDataFrame(
        [(-5,), (-1_000_000_007,), (3,), (9,)], "k BIGINT"
    )
    bloom = build_key_bloom(dim, "k", num_bits=1 << 12)
    kept = {r["k"] for r in bloom_prune(fact, "k", bloom).collect()}
    assert {-5, -1_000_000_007} <= kept


def test_pruned_join_on_tpch(spark, sf_dir):
    """Bloom-pruned lineitem->filtered-orders join == plain join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = (
        bloom_pruned_join(li, orders, "l_orderkey", "o_orderkey")
        .groupBy("o_orderkey").agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    want = (
        li.join(orders, on=li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey").agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_pruned_join_rejects_outer_modes(spark):
    """Pruning the fact side breaks outer-join semantics (rows outside
    the filter must still appear NULL-extended) — only inner/semi keep
    the plain-join equivalence, so anything else must raise."""
    import pytest as _pt

    from oasisdb_spark.functions.bloom import bloom_pruned_join

    fact = spark.createDataFrame([(1,), (2,)], "k LONG")
    dim = spark.createDataFrame([(1,)], "d LONG")
    for how in ("left", "full", "right"):
        with _pt.raises(ValueError, match="semi"):
            bloom_pruned_join(fact, dim, "k", "d", how=how)
