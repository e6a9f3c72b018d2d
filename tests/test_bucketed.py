"""Bucketed tables: co-bucketed joins and aggregations run shuffle-free."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.sources.bucketed import read_bucketed, write_bucketed


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    from oasisdb_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    write_bucketed(load_table(spark, sf, "orders"), "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        load_table(spark, sf, "lineitem"), "b_lineitem", "l_orderkey", n_buckets=8
    )
    # the fixture tables are tiny, so the planner would broadcast and
    # never consult the bucketing; at real scale both sides exceed the
    # broadcast threshold and SMJ is the natural choice — force it here
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "b_orders", "b_lineitem"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_is_shuffle_free(spark, bucketed_pair):
    ot, lt = bucketed_pair
    orders, li = read_bucketed(spark, ot), read_bucketed(spark, lt)
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_extendedprice"
    )
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan and "Exchange" not in plan
    # and it computes the same rows as the unbucketed join
    from oasisdb_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    want = (
        load_table(spark, sf, "orders")
        .join(
            load_table(spark, sf, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == want


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_pair):
    _, lt = bucketed_pair
    li = read_bucketed(spark, lt)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange" not in plan_of(agg)
