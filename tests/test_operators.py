"""connected_components and range_join operator semantics."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.operators import connected_components, range_join


@pytest.mark.parametrize("cutover", [1_000_000, 0])  # driver path / distributed path
def test_cc_basic(spark, cutover):
    # two components: {1,2,3,4} (chain) and {10,11}; 7 isolated via self-pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (7, 7)], "src LONG, dst LONG"
    )
    out = {
        r["id"]: r["component"]
        for r in connected_components(edges, driver_cutover=cutover).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 7: 7}


def test_cc_long_chain_converges(spark):
    # worst-case diameter for the DISTRIBUTED loop: a 12-vertex path
    n = 12
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "src LONG, dst LONG")
    out = connected_components(edges, driver_cutover=0)
    assert out.filter(F.col("component") == 0).count() == n + 1


@pytest.mark.parametrize("cutover", [1_000_000, 0])
def test_cc_matches_duckdb_closure(spark, cutover):
    import duckdb

    rows = [(1, 5), (5, 9), (2, 3), (3, 2), (8, 9)]
    edges = spark.createDataFrame(rows, "src LONG, dst LONG")
    got = sorted(
        (r["id"], r["component"])
        for r in connected_components(edges, driver_cutover=cutover).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH RECURSIVE p(a, b) AS (VALUES {",".join(map(str, rows))}),
            edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
            reach AS (
              SELECT DISTINCT a AS id, a AS r FROM edges
              UNION
              SELECT re.id, e.b FROM reach re JOIN edges e ON e.a = re.r
            )
            SELECT id, min(r) FROM reach GROUP BY id
            """
        ).fetchall()
    )
    assert got == want


@pytest.fixture(scope="module")
def bands(spark):
    return spark.createDataFrame(
        [("low", 0.0, 10.0), ("midA", 10.0, 20.0), ("midB", 10.0, 20.0), ("high", 20.0, 30.0)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 19.999), (5, 29.999), (6, 30.0), (7, 55.0)],
        "pid LONG, x DOUBLE",
    )


def expected_pairs():
    # half-open [lo, hi): x=10 joins mid bands not low; x=30 matches nothing
    return sorted(
        [(1, "low"), (2, "low"), (3, "midA"), (3, "midB"),
         (4, "midA"), (4, "midB"), (5, "high")]
    )


def test_range_join_broadcast(points, bands):
    out = range_join(points, bands, "x", "lo", "hi", strategy="broadcast")
    assert sorted((r["pid"], r["band"]) for r in out.collect()) == expected_pairs()


@pytest.mark.parametrize("width", [1.0, 7.0, 10.0, 100.0])
def test_range_join_bucket_matches_broadcast(points, bands, width):
    out = range_join(points, bands, "x", "lo", "hi", strategy="bucket", bucket_width=width)
    assert sorted((r["pid"], r["band"]) for r in out.collect()) == expected_pairs()


def test_range_join_left_keeps_unmatched(points, bands):
    out = range_join(points, bands, "x", "lo", "hi", how="left", strategy="bucket", bucket_width=10.0)
    rows = sorted((r["pid"], r["band"]) for r in out.collect())
    assert rows == sorted(expected_pairs() + [(6, None), (7, None)])


def test_interval_overlap_join_bucket_equals_broadcast(spark):
    from pyspark.sql import functions as F

    from oasisdb_spark.operators.range_join import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 95, 210), (3, 500, 501), (4, 210, 220)],
        "lid LONG, a_lo LONG, a_hi LONG",
    )
    right = spark.createDataFrame(
        [(10, 90, 130), (11, 200, 300), (12, 490, 505), (13, 100, 101)],
        "rid LONG, b_lo LONG, b_hi LONG",
    )
    def pairs(strategy, **kw):
        out = interval_overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi",
                                    strategy=strategy, **kw)
        return sorted((r["lid"], r["rid"]) for r in out.collect())

    exact = pairs("broadcast")
    # (1,10) overlap; (2,10) overlap; (2,11) overlap at 200..210;
    # (3,12); (4,11); (2,13) [100..101 vs 95..210]; 1-13? a_hi=100 not > 100 -> no
    assert exact == [(1, 10), (2, 10), (2, 11), (2, 13), (3, 12), (4, 11)]
    # bucket strategy: same pairs, ONCE each, across widths that make
    # intervals span multiple buckets
    for w in (7, 50, 1000):
        assert pairs("bucket", bucket_width=w) == exact
