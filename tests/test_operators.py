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


def test_interval_overlap_join_grid_edge_and_degenerate(spark):
    """ADVICE r04 repro: float bounds within 1e-9 above a grid line were
    silently dropped by the old epsilon grid; reversed intervals
    exploded a descending F.sequence. Both must now be exact/safe, and
    degenerate (lo >= hi) intervals match nothing under BOTH
    strategies."""
    from oasisdb_spark.operators.range_join import interval_overlap_join

    # left interval's hi sits 5e-10 above the w=10 grid line at 20.0;
    # the true overlap [20.0, 20.0000000005) lives in bucket 2, which
    # the old floor((hi-1e-9)/w) upper bound never emitted for the left
    left = spark.createDataFrame(
        [(1, 10.0, 20.0000000005),   # overlaps right 10 only in bucket 2
         (2, 5.0, 5.0),              # empty: matches nothing
         (3, 90.0, 30.0)],           # reversed: matches nothing, no blowup
        "lid LONG, a_lo DOUBLE, a_hi DOUBLE",
    )
    right = spark.createDataFrame(
        [(10, 20.0, 25.0), (11, 4.0, 6.0), (12, 30.0, 95.0)],
        "rid LONG, b_lo DOUBLE, b_hi DOUBLE",
    )

    def pairs(strategy, **kw):
        out = interval_overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi",
                                    strategy=strategy, **kw)
        return sorted((r["lid"], r["rid"]) for r in out.collect())

    assert pairs("broadcast") == [(1, 10)]
    assert pairs("bucket", bucket_width=10.0) == [(1, 10)]
    # reversed interval must not explode rows: the gridded left side is
    # 2 bucket rows for lid=1 and zero for lid=2/3
    from pyspark.sql import functions as F
    gridded = left.filter(F.col("a_lo") < F.col("a_hi")).withColumn(
        "__bkt", F.explode(F.sequence(F.floor(F.col("a_lo") / 10.0),
                                      F.floor(F.col("a_hi") / 10.0))))
    assert gridded.count() == 2


def test_range_join_bucket_grid_line_and_reversed(spark):
    """Interval bounds exactly ON grid lines stay exact without the
    epsilon, and a reversed interval neither matches nor explodes."""
    points = spark.createDataFrame(
        [(1, 10.0), (2, 19.999999999), (3, 20.0)], "pid LONG, x DOUBLE")
    bands = spark.createDataFrame(
        [("on_grid", 10.0, 20.0),     # half-open: x=20.0 excluded
         ("reversed", 900.0, 0.0)],   # degenerate: matches nothing
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    for strategy, kw in [("broadcast", {}), ("bucket", {"bucket_width": 10.0}),
                         ("bucket", {"bucket_width": 3.0})]:
        out = range_join(points, bands, "x", "lo", "hi", strategy=strategy, **kw)
        assert sorted((r["pid"], r["band"]) for r in out.collect()) == [
            (1, "on_grid"), (2, "on_grid")]


def test_connected_components_raises_when_rounds_exhausted(spark):
    """Exhausting max_iter means labels are still propagating —
    returning them would silently split a component; the distributed
    path must raise instead (the driver path needs no rounds)."""
    import pytest as _pt

    # a 12-node path graph has diameter 11 > max_iter=2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src LONG, dst LONG"
    )
    with _pt.raises(RuntimeError, match="not converged"):
        connected_components(edges, max_iter=2, driver_cutover=0)
    # with enough rounds the same graph labels to min id 0
    out = connected_components(edges, max_iter=20, driver_cutover=0)
    assert set(r["component"] for r in out.collect()) == {0}


def test_connected_components_null_endpoint_edges_excluded(spark):
    # driver path died on a None-vs-int comparison; distributed path
    # emitted a phantom (NULL, NULL) row
    from oasisdb_spark.operators.connected_components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (2, None)], "src INT, dst INT"
    )
    rows = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert rows == {1: 1, 2: 1}
