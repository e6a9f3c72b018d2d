"""Property tests: asof_join and range_join vs DuckDB on random inputs.

Few examples (Spark jobs are ~seconds each), but each example is a full
engine-vs-engine comparison on adversarially shrunk data.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oasisdb_spark.operators import asof_join, range_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=20)

left_rows = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12)
# right side unique on (key, ts): backward as-of ties are caller-dedup'd
right_rows = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12, unique=True)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_duckdb(sp, lrows, rrows):
    left = sp.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid LONG, k LONG, ts LONG"
    )
    right = sp.createDataFrame(
        [(k, t, k * 100 + t) for (k, t) in rrows], "k LONG, ts LONG, payload LONG"
    )
    got = sorted(
        (r["lid"], r["r_payload"])
        for r in asof_join(left, right, on="k", ts_col="ts", how="left").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid BIGINT, k BIGINT, ts BIGINT)")
    con.execute("CREATE TABLE r(k BIGINT, ts BIGINT, payload BIGINT)")
    if lrows:
        con.executemany("INSERT INTO l VALUES (?,?,?)", [(i, k, t) for i, (k, t) in enumerate(lrows)])
    if rrows:
        con.executemany("INSERT INTO r VALUES (?,?,?)", [(k, t, k * 100 + t) for (k, t) in rrows])
    want = sorted(
        con.execute(
            "SELECT l.lid, r.payload FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want


POINT = st.floats(min_value=-50, max_value=50, allow_nan=False, width=32)
BOUND = st.integers(min_value=-50, max_value=50)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(POINT, min_size=0, max_size=10),
    ivs=st.lists(st.tuples(BOUND, st.integers(min_value=1, max_value=30)), min_size=0, max_size=6),
    width=st.sampled_from([1.0, 3.5, 10.0]),
)
def test_range_join_strategies_agree(sp, pts, ivs, width):
    points = sp.createDataFrame(
        [(i, float(x)) for i, x in enumerate(pts)], "pid LONG, x DOUBLE"
    )
    intervals = sp.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(ivs)],
        "iid LONG, lo DOUBLE, hi DOUBLE",
    )
    a = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi", strategy="broadcast").collect()
    )
    b = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "x", "lo", "hi", strategy="bucket", bucket_width=width
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, x in enumerate(pts)
        for j, (lo, w) in enumerate(ivs)
        if lo <= x < lo + w
    )
    assert a == want and b == want
