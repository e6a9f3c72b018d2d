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


# ---------------------------------------------------- cusum / skyline


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=40),
    slack=st.integers(min_value=0, max_value=10),
    target=st.integers(min_value=-20, max_value=20),
)
def test_cusum_drawdown_identity_matches_recurrence(sp, vals, slack, target):
    """The window drawdown identity == the textbook sequential
    recurrence on arbitrary integer series (the algebraic core of both
    cusum_changepoints and cusum_stream)."""
    from pyspark.sql import functions as F

    from oasisdb_spark.operators.timeseries import cusum_changepoints

    df = sp.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)], "s STRING, i LONG, x LONG"
    )
    out = cusum_changepoints(
        df, "x", ["s"], ["i"], target=F.lit(target), slack=slack, threshold=10**9
    )
    got = [
        (r["cusum_up"], r["cusum_dn"])
        for r in sorted(out.collect(), key=lambda r: r["i"])
    ]
    up = dn = 0
    want = []
    for x in vals:
        d = x - target
        up = max(0, up + d - slack)
        dn = max(0, dn - d - slack)
        want.append((up, dn))
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_matches_bruteforce_on_random_points(sp, pts):
    """Partition-local prune + single resolve == the O(n²) definition,
    including duplicate points and heavy tie planes."""
    from oasisdb_spark.operators.skyline import skyline

    rows = [(i, a, b, c) for i, (a, b, c) in enumerate(pts)]
    df = sp.createDataFrame(rows, "id LONG, a LONG, b LONG, c LONG")
    got = sorted(
        tuple(r)
        for r in skyline(
            df.repartition(3), [("a", "min"), ("b", "max"), ("c", "min")]
        ).collect()
    )
    def dominated(p, q):  # q strictly dominates p (min a, max b, min c)
        qa = (q[1], -q[2], q[3]); pa = (p[1], -p[2], p[3])
        return all(x <= y for x, y in zip(qa, pa)) and any(
            x < y for x, y in zip(qa, pa)
        )
    want = sorted(
        p for p in rows if not any(dominated(p, q) for q in rows)
    )
    assert got == want
