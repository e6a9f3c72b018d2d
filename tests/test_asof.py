"""asof_join operator: backward inclusive semantics (DuckDB ASOF parity)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.operators import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:05"), 100.0),
            (2, "A", _ts("2024-01-01T10:00:10"), 101.0),
            (3, "B", _ts("2024-01-01T10:00:03"), 50.0),
            (4, "C", _ts("2024-01-01T10:00:01"), 7.0),  # no quote ever
        ],
        "trade_id LONG, sym STRING, ts TIMESTAMP, price DOUBLE",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 99.0),
            ("A", _ts("2024-01-01T10:00:05"), 100.5),  # equal-ts: inclusive
            ("A", _ts("2024-01-01T10:00:07"), 100.9),
            ("B", _ts("2024-01-01T10:00:04"), 49.0),   # after B's only trade
        ],
        "sym STRING, ts TIMESTAMP, bid DOUBLE",
    )
    return trades, quotes


def test_inner_backward_inclusive(frames):
    trades, quotes = frames
    out = {r["trade_id"]: r for r in asof_join(trades, quotes, on="sym").collect()}
    # trade 1 at :05 takes the :05 quote (inclusive), not :00
    assert out[1]["r_bid"] == 100.5
    # trade 2 at :10 takes the latest prior quote (:07)
    assert out[2]["r_bid"] == 100.9
    # B's quote is after its trade; C has none -> dropped under inner
    assert set(out) == {1, 2}
    # left payload columns survive
    assert out[1]["price"] == 100.0


def test_left_keeps_unmatched(frames):
    trades, quotes = frames
    out = {r["trade_id"]: r for r in asof_join(trades, quotes, on="sym", how="left").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[3]["r_bid"] is None and out[4]["r_ts"] is None


def test_matches_duckdb_asof(frames):
    import duckdb

    trades, quotes = frames
    tp, qp = trades.toPandas(), quotes.toPandas()
    con = duckdb.connect()
    con.register("t", tp)
    con.register("q", qp)
    expect = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            "SELECT t.trade_id, q.bid, q.ts FROM t ASOF JOIN q"
            " ON t.sym = q.sym AND t.ts >= q.ts"
        ).fetchall()
    }
    got = {
        r["trade_id"]: (r["r_bid"], r["r_ts"])
        for r in asof_join(trades, quotes, on="sym").collect()
    }
    assert got == expect


def test_bad_how_rejected(frames):
    trades, quotes = frames
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", how="outer")


def test_asof_match_is_row_consistent_with_null_fields(spark):
    """All attached columns must come from THE matched right row: the
    old per-column LOCF filled a NULL field of the matched row from an
    older right row, silently mixing fields across rows."""
    left = spark.createDataFrame([(1, 6), (1, 2)], "k LONG, ts LONG")
    right = spark.createDataFrame(
        [(1, 1, 7, "a"), (1, 5, None, "b")], "k LONG, ts LONG, x LONG, tag STRING"
    )
    out = {r["ts"]: r for r in
           asof_join(left, right, on="k", ts_col="ts").collect()}
    # ts=6 matches the ts=5 right row ENTIRELY: x must be its NULL,
    # not the ts=1 row's 7
    assert out[6]["r_ts"] == 5 and out[6]["r_tag"] == "b"
    assert out[6]["r_x"] is None
    assert out[2]["r_ts"] == 1 and out[2]["r_x"] == 7


def test_asof_null_ts_right_rows_never_match(spark):
    """A right row with NULL ts is unordered — it must not sort first
    and leak payload into early left rows."""
    left = spark.createDataFrame([(1, 3)], "k LONG, ts LONG")
    right = spark.createDataFrame(
        [(1, None, 99), (1, 10, 1)], "k LONG, ts LONG, x LONG"
    )
    inner = asof_join(left, right, on="k", ts_col="ts").collect()
    assert inner == []  # only right row before ts=3 has NULL ts
    lft = asof_join(left, right, on="k", ts_col="ts", how="left").collect()
    assert len(lft) == 1 and lft[0]["r_x"] is None and lft[0]["r_ts"] is None
