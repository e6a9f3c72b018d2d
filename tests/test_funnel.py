"""Tests for operators/funnel.py (ordered funnels, cohort retention)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.operators.funnel import cohort_retention, funnel_steps

STEPS = ["view", "click", "purchase"]


def ts(day, h=0, m=0):
    return datetime(2024, 1, day, h, m)


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1 completes all three in order
        (1, ts(1, 9), "view"), (1, ts(1, 10), "click"), (1, ts(1, 11), "purchase"),
        # u2 views then clicks, never purchases
        (2, ts(2, 9), "view"), (2, ts(2, 10), "click"),
        # u3 clicks BEFORE viewing: the click can't count, stops at view
        (3, ts(3, 8), "click"), (3, ts(3, 9), "view"),
        # u4 purchase-first then view: only stage 1
        (4, ts(4, 7), "purchase"), (4, ts(4, 9), "view"),
        # u5 never emits a step event type at all (filtered out pre-shuffle)
        (5, ts(5, 9), "error"),
        # u6 same-timestamp view+click: strict ordering blocks the click
        (6, ts(6, 9), "view"), (6, ts(6, 9), "click"),
    ]
    return spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, event_type STRING")


def test_funnel_counts(funnel_events):
    out = {r["step"]: r for r in funnel_steps(funnel_events, STEPS).collect()}
    assert out[1]["n_users"] == 5  # u1,u2,u3,u4,u6 all have a view
    assert out[2]["n_users"] == 2  # u1,u2 click strictly after their view
    assert out[3]["n_users"] == 1  # only u1
    assert out[1]["step_name"] == "view"
    assert out[2]["conversion"] == pytest.approx(2 / 5, abs=1e-6)
    assert out[3]["conversion"] == pytest.approx(1 / 2, abs=1e-6)
    assert out[1]["conversion"] == pytest.approx(1.0)


def test_funnel_matches_bruteforce_on_events(spark, sf_dir):
    """Greedy fold == chained-min-subsequence semantics on real data."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = {r["step"]: r["n_users"] for r in funnel_steps(ev, STEPS).collect()}

    rows = ev.filter(F.col("event_type").isin(STEPS)).select(
        "user_id", "ts", "event_type"
    ).collect()
    by_user = {}
    by_user_rows = {}
    for r in rows:
        by_user_rows.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    for u, evs in by_user_rows.items():
        stage, last = 0, None
        for t, typ in sorted(evs):
            if stage < len(STEPS) and typ == STEPS[stage] and (last is None or t > last):
                stage, last = stage + 1, t
        by_user[u] = stage
    for k in (1, 2, 3):
        assert out[k] == sum(1 for s in by_user.values() if s >= k)


def test_cohort_retention_basic(spark):
    rows = [
        # cohort day 1: u1 active day 1 and 3; u2 only day 1
        (1, ts(1, 9)), (1, ts(1, 12)), (1, ts(3, 9)),
        (2, ts(1, 10)),
        # cohort day 2: u3 active day 2 and 3
        (3, ts(2, 9)), (3, ts(3, 11)),
    ]
    ev = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP")
    out = {(str(r["cohort"]), r["offset"]): r for r in
           cohort_retention(ev, granularity="day").collect()}
    assert out[("2024-01-01", 0)]["n_users"] == 2
    assert out[("2024-01-01", 2)]["n_users"] == 1
    assert out[("2024-01-01", 2)]["retention"] == pytest.approx(0.5)
    assert out[("2024-01-02", 0)]["n_users"] == 1
    assert out[("2024-01-02", 1)]["n_users"] == 1
    # no offset-1 cell for cohort 1 (nobody active on day 2)
    assert ("2024-01-01", 1) not in out


def test_cohort_offsets_nonnegative(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = cohort_retention(ev, granularity="week")
    bad = df.filter((F.col("offset") < 0) | (F.col("retention") > 1.0)).count()
    assert bad == 0
    # every cohort has an offset-0 row with retention exactly 1
    zero = df.filter(F.col("offset") == 0)
    assert zero.filter(F.col("retention") != 1.0).count() == 0
