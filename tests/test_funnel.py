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


# ------------------------------------------------------------ attribution


def _attr_brute(rows, conv, touches, lookback):
    out = []
    for (u, ts, i, t) in rows:
        if t != conv:
            continue
        q = [
            (ts2, i2, t2)
            for (u2, ts2, i2, t2) in rows
            if u2 == u and t2 in touches and ts - lookback <= ts2 <= ts
        ]
        last = max(q) if q else None
        first = min(q) if q else None
        out.append(
            (
                u, i, ts,
                last[1] if last else None, last[2] if last else None,
                last[0] if last else None,
                first[1] if first else None, first[2] if first else None,
                first[0] if first else None,
                len(q),
            )
        )
    return sorted(out)


def test_attribution_matches_brute_and_handles_edges(spark):
    from oasisdb_spark.operators.funnel import attribute_conversions

    rows = [
        # user 1: ad -> email -> buy (both in window)
        (1, 100, 10, "ad"), (1, 150, 11, "email"), (1, 200, 12, "buy"),
        # user 1: second buy at 240 - window [140,240] keeps only email
        (1, 240, 13, "buy"),
        # user 2: touch exactly at lookback edge AND at conversion ts
        (2, 100, 20, "ad"), (2, 200, 21, "email"), (2, 200, 22, "buy"),
        # user 3: no touches at all
        (3, 500, 30, "buy"),
        # user 4: touch AFTER conversion never attributes
        (4, 100, 40, "buy"), (4, 150, 41, "ad"),
        # noise types are pruned before the window
        (1, 190, 90, "view"), (2, 199, 91, "view"),
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")
    out = attribute_conversions(
        df, "u", "ts", "id", "t",
        conversion_type="buy", touch_types=["ad", "email"], lookback=100,
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == _attr_brute(rows, "buy", {"ad", "email"}, 100)
    by_conv = {g[1]: g for g in got}
    assert by_conv[12][3:6] == (11, "email", 150)   # last touch
    assert by_conv[12][6:9] == (10, "ad", 100)      # first touch (edge incl.)
    assert by_conv[13][3] == 11 and by_conv[13][9] == 1
    assert by_conv[22][3] == 21                     # same-ts touch attributes
    assert by_conv[30][3] is None and by_conv[30][9] == 0
    assert by_conv[40][3] is None                   # later touch never counts


def test_attribution_same_ts_touch_ties_break_on_id_and_invariance(spark):
    import random

    from pyspark.sql import functions as F

    from oasisdb_spark.operators.funnel import attribute_conversions

    rng = random.Random(3)
    rows = [(1, 100, 50, "ad"), (1, 100, 51, "ad"), (1, 100, 52, "buy")]
    rows += [
        (u, rng.randrange(0, 1000), 100 + n, rng.choice(["ad", "email", "buy"]))
        for n, u in enumerate(rng.choices(range(2, 10), k=300))
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")

    def run(d):
        return sorted(
            tuple(r)
            for r in attribute_conversions(
                d, "u", "ts", "id", "t", "buy", ["ad", "email"], 200
            ).collect()
        )

    base = run(df)
    # deterministic same-ts tie: larger id wins last, smaller wins first
    conv52 = [g for g in base if g[1] == 52][0]
    assert conv52[3] == 51 and conv52[6] == 50
    assert base == _attr_brute(rows, "buy", {"ad", "email"}, 200)
    assert base == run(df.repartition(9)) == run(df.orderBy(F.rand(8)).coalesce(1))


# ------------------------------------------------------------ transitions


def test_event_transitions_matches_brute(spark):
    import math
    from collections import Counter

    from oasisdb_spark.operators.funnel import event_transitions

    rows = [
        (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "buy"),
        (1, 30, 4, "view"),          # same-ts: id orders it after buy
        (2, 5, 10, "view"), (2, 6, 11, "view"), (2, 7, 12, "click"),
        (3, 1, 20, "buy"),           # singleton user: no transitions
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")
    got = sorted(tuple(r) for r in event_transitions(df, "u", "ts", "id", "t").collect())

    cnt = Counter()
    for u in (1, 2, 3):
        seq = [t for (uu, ts, i, t) in sorted(rows, key=lambda r: (r[1], r[2])) if uu == u]
        cnt.update(zip(seq, seq[1:]))
    frm = Counter()
    for (f, _), n in cnt.items():
        frm[f] += n
    lmic = lambda c: round(math.log(c) * 1e6)
    want = sorted(
        (f, t, n, frm[f], lmic(n) - lmic(frm[f])) for (f, t), n in cnt.items()
    )
    assert got == want
    # the same-ts pair (buy -> view) must exist exactly once
    assert ("buy", "view", 1, 1, 0) in got


def test_event_transitions_partitioning_invariant(spark):
    import random

    from pyspark.sql import functions as F

    from oasisdb_spark.operators.funnel import event_transitions

    rng = random.Random(13)
    rows = [
        (rng.randrange(8), rng.randrange(100), i, rng.choice("abcd"))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")

    def run(d):
        return sorted(tuple(r) for r in event_transitions(d, "u", "ts", "id", "t").collect())

    assert run(df) == run(df.repartition(9)) == run(df.orderBy(F.rand(4)).coalesce(1))


# ------------------------------------------------------------ paths


def test_session_paths_matches_brute(spark):
    from oasisdb_spark.operators.funnel import session_paths

    rows = [
        # user 1: two sessions (gap 100 splits at ts 300)
        (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "buy"),
        (1, 300, 4, "view"), (1, 310, 5, "click"),
        # user 2: same first journey as user 1's session 1
        (2, 5, 10, "view"), (2, 15, 11, "click"), (2, 25, 12, "buy"),
        # user 3: long session truncates at max_steps=3
        (3, 0, 20, "a"), (3, 1, 21, "b"), (3, 2, 22, "c"), (3, 3, 23, "d"),
        # user 4: same-ts ordering pinned by id
        (4, 50, 31, "x"), (4, 50, 30, "y"),
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(df, "u", "ts", "id", "t", gap=100, max_steps=3).collect()
    }
    assert got == {
        "view>click>buy": 2,
        "view>click": 1,
        "a>b>c": 1,
        "y>x": 1,
    }


def test_session_paths_min_count_and_invariance(spark):
    import random

    from pyspark.sql import functions as F

    from oasisdb_spark.operators.funnel import session_paths

    rng = random.Random(37)
    rows = [
        (u, t * 10, u * 1000 + t, rng.choice("ab"))
        for u in range(30) for t in range(rng.randrange(1, 6))
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")

    def run(d, mc=1):
        return sorted(
            tuple(r)
            for r in session_paths(d, "u", "ts", "id", "t", 1000, 8, mc).collect()
        )

    base = run(df)
    assert base == run(df.repartition(7)) == run(df.orderBy(F.rand(6)).coalesce(1))
    pruned = run(df, mc=2)
    assert pruned == [t for t in base if t[1] >= 2]


# ------------------------------------------------------------ credits


def test_attribution_credits_sum_to_one_and_match_brute(spark):
    from fractions import Fraction

    from oasisdb_spark.operators.funnel import attribution_credits

    rows = [
        (1, 100, 10, "ad"), (1, 150, 11, "email"), (1, 180, 12, "ad"),
        (1, 200, 13, "buy"),                      # 3 touches: U = 40/20/40
        (2, 100, 20, "ad"), (2, 200, 21, "buy"),  # 1 touch: (1,1)
        (3, 90, 30, "ad"), (3, 100, 31, "email"), (3, 110, 32, "buy"),  # 2: (1,2)
        (4, 500, 40, "buy"),                      # 0 touches: no rows
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")
    out = attribution_credits(
        df, "u", "ts", "id", "t", "buy", ["ad", "email"], lookback=150
    ).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conversion_id"], []).append(r)
    assert set(by_conv) == {13, 21, 32}
    # conversion 13: three touches in (ts, id) order
    c13 = sorted(by_conv[13], key=lambda r: r["touch_pos"])
    assert [r["touch_id"] for r in c13] == [10, 11, 12]
    assert [(r["u_num"], r["u_den"]) for r in c13] == [(40, 100), (20, 100), (40, 100)]
    assert [(r["linear_num"], r["linear_den"]) for r in c13] == [(1, 3)] * 3
    # single- and two-touch degenerate rules
    assert [(r["u_num"], r["u_den"]) for r in by_conv[21]] == [(1, 1)]
    assert sorted((r["u_num"], r["u_den"]) for r in by_conv[32]) == [(1, 2), (1, 2)]
    # both rules sum to exactly 1 per conversion
    for rows_ in by_conv.values():
        assert sum(Fraction(r["linear_num"], r["linear_den"]) for r in rows_) == 1
        assert sum(Fraction(r["u_num"], r["u_den"]) for r in rows_) == 1


def test_attribution_credits_partitioning_invariant(spark):
    import random

    from oasisdb_spark.operators.funnel import attribution_credits

    rng = random.Random(53)
    rows = [
        (rng.randrange(12), rng.randrange(500), i, rng.choice(["ad", "email", "buy"]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "u LONG, ts LONG, id LONG, t STRING")

    def run(d):
        return sorted(
            tuple(r)
            for r in attribution_credits(
                d, "u", "ts", "id", "t", "buy", ["ad", "email"], 200
            ).collect()
        )

    assert run(df) == run(df.repartition(9)) == run(df.orderBy(F.rand(7)).coalesce(1))


# ------------------------------------------------------- windowed funnel


def _wf_brute(rows, steps, window):
    """Exhaustive chain search per user — ground truth."""
    from itertools import product

    out = {}
    users = {u for (u, _, _) in rows}
    for u in users:
        evs = sorted((t, ty) for (uu, t, ty) in rows if uu == u)
        best = 0
        for k in range(1, len(steps) + 1):
            lists = [[t for (t, ty) in evs if ty == s] for s in steps[:k]]
            found = False
            for chain in product(*lists):
                if all(b > a for a, b in zip(chain, chain[1:])) and (
                    chain[-1] - chain[0] <= window
                ):
                    found = True
                    break
            if found:
                best = k
        out[u] = best
    return out


def test_windowed_funnel_matches_brute_incl_dp_trap(spark):
    from oasisdb_spark.operators.funnel import windowed_funnel

    rows = [
        # user 1: converts fully inside the window
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        # user 2: converts, but only outside the window (stage stops at 2)
        (2, 10, "view"), (2, 20, "click"), (2, 200, "buy"),
        # user 3: THE DP TRAP - two stage-2 chains: (start 30, last 90)
        # and (start 10, last 40); buy@95 only extends the EARLIER-start
        # chain (95-10 <= 100 but 95 <= 90 fails strict > for the other?
        # no: 95 > 90 ok but 95 - 30 <= 100 ok too...) make it real:
        # chains (start 30, last 96) and (start 10, last 40), buy@95:
        # chain A's last 96 >= 95 blocks it; chain B extends (95-10<=100)
        (3, 30, "view"), (3, 96, "click"),
        (3, 10, "view"), (3, 40, "click"), (3, 95, "buy"),
        # user 4: right order, wrong window even pairwise
        (4, 0, "view"), (4, 300, "click"),
        # user 5: no step events at all -> not in the rollup base
        (5, 7, "signup"),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts LONG, event_type STRING")
    steps = ["view", "click", "buy"]
    out = {r["step"]: r["n_users"] for r in
           windowed_funnel(df, steps, window=100, ts_col="ts").collect()}
    want_stage = _wf_brute(rows, steps, 100)
    assert want_stage[3] == 3  # the trap user DOES convert
    for k, name in enumerate(steps, 1):
        assert out[k] == sum(1 for v in want_stage.values() if v >= k), name


def test_windowed_funnel_random_brute_parity_and_invariance(spark):
    import random

    from oasisdb_spark.operators.funnel import windowed_funnel

    rng = random.Random(61)
    rows = [
        (u, rng.randrange(0, 60), rng.choice(["a", "b", "c", "noise"]))
        for u in range(25) for _ in range(rng.randrange(1, 12))
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts LONG, event_type STRING")
    steps = ["a", "b", "c"]
    want_stage = _wf_brute(
        [(u, t, ty) for (u, t, ty) in rows if ty in steps], steps, 15
    )

    def run(d):
        return sorted(
            (r["step"], r["n_users"])
            for r in windowed_funnel(d, steps, window=15, ts_col="ts").collect()
        )

    base = run(df)
    assert base == [
        (k, sum(1 for v in want_stage.values() if v >= k)) for k in (1, 2, 3)
    ]
    assert base == run(df.repartition(9))


def test_null_ts_events_never_advance_funnel(spark):
    """r07 review: a NULL-timestamp event has no position in the order
    — it must not match a stage (the old fold let it match stage 1 and
    vacuously pass the strictly-after check for every later event)."""
    from oasisdb_spark.operators.funnel import funnel_steps

    rows = [(1, None, "view"), (1, "2024-01-01 08:00:00", "click")]
    df = spark.createDataFrame(rows, "user_id LONG, ts STRING, event_type STRING").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    out = {r["step"]: r["n_users"] for r in funnel_steps(df, ["view", "click"]).collect()}
    assert out == {1: 0, 2: 0}


def test_stage_rollup_empty_input_reports_zeros(spark):
    """r07 review: an empty per-user frame reports 0 users per step,
    never one row of NULL counts."""
    from oasisdb_spark.operators.funnel import funnel_steps

    df = spark.createDataFrame([], "user_id LONG, ts TIMESTAMP, event_type STRING")
    out = funnel_steps(df, ["view", "click"]).collect()
    assert [(r["step"], r["n_users"]) for r in out] == [(1, 0), (2, 0)]


def test_cohort_granularity_and_u_edge_validation(spark):
    import pytest

    from oasisdb_spark.operators.funnel import attribution_credits, cohort_retention

    df = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00", "view")], "user_id LONG, ts STRING, event_type STRING"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    with pytest.raises(ValueError, match="granularity"):
        cohort_retention(df, granularity="month")
    with pytest.raises(ValueError, match="u_edge"):
        attribution_credits(
            df, "user_id", "ts", "user_id", "event_type", "view", ["click"],
            lookback=3600, u_edge=60,
        )


# --- round-8 NULL-ts uniformity regressions --------------------------------


def test_session_paths_ignore_null_ts_rows(spark):
    # a NULL-ts row sorted FIRST and merged into the first real session
    # (ts - NULL never exceeds the gap), corrupting its path string
    from oasisdb_spark.operators.funnel import session_paths

    df = spark.createDataFrame(
        [(1, None, 1, "x"), (1, 100, 2, "a"), (1, 110, 3, "b")],
        "u INT, t LONG, i INT, e STRING",
    )
    rows = session_paths(df, "u", "t", "i", "e", gap=50).collect()
    assert len(rows) == 1 and rows[0]["path"] == "a>b"


def test_event_transitions_ignore_null_ts_rows(spark):
    from oasisdb_spark.operators.funnel import event_transitions

    df = spark.createDataFrame(
        [(1, None, 1, "x"), (1, 100, 2, "a"), (1, 110, 3, "b")],
        "u INT, t LONG, i INT, e STRING",
    )
    rows = event_transitions(df, "u", "t", "i", "e").collect()
    # only a->b; the NULL-ts 'x' used to fabricate x->a
    assert len(rows) == 1
    assert (rows[0]["from_type"], rows[0]["to_type"]) == ("a", "b")


def test_attribution_ignores_null_ts_rows(spark):
    from oasisdb_spark.operators.funnel import attribute_conversions

    df = spark.createDataFrame(
        [(1, None, 1, "click"), (1, 100, 2, "click"), (1, 150, 3, "buy")],
        "u INT, t LONG, i INT, e STRING",
    )
    rows = attribute_conversions(
        df, "u", "t", "i", "e", "buy", ["click"], lookback=100
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_touches"] == 1 and rows[0]["last_touch_id"] == 2


def test_cohort_retention_ignores_null_ts_rows(spark):
    import datetime as dt

    from oasisdb_spark.operators.funnel import cohort_retention

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (1, None), (1, dt.datetime(2024, 1, 8))],
        "user_id INT, ts TIMESTAMP",
    )
    rows = cohort_retention(df, granularity="week").collect()
    # offsets 0 and 1 only -- no NULL-offset garbage cell
    assert sorted(r["offset"] for r in rows) == [0, 1]
