"""Kaplan-Meier estimation (operators/survival.py) vs a python
reference (the lifelines textbook example semantics)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from oasisdb_spark.operators.survival import kaplan_meier


def _km_brute(obs):
    """obs: list of (duration, event). Returns {t: (n, d, c, logS_micro)}."""
    lmic = lambda x: round(math.log(x) * 1e6)
    times = sorted({t for t, e in obs if e == 1})
    out = {}
    cum = 0
    for t in times:
        n = sum(1 for (u, _) in obs if u >= t)
        d = sum(1 for (u, e) in obs if u == t and e == 1)
        c = sum(1 for (u, e) in obs if u == t and e == 0)
        if n == d:  # terminal zero survival: the operator emits NULL
            out[t] = (n, d, c, None)
            continue
        cum += lmic(n - d) - lmic(n)
        out[t] = (n, d, c, cum)
    return out


def test_km_matches_brute_and_censoring_semantics(spark):
    obs = [
        (5, 1), (5, 1), (5, 0),       # 2 events + 1 censored at t=5
        (8, 0), (10, 1), (12, 0),
        (12, 1), (15, 1), (20, 0),
    ]
    df = spark.createDataFrame(obs, "dur LONG, ev LONG")
    got = {r["t"]: (r["n_risk"], r["d"], r["c"], r["surv_log_micro"])
           for r in kaplan_meier(df, "dur", "ev").collect()}
    assert got == _km_brute(obs)
    # censored-at-t subjects count as at-risk at t (9 at risk at t=5)
    assert got[5][0] == 9
    # censoring-only times (8, 20) are not emitted
    assert 8 not in got and 20 not in got
    # survival is monotone non-increasing in log space
    ts = sorted(got)
    assert all(got[a][3] >= got[b][3] for a, b in zip(ts, ts[1:]))
    # the float curve matches exp(micro-log) to quantization precision
    surv = 1.0
    for t in ts:
        n, d, _, lg = got[t]
        surv *= (n - d) / n
        assert abs(math.exp(lg / 1e6) - surv) < 1e-4


def test_km_dropping_censored_is_biased_and_invariance(spark):
    rng = random.Random(73)
    obs = [(rng.randrange(1, 50), rng.randrange(2)) for _ in range(300)]
    df = spark.createDataFrame(obs, "dur LONG, ev LONG")
    got = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert got.keys() == _km_brute(obs).keys()
    for t, r in got.items():
        n, d, c, lg = _km_brute(obs)[t]
        assert (r["n_risk"], r["d"], r["c"], r["surv_log_micro"]) == (n, d, c, lg)

    def run(d):
        return sorted(tuple(r) for r in kaplan_meier(d, "dur", "ev").collect())

    assert run(df) == run(df.repartition(7)) == run(df.coalesce(1))


def test_km_terminal_zero_survival_emits_null(spark):
    # everyone converts; the last event time kills all remaining
    # subjects -> S = 0 exactly -> NULL log (documented encoding)
    obs = [(5, 1), (5, 1), (9, 1), (9, 1)]
    df = spark.createDataFrame(obs, "dur LONG, ev LONG")
    got = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert got[9]["surv_log_micro"] is None and got[9]["n_risk"] == got[9]["d"] == 2
    # the earlier step is unaffected: S(5) = 1/2
    assert got[5]["surv_log_micro"] == round(math.log(2) * 1e6) * -1


def test_km_grouped_curves_are_independent(spark):
    obs = [
        ("A", 5, 1), ("A", 5, 0), ("A", 9, 1),
        ("B", 3, 1), ("B", 7, 0), ("B", 7, 1), ("B", 7, 1),
    ]
    df = spark.createDataFrame(obs, "g STRING, dur LONG, ev LONG")
    got = {
        (r["g"], r["t"]): (r["n_risk"], r["d"], r["c"], r["surv_log_micro"])
        for r in kaplan_meier(df, "dur", "ev", group_cols=["g"]).collect()
    }
    for grp in ("A", "B"):
        sub = [(d, e) for (g, d, e) in obs if g == grp]
        want = _km_brute(sub)
        for t, v in want.items():
            assert got[(grp, t)] == v, (grp, t)
    # the grouped run never mixes cohorts: B's t=3 has 4 at risk, not 7
    assert got[("B", 3)][0] == 4


def test_km_drops_null_duration_and_event_rows(spark):
    """NULL durations must not enter the ladder: before the r08 fix a
    t=NULL row sorted FIRST in the ascending cumulative window (Spark
    asc = nulls first) and shifted every later surv_log_micro."""
    clean = [(5, 1), (8, 0), (10, 1), (15, 1)]
    noisy = clean + [(None, 1), (None, 0), (7, None)]
    df_c = spark.createDataFrame(clean, "dur LONG, ev LONG")
    df_n = spark.createDataFrame(noisy, "dur LONG, ev LONG")
    want = {r["t"]: tuple(r) for r in kaplan_meier(df_c, "dur", "ev").collect()}
    got = {r["t"]: tuple(r) for r in kaplan_meier(df_n, "dur", "ev").collect()}
    assert got == want
    assert None not in got
