"""RFM segmentation (operators/segmentation.py) vs a python reference."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oasisdb_spark.operators.segmentation import rfm_segments


def _ntile(ordered_keys, n):
    """Standard SQL ntile: sizes ceil then floor, remainder first."""
    total = len(ordered_keys)
    base, rem = divmod(total, n)
    out, i = {}, 0
    for tile in range(1, n + 1):
        size = base + (1 if tile <= rem else 0)
        for k in ordered_keys[i : i + size]:
            out[k] = tile
        i += size
    return out


def _brute(rows, n=5):
    from collections import defaultdict

    last, freq, mon = {}, defaultdict(int), defaultdict(int)
    for c, d, a in rows:
        last[c] = max(last.get(c, d), d)
        freq[c] += 1
        mon[c] += a
    as_of = max(last.values())
    rec = {c: (as_of - d).days for c, d in last.items()}
    custs = sorted(last)
    r = _ntile(sorted(custs, key=lambda c: (rec[c], c)), n)
    f = _ntile(sorted(custs, key=lambda c: (-freq[c], c)), n)
    m = _ntile(sorted(custs, key=lambda c: (-mon[c], c)), n)
    return {
        c: (
            rec[c], freq[c], mon[c],
            n + 1 - r[c], n + 1 - f[c], n + 1 - m[c],
            f"{n + 1 - r[c]}{n + 1 - f[c]}{n + 1 - m[c]}",
        )
        for c in custs
    }


def test_rfm_matches_brute_and_best_customer(spark):
    import random

    rng = random.Random(41)
    rows = []
    for c in range(40):
        for _ in range(rng.randrange(1, 8)):
            rows.append(
                (c, dt.date(2024, 1, 1) + dt.timedelta(days=rng.randrange(90)),
                 rng.randrange(100, 10000))
            )
    # customer 99: most recent, most frequent, biggest spender -> "555"
    rows += [(99, dt.date(2024, 3, 31), 100000) for _ in range(20)]
    df = spark.createDataFrame(rows, "c LONG, d DATE, amt LONG")
    got = {
        r["c"]: tuple(r)[1:]
        for r in rfm_segments(df, "c", "d", "amt").collect()
    }
    assert got == _brute(rows)
    assert got[99][6] == "555"


def test_rfm_as_of_and_partitioning_invariance(spark):
    rows = [
        (1, dt.date(2024, 1, 1), 100),
        (2, dt.date(2024, 1, 10), 100),
        (3, dt.date(2024, 1, 20), 100),
    ]
    df = spark.createDataFrame(rows, "c LONG, d DATE, amt LONG")
    out = {r["c"]: r for r in rfm_segments(
        df, "c", "d", "amt", as_of="2024-02-01").collect()}
    assert out[1]["recency_days"] == 31 and out[3]["recency_days"] == 12

    def run(d):
        return sorted(tuple(r) for r in rfm_segments(d, "c", "d", "amt").collect())

    big = df.union(df.select(F.col("c") + 10, "d", "amt"))
    assert run(big.repartition(5)) == run(big.coalesce(1))


def test_rfm_null_metrics_rank_worst_not_best(spark):
    """A customer whose order timestamps are all NULL has NULL recency;
    Spark's default asc ordering puts NULLs FIRST, which before the r08
    fix handed them the BEST recency quintile. They must rank worst on
    every NULL metric instead."""
    rows = [(c, dt.date(2024, 1, 1 + c), 100 + c) for c in range(1, 10)]
    rows.append((99, None, None))  # no parseable date, no amount
    df = spark.createDataFrame(rows, "cust LONG, d DATE, amt LONG")
    out = {r["cust"]: r for r in
           rfm_segments(df, "cust", "d", "amt").collect()}
    bad = out[99]
    assert bad["recency_days"] is None and bad["monetary"] is None
    # worst tile on the NULL axes, never the best
    assert bad["r_score"] == 1 and bad["m_score"] == 1
    # every real customer keeps a valid 1..5 score
    assert all(1 <= out[c]["r_score"] <= 5 for c in range(1, 10))
