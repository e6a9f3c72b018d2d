"""Pareto skyline (operators/skyline.py) vs a brute-force reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.operators.skyline import skyline


def brute(rows, dims):
    def oriented(r):
        return [r[i] if d == "min" else -r[i] for i, d in dims]

    out = []
    for r in rows:
        ro = oriented(r)
        dominated = any(
            all(qo <= po for qo, po in zip(oriented(q), ro))
            and any(qo < po for qo, po in zip(oriented(q), ro))
            for q in rows
        )
        if not dominated:
            out.append(r)
    return sorted(out)


def test_skyline_2d_matches_brute_and_keeps_duplicates(spark):
    rows = [
        (1, 10, 5), (2, 8, 7), (3, 8, 7),   # 2 and 3 are exact ties
        (4, 12, 9), (5, 7, 3), (6, 9, 9),
        (7, 7, 3),                           # tie with 5
        (8, 20, 1),
    ]
    df = spark.createDataFrame(rows, "id LONG, price LONG, size LONG")
    got = sorted(
        (r["id"], r["price"], r["size"])
        for r in skyline(df, [("price", "min"), ("size", "max")]).collect()
    )
    want = brute(
        [(i, p, s) for i, p, s in rows], [(1, "min"), (2, "max")]
    )
    assert got == want
    ids = {g[0] for g in got}
    assert {2, 3} <= ids and {5, 7} <= ids  # exact ties all survive


def test_skyline_3d_random_matches_brute_and_partitioning_invariant(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.randrange(0, 40), rng.randrange(0, 40), rng.randrange(0, 40))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id LONG, a LONG, b LONG, c LONG")
    dims = [("a", "min"), ("b", "max"), ("c", "min")]
    want = brute(rows, [(1, "min"), (2, "max"), (3, "min")])

    def run(d):
        return sorted(tuple(r) for r in skyline(d, dims).collect())

    assert run(df) == want
    assert run(df.repartition(17)) == want
    assert run(df.orderBy(F.rand(2)).coalesce(1)) == want


def test_skyline_null_dims_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 5, 5), (2, None, 9), (3, 4, None), (4, 6, 6)],
        "id LONG, a LONG, b LONG",
    )
    got = {r["id"] for r in skyline(df, [("a", "min"), ("b", "max")]).collect()}
    assert got == {1, 4}  # NULL rows dropped; 1 and 4 incomparable
    with pytest.raises(ValueError, match="direction"):
        skyline(df, [("a", "ascending")])
    with pytest.raises(ValueError, match="non-empty"):
        skyline(df, [])


def test_skyline_candidate_cap_fails_loudly(spark):
    # perfectly anti-correlated: EVERY row is in the skyline
    rows = [(i, i, 1000 - i) for i in range(500)]
    df = spark.createDataFrame(rows, "id LONG, a LONG, b LONG")
    with pytest.raises(Exception, match="max_candidates"):
        skyline(df, [("a", "min"), ("b", "min")], max_candidates=100).collect()
    # and the exact same data succeeds with an adequate cap
    out = skyline(df, [("a", "min"), ("b", "min")], max_candidates=10_000)
    assert out.count() == 500


def test_skyline_multiblock_fold_matches_brute(spark, monkeypatch):
    """Exercise the kept-set-first prune order (r07 BNL optimization)
    across MANY blocks in one partition: shrink the block size so the
    400-row fixture folds through 7 blocks with a non-empty kept set,
    including back-pruning of earlier keeps by later blocks."""
    import oasisdb_spark.operators.skyline as sky

    monkeypatch.setattr(sky, "_BLOCK", 64)
    rng = random.Random(23)
    rows = [
        (i, rng.randrange(0, 25), rng.randrange(0, 25), rng.randrange(0, 25))
        for i in range(400)
    ]
    # plant a late universal dominator so the kept set must shrink
    rows.append((400, 0, 24, 0))
    df = spark.createDataFrame(rows, "id LONG, a LONG, b LONG, c LONG")
    dims = [("a", "min"), ("b", "max"), ("c", "min")]
    want = brute(rows, [(1, "min"), (2, "max"), (3, "min")])
    got = sorted(tuple(r) for r in sky.skyline(df.coalesce(1), dims).collect())
    assert got == want
    assert (400, 0, 24, 0) in got


def test_skyline_drops_nan_dimensions(spark):
    # NaN passes isNotNull but compares FALSE with everything: a NaN row
    # could never be dominated and used to pollute the skyline
    from oasisdb_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, float("nan"), 0.5), (3, 2.0, 2.0)],
        "id INT, price DOUBLE, size DOUBLE",
    )
    rows = skyline(df, [("price", "min"), ("size", "max")]).collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == [1, 3]  # NaN row excluded; 1 and 3 are incomparable
