"""Tests for operators/fuzzy.py (blocked Levenshtein joins)."""

import pytest

from oasisdb_spark.operators.fuzzy import fuzzy_join, fuzzy_self_join


@pytest.fixture(scope="module")
def names(spark):
    rows = [
        (1, "acme widget", "A"),
        (2, "acme widgets", "A"),   # dist 1 to id 1
        (3, "acme wídget", "A"),    # unicode substitution: dist 1 to id 1
        (4, "zenith gadget", "A"),  # far from everything
        (5, "acme widget", "B"),    # exact text but different block
    ]
    return spark.createDataFrame(rows, "id BIGINT, name STRING, brand STRING")


def test_self_join_pairs(names):
    out = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_self_join(names, "id", "name", ["brand"], max_dist=2).collect()}
    assert out[(1, 2)] == 1
    assert out[(1, 3)] == 1
    assert out[(2, 3)] == 2
    assert (1, 5) not in out  # brand block keeps them apart
    assert all(a < b for a, b in out)
    assert not any(4 in p for p in out)


def test_self_join_matches_bruteforce(spark, sf_dir):
    import duckdb

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_self_join(part, "p_partkey", "p_name", ["p_brand"], max_dist=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(
            f"""SELECT a.p_partkey, b.p_partkey, levenshtein(a.p_name, b.p_name)
            FROM '{sf_dir}/part.parquet' a JOIN '{sf_dir}/part.parquet' b
            ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 2"""
        ).fetchall()
    )
    assert got == want


def test_two_table_join(names, spark):
    probes = spark.createDataFrame(
        [(100, "acme widgett", "A"), (101, "acme widget", "B")],
        "id BIGINT, name STRING, brand STRING",
    )
    out = {(r["id_l"], r["id_r"]): r["dist"]
           for r in fuzzy_join(probes, names, "id", "id", "name", "name",
                               ["brand"], max_dist=1).collect()}
    assert out[(100, 1)] == 1
    assert out[(101, 5)] == 0
    assert (100, 5) not in out  # different block


def test_segment_equals_length_mode_with_shorts(spark):
    """Random fixture incl. strings shorter than max_dist (the
    pigeonhole-gap sliver) — both filter modes must return identical
    pairs."""
    import random

    rng = random.Random(7)
    alphabet = "abcde"
    rows = []
    for i in range(300):
        n = rng.randint(0, 12)
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n)), rng.randint(0, 2)))
    df = spark.createDataFrame(rows, "id BIGINT, name STRING, grp INT")
    for d in (1, 2, 3):
        a = sorted(map(tuple, fuzzy_self_join(df, "id", "name", ["grp"], d, "segment").collect()))
        b = sorted(map(tuple, fuzzy_self_join(df, "id", "name", ["grp"], d, "length").collect()))
        assert a == b, f"max_dist={d}"


def test_qgram_equals_length_mode(spark):
    """qgram prefix filter is exact on a mixed fixture (typos, shared
    prefixes, short strings below the gram fallback cutoff)."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(250):
        stem = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(0, 14)))
        rows.append((i, "pre_" + stem if i % 3 == 0 else stem, i % 2))
    df = spark.createDataFrame(rows, "id BIGINT, name STRING, grp INT")
    for d in (1, 2):
        a = sorted(map(tuple, fuzzy_self_join(df, "id", "name", ["grp"], d, "qgram").collect()))
        b = sorted(map(tuple, fuzzy_self_join(df, "id", "name", ["grp"], d, "length").collect()))
        assert a == b, f"max_dist={d}"


def test_qgram_matches_bruteforce_part(spark, sf_dir):
    import duckdb

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_self_join(part, "p_partkey", "p_name", ["p_brand"], 2, "qgram").collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(
            f"""SELECT a.p_partkey, b.p_partkey, levenshtein(a.p_name, b.p_name)
            FROM '{sf_dir}/part.parquet' a JOIN '{sf_dir}/part.parquet' b
            ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 2"""
        ).fetchall()
    )
    assert got == want


def test_two_table_qgram_equals_length(spark):
    import random

    rng = random.Random(3)
    mk = lambda n: [(i, "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 10))), i % 2)
                    for i in range(n)]
    left = spark.createDataFrame(mk(150), "id BIGINT, name STRING, grp INT")
    right = spark.createDataFrame(mk(150), "id BIGINT, name STRING, grp INT")
    for d in (1, 2):
        a = sorted(map(tuple, fuzzy_join(left, right, "id", "id", "name", "name",
                                         ["grp"], d, "qgram").collect()))
        b = sorted(map(tuple, fuzzy_join(left, right, "id", "id", "name", "name",
                                         ["grp"], d, "length").collect()))
        assert a == b, f"max_dist={d}"
