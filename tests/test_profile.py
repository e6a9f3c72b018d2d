"""Tests for operators/profile.py (one-pass table profiler)."""

import pytest

from oasisdb_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "alpha", 10.5),
        (2, "beta", None),
        (3, None, 2.0),
        (4, "beta", 7.25),
        (None, "gamma", 2.0),
    ]
    return spark.createDataFrame(rows, "id BIGINT, name STRING, score DOUBLE")


def test_profile_values(frame):
    out = {r["column"]: r for r in profile_table(frame).collect()}
    assert set(out) == {"id", "name", "score"}
    assert all(r["n_rows"] == 5 for r in out.values())

    assert out["id"]["n_nulls"] == 1
    assert out["id"]["n_distinct"] == 4
    assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "4"

    assert out["name"]["n_nulls"] == 1
    assert out["name"]["n_distinct"] == 3  # alpha, beta, gamma
    assert out["name"]["min_value"] == "alpha" and out["name"]["max_value"] == "gamma"

    assert out["score"]["n_nulls"] == 1
    assert out["score"]["n_distinct"] == 3  # 10.5, 2.0, 7.25
    # min/max taken in native type THEN stringified: numeric order, so
    # 2.0 < 7.25 < 10.5 (lexicographic would have said "10.5" < "2.0")
    assert out["score"]["min_value"] == "2.0" and out["score"]["max_value"] == "10.5"


def test_profile_column_subset_and_order(frame):
    out = profile_table(frame, columns=["score", "id"]).collect()
    assert [r["column"] for r in out] == ["score", "id"]


def test_profile_approx_mode(frame):
    out = {r["column"]: r for r in profile_table(frame, exact_distinct=False).collect()}
    # HLL++ is exact at tiny cardinalities; everything else identical
    assert out["name"]["n_distinct"] == 3
    assert out["name"]["n_nulls"] == 1


def test_profile_validation(frame):
    with pytest.raises(ValueError):
        profile_table(frame, columns=["nope"])
    with pytest.raises(ValueError):
        profile_table(frame, columns=[])


def test_profile_handles_dotted_and_case_colliding_names(spark):
    """Internal aliases are index-based: a column literally named 'a.b'
    must not be re-parsed as struct-field access, and case-only pairs
    ('V'/'v') must not collide under Spark's case-insensitive
    resolution (both broke the name-interpolated aliases)."""
    df = spark.createDataFrame(
        [(1, 2, 3), (4, None, 6)], ["`a.b`", "V", "v2"]
    ).toDF("a.b", "V", "v2")
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"a.b", "V", "v2"}
    assert out["a.b"]["n_rows"] == 2 and out["a.b"]["n_nulls"] == 0
    assert out["V"]["n_nulls"] == 1 and out["V"]["n_distinct"] == 1
    assert out["v2"]["min_value"] == "3" and out["v2"]["max_value"] == "6"
