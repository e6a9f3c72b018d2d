"""Hybrid RRF fusion: rank math, tie-breaks, and signal dominance."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.functions.fusion import hybrid_search_rrf


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry", [0.0, 0.0]),
            (2, "apple banana", [1.0, 0.0]),
            (3, "unrelated words here", [0.1, 0.0]),
            (4, "apple", [5.0, 5.0]),
        ],
        "doc_id LONG, text STRING, vector ARRAY<FLOAT>",
    )
    queries = spark.createDataFrame(
        [(0, [0.0, 0.0], ["apple", "banana", "cherry"])],
        "query_id LONG, query_vec ARRAY<FLOAT>, query_terms ARRAY<STRING>",
    )
    return docs, queries


def test_rrf_ranks_and_scores(corpus):
    docs, queries = corpus
    out = {r["doc_id"]: r for r in hybrid_search_rrf(docs, queries, k=4).collect()}
    # doc 1: best text (3 hits) AND best vector (dist 0) -> rank 1 overall
    assert out[1]["text_rank"] == 1 and out[1]["vec_rank"] == 1 and out[1]["rank"] == 1
    # doc 3: zero term hits -> worst text rank
    assert out[3]["text_rank"] == 4
    # rrf score equals the closed form of its two ranks
    r = out[2]
    assert r["rrf_score"] == round(1.0 / (60 + r["text_rank"]) + 1.0 / (60 + r["vec_rank"]), 8)
    # all 4 docs returned, ranks are 1..4 exactly once
    assert sorted(v["rank"] for v in out.values()) == [1, 2, 3, 4]


def test_k_truncates(corpus):
    docs, queries = corpus
    assert hybrid_search_rrf(docs, queries, k=2).count() == 2


def test_text_ties_break_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(i, "same text", [float(i), 0.0]) for i in (7, 3, 5)],
        "doc_id LONG, text STRING, vector ARRAY<FLOAT>",
    )
    queries = spark.createDataFrame(
        [(0, [0.0, 0.0], ["same"])],
        "query_id LONG, query_vec ARRAY<FLOAT>, query_terms ARRAY<STRING>",
    )
    out = {r["doc_id"]: r["text_rank"] for r in hybrid_search_rrf(docs, queries).collect()}
    assert out == {3: 1, 5: 2, 7: 3}


def test_rrf_fuse_union_semantics(spark):
    from oasisdb_spark.functions.fusion import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id LONG, doc_id LONG, rank INT"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id LONG, doc_id LONG, rank INT"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    # doc 11 appears in both lists -> sum of both contributions
    assert out[11]["rrf_score"] == round(1 / 62 + 1 / 61, 8)
    # doc 10 only in a, doc 13 only in b
    assert out[10]["rrf_score"] == round(1 / 61, 8)
    assert out[13]["rrf_score"] == round(1 / 62, 8)
    # fused order: 11 (two hits) first, then 10 (rank1), 13 (rank2), 12
    ordered = sorted(out.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in ordered] == [11, 10, 13, 12]


def test_rrf_fuse_validation(spark):
    import pytest as _pytest

    from oasisdb_spark.functions.fusion import rrf_fuse

    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_null_vector_doc_ranks_last_not_first(spark):
    # NULL vector -> NULL distance; plain asc sorted NULLs FIRST, so a
    # vectorless doc used to top every vector ranking
    docs = spark.createDataFrame(
        [
            (1, "apple", [0.0, 0.0]),
            (2, "banana", None),
            (3, "cherry", [1.0, 0.0]),
        ],
        "doc_id LONG, text STRING, vector ARRAY<FLOAT>",
    )
    queries = spark.createDataFrame(
        [(0, [0.0, 0.0], ["zzz"])],
        "query_id LONG, query_vec ARRAY<FLOAT>, query_terms ARRAY<STRING>",
    )
    out = {r["doc_id"]: r for r in hybrid_search_rrf(docs, queries, k=3).collect()}
    assert out[2]["vec_rank"] == 3  # was 1
    assert out[1]["vec_rank"] == 1 and out[3]["vec_rank"] == 2
