"""Tests for index/text.py (persisted BM25 inverted index)."""

import math

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.index.text import (
    bm25_search_indexed,
    build_text_index,
    load_text_index,
    save_text_index,
)

DOCS = [
    (1, "spark engine spark cluster"),
    (2, "spark sql table scan"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "table table table join"),
    (5, "query planner and query optimizer rewrite the query"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id BIGINT, text STRING")
    return build_text_index(docs)


def test_build_shapes(index):
    p = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in index["postings"].collect()}
    assert p[("spark", 1)] == (2, 4)
    assert p[("spark", 2)] == (1, 4)
    assert p[("table", 4)] == (3, 4)
    df = {r["term"]: r["df"] for r in index["termdf"].collect()}
    assert df["spark"] == 2 and df["table"] == 2 and df["query"] == 1
    s = index["stats"].collect()[0]
    assert s["n_docs"] == 5
    assert s["avgdl"] == pytest.approx((4 + 4 + 9 + 4 + 8) / 5)


def test_single_query_scoring_matches_formula(index):
    out = bm25_search_indexed(index, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in out] == [1, 2]  # tf=2 beats tf=1 at same dl
    # hand-check doc 1: idf = ln((5-2+0.5)/(2+0.5)+1), tf part with dl=4, avgdl=5.8
    idf = math.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0)
    avgdl = (4 + 4 + 9 + 4 + 8) / 5
    tfpart = (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 4 / avgdl))
    assert out[0]["bm25"] == pytest.approx(round(idf * tfpart, 6), abs=1e-6)


def test_only_matching_docs_scored(index):
    out = bm25_search_indexed(index, ["table", "query"], k=10).collect()
    assert {r["doc_id"] for r in out} == {2, 4, 5}


def test_batch_queries_topk(spark, index):
    qs = spark.createDataFrame(
        [(100, ["spark"]), (200, ["table", "query"]), (300, ["absentterm"])],
        "query_id BIGINT, terms ARRAY<STRING>",
    )
    out = bm25_search_indexed(index, qs, k=2)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert [r["doc_id"] for r in sorted(by_q[100], key=lambda r: r["rank"])] == [1, 2]
    assert len(by_q[200]) == 2  # k caps the 3 matching docs
    assert 300 not in by_q  # no postings, no rows
    # batch single-query scores equal the single-query path
    single = {r["doc_id"]: r["bm25"] for r in bm25_search_indexed(index, ["spark"], k=2).collect()}
    for r in by_q[100]:
        assert r["bm25"] == single[r["doc_id"]]


def test_save_load_roundtrip(spark, index, tmp_path):
    path = str(tmp_path / "bm25idx")
    save_text_index(index, path)
    loaded = load_text_index(spark, path)
    a = sorted(map(tuple, bm25_search_indexed(index, ["spark", "table"], k=5).collect()))
    b = sorted(map(tuple, bm25_search_indexed(loaded, ["spark", "table"], k=5).collect()))
    assert a == b


def test_duplicate_query_terms_not_double_counted(spark, index):
    qs = spark.createDataFrame(
        [(1, ["spark", "spark"])], "query_id BIGINT, terms ARRAY<STRING>"
    )
    batch = {r["doc_id"]: r["bm25"] for r in bm25_search_indexed(index, qs, k=5).collect()}
    single = {r["doc_id"]: r["bm25"] for r in bm25_search_indexed(index, ["spark"], k=5).collect()}
    assert batch == single


class TestIncrementalAdd:
    def test_build_half_add_half_equals_full(self, spark, documents):
        from oasisdb_spark.index.text import add_to_text_index, bm25_search_indexed, build_text_index

        half_a = documents.filter("doc_id % 2 = 0")
        half_b = documents.filter("doc_id % 2 = 1")
        merged = add_to_text_index(build_text_index(half_a), half_b)
        full = build_text_index(documents)

        # postings and termdf are row-identical to the full build
        assert sorted(map(tuple, merged["postings"].collect())) == \
               sorted(map(tuple, full["postings"].collect()))
        assert sorted(map(tuple, merged["termdf"].collect())) == \
               sorted(map(tuple, full["termdf"].collect()))
        s_m, s_f = merged["stats"].collect()[0], full["stats"].collect()[0]
        assert s_m["n_docs"] == s_f["n_docs"]
        assert abs(s_m["avgdl"] - s_f["avgdl"]) < 1e-9

        terms = ["the", "data", "model"]
        got = [(r["doc_id"], r["bm25"]) for r in bm25_search_indexed(merged, terms, k=10).collect()]
        want = [(r["doc_id"], r["bm25"]) for r in bm25_search_indexed(full, terms, k=10).collect()]
        assert got == want

    def test_readd_replaces(self, spark):
        from oasisdb_spark.index.text import add_to_text_index, build_text_index

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma")], "doc_id BIGINT, text STRING"
        )
        idx = build_text_index(docs)
        updated = spark.createDataFrame([(1, "delta delta")], "doc_id BIGINT, text STRING")
        merged = add_to_text_index(idx, updated)
        post = {(r["term"], r["doc_id"]): r["tf"] for r in merged["postings"].collect()}
        assert ("alpha", 1) not in post          # old posting gone
        assert post[("delta", 1)] == 2           # replaced content indexed
        df = {r["term"]: r["df"] for r in merged["termdf"].collect()}
        assert df == {"beta": 1, "gamma": 1, "delta": 1}  # alpha df dropped to 0 and pruned
        assert merged["stats"].collect()[0]["n_docs"] == 2
