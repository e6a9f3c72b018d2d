"""Tests for operators/evalmetrics.py (in-engine retrieval evaluation)."""

import pytest

from oasisdb_spark.operators.evalmetrics import pair_retrieval_metrics, recall_at_k


@pytest.fixture(scope="module")
def ranked(spark):
    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "query_id BIGINT, id BIGINT, rank INT",
    )
    results = spark.createDataFrame(
        # q1: got 2 of top-3 right (plus a junk id); q2: nothing returned
        [(1, 10, 1), (1, 99, 2), (1, 12, 3), (1, 11, 4)],
        "query_id BIGINT, id BIGINT, rank INT",
    )
    return results, truth


def test_recall_at_k(ranked):
    results, truth = ranked
    out = {r["query_id"]: r for r in recall_at_k(results, truth, k=3).collect()}
    assert out[1]["n_hits"] == 2
    assert out[1]["recall"] == pytest.approx(2 / 3, abs=1e-6)
    # query 2 missing from results entirely -> recall 0, still a row
    assert out[2]["n_hits"] == 0 and out[2]["recall"] == 0.0
    # rank > k rows ignored: id 11 at rank 4 did not count for q1


def test_recall_at_k_full(ranked):
    results, truth = ranked
    out = {r["query_id"]: r for r in recall_at_k(truth, truth, k=3).collect()}
    assert all(r["recall"] == 1.0 for r in out.values())


def test_pair_metrics_orientation_and_dedup(spark):
    truth = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a BIGINT, doc_b BIGINT"
    )
    # candidates: one reversed pair, one duplicate, one false positive
    cand = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (7, 8)], "doc_a BIGINT, doc_b BIGINT"
    )
    r = pair_retrieval_metrics(cand, truth).collect()[0]
    assert (r["n_truth"], r["n_candidates"], r["n_hits"]) == (3, 3, 2)
    assert r["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["precision"] == pytest.approx(2 / 3, abs=1e-6)


def test_pair_metrics_empty_candidates(spark):
    truth = spark.createDataFrame([(1, 2)], "doc_a BIGINT, doc_b BIGINT")
    empty = truth.filter("doc_a < 0")
    r = pair_retrieval_metrics(empty, truth).collect()[0]
    assert (r["n_truth"], r["n_candidates"], r["n_hits"]) == (1, 0, 0)
    assert r["recall"] == 0.0 and r["precision"] is None


def test_rank_eval_at_k_hand_computed(spark):
    from oasisdb_spark.operators.evalmetrics import DISCOUNT_MICRO, rank_eval_at_k

    # truth q0: ids 1,2,3 at ranks 1..3; results hit 2@1, 3@3, miss 1
    truth = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 7, 1)],
        "query_id LONG, id LONG, rank INT",
    )
    results = spark.createDataFrame(
        [(0, 2, 1), (0, 9, 2), (0, 3, 3), (1, 8, 1)],
        "query_id LONG, id LONG, rank INT",
    )
    out = {r["query_id"]: r for r in rank_eval_at_k(results, truth, k=3).collect()}
    d = DISCOUNT_MICRO
    # q0: hits at result ranks 1 and 3
    assert out[0]["n_hits"] == 2
    assert out[0]["recall"] == round(2 / 3, 6)
    assert out[0]["first_rank"] == 1 and out[0]["rr"] == 1.0
    assert out[0]["dcg_micro"] == d[0] + d[2]
    assert out[0]["ndcg"] == round((d[0] + d[2]) / (d[0] + d[1] + d[2]), 6)
    # q1: no hits
    assert out[1]["n_hits"] == 0 and out[1]["rr"] == 0.0 and out[1]["ndcg"] == 0.0
    assert out[1]["first_rank"] == 0 and out[1]["dcg_micro"] == 0


# ------------------------------------------------------------ kappa


def test_cohen_kappa_matches_sklearn_formula_and_edges(spark):
    from fractions import Fraction

    from pyspark.sql import functions as F

    from oasisdb_spark.operators.evalmetrics import cohen_kappa

    pairs = [("x", "x")] * 40 + [("x", "y")] * 10 + [("y", "y")] * 30 + \
            [("y", "x")] * 5 + [("z", "z")] * 15
    df = spark.createDataFrame(pairs, "a STRING, b STRING")
    r = cohen_kappa(df, "a", "b").collect()[0]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    from collections import Counter

    ca, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    s = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert (r["n"], r["agree"], r["s_marginal"]) == (n, agree, s)
    kappa = Fraction(r["kappa_num"], r["kappa_den"])
    po, pe = Fraction(agree, n), Fraction(s, n * n)
    assert kappa == (po - pe) / (1 - pe)
    assert 0 < float(kappa) < 1
    # perfect agreement -> kappa == 1; independent-ish -> near 0
    perf = cohen_kappa(
        spark.createDataFrame([("a", "a"), ("b", "b")] * 5, "a STRING, b STRING"),
        "a", "b",
    ).collect()[0]
    assert perf["kappa_num"] == perf["kappa_den"] > 0
    # NULLs are their own category: two NULLs agree
    withnull = spark.createDataFrame(
        [("a", "a"), (None, None), ("a", None)], "a STRING, b STRING"
    )
    rn = cohen_kappa(withnull, "a", "b").collect()[0]
    assert rn["agree"] == 2
    # partitioning invariance
    r2 = cohen_kappa(df.repartition(7), "a", "b").collect()[0]
    assert tuple(r2) == tuple(r)


# --- round-8 dup/NULL-discipline regressions -----------------------------


def test_recall_at_k_dedups_duplicate_result_rows(spark):
    from oasisdb_spark.operators.evalmetrics import recall_at_k

    res = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 2), (1, 11, 3)], "query_id INT, id INT, rank INT"
    )
    tru = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id INT, id INT, rank INT"
    )
    row = recall_at_k(res, tru, 3).collect()[0]
    assert row["n_hits"] == 2  # was 3 (dup id double-counted)


def test_rank_eval_dedups_and_caps_recall(spark):
    from oasisdb_spark.operators.evalmetrics import rank_eval_at_k

    res = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 2), (1, 11, 3)], "query_id INT, id INT, rank INT"
    )
    tru = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 11, 2)], "query_id INT, id INT, rank INT"
    )
    row = rank_eval_at_k(res, tru, 3).collect()[0]
    assert row["n_hits"] == 2
    assert row["recall"] == 1.0  # was 1.5
    # dup result id keeps its best rank; dcg = disc[1] + disc[3]
    from oasisdb_spark.operators.evalmetrics import DISCOUNT_MICRO

    assert row["dcg_micro"] == DISCOUNT_MICRO[0] + DISCOUNT_MICRO[2]
    assert row["ndcg"] <= 1.0


def test_pair_metrics_drop_one_sided_null_pairs(spark):
    from oasisdb_spark.operators.evalmetrics import pair_retrieval_metrics

    cand = spark.createDataFrame(
        [(None, "b"), ("a", "b")], "doc_a STRING, doc_b STRING"
    )
    tru = spark.createDataFrame(
        [("a", "b"), ("b", "b")], "doc_a STRING, doc_b STRING"
    )
    row = pair_retrieval_metrics(cand, tru).collect()[0]
    # (NULL, b) used to collapse to a fabricated (b, b) self-pair and HIT
    assert row["n_candidates"] == 1 and row["n_hits"] == 1


def test_cohen_kappa_empty_input_zero_counts(spark):
    from oasisdb_spark.operators.evalmetrics import cohen_kappa

    df = spark.createDataFrame([], "a STRING, b STRING")
    row = cohen_kappa(df, "a", "b").collect()[0]
    assert (row["n"], row["agree"], row["s_marginal"]) == (0, 0, 0)
