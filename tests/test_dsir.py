"""DSIR importance resampling (pipeline/dsir.py): brute-force parity,
determinism, edge cases."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.dsir import (
    dsir_model,
    dsir_score,
    dsir_select,
    hashed_ngram_buckets,
)

B = 64  # small bucket count so collisions actually occur in tests


def _buckets_py(text: str, n_buckets: int) -> list[int]:
    toks = [x for x in re.split("[^a-z0-9]+", (text or "").lower()) if x]
    grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    out = []
    for g in grams:
        h60 = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
        out.append(h60 % n_buckets)
    return out


def _lmic_py(c: int) -> int:
    return int(math.floor(math.log(float(c)) * 1e6 + 0.5))


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran"), (3, "cat cat cat")],
        "doc_id LONG, text STRING",
    )
    raw = spark.createDataFrame(
        [
            (10, "the dog sat on the log"),
            (11, "the cat sat on the mat"),
            (12, "stocks fell sharply today"),
            (13, "cat pictures of a cat"),
            (14, ""),
            (15, None),
        ],
        "doc_id LONG, text STRING",
    )
    return target, raw


def test_buckets_match_python_reference(spark, corpora):
    _, raw = corpora
    got = {
        r["doc_id"]: list(r["b"])
        for r in raw.select("doc_id", hashed_ngram_buckets("text", B).alias("b")).collect()
    }
    for r in raw.collect():
        assert got[r["doc_id"]] == _buckets_py(r["text"], B), r["doc_id"]


def test_scores_match_brute_force(spark, corpora):
    target, raw = corpora
    model, const = dsir_model(target, raw, n_buckets=B)
    got = {r["doc_id"]: r for r in dsir_score(raw, model, const, n_buckets=B).collect()}

    # brute force in python with the same Laplace micro-nat arithmetic
    from collections import Counter

    tc = Counter(b for r in target.collect() for b in _buckets_py(r["text"], B))
    rc = Counter(b for r in raw.collect() for b in _buckets_py(r["text"], B))
    T, R = sum(tc.values()), sum(rc.values())
    const_py = _lmic_py(R + B) - _lmic_py(T + B)
    assert const == const_py
    for r in raw.collect():
        bs = _buckets_py(r["text"], B)
        want = sum(_lmic_py(tc[b] + 1) - _lmic_py(rc[b] + 1) for b in bs) + len(bs) * const_py
        assert got[r["doc_id"]]["weight_micro"] == want, r["doc_id"]
        assert got[r["doc_id"]]["n_feats"] == len(bs)


def test_target_lookalike_outranks_offdomain(spark, corpora):
    target, raw = corpora
    model, const = dsir_model(target, raw, n_buckets=B)
    sel = {r["doc_id"]: r["sel_rank"] for r in dsir_select(raw, model, const, k=4, n_buckets=B).collect()}
    # doc 11 is literally a target document; doc 12 shares no tokens
    assert sel[11] == 1
    assert 12 not in sel or sel[12] > sel[11]


def test_empty_text_scores_zero_and_survives(spark, corpora):
    target, raw = corpora
    model, const = dsir_model(target, raw, n_buckets=B)
    got = {r["doc_id"]: r for r in dsir_score(raw, model, const, n_buckets=B).collect()}
    for empty_id in (14, 15):
        assert got[empty_id]["n_feats"] == 0
        assert got[empty_id]["weight_micro"] == 0


def test_score_is_partitioning_invariant(spark, corpora):
    target, raw = corpora
    model, const = dsir_model(target, raw, n_buckets=B)
    a = sorted(map(tuple, dsir_score(raw.repartition(1), model, const, n_buckets=B).collect()))
    b = sorted(map(tuple, dsir_score(raw.repartition(7), model, const, n_buckets=B).collect()))
    assert a == b


def test_broadcast_scorer_row_identical_to_batch(spark, corpora):
    from oasisdb_spark.pipeline.dsir import dsir_score_broadcast

    target, raw = corpora
    model, const = dsir_model(target, raw, n_buckets=B)
    a = sorted(map(tuple, dsir_score(raw, model, const, n_buckets=B).collect()))
    b = sorted(map(tuple, dsir_score_broadcast(raw, model, const, n_buckets=B).collect()))
    assert a == b


def test_select_scorers_identical(spark, corpora):
    from oasisdb_spark.pipeline.dsir import dsir_select

    target, raw = corpora
    model, const = dsir_model(target, raw, n_buckets=B)
    a = sorted(map(tuple, dsir_select(raw, model, const, k=4, n_buckets=B,
                                      scorer="broadcast").collect()))
    b = sorted(map(tuple, dsir_select(raw, model, const, k=4, n_buckets=B,
                                      scorer="join").collect()))
    assert a == b
