"""Bigram-LM perplexity scoring (pipeline/lm.py) vs a brute-force
Python reference, plus the cross-engine lmic() quantization contract."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from oasisdb_spark.pipeline.lm import bigram_lm, lm_score


def toks(t: str) -> list[str]:
    return [x for x in re.split("[^a-z0-9]+", t.lower()) if x]


def brute(texts: dict, min_count: int = 1) -> dict:
    """Reference scorer: MLE bigram LM, micro-nat quantized logs."""
    from collections import Counter

    c12, c1 = Counter(), Counter()
    for t in texts.values():
        tk = toks(t)
        for a, b in zip(tk, tk[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    lmic = lambda c: round(math.log(c) * 1e6)
    out = {}
    for d, t in texts.items():
        tk = toks(t)
        bgs = list(zip(tk, tk[1:]))
        lp, oov = 0, 0
        for p in bgs:
            if c12[p] >= min_count:
                lp += lmic(c12[p]) - lmic(c1[p[0]])
            else:
                oov += 1
        n_sc = len(bgs) - oov
        out[d] = (len(bgs), oov, lp, (lp / 1e6 / n_sc) if n_sc else 0.0)
    return out


CORPUS = {
    1: "the cat sat on the mat",
    2: "the cat sat on the hat and the cat ran",
    3: "a dog ran fast",
    4: "the dog sat",
    5: "x",  # single token: zero bigrams
}


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(k, v) for k, v in CORPUS.items()], ["doc_id", "text"])


def test_model_counts(spark, corpus_df):
    m = {r.bg: (r.c12, r.c1) for r in bigram_lm(corpus_df).collect()}
    # "the cat" occurs 3x; "the" starts 6 bigrams total
    assert m["the cat"] == (3, 6)
    assert m["cat sat"] == (2, 3)
    assert m["a dog"] == (1, 1)
    assert all(c12 <= c1 for c12, c1 in m.values())


def test_scores_match_brute(spark, corpus_df):
    model = bigram_lm(corpus_df)
    got = {r.doc_id: (r.n_bigrams, r.oov_bigrams, r.logprob_micro, r.avg_logp)
           for r in lm_score(corpus_df, model).collect()}
    want = brute(CORPUS)
    assert set(got) == set(CORPUS)  # every doc present, even the 1-token one
    for d in CORPUS:
        assert got[d][:3] == want[d][:3], d
        assert got[d][3] == pytest.approx(want[d][3])
    assert got[5] == (0, 0, 0, 0.0)


def test_min_count_prunes_to_oov(spark, corpus_df):
    model = bigram_lm(corpus_df, min_count=2)
    got = {r.doc_id: (r.n_bigrams, r.oov_bigrams, r.logprob_micro)
           for r in lm_score(corpus_df, model).collect()}
    want = brute(CORPUS, min_count=2)
    for d in CORPUS:
        assert got[d] == want[d][:3], d
    assert got[3][1] == got[3][0]  # doc 3's bigrams are all singletons -> all OOV


def test_lmic_cross_engine_over_corpus_range(spark, documents):
    """The module contract: round(ln(c)*1e6) agrees between the JVM and
    DuckDB over every count value this corpus can produce."""
    from pyspark.sql import functions as F

    model = bigram_lm(documents)
    cmax = model.agg(F.max("c1")).collect()[0][0]
    n = max(int(cmax), 1000)
    sdf = spark.range(1, n + 1).select(
        "id", F.round(F.log(F.col("id").cast("double")) * 1e6).cast("long").alias("lmic")
    )
    s = {r.id: r.lmic for r in sdf.collect()}
    d = dict(duckdb.sql(
        f"SELECT i, CAST(round(ln(CAST(i AS DOUBLE))*1000000) AS BIGINT)"
        f" FROM range(1,{n+1}) t(i)").fetchall())
    assert s == d


def test_fixture_self_score_sanity(spark, documents):
    model = bigram_lm(documents)
    scores = lm_score(documents, model)
    rows = scores.collect()
    assert len(rows) == documents.count()
    assert all(r.oov_bigrams == 0 for r in rows)  # self-scored: every bigram known
    assert all(r.logprob_micro <= 0 for r in rows)
    assert any(r.avg_logp < 0 for r in rows)


def test_perplexity_buckets(spark, documents):
    from collections import defaultdict

    from oasisdb_spark.pipeline.lm import bigram_lm, lm_score, perplexity_buckets

    scores = lm_score(documents, bigram_lm(documents))
    rows = perplexity_buckets(scores, documents, n_buckets=3).collect()
    assert len(rows) == documents.count()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    for src, rs in by_src.items():
        sizes = defaultdict(int)
        for r in rs:
            sizes[r.ppl_bucket] += 1
        assert set(sizes) <= {1, 2, 3}
        assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance
        # ordering: head (bucket 1) is at least as fluent as tail (bucket 3)
        if 1 in sizes and 3 in sizes:
            assert min(r.avg_logp for r in rs if r.ppl_bucket == 1) >= \
                   max(r.avg_logp for r in rs if r.ppl_bucket == 3)


def test_broadcast_scorer_identical_to_join(spark, documents):
    from oasisdb_spark.pipeline.lm import bigram_lm, lm_score, lm_score_broadcast

    model = bigram_lm(documents, min_count=2)  # pruning forces real OOV
    a = sorted(map(tuple, lm_score(documents, model).collect()))
    b = sorted(map(tuple, lm_score_broadcast(documents, model).collect()))
    assert a == b
    assert any(r[2] > 0 for r in a)  # OOV actually exercised


# ------------------------------------------------------- pmi collocations


def _pmi_brute(texts: list[str], min_count: int) -> dict:
    from collections import Counter

    lmic = lambda c: round(math.log(c) * 1e6)
    cu, cb = Counter(), Counter()
    for t in texts:
        tk = toks(t)
        cu.update(tk)
        cb.update(zip(tk, tk[1:]))
    n_u, n_bg = sum(cu.values()), sum(cb.values())
    return {
        f"{a} {b}": (
            k, cu[a], cu[b],
            lmic(k) + 2 * lmic(n_u) - lmic(cu[a]) - lmic(cu[b]) - lmic(n_bg),
        )
        for (a, b), k in cb.items()
        if k >= min_count
    }


def test_pmi_matches_brute_and_ranks_collocations(spark):
    from oasisdb_spark.pipeline.lm import pmi_collocations

    texts = [
        "new york is big. new york never sleeps.",
        "the city of new york and the city of angels",
        "the the the of of and a a big city",
        "angels sleep in the big city of angels",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = {
        r["bg"]: (r["c_xy"], r["c_x"], r["c_y"], r["pmi_micro"])
        for r in pmi_collocations(df, min_count=2).collect()
    }
    want = _pmi_brute(texts, min_count=2)
    assert got == want
    # the true collocation dominates the function-word pair
    assert "the city" in got  # 2 occurrences survive min_count=2
    assert got["new york"][3] > got["the city"][3]


def test_pmi_min_count_prunes_output_only(spark):
    from oasisdb_spark.pipeline.lm import pmi_collocations

    texts = ["a b a b a b", "c d"]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    all_rows = {r["bg"] for r in pmi_collocations(df, min_count=1).collect()}
    pruned = pmi_collocations(df, min_count=2)
    kept = {r["bg"]: r["pmi_micro"] for r in pruned.collect()}
    assert "c d" in all_rows and "c d" not in kept
    # denominators still count pruned bigrams: pmi equals the brute value
    # computed over the FULL corpus, not the surviving subset
    assert kept == {
        bg: v[3] for bg, v in _pmi_brute(texts, min_count=2).items()
    }


def test_pmi_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from oasisdb_spark.pipeline.lm import pmi_collocations

    texts = [f"tok{i % 7} tok{(i * 3) % 7} shared pair shared pair" for i in range(40)]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")

    def run(d):
        return sorted(
            tuple(r) for r in pmi_collocations(d, min_count=2).collect()
        )

    assert run(df) == run(df.repartition(11)) == run(df.orderBy(F.rand(5)).coalesce(1))
