"""Tests for pipeline/sampling.py (quality prune, token-budget sample,
sliding chunks)."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.sampling import (
    quality_prune,
    sliding_chunks,
    token_budget_sample,
)

GOOD = (
    "this is a reasonably long document with plenty of common english "
    "words so that the quality heuristics see stopwords and letters "
    "and no digit noise at all in the body of the text here"
)
BAD = "000 111 222 333!!!???"


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(10):
        rows.append((i, GOOD + f" tail{i}", "en", "srcA"))
    for i in range(10, 14):
        rows.append((i, BAD, "en", "srcA"))
    for i in range(20, 26):
        rows.append((i, GOOD + f" other{i}", "fr", "srcB"))
    rows.append((30, "", "de", "srcC"))
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING, source STRING")


def test_quality_prune_keeps_best_per_group(docs):
    out = quality_prune(docs, keep_frac=0.5, group_col="source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # srcA: 14 docs -> ceil(0.5*14)=7 kept, all from the GOOD block
    a = by_src["srcA"]
    assert len(a) == 7
    assert all(r["doc_id"] < 10 for r in a)
    # ranks are 1..7, deterministic by (quality desc, doc_id)
    assert sorted(r["q_rank"] for r in a) == list(range(1, 8))
    assert [r["doc_id"] for r in sorted(a, key=lambda r: r["q_rank"])] == list(range(7))
    # srcB: 6 -> 3; srcC: single (empty) doc still yields its 1 survivor
    assert len(by_src["srcB"]) == 3
    assert len(by_src["srcC"]) == 1


def test_quality_prune_frac_bounds(docs):
    with pytest.raises(ValueError):
        quality_prune(docs, keep_frac=0.0)
    all_kept = quality_prune(docs, keep_frac=1.0).count()
    assert all_kept == docs.count()


def test_token_budget_sample_budget_respected(docs):
    out = token_budget_sample(docs, budget=100, group_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        top = max(r["cum_tokens"] for r in rows)
        n_tok = {r["doc_id"]: r["n_tokens"] for r in rows}
        # every row within budget, except possibly the forced first row
        over = [r for r in rows if r["cum_tokens"] > 100]
        assert len(over) <= 1
        if over:
            assert over[0]["cum_tokens"] == over[0]["n_tokens"]  # it IS the first row
        assert top <= 100 or len(rows) == 1
    # de's only doc is empty (0 tokens) but the first row is always taken
    assert len(by_lang["de"]) == 1 and by_lang["de"][0]["n_tokens"] == 0


def test_token_budget_sample_deterministic_and_order_free(docs):
    a = sorted(map(tuple, token_budget_sample(docs, 120).collect()))
    b = sorted(map(tuple, token_budget_sample(docs.orderBy(F.rand(7)), 120).collect()))
    assert a == b


def test_token_budget_sample_dict_drops_absent_groups(docs):
    out = token_budget_sample(docs, budget={"en": 50, "fr": 10_000}, group_col="lang")
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en", "fr"}
    fr = out.filter(F.col("lang") == "fr").count()
    assert fr == 6  # generous budget takes every fr doc


def test_sliding_chunks_spans(spark):
    text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, "")], "doc_id BIGINT, text STRING"
    )
    out = sliding_chunks(docs, chunk_len=64, stride=48)
    rows = {r["doc_id"]: [] for r in out.collect()}
    for r in out.collect():
        rows[r["doc_id"]].append(r)
    # doc 1: 100 tokens -> ceil((100-64)/48)+1 = 2 chunks [0,64) [48,100)
    c1 = sorted(rows[1], key=lambda r: r["chunk_idx"])
    assert [(r["start_tok"], r["end_tok"]) for r in c1] == [(0, 64), (48, 100)]
    assert c1[0]["chunk_text"].split(" ")[0] == "w0"
    assert c1[1]["chunk_text"].split(" ")[0] == "w48"
    assert c1[1]["chunk_tokens"] == 52
    # doc 2: one short chunk; doc 3 (empty): no rows
    assert [(r["start_tok"], r["end_tok"]) for r in rows[2]] == [(0, 3)]
    assert 3 not in rows


def test_sliding_chunks_exact_fit(spark):
    docs = spark.createDataFrame(
        [(1, " ".join("x" for _ in range(64)))], "doc_id BIGINT, text STRING"
    )
    out = sliding_chunks(docs, chunk_len=64, stride=48).collect()
    assert len(out) == 1 and out[0]["chunk_tokens"] == 64


def test_sliding_chunks_coverage_property(spark):
    # every token position is covered by at least one chunk
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate([1, 39, 40, 41, 95, 130])],
        "doc_id BIGINT, text STRING",
    )
    for r in sliding_chunks(docs, chunk_len=40, stride=30).groupBy("doc_id").agg(
        F.max("end_tok").alias("maxe"), F.min("start_tok").alias("mins"),
        F.count("*").alias("n_chunks"),
    ).collect():
        assert r["mins"] == 0
    # and the last chunk ends exactly at n_tokens
    got = {
        r["doc_id"]: r["maxe"]
        for r in sliding_chunks(docs, chunk_len=40, stride=30)
        .groupBy("doc_id").agg(F.max("end_tok").alias("maxe")).collect()
    }
    assert got == {0: 1, 1: 39, 2: 40, 3: 41, 4: 95, 5: 130}


def test_sliding_chunks_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError):
        sliding_chunks(docs, chunk_len=0)
    with pytest.raises(ValueError):
        sliding_chunks(docs, stride=-1)


class TestWeightedSample:
    def test_deterministic_and_sized(self, spark, documents):
        from oasisdb_spark.pipeline.sampling import weighted_sample

        a = weighted_sample(documents, "n_chars", 20)
        b = weighted_sample(documents.repartition(7), "n_chars", 20)
        ra = sorted(r["doc_id"] for r in a.collect())
        rb = sorted(r["doc_id"] for r in b.collect())
        assert len(ra) == 20
        assert ra == rb  # storage-order / partitioning independent

    def test_matches_bruteforce_keys(self, spark, documents):
        import math

        from oasisdb_spark.pipeline.sampling import weighted_sample

        rows = documents.select("doc_id", "n_chars").collect()
        import hashlib

        def key(doc_id, w):
            h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
            return math.log((h + 1) / 2**60) / w

        want = sorted(
            (r["doc_id"] for r in rows if r["n_chars"] > 0),
            key=lambda d: -key(d, next(r["n_chars"] for r in rows if r["doc_id"] == d)),
        )[:15]
        got = [r["doc_id"] for r in weighted_sample(documents, "n_chars", 15).collect()]
        assert sorted(got) == sorted(want)

    def test_zero_weight_excluded(self, spark):
        from oasisdb_spark.pipeline.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 10), (2, 0), (3, -5), (4, 3)], "doc_id BIGINT, w BIGINT"
        )
        got = {r["doc_id"] for r in weighted_sample(df, "w", 10).collect()}
        assert got == {1, 4}

    def test_stratified_by_group(self, spark, documents):
        from oasisdb_spark.pipeline.sampling import weighted_sample

        out = weighted_sample(documents, "n_chars", 5, group_cols=["lang"])
        rows = out.collect()
        from collections import Counter

        per = Counter(r["lang"] for r in rows)
        langs = {r["lang"] for r in documents.collect()}
        assert set(per) == langs
        assert all(c == min(5, sum(1 for r in documents.collect() if r["lang"] == g and r["n_chars"] > 0)) for g, c in per.items())
        # stratified draw agrees with running the global sampler per group
        for g in list(langs)[:2]:
            solo = weighted_sample(documents.filter(F.col("lang") == g), "n_chars", 5)
            assert {r["doc_id"] for r in solo.collect()} == {r["doc_id"] for r in rows if r["lang"] == g}


def test_leakage_safe_split_clusters_share_split(spark):
    from pyspark.sql import functions as F

    from oasisdb_spark.pipeline.sampling import leakage_safe_split

    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    # clusters: {0,1,2} -> 0 and {10,11} -> 10
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)], "doc_id LONG, component LONG"
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, clusters).collect()}
    assert len(out) == 1000
    # every cluster member shares the component's split and group key
    assert {out[i]["split"] for i in (0, 1, 2)} == {out[0]["split"]}
    assert {out[i]["group_key"] for i in (0, 1, 2)} == {0}
    assert out[10]["split"] == out[11]["split"] and out[10]["group_key"] == 10
    assert out[0]["is_clustered"] and not out[500]["is_clustered"]
    # an unclustered doc's split matches the plain md5 rule (growth-stable)
    import hashlib
    b = hashlib.md5(b"500").hexdigest()[:4]
    exp = "train" if b < "cccd" else ("val" if b < "e666" else "test")
    assert out[500]["split"] == exp
    # proportions roughly 80/10/10 over 1000 group keys
    from collections import Counter
    c = Counter(r["split"] for r in out.values())
    assert 700 < c["train"] < 900 and c["val"] < 200 and c["test"] < 200


# ---- fim_split ----

def _h60_py(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_fim_split_matches_python_reference(spark):
    from oasisdb_spark.pipeline.sampling import fim_split

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "tiny"),                       # below min_chars: passthrough
        (3, "x" * 20),                     # exactly min_chars
        (4, None),                         # NULL text: passthrough
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in fim_split(df, min_chars=20).collect()}
    for doc_id, text in rows:
        r = got[doc_id]
        if text is None or len(text) < 20:
            assert r["prefix"] == text and r["middle"] == "" and r["suffix"] == ""
            continue
        L = len(text)
        max_mid = max(int(L * 0.5), 1)
        mid_len = _h60_py(f"{doc_id}fim-len") % max_mid + 1
        start = _h60_py(f"{doc_id}fim-pos") % (L - mid_len) + 1
        assert r["prefix"] == text[: start - 1]
        assert r["middle"] == text[start - 1 : start - 1 + mid_len]
        assert r["suffix"] == text[start - 1 + mid_len :]
        assert r["prefix"] + r["middle"] + r["suffix"] == text  # lossless
        assert r["fim_text"] == r["prefix"] + "<FIM_SUF>" + r["suffix"] + "<FIM_MID>" + r["middle"]


def test_fim_split_is_deterministic_and_shuffle_free(spark, documents):
    from oasisdb_spark.pipeline.sampling import fim_split

    out = fim_split(documents, min_chars=60)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, fim_split(documents.repartition(7), min_chars=60).collect()))
    assert a == b
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


# ---- epoch_upsample ----

def test_epoch_upsample_counts_match_python(spark):
    from oasisdb_spark.pipeline.sampling import epoch_upsample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(60)], "doc_id LONG, lang STRING"
    )
    out = epoch_upsample(df, {"en": 2.25, "fr": 0.5}, group_col="lang")
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])
    for i in range(60):
        lang = "en" if i % 3 else "fr"
        r = 2.25 if lang == "en" else 0.5
        extra = 1 if (_h60_py(f"{i}epoch") % 1_000_000) < round((r - int(r)) * 1_000_000) else 0
        n = int(r) + extra
        if n == 0:
            assert i not in got
        else:
            assert sorted(got[i]) == list(range(1, n + 1)), i
    # fractional selection is in the right ballpark (md5-uniform)
    n_fr_docs = sum(1 for i in range(60) if i % 3 == 0)
    n_fr_kept = sum(1 for i in got if i % 3 == 0)
    assert 0 < n_fr_kept < n_fr_docs


def test_epoch_upsample_drops_unlisted_groups(spark):
    from oasisdb_spark.pipeline.sampling import epoch_upsample

    df = spark.createDataFrame([(1, "en"), (2, "zh")], "doc_id LONG, lang STRING")
    out = epoch_upsample(df, {"en": 1.0}, group_col="lang").collect()
    assert [r["doc_id"] for r in out] == [1]


def test_topic_balanced_sample_cap_and_determinism(spark):
    from oasisdb_spark.pipeline.sampling import topic_balanced_sample

    rows = [(i, f"common template words shared by all docs variant {i % 5}")
            for i in range(40)] + [(100 + i, f"totally distinct subject {i} "
            f"unique vocabulary item{i} token{i * 7}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = topic_balanced_sample(docs, cap=4, n_buckets=16)
    pdf = out.toPandas()
    # cap respected per bucket
    assert pdf.groupby("topic_bucket").size().max() <= 4
    # ranks are 1..n within each bucket
    assert all(
        sorted(g["bucket_rank"]) == list(range(1, len(g) + 1))
        for _, g in pdf.groupby("topic_bucket")
    )
    # deterministic and independent of partitioning / storage order
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, topic_balanced_sample(
        docs.repartition(7).sortWithinPartitions(F.col("doc_id").desc()),
        cap=4, n_buckets=16,
    ).collect()))
    assert a == b
    # the 40 same-template docs collapse into few buckets -> heavy trim;
    # the 5 distinct docs survive (their buckets are under cap)
    kept = set(pdf["doc_id"])
    assert len(kept & {100, 101, 102, 103, 104}) == 5
    assert len(kept) < 45


def test_topic_balanced_sample_validation(spark):
    from oasisdb_spark.pipeline.sampling import topic_balanced_sample

    docs = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="out of range"):
        topic_balanced_sample(docs, cap=1, n_buckets=0)


def test_quality_prune_exact_rational_cutoff(spark):
    """r07 review: the cutoff is exact integer arithmetic — a group of
    5 at keep_frac=0.4 keeps ceil(2) = 2 docs, not the float path's
    ceil(2.0000000000000004) = 3."""
    from oasisdb_spark.pipeline.sampling import quality_prune

    rows = [(i, "g", "some reasonable text here with words. " * (i + 2)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    out = quality_prune(df, keep_frac=0.4, group_col="source")
    assert out.count() == 2


def test_fim_passthrough_has_no_sentinels(spark):
    """r07 review: ineligible (short) docs emit the untransformed text
    as fim_text — no '<FIM_SUF><FIM_MID>' markers."""
    from oasisdb_spark.pipeline.sampling import fim_split

    df = spark.createDataFrame([(1, "tiny"), (2, None)], "doc_id LONG, text STRING")
    out = {r["doc_id"]: r["fim_text"] for r in fim_split(df, min_chars=20).collect()}
    assert out[1] == "tiny" and out[2] is None


def test_token_budget_null_text_costs_zero(spark):
    """r07 review: NULL-text docs count 0 tokens, never NULL."""
    from oasisdb_spark.pipeline.sampling import token_budget_sample

    rows = [(1, "en", "a b c d e f"), (2, "en", None), (3, "en", "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    out = {r["doc_id"]: r["n_tokens"] for r in token_budget_sample(df, budget=100).collect()}
    assert out[2] == 0 and None not in out.values()


def test_leakage_split_string_ids(spark):
    """r07 review: string doc ids flow through group_key untouched —
    no bigint cast crash under ANSI."""
    from oasisdb_spark.pipeline.sampling import leakage_safe_split

    docs = spark.createDataFrame([("doc-a",), ("doc-b",)], "doc_id STRING")
    clusters = spark.createDataFrame(
        [("doc-a", "doc-a")], "doc_id STRING, component STRING"
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, clusters).collect()}
    assert out["doc-a"]["group_key"] == "doc-a" and out["doc-a"]["is_clustered"]
    assert out["doc-b"]["group_key"] == "doc-b" and not out["doc-b"]["is_clustered"]


# --- round-8 NULL-id / dup-cluster regressions ----------------------------


def test_weighted_sample_excludes_null_ids(spark):
    from oasisdb_spark.pipeline.sampling import weighted_sample

    df = spark.createDataFrame(
        [(None, 100.0), ("a", 1.0), ("b", 1.0)], "doc_id STRING, w DOUBLE"
    )
    rows = weighted_sample(df, "w", 2).collect()
    assert sorted(r["doc_id"] for r in rows) == ["a", "b"]


def test_token_budget_sample_excludes_null_ids(spark):
    from oasisdb_spark.pipeline.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(None, "en", "a b c"), ("d1", "en", "x y"), ("d2", "en", "z")],
        "doc_id STRING, lang STRING, text STRING",
    )
    rows = token_budget_sample(df, 100).collect()
    assert sorted(r["doc_id"] for r in rows) == ["d1", "d2"]


def test_topic_balanced_sample_validates_cap_and_excludes_null_ids(spark):
    import pytest

    from oasisdb_spark.pipeline.sampling import topic_balanced_sample

    df = spark.createDataFrame(
        [(None, "same text"), ("a", "same text"), ("b", "same text")],
        "doc_id STRING, text STRING",
    )
    with pytest.raises(ValueError, match="cap"):
        topic_balanced_sample(df, cap=0)
    rows = topic_balanced_sample(df, cap=1).collect()
    assert all(r["doc_id"] is not None for r in rows)


def test_leakage_safe_split_dedups_cluster_membership(spark):
    from oasisdb_spark.pipeline.sampling import leakage_safe_split

    df = spark.createDataFrame([("d1",), ("d2",)], "doc_id STRING")
    clusters = spark.createDataFrame(
        # d1 listed twice (dup row) and under two components
        [("d1", "c1"), ("d1", "c1"), ("d1", "c0"), ("d2", "c2")],
        "doc_id STRING, component STRING",
    )
    out = leakage_safe_split(df, clusters).collect()
    assert len(out) == 2  # no row multiplication
    d1 = [r for r in out if r["doc_id"] == "d1"][0]
    assert d1["group_key"] == "c0"  # min component wins deterministically
