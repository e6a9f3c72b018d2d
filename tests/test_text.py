"""Text-analysis pipeline ops on the documents fixture."""

from pyspark.sql import functions as F

from oasisdb_spark.pipeline.text import (
    fingerprint_md5,
    langid_expr,
    normalize_text,
    quality_score,
    text_stats_cols,
    token_count,
    tokens,
)


def test_normalize(spark):
    df = spark.createDataFrame([("  Hello   WORLD \n",)], "t STRING")
    assert df.select(normalize_text("t").alias("x")).first()["x"] == "hello world"


def test_tokens_and_count(spark):
    df = spark.createDataFrame([("The quick, brown fox!",), ("",)], "t STRING")
    rows = df.select(tokens("t").alias("tk"), token_count("t").alias("n")).collect()
    assert rows[0]["tk"] == ["the", "quick", "brown", "fox"] and rows[0]["n"] == 4
    assert rows[1]["n"] == 0


def test_stats_and_quality(spark, documents):
    stats = text_stats_cols("text")
    out = documents.select(
        "doc_id", *(v.alias(k) for k, v in stats.items()), quality_score("text").alias("q")
    )
    rows = out.collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)
    assert all(0.0 <= r["alpha_ratio"] <= 1.0 for r in rows)


def test_langid_detects_stopword_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat of the mat and it is that for",),   # en
            ("der hund und die katze ist ein mit von zu",),    # de
            ("le chat et la maison est dans un pour les",),    # fr
            ("el perro y la casa es un de en por",),           # es
            ("xyzzy plugh 12345",),                            # none
        ],
        "t STRING",
    )
    got = [r["lang"] for r in df.select(langid_expr("t").alias("lang")).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_fingerprint_stable_under_whitespace_case(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "t STRING")
    fps = [r["fp"] for r in df.select(fingerprint_md5("t").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_repetition_cols(spark):
    from pyspark.sql import functions as F

    from oasisdb_spark.pipeline.text import repetition_cols

    rows = [
        (0, "spam spam spam spam spam spam"),          # degenerate repetition
        (1, "the quick brown fox jumps over lazy dog"),  # all distinct
        (2, "ab"),                                      # shorter than ngram
        (3, ""),                                        # empty
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *(v.alias(k) for k, v in repetition_cols("text").items())
    ).collect()}
    assert out[0]["token_diversity"] == round(1 / 6, 6)
    assert out[0]["dup_ngram_ratio"] == 0.75  # 4 grams, 1 distinct
    assert out[1]["token_diversity"] == 1.0
    assert out[1]["dup_ngram_ratio"] == 0.0
    assert out[2]["dup_ngram_ratio"] == 0.0  # no grams
    assert out[3]["token_diversity"] == 1.0 and out[3]["n_tokens"] == 0


def test_pretokens_and_bpe_estimate(spark):
    from oasisdb_spark.pipeline.text import bpe_token_estimate, pretokens

    rows = [
        (0, "hello world"),          # 2 letter runs
        (1, "abc123!"),              # letters / digits / symbol split
        (2, "don't stop"),           # apostrophe is a symbol run
        (3, ""),                     # empty
        (4, "internationalization"), # 20 chars -> ceil(20/4) = 5 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        pretokens("text").alias("pt"),
        bpe_token_estimate("text").alias("est"),
    ).collect()}
    assert out[0]["pt"] == ["hello", "world"] and out[0]["est"] == 2 + 2
    assert out[1]["pt"] == ["abc", "123", "!"] and out[1]["est"] == 1 + 1 + 1
    assert out[2]["pt"] == ["don", "'", "t", "stop"]
    assert out[3]["pt"] == [] and out[3]["est"] == 0
    assert out[4]["est"] == 5


def test_pretokens_and_bpe_null_text_is_zero(spark):
    """ADVICE r04: NULL text counts as an empty doc — size 0 / estimate
    0, never NULL / -1 leaking into token budgets."""
    from oasisdb_spark.pipeline.text import bpe_token_estimate, pretokens

    df = spark.createDataFrame([(1, None), (2, "ab cd!")], "id LONG, text STRING")
    rows = {r["id"]: r for r in df.select(
        "id",
        F.size(pretokens("text")).alias("n_pre"),
        bpe_token_estimate("text").alias("est"),
    ).collect()}
    assert rows[1]["n_pre"] == 0 and rows[1]["est"] == 0
    assert rows[2]["n_pre"] == 3 and rows[2]["est"] == 3
