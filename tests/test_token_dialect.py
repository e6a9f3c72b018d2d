"""Cross-engine tokenizer dialect contract (VERDICT r06 #6).

The streaming broadcast scorers (dsir_score_broadcast,
lm_score_broadcast) re-tokenize in Python with text.py's _TOKEN_SEP,
while the batch operators tokenize JVM-side via tokens() — the
row-identity guarantee rests on `str.lower()` + `re.split` agreeing
with `F.lower` + `F.split` on the shared ASCII character class. These
tests pin that agreement EMPIRICALLY on non-ASCII input:

- an exhaustive per-codepoint sweep (every Unicode scalar value
  embedded between ASCII letters) — catches any case-mapping where the
  engines disagree on which ASCII alnum characters the lowercased form
  contains, i.e. the only way the ASCII separator class can produce
  different token structure;
- context-sensitive case fixtures (Greek final sigma, Turkish dotted
  I, ligatures, sharp-s) — the SpecialCasing rules a per-codepoint
  sweep cannot cover;
- end-to-end row-identity of dsir_score vs dsir_score_broadcast and
  lm_score vs lm_score_broadcast on a UTF-8 corpus.

If a Spark/Python upgrade ever breaks the agreement, these fail and
the ASCII-only caveat in the scorer docstrings becomes the contract.
"""

import re

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.text import _TOKEN_SEP, tokens

UTF8_FIXTURES = [
    "Grüße aus München — straße FÜR alle",
    "İstanbul'da IŞIK ve ırmak",
    "Привет МИР здесь 123 текст",
    "日本語のテキスト 42 と English MIX",
    "café naïve CO-OPÉRATION élève",
    "ΣΟΦΟΣ σοφος ϹΙΓΜΑ",           # final-sigma context rule
    "ﬁance ﬀort ŉandu",            # ligature / compatibility folds
    "ẞharp ss and ß mixed",        # capital sharp s
    "",                             # empty
    "    \t\n  ",                   # whitespace only
]


def _py_tokens(t: str) -> list[str]:
    return [x for x in re.split(_TOKEN_SEP, (t or "").lower()) if x]


def test_token_dialect_exhaustive_codepoint_sweep(spark):
    """Every Unicode scalar value, embedded as 'x<c>y' segments in
    1000-codepoint rows: JVM tokens() must equal the Python re-split
    on every row."""
    cps = [c for c in range(0x20, 0x110000) if not (0xD800 <= c <= 0xDFFF)]
    rows = []
    for lo in range(0, len(cps), 1000):
        s = " ".join(f"x{chr(c)}y" for c in cps[lo : lo + 1000])
        rows.append((lo, s))
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    jvm = {r["id"]: r["tk"] for r in df.select("id", tokens("text").alias("tk")).collect()}
    bad = []
    for i, s in rows:
        if _py_tokens(s) != jvm[i]:
            got, want = jvm[i], _py_tokens(s)
            k = next(j for j in range(min(len(got), len(want)) + 1)
                     if j >= len(got) or j >= len(want) or got[j] != want[j])
            bad.append((i, k, got[k : k + 3], want[k : k + 3]))
    assert not bad, f"tokenizer dialects diverge (row, pos, jvm, py): {bad[:5]}"


def test_token_dialect_context_sensitive_fixtures(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(UTF8_FIXTURES)], "id LONG, text STRING"
    )
    jvm = {r["id"]: r["tk"] for r in df.select("id", tokens("text").alias("tk")).collect()}
    for i, t in enumerate(UTF8_FIXTURES):
        assert jvm[i] == _py_tokens(t), t


@pytest.fixture(scope="module")
def utf8_corpus(spark):
    # every fixture as a doc, plus docs mixing scripts with ASCII words
    # the models can actually learn
    docs = UTF8_FIXTURES + [
        "the quick brown fox über alles",
        "the quick brown fox jumps again",
        "İstanbul the quick test naïve",
        "Привет the brown fox 123",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id LONG, text STRING"
    )


def test_dsir_broadcast_row_identical_on_utf8(spark, utf8_corpus):
    from oasisdb_spark.pipeline.dsir import dsir_model, dsir_score, dsir_score_broadcast

    target = utf8_corpus.where(F.col("doc_id") % 2 == 0)
    model, const = dsir_model(target, utf8_corpus, n_buckets=64)
    model = model.persist()
    batch = sorted(map(tuple, dsir_score(utf8_corpus, model, const, n_buckets=64).collect()))
    stream = sorted(
        map(tuple, dsir_score_broadcast(utf8_corpus, model, const, n_buckets=64).collect())
    )
    assert batch == stream and batch
    model.unpersist()


def test_lm_broadcast_row_identical_on_utf8(spark, utf8_corpus):
    from oasisdb_spark.pipeline.lm import bigram_lm, lm_score, lm_score_broadcast

    model = bigram_lm(utf8_corpus).persist()
    batch = sorted(map(tuple, lm_score(utf8_corpus, model).collect()))
    stream = sorted(map(tuple, lm_score_broadcast(utf8_corpus, model).collect()))
    assert batch == stream and batch
    model.unpersist()
