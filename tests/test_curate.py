"""Curation pipeline ops (pipeline/curate.py): PII redaction, n-gram
contamination, line-level dedup, source mixture weights, Gopher filter.
Semantics pinned on tiny hand-computable frames; cross-engine oracle
parity is covered by scripts/check_oracle.py on the registry entries."""

from pyspark.sql import functions as F

from oasisdb_spark.pipeline.curate import (
    gopher_filter_cols,
    line_dedup_stats,
    ngram_contamination,
    pii_count_cols,
    scrub_pii,
    source_mixture_weights,
)


def test_pii_counts_and_scrub(spark):
    df = spark.createDataFrame(
        [
            ("mail a@b.com and c.d@e.org, ip 10.0.0.1, call +123456789",),
            ("clean text with no pii at all",),
        ],
        "t STRING",
    )
    cnts = pii_count_cols("t")
    rows = df.select(
        *[c.alias(k) for k, c in cnts.items()], scrub_pii("t").alias("s")
    ).collect()
    assert (rows[0]["n_email"], rows[0]["n_ipv4"], rows[0]["n_phone"]) == (2, 1, 1)
    assert rows[0]["s"] == "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (0, 0, 0)
    assert rows[1]["s"] == "clean text with no pii at all"


def test_pii_email_pattern_spans_full_address():
    import re

    from oasisdb_spark.pipeline.curate import PII_PATTERNS

    s = "reach john.doe+tag@mail-server.example.com today"
    assert re.search(PII_PATTERNS["email"], s).group(0) == "john.doe+tag@mail-server.example.com"
    # IPv4 never fires inside an already-alpha-hosted address
    assert re.search(PII_PATTERNS["ipv4"], s) is None


def test_ngram_contamination_basic(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id BIGINT, text STRING"
    )
    ev = spark.createDataFrame(
        [
            (10, "alpha beta gamma zeta"),     # 1 of 2 trigrams contaminated
            (11, "totally novel words here"),  # 0 of 2
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(train, ev, n=3).collect()
    }
    assert out[10]["n_grams"] == 2 and out[10]["n_contaminated"] == 1
    assert out[10]["contamination"] == 0.5
    assert out[11]["n_grams"] == 2 and out[11]["n_contaminated"] == 0


def test_ngram_contamination_short_doc_whole_text_gram(spark):
    train = spark.createDataFrame([(1, "tiny doc")], "doc_id BIGINT, text STRING")
    ev = spark.createDataFrame([(2, "tiny doc")], "doc_id BIGINT, text STRING")
    r = ngram_contamination(train, ev, n=8).first()
    assert r["n_grams"] == 1 and r["n_contaminated"] == 1 and r["contamination"] == 1.0


def test_line_dedup_stats(spark):
    # line_len=2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [q r]
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "q r")],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in line_dedup_stats(df, line_len=2).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_dup_lines"] == 1
    assert out[1]["dup_line_ratio"] == 0.5
    assert out[2]["n_dup_lines"] == 1
    assert out[3]["n_lines"] == 1 and out[3]["n_dup_lines"] == 0


def test_line_dedup_empty_doc_emits_zero_row(spark):
    # r07 review: empty docs used to vanish from the output entirely —
    # now they carry an explicit n_lines=0 / ratio 0.0 row so a
    # dup_line_ratio policy sees them
    df = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in line_dedup_stats(df, line_len=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_lines"] == 0 and out[1]["dup_line_ratio"] == 0.0
    assert out[2]["n_lines"] == 1


def test_source_mixture_weights(spark):
    df = spark.createDataFrame(
        [("s1", "a b c d"), ("s1", "e f g h"), ("s2", "i j")],
        "source STRING, text STRING",
    )
    out = {r["source"]: r for r in source_mixture_weights(df, alpha=0.5).collect()}
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_tokens"] == 8
    assert out["s2"]["n_tokens"] == 2
    total = out["s1"]["weight"] + out["s2"]["weight"]
    assert abs(total - 1.0) < 1e-8
    # alpha < 1 upsamples the small source above its raw share
    assert out["s2"]["weight"] > out["s2"]["raw_share"]


def test_gopher_filter_flags(spark):
    long_ok = "the data of a table " * 10  # 50 words, 4 distinct stopwords
    too_short = "tiny doc"
    no_stop = "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"
    df = spark.createDataFrame(
        [(1, long_ok), (2, too_short), (3, no_stop)], "doc_id BIGINT, text STRING"
    )
    cols = gopher_filter_cols("text")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[c.alias(k) for k, c in cols.items()]).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_words"] is False
    assert out[3]["ok_stopwords"] is False and out[3]["keep"] is False


def test_gopher_symbol_ratio(spark):
    df = spark.createDataFrame([(1, "ab!!")], "doc_id BIGINT, text STRING")
    r = df.select(gopher_filter_cols("text")["symbol_ratio"].alias("s")).first()
    assert r["s"] == 0.5


# --- property tests (pure-Python regex semantics; no Spark per example) ---

def test_pii_scrub_idempotent_property():
    """scrub(scrub(x)) == scrub(x): placeholders contain no scannable
    PII, so a second pass is a no-op — the property that makes the
    redaction safe to re-run over partially-scrubbed corpora."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oasisdb_spark.pipeline.curate import _PII_ORDER, PII_PATTERNS, PII_REPLACEMENTS

    def scrub(s: str) -> str:
        for name in _PII_ORDER:
            s = re.sub(PII_PATTERNS[name], PII_REPLACEMENTS[name], s)
        return s

    pii_frags = st.sampled_from([
        "a@b.com", "john.doe+x@mail.example.org", "10.0.0.1", "255.1.2.3",
        "+123456789", "+4915551234567", "<EMAIL>", "<IP>", "<PHONE>",
    ])
    filler = st.text(alphabet="abc XYZ.@+123\n", max_size=20)
    doc = st.lists(st.one_of(pii_frags, filler), max_size=8).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(doc)
    def check(s):
        once = scrub(s)
        assert scrub(once) == once

    check()


def test_contamination_bounds_property(spark):
    """0 <= contamination <= 1 and n_contaminated <= n_grams on a mixed
    batch; a doc identical to a train doc is fully contaminated."""
    from oasisdb_spark.pipeline.curate import ngram_contamination

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id BIGINT, text STRING",
    )
    ev = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "iota kappa lamda mu nu xi omicron pi rho"),
         (12, "x")],
        "doc_id BIGINT, text STRING",
    )
    rows = {r["doc_id"]: r for r in ngram_contamination(train, ev, n=5).collect()}
    for r in rows.values():
        assert 0 <= r["n_contaminated"] <= r["n_grams"]
        assert 0.0 <= r["contamination"] <= 1.0
    assert rows[10]["contamination"] == 1.0
    assert rows[11]["n_contaminated"] == 0


def test_scrub_duplicate_lines(spark):
    from oasisdb_spark.pipeline.curate import scrub_duplicate_lines

    rows = [
        (0, "a b c d e f"),   # lines(3): "a b c" | "d e f"
        (1, "a b c x y z"),   # "a b c" dup with docs 0/4; "x y z" dup with doc 2
        (2, "x y z"),
        (3, ""),
        (4, "a b c"),         # entirely boilerplate
        (5, "p q r s"),       # unique lines: "p q r" | "s"
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r["text"] for r in scrub_duplicate_lines(df, line_len=3).collect()}
    assert out == {0: "d e f", 1: "", 2: "", 3: "", 4: "", 5: "p q r s"}
    # max_freq=2 tolerates pairs: only the freq-3 line ("a b c") is cut
    out2 = {r["doc_id"]: r["text"]
            for r in scrub_duplicate_lines(df, line_len=3, max_freq=2).collect()}
    assert out2[1] == "x y z" and out2[2] == "x y z" and out2[4] == ""


def test_gopher_symbol_ratio_spares_whitespace(spark):
    """r07 review: newlines/tabs are formatting, not symbols — prose
    with paragraph breaks must not accrue symbol_ratio."""
    from oasisdb_spark.pipeline.curate import gopher_stats_cols

    text = ("the quick brown fox jumps over the lazy dog and it " * 3 + "\n") * 5
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    r = df.select(*[v.alias(k) for k, v in gopher_stats_cols("text").items()]).first()
    assert r["symbol_ratio"] == 0.0


def test_line_dedup_stats_emits_rows_for_empty_docs(spark):
    """EMPTY docs get an n_lines=0 / ratio 0.0 row — a dup_line_ratio
    policy must see them (r07 review). NULL-text docs are NOT corpus
    members (round-9 NULL-fixture convention, shared with the shingle/
    jaccard family): they are excluded, not zero-scored — handle them
    at the quality gate upstream."""
    from oasisdb_spark.pipeline.curate import line_dedup_stats

    boiler = "copy right footer text repeated everywhere always " * 3
    rows = [(1, ""), (2, None), (3, boiler), (4, boiler)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in line_dedup_stats(df).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["n_lines"] == 0 and out[1]["dup_line_ratio"] == 0.0
    assert out[3]["n_dup_lines"] > 0
