"""Corpus language-model perplexity scoring (CCNet / KenLM-style quality
filtering — Wenzek et al. 2020 "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", public): train an MLE bigram
LM on a corpus, score every document by its per-token log-probability,
and filter/bucket on the score — the standard "perplexity filter" of
pretraining data pipelines (GPT-3, CCNet, RedPajama all gate on it).

Integer-exact cross-engine design (the repo's oracle discipline):
an MLE bigram probability is a ratio of integer counts,
p(w2|w1) = c(w1 w2) / c(w1 ·), so every log term is ln(integer). Raw
``ln`` is NOT bit-identical between the JVM and C libm (measured: 9,276
of the first 1M integers differ by 1 ulp), so scores are quantized to
MICRO-NATS: lmic(c) = CAST(round(ln(c) * 1e6) AS BIGINT). The 1-ulp
libm differences (~3e-15 relative) flip a 1e-6 rounding boundary with
probability ~6e-9 per distinct count value — measured ZERO flips over
counts 1..1,000,000 (test_lm.py re-verifies the corpus's actual count
range). Per-document scores are then SUMS OF INTEGERS: associative,
order-independent, identical on any partitioning and any engine.

Scale design (100 TB):
- model build: one partial-agg shuffle keyed by the bigram string
  (map-side combine collapses repeats), plus one keyed by w1 for the
  context totals; the context join is equi-key on w1.
- scoring: per-row Column-expression bigram explode (no Python), one
  equi-join doc-bigrams -> model (AQE skew-splits hot bigrams — stopword
  pairs are exactly the Zipf head), one doc_id partial agg. The model
  never broadcasts by assumption (corpus-wide bigram tables are huge);
  prune it with ``min_count`` to cut the tail that matches nothing
  frequent.
- no driver collect anywhere: lmic() is computed engine-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.text import tokens

__all__ = ["bigram_expr", "bigrams_of", "bigram_lm", "lm_score", "lm_score_broadcast", "perplexity_buckets", "pmi_collocations"]


def lmic(c: Column) -> Column:
    """Quantized micro-nat log of an integer count — the cross-engine
    log primitive (see module docstring). SQL twin:
    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)."""
    return F.round(F.log(c.cast("double")) * 1e6).cast("long")


def bigram_expr(c: Column | str) -> Column:
    """All token bigrams of a document IN ORDER WITH MULTIPLICITY
    (space-joined) — LM counts need every occurrence, unlike the
    distinct shingle sets of the dedup family. Docs with < 2 tokens
    yield an empty array."""
    return bigrams_of(tokens(c))


def bigrams_of(t: Column) -> Column:
    """Bigrams of a token-array column, zip_with over two shifted
    slices — O(n). The previous per-index `slice(t, i, 2)` inside a
    transform lambda re-evaluated `t` per element: with `t` an
    unmaterialized tokens(text) expression that re-tokenized the whole
    document once per bigram, O(n²) regex work (the text.py
    _distinct_ngrams lesson; measured 6.4 s → 0.7 s on the dsir
    bucket pass at sf0.1). Values identical: element i is
    token_i ⌢ ' ' ⌢ token_{i+1}, same order, same multiplicity."""
    cnt = F.size(t) - 1
    return F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, cnt),
            F.slice(t, 2, cnt),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    parallelism: int | None = None,
) -> DataFrame:
    """Train the MLE bigram model: (bg, c12, c1, lp_micro) where
    c12 = corpus occurrences of the bigram, c1 = occurrences of its
    context word AS a bigram start (the MLE denominator), and
    lp_micro = lmic(c12) - lmic(c1) <= 0 is the quantized conditional
    log-probability in micro-nats. ``min_count`` prunes rare bigrams
    FROM THE OUTPUT ONLY (c1 totals still include them, so surviving
    probabilities stay properly normalized); pruned bigrams score as
    OOV downstream."""
    if parallelism:
        # the bigram explode multiplies each text row ~token-count-fold;
        # when the corpus arrives in fewer splits than cores (one small
        # parquet file), spreading the cheap pre-explode rows
        # parallelizes the expensive stage (same rationale as
        # duplicate_substring_positions). At warehouse scale input
        # splits are plentiful — leave None.
        df = df.repartition(parallelism)
    bg = df.select(F.explode(bigram_expr(text_col)).alias("bg"))
    c12 = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    w1 = c12.withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
    c1 = w1.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        w1.join(c1, on="w1")
        .filter(F.col("c12") >= int(min_count))
        .select(
            "bg", "c12", "c1",
            (lmic(F.col("c12")) - lmic(F.col("c1"))).alias("lp_micro"),
        )
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    parallelism: int | None = None,
) -> DataFrame:
    """Score every document under a bigram_lm model: (doc_id, n_bigrams,
    oov_bigrams, logprob_micro, avg_logp) for EVERY input document.

    logprob_micro = Σ lp_micro over the doc's model-covered bigram
    occurrences (an exact integer); avg_logp = logprob_micro / 1e6
    / (n_bigrams - oov_bigrams) in nats-per-bigram (0.0 for docs with
    nothing to score). Perplexity = exp(-avg_logp) — left to the caller
    because exp() is engine-dependent at the ulp level while this frame
    is exactly comparable. Low avg_logp == surprising text (gibberish,
    boilerplate soup); the CCNet gate keeps the middle band."""
    # per-document scores need a document identity: groupBy(doc_id)
    # would pool every NULL-id doc into ONE phantom row (the oracle's
    # per-doc join never matches them). Model TRAINING (bigram_lm)
    # still sees the full corpus — only scoring requires identity.
    df = df.where(F.col(id_col).isNotNull())
    if parallelism:
        df = df.repartition(parallelism)
    docbg = df.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(bigram_expr(text_col)).alias("bg")
    )
    scored = docbg.join(model.select("bg", "lp_micro"), on="bg", how="left")
    per_doc = scored.groupBy("doc_id").agg(
        F.count("bg").alias("n_bigrams"),
        F.sum(
            F.when(F.col("bg").isNotNull() & F.col("lp_micro").isNull(), 1).otherwise(0)
        ).cast("long").alias("oov_bigrams"),
        F.coalesce(F.sum("lp_micro"), F.lit(0)).cast("long").alias("logprob_micro"),
    )
    n_scored = F.col("n_bigrams") - F.col("oov_bigrams")
    return per_doc.select(
        "doc_id", "n_bigrams", "oov_bigrams", "logprob_micro",
        F.when(n_scored > 0, F.col("logprob_micro").cast("double") / 1e6 / n_scored)
        .otherwise(F.lit(0.0)).alias("avg_logp"),
    )


def perplexity_buckets(
    scores: DataFrame,
    docs_meta: DataFrame,
    group_col: str = "source",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's head/middle/tail gate: within each group (source /
    language), rank documents by LM score and split into ``n_buckets``
    equal tiles — bucket 1 = most fluent (lowest perplexity, CCNet's
    "head", the keep set), bucket n = tail. Ties break on doc_id, so
    the tiling is deterministic; avg_logp itself is cross-engine exact
    (integer micro-nat sums), so the bucket labels are too.

    One window pass partitioned by the group key. At 100 TB a full
    within-group sort is the bill; the two-phase histogram refinement
    (quality_prune's documented alternative) applies identically here
    because avg_logp quantizes to micro-nat resolution.
    """
    from pyspark.sql.window import Window

    j = scores.join(docs_meta.select(F.col("doc_id"), F.col(group_col)), on="doc_id")
    w = Window.partitionBy(group_col).orderBy(F.desc("avg_logp"), "doc_id")
    return j.select(
        "doc_id", group_col, "avg_logp",
        F.ntile(int(n_buckets)).over(w).alias("ppl_bucket"),
    )


def lm_score_broadcast(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stateless row-at-ingest twin of ``lm_score``: the model collapses
    to a broadcast {bigram: lp_micro} map and each document scores in
    one Arrow batch pass — no explode, no join, no aggregation state,
    so it runs inside an append-mode STREAM (the KenLM deployment
    pattern: CCNet ships the pruned model file to every worker; here
    the pruned model broadcasts). Integer arithmetic is identical to
    lm_score (lp_micro values come FROM the trained model frame;
    Python re-tokenization shares text.py's _TOKEN_SEP definition —
    the proven minhash-UDF pattern), so outputs are row-identical and
    the batch SQL oracle applies unchanged. NB the shared pattern is
    compiled by Python ``re`` here but by the JVM regex engine in
    tokens(); tests/test_token_dialect.py pins their agreement
    EMPIRICALLY — an exhaustive per-codepoint sweep (every Unicode
    scalar value) plus context-sensitive case fixtures (final sigma,
    Turkish İ, ligatures) show ``str.lower()``+``re.split`` and
    ``F.lower``+``F.split`` produce identical token structure on the
    shared ASCII separator class, so the row-identity holds for
    arbitrary UTF-8 corpora on the pinned engine versions (the test
    fails loudly if an engine upgrade ever changes a case mapping).

    Contract: the model must fit executor memory — prune with
    ``bigram_lm(min_count=...)``; the full-corpus-model path is the
    batch ``lm_score`` join."""
    import re as _re

    from oasisdb_spark.pipeline.text import _TOKEN_SEP

    # identifiable docs only — the lm_score contract (streaming-safe
    # stateless filter)
    df = df.where(F.col(id_col).isNotNull())
    lut = {r["bg"]: r["lp_micro"] for r in model.select("bg", "lp_micro").collect()}
    bc = df.sparkSession.sparkContext.broadcast(lut)

    @F.pandas_udf("n_bigrams: bigint, oov_bigrams: bigint, logprob_micro: bigint, avg_logp: double")
    def _score(texts: pd.Series) -> pd.DataFrame:
        m = bc.value
        out = []
        for t in texts:
            toks = [x for x in _re.split(_TOKEN_SEP, (t or "").lower()) if x]
            lp, oov, n = 0, 0, max(len(toks) - 1, 0)
            for i in range(n):
                v = m.get(toks[i] + " " + toks[i + 1])
                if v is None:
                    oov += 1
                else:
                    lp += v
            ns = n - oov
            out.append((n, oov, lp, (lp / 1e6 / ns) if ns else 0.0))
        return pd.DataFrame(out, columns=["n_bigrams", "oov_bigrams", "logprob_micro", "avg_logp"])

    return df.select(
        F.col(id_col).alias("doc_id"), _score(F.col(text_col)).alias("_s")
    ).select("doc_id", "_s.*")


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    parallelism: int | None = None,
) -> DataFrame:
    """Collocation extraction by pointwise mutual information (Church &
    Hanks, Computational Linguistics 1990) over adjacent token bigrams
    — the phrase detector feeding multi-word vocab entries / tokenizer
    phrase merges in a training-data pipeline.

    PMI = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) = c_xy/N_bg and
    p(x) = c_x/N_u, computed in the SEPARABLE quantized dialect::

        pmi_micro = lmic(c_xy) + 2·lmic(N_u)
                    − lmic(c_x) − lmic(c_y) − lmic(N_bg)

    Each term is the micro-nat-quantized log of ONE integer count —
    never a log of a count PRODUCT — so nothing can overflow int64 at
    any corpus size (the fused ``lmic(c_xy·N_u²)`` form dies once
    N_u ≳ 3e9 tokens, i.e. a few GB of text). The dialect costs at most
    ~3 micro-nats of quantization skew vs the fused log (5 rounded
    terms), far below collocation-ranking granularity, and is identical
    on both engines by construction — every lmic input is the same
    exact integer.

    Shape: one explode+partial-agg shuffle for bigram counts, one for
    unigram counts, two word-keyed equi-joins of the (Zipf-small)
    bigram-type frame against the vocabulary frame, and the two scalar
    totals ride in as 1-row broadcast cross-joins — no driver action,
    the operator stays lazy/composable. ``min_count`` prunes rare
    bigrams from the OUTPUT only; the probability denominators still
    count them, so surviving PMI values are unbiased.

    Returns (bg, w1, w2, c_xy, c_x, c_y, pmi_micro), one row per
    bigram type with c_xy >= min_count.
    """
    if parallelism:
        df = df.repartition(parallelism)
    uni = df.select(F.explode(tokens(text_col)).alias("w"))
    c_w = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_u = c_w.agg(F.sum("c").cast("long").alias("_n_u"))
    bg = df.select(F.explode(bigram_expr(text_col)).alias("bg"))
    c_xy = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy"))
    n_bg = c_xy.agg(F.sum("c_xy").cast("long").alias("_n_bg"))
    split = c_xy.withColumn(
        "w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
    ).withColumn("w2", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
    out = (
        split.filter(F.col("c_xy") >= int(min_count))
        .join(c_w.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), on="w1")
        .join(c_w.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), on="w2")
        .crossJoin(F.broadcast(n_u))
        .crossJoin(F.broadcast(n_bg))
    )
    return out.select(
        "bg",
        "w1",
        "w2",
        "c_xy",
        "c_x",
        "c_y",
        (
            lmic(F.col("c_xy"))
            + 2 * lmic(F.col("_n_u"))
            - lmic(F.col("c_x"))
            - lmic(F.col("c_y"))
            - lmic(F.col("_n_bg"))
        ).alias("pmi_micro"),
    )
