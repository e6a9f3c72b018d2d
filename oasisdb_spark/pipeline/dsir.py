"""DSIR data selection — importance resampling over hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169 — public).

The standard "select raw-pool documents that look like the target
domain" operator of pretraining pipelines: featurize every document as
a bag of hashed unigrams+bigrams, fit two bag-of-buckets category
models — p from a target-domain sample, q from the raw pool — and score
each raw document by its importance log-ratio

    log w(x) = sum_b c_b(x) * (ln p_b - ln q_b)

then keep the top-k (the deterministic variant of the paper's
importance resampling; md5 tiebreaks keep selection reproducible).

Integer-exact cross-engine design (the repo's oracle discipline,
pipeline/lm.py): with Laplace smoothing the category probabilities are
ratios of integer counts — p_b = (t_b + 1) / (T + B) — so every log
term is ln(integer), quantized to micro-nats via ``lmic``. A document's
log-weight becomes a SUM OF INTEGERS:

    w_micro = sum_b c_b * (lmic(t_b+1) - lmic(r_b+1))
              + n(x) * (lmic(R+B) - lmic(T+B))

associative, order-independent, identical on any partitioning and any
engine (DuckDB twin: the same md5-derived bucket hash and the same
CAST(round(ln(c)*1e6) AS BIGINT)).

Scale design (100 TB):
- featurization is a per-row Column expression (tokens -> unigram+bigram
  hash -> mod B): no shuffle, no Python.
- each model fit is ONE partial-agg shuffle keyed by bucket id (map-side
  combine collapses the Zipf head); the two fits join on bucket id —
  at most B rows ever cross that join.
- the model is B rows (default 4096 — the paper's 10k-bucket regime is
  one knob away), so SCORING broadcasts it: explode buckets, broadcast
  equi-join, one doc_id partial agg. The raw pool is never reshuffled;
  selection (dsir_select) is orderBy().limit(k) — the physical plan is
  TakeOrderedAndProject (per-partition heaps merged at the driver, no
  global sort shuffle; asserted by scripts/plan_audit.py, fixed per
  ADVICE r05 from the earlier unpartitioned-Window form).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.lm import bigram_expr, bigrams_of, lmic
from oasisdb_spark.pipeline.text import char_hash60, tokens

__all__ = [
    "DSIR_BUCKETS",
    "hashed_ngram_buckets",
    "dsir_model",
    "dsir_score",
    "dsir_score_broadcast",
    "dsir_select",
]

DSIR_BUCKETS = 4096


def _ngram_strings(c: Column | str) -> Column:
    """The unigram+bigram bag as STRINGS (order/multiplicity preserved);
    empty/NULL text yields an empty bag."""
    t = tokens(c)
    # NULL text -> empty bag (concat of a NULL array is NULL)
    return F.coalesce(F.concat(t, bigram_expr(c)), F.array().cast("array<string>"))


def hashed_ngram_buckets(c: Column | str, n_buckets: int = DSIR_BUCKETS) -> Column:
    """Hashed unigram+bigram feature buckets WITH MULTIPLICITY (a bag,
    not a set — DSIR counts every occurrence). Bucket id =
    char_hash60(gram) % B, the md5-derived 60-bit hash DuckDB reproduces
    bit-for-bit; empty/NULL text yields an empty bag."""
    return F.transform(_ngram_strings(c), lambda g: char_hash60(g) % n_buckets)


def _bucket_rows(
    df: DataFrame, text_col: str, n_buckets: int, *keep_cols: str
) -> DataFrame:
    """(keep_cols..., bucket): one row per feature occurrence. The gram
    STRINGS explode first and the md5 bucket hash evaluates as a
    top-level projection over the exploded rows — inside whole-stage
    codegen — instead of inside the `transform` lambda, which Spark
    evaluates interpreted per element (guide §4: HOF lambdas don't
    codegen; measured ~2x on the scoring pass at sf0.1). The token
    array is projected ONCE per row before the gram build (slicing a
    materialized array column is cheap; the tokens(text) expression
    inside the bigram slices would re-tokenize per reference — the
    curate.py _token_lines convention). Values are identical to
    explode(hashed_ngram_buckets(...)) by construction."""
    grams = F.coalesce(
        F.concat(F.col("_tk"), bigrams_of(F.col("_tk"))),
        F.array().cast("array<string>"),
    )
    return (
        df.select(*[F.col(k) for k in keep_cols], tokens(text_col).alias("_tk"))
        .select(*[F.col(k) for k in keep_cols], F.explode(grams).alias("_gram"))
        .select(*keep_cols, (char_hash60("_gram") % n_buckets).alias("bucket"))
    )


def dsir_model(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> tuple[DataFrame, int]:
    """Fit the importance model: returns (model, const_micro).

    model: (bucket, t_c, r_c, lr_micro) with one row per bucket seen in
    EITHER corpus; lr_micro = lmic(t_c + 1) - lmic(r_c + 1) is the
    Laplace-smoothed per-occurrence log-ratio in micro-nats, count terms
    only. const_micro = lmic(R + B) - lmic(T + B) is the per-occurrence
    normalizer term (T, R = total feature occurrences in target/raw);
    buckets absent from both corpora contribute lmic(1)-lmic(1) = 0, so
    scoring coalesces missing joins to 0 instead of materializing B
    dense rows."""

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            _bucket_rows(df, text_col, n_buckets)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    tc, rc = counts(target, "t_c"), counts(raw, "r_c")
    model = (
        tc.join(rc, on="bucket", how="full_outer")
        .select(
            "bucket",
            F.coalesce("t_c", F.lit(0)).alias("t_c"),
            F.coalesce("r_c", F.lit(0)).alias("r_c"),
        )
        .withColumn(
            "lr_micro", lmic(F.col("t_c") + 1) - lmic(F.col("r_c") + 1)
        )
    )
    # the normalizer constant is computed ENGINE-SIDE with the same
    # lmic primitive as the per-bucket terms, so there is no python
    # rounding twin to drift from the Spark/DuckDB pair
    tot = model.agg(F.sum("t_c").alias("T"), F.sum("r_c").alias("R")).select(
        (
            lmic(F.coalesce("R", F.lit(0)) + n_buckets)
            - lmic(F.coalesce("T", F.lit(0)) + n_buckets)
        ).alias("const_micro")
    ).first()
    return model, int(tot["const_micro"])


def dsir_score(
    df: DataFrame,
    model: DataFrame,
    const_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document importance log-weight in micro-nats:
    (id_col, n_feats, weight_micro). Feature-less documents (empty
    text) keep weight_micro = 0. The model (<= B rows) broadcasts; the
    only shuffle is the per-doc partial agg."""
    # identifiable docs only: per-doc scores/ranks need an id (the
    # oracle joins on doc_id; groupBy would pool NULL ids) — the
    # lm_score contract
    df = df.where(F.col(id_col).isNotNull())
    feats = _bucket_rows(df, text_col, n_buckets, id_col)
    scored = (
        feats.join(F.broadcast(model.select("bucket", "lr_micro")), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce("lr_micro", F.lit(0))).alias("_lr_sum"),
        )
        .select(
            id_col,
            "n_feats",
            (F.col("_lr_sum") + F.col("n_feats") * F.lit(const_micro)).alias("weight_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("weight_micro", F.lit(0)).cast("long").alias("weight_micro"),
        )
    )


def dsir_score_broadcast(
    df: DataFrame,
    model: DataFrame,
    const_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Stateless row-at-ingest twin of ``dsir_score``: the model
    collapses to a broadcast {bucket: lr_micro} dict (it is <= B rows
    BY CONSTRUCTION — unlike the LM case no pruning contract is needed)
    and each document scores in one Arrow pass — no explode, no join,
    no aggregation state, so it runs inside an append-mode STREAM: the
    "score raw documents against a fixed target model as they arrive"
    deployment of DSIR. Python re-tokenization and md5 bucket hashing
    compute the identical integers as the Column path (the proven
    minhash/lm UDF pattern; dialect agreement pinned for arbitrary
    UTF-8 by tests/test_token_dialect.py's exhaustive codepoint sweep,
    as lm_score_broadcast), so outputs are row-identical and the batch
    oracle applies."""
    # identifiable docs only: per-doc scores/ranks need an id (the
    # oracle joins on doc_id; groupBy would pool NULL ids) — the
    # lm_score contract
    df = df.where(F.col(id_col).isNotNull())
    import hashlib
    import re as _re

    from oasisdb_spark.pipeline.text import _TOKEN_SEP

    lut = {int(r["bucket"]): int(r["lr_micro"]) for r in model.select("bucket", "lr_micro").collect()}
    bc = df.sparkSession.sparkContext.broadcast(lut)

    @F.pandas_udf("n_feats: bigint, weight_micro: bigint")
    def _score(texts: pd.Series) -> pd.DataFrame:
        m = bc.value
        out = []
        for t in texts:
            toks = [x for x in _re.split(_TOKEN_SEP, (t or "").lower()) if x]
            grams = toks + [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
            w = 0
            for g in grams:
                b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets
                w += m.get(b, 0)
            out.append((len(grams), w + len(grams) * const_micro))
        return pd.DataFrame(out, columns=["n_feats", "weight_micro"])

    return df.select(
        F.col(id_col).alias(id_col), _score(F.col(text_col)).alias("_s")
    ).select(id_col, "_s.n_feats", "_s.weight_micro")


def dsir_select(
    df: DataFrame,
    model: DataFrame,
    const_micro: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    scorer: str = "broadcast",
) -> DataFrame:
    """Top-k raw documents by importance weight (deterministic:
    weight desc, id asc tiebreak). Returns (id_col, n_feats,
    weight_micro, sel_rank).

    ``scorer='broadcast'`` (default) scores with the fused Arrow pass
    (dsir_score_broadcast) — the model is <= B rows BY CONSTRUCTION so
    it always fits; measured ~5x over the Column path at sf0.1, the
    same interpreted-HOF-md5 economics as the minhash pair
    (minhash_signature_expr vs shingle_minhash_frame). ``scorer='join'``
    is the executable Column/equi-join spec; the two are row-identical
    (test-pinned), so the oracle applies to both.

    The top-k is orderBy().limit(k) — TakeOrderedAndProject, per-
    partition heaps merged at the driver, never a global sort shuffle
    (ADVICE r05: the previous unpartitioned-Window form collapsed the
    final sort to a single partition; WindowGroupLimit only trimmed
    each input partition to k first). sel_rank is then a row_number
    over the k surviving rows — a trivial single-partition window."""
    # identifiable docs only: per-doc scores/ranks need an id (the
    # oracle joins on doc_id; groupBy would pool NULL ids) — the
    # lm_score contract
    df = df.where(F.col(id_col).isNotNull())
    from pyspark.sql import Window

    score_fn = dsir_score_broadcast if scorer == "broadcast" else dsir_score
    scored = score_fn(df, model, const_micro, id_col, text_col, n_buckets)
    order = [F.col("weight_micro").desc(), F.col(id_col).asc()]
    top = scored.orderBy(*order).limit(k)
    return top.withColumn("sel_rank", F.row_number().over(Window.orderBy(*order)))
