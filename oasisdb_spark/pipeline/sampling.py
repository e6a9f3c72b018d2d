"""Corpus sampling & chunking operators for LLM training/RAG pipelines.

Three operators a large-scale data pipeline needs between curation and
training, all pure Column expressions (no Python rows, no UDFs) so they
stay inside whole-stage codegen and carry exact DuckDB oracles:

- ``quality_prune``: keep the top ``keep_frac`` of each group (source /
  lang) by heuristic quality score — per-group rank pruning, the
  "keep the best half of every source" step of mixture construction.
- ``token_budget_sample``: deterministic subsample of each group up to a
  token budget — the "2 B tokens of web, 500 M of code" epoch-mixture
  materialization. Order within a group is a salted content hash, so
  the sample is reproducible and independent of storage order.
- ``sliding_chunks``: overlapping token-window spans per document (RAG /
  context-window chunking with stride). One projection + posexplode —
  shuffle-free.

Scale notes (the 100 TB plan):
- ``quality_prune`` / ``token_budget_sample`` shuffle once on the group
  key and window-sort within groups. Group count is small (sources,
  languages) but groups can be huge — at the extreme, replace the full
  within-group sort with the two-phase histogram refinement: quality
  (resp. hash-prefix) has low cardinality, so a tiny
  (group, value, count) aggregate locates the boundary value, and only
  rows AT the boundary need ranking. The window form here is the exact
  spec both paths must match.
- ``sliding_chunks`` never shuffles: chunk spans derive from the row
  alone, and output order is irrelevant (downstream writers partition
  by doc hash anyway).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oasisdb_spark.pipeline.text import quality_score, text_stats_cols, token_count, tokens

__all__ = [
    "quality_prune",
    "token_budget_sample",
    "sliding_chunks",
    "weighted_sample",
    "leakage_safe_split",
    "fim_split",
    "epoch_upsample",
    "topic_balanced_sample",
]


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis A-ES scheme with the uniform draw replaced by
    the md5 content hash (the engine-reproducibility trick shared with
    ``kmv_hash`` / the MinHash coefficients). Each row gets key
    ln(u)/w for u = (h+1)/2^60 in (0,1]; the n largest keys are the
    sample — provably equivalent to drawing n items sequentially with
    probability proportional to remaining weight.

    Rows with weight <= 0 are excluded (they cannot be drawn). Pure
    Column expressions; the global top-n compiles to
    TakeOrderedAndProject — per-partition heaps of n rows, no full
    sort shuffle, so the cost is one scan at any corpus size.
    Deterministic tie-break on ``id_col`` (keys are continuous, ties
    effectively impossible, but the spec stays total).

    With ``group_cols`` the draw is STRATIFIED: n rows per group,
    independently weighted within each stratum (one hash shuffle on
    the group key + a rank window — the same shape as
    ``quality_prune``, including its histogram-refinement escape hatch
    for enormous groups).
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col)
    # rows without an id have no defined draw (md5(NULL) is NULL) and
    # engines disagree on where NULL keys sort -- exclude them, the
    # bottomk_sample convention
    src = df.filter(
        (F.col(weight_col) > 0) & F.col(id_col).isNotNull()
    ).withColumn("_aes_key", key)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col("_aes_key").desc(), F.col(id_col).asc()
        )
        return (
            src.withColumn("_aes_r", F.row_number().over(w))
            .filter(F.col("_aes_r") <= n)
            .drop("_aes_key", "_aes_r")
        )
    return (
        src.orderBy(F.col("_aes_key").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("_aes_key")
    )


def quality_prune(
    docs: DataFrame,
    keep_frac: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the best ``ceil(keep_frac * n)`` docs of each group by quality.

    Rank within group by (quality desc, id asc) — the id tiebreak makes
    the cut deterministic even though quality is coarse (step-function
    score, heavy ties). Returns (id, group, quality, q_rank) for the
    kept rows. At least one doc per group survives.

    The cutoff ceil(keep_frac·n) is computed in EXACT integer
    arithmetic over keep_frac's rational form ((num·n + den − 1) div
    den): float products overshoot exact integers (0.4·5 =
    2.0000000000000004 → ceil 3, not the documented 2) and engines
    disagree on decimal-vs-double literal typing — the r07 review.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    from fractions import Fraction

    frac = Fraction(float(keep_frac)).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator
    stats = text_stats_cols(text_col)
    scored = docs.select(
        F.col(id_col),
        F.col(group_col),
        quality_score(stats=stats).alias("quality"),
    )
    w = Window.partitionBy(group_col).orderBy(F.col("quality").desc(), F.col(id_col).asc())
    wn = Window.partitionBy(group_col)
    return (
        scored.select(
            id_col, group_col, "quality",
            F.row_number().over(w).alias("q_rank"),
            F.count(F.lit(1)).over(wn).alias("_n"),
        )
        .filter(
            F.col("q_rank")
            <= F.greatest(F.lit(1), F.expr(f"({num} * _n + {den} - 1) div {den}"))
        )
        .drop("_n")
    )


def token_budget_sample(
    docs: DataFrame,
    budget: int | dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "oasis",
) -> DataFrame:
    """Deterministic per-group subsample up to a token budget.

    Docs are ordered within each group by md5(salt || id) — a stable
    pseudo-random shuffle that is a pure function of content, so the
    sample is identical across runs, partitionings, and engines — and
    taken while the running token total stays within the group's budget
    (the first doc of a group is always taken, so a budget smaller than
    the first doc still yields one doc, matching "at least one shard"
    semantics). ``budget`` is one int for all groups or a {group: budget}
    dict (groups absent from the dict are dropped).

    Returns (id, group, n_tokens, cum_tokens) of the sampled docs.
    """
    if isinstance(budget, dict):
        if not budget:
            raise ValueError("budget dict must be non-empty")
        budget_col = reduce(
            lambda acc, kv: acc.when(F.col(group_col) == kv[0], F.lit(int(kv[1]))),
            budget.items(),
            F.when(F.lit(False), F.lit(0)),
        ).otherwise(F.lit(None).cast("bigint"))
    else:
        budget_col = F.lit(int(budget))
    t = docs.select(
        F.col(id_col),
        F.col(group_col),
        # NULL text = 0 tokens (costs nothing against the budget) —
        # never a NULL n_tokens exempt from accounting (r07 review)
        F.coalesce(token_count(text_col).cast("bigint"), F.lit(0)).alias("n_tokens"),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias("_h"),
        budget_col.alias("_budget"),
    ).filter(
        # NULL ids hash to NULL and Spark sorts NULLs FIRST asc while
        # DuckDB sorts them LAST: such a row would hog the front of the
        # sample on one engine only -- exclude (bottomk_sample precedent)
        F.col("_budget").isNotNull() & F.col(id_col).isNotNull()
    )
    order = Window.partitionBy(group_col).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t.select(
            id_col, group_col, "n_tokens", "_budget",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.row_number().over(order).alias("_rn"),
        )
        .filter((F.col("cum_tokens") <= F.col("_budget")) | (F.col("_rn") == 1))
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )


def sliding_chunks(
    docs: DataFrame,
    chunk_len: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = True,
) -> DataFrame:
    """Overlapping token-window spans per document (RAG-style chunking).

    Chunk i covers token positions [i*stride, min(i*stride + chunk_len,
    n_tokens)); the last chunk may be short; a document with n_tokens in
    (0, chunk_len] yields exactly one chunk; empty docs yield none.
    Returns (id, chunk_idx, start_tok, end_tok, chunk_tokens[, chunk_text]).

    chunk_text is the space-joined token slice (the normalized form the
    tokenizer produced — embedding/indexing consumes tokens, not raw
    bytes). Plan shape: one projection + posexplode, no shuffle; output
    size is n_tokens/stride rows per doc by construction.
    """
    if chunk_len <= 0 or stride <= 0:
        raise ValueError(f"chunk_len and stride must be positive, got {chunk_len}, {stride}")
    n = F.col("_n")
    n_chunks = F.when(
        n > chunk_len, F.ceil((n - F.lit(chunk_len)).cast("double") / stride) + 1
    ).otherwise(F.lit(1)).cast("int")
    t = docs.select(
        F.col(id_col), tokens(text_col).alias("_tk"), token_count(text_col).alias("_n")
    ).filter(F.col("_n") > 0)
    exploded = t.select(
        id_col, "_tk", "_n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * stride).cast("bigint")
    end = F.least(start + chunk_len, F.col("_n").cast("bigint"))
    out = exploded.select(
        id_col,
        "chunk_idx",
        start.alias("start_tok"),
        end.alias("end_tok"),
        (end - start).alias("chunk_tokens"),
        *(
            [F.array_join(F.slice("_tk", start + 1, end - start), " ").alias("chunk_text")]
            if with_text
            else []
        ),
    )
    return out


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup-aware train/val/test split: every member of a dup
    CLUSTER inherits the split of its cluster, keyed by the component
    id, so near-duplicates can never straddle train and test — the
    split-leakage failure the C4/Pile dedup literature warns about
    (a test doc whose near-copy sits in train silently inflates eval).
    Unclustered documents split by their own id.

    ``clusters`` is any (doc_id, component) frame — compose with
    connected components over MinHash-LSH pairs, SemDeDup cells, or
    exact-dup groups. Split assignment is the same deterministic
    md5-prefix rule as the plain 80/10/10 splitter (reproducible across
    engines/runs/cluster sizes; a doc's split never changes as the
    corpus grows, and a CLUSTER's split never changes as the cluster
    grows, because the component id is its min doc_id).

    Output: (doc_id, group_key, is_clustered, split). One broadcast-
    sized left join (the cluster frame is dup-docs only) + a per-row
    classifier — one shuffle at any corpus size.
    """
    # canonicalize the cluster frame: duplicate membership rows would
    # silently multiply output rows through the join, and a doc listed
    # under two components would get two contradictory splits -- take
    # the min component per doc (deterministic; disjoint components are
    # unaffected, overlapping ones merge toward the smaller id, the
    # connected-components convention)
    memb = clusters.select("doc_id", "component").groupBy("doc_id").agg(
        F.min("component").alias("component")
    )
    g = df.select(F.col(id_col).alias("doc_id")).join(
        memb, on="doc_id", how="left"
    )
    key = F.coalesce(F.col("component"), F.col("doc_id"))
    bucket = F.substring(F.md5(key.cast("string")), 1, 4)
    split = (
        F.when(bucket < F.lit("cccd"), "train")  # 0xcccd/0x10000 ~ 0.80
        .when(bucket < F.lit("e666"), "val")     # ~0.90
        .otherwise("test")
    )
    return g.select(
        "doc_id",
        # natural key type — a bigint cast would crash under ANSI (or
        # NULL out under legacy configs) for string/URL/hash doc ids,
        # which the "any (doc_id, component) frame" contract promises
        key.alias("group_key"),
        F.col("component").isNotNull().alias("is_clustered"),
        split.alias("split"),
    )


def fim_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    mid_frac_max: float = 0.5,
) -> DataFrame:
    """Fill-in-the-middle sample construction (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle",
    arXiv:2207.14255 — public): split each document into
    (prefix, middle, suffix) at two DETERMINISTIC md5-derived character
    cuts, and emit the PSM-transformed training text
    prefix + <FIM_SUF> + suffix + <FIM_MID> + middle (sentinel tokens
    as literal markers; the real tokenizer maps them to ids).

    Cut derivation (engine-reproducible, no RNG): the middle length is
    1 + H(id, 'fim-len') % floor(L * mid_frac_max) characters and its
    start is 1 + H(id, 'fim-pos') % (L - mid_len) — both from the
    md5-derived 60-bit hash DuckDB reproduces, so splits are stable
    across runs/engines/partitionings. Documents shorter than
    ``min_chars`` pass through with the whole text as prefix AND as
    fim_text — genuinely untransformed, no sentinel markers (the paper
    applies FIM to a fraction of samples anyway; injecting
    '<FIM_SUF><FIM_MID>' after every short doc would corrupt the
    non-FIM fraction — r07 review). Pure scan-stage Column arithmetic:
    no shuffle, no Python.
    """
    if not 0 < mid_frac_max <= 0.9:
        raise ValueError("mid_frac_max must be in (0, 0.9]")
    L = F.length(text_col)

    def h60(salt: str) -> Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")

    max_mid = F.floor(L * float(mid_frac_max)).cast("long")
    mid_len = (h60("fim-len") % F.greatest(max_mid, F.lit(1)) + 1).cast("long")
    start = (h60("fim-pos") % (L - mid_len) + 1).cast("long")  # 1-based, < L
    eligible = (L >= int(min_chars)) & (L - mid_len >= 1)
    prefix = F.when(eligible, F.substring(F.col(text_col), F.lit(1), start - 1)).otherwise(
        F.col(text_col)
    )
    middle = F.when(eligible, F.substring(F.col(text_col), start, mid_len)).otherwise(F.lit(""))
    suffix = F.when(
        eligible, F.substring(F.col(text_col), start + mid_len, L)
    ).otherwise(F.lit(""))
    return df.select(
        F.col(id_col),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        F.when(
            eligible,
            F.concat(prefix, F.lit("<FIM_SUF>"), suffix, F.lit("<FIM_MID>"), middle),
        )
        .otherwise(F.col(text_col))
        .alias("fim_text"),
    )


def epoch_upsample(
    df: DataFrame,
    repeats: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a training epoch with FRACTIONAL per-group repeat
    factors (the temperature-mixture upsampling of Llama/DoReMi-style
    data recipes): a group with repeats=2.3 emits every document twice
    and a deterministic 30% of its documents a third time.

    The fractional copy is selected by the md5-prefix threshold rule
    (same engine-reproducible trick as corpus_split): doc gets the
    extra copy iff H(id, 'epoch') % 1e6 < frac * 1e6. Groups absent
    from ``repeats`` are DROPPED (mixture exclusion, matching
    token_budget_sample semantics); repeats <= 0 likewise. Output is
    (input columns..., copy_idx 1..n) — explode of a scan-stage
    sequence, no shuffle, no RNG, stable under corpus growth.
    """
    if not repeats:
        raise ValueError("repeats must be non-empty")
    for g, r in repeats.items():
        if r < 0:
            raise ValueError(f"repeat factor for {g!r} must be >= 0, got {r}")
    base_map = F.create_map(
        *[x for g, r in repeats.items() for x in (F.lit(g), F.lit(int(r)))]
    )
    frac_map = F.create_map(
        *[
            x
            for g, r in repeats.items()
            for x in (F.lit(g), F.lit(int(round((r - int(r)) * 1_000_000))))
        ]
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("epoch"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    base = base_map[F.col(group_col)]
    frac_micro = frac_map[F.col(group_col)]
    n_copies = base + F.when((h % 1_000_000) < frac_micro, F.lit(1)).otherwise(F.lit(0))
    return (
        df.filter(base.isNotNull())
        .withColumn("_n", n_copies)
        .filter(F.col("_n") >= 1)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def topic_balanced_sample(
    df: DataFrame,
    cap: int,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "topic-balance",
) -> DataFrame:
    """Topic-balanced corpus sampling: cap the number of documents kept
    per TOPIC BUCKET, flattening topical over-representation (the
    boilerplate/SEO-farm head of a web crawl) without training a
    clusterer. The topic proxy is the document's 48-bit SimHash
    (pipeline/dedup.py simhash_expr) folded to ``n_buckets`` buckets:
    near-duplicate and same-template documents land in the same bucket,
    so the cap bounds how much any one template contributes to an
    epoch — the zero-training version of cluster-balanced selection
    (SemDeDup-style k-means balancing swaps in via
    pipeline/semantic_dedup.py cluster assignments on embeddings).

    Within a bucket, survivors are chosen by salted content hash of the
    id (md5), so the sample is reproducible and independent of storage
    order; ties cannot occur (id is unique). Returns the input columns
    plus (topic_bucket, bucket_rank) for the kept rows.

    Scale: simhash is a scan-stage Arrow pass; the cap is ONE shuffle
    keyed by topic_bucket whose window input WindowGroupLimit trims to
    ``cap`` rows per input partition first — identical economics to
    quality_prune. Bucket count is a knob: at 100 TB raise n_buckets
    (and/or pre-aggregate per-bucket counts) so buckets stay
    executor-sized.
    """
    # corpus-membership contract (pipeline/dedup.py): NULL-id /
    # NULL-text docs are not corpus members
    df = df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    from oasisdb_spark.pipeline.dedup import SIMHASH_BITS, simhash_expr

    if not 1 <= n_buckets <= (1 << SIMHASH_BITS):
        raise ValueError(f"topic_balanced_sample: n_buckets={n_buckets} out of range")
    if cap < 1:
        raise ValueError(f"topic_balanced_sample: cap must be >= 1, got {cap}")
    bucket = (simhash_expr(text_col) % F.lit(n_buckets)).alias("topic_bucket")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("topic_bucket").orderBy(h.asc(), F.col(id_col).asc())
    return (
        # NULL ids excluded: their selection hash is NULL, which sorts
        # FIRST in Spark and LAST in DuckDB (bottomk_sample precedent)
        df.where(F.col(id_col).isNotNull())
        .withColumn("topic_bucket", bucket)
        .withColumn("bucket_rank", F.row_number().over(w))
        .filter(F.col("bucket_rank") <= cap)
    )
