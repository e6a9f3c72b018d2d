"""Corpus-curation operators for LLM training-data pipelines.

Extends the dedup/text families (SURVEY §2 extensions) with the
standard curation passes a 100 TB pretraining pipeline runs between
crawl and tokenizer:

- PII detection + redaction (regex: email / IPv4 / intl phone) — pure
  Column expressions, zero shuffle, codegen-eligible; patterns are
  written in the common Java-regex ∩ RE2 dialect so the DuckDB oracle
  twin matches byte-for-byte.
- N-gram train/eval contamination (the GPT-3 appendix-C style
  decontamination check: which eval documents share verbatim n-grams
  with the training corpus) — distinct-gram semi-join, shuffles only
  (gram, id) pairs, never document text.
- Line-level dedup stats (CCNet / RefinedWeb style: how much of each
  document is made of corpus-duplicated lines) — explode lines, one
  hash-groupBy for global line frequency, broadcast-join back.
- Source mixture weights (temperature-scaled sampling à la multilingual
  pretraining: w_i ∝ tokens_i^alpha) — one partial-agg groupBy over
  the corpus, window-normalized on the tiny per-source aggregate.
- Gopher-style composite quality filter (Rae et al. 2021 §A1.1 rule
  shapes: word count, mean word length, symbol ratio, stopword hits)
  — pure Column expressions over text_stats_cols.

The reference engine (lizzy-0323/oasisdb) stops at vector search; these
document-curation passes are the workload its users run UPSTREAM of
embedding, so they live here as first-class oracled operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, char_hash60, tokens

__all__ = [
    "PII_PATTERNS",
    "PII_REPLACEMENTS",
    "pii_count_cols",
    "scrub_pii",
    "ngram_contamination",
    "line_dedup_stats",
    "scrub_duplicate_lines",
    "source_mixture_weights",
    "gopher_filter_cols",
    "gopher_stats_cols",
    "gopher_flag_cols",
]


def _token_lines(tk: Column, line_len: int) -> Column:
    """Non-overlapping ``line_len``-token windows of a tokens array —
    the ONE line definition line_dedup_stats (detection) and
    scrub_duplicate_lines (removal) must share by construction.
    Guard: sequence(0, -1) DESCENDS in Spark, so an empty doc would
    fabricate two empty lines — emit an empty array instead (DuckDB's
    range(0, 0) twin is naturally empty)."""
    n_lines = F.ceil(F.size(tk) / F.lit(line_len)).cast("int")
    return F.when(
        F.size(tk) > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda j: F.array_join(F.slice(tk, j * line_len + 1, line_len), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# Patterns deliberately restricted to the Java-regex ∩ RE2 subset (no
# lookaround, no backreferences) so Spark's regexp_* and DuckDB's
# regexp_* (RE2) agree exactly.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}\b",
}
PII_REPLACEMENTS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}
# Redaction order matters: emails contain dot-runs an IPv4 pattern could
# clip, and '+' phone prefixes can abut emails — scrub email → ipv4 →
# phone, most-specific first.
_PII_ORDER = ("email", "ipv4", "phone")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count_cols(c: Column | str) -> dict[str, Column]:
    """Per-type PII match counts (n_email / n_ipv4 / n_phone).

    Pure `regexp_count` Column expressions: run in the scan stage, no
    shuffle, no Python. DuckDB twin:
    `len(regexp_extract_all(text, pattern))`.

    CONTRACT: each pattern counts INDEPENDENTLY on the raw text —
    detection prevalence per type, not a replacement audit. Overlapping
    PII (an IP-shaped string inside an email's local part) counts once
    per matching type here, while scrub_pii's ORDERED single pass
    redacts it once under the most-specific pattern — so
    count('<IP>') in scrubbed text can be lower than sum(n_ipv4).
    Reconcile audits against the scrubbed placeholders, not these
    counts."""
    col = _col(c)
    return {f"n_{name}": F.regexp_count(col, F.lit(pat)) for name, pat in PII_PATTERNS.items()}


def scrub_pii(c: Column | str) -> Column:
    """Redact all PII_PATTERNS with typed placeholders (<EMAIL> / <IP> /
    <PHONE>), most-specific pattern first. One chained regexp_replace —
    single pass over the scan, 100 TB-safe."""
    out = _col(c)
    for name in _PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], PII_REPLACEMENTS[name])
    return out


# ---------------------------------------------------------------------------
# N-gram train/eval contamination
# ---------------------------------------------------------------------------


def _distinct_ngrams(tk: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) from an ALREADY-PROJECTED
    token array column; a document shorter than n tokens contributes its
    whole token string as one gram (mirrors dedup.shingles).

    Built by zipping n shifted slices (the repetition_cols trick) —
    O(n·len) total. The naive per-position `slice` inside a `transform`
    lambda re-evaluates the token expression per element, which measured
    ~7× slower end-to-end at sf0.1; callers must pass a projected token
    COLUMN, never the raw tokens(text) expression."""
    cnt = F.greatest(F.size(tk) - n + 1, F.lit(0))
    grams = F.slice(tk, n, cnt)
    for j in range(n - 1, 0, -1):
        grams = F.zip_with(F.slice(tk, j, cnt), grams, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(
        F.when(F.size(tk) >= n, grams).otherwise(F.array(F.array_join(tk, " ")))
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """GPT-3-style decontamination scan: for each EVAL document, how many
    of its distinct word n-grams appear verbatim anywhere in the TRAIN
    corpus. Returns (doc_id, n_grams, n_contaminated, contamination) —
    eval docs with contamination > 0 are the leak candidates.

    Plan shape (100 TB train side):
    - both sides explode to (gram_hash, id) pairs — the 60-bit md5-hash
      (cross-engine `char_hash60`) is what shuffles, never gram strings
      or document text;
    - train grams are DISTINCT-ed (partial agg before the shuffle), then
      LEFT-joined with a hit marker: because the right side is distinct,
      output stays at exactly one row per eval gram (no fan-out on hot
      grams), and one groupBy produces both n_grams and n_contaminated —
      the eval explode chain runs ONCE (a semi-join + separate totals
      agg scanned it twice). No full-corpus sort, no driver collect.

    Reference parity: the reference has no decontamination operator;
    this extends its document search surface (SURVEY §2.4 extension).
    """
    # corpus-membership contract on both frames
    train = train.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    eval_df = eval_df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    ev = (
        eval_df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
        .select("doc_id", F.explode(_distinct_ngrams(F.col("tk"), n)).alias("gram"))
        .select("doc_id", char_hash60("gram").alias("gh"))
    )
    tr = (
        train.select(tokens(text_col).alias("tk"))
        .select(F.explode(_distinct_ngrams(F.col("tk"), n)).alias("gram"))
        .select(char_hash60("gram").alias("gh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        ev.join(tr, on="gh", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 6),
        )
    )


# ---------------------------------------------------------------------------
# Line-level dedup (CCNet / RefinedWeb)
# ---------------------------------------------------------------------------


def line_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_len: int = 12,
) -> DataFrame:
    """Per-document duplicated-line statistics: a 'line' is a
    non-overlapping run of `line_len` tokens (web corpora split on
    newline; this fixture is newline-free, so fixed token windows are
    the line analogue — the operator is the same groupBy shape either
    way). A line is DUPLICATED if its hash occurs more than once in the
    whole corpus. Returns (doc_id, n_lines, n_dup_lines,
    dup_line_ratio) — CCNet drops docs with high ratios.

    Plan: explode lines → hash (60-bit, cross-engine) → one groupBy for
    global frequency (partial agg map-side) → join frequencies back on
    the hash → per-doc agg. Shuffles carry (hash, id) only; document
    text never reshuffles. The frequency table is corpus-distinct-lines
    sized; at 100 TB it stays a plain shuffle join (both sides keyed by
    the same hash — AQE handles hot duplicated lines)."""
    # project tokens ONCE — slicing a materialized array column is
    # cheap; slicing the tokens(text) expression inside the transform
    # lambda would re-tokenize per line (see _distinct_ngrams)
    # corpus-membership contract (pipeline/dedup.py): NULL-id /
    # NULL-text docs are not corpus members
    df = df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    lines = _token_lines(F.col("__tk"), line_len)
    exploded = (
        df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__tk"))
        .select("doc_id", F.explode(lines).alias("line"))
        .select("doc_id", char_hash60("line").alias("lh"))
    )
    freq = exploded.groupBy("lh").agg(F.count("*").alias("freq"))
    per_doc = (
        exploded.join(freq, on="lh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("freq") > 1, 1).otherwise(0)).alias("n_dup_lines"),
        )
    )
    # every input doc gets a row: empty/NULL-text docs have zero lines
    # (explode emits nothing for them), so left-join them back with
    # n_lines=0 and ratio 0.0 — a `dup_line_ratio > t` policy must SEE
    # them, not silently pass them through (r07 review)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("n_dup_lines", F.lit(0)).cast("bigint").alias("n_dup_lines"),
            F.when(F.coalesce("n_lines", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_dup_lines") / F.col("n_lines"), 6))
            .alias("dup_line_ratio"),
        )
    )


def scrub_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_len: int = 12,
    max_freq: int = 1,
) -> DataFrame:
    """Remove corpus-boilerplate lines from every document (the
    Dolma/RefinedWeb paragraph-dedup REMOVAL policy to
    line_dedup_stats' detection): a line (same non-overlapping
    ``line_len``-token window definition as the stats op) is cut from
    ALL documents when its corpus frequency exceeds ``max_freq``.
    Frequency-threshold removal is the scalable policy — "keep the
    first occurrence" needs a global document order, which a 100 TB
    corpus does not have.

    Output: (id_col, text) where text is the kept lines joined by a
    single space, in original order — i.e. the NORMALIZED token stream
    (lowercased alnum tokens), which is what the stats op hashes and
    what the downstream tokenizer consumes; docs made entirely of
    boilerplate come back empty rather than dropped (the drop decision
    belongs to a later filter with its own threshold).

    Plan shape (the scrub_duplicate_substrings pattern): document text
    is NEVER reshuffled — lines explode to (doc_id, pos, hash), one
    partial-agg groupBy finds hot hashes, a semi-join keeps only each
    doc's hot POSITIONS (a tiny per-doc int list), and the rebuild is
    a scan-stage index-filter over the original row. Shuffles carry
    (hash, id) and (doc_id, pos) only. Known trade: the tokenize+
    explode lineage evaluates for both the hot aggregate and the
    semi-join probe, and the rebuild re-tokenizes the base — 2-3 scan
    passes total. A persisted/checkpointed exploded frame would trade
    corpus-scale materialization for those passes; measure before
    switching (the r07 HITS persist regression — cached plans bypass
    AQE — is the cautionary precedent)."""
    # corpus-membership contract (pipeline/dedup.py): NULL-id /
    # NULL-text docs are not corpus members
    df = df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    lines = _token_lines(F.col("__tk"), line_len)
    base = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__tk"))
    exploded = base.select(
        "doc_id", F.posexplode(lines).alias("pos", "line")
    ).select("doc_id", "pos", char_hash60("line").alias("lh"))
    hot = (
        exploded.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > int(max_freq))
        .select("lh")
    )
    bad = (
        exploded.join(hot, on="lh", how="left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("__bad"))
    )
    kept = F.filter(
        lines,
        lambda _x, i: ~F.array_contains(F.coalesce(F.col("__bad"), F.array().cast("array<int>")), i.cast("int")),
    )
    return (
        base.join(bad, on="doc_id", how="left")
        .select("doc_id", F.array_join(kept, " ").alias("text"))
        .withColumnRenamed("doc_id", id_col)
    )


# ---------------------------------------------------------------------------
# Source mixture weights (temperature sampling)
# ---------------------------------------------------------------------------


def source_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled source sampling weights: w_i ∝ tokens_i^alpha
    (alpha < 1 upsamples small sources — the standard multilingual /
    multi-domain pretraining mixture rule). Returns (source, n_docs,
    n_tokens, raw_share, weight), weights summing to 1.

    One corpus groupBy (partial-agg, map-side combine) to per-source
    token counts; the normalization window runs over the tiny
    source-count aggregate (#sources rows), not the corpus. Weights are
    rounded to 9 dp so libm pow() ulp differences can't break the
    cross-engine oracle."""
    from pyspark.sql import Window

    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    powered = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 9).alias("raw_share"),
        F.round(powered / F.sum(powered).over(w), 9).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Gopher-style composite quality filter
# ---------------------------------------------------------------------------


def gopher_stats_cols(c: Column | str, tk: Column | None = None) -> dict[str, Column]:
    """The four Gopher-rule statistics (n_words / mean_word_len /
    symbol_ratio / stopword_hits), rounded as emitted. Project THESE
    first, then derive flags with gopher_flag_cols from the projected
    columns — computing stats and flags in one projection inlines each
    stat expression ~3× (stat + flag + keep), tripling the scan cost
    (measured at 200k docs)."""
    col = _col(c)
    if tk is None:
        tk = tokens(col)
    n_words = F.size(tk)
    # sum of token lengths == length of the concatenation — a codegen
    # string op instead of an interpreted higher-order fold
    mean_wlen = F.when(
        n_words > 0,
        F.length(F.array_join(tk, "")).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    # keep-class spares ALL whitespace, not just literal space: a
    # newline/tab/paragraph break is formatting, not a "symbol" — with
    # the old [A-Za-z0-9 ] class, 80-char-line prose accrued ~1.2%
    # symbol_ratio from newlines alone and list-formatted docs could
    # cross max_symbol_ratio and be wrongly dropped (r07 review)
    n_sym = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    symbol_ratio = F.when(
        F.length(col) > 0, n_sym.cast("double") / F.length(col)
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(F.array_intersect(F.array_distinct(tk), F.lit(STOPWORDS["en"])))
    return {
        "n_words": n_words,
        "mean_word_len": F.round(mean_wlen, 6),
        "symbol_ratio": F.round(symbol_ratio, 6),
        "stopword_hits": stop_hits,
    }


def gopher_flag_cols(
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.3,
    min_stopword_hits: int = 2,
    stats: dict[str, Column] | None = None,
) -> dict[str, Column]:
    """Per-rule flags + composite keep. By default the flags reference
    the PROJECTED gopher_stats_cols columns by name — cheap column
    references, so stacking them in a second select costs nothing. Pass
    `stats` (a gopher_stats_cols mapping) to build flags from inline
    expressions instead (the single-projection convenience path) — this
    is the ONLY copy of the rule logic either way."""
    s = stats if stats is not None else {
        k: F.col(k) for k in ("n_words", "mean_word_len", "symbol_ratio", "stopword_hits")
    }
    ok_words = (s["n_words"] >= min_words) & (s["n_words"] <= max_words)
    ok_wlen = (s["mean_word_len"] >= min_mean_word_len) & (
        s["mean_word_len"] <= max_mean_word_len
    )
    ok_symbols = s["symbol_ratio"] <= max_symbol_ratio
    ok_stop = s["stopword_hits"] >= min_stopword_hits
    return {
        "ok_words": ok_words,
        "ok_word_len": ok_wlen,
        "ok_symbols": ok_symbols,
        "ok_stopwords": ok_stop,
        "keep": ok_words & ok_wlen & ok_symbols & ok_stop,
    }


def gopher_filter_cols(
    c: Column | str,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.3,
    min_stopword_hits: int = 2,
    tk: Column | None = None,
) -> dict[str, Column]:
    """Gopher rule-shaped document filter (Rae et al. 2021 §A1.1):
    word-count window, mean-word-length window, symbol-to-alpha ratio
    cap, minimum distinct-stopword hits. Returns the per-rule boolean
    flags plus the composite `keep`. Thresholds are parameters; the
    defaults suit this fixture's short synthetic docs.

    Single-projection CONVENIENCE form (flags inline their stat
    expressions, so each stat evaluates ~3× — fine for small frames and
    tests). At corpus scale project gopher_stats_cols first, then stack
    gopher_flag_cols in a second select (the entry/__spark_entry__.py
    shape; measured 3× faster at 200k docs). Flags derive from the
    ROUNDED stats (the values this operator emits), so flag and stat
    can never disagree — and the SQL twin, which also flags on the
    rounded value, matches exactly."""
    stats = gopher_stats_cols(c, tk=tk)
    flags = gopher_flag_cols(
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_ratio, min_stopword_hits, stats=stats,
    )
    return {**stats, **flags}
