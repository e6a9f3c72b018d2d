"""Text analysis operators for training-data pipelines.

All of these are pure Column expressions (JVM-side, codegen-eligible) so
they run inside the scan stage with zero shuffle and zero Python cost —
the correct shape for a 100 TB documents table. Each has an exact DuckDB
SQL twin used by the driver's correctness oracle (__spark_entry__.py).

Ops: normalization, tokenization, token/char statistics, quality score,
language ID (stopword-hit heuristic), content fingerprints (md5 + 60-bit
integer hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "tokens",
    "distinct_tokens",
    "token_count",
    "char_hash60",
    "fingerprint_md5",
    "text_stats_cols",
    "quality_score",
    "repetition_cols",
    "langid_expr",
    "pretokens",
    "bpe_token_estimate",
    "STOPWORDS",
]

# Token = runs of lowercase alphanumerics after lowering; the regex is
# deliberately simple so the DuckDB twin (regexp_split_to_array) agrees.
_TOKEN_SEP = "[^a-z0-9]+"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: Column | str) -> Column:
    """lower + trim + collapse whitespace — the canonical form used by
    exact dedup and fingerprints."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    t = F.split(F.lower(_col(c)), _TOKEN_SEP)
    return F.filter(t, lambda x: x != "")


def distinct_tokens(c: Column | str) -> Column:
    return F.array_distinct(tokens(c))


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


# GPT-2-style PRE-tokenizer segments, restricted to the regex subset
# both engines share: letter runs, digit runs, non-space-symbol runs.
# (The upstream gpt2 pattern adds contraction splits and a \s+(?!\S)
# lookahead; RE2 — DuckDB's engine — has no lookahead, and contraction
# handling is vocabulary trivia, not segmentation structure.)
_PRETOKEN_RE = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def pretokens(c: Column | str) -> Column:
    """BPE pre-tokenizer piece array (see _PRETOKEN_RE). Unlike
    ``tokens`` this is case-preserving and splits letter/digit/symbol
    boundaries the way subword tokenizers do ("abc123!" -> 3 pieces,
    where ``tokens`` lowercases and merges to "abc123").

    NULL text counts as an EMPTY document (ADVICE r04): the input is
    coalesced to '' so downstream F.size(...) is 0 and
    bpe_token_estimate is 0 — matching the shard-manifest / budget
    oracles' COALESCE(..., 0) — instead of NULL/-1 leaking into token
    budgets."""
    return F.regexp_extract_all(
        F.coalesce(_col(c), F.lit("")), F.lit(_PRETOKEN_RE), 0
    )


def bpe_token_estimate(c: Column | str) -> Column:
    """Deterministic BPE token-count ESTIMATE: sum of ceil(len/4) over
    pre-tokenizer pieces — each piece costs at least one token and long
    pieces split roughly every ~4 chars (the observed byte-per-token
    rate of GPT-2/cl100k-class vocabularies on English). Integer
    arithmetic end to end, so the estimate is engine-exact and
    oracle-able — the point is a REPRODUCIBLE budget/billing metric
    (token_budget_sample, mixture weights, shard manifests), not
    vocabulary-faithful counts, which need the real tokenizer model.
    Pure Column expression: zero shuffle, zero Python."""
    return F.aggregate(
        pretokens(c),
        F.lit(0).cast("bigint"),
        lambda acc, p: acc + F.floor((F.length(p) + 3) / 4).cast("bigint"),
    )


def char_hash60(c: Column | str) -> Column:
    """60-bit integer content hash from md5 — identical in DuckDB as
    ('0x'||substr(md5(s),1,15))::BIGINT (verified bit-equal)."""
    return F.conv(F.substring(F.md5(_col(c)), 1, 15), 16, 10).cast("bigint")


def fingerprint_md5(c: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (the rolling-hash
    role from SURVEY's fingerprinting extension, in a cross-engine form)."""
    return F.md5(normalize_text(c))


def text_stats_cols(c: Column | str) -> dict[str, Column]:
    """Quality-signal statistics (length / punct / digit / stopword
    ratios). Returned as named columns; each is SQL-twinnable."""
    col = _col(c)
    n_chars = F.length(col)
    toks = tokens(col)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), F.lit(STOPWORDS["en"])))
    avg_word_len = F.when(n_tokens > 0, F.round(n_alpha.cast("double") / n_tokens, 4)).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_word_len": avg_word_len,
        "alpha_ratio": F.round(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "digit_ratio": F.round(n_digit.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_hits": n_stop,
    }


def quality_score(c: Column | str | None = None, stats: dict[str, Column] | None = None) -> Column:
    """Heuristic quality in [0,1]: rewards mid-length docs with words and
    some stopword mass; penalizes digit/punct-heavy content. Deterministic
    and SQL-twinnable (no floats beyond round-4 arithmetic).

    Pass `stats` (columns named as text_stats_cols returns, e.g. already
    projected in a prior select) to avoid re-deriving the statistics —
    tokenization dominates, so score-from-projected-stats is the cheap
    path when both are emitted together."""
    s = stats if stats is not None else text_stats_cols(c)
    len_ok = F.when((s["n_chars"] >= 50) & (s["n_chars"] <= 20000), F.lit(0.4)).otherwise(F.lit(0.0))
    word_ok = F.when(s["n_tokens"] >= 10, F.lit(0.3)).otherwise(F.lit(0.0))
    stop_ok = F.when(s["stopword_hits"] >= 2, F.lit(0.2)).otherwise(F.lit(0.0))
    clean = F.when((s["digit_ratio"] < 0.3) & (s["punct_ratio"] < 0.2), F.lit(0.1)).otherwise(F.lit(0.0))
    return F.round(len_ok + word_ok + stop_ok + clean, 2)


def repetition_cols(c: Column | str, ngram: int = 3, pretokenized: bool = False) -> dict[str, Column]:
    """Gopher-style repetition signals: lexical diversity (distinct /
    total tokens) and duplicate n-gram mass (1 - distinct/total
    n-grams). Repetitive boilerplate and degenerate generations score
    low diversity / high dup mass — the standard pre-training filter
    axis alongside length/punct quality. Pure Column expressions, one
    scan, SQL-twinnable.

    pretokenized=True treats `c` as an already-tokenized array column —
    project `tokens(text)` once in a prior select and derive all three
    stats from it (regex tokenization dominates; the two-step projection
    measured 2.2× faster than re-deriving tokens per output column)."""
    col = _col(c)
    toks = col if pretokenized else tokens(col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # n-grams by zipping ngram shifted slices — O(n) total, unlike a
    # per-index slice inside transform (O(n·ngram) array copies per
    # element = O(n²), measured 20 s vs <1 s on the sf0.1 corpus)
    cnt = F.greatest(n_tokens - ngram + 1, F.lit(0))
    grams = F.slice(toks, ngram, cnt)
    for j in range(ngram - 1, 0, -1):
        grams = F.zip_with(
            F.slice(toks, j, cnt), grams, lambda x, y: F.concat(x, F.lit(" "), y)
        )
    n_grams = F.size(grams)
    n_gram_distinct = F.size(F.array_distinct(grams))
    diversity = F.when(
        n_tokens > 0, F.round(n_distinct.cast("double") / n_tokens, 6)
    ).otherwise(F.lit(1.0))
    dup_mass = F.when(
        n_grams > 0,
        F.round(F.lit(1.0) - n_gram_distinct.cast("double") / n_grams, 6),
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": n_tokens,
        "token_diversity": diversity,
        "dup_ngram_ratio": dup_mass,
    }


# Small deterministic stopword inventories for the langid heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "en", "por"],
}
_LANG_ORDER = ["de", "en", "es", "fr"]  # deterministic tiebreak order


def langid_expr(c: Column | str) -> Column:
    """n-gram/stopword language ID: argmax over per-language distinct
    stopword hits; ties break by language-code order; zero hits → 'und'.
    """
    toks = distinct_tokens(c)
    scores = {lang: F.size(F.array_intersect(toks, F.lit(words))) for lang, words in STOPWORDS.items()}
    best = None
    for lang in _LANG_ORDER:
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            # strictly-greater keeps the earlier lang on ties
            best = (F.greatest(best[0], s), F.when(s > best[0], F.lit(lang)).otherwise(best[1]))
    return F.when(best[0] > 0, best[1]).otherwise(F.lit("und"))
