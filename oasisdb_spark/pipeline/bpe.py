"""Mini-BPE tokenizer training (Sennrich et al., ACL 2016) as a
hash-gated distributed loop.

Byte-pair encoding learns a tokenizer by repeatedly merging the most
frequent adjacent symbol pair across the corpus vocabulary. This module
implements the training loop so that every step is CROSS-ENGINE EXACT —
the learned merge table (and any segmentation built from it) can be
replayed bit-for-bit by the DuckDB oracle, the same auditability
contract as the quantized k-means fit (pipeline/cluster_curate.py):
integer counts only, deterministic argmax tie-break (count DESC, then
lexicographic pair), and a merge-application rule built from the one
string primitive both engines implement identically.

Representation: each distinct word becomes a single-space-delimited
symbol string wrapped in spaces — "hello" -> " h e l l o " — so the
adjacent pair (l, r) occurs iff the substring " l r " occurs, and
applying the merge is replace(" l r " -> " lr "). `replace` scans
left-to-right non-overlapping in BOTH Spark (Java String.replace) and
DuckDB — verified identical including the consumed-boundary-space case
(" a b a b " -> " ab a b " in both). One pass misses an occurrence
whose leading space was consumed by the previous replacement, so each
merge applies the replace TWICE (the second pass catches exactly those;
pinned by test). For runs of the SAME pair (" a a a a a " ->
" aa a aa ") this deviates from sequential-greedy reference BPE in
symbol ORDER (multiset is identical) — a documented, deterministic
dialect, engine-exact on both sides.

Scale: the corpus is touched ONCE (word explode -> vocabulary counts —
the only corpus-sized shuffle). Every merge step then runs on the
VOCABULARY (distinct words), not the corpus: one pair-explode +
pair-keyed partial agg per step (pair key space is bounded by
alphabet^2 + merges), one TakeOrdered(1) argmax per step, one row to
the driver per step. Segmentation (`bpe_segment_expr`) folds the
learned merges into a pure scan-stage Column expression over the token
array — zero shuffle, no join.

Reference parity: the reference engine has no tokenizer training; this
extends the tokenizer family (SURVEY §2 extensions; `bpe_token_estimate`
in pipeline/text.py is the counting heuristic this learns for real).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.text import tokens

__all__ = [
    "bpe_word_vocab",
    "bpe_pair_counts",
    "bpe_learn_merges",
    "bpe_apply_merges_expr",
    "bpe_segment_expr",
]


def _spaced(word: Column) -> Column:
    """'hello' -> ' h e l l o ' (leading space + char-space pairs)."""
    return F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))


def bpe_word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(ws, cnt): the corpus vocabulary as spaced symbol strings with
    occurrence counts — the ONE corpus-sized shuffle of BPE training."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_spaced(F.col("w")).alias("ws"), "cnt")
    )


def bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) over the current symbol
    strings, weighted by word count. Vocabulary-sized explode + one
    bounded-key partial agg."""
    syms = F.split(F.trim(F.col("ws")), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("left_sym"),
            F.element_at(syms, i + 1).alias("right_sym"),
        ),
    )
    return (
        vocab.where(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.left_sym", "p.right_sym")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _merge_once(ws: Column, left: str, right: str) -> Column:
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    # twice: the second pass catches occurrences whose leading space
    # was consumed by a preceding replacement (see module docstring)
    return F.replace(F.replace(ws, pat, rep), pat, rep)


def bpe_learn_merges(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn the first n_merges BPE merges; returns (step, left_sym,
    right_sym, pair_count) — the merge table, in training order.

    Argmax tie-break is (pair_count DESC, left_sym ASC, right_sym ASC)
    — total and engine-exact. Stops early if no pair remains. Driver
    state: one 3-field row per step."""
    if n_merges < 1:
        raise ValueError(f"bpe_learn_merges: n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    vocab = bpe_word_vocab(df, text_col=text_col).persist()
    vocab.count()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            top = (
                bpe_pair_counts(vocab)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("left_sym").asc(),
                    F.col("right_sym").asc(),
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, c = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]
            merges.append((step, l, r, int(c)))
            nxt = vocab.select(
                _merge_once(F.col("ws"), l, r).alias("ws"), "cnt"
            ).persist()
            # lazily materialized by the next step's argmax; the old
            # cache can unpin immediately (rebuild cost is one pass)
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        merges, schema="step INT, left_sym STRING, right_sym STRING, pair_count BIGINT"
    )


def bpe_apply_merges_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """The spaced-symbol string of `word` after applying the learned
    merges in order — a pure Column expression (zero shuffle)."""
    ws = _spaced(word)
    for l, r in merges:
        ws = _merge_once(ws, l, r)
    return ws


def bpe_segment_expr(text: Column | str, merges: list[tuple[str, str]]) -> Column:
    """BPE token count of a text under the learned merges, as a single
    scan-stage Column expression: tokenize, apply the merge chain per
    word, sum symbol counts. Zero shuffle, no join — the merge table is
    folded into the expression as literals."""
    c = F.col(text) if isinstance(text, str) else text
    per_word = F.transform(
        tokens(c),
        lambda w: F.size(F.split(F.trim(bpe_apply_merges_expr(w, merges)), " ")),
    )
    return F.coalesce(
        F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x), F.lit(0)
    ).cast("long")
