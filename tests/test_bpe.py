"""Mini-BPE training (pipeline/bpe.py) — parity against a python
reimplementation of the documented merge dialect, the engine-identical
replace edge cases, and determinism."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.bpe import (
    bpe_learn_merges,
    bpe_pair_counts,
    bpe_segment_expr,
    bpe_word_vocab,
)


def _py_spaced(w: str) -> str:
    return " " + "".join(ch + " " for ch in w)


def _py_replace_twice(s: str, pat: str, rep: str) -> str:
    # str.replace is leftmost non-overlapping scan — same as Java/DuckDB
    return s.replace(pat, rep).replace(pat, rep)


def _py_learn(texts: list[str], n: int) -> list[tuple[int, str, str, int]]:
    words = [
        w
        for t in texts
        for w in re.split(r"[^a-z0-9]+", t.lower())
        if w != ""
    ]
    vocab = Counter(_py_spaced(w) for w in words)
    merges = []
    for step in range(1, n + 1):
        pairs: Counter = Counter()
        for ws, cnt in vocab.items():
            syms = ws.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, c))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        vocab = Counter(
            {
                k: sum(
                    v for kk, v in vocab.items()
                    if _py_replace_twice(kk, pat, rep) == k
                )
                for k in {_py_replace_twice(kk, pat, rep) for kk in vocab}
            }
        )
    return merges


def test_learn_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _py_learn(texts, 6)
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_learn_merges(docs, n_merges=6).orderBy("step").collect()
    ]
    assert got == expected


def test_segment_counts_match_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    merges_rows = bpe_learn_merges(docs, n_merges=5).collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in merges_rows]
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_segment_expr("text", merges).alias("n")
        ).collect()
    }
    for doc_id, text in texts.items():
        total = 0
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if not w:
                continue
            ws = _py_spaced(w)
            for l, r in merges:
                ws = _py_replace_twice(ws, f" {l} {r} ", f" {l}{r} ")
            total += len(ws.split())
        assert got[doc_id] == total, doc_id


def test_merge_run_dialect_pinned(spark):
    """The documented deviation from sequential-greedy BPE: a run of
    the same pair merges as ' aa a aa ' (leftmost-replace-twice), not
    ' aa aa a '. Pin it so an engine change can't silently move it."""
    docs = spark.createDataFrame([(1, "aaaaa")], schema="doc_id LONG, text STRING")
    vocab = bpe_word_vocab(docs)
    pc = bpe_pair_counts(vocab).collect()
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in pc] == [
        ("a", "a", 4)
    ]
    m = bpe_learn_merges(docs, n_merges=2).collect()
    assert (m[0]["left_sym"], m[0]["right_sym"], m[0]["pair_count"]) == ("a", "a", 4)
    # after merge 1 vocab is ' aa a aa ': pairs (aa,a)=1 and (a,aa)=1;
    # tie-break picks lexicographic (a, aa)
    assert (m[1]["left_sym"], m[1]["right_sym"], m[1]["pair_count"]) == ("a", "aa", 1)


def test_vocab_weighting(spark):
    """Pair counts are weighted by word frequency, not distinct words."""
    docs = spark.createDataFrame(
        [(1, "dog dog dog cat")], schema="doc_id LONG, text STRING"
    )
    pc = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in bpe_pair_counts(bpe_word_vocab(docs)).collect()
    }
    assert pc[("d", "o")] == 3 and pc[("o", "g")] == 3 and pc[("c", "a")] == 1


def test_early_stop_when_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b c d")], schema="doc_id LONG, text STRING")
    assert bpe_learn_merges(docs, n_merges=4).count() == 0


def test_partitioning_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = bpe_learn_merges(docs.repartition(1), n_merges=4).collect()
    b = bpe_learn_merges(docs.repartition(7), n_merges=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bad_params_raise(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        bpe_learn_merges(docs, n_merges=0)


def test_segment_null_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hi")], schema="doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_segment_expr("text", [("h", "i")]).alias("n")
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1}
