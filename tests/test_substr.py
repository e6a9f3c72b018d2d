"""ExactSubstr duplicated-span operators (pipeline/dedup.py:
duplicate_substring_positions / _stats / scrub_duplicate_substrings)
vs a brute-force Python reference."""

from __future__ import annotations

import pytest

from oasisdb_spark.pipeline.dedup import (
    duplicate_substring_positions,
    duplicate_substring_stats,
    scrub_duplicate_substrings,
)


def brute_spans(texts: dict, L: int, min_count: int = 2) -> dict:
    """Reference: per-doc merged [start, end] (1-based inclusive) spans
    of L-gram windows whose gram occurs >= min_count times overall."""
    from collections import Counter

    counts = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            counts[t[i:i + L]] += 1
    spans = {}
    for d, t in texts.items():
        pos = [i + 1 for i in range(len(t) - L + 1) if counts[t[i:i + L]] >= min_count]
        merged = []
        for p in pos:
            if merged and p <= merged[-1][1] - L + 1 + L:  # p <= prev_pos + L
                merged[-1] = (merged[-1][0], max(merged[-1][1], p + L - 1))
            else:
                merged.append((p, p + L - 1))
        spans[d] = merged
    return spans


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog near the river bank today",
    2: "an entirely different sentence with the quick brown fox jumps over the lazy dog inside it",
    3: "nothing here repeats anywhere else in this tiny corpus of text",
    4: "prefix AAAA the quick brown fox jumps over the lazy dog suffix BBBB",
    5: "short",
    6: "zz self repeat self repeat self repeat self repeat zz ends here now",
}


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], ["doc_id", "text"]
    )


def test_positions_match_brute(spark, corpus_df):
    L = 15
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_substring_positions(corpus_df, min_length=L).collect()
    }
    want = {
        (d, s, e) for d, sp in brute_spans(CORPUS, L).items() for (s, e) in sp
    }
    assert got == want
    assert got  # non-trivial: the shared fox sentence must be found


def test_within_doc_repeats_detected(spark, corpus_df):
    # doc 6's "self repeat" block repeats only within itself
    L = 12
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicate_substring_positions(corpus_df, min_length=L).collect()
        if r.doc_id == 6
    }
    assert 6 in spans


def test_stats_match_brute(spark, corpus_df):
    L = 15
    rows = duplicate_substring_stats(corpus_df, min_length=L).collect()
    assert {r.doc_id for r in rows} == set(CORPUS)  # every doc present
    want = brute_spans(CORPUS, L)
    for r in rows:
        spans = want[r.doc_id]
        assert r.doc_len == len(CORPUS[r.doc_id])
        assert r.dup_spans == len(spans)
        assert r.dup_chars == sum(e - s + 1 for s, e in spans)
        assert r.dup_ratio == pytest.approx(r.dup_chars / r.doc_len)


def test_hash_grams_equivalent(spark, corpus_df):
    L = 15
    a = sorted(map(tuple, duplicate_substring_positions(corpus_df, min_length=L).collect()))
    b = sorted(map(tuple, duplicate_substring_positions(
        corpus_df, min_length=L, hash_grams=True).collect()))
    assert a == b
    # two-salt 128-bit key (the 100 TB setting — collision expectation
    # ~n^2/2^129, see SCALING.md) must also agree, as must the exact
    # string-gram mode
    c = sorted(map(tuple, duplicate_substring_positions(
        corpus_df, min_length=L, hash_grams="wide").collect()))
    d = sorted(map(tuple, duplicate_substring_positions(
        corpus_df, min_length=L, hash_grams=False).collect()))
    assert a == c == d


def test_scrub_matches_brute(spark, corpus_df):
    L = 15
    got = {r.doc_id: r.text for r in scrub_duplicate_substrings(corpus_df, min_length=L).collect()}
    want = brute_spans(CORPUS, L)
    for d, t in CORPUS.items():
        kept, cur = [], 1
        for s, e in want[d]:
            kept.append(t[cur - 1:s - 1])
            cur = e + 1
        kept.append(t[cur - 1:])
        assert got[d] == "".join(kept), d
    # the shared sentence is gone from every copy (paper policy: all copies)
    assert "quick brown fox" not in got[1]
    assert "quick brown fox" not in got[2]
    assert got[3] == CORPUS[3]  # clean doc passes through unchanged
    assert got[5] == CORPUS[5]  # shorter than L: untouched


def test_fixture_corpus_sanity(spark, documents):
    # at sf0.001 the synthetic near-dups carry real >=30-char duplicated spans
    stats = duplicate_substring_stats(documents, min_length=30)
    flagged = stats.filter("dup_chars > 0")
    assert flagged.count() > 0
    bad = stats.filter("dup_chars > doc_len OR dup_ratio > 1.0 OR dup_ratio < 0.0").count()
    assert bad == 0
