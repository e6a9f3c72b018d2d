"""Robust winnowing fingerprints (pipeline/winnow.py) — selection-rule
parity against a python reimplementation of the SIGMOD'03 spec, the
coverage guarantee, edge cases, and partitioning invariance."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.winnow import (
    POS_MOD,
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference implementation straight from the paper: per window of w
    gram hashes, select the minimum (rightmost on ties)."""
    clean = re.sub(r"[^a-z0-9]", "", text.lower())
    ng = len(clean) - k + 1
    if ng < 1:
        return set()
    hashes = [
        int(hashlib.md5(clean[i : i + k].encode()).hexdigest()[:10], 16)
        for i in range(ng)
    ]
    weff = min(w, ng)
    out: set[tuple[int, int]] = set()
    for i in range(ng - weff + 1):
        win = hashes[i : i + weff]
        m = min(win)
        # rightmost occurrence of the minimum
        p = i + max(j for j, h in enumerate(win) if h == m)
        out.add((p, hashes[p]))
    return out


def test_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    got = winnow_fingerprints(docs, k=8, w=4)
    by_doc: dict[int, set[tuple[int, int]]] = {}
    for r in got.collect():
        by_doc.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    for r in docs.select("doc_id", "text").collect():
        assert by_doc.get(r["doc_id"], set()) == _py_winnow(r["text"], 8, 4), r[
            "doc_id"
        ]


def test_coverage_guarantee(spark):
    """Any shared substring of length >= k + w - 1 yields a shared
    fingerprint — the theorem the selection rule exists for."""
    k, w = 8, 4
    shared = "thequickbrownfoxjumpsover"  # 25 >= k + w - 1 = 11
    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc " + shared + " dddd eeee"),
            (2, "zzzz " + shared + " yyyy xxxx wwww vvvv"),
        ],
        schema="doc_id LONG, text STRING",
    )
    fp = winnow_fingerprints(docs, k=k, w=w)
    a = {r["fp_hash"] for r in fp.where("doc_id = 1").collect()}
    b = {r["fp_hash"] for r in fp.where("doc_id = 2").collect()}
    assert a & b, "shared substring must produce a shared fingerprint"


def test_density_and_every_doc_covered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = winnow_fingerprints(docs, k=8, w=4)
    n_docs = docs.count()
    stats = fp.groupBy("doc_id").count()
    assert stats.count() == n_docs  # every doc >= 1 fingerprint
    total_grams = docs.select(
        F.sum(
            F.greatest(
                F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")) - 7,
                F.lit(0),
            )
        )
    ).first()[0]
    density = fp.count() / total_grams
    # expected 2/(w+1) = 0.4; generous band
    assert 0.25 < density < 0.55, density


def test_short_doc_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "abc"),  # < k normalized chars: no fingerprints
            (2, "abcdefgh"),  # exactly k chars = 1 gram: 1 fingerprint
            (3, "abcdefghi"),  # 2 grams < w: single whole-doc window
        ],
        schema="doc_id LONG, text STRING",
    )
    fp = winnow_fingerprints(docs, k=8, w=4)
    counts = {r["doc_id"]: r["count"] for r in fp.groupBy("doc_id").count().collect()}
    assert 1 not in counts
    assert counts[2] == 1
    assert counts[3] == 1
    pos = {r["doc_id"]: r["fp_pos"] for r in fp.collect()}
    assert pos[2] == 0


def test_partitioning_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, winnow_fingerprints(docs.repartition(1), k=8, w=4).collect()))
    b = sorted(map(tuple, winnow_fingerprints(docs.repartition(7), k=8, w=4).collect()))
    assert a == b


def test_oversize_doc_raises(spark):
    big = spark.createDataFrame(
        [(1, "a" * (POS_MOD + 8))], schema="doc_id LONG, text STRING"
    )
    with pytest.raises(Exception, match="exceeds"):
        winnow_fingerprints(big, k=8, w=4).collect()


def test_overlap_pairs_cross_group_only(spark):
    shared = "thequickbrownfoxjumpsoverthelazydog"
    docs = spark.createDataFrame(
        [
            (1, "aaaa " + shared + " bbbb", "src0"),
            (2, "cccc " + shared + " dddd", "src1"),
            (3, "eeee " + shared + " ffff", "src0"),  # same group as 1
        ],
        schema="doc_id LONG, text STRING, source STRING",
    )
    fp = winnow_fingerprints(docs, k=8, w=4)
    pairs = winnow_overlap_pairs(fp, docs, max_df=10, min_shared=2)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (2, 3) in got
    assert (1, 3) not in got  # same source never pairs


def test_overlap_pairs_df_cap(spark):
    """A fingerprint present in more than max_df docs must not create
    pairs on its own."""
    shared = "thequickbrownfoxjumpsoverthelazydog"
    rows = [(i, f"pad{i:04d} " + shared, f"src{i % 2}") for i in range(1, 8)]
    docs = spark.createDataFrame(rows, schema="doc_id LONG, text STRING, source STRING")
    fp = winnow_fingerprints(docs, k=8, w=4)
    # every shared fingerprint has df=7 > max_df=3 -> no pairs
    assert (
        winnow_overlap_pairs(fp, docs, max_df=3, min_shared=1)
        .where(F.col("shared_fps") >= 3)
        .count()
        == 0
    )


def test_bad_params_raise(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, w=0)
    with pytest.raises(ValueError):
        winnow_overlap_pairs(docs, docs, max_df=1)
