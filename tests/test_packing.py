"""Sequence packing: chunk_pack window math and greedy_pack invariants."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.packing import chunk_pack, greedy_pack


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d"),            # 4 tokens
        (8, "e f g"),              # 3 tokens, same bucket as 0 (mod 8)
        (16, ""),                  # empty doc, same bucket
        (1, " ".join(["w"] * 10)),  # 10 tokens: spans multiple len-4 chunks
        (9, "x"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_chunk_pack_positions(docs):
    out = {r["doc_id"]: r for r in chunk_pack(docs, seq_len=4, n_buckets=8).collect()}
    # bucket 0 stream: doc0 tokens [0,4) -> chunk 0 only; doc8 [4,7) -> chunk 1
    assert (out[0]["start_chunk"], out[0]["end_chunk"]) == (0, 0)
    assert (out[8]["start_chunk"], out[8]["end_chunk"]) == (1, 1)
    # empty doc anchors at its stream position (7 -> chunk 1), zero width
    assert out[16]["n_tokens"] == 0
    assert (out[16]["start_chunk"], out[16]["end_chunk"]) == (1, 1)
    # bucket 1: doc1 [0,10) -> chunks 0..2; doc9 [10,11) -> chunk 2
    assert (out[1]["start_chunk"], out[1]["end_chunk"]) == (0, 2)
    assert (out[9]["start_chunk"], out[9]["end_chunk"]) == (2, 2)


def test_greedy_pack_invariants(spark):
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate([9, 8, 7, 2, 2, 2, 1, 30])]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = greedy_pack(df, capacity=10, n_buckets=1).toPandas()
    # every doc packed exactly once
    assert sorted(out["doc_id"]) == list(range(8))
    # bins respect capacity except the oversize singleton
    sums = out.groupby("bin_id")["n_tokens"].sum()
    over = out[out["n_tokens"] > 10]
    assert set(over["doc_id"]) == {7}
    oversize_bins = set(over["bin_id"])
    assert all(s <= 10 for b, s in sums.items() if b not in oversize_bins)
    # the oversize doc sits alone in its bin
    assert (out["bin_id"].isin(oversize_bins)).sum() == 1
    # FFD with capacity 10 on [9,8,7,2,2,2,1] packs tightly: 9+1, 8+2, 7+2, 2
    assert len(sums) == 5


def test_greedy_pack_deterministic(spark, docs):
    a = sorted(map(tuple, greedy_pack(docs, capacity=8, n_buckets=2).collect()))
    b = sorted(map(tuple, greedy_pack(docs, capacity=8, n_buckets=2).collect()))
    assert a == b


def test_next_fit_invariants(spark):
    from pyspark.sql import functions as F

    from oasisdb_spark.pipeline.packing import next_fit_pack

    rows = [(i, "tok " * (30 + (i * 37) % 400)) for i in range(64)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = next_fit_pack(docs, capacity=256, n_buckets=4)
    got = out.collect()
    assert len(got) == 64
    # per-(bucket,bin) fill respects capacity unless a lone oversized doc
    fills = (
        out.groupBy("bucket", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        assert r["fill"] <= 256 or r["n"] == 1, r
    # bins are contiguous per bucket in doc_id order (next-fit never reopens)
    by_bucket = {}
    for r in sorted(got, key=lambda r: (r["bucket"], r["doc_id"])):
        seq = by_bucket.setdefault(r["bucket"], [])
        seq.append(r["bin_id"])
    for seq in by_bucket.values():
        assert seq == sorted(seq)
        assert seq[0] == 0 and max(seq) == len(set(seq)) - 1


def test_packers_null_text_counts_zero_tokens(spark):
    """r07 review: a NULL-text doc is 0 tokens — the old NULL n_tokens
    NaN-poisoned next_fit's running fill, cramming every later doc
    into one over-capacity bin."""
    from oasisdb_spark.pipeline.packing import greedy_pack, next_fit_pack

    rows = [(1, "a b c d e"), (2, None)] + [(i, "w x y z q") for i in range(3, 9)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = next_fit_pack(df, capacity=10)
    rows_out = out.collect()
    assert all(r["n_tokens"] is not None for r in rows_out)
    # no bin may exceed capacity (the NaN bug packed ~all docs in one)
    import collections
    fills = collections.Counter()
    for r in rows_out:
        fills[(r["bucket"] if "bucket" in out.columns else 0, r["bin_id"])] += r["n_tokens"]
    assert max(fills.values()) <= 10
    g = greedy_pack(df, capacity=10).collect()
    assert all(r["n_tokens"] is not None for r in g)
