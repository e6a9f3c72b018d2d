"""Training-shard export (pipeline/export.py): deterministic layout
invariants + the parquet materialization round-trip."""

import shutil
import tempfile

from pyspark.sql import functions as F

from oasisdb_spark.pipeline.export import shard_assign, write_training_shards

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_shard_assign_partitions_and_positions(spark):
    out = shard_assign(_docs(spark), n_shards=8).collect()
    n = len(out)
    assert n == _docs(spark).count()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    # every shard's positions are exactly 0..k-1 (dense, zero-based)
    assert sum(len(v) for v in by_shard.values()) == n
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_shard_assign_deterministic_across_partitionings(spark):
    a = shard_assign(_docs(spark), n_shards=8).collect()
    b = shard_assign(_docs(spark).repartition(7), n_shards=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["shard_pos"]) for r in rows)
    assert key(a) == key(b)


def test_salt_changes_permutation(spark):
    a = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in shard_assign(_docs(spark), salt="epoch0").collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in shard_assign(_docs(spark), salt="epoch1").collect()}
    assert a != b  # a fresh epoch permutation
    assert set(a) == set(b)  # same documents


def test_write_training_shards_roundtrip(spark):
    path = tempfile.mkdtemp(prefix="oasis_shards_")
    try:
        docs = _docs(spark).withColumn("n_tokens", F.size(F.split("text", " ")))
        manifest = {r["shard"]: (r["n_docs"], r["n_tokens"])
                    for r in write_training_shards(docs, path, n_shards=4).collect()}
        back = spark.read.parquet(path)
        assert back.count() == docs.count()
        # manifest totals match the written data
        got = {r["shard"]: (r["n_docs"], r["n_tokens"]) for r in
               back.groupBy("shard").agg(F.count(F.lit(1)).alias("n_docs"),
                                         F.sum("n_tokens").alias("n_tokens")).collect()}
        assert got == manifest
        # layout parity: the written (shard, shard_pos) equals shard_assign's
        exp = sorted((r["doc_id"], r["shard"], r["shard_pos"])
                     for r in shard_assign(docs, n_shards=4).collect())
        assert sorted((r["doc_id"], r["shard"], r["shard_pos"])
                      for r in back.collect()) == exp
        # within each shard file set, parquet row order is shard_pos order
        for k in manifest:
            rows = [r["shard_pos"] for r in
                    spark.read.parquet(f"{path}/shard={k}").select("shard_pos").collect()]
            assert rows == sorted(rows)
    finally:
        shutil.rmtree(path, ignore_errors=True)
