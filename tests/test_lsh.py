"""LSH tier (HNSW-capability): recall vs Flat oracle — mirrors the
reference's recall-as-correctness pattern (benchmarks/run_benchmarks.py:136-142)."""

from pyspark.sql import functions as F

from oasisdb_spark.index.flat import knn_flat
from oasisdb_spark.index.lsh import knn_lsh


def test_lsh_recall(spark, embeddings):
    base = embeddings.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = knn_lsh(q, base, k=10, bucket_length=4.0, num_hash_tables=4)
    exact = knn_flat(q, base, k=10)
    a, e = {}, {}
    for r in approx.collect():
        a.setdefault(r["query_id"], set()).add(r["id"])
    for r in exact.collect():
        e.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [len(a.get(qid, set()) & e[qid]) / 10 for qid in e]
    assert sum(recalls) / len(recalls) >= 0.5

    # squared-L2 contract: self-distance 0, monotone ranks
    rows = [r for r in approx.collect() if r["query_id"] == "0" and r["id"] == "0"]
    assert rows and rows[0]["distance"] == 0.0
