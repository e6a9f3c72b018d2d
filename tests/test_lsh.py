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


def test_lsh_survives_null_vectors_behind_indexable_filter(spark, tmp_path):
    """Round-10 NaN-sweep crash regression: MLlib's approxSimilarityJoin
    adds `size(hashes) > 0 AND isnotnull(hashes)` above its transform;
    Catalyst pushes it below the features Project, substituting
    hashes -> hashUDF(arrayToVector(vec)) into the scan-level Filter,
    where common-subexpression elimination evaluates the scala UDF
    EAGERLY — before the vector_indexable null-guard conjuncts — and
    NPEs on NULL vectors. search_lsh persists the query side (the base
    side already was) so the pushdown stops at the InMemoryRelation.
    The shape below mirrors the crash: a real parquet scan (pushdown
    applies), NULL vectors in the data, vector_indexable on top."""
    import pandas as pd

    from oasisdb_spark.functions.distance import vector_indexable

    pdf = pd.DataFrame({
        "vec_id": list(range(20)),
        "embedding": [
            None if i % 7 == 3 else [float(i), float(i % 5), 1.0, 0.0]
            for i in range(20)
        ],
    })
    path = str(tmp_path / "emb.parquet")
    pdf.to_parquet(path)
    emb = spark.read.parquet(path)
    base = emb.where(vector_indexable("embedding")).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    q = emb.filter(F.col("vec_id") < 10).where(
        vector_indexable("embedding")
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_lsh(q, base, k=3, bucket_length=4.0, num_hash_tables=2).collect()
    assert out  # pre-fix this raised FAILED_EXECUTE_UDF / NPE
    ids = {r["id"] for r in out}
    assert all(i % 7 != 3 for i in ids)
