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
    NPEs on NULL vectors. search_lsh interposes an identity
    mapInPandas on the query side (the base side is already persisted,
    so an InMemoryRelation blocks its pushdown): Catalyst cannot push
    predicates through a Python eval node, and unlike persist() the
    barrier is lazy and leaves no CacheManager entry to leak across
    repeated searches. The shape below mirrors the crash: a real
    parquet scan (pushdown applies), NULL vectors in the data,
    vector_indexable on top."""
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


def test_lsh_pushdown_barrier_mechanism(spark, tmp_path):
    """Mechanism pin for the round-10 NPE fix (VERDICT r10 #3): the
    companion test above pins the SYMPTOM (no crash on NULL vectors),
    which only fails on data that happens to NPE. This pins the
    MECHANISM in the optimized plan so removing the barrier — or a
    future Spark learning to push predicates through Python eval
    nodes — fails loudly even on clean data:

      1. the query side contains the identity MapInPandas barrier, and
      2. in the subtree BELOW it (everything between the barrier and
         the parquet relation) no scala UDF appears — the MLlib hash
         UDF that approxSimilarityJoin's `size(hashes) > 0` filter
         would otherwise smuggle into the scan-level Filter, where CSE
         evaluates it ahead of the null guard; the null guard itself
         (the vector_indexable isnan/isnull lambda) must still be
         down there at the scan.
    """
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
    out = knn_lsh(q, base, k=3, bucket_length=4.0, num_hash_tables=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()

    lines = plan.splitlines()
    barrier_rows = [i for i, ln in enumerate(lines) if "MapInPandas" in ln]
    assert barrier_rows, f"query-side MapInPandas barrier missing:\n{plan}"
    i = barrier_rows[0]
    # Subtree below the barrier = consecutive lines whose node marker
    # ("+-") is indented deeper than the barrier's own.
    depth = lines[i].index("+-")
    below = []
    for ln in lines[i + 1:]:
        if "+-" not in ln or ln.index("+-") <= depth:
            break
        below.append(ln)
    subtree = "\n".join(below)
    assert "parquet" in subtree, (
        f"barrier subtree should bottom out at the parquet relation:\n{plan}"
    )
    assert "isnan" in subtree, (
        f"vector_indexable null guard missing below the barrier:\n{plan}"
    )
    assert "UDF(" not in subtree, (
        "scala hash UDF was pushed below the mapInPandas barrier — the "
        f"round-10 NPE mechanism has returned:\n{plan}"
    )
