"""LSH tier — the HNSW-capability equivalent (approximate kNN at a
tunable recall/latency knob).

Reference: the HNSW index (internal/index/hnsw.go + vendored hnswlib,
SURVEY.md §2.2 Q6) is a single-machine in-memory graph; a distributed
graph walk is the wrong physical design for Spark (per-hop shuffles).
Per SURVEY.md Q6 and the BASELINE north star, the capability to match
is batch top-k at tunable recall, provided here by:

(a) MLlib BucketedRandomProjectionLSH (random-hyperplane buckets for
    L2): build = model fit + bucket assignment; search =
    approxSimilarityJoin, a bucket-equi-join — shuffle-pruned like IVF.
(b) IVF with high nprobe (index/ivf.py) — usually the better
    recall/cost curve; the `efsearch` knob maps to `nprobe`
    (handlers.go:323-354 set_params semantics).

The knob here: bucketLength & numHashTables trade recall vs candidates
scanned, the same contract as efsearch (hnswalg.h:170 setEf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.index.flat import topk_per_query

__all__ = ["knn_lsh", "fit_lsh", "search_lsh"]


def fit_lsh(
    base: DataFrame,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "id",
    vec_col: str = "vector",
):
    """Build step (S8 for the LSH tier): fit the random projections and
    pre-hash the base table once. Returns (model, hashed_base) — the
    persisted hashed base is the index artifact; searches against it
    skip both the fit and the base-side re-hash (build-once/query-many,
    like the IVF build/search split)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    b = base.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(b)
    hashed = model.transform(b).persist()
    hashed.count()
    return model, hashed


def search_lsh(
    model,
    hashed_base: DataFrame,
    queries: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Search step over a fitted model + pre-hashed base."""
    from pyspark.ml.functions import array_to_vector

    # Pushdown barrier (round-10 NaN-sweep crash): MLlib's
    # approxSimilarityJoin adds `size(hashes) > 0 AND isnotnull(hashes)`
    # above its transform; Catalyst pushes that below the features
    # Project, substituting hashes -> hashUDF(arrayToVector(vec)) into
    # the scan-level Filter, where common-subexpression elimination
    # then evaluates the scala UDF EAGERLY — before the caller's
    # vector_indexable null-guard conjuncts — and NPEs on a NULL
    # vector. The persisted base side is immune because an
    # InMemoryRelation blocks pushdown; the query side gets an
    # identity mapInPandas instead: Catalyst cannot push predicates
    # through a Python eval node, and unlike persist() it is lazy,
    # distributed, and leaves no CacheManager entry to leak across
    # repeated searches in one session. The barrier sits BEFORE
    # array_to_vector (VectorUDT does not cross Arrow), so rows
    # reaching the scala UDF are exactly the caller-filtered ones.
    q_src = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_vec_arr"),
    )
    q_src = q_src.mapInPandas(lambda it: it, q_src.schema)
    q = q_src.select(
        "query_id", array_to_vector(F.col("_vec_arr")).alias("features")
    )
    joined = model.approxSimilarityJoin(q, hashed_base, float("inf"), distCol="l2_dist")
    scored = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.id").alias("id"),
        (F.col("l2_dist") * F.col("l2_dist")).alias("distance"),
    )
    return topk_per_query(scored, k)


def knn_lsh(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Approximate kNN via bucketed random projections (L2 only — the
    MLlib hash family is Euclidean). Returns (query_id, id, distance,
    rank) with distance = SQUARED L2 to match the engine's l2 space
    (distance.go:33-39); MLlib reports sqrt distances, so we square.
    One-shot convenience over fit_lsh + search_lsh."""
    model, hashed = fit_lsh(base, bucket_length, num_hash_tables, id_col, vec_col)
    return search_lsh(model, hashed, queries, k, query_id_col, query_vec_col)
