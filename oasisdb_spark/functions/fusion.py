"""Hybrid search: keyword + vector retrieval fused with RRF.

The reference's ``search_documents`` (document.go:171-247) is
vector-only with an aspirational metadata filter; the standard
evolution of that API is hybrid retrieval — a lexical signal and a
vector signal combined by reciprocal-rank fusion:

    rrf(d) = sum_signals 1 / (k0 + rank_signal(d))

RRF is rank-based, so the two scores never need calibrating against
each other. Everything here is JVM Column expressions over one
broadcast cross join (queries are a handful of rows; the document side
is never shuffled before scoring), then two windowed ranks and a
windowed top-k — three narrow shuffles of (query x candidate) pairs,
each bounded by the candidate count, never by corpus size. At 100 TB
you cut candidates first (LSH/IVF for vectors, an inverted term index
for keywords) and fuse only the union of the two candidate sets; the
fusion math below is unchanged.

Ties everywhere break by doc_id so ranks — and the fused output — are
total-ordered and reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oasisdb_spark.functions.distance import distance_expr
from oasisdb_spark.pipeline.text import distinct_tokens

__all__ = ["hybrid_search_rrf", "rrf_fuse"]


def hybrid_search_rrf(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    space: str = "l2",
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "vector",
) -> DataFrame:
    """Fuse keyword overlap and vector distance into one ranked list.

    ``queries`` needs (query_id, query_vec, query_terms:array<string>).
    Returns (query_id, doc_id, rank, rrf_score, text_rank, vec_rank).
    """
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        distinct_tokens(text_col).alias("__toks"),
        F.col(vec_col).alias("__vec"),
    ).crossJoin(F.broadcast(queries.select("query_id", "query_vec", "query_terms")))

    scored = pairs.select(
        "query_id",
        "doc_id",
        F.size(F.array_intersect("__toks", "query_terms")).alias("text_hits"),
        distance_expr(space, "query_vec", "__vec").alias("dist"),
    )
    w_text = Window.partitionBy("query_id").orderBy(
        F.col("text_hits").desc(), F.col("doc_id").asc()
    )
    # asc_nulls_last: a doc with a NULL vector has NULL distance, and
    # Spark's plain asc sorts NULLs FIRST -- it would top every vector
    # ranking (and DuckDB sorts NULLs LAST, a cross-engine divergence)
    w_vec = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc_nulls_last(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "query_id",
        "doc_id",
        F.row_number().over(w_text).alias("text_rank"),
        F.row_number().over(w_vec).alias("vec_rank"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(rrf_k) + F.col("text_rank"))
        + F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rank"))
    )
    w_out = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        ranked.withColumn("rrf_score", F.round(rrf, 8))
        .withColumn("rank", F.row_number().over(w_out))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "rrf_score", "text_rank", "vec_rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of ANY ranked lists (the composition
    primitive behind hybrid retrieval over BUILT indexes: feed it a BM25
    ranking from index/text.py and a kNN ranking from any vector tier).

    Each input is (query_col, id_col, rank_col); a document absent from
    a list simply contributes nothing for that list (standard RRF over
    the union). Returns (query_col, id_col, rank, rrf_score) — per-query
    top-k by fused score, doc-id tiebreak.

    Plan shape: union of the (small, already-top-k) ranked lists → one
    partial-aggregated groupBy on (query, doc) → window top-k. Nothing
    corpus-sized is touched; fusion cost scales with k·n_lists·queries.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(rrf_k) + F.col(rank_col).cast("double"))).alias("_c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(F.round(F.sum("_c"), 8).alias("rrf_score"))
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "rrf_score")
    )
