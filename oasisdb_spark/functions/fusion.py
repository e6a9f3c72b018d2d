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

__all__ = ["hybrid_search_rrf"]


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
    w_vec = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("doc_id").asc()
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
