"""Persisted BM25 inverted index — the text twin of the vector tiers.

The ad-hoc BM25 query (``__spark_entry__._bm25_search``) re-derives
postings from raw text on every call; production keyword retrieval
builds the inverted index ONCE and serves many queries over it — the
same build/search split as the vector indexes (S8 build vs Q1 search,
`internal/index/index.go:22-52` Build/Search contract; this module is
the text analogue the reference lacks).

Index artifacts (all plain DataFrames / Parquet):
- ``postings``  (term, doc_id, tf, dl) — written SORTED BY term, so
  Parquet row-group min/max statistics prune non-matching terms at scan
  time (the columnar stand-in for a postings-list seek). Document
  length is DENORMALIZED into each posting — one extra int per row buys
  scoring without any join against a corpus-sized doc-length table.
- ``doclens``   (doc_id, dl) — kept for inspection/rebuild, not scoring.
- ``termdf``    (term, df) — document frequency, broadcast at search.
- ``stats``     (n_docs, avgdl) — one row, broadcast at search.

Search scans only the postings of the query's terms (predicate pushed
to the scan), joins two tiny broadcast sides, partial-aggregates
per-(query, doc) scores, and takes top-k — no full-corpus pass at query
time at any corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.text import tokens

__all__ = [
    "build_text_index",
    "add_to_text_index",
    "save_text_index",
    "load_text_index",
    "bm25_search_indexed",
]


def build_text_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, DataFrame]:
    """One corpus pass → the four index frames (see module docstring)."""
    # corpus-membership contract (pipeline/dedup.py): a NULL id cannot
    # be a retrieval result and NULL text has no tokens — and both
    # would skew n_docs/avgdl, shifting EVERY BM25 score in the corpus
    docs = docs.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    base = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
    doclens = base.select("doc_id", F.size("tk").alias("dl"))
    postings = (
        base.select("doc_id", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    termdf = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return {"postings": postings, "doclens": doclens, "termdf": termdf, "stats": stats}


def add_to_text_index(
    index: dict[str, DataFrame],
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Incremental index maintenance (the S8 ``add_to_index`` contract
    the vector tiers carry — `internal/index/ivf.go` AddBatch — applied
    to the text tier). Returns a NEW index dict; inputs are untouched.

    Everything merges without rescanning the existing corpus:
    - re-added doc_ids REPLACE their old postings (broadcast anti-join
      on the new batch's ids — newest-wins, the catalog's upsert rule),
    - postings/doclens union the delta,
    - termdf merges by summing per-term dfs (full-outer of two
      vocab-sized frames; the removed docs' df decrements come from a
      delta aggregate, not a corpus rescan),
    - stats re-derive from merged doclens counts/sums (one tiny agg
      over an already-small frame).
    """
    new_ids = new_docs.select(F.col(id_col).alias("doc_id")).distinct()
    old_postings = index["postings"].join(F.broadcast(new_ids), "doc_id", "left_anti")
    removed_df = (
        index["postings"]
        .join(F.broadcast(new_ids), "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_removed"))
    )
    delta = build_text_index(new_docs, id_col=id_col, text_col=text_col)

    postings = old_postings.unionByName(delta["postings"]).select(
        "term", "doc_id", "dl", "tf"
    )
    doclens = (
        index["doclens"]
        .join(F.broadcast(new_ids), "doc_id", "left_anti")
        .unionByName(delta["doclens"])
        .select("doc_id", "dl")
    )
    termdf = (
        index["termdf"]
        .join(removed_df, "term", "full")
        .select(
            "term",
            (F.coalesce(F.col("df"), F.lit(0)) - F.coalesce(F.col("_removed"), F.lit(0))).alias("df"),
        )
        .join(delta["termdf"].withColumnRenamed("df", "_new"), "term", "full")
        .select(
            "term",
            (F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("_new"), F.lit(0))).alias("df"),
        )
        .filter(F.col("df") > 0)
    )
    stats = doclens.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    return {"postings": postings, "doclens": doclens, "termdf": termdf, "stats": stats}


def save_text_index(index: dict[str, DataFrame], path: str) -> None:
    """Persist the index. Postings are sorted by term inside each file so
    Parquet row-group stats give term-pruned scans on load."""
    index["postings"].sortWithinPartitions("term").write.mode("overwrite").parquet(
        os.path.join(path, "postings")
    )
    for name in ("doclens", "termdf", "stats"):
        index[name].write.mode("overwrite").parquet(os.path.join(path, name))


def load_text_index(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(path, name))
        for name in ("postings", "doclens", "termdf", "stats")
    }


def bm25_search_indexed(
    index: dict[str, DataFrame],
    queries: list[str] | DataFrame,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """BM25 top-k over a BUILT index.

    ``queries`` is either one term list → (doc_id, bm25) rows, or a
    DataFrame (query_id, terms ARRAY<STRING>) → (query_id, doc_id,
    bm25, rank) with per-query top-k. Only documents containing at
    least one query term are scored (exactly the rows the postings
    join yields); scores round to 6dp so cross-engine ln/division
    agree. Literal single-query terms become an IN-filter on the
    postings scan — pushed to Parquet and pruned by the sorted-by-term
    row-group stats."""
    postings, termdf, stats = index["postings"], index["termdf"], index["stats"]

    single = not isinstance(queries, DataFrame)
    if single:
        hits = postings.filter(F.col("term").isin(list(queries)))
        hits = hits.withColumn("query_id", F.lit(0))
        # df side cut to the query's terms BEFORE broadcast — termdf is
        # vocabulary-sized, the filtered side is len(terms) rows
        df_side = termdf.filter(F.col("term").isin(list(queries)))
    else:
        qterms = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
        )
        hits = postings.join(F.broadcast(qterms), "term")
        df_side = termdf.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )

    scored = (
        hits.join(F.broadcast(df_side), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    if single:
        return (
            scored.drop("query_id")
            .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
            .limit(k)
        )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
