"""Curation-op scale smoke: synthesize N deterministic documents (no
fixture dependency, no RNG — content is a pure function of doc id) and
time each pipeline/curate.py operator end-to-end with the noop sink.

The interesting question at scale is not per-row cost (these are
scans/partial-aggs) but whether the shuffle inventory stays bounded:
line_dedup's frequency groupBy, contamination's distinct+semi-join.
Prints one JSON line per op: {"op": ..., "n_docs": N, "sec": s,
"docs_per_sec": r}.

Usage: python scripts/curation_scale_smoke.py [n_docs] (default 200_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from oasisdb_spark.session import get_spark

VOCAB = (
    "the a of data table row scan filter join group window spark value part "
    "key hash batch query line customer fast slow big small merge order agg "
    "column vector index probe"
).split()


def synth_docs(spark, n: int, words_per_doc: int = 60):
    """Deterministic word-soup docs: token t of doc i is VOCAB[(i*61 + t*17) % V]
    over a ~50-doc period, so exact/near duplicate lines exist by
    construction (what line_dedup must find)."""
    v = len(VOCAB)
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                    lambda t: F.element_at(
                        vocab_arr,
                        (((F.col("id") % 50) * 61 + t * 17) % v + 1).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


def bench(name, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return name, round(time.perf_counter() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("curation_scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    from oasisdb_spark.pipeline.curate import (
        gopher_flag_cols,
        gopher_stats_cols,
        line_dedup_stats,
        ngram_contamination,
        pii_count_cols,
        scrub_pii,
        source_mixture_weights,
    )
    from oasisdb_spark.pipeline.text import tokens

    docs = synth_docs(spark, n).persist()
    docs.count()

    cnts = pii_count_cols("text")
    runs = [
        ("pii_scrub", docs.select(
            "doc_id", *[c.alias(k) for k, c in cnts.items()], scrub_pii("text").alias("s"))),
        ("gopher_filter", docs.select(
            "doc_id", "text", tokens("text").alias("__tk")
        ).select("doc_id", *[
            c.alias(k)
            for k, c in gopher_stats_cols("text", tk=F.col("__tk")).items()
        ]).select("*", *[c.alias(k) for k, c in gopher_flag_cols().items()])),
        ("line_dedup", line_dedup_stats(docs, line_len=12)),
        ("source_mixture", source_mixture_weights(docs)),
        ("ngram_contamination", ngram_contamination(
            docs.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"), n=8)),
    ]
    for name, df in runs:
        _, sec = bench(name, df)
        print(json.dumps({"op": name, "n_docs": n, "sec": sec,
                          "docs_per_sec": round(n / sec) if sec else None}))
    spark.stop()


if __name__ == "__main__":
    main()
