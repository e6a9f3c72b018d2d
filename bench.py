"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect overhead). A warmup pass heats the JVM/codegen caches so
timings measure the plan, not JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from oasisdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline subset: one representative per operator family (the full set
# runs in the driver's correctness gate; the bench measures throughput
# of the plans that matter at scale).
HEADLINE = [
    "knn_flat_l2",          # expression-based exact kNN
    "knn_brute",            # GEMM exact kNN (scale path)
    "knn_ivf",              # probe-pruned approximate (build + search)
    "knn_ivfpq",            # compressed-scan + refine (build + search)
    "knn_lsh",              # random-projection tier
    "search_documents_filtered",
    "exact_dedup",
    "minhash_lsh_pairs",    # signatures + banding + verify
    "simhash",
    "text_stats",
    "langid",
    "doc_fingerprint",
    "dedup_clusters",       # LSH pairs -> connected components
    "tfidf_top_terms",      # explode + tf/df aggs + window top-3
    "sequence_pack_chunks", # training sequence packing (window cumsum)
    "training_corpus_pipeline",  # quality -> dedup -> sample composed
    "hybrid_search_rrf",    # keyword + vector RRF fusion
    "frequent_users",       # exact heavy hitters
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",  # pushdown showcase
    "q17_small_qty_revenue",  # decorrelated scalar subquery
    "q4_late_orders",       # non-equi EXISTS semi-join
    "q9_product_profit",    # LIKE-filtered multiway star
    "q18_large_orders",     # HAVING-subquery join-back
    "q19_disjunctive_revenue",  # OR-of-ANDs pushdown
    "events_asof_join",     # union+window as-of
    "top3_orders_per_customer",
    "customer_running_spend",
    "part_brand_rollup",
    "events_hourly",
    "events_sessionize",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("oasisdb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = {k: v for k, v in entrymod.queries().items() if k in HEADLINE}
    # Warmup AT THE BENCH SF: JIT/codegen-caches the plans and builds the
    # ANN indexes (memoized per (session, sf_dir) in __spark_entry__), so
    # the timed pass measures steady-state query throughput over BUILT
    # indexes — the reference benchmark's semantics (BASELINE.md: QPS of
    # search over a built collection, build excluded).
    for _ in range(2):
        for name, fn in qs.items():
            try:
                force(fn(spark, SF_DIR))
            except Exception:
                pass

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        force(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
