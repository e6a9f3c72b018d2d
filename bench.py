"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
TWO JSON lines (VERDICT r09 #2): first {"families": {family: sec}} on
its own line, then a FINAL line ≤ 1,500 chars with {"metric": ...,
"value": total_sec, "unit": "sec", "sf": ..., "method": ...,
"n_queries": N, "per_query_record": "BENCH_LOCAL_sf*.json"}. The
driver captures the last 2,000 chars of stdout and json-parses the
final line; head-truncation of the families line is salvaged by
scripts/bench_diff.py. The full per-query map is written to the
committed record file — a 160+-entry dict overflows any line.

Queries are grouped into FAMILIES so regressions localize round-over-
round (the relational tier runs the full 22-query TPC-H-shape sweep as
one subtotal). The ANN family measures the APPROXIMATE plans via
bench_queries() — the driver's correctness gate runs the exact-mode
configurations, which would overstate search cost here.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect overhead). A warmup pass heats the JVM/codegen caches and
builds the memoized ANN indexes, so timings measure steady-state query
throughput over BUILT indexes — the reference benchmark's semantics
(BASELINE.md: QPS of search over a built collection, build excluded).

Each query is then timed SPARK_GRAFT_BENCH_PASSES times (default 2) and
the per-query MINIMUM is reported: single sub-second runs on a shared
local[32] JVM carry ±50% GC/scheduler jitter (measured: the same query
swung 2.27 s ↔ 0.48 s across identical back-to-back runs), and min-of-n
is the standard steady-state estimator under one-sided noise. Since
round 7 every SUB-SECOND entry gets one additional pass (min-of-3) —
at 160+ timed queries in one JVM the sub-second tail is where
single-session pressure shows up, per BASELINE.md's noise-floor study;
the JSON's "method" object records the estimator used for the round's
numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from oasisdb_spark.ckpt import release_tracked
from oasisdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# family -> representative queries (registry names, plus bench-only
# approximate ANN variants from bench_queries())
FAMILIES: dict[str, list[str]] = {
    "vector_exact": ["knn_flat_l2", "knn_brute", "knn_hamming_packed"],
    "vector_approx": ["knn_ivf_probe", "knn_ivfpq_adc", "knn_ivfsq_probe", "knn_lsh_fast"],
    "search_api": ["search_documents_filtered", "hybrid_search_rrf", "bm25_search"],
    "dedup": [
        "exact_dedup", "minhash_lsh_pairs", "simhash",
        "dedup_clusters", "embedding_neardup", "substring_dup_stats",
        "substring_dup_fast",
    ],
    "text": ["text_stats", "langid", "doc_fingerprint", "doc_repetition", "tfidf_top_terms", "lm_perplexity", "perplexity_buckets"],
    "corpus_ops": [
        "sequence_pack_chunks", "training_corpus_pipeline",
        "frequent_users", "events_approx_distinct",
    ],
    "multimodal": ["multimodal_decode", "multimodal_frames"],
    "tpch_sweep": [
        "q1_pricing_summary", "q2_cheapest_supplier", "q3_shipping_priority",
        "q4_late_orders", "q5_nation_revenue", "q6_forecast_revenue",
        "q7_nation_trade", "q8_market_share", "q9_product_profit",
        "q10_returned_items", "q11_value_concentration", "q12_priority_shipping",
        "order_count_distribution", "q14_promo_revenue", "q15_top_supplier",
        "q16_supplier_counts", "q17_small_qty_revenue", "q18_large_orders",
        "q19_disjunctive_revenue", "q20_part_share_suppliers",
        "q21_last_to_ship", "q22_dormant_customers",
    ],
    # round-3 addition (families above are unchanged so r02→r03 diffs
    # stay mechanical)
    "curation": [
        "pii_scrub", "ngram_contamination", "line_dedup",
        "source_mixture", "gopher_filter", "curation_pipeline",
    ],
    "filtered_ann": ["search_filtered_ivf", "search_filtered_ivf_probe"],
    "binary_quant": ["knn_binq_fast"],
    "late_interaction": ["maxsim_search"],
    "sampling": ["quality_prune", "token_budget_sample", "sliding_chunks"],
    "profiling": ["table_profile"],
    "text_index": ["bm25_search_indexed", "hybrid_search_indexed"],
    "evaluation": ["lsh_recall_eval"],
    "dimred": ["pca_knn"],
    # round-3 batch 2 (additive — earlier families untouched)
    "analytics": ["event_funnel", "cohort_retention", "heavy_hitters"],
    "weighted_sampling": ["weighted_sample"],
    "layout": ["zorder_scan"],
    "perceptual_hash": ["image_dhash"],
    "setsim_join": ["jaccard_pairs_prefix"],
    "fuzzy_join": ["fuzzy_name_pairs"],
    "bloom_join": ["bloom_semijoin"],
    "semantic_dedup": ["semantic_dedup", "semantic_dedup_fast"],
    "windows_events": [
        "top3_orders_per_customer", "customer_running_spend", "part_brand_rollup",
        "events_asof_join", "events_hourly", "events_sessionize",
    ],
    # round-4 additions (additive — earlier families untouched)
    "shard_export": ["training_shards", "shard_manifest"],
    "tokenizer": ["token_estimate"],
    "rank_eval": ["retrieval_rank_eval"],
    "data_quality": ["data_quality_gate", "orders_snapshot_diff"],
    "curation_scrub": ["line_scrub"],
    "quality_stream": ["quality_gate_stream"],
    "dedup_canonical": ["dedup_keep_best"],
    "timeseries": ["events_hourly_gapfill"],
    "interval_join": ["activity_hot_overlap"],
    "leakage_split": ["leakage_safe_split"],
    # round-5 additions (additive — earlier families untouched)
    "dedup_wide": ["substring_dup_wide"],
    "data_selection": ["dsir_select", "dsir_select_join", "docs_dsir_stream"],
    "mining": ["hard_negatives", "hard_negatives_ivf_probe"],
    "sample_construction": ["fim_samples", "epoch_mixture"],
    # round-6 additions (additive — earlier families untouched; the
    # r05 "hard_negatives_ivf" bench key is now "hard_negatives_ivf_probe":
    # same nprobe=4 plan, renamed because the registry name took the
    # full-probe exact mode for its driver oracle)
    "mining_stream": ["docs_mining_stream"],
    "topic_balance": ["topic_balanced_sample"],
    # round-6 batch 2: the integer k-means curation family (fit is
    # memoized like the index builds, so this times assignment +
    # window economics over a BUILT model — same semantics as ANN)
    "cluster_curate": ["kmeans_cells", "proto_prune", "cluster_balanced"],
    "sketch_quantiles": ["value_quantiles_sketch"],
    "fingerprint_winnow": ["winnow_fingerprints", "winnow_contamination"],
    # the BPE training loop runs once at warmup (merge-table memo, same
    # built-artifact split as the index builds); the timed entries
    # measure table emission + the scan-stage segmentation over it
    "tokenizer_train": ["bpe_merges", "bpe_token_counts"],
    "sketch_stream": ["events_quantiles_stream"],
    "scd_history": ["order_status_scd2"],
    "sketch_grouped": ["event_type_quantiles"],
    "graph_rank": ["trade_pagerank", "trade_hits"],
    "contrastive": ["contrastive_triplets"],
    "drift_gate": ["events_value_drift", "events_drift_stream"],
    # round-6 batch 3 (additive — earlier families untouched)
    "ohlc_bars": ["events_ohlc", "events_ohlc_stream", "events_ohlc_daily"],
    "market_basket": ["copurchase_pairs", "copurchase_rules"],
    "graph_triangles": ["copurchase_triangles"],
    "graph_communities": ["copurchase_communities"],
    "robust_outliers": ["events_outliers"],
    "heavy_stream": ["docs_heavy_stream"],
    # round-7: the sub-quadratic IVF composition benched next to the
    # guarded GEMM default (nprobe=4 probe-pruned plan; the registry
    # entry runs full-probe exact mode for its oracle)
    "mutual_knn": ["mutual_knn_pairs", "mutual_knn_pairs_ivf_probe"],
    "changepoint": ["events_cusum", "events_cusum_stream"],
    "collocations": ["docs_pmi_collocations"],
    "skyline": ["lineitem_skyline"],
    "attribution": ["events_attribution", "events_credit_split"],
    "set_sketch": ["orders_flag_overlap"],
    "markov": ["event_type_transitions"],
    "trend": ["events_value_trend"],
    "rolling_gate": ["events_rolling_anomaly"],
    "click_paths": ["events_session_paths"],
    "segmentation": ["customer_rfm"],
    "chi2_gate": ["events_chi2_gate"],
    "agreement": ["langid_kappa"],
    "interp": ["events_gapfill_interp"],
    "benford": ["orders_benford"],
    "windowed_funnel": ["events_windowed_funnel"],
    "seasonal": ["events_seasonal_resid", "events_seasonal_stream"],
    "emb_drift": ["embedding_drift"],
    "repeat_gate": ["events_rapid_repeats"],
    "xcorr": ["events_xcorr"],
    "survival": ["conversion_survival"],
    "twap": ["events_twap"],
    "er_clusters": ["part_name_clusters"],
    # round-11 additions (additive — earlier families untouched):
    # recall certification of the approximate tiers (VERDICT r10 #4)
    "recall_cert": ["ivf_recall_curve", "binq_recall", "lsh_recall_curve",
                    "pq_adc_recall"],
}


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("oasisdb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(entrymod.queries())
    qs.update(entrymod.bench_queries())
    names = [n for fam in FAMILIES.values() for n in fam]
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"bench: unknown queries {missing}", file=sys.stderr)
        sys.exit(2)

    # Warmup AT THE BENCH SF: JIT/codegen-caches the plans and builds the
    # ANN indexes (memoized per (session, sf_dir) in __spark_entry__).
    for name in names:
        try:
            force(qs[name](spark, SF_DIR))
        except Exception:
            pass
        finally:
            release_tracked()

    def storage_probe(tag: str) -> None:
        # OPTIMIZATION r13 (VERDICT r12 #2): the bench re-executes every
        # entry 3-4x in one JVM — operator-internal localCheckpoints
        # must not accumulate a dead generation per execution. With
        # release_tracked() called between entries the block-manager RDD
        # count stays flat across passes; printed to STDERR per pass as
        # the bounded-growth evidence (never an assert: a probe hiccup
        # must not abort the driver's multi-minute run).
        try:
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            n = len(infos)
            mem = sum(i.memSize() for i in infos)
            print(f"bench: storage after {tag}: {n} cached RDDs, "
                  f"{mem / 1e6:.1f} MB", file=sys.stderr)
        except Exception:
            pass

    storage_probe("warmup")
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    timings: dict[str, float] = {}
    for p in range(passes):
        for name in names:
            t0 = time.perf_counter()
            force(qs[name](spark, SF_DIR))
            t = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, t), t)
            # free the entry's tracked checkpoint/persist blocks OUTSIDE
            # the timed region (freeing is a few py4j calls; the timed
            # work of the NEXT entry must not pay for the previous one)
            release_tracked()
        storage_probe(f"pass {p + 1}")

    # r07 bench hygiene (VERDICT r06 #7 / BASELINE.md noise-floor
    # study): sub-second entries carry the most single-session
    # GC/scheduler jitter RELATIVE to their signal, and the suite has
    # grown past 160 timed queries in one JVM — give every sub-second
    # entry a third pass so its reported value is min-of-3, while
    # multi-second entries stay min-of-{passes} (their jitter is
    # proportionally small and a third pass would cost real minutes)
    for name in [n for n in names if timings[n] < 1.0]:
        t0 = time.perf_counter()
        force(qs[name](spark, SF_DIR))
        timings[name] = min(timings[name], round(time.perf_counter() - t0, 3))
        release_tracked()
    storage_probe("sub-second pass")

    families = {
        fam: round(sum(timings[n] for n in members), 3)
        for fam, members in FAMILIES.items()
    }
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # The driver records only the LAST 2,000 CHARS of stdout (measured:
    # BENCH_r09.json tail length == 2000) and parses the final line.
    # The r08-era "one compact line" still overflowed by 58 chars once
    # the family map passed 100 entries (VERDICT r09 wrong #1), so the
    # contract is now TWO lines (VERDICT r09 #2): the families map on
    # its own PRECEDING line (head-truncation of that line is tolerable
    # — bench_diff's salvager recovers the surviving fragment), then a
    # final line well under the window with just
    # {metric, value, unit, sf, method, n_queries, per_query_record}.
    # The full per-query map goes to the committed BENCH_LOCAL_sf*.json
    # record only.
    out = {
        "metric": "headline_queries_total_sec",
        "queries": timings,
        "families": families,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
        "method": {
            "passes": passes,
            "sub_second_extra_pass": True,
            "estimator": (
                f"min of {passes} passes (+1 extra pass for sub-second entries)"
            ),
        },
    }
    compact = {k: v for k, v in out.items() if k not in ("queries", "families")}
    compact["n_queries"] = len(timings)
    compact["per_query_record"] = (
        f"BENCH_LOCAL_sf{sf}.json"
        if str(sf).replace(".", "").isdigit() else "BENCH_LOCAL.json"
    )
    final_line = json.dumps(compact)
    # the complete record, immune to stdout-tail truncation — the
    # judge/driver can read per-query numbers here when the stdout
    # contract overflows their capture window. SF-stamped so a smoke at
    # another scale factor can't clobber the canonical sf0.1 record.
    # Written (and the families line printed) BEFORE the length
    # tripwire below, so an overflow aborts the stdout contract — not
    # the multi-minute run's results (round-10 self-review).
    fname = f"BENCH_LOCAL_sf{sf}.json" if str(sf).replace(".", "").isdigit() else "BENCH_LOCAL.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), fname), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"families": families}))
    # tripwire: the final line must fit the driver's capture window
    # with generous headroom; tests/test_bench_contract.py pins this
    assert len(final_line) <= 1500, len(final_line)
    print(final_line)
    spark.stop()


if __name__ == "__main__":
    main()
