"""Driver-contract invariants for __spark_entry__.py — keeps the
contract honest without the DuckDB oracle (scripts/check_oracle.py is
the full gate)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_registry_arithmetic_matches_coverage_doc():
    """Pin the counts COVERAGE.md and the queries() comment quote so
    they can't drift from the registry again (VERDICT r03 #5; extended
    per VERDICT r05 #3 to quote the COVERAGE.md header count string, so
    a future header like the r05 '139' leftover fails this test)."""
    import pathlib
    import re

    qs, os_ = entry.queries(), entry.oracle_sql()
    # 196 through r06 + mutual_knn_pairs_ivf (r07) + the four
    # round-11 recall-curve entries — the ONE sanctioned freeze lift
    # (VERDICT r10 #4: "registry may grow past 197 only this way").
    # Two sit in the r11 window; lsh_recall_curve and pq_adc_recall
    # (added after the window was staged and verified) lead the r12
    # queue at positions 51-52.
    assert len(qs) == 201
    assert list(qs)[50:52] == ["lsh_recall_curve", "pq_adc_recall"]
    # ZERO unoracled entries (since round 5)
    assert set(qs) - set(os_) == set()
    # COVERAGE.md's header must state the exact registry size
    cov = pathlib.Path("/root/repo/COVERAGE.md").read_text()
    m = re.search(r"registry holds \*\*(\d+) entries", cov)
    assert m, "COVERAGE.md header no longer states the registry size"
    assert int(m.group(1)) == len(qs), (
        f"COVERAGE.md header says {m.group(1)} entries, registry has {len(qs)}"
    )
    # the driver gates the first 50 entries; the round-11 window
    # (VERDICT r10 #1/#4) is the standing anchors + the two never-green
    # recall-curve additions (never-green precedes churned in the
    # audit's ranking) + the 46 stalest entries whose code or oracle
    # churned since their latest-green round commit (the element-NULL-
    # campaign backlog), direct churn outranking module churn. The
    # verdict-named r07/r08 analytics families sit at ranks 5-12.
    window = list(qs)[:50]
    anchors = {"collection_lifecycle", "knn_ivfsq"}
    never_green = {"ivf_recall_curve", "binq_recall"}
    churned_46 = {
        "contrastive_triplets", "events_cusum", "events_ohlc_daily",
        "event_type_transitions", "events_rolling_anomaly",
        "customer_rfm", "events_chi2_gate", "conversion_survival",
        "events_ohlc_stream", "events_cusum_stream",
        "events_seasonal_stream", "docs_gopher_stream",
        "hybrid_search_indexed", "maxsim_search", "dedup_keep_best",
        "bloom_semijoin", "cohort_retention", "event_funnel",
        "events_funnel_stream", "lsh_recall_eval", "quality_prune",
        "semantic_dedup", "zorder_scan", "data_quality_gate",
        "leakage_safe_split", "bm25_search_indexed", "docs_lm_stream",
        "docs_neardup_stream", "jaccard_pairs_prefix", "lm_perplexity",
        "perplexity_buckets", "sequence_pack_bins",
        "sequence_pack_chunks", "line_scrub", "knn_ivf", "knn_ivfpq",
        "knn_lsh", "knn_hamming_packed", "auto_embed", "knn_flat_l2",
        "search_documents_filtered", "vector_lookup",
        "minhash_lsh_pairs", "pca_knn", "price_quartiles",
        "docs_mining_stream",
    }
    assert set(window) == anchors | never_green | churned_46
    assert window[:4] == ["collection_lifecycle", "knn_ivfsq",
                          "ivf_recall_curve", "binq_recall"]
    # the verdict-named r07/r08 analytics families front-load the
    # churned block (ranks 5-12)
    assert window[4:12] == [
        "contrastive_triplets", "events_cusum", "events_ohlc_daily",
        "event_type_transitions", "events_rolling_anomaly",
        "customer_rfm", "events_chi2_gate", "conversion_survival",
    ]


def test_every_registry_entry_named_in_coverage_doc():
    """Pin TABLE drift, not just count drift (VERDICT r04 #1): every
    queries() entry must be named in COVERAGE.md."""
    import pathlib

    cov = pathlib.Path("/root/repo/COVERAGE.md").read_text()
    missing = [n for n in entry.queries() if n not in cov]
    assert missing == [], f"registry entries absent from COVERAGE.md: {missing}"


def test_entry_returns_rows_with_stable_schema(spark):
    df = entry.entry(spark)
    assert df.columns == ["query_id", "id", "rank", "distance"]
    assert len(df.collect()) == 50  # 5 queries x k=10


def test_knn_hamming_self_is_rank_one(spark):
    rows = entry.queries()["knn_flat_hamming"](spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["rank"]] = r
    for qid, ranks in by_q.items():
        assert ranks[1]["id"] == qid  # 0 unequal positions vs itself
        assert ranks[1]["distance"] == 0.0


def test_doc_fingerprint_rolling_hash_matches_python(spark):
    import hashlib
    import re

    out = {r["doc_id"]: r for r in entry.queries()["doc_fingerprint"](spark, SF).collect()}
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet").limit(20).collect()}
    P = 2147483647
    for doc_id, text in docs.items():
        toks = [x for x in re.split("[^a-z0-9]+", (text or "").lower()) if x]
        h = 0
        for t in toks:
            th = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % P
            h = (h * 31 + th) % P
        assert out[doc_id]["rolling_hash"] == h
        assert out[doc_id]["ws_tokens"] == len([w for w in re.split(r"\s+", text) if w])


def test_semi_and_anti_join_queries_disjoint_logic(spark):
    """Semi (EXISTS) and anti (NOT EXISTS) partition the supplier set."""
    sup_total = spark.read.parquet(f"{SF}/supplier.parquet").count()
    semi = entry.queries()["suppliers_with_max_qty_items"](spark, SF)
    n_semi = semi.agg(F.sum("n_suppliers")).first()[0] or 0
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(F.col("l_quantity") >= 49)
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    n_anti = sup.join(li, sup.s_suppkey == li.l_suppkey, "left_anti").count()
    assert n_semi + n_anti == sup_total
