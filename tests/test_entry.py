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
    # 196 through r06 + mutual_knn_pairs_ivf, the ONE round-7 addition
    # (VERDICT r06 #2/#3 — growth frozen until the first-row backlog
    # clears)
    assert len(qs) == 197
    # ZERO unoracled entries (since round 5)
    assert set(qs) - set(os_) == set()
    # COVERAGE.md's header must state the exact registry size
    cov = pathlib.Path("/root/repo/COVERAGE.md").read_text()
    m = re.search(r"registry holds \*\*(\d+) entries", cov)
    assert m, "COVERAGE.md header no longer states the registry size"
    assert int(m.group(1)) == len(qs), (
        f"COVERAGE.md header says {m.group(1)} entries, registry has {len(qs)}"
    )
    # the driver gates the first 50 entries; the round-9 window
    # (VERDICT r08 #1, change-aware staging) must contain the standing
    # anchors, the 38 stalest direct-churned entries (own function span
    # or oracle SQL changed since their latest green driver row), the
    # 9 verdict-named NULL-hardening/memo-touched r07-latest
    # force-includes, and 1 stalest module-churned fill — 2+38+9+1 = 50
    window = list(qs)[:50]
    anchors = {"collection_lifecycle", "knn_ivfsq"}
    direct_churned = {
        "knn_ivf", "knn_ivfpq", "knn_lsh", "knn_hamming_packed",
        "auto_embed", "doc_repetition", "q12_priority_shipping",
        "knn_flat_l2", "search_documents_filtered", "vector_lookup",
        "minhash_lsh_pairs", "text_stats", "pca_knn",
        "retrieval_rank_eval", "hybrid_search_rrf", "price_quartiles",
        "docs_mining_stream", "fim_samples", "hard_negatives",
        "hard_negatives_ivf", "topic_balanced_sample", "pii_scrub",
        "gopher_filter", "search_filtered_ivf", "curation_pipeline",
        "knn_binq", "tfidf_top_terms", "knn_brute", "doc_fingerprint",
        "top3_orders_per_customer", "copurchase_triangles",
        "docs_pmi_collocations", "events_credit_split",
        "copurchase_communities", "orders_benford",
        "events_seasonal_resid", "part_name_clusters",
        "mutual_knn_pairs_ivf",
    }
    named_force_includes = {
        "winnow_contamination", "lineitem_skyline", "order_status_scd2",
        "events_twap", "copurchase_pairs", "copurchase_rules",
        "events_outliers", "cluster_balanced", "events_gapfill_interp",
    }
    module_churned_fill = {"orders_snapshot_diff"}
    assert (
        set(window)
        == anchors | direct_churned | named_force_includes
        | module_churned_fill
    )
    assert window[:2] == ["collection_lifecycle", "knn_ivfsq"]


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
