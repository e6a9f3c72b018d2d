"""End-to-end search surface: create → upsert → build_index →
search_vectors / search_documents (with the WORKING metadata filter the
reference only declares — document.go:171, design.md:58-59)."""

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.catalog import Catalog
from oasisdb_spark.search import build_index, search_documents, search_vectors


@pytest.fixture()
def loaded(spark, tmp_path, embeddings):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_collection("emb", dimension=64, index_type="ivf_flat", params={"nlist": 8, "nprobe": 8})
    docs = embeddings.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
        F.create_map(F.lit("label"), F.col("label").cast("string")).alias("parameters"),
    )
    cat.upsert_documents("emb", docs)
    return cat


def _q(spark, embeddings, n=3):
    return embeddings.filter(F.col("vec_id") < n).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_search_before_build_uses_flat(spark, loaded, embeddings):
    res = search_vectors(loaded, "emb", _q(spark, embeddings), k=5)
    rows = res.filter(F.col("rank") == 1).collect()
    assert {r["query_id"]: r["id"] for r in rows} == {"0": "0", "1": "1", "2": "2"}


def test_search_after_build_uses_ivf(spark, loaded, embeddings):
    v = build_index(loaded, "emb")
    assert v == 1 and loaded.get_collection("emb").index_version == 1
    res = search_vectors(loaded, "emb", _q(spark, embeddings), k=5)
    rows = res.filter(F.col("rank") == 1).collect()
    assert {r["query_id"]: r["id"] for r in rows} == {"0": "0", "1": "1", "2": "2"}


def test_search_documents_prefilter(spark, loaded, embeddings):
    """Pre-filter: every returned doc satisfies the predicate AND we get
    exactly k survivors (correct top-k under filter)."""
    labels = {r["vec_id"]: r["label"] for r in embeddings.collect()}
    res = search_documents(
        loaded, "emb", _q(spark, embeddings, 2), k=5,
        metadata_filter=F.col("parameters")["label"] == "1",
    ).collect()
    assert len(res) == 10  # 2 queries x k
    assert all(labels[int(r["id"])] == 1 for r in res)


def test_search_documents_postfilter_maybe_short(spark, loaded, embeddings):
    """Post-filter (reference design.md:58 k*2 mode): results satisfy the
    predicate but may be fewer than k — the parity-mode behavior."""
    res = search_documents(
        loaded, "emb", _q(spark, embeddings, 2), k=5,
        metadata_filter=F.col("parameters")["label"] == "1", post_filter=True,
    ).collect()
    labels = {r["vec_id"]: r["label"] for r in embeddings.collect()}
    assert all(labels[int(r["id"])] == 1 for r in res)
    assert len(res) <= 10


def test_search_documents_joins_payload(spark, loaded, embeddings):
    res = search_documents(loaded, "emb", _q(spark, embeddings, 1), k=3).collect()
    assert len(res) == 3
    assert all(r["vector"] is not None and r["parameters"]["label"] is not None for r in res)


def test_ivfpq_collection_end_to_end(spark, tmp_path, embeddings):
    cat = Catalog(spark, str(tmp_path / "wh2"))
    cat.create_collection("pq", dimension=64, index_type="ivfpq",
                          params={"nlist": 8, "nprobe": 8, "m": 8})
    docs = embeddings.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector"),
        F.lit(None).cast("map<string,string>").alias("parameters"),
    )
    cat.upsert_documents("pq", docs)
    build_index(cat, "pq")
    res = search_vectors(cat, "pq", _q(spark, embeddings, 3), k=5)
    top1 = {r["query_id"]: r["id"] for r in res.filter(F.col("rank") == 1).collect()}
    assert top1 == {"0": "0", "1": "1", "2": "2"}  # refined exact re-rank


def test_add_to_index_incremental(spark, tmp_path, embeddings):
    """Catalog-level add-after-build: upsert new docs + add_to_index makes
    them searchable WITHOUT a rebuild or version bump (reference
    Add-on-trained-index semantics, ivf.go:99-127)."""
    from pyspark.sql import functions as F

    from oasisdb_spark.search import add_to_index

    cat = Catalog(spark, str(tmp_path / "inc"))
    cat.create_collection("inc", dimension=64, index_type="ivf_flat",
                          params={"nlist": 4, "nprobe": 4})
    first = embeddings.filter(F.col("vec_id") < 150).select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    cat.upsert_documents("inc", first)
    v = build_index(cat, "inc")
    new = embeddings.filter(F.col("vec_id").between(150, 199)).select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    cat.upsert_documents("inc", new)
    add_to_index(cat, "inc", new)
    assert cat.get_collection("inc").index_version == v  # no bump
    q = embeddings.filter(F.col("vec_id") == 180).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = search_vectors(cat, "inc", q, k=1).collect()
    assert res[0]["id"] == "180" and abs(res[0]["distance"]) < 1e-6


def test_indexed_search_excludes_deleted(spark, tmp_path, embeddings):
    """Deleting a document after the index is built must remove it from
    indexed search results too (the reference leaves it in — IVF delete
    is a no-op, ivf.go:170-173). A rebuild bakes the delete in and
    clears the tombstones."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "del"))
    cat.create_collection("del", dimension=64, index_type="ivf_flat",
                          params={"nlist": 4, "nprobe": 4})
    base = embeddings.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    cat.upsert_documents("del", base)
    build_index(cat, "del")
    q = embeddings.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert search_vectors(cat, "del", q, k=1).collect()[0]["id"] == "7"
    cat.delete_document("del", "7")
    hits = [r["id"] for r in search_vectors(cat, "del", q, k=5).collect()]
    assert "7" not in hits and len(hits) == 5
    build_index(cat, "del")
    # rebuild clears tombstones by flipping to an empty generation (an
    # absent dir and an empty set are both "no pending deletes")
    ts = cat.read_tombstones("del")
    assert ts is None or ts.count() == 0
    hits = [r["id"] for r in search_vectors(cat, "del", q, k=5).collect()]
    assert "7" not in hits and len(hits) == 5


def test_build_index_gc_keeps_two_versions(spark, tmp_path, embeddings):
    """Rebuilds prune index snapshots older than the previous version
    (the reference's superseded-snapshot cleanup)."""
    import os

    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "gc"))
    cat.create_collection("gc", dimension=64, index_type="ivf_flat",
                          params={"nlist": 2, "nprobe": 2})
    base = embeddings.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    cat.upsert_documents("gc", base)
    for _ in range(3):
        build_index(cat, "gc")
    assert not os.path.exists(cat.index_path("gc", 1))
    assert os.path.exists(cat.index_path("gc", 2))
    assert os.path.exists(cat.index_path("gc", 3))
    q = embeddings.filter(F.col("vec_id") == 9).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert search_vectors(cat, "gc", q, k=1).collect()[0]["id"] == "9"


def test_nlist_auto_sizes_sqrt_n(spark, tmp_path, embeddings):
    """nlist='auto' builds ~sqrt(N) inverted lists."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "auto"))
    cat.create_collection("a", dimension=64, index_type="ivf_flat",
                          params={"nlist": "auto", "nprobe": 8})
    base = embeddings.select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("vector")
    )
    cat.upsert_documents("a", base)
    v = build_index(cat, "a")
    import math
    n = base.count()
    cent = spark.read.parquet(cat.index_path("a", v) + "/centroids")
    assert cent.count() == int(math.sqrt(n))
    q = embeddings.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert search_vectors(cat, "a", q, k=1).collect()[0]["id"] == "3"


def test_filtered_search_pushes_into_ivf_index(spark, loaded, embeddings):
    """Filtered ANN: with a built index the pre-filter semi-joins probed
    candidates (no brute fallback); at nprobe=nlist the result equals
    exact kNN over the filtered survivors."""
    build_index(loaded, "emb")
    pred = F.col("parameters")["label"] == "1"
    res = search_documents(
        loaded, "emb", _q(spark, embeddings, 2), k=5, metadata_filter=pred
    ).collect()
    from oasisdb_spark.pipeline.ann import knn_brute_batched

    ref = knn_brute_batched(
        _q(spark, embeddings, 2), loaded.read_documents("emb").filter(pred), 5, space="l2"
    ).collect()
    assert {(r["query_id"], r["id"], r["rank"]) for r in res} == {
        (r["query_id"], r["id"], r["rank"]) for r in ref
    }
    labels = {r["vec_id"]: r["label"] for r in embeddings.collect()}
    assert len(res) == 10 and all(labels[int(r["id"])] == 1 for r in res)


def test_adaptive_nprobe_recovers_filtered_recall(spark, loaded, embeddings):
    """adaptive_nprobe=1 scales nprobe by ~1/selectivity: with nprobe=1
    and a selective filter, the boosted probe count recovers the exact
    filtered top-k (boost pushes nprobe past nlist, capped there)."""
    build_index(loaded, "emb")
    loaded.set_params("emb", {"nprobe": 1, "adaptive_nprobe": 1})
    pred = F.col("parameters")["label"] == "1"
    res = search_documents(
        loaded, "emb", _q(spark, embeddings, 2), k=5, metadata_filter=pred
    ).collect()
    from oasisdb_spark.pipeline.ann import knn_brute_batched

    ref = knn_brute_batched(
        _q(spark, embeddings, 2), loaded.read_documents("emb").filter(pred), 5, space="l2"
    ).collect()
    assert {(r["query_id"], r["id"], r["rank"]) for r in res} == {
        (r["query_id"], r["id"], r["rank"]) for r in ref
    }
