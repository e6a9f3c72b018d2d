"""Search surface: build_index / search_vectors / search_documents.

Reference mapping:
- build_index       → POST .../buildindex (S8; index_manager.go:473-502)
- search_vectors    → POST .../vectors/search (Q1; handlers.go:36-74,
                      db/document.go:136-168)
- search_documents  → POST .../documents/search (Q2; handlers.go:261-303,
                      document.go:171-247). The reference ACCEPTS a
                      metadata filter but IGNORES it (the `filter` param
                      at document.go:171 is never referenced; confirmed
                      unimplemented in docs/design.md:58-59). Here the
                      filter is real and applied as a PRE-filter pushed
                      below the kNN — candidates are restricted before
                      distance computation, so the filter prunes the
                      scan instead of post-truncating results. A
                      post-filter mode (reference design.md:58's k*2
                      fallback) is offered for comparison.
- set_params        → catalog.set_params (S11); efsearch maps to nprobe
                      for the hnsw tier (SURVEY.md Q6: efsearch⇒nprobe).

Queries always run against the last BUILT index version (catalog
index_version pinning) — the snapshot-isolation semantic the reference
leaves undefined (SURVEY.md §4 concurrency notes).
"""

from __future__ import annotations

import math
import os

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oasisdb_spark import errors
from oasisdb_spark.catalog import Catalog
from oasisdb_spark.index.flat import knn_flat
from oasisdb_spark.index.ivf import build_ivf, knn_ivf
from oasisdb_spark.index.ivfpq import build_ivfpq, knn_ivfpq

__all__ = [
    "build_index",
    "add_to_index",
    "search_vectors",
    "search_documents",
    "cached_search_vectors",
]


def build_index(catalog: Catalog, name: str) -> int:
    """Build the collection's index tables and bump index_version.
    Returns the new version. Flat needs no derived table (the collection
    IS the index, flat.go:14-20); hnsw tier uses IVF tables with an
    nprobe preset derived from efsearch."""
    coll = catalog.get_collection(name)
    data = catalog.read_documents(name)
    version = coll.index_version + 1
    out_dir = catalog.index_path(name, version)
    if coll.index_type in ("ivf_flat", "hnsw"):
        nlist = _resolve_nlist(coll.params.get("nlist", "100"), data.count())
        build_ivf(data, nlist=nlist, out_dir=out_dir)
    elif coll.index_type == "ivfpq":
        nlist = _resolve_nlist(coll.params.get("nlist", "100"), data.count())
        build_ivfpq(data, nlist=nlist, m=int(coll.params.get("m", "8")), out_dir=out_dir)
    elif coll.index_type == "ivfsq":
        from oasisdb_spark.index.ivfsq import build_ivfsq

        nlist = _resolve_nlist(coll.params.get("nlist", "100"), data.count())
        build_ivfsq(data, nlist=nlist, out_dir=out_dir)
    elif coll.index_type == "binq":
        from oasisdb_spark.index.binq import build_binq

        build_binq(data, out_dir=out_dir)
    elif coll.index_type == "flat":
        os.makedirs(out_dir, exist_ok=True)
    catalog.bump_index_version(name)
    # snapshot GC (reference deletes superseded snapshots after save,
    # index_manager.go:387-438): keep the new version plus its
    # predecessor for in-flight readers pinned to the old version;
    # everything older is unreachable (searches always resolve the
    # catalog's current version) and is removed.
    import shutil

    for v in range(1, version - 1):
        shutil.rmtree(catalog.index_path(name, v), ignore_errors=True)
    return version


def _resolve_nlist(param: str, n_rows: int) -> int:
    """nlist='auto' → ~sqrt(N) (the standard IVF sizing: probe work and
    list length both scale as sqrt; SCALING.md — nlist must grow with N
    for per-query candidate volume to stay flat). Always clamped to
    [1, n_rows]; the explicit-int path preserves the reference's
    fixed-nlist behavior (const.go:26-30)."""
    import math

    if str(param).lower() == "auto":
        nlist = int(math.sqrt(max(n_rows, 1)))
    else:
        nlist = int(param)
    return max(1, min(nlist, max(n_rows, 1)))


def add_to_index(catalog: Catalog, name: str, docs: DataFrame) -> None:
    """Incremental add-after-build (S6/S8 write path between rebuilds;
    reference Add/AddBatch on a trained index, ivf.go:99-127 /
    ivf_test.go:96 add-after-train): assign/encode the new vectors
    against the CURRENT index version's centroids and append to its
    inverted lists — no retrain, no version bump (the reference's Add
    mutates the live index the same way; files stay immutable, only the
    list directory grows). Call upsert_documents first for the document
    store; periodic build_index remains the centroid-refresh/compaction
    analogue. Flat collections need nothing (the collection IS the
    index); unbuilt collections need nothing (searches scan current
    data)."""
    coll = catalog.get_collection(name)
    if coll.index_version == 0 or coll.index_type == "flat":
        return
    d = catalog.index_path(name, coll.index_version)
    lists_dir = os.path.join(d, "codes" if coll.index_type == "binq" else "lists")
    # genuinely-new ids only: an id already in the lists keeps its built
    # vector until the next rebuild (documented upsert-staleness
    # semantics) — appending it again would duplicate it in the index
    existing = catalog.spark.read.parquet(lists_dir).select("id")
    docs = docs.join(existing, on="id", how="left_anti")
    if coll.index_type in ("ivf_flat", "hnsw"):
        from oasisdb_spark.index.ivf import add_to_ivf

        cent = catalog.spark.read.parquet(os.path.join(d, "centroids"))
        add_to_ivf(docs, cent, lists_dir)
    elif coll.index_type == "ivfpq":
        from oasisdb_spark.index.ivfpq import add_to_ivfpq

        cents = np.load(os.path.join(d, "model", "centroids.npy"))
        books = np.load(os.path.join(d, "model", "codebooks.npy"))
        add_to_ivfpq(docs, cents, books, lists_dir)
    elif coll.index_type == "ivfsq":
        from oasisdb_spark.index.ivfsq import encode_sq

        cents = np.load(os.path.join(d, "model", "centroids.npy"))
        vmin = np.load(os.path.join(d, "model", "vmin.npy"))
        vmax = np.load(os.path.join(d, "model", "vmax.npy"))
        encoded = encode_sq(
            docs.select(F.col("id"), F.col("vector")), cents, vmin, vmax
        )
        encoded.repartition("cluster_id").write.mode("append").partitionBy("cluster_id").parquet(lists_dir)
    elif coll.index_type == "binq":
        from oasisdb_spark.index.binq import encode_binq

        means = np.load(os.path.join(d, "model", "means.npy"))
        encode_binq(docs.select("id", "vector"), means).write.mode("append").parquet(lists_dir)
    else:
        raise errors.ErrInvalidParams(f"unknown index type {coll.index_type!r}")


def _without_tombstones(catalog: Catalog, name: str, lists: DataFrame) -> DataFrame:
    """Exclude ids deleted since the index was built. The tombstone set
    is tiny (deletes between rebuilds), so the anti-join broadcasts —
    the indexed scan never shuffles. Rebuilds clear the set."""
    ts = catalog.read_tombstones(name)
    if ts is None:
        return lists
    return lists.join(F.broadcast(ts.select("id")), on="id", how="left_anti")


def _load_ivf(catalog: Catalog, name: str, version: int):
    d = catalog.index_path(name, version)
    cent = catalog.spark.read.parquet(os.path.join(d, "centroids"))
    lists = catalog.spark.read.parquet(os.path.join(d, "lists"))
    return cent, lists


def _nprobe_for(coll) -> int:
    if coll.index_type == "hnsw":
        # efsearch⇒nprobe mapping: scan roughly efsearch/ef_default
        # fraction of lists, floor 1 (SURVEY.md §7 phase 3.5)
        ef = int(coll.params.get("efsearch", "10"))
        return max(1, ef // 2)
    return int(coll.params.get("nprobe", "10"))


def search_vectors(
    catalog: Catalog,
    name: str,
    queries: DataFrame,
    k: int,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k kNN against a collection → (query_id, id, distance, rank).

    candidates: optional pre-filtered subset of the collection (used by
    search_documents' pre-filter pushdown).
    """
    coll = catalog.get_collection(name)
    data = candidates if candidates is not None else catalog.read_documents(name)
    brute_only = coll.index_version == 0 or coll.index_type == "flat"
    if brute_only or (candidates is not None and coll.space == "hamming"):
        # no built index (search-before-build sees current data — strictly
        # better than the reference's partial-data race, SURVEY.md §4) →
        # exact scan; hamming keeps the brute path under filters too (its
        # IVF lists store packed bits the semi-join would re-read anyway).
        # Batched kernels for every space (base scanned once, no pair
        # materialization — the only exact strategy that survives large
        # collections; see RECALL.md): GEMM for l2/ip/cos, XOR-popcount
        # over packed bits for hamming.
        from oasisdb_spark.pipeline.ann import knn_brute_batched

        return knn_brute_batched(queries, data, k, space=coll.space)
    # Filtered ANN: a metadata pre-filter no longer forfeits the index —
    # the filtered id set semi-joins the candidates AFTER probe pruning
    # (id_filter in knn_ivf/knn_ivfsq/knn_ivfpq), so the filter costs
    # |probed candidates|, not an index reshuffle. Exactness under a
    # filter matches the index's usual contract (exact at nprobe=nlist).
    id_filter = candidates.select("id") if candidates is not None else None
    nprobe_boost = 1
    if id_filter is not None and coll.params.get("adaptive_nprobe", "0") not in ("0", "", "false"):
        # opt-in (set_params(adaptive_nprobe=1)): scale nprobe by
        # ~1/selectivity — a 1-in-s filter thins every probed list by s,
        # so fixed nprobe loses recall proportionally (RECALL.md filtered
        # curve). Costs two count jobs per search (pushdown-pruned
        # scans); serving paths that know their selectivity should set
        # nprobe directly instead.
        n_filtered = candidates.count()
        n_total = catalog.read_documents(name).count()
        if n_filtered > 0:
            nprobe_boost = max(1, math.ceil(n_total / n_filtered))
    if coll.index_type in ("ivf_flat", "hnsw"):
        cent, lists = _load_ivf(catalog, name, coll.index_version)
        lists = _without_tombstones(catalog, name, lists)
        nprobe = _nprobe_for(coll) * nprobe_boost  # knn_ivf caps at nlist
        return knn_ivf(
            queries, cent, lists, k, nprobe=nprobe, space=coll.space,
            id_filter=id_filter,
        )
    if coll.index_type == "ivfsq":
        from oasisdb_spark.index.ivfsq import knn_ivfsq

        d = catalog.index_path(name, coll.index_version)
        cents = np.load(os.path.join(d, "model", "centroids.npy"))
        vmin = np.load(os.path.join(d, "model", "vmin.npy"))
        vmax = np.load(os.path.join(d, "model", "vmax.npy"))
        lists = _without_tombstones(
            catalog, name, catalog.spark.read.parquet(os.path.join(d, "lists"))
        )
        return knn_ivfsq(
            queries, cents, vmin, vmax, lists, k,
            nprobe=_nprobe_for(coll) * nprobe_boost, space=coll.space,
            refine_base=data if coll.params.get("refine_factor") else None,
            refine_factor=int(coll.params.get("refine_factor", "4")),
            id_filter=id_filter,
        )
    if coll.index_type == "binq":
        from oasisdb_spark.index.binq import knn_binq

        d = catalog.index_path(name, coll.index_version)
        means = np.load(os.path.join(d, "model", "means.npy"))
        codes = _without_tombstones(
            catalog, name, catalog.spark.read.parquet(os.path.join(d, "codes"))
        )
        return knn_binq(
            queries, means, codes, k, refine_base=data,
            refine_factor=int(coll.params.get("refine_factor", "8")),
            space=coll.space, id_filter=id_filter,
        )
    if coll.index_type == "ivfpq":
        d = catalog.index_path(name, coll.index_version)
        cents = np.load(os.path.join(d, "model", "centroids.npy"))
        books = np.load(os.path.join(d, "model", "codebooks.npy"))
        lists = _without_tombstones(
            catalog, name, catalog.spark.read.parquet(os.path.join(d, "lists"))
        )
        return knn_ivfpq(
            queries, cents, books, lists, k,
            nprobe=_nprobe_for(coll) * nprobe_boost, space=coll.space, refine_base=data,
            refine_factor=int(coll.params.get("refine_factor", "4")),
            id_filter=id_filter,
        )
    raise errors.ErrInvalidParams(f"unknown index type {coll.index_type!r}")


def cached_search_vectors(
    catalog: Catalog,
    name: str,
    query_vec: list[float],
    k: int,
    cache,
) -> list:
    """Q13 result-cache path for the reference's serving pattern
    (handlers.go:46-54: one query vector per request, cache consulted
    before the index). Returns collected (id, distance, rank) rows.

    The cache key includes the collection's index_version, so results
    can never be stale after an upsert+rebuild — the safety the
    reference lacks (SURVEY.md Q13). Use plain search_vectors for batch
    query DataFrames; caching collected results only makes sense for
    repeated point lookups."""
    coll = catalog.get_collection(name)
    key = cache.key(name, coll.index_version, [float(x) for x in query_vec], k)
    hit = cache.get(key)
    if hit is not None:
        return hit
    spark = catalog.spark
    q = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])], "query_id INT, query_vec ARRAY<FLOAT>"
    )
    rows = [
        (r["id"], r["distance"], r["rank"])
        for r in search_vectors(catalog, name, q, k).collect()
    ]
    cache.put(key, rows)
    return rows


def search_documents(
    catalog: Catalog,
    name: str,
    queries: DataFrame,
    k: int,
    metadata_filter: Column | None = None,
    post_filter: bool = False,
) -> DataFrame:
    """kNN + join documents back (document.go:171-247 — but done as one
    join, not the reference's per-id GetDocument loop) with a WORKING
    metadata filter.

    pre-filter (default): filter the collection, then kNN over the
    survivors — top-k is correct under the predicate. With a built
    non-flat index the filter pushes INTO the index as a post-probe
    semi-join (filtered ANN: costs |probed candidates|, exact at
    nprobe=nlist); without one it's an exact brute scan.
    post_filter=True: reference design.md:58 style — fetch k*2 unfiltered
    candidates, then filter (may return < k rows; kept for parity study).
    """
    data = catalog.read_documents(name)
    if metadata_filter is not None and not post_filter:
        hits = search_vectors(catalog, name, queries, k, candidates=data.filter(metadata_filter))
    elif metadata_filter is not None:
        hits = search_vectors(catalog, name, queries, k * 2)
    else:
        hits = search_vectors(catalog, name, queries, k)
    out = hits.join(data, on="id")
    if metadata_filter is not None and post_filter:
        out = out.filter(metadata_filter)
    return out.select("query_id", "id", "distance", "rank", "vector", "parameters")
