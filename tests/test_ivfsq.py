"""IVF-SQ8: quantizer round-trip, near-exact recall at full probe,
persistence layout."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oasisdb_spark.index.flat import knn_flat
from oasisdb_spark.index.ivfsq import (
    _dequantize, _quantize, build_ivfsq, knn_ivfsq, train_sq,
)


@pytest.fixture()
def base(spark, embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).cache()


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 32)).astype(np.float32)
    vmin, vmax = x.min(0), x.max(0)
    back = _dequantize(_quantize(x, vmin, vmax), vmin, vmax)
    # max error is half a quantization step per dimension
    step = (vmax - vmin) / 255.0
    assert (np.abs(back - x) <= step * 0.51 + 1e-9).all()


def test_ivfsq_full_probe_recall_near_exact(spark, base):
    q = base.filter(F.col("id") < 10).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vec")
    )
    cents, vmin, vmax, idx = build_ivfsq(base, nlist=8)
    idx = idx.cache(); idx.count()
    exact = {(r["query_id"], r["id"]) for r in knn_flat(q, base, k=10).collect()}
    got = {(r["query_id"], r["id"]) for r in knn_ivfsq(q, cents, vmin, vmax, idx, k=10, nprobe=8).collect()}
    # SQ8 distortion is tiny (1/255 of the per-dim range): recall ~1
    assert len(got & exact) / len(exact) >= 0.97


def test_ivfsq_probe_pruning_reduces_candidates(spark, base):
    q = base.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vec")
    )
    cents, vmin, vmax, idx = build_ivfsq(base, nlist=8)
    idx = idx.cache(); idx.count()
    res = knn_ivfsq(q, cents, vmin, vmax, idx, k=5, nprobe=2).collect()
    assert len(res) == 25  # 5 queries x k
    # distances are valid squared-L2 (non-negative, sorted by rank)
    byq = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        byq.setdefault(r["query_id"], []).append(r["distance"])
    for dists in byq.values():
        assert dists == sorted(dists) and all(d >= 0 for d in dists)


def test_ivfsq_persistence_roundtrip(spark, base, tmp_path):
    d = str(tmp_path / "sq")
    cents, vmin, vmax, idx = build_ivfsq(base, nlist=4, out_dir=d)
    import os

    parts = [p for p in os.listdir(os.path.join(d, "lists")) if p.startswith("cluster_id=")]
    assert parts  # on-disk inverted lists
    cents2 = np.load(os.path.join(d, "model", "centroids.npy"))
    vmin2 = np.load(os.path.join(d, "model", "vmin.npy"))
    assert np.array_equal(cents, cents2) and np.array_equal(vmin, vmin2)
    # codes are 1 byte per dimension
    row = idx.first()
    dim = base.select(F.size("vector").alias("d")).first()["d"]
    assert len(bytes(row["codes"])) == dim


def test_ivfsq_through_catalog_lifecycle(spark, tmp_path):
    """Full serving path: create(ivfsq) -> upsert -> build -> search ->
    incremental add -> search finds the arrival (add-after-build)."""
    from oasisdb_spark.catalog import Catalog
    from oasisdb_spark.search import add_to_index, build_index, search_vectors

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_collection("sq", 4, index_type="ivfsq",
                          params={"nlist": "4", "nprobe": "4"})
    docs = spark.createDataFrame(
        [(str(i), [float(i), 0.0, 0.0, 0.0], {}) for i in range(1, 41)],
        "id STRING, vector ARRAY<FLOAT>, parameters MAP<STRING,STRING>",
    )
    cat.upsert_documents("sq", docs)
    build_index(cat, "sq")
    q = spark.createDataFrame([(0, [10.2, 0.0, 0.0, 0.0])], "query_id INT, query_vec ARRAY<FLOAT>")
    top = search_vectors(cat, "sq", q, 3).orderBy("rank").collect()
    assert [r["id"] for r in top] == ["10", "11", "9"]

    new = spark.createDataFrame(
        [("99", [99.0, 0.0, 0.0, 0.0], {})],
        "id STRING, vector ARRAY<FLOAT>, parameters MAP<STRING,STRING>",
    )
    cat.upsert_documents("sq", new)
    add_to_index(cat, "sq", new)
    q2 = spark.createDataFrame([(0, [98.5, 0.0, 0.0, 0.0])], "query_id INT, query_vec ARRAY<FLOAT>")
    assert search_vectors(cat, "sq", q2, 1).first()["id"] == "99"


def test_ivfsq_spaces_match_flat(spark, base):
    """space threading (round-2 advisory fix): ip/cos rank like the exact
    kernel; with a covering refine the distances are metric-exact."""
    q = base.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vec")
    )
    cents, vmin, vmax, idx = build_ivfsq(base, nlist=8)
    idx = idx.cache(); idx.count()
    n = base.count()
    for space in ("ip", "cos"):
        exact = {(r["query_id"], r["id"]) for r in knn_flat(q, base, k=10, space=space).collect()}
        got_rows = knn_ivfsq(
            q, cents, vmin, vmax, idx, k=10, nprobe=8, space=space,
            refine_base=base, refine_factor=(n // 10) + 1,
        ).collect()
        got = {(r["query_id"], r["id"]) for r in got_rows}
        assert got == exact, f"space={space}: covering refine must equal Flat"


def test_ivfsq_rejects_hamming(spark, base):
    q = base.limit(1).select(F.col("id").alias("query_id"), F.col("vector").alias("query_vec"))
    cents, vmin, vmax, idx = build_ivfsq(base, nlist=4)
    with pytest.raises(ValueError, match="hamming"):
        knn_ivfsq(q, cents, vmin, vmax, idx, k=5, space="hamming")
