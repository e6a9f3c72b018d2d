"""Integer-exact k-means curation family (pipeline/cluster_curate.py):
brute-force parity with a pure-python Lloyd's twin, partitioning
invariance (the hash-oracle property), empty-cluster semantics, the
prune/cap set rules, and the unit-scale range guard."""

from __future__ import annotations

import numpy as np
import pytest

from oasisdb_spark.functions.dimred import quantize_vectors_np
from oasisdb_spark.pipeline.cluster_curate import (
    KM_LIMIT,
    assign_clusters_quantized,
    cluster_balanced_sample,
    kmeans_cells,
    kmeans_fit_quantized,
    prototype_prune,
)


def _py_lloyds(vecs: list[list[float]], k: int, iters: int) -> list[list[int]]:
    """Reference twin: plain-python integer Lloyd's, same rules
    (first-k init by position in id order, lowest-cluster tie-break,
    floor-div update, empty keeps centroid)."""
    xq = [list(map(int, r)) for r in quantize_vectors_np(np.asarray(vecs))]
    d = len(xq[0])
    cent = [row[:] for row in xq[:k]]
    for _ in range(iters):
        asg = []
        for x in xq:
            best, bd = 0, None
            for c in range(k):
                d2 = sum((x[j] - cent[c][j]) ** 2 for j in range(d))
                if bd is None or d2 < bd:
                    best, bd = c, d2
            asg.append(best)
        for c in range(k):
            members = [xq[i] for i in range(len(xq)) if asg[i] == c]
            if members:
                n = len(members)
                cent[c] = [
                    (sum(m[j] for m in members) + KM_LIMIT * n) // n - KM_LIMIT
                    for j in range(d)
                ]
    return cent


def _vec_df(spark, vecs, parts=3):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    ).repartition(parts)


FIX = [
    [0.1, 0.2, -0.3, 0.05],
    [0.12, 0.18, -0.28, 0.04],
    [-0.5, 0.4, 0.1, -0.2],
    [-0.52, 0.38, 0.12, -0.22],
    [0.9, -0.7, 0.0, 0.3],
    [0.88, -0.72, 0.02, 0.28],
    [0.11, 0.21, -0.31, 0.06],
    [-0.49, 0.41, 0.09, -0.19],
    [0.91, -0.69, -0.01, 0.31],
    [0.0, 0.0, 0.0, 0.0],
]


def test_fit_matches_python_twin(spark):
    model = kmeans_fit_quantized(_vec_df(spark, FIX), k=3, iters=4)
    assert model.centroids.tolist() == _py_lloyds(FIX, k=3, iters=4)


def test_fit_partitioning_invariant(spark):
    """The hash-oracle property: identical model bits under any
    partitioning (int64 partial sums are associative)."""
    m1 = kmeans_fit_quantized(_vec_df(spark, FIX, parts=1), k=3, iters=4)
    m7 = kmeans_fit_quantized(_vec_df(spark, FIX, parts=7), k=3, iters=4)
    assert m1.centroids.tolist() == m7.centroids.tolist()


def test_empty_cluster_keeps_centroid(spark):
    """All-identical points with k=2: every assignment ties to cluster
    0 in every iteration, so cluster 1 stays empty throughout and must
    keep its init value (the LEFT-JOIN/keep branch both engines share)."""
    vecs = [[0.5, 0.5]] * 4
    model = kmeans_fit_quantized(_vec_df(spark, vecs), k=2, iters=3)
    assert model.centroids[1].tolist() == quantize_vectors_np(np.asarray([vecs[1]]))[0].tolist()
    rows = assign_clusters_quantized(_vec_df(spark, vecs), model).collect()
    assert all(r["cluster"] == 0 for r in rows)


def test_recapture_dynamics_match_python_twin(spark):
    """Duplicate init rows: cluster 1 empties in pass 1 (ties break
    low), keeps its centroid, then RECAPTURES points once cluster 0's
    centroid moves — nontrivial Lloyd dynamics that must replay
    identically in the pure-python twin (and hence the SQL oracle)."""
    vecs = [[0.5, 0.5], [0.5, 0.5], [-0.5, -0.5], [0.4, 0.6]]
    model = kmeans_fit_quantized(_vec_df(spark, vecs), k=2, iters=3)
    assert model.centroids.tolist() == _py_lloyds(vecs, k=2, iters=3)
    # pass 2 recaptured {0,1,3} into cluster 1: its centroid is their mean
    assert model.centroids[1].tolist() == [466666, 533333]


def test_assign_distance_exact(spark):
    model = kmeans_fit_quantized(_vec_df(spark, FIX), k=3, iters=2)
    rows = {r["vec_id"]: r for r in assign_clusters_quantized(_vec_df(spark, FIX), model).collect()}
    xq = quantize_vectors_np(np.asarray(FIX))
    for i, x in enumerate(xq):
        d2s = [int(((x - c) ** 2).sum()) for c in model.centroids]
        want = int(np.argmin(d2s))
        assert rows[i]["cluster"] == want
        assert rows[i]["d2"] == d2s[want]


def test_kmeans_cells_shape_and_occupancy(spark):
    df = _vec_df(spark, FIX)
    model = kmeans_fit_quantized(df, k=3, iters=4)
    cells = kmeans_cells(df, model).collect()
    assert len(cells) == 3 * 4
    # every dim row of a cluster carries the same occupancy; occupancies
    # sum to the table size
    per_cluster = {(r["cluster"], r["n_points"]) for r in cells}
    assert len(per_cluster) == 3
    assert sum(n for _, n in per_cluster) == len(FIX)
    # centroids in the long form match the model
    got = {(r["cluster"], r["dim"]): r["centroid"] for r in cells}
    for c in range(3):
        for j in range(4):
            assert got[(c, j)] == int(model.centroids[c, j])


def test_prototype_prune_drops_exact_fraction(spark):
    df = _vec_df(spark, FIX)
    model = kmeans_fit_quantized(df, k=2, iters=3)
    asg = assign_clusters_quantized(df, model).collect()
    sizes: dict[int, int] = {}
    for r in asg:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    kept = prototype_prune(df, model, drop_num=1, drop_den=4).collect()
    kept_sizes: dict[int, int] = {}
    for r in kept:
        kept_sizes[r["cluster"]] = kept_sizes.get(r["cluster"], 0) + 1
    for c, n in sizes.items():
        assert kept_sizes.get(c, 0) == n - n // 4
    # survivors are the FARTHEST from the centroid (prototypical dropped)
    by_cluster: dict[int, list] = {}
    for r in asg:
        by_cluster.setdefault(r["cluster"], []).append((r["d2"], r["vec_id"]))
    kept_ids = {r["vec_id"] for r in kept}
    for c, members in by_cluster.items():
        members.sort()
        drop = len(members) // 4
        assert {v for _, v in members[:drop]}.isdisjoint(kept_ids)


def test_cluster_balanced_cap_and_determinism(spark):
    df = _vec_df(spark, FIX)
    model = kmeans_fit_quantized(df, k=2, iters=3)
    out1 = sorted(
        (r["vec_id"], r["cluster"], r["c_rank"])
        for r in cluster_balanced_sample(df, model, cap=2).collect()
    )
    out2 = sorted(
        (r["vec_id"], r["cluster"], r["c_rank"])
        for r in cluster_balanced_sample(_vec_df(spark, FIX, parts=7), model, cap=2).collect()
    )
    assert out1 == out2
    per = {}
    for _, c, _rk in out1:
        per[c] = per.get(c, 0) + 1
    assert all(v <= 2 for v in per.values())
    assert out1  # non-empty


def test_range_guard_fires(spark):
    big = [[1e3, 0.0], [0.0, 1e3], [1.0, 1.0]]
    with pytest.raises(Exception, match="KM_LIMIT"):
        kmeans_fit_quantized(_vec_df(spark, big), k=2, iters=1)


def test_fixture_smoke(spark, embeddings):
    """End-to-end on the real fixture: model fits, cells sum to the
    table, prune + cap outputs are subsets with consistent clusters."""
    model = kmeans_fit_quantized(embeddings, k=4, iters=2)
    n = embeddings.count()
    cells = kmeans_cells(embeddings, model).collect()
    per_cluster = {}
    for r in cells:
        per_cluster[r["cluster"]] = r["n_points"]
    assert sum(per_cluster.values()) == n
    kept = prototype_prune(embeddings, model, 1, 4).count()
    assert 0 < kept < n


def test_cluster_curate_tolerates_null_rows(spark):
    # NULL vectors/ids used to die opaquely inside np.asarray (or hog
    # the balanced sample via a NULL selection hash)
    from oasisdb_spark.pipeline.cluster_curate import (
        assign_clusters_quantized,
        cluster_balanced_sample,
        kmeans_fit_quantized,
    )

    rows = [(i, [float(i % 4), 1.0]) for i in range(12)]
    rows += [(99, None), (None, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")

    m = kmeans_fit_quantized(df, k=2, iters=2)
    clean = df.where("embedding IS NOT NULL AND vec_id IS NOT NULL")
    m2 = kmeans_fit_quantized(clean, k=2, iters=2)
    assert (m.centroids == m2.centroids).all()

    asg = assign_clusters_quantized(df, m, keep_cols=["vec_id"]).collect()
    assert len(asg) == 13  # the NULL-embedding row is excluded
    bal = cluster_balanced_sample(df, m, cap=3).collect()
    assert all(r["vec_id"] is not None for r in bal)
