"""Tests for functions/dimred.py (distributed PCA)."""

import numpy as np
import pytest

from oasisdb_spark.functions.dimred import fit_pca, pca_project


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(7)
    # anisotropic: variance concentrated in 2 latent directions of a 6-d space
    latent = rng.randn(400, 2) * np.array([5.0, 2.0])
    basis = np.linalg.qr(rng.randn(6, 6))[0][:, :2]
    x = latent @ basis.T + rng.randn(400, 6) * 0.05 + np.array([1, 2, 3, 4, 5, 6])
    rows = [(i, x[i].tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>").repartition(7)
    return df, x


def test_fit_matches_numpy(data):
    df, x = data
    m = fit_pca(df, n_components=3)
    # numpy reference
    c = x - x.mean(axis=0)
    cov = c.T @ c / (len(x) - 1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(m.mean, x.mean(axis=0), atol=1e-9)
    assert np.allclose(m.explained_variance, evals, rtol=1e-8)
    # components orthonormal
    assert np.allclose(m.components.T @ m.components, np.eye(3), atol=1e-9)
    # two dominant components explain ~everything
    assert m.explained_ratio()[:2].sum() > 0.99


def test_projection_variance_and_reconstruction(data):
    df, x = data
    m = fit_pca(df, n_components=2)
    out = pca_project(df, m).orderBy("vec_id").collect()
    p = np.array([r["proj"] for r in out])
    assert p.shape == (400, 2)
    # projection variance equals the eigenvalues (component-wise)
    assert np.allclose(p.var(axis=0, ddof=1), m.explained_variance, rtol=1e-6)
    # reconstruction error is the residual variance — tiny here
    recon = p @ m.components.T + m.mean
    rel = np.linalg.norm(recon - x) / np.linalg.norm(x - x.mean(axis=0))
    assert rel < 0.05


def test_projection_preserves_neighborhoods(data):
    # kNN over the 2-d projection agrees with full-space kNN when the
    # data is intrinsically 2-d: the embedding-compression use case
    df, x = data
    m = fit_pca(df, n_components=2)
    out = pca_project(df, m).orderBy("vec_id").collect()
    p = np.array([r["proj"] for r in out])
    q = 0
    full = np.argsort(((x - x[q]) ** 2).sum(axis=1))[1:11]
    proj = np.argsort(((p - p[q]) ** 2).sum(axis=1))[1:11]
    assert len(set(full) & set(proj)) >= 8


def test_sign_deterministic_across_partitionings(data):
    df, _ = data
    a = fit_pca(df.repartition(3), n_components=2)
    b = fit_pca(df.repartition(11), n_components=2)
    assert np.allclose(a.components, b.components, atol=1e-9)
    assert np.allclose(a.mean, b.mean, atol=1e-10)


def test_validation(data, spark):
    df, _ = data
    with pytest.raises(ValueError):
        fit_pca(df, n_components=0)
    with pytest.raises(ValueError):
        fit_pca(df, n_components=99)
    empty = df.filter("vec_id < 0")
    with pytest.raises(ValueError):
        fit_pca(empty, n_components=1)


def test_quantized_fit_is_partitioning_invariant(spark):
    """The int-moment fit must yield the IDENTICAL model under any
    partitioning (integer addition is associative), and match a
    single-pass numpy fit via the shared core — the property that makes
    pca_knn hash-oracle-able."""
    import numpy as np

    from oasisdb_spark.functions.dimred import (
        fit_pca_quantized,
        pca_model_from_int_moments,
        quantize_vectors_np,
    )

    rng = np.random.RandomState(7)
    x = rng.randn(300, 8).astype(np.float32) * 0.3
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")

    m1 = fit_pca_quantized(df.repartition(1), n_components=4)
    m7 = fit_pca_quantized(df.repartition(7), n_components=4)
    xq = quantize_vectors_np(x)
    mnp = pca_model_from_int_moments(
        len(xq), xq.sum(axis=0, dtype=np.int64), xq.T @ xq, 4
    )
    for a, b in [(m1, m7), (m1, mnp)]:
        assert np.array_equal(a.mean_q, b.mean_q)
        assert np.array_equal(a.comp_q, b.comp_q)


def test_quantized_projection_matches_numpy_and_rescale_semantics(spark):
    """Projection must equal the numpy int pipeline including the
    positive-offset floor-division rescale (DuckDB `//` truncates
    negatives; the offset makes both engines agree)."""
    import numpy as np

    from oasisdb_spark.functions.dimred import (
        PCA_OFF,
        PCA_SC,
        fit_pca_quantized,
        pca_project_quantized,
        quantize_vectors_np,
    )

    rng = np.random.RandomState(11)
    x = rng.randn(120, 8).astype(np.float32) * 0.3
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    model = fit_pca_quantized(df, n_components=3)

    got = {r["vec_id"]: list(r["proj"])
           for r in pca_project_quantized(df.repartition(5), model).collect()}
    xq = quantize_vectors_np(x)
    raw = (xq - model.mean_q) @ model.comp_q
    want = (raw + PCA_OFF) // PCA_SC - PCA_OFF // PCA_SC
    for i in range(len(x)):
        assert got[i] == list(want[i])
    # quantized projections track the float PCA (same sign-flip rule in
    # both fits) to well under quantization scale
    from oasisdb_spark.functions.dimred import PCA_SX, fit_pca, pca_project
    fmodel = fit_pca(df, n_components=3)
    fgot = {r["vec_id"]: np.asarray(r["proj"])
            for r in pca_project(df, fmodel).collect()}
    for i in range(0, len(x), 17):
        assert np.allclose(np.asarray(got[i]) / PCA_SX, fgot[i], atol=1e-4)


def test_pca_tolerates_null_vectors(spark):
    # a NULL embedding used to die inside np.asarray with an opaque
    # executor error; fits skip it, projections carry NULL through
    import numpy as np

    from oasisdb_spark.functions.dimred import (
        fit_pca,
        fit_pca_quantized,
        pca_project,
        pca_project_quantized,
    )

    rows = [(i, [float(i), float(i % 3), 1.0, 0.0]) for i in range(20)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "id INT, embedding ARRAY<DOUBLE>")

    m = fit_pca(df, n_components=2)
    clean = df.where("embedding IS NOT NULL")
    m2 = fit_pca(clean, n_components=2)
    assert np.allclose(m.mean, m2.mean)

    out = {r["id"]: r["proj"] for r in pca_project(df, m).collect()}
    assert out[99] is None and out[0] is not None

    mq = fit_pca_quantized(df, n_components=2)
    outq = {r["id"]: r["proj"] for r in pca_project_quantized(df, mq).collect()}
    assert outq[99] is None and len(outq[0]) == 2
