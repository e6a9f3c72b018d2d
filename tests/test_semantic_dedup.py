

# ------------------------------------------------------------ drift


def test_embedding_centroid_drift_exact_and_detects_shift(spark):
    from fractions import Fraction

    from pyspark.sql import functions as F

    from oasisdb_spark.pipeline.semantic_dedup import embedding_centroid_drift

    a_vecs = [[0.1, 0.2, 0.3], [0.3, 0.2, 0.1], [0.2, 0.2, 0.2]]
    b_vecs = [[0.1, 0.7, 0.3], [0.3, 0.7, 0.1]]  # dim 1 shifted by +0.5
    da = spark.createDataFrame([(v,) for v in a_vecs], "embedding ARRAY<DOUBLE>")
    db = spark.createDataFrame([(v,) for v in b_vecs], "embedding ARRAY<DOUBLE>")
    out = {r["dim"]: r for r in embedding_centroid_drift(da, db).collect()}
    q = 1_000_000
    for d in range(3):
        sa = sum(round(v[d] * q) for v in a_vecs)
        sb = sum(round(v[d] * q) for v in b_vecs)
        r = out[d]
        assert (r["s_a"], r["n_a"], r["s_b"], r["n_b"]) == (sa, 3, sb, 2)
        assert Fraction(r["diff_num"], r["diff_den"]) == Fraction(sa, 3) - Fraction(sb, 2)
    # the shifted dimension dominates
    shifts = {d: abs(Fraction(out[d]["diff_num"], out[d]["diff_den"])) / q
              for d in range(3)}
    assert shifts[1] > 100 * max(shifts[0], shifts[2]) or (shifts[0] == shifts[2] == 0)
    assert abs(float(shifts[1]) - 0.5) < 1e-9
    # partitioning invariance
    out2 = {r["dim"]: tuple(r) for r in embedding_centroid_drift(
        da.repartition(3), db.coalesce(1)).collect()}
    assert out2 == {d: tuple(out[d]) for d in out}


def test_semantic_dedup_excludes_null_rows(spark):
    # NULL embeddings/ids used to die opaquely inside np.array
    from oasisdb_spark.pipeline.semantic_dedup import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None), (None, [0.0, 1.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    rows = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.95).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["kept"] and not rows[2]["kept"]
