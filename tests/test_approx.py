"""Approximate aggregates: HLL and count-min sketch bounded against exact."""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark):
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.1 * n, 5), (k, approx[k], n)


def test_kmv_distinct_within_error(spark):
    """KMV estimate within ~4/sqrt(k-2) of exact (4 sigma); groups with
    fewer than k distinct values are reported exactly."""
    from oasisdb_spark.functions.sketch import kmv_distinct
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    k = 64
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in kmv_distinct(ev, ["event_type"], "user_id", k=k).collect()
    }
    assert set(est) == set(exact)
    for g, n in exact.items():
        if n < k:
            assert est[g] == float(n), (g, est[g], n)
        else:
            assert abs(est[g] - n) <= 4.0 / (k - 2) ** 0.5 * n, (g, est[g], n)


def test_kmv_small_group_exact(spark):
    from oasisdb_spark.functions.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(300)],
        "g STRING, v INT",
    )
    got = {r["g"]: r["approx_distinct"] for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got["a"] == 7.0
    assert abs(got["b"] - 300) <= 0.6 * 300  # k=64 -> ~13% sigma; 4+ sigma slack


def test_count_min_sketch_overestimates_bounded(spark):
    """CMS guarantees estimate >= true count; width bounds the excess.
    This is the 100 TB heavy-hitter prefilter: sketch pass -> candidate
    keys -> exact count only for candidates."""
    from oasisdb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    total = ev.count()
    sketch_row = ev.agg(
        F.count_min_sketch(F.col("user_id"), F.lit(0.001), F.lit(0.01), F.lit(42)).alias("s")
    ).collect()[0]
    assert sketch_row["s"] is not None  # sketch builds distributedly

    # exact heavy hitters (support 1%) must all exceed the threshold
    hh = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= total * 0.01)
        .collect()
    )
    for r in hh:
        assert r["n"] >= total * 0.01


def test_quantile_sketch_matches_sample_order_stats(spark):
    """The estimate for (num, den) IS the ceil(num*n/den)-th smallest
    sample value — recompute the selection in python from the same
    deterministic sample."""
    from oasisdb_spark.functions.sketch import bottomk_sample, quantile_sketch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    qs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    out = {r["q"]: (r["est"], r["n_sample"])
           for r in quantile_sketch(ev, "value", "event_id", k=128, qs=qs).collect()}
    sample = bottomk_sample(
        ev.where(F.col("value").isNotNull()), "event_id", 128,
        keep_cols=["event_id", "value"],
    ).collect()
    vals = sorted((r["value"], r["event_id"]) for r in sample)
    n = len(vals)
    assert n == 128
    for num, den in qs:
        rank = (num * n + den - 1) // den
        assert out[num / den] == (vals[rank - 1][0], n)


def test_quantile_sketch_near_true_quantiles(spark):
    """k=512 over sf0.001 events: the sampled median must land within
    a few percentile points of the exact percentile."""
    from oasisdb_spark.functions.sketch import quantile_sketch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = ev.selectExpr("percentile(value, 0.5) AS m").collect()[0]["m"]
    lo, hi = (
        ev.selectExpr(
            "percentile(value, 0.40) AS lo", "percentile(value, 0.60) AS hi"
        ).collect()[0]
    )
    est = {
        r["q"]: r["est"]
        for r in quantile_sketch(ev, "value", "event_id", k=512).collect()
    }[0.5]
    assert lo <= est <= hi, (est, exact, lo, hi)


def test_bottomk_sample_mergeable(spark):
    """sketch(A ∪ B) == re-trim(sketch(A) ∪ sketch(B)) — the property
    that lets shards sample independently."""
    from oasisdb_spark.functions.sketch import bottomk_sample

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "value"
    )
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    whole = sorted(
        (r["_h"], r["event_id"])
        for r in bottomk_sample(ev, "event_id", 64).collect()
    )
    merged_df = bottomk_sample(a, "event_id", 64).unionByName(
        bottomk_sample(b, "event_id", 64)
    )
    merged = sorted((r["_h"], r["event_id"]) for r in merged_df.collect())[:64]
    assert whole == merged


def test_quantile_sketch_partitioning_invariant(spark):
    from oasisdb_spark.functions.sketch import quantile_sketch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    r1 = sorted(map(tuple, quantile_sketch(ev.repartition(1), "value", "event_id", k=64).collect()))
    r7 = sorted(map(tuple, quantile_sketch(ev.repartition(7), "value", "event_id", k=64).collect()))
    assert r1 == r7


def test_quantile_sketch_stream_matches_batch(spark, tmp_path):
    """The foreachBatch bottom-k re-trim over 3 forced micro-batches
    must equal the batch sketch exactly (mergeability through the
    streaming plumbing)."""
    from oasisdb_spark.functions.sketch import quantile_sketch, quantile_sketch_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "value"
    )
    d = tmp_path / "chunks"
    d.mkdir()
    import shutil, glob, os, time
    now = time.time()
    for i in range(3):
        tmp = str(tmp_path / f"_w{i}")
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        dst = str(d / f"chunk_{i}.parquet")
        shutil.copyfile(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (now - (3 - i) * 10, now - (3 - i) * 10))
    stream = (
        spark.readStream.schema("event_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    got = sorted(
        map(tuple, quantile_sketch_stream(stream, "value", "event_id", k=64).collect())
    )
    want = sorted(map(tuple, quantile_sketch(ev, "value", "event_id", k=64).collect()))
    assert got == want


def test_grouped_quantile_sketch_matches_per_group_python(spark):
    """Each group's estimates are the order statistics of ITS OWN
    deterministic bottom-k sample."""
    import hashlib

    from oasisdb_spark.functions.sketch import grouped_quantile_sketch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r["event_type"], r["q"]): (r["est"], r["n_sample"])
        for r in grouped_quantile_sketch(
            ev, "event_type", "value", "event_id", k=64
        ).collect()
    }
    rows = ev.select("event_type", "event_id", "value").where(
        "value IS NOT NULL"
    ).collect()
    by_g: dict = {}
    for r in rows:
        h = int(hashlib.md5((str(r["event_id"]) + "bottomk").encode()).hexdigest()[:15], 16)
        by_g.setdefault(r["event_type"], []).append((h, r["event_id"], r["value"]))
    for g, lst in by_g.items():
        lst.sort()
        sample = sorted((v, k) for _, k, v in lst[:64])
        n = len(sample)
        for num, den in [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]:
            rank = (num * n + den - 1) // den
            assert got[(g, num / den)] == (sample[rank - 1][0], n), (g, num, den)


def test_grouped_quantile_sketch_partitioning_invariant(spark):
    from oasisdb_spark.functions.sketch import grouped_quantile_sketch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, grouped_quantile_sketch(
        ev.repartition(1), "event_type", "value", "event_id", k=32).collect()))
    b = sorted(map(tuple, grouped_quantile_sketch(
        ev.repartition(7), "event_type", "value", "event_id", k=32).collect()))
    assert a == b


# ------------------------------------------------------------ kmv set ops


def _kmv_hash_py(v) -> float:
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) / float(1 << 60)


def _kmv_brute(a, b, k):
    sa = sorted(_kmv_hash_py(x) for x in set(a))[:k]
    sb = sorted(_kmv_hash_py(x) for x in set(b))[:k]
    u = sorted(set(sa) | set(sb))[:k]
    rho = sum(1 for h in u if h in set(sa) and h in set(sb))
    est = lambda s, n_exact: float(len(s)) if len(s) < k else (k - 1) / s[-1]
    union_raw = float(len(u)) if len(u) < k else (k - 1) / u[-1]
    return (
        round(est(sa, len(set(a))), 4),
        round(est(sb, len(set(b))), 4),
        round(union_raw, 4),
        round(rho / len(u), 4),
        round((rho / len(u)) * union_raw, 4),
        rho,
        len(u),
    )


def test_kmv_set_ops_matches_brute_and_reasonable(spark):
    from oasisdb_spark.functions.sketch import kmv_set_ops

    a_vals = list(range(0, 3000))          # |A| = 3000
    b_vals = list(range(1500, 4500))       # |B| = 3000, |A∩B| = 1500
    k = 128
    da = spark.createDataFrame([(v,) for v in a_vals], "v LONG")
    db = spark.createDataFrame([(v,) for v in b_vals], "v LONG")
    row = kmv_set_ops(da, db, "v", k=k).collect()[0]
    got = tuple(row)
    assert got == _kmv_brute(a_vals, b_vals, k)
    # estimator sanity (the md5 "sample" of this fixture is FIXED, so
    # these are deterministic: a-side lands ~3.5 sigma high — honest
    # KMV variance at k=128, std ~ n/sqrt(k-2) ~ 9%)
    assert abs(row["n_a_est"] - 3000) / 3000 < 0.35
    assert abs(row["n_b_est"] - 3000) / 3000 < 0.35
    assert abs(row["union_est"] - 4500) / 4500 < 0.35
    assert abs(row["intersect_est"] - 1500) / 1500 < 0.45
    # true jaccard = 1500/4500 = 0.333
    assert 0.15 < row["jaccard_est"] < 0.55


def test_kmv_set_ops_small_sets_exact_and_invariant(spark):
    from pyspark.sql import functions as F

    from oasisdb_spark.functions.sketch import kmv_set_ops

    da = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5, 5, 5]], "v LONG")
    db = spark.createDataFrame([(v,) for v in [4, 5, 6, 6]], "v LONG")
    row = kmv_set_ops(da, db, "v", k=64).collect()[0]
    # below k everything is exact: |A|=5 |B|=3 |A∪B|=6 |A∩B|=2
    assert (row["n_a_est"], row["n_b_est"], row["union_est"]) == (5.0, 3.0, 6.0)
    assert row["k_rho"] == 2 and row["sketch_size"] == 6
    assert row["intersect_est"] == 2.0
    # partitioning invariance
    row2 = kmv_set_ops(
        da.repartition(5), db.orderBy(F.rand(1)).coalesce(1), "v", k=64
    ).collect()[0]
    assert tuple(row2) == tuple(row)


# --- round-8 NULL-key / empty-input regressions --------------------------


def test_bottomk_sample_excludes_null_keys(spark):
    # NULL keys hash to NULL and Spark sorts NULLS FIRST asc: they used
    # to hog every sample slot (and DuckDB sorts NULLs LAST -- divergence)
    from oasisdb_spark.functions.sketch import bottomk_sample

    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("a", 3), ("b", 4)], "k STRING, v INT"
    )
    rows = bottomk_sample(df, "k", 2).collect()
    assert sorted(r["k"] for r in rows) == ["a", "b"]


def test_grouped_quantile_sketch_excludes_null_keys(spark):
    from oasisdb_spark.functions.sketch import grouped_quantile_sketch

    df = spark.createDataFrame(
        [("g", None, 5), ("g", "a", 1), ("g", "b", 2), ("g", "c", 3)],
        "grp STRING, k STRING, v INT",
    )
    out = grouped_quantile_sketch(df, "grp", "v", "k", k=8, qs=[(1, 2)])
    row = out.collect()[0]
    assert row["n_sample"] == 3  # NULL-key row not sampled
    assert row["est"] == 2


def test_kmv_set_ops_empty_inputs_null_estimates(spark):
    from oasisdb_spark.functions.sketch import kmv_set_ops

    e = spark.createDataFrame([], "v STRING")
    row = kmv_set_ops(e, e, "v").collect()[0]
    assert row["n_a_est"] == 0.0 and row["union_est"] == 0.0
    assert row["jaccard_est"] is None and row["intersect_est"] is None
    assert row["k_rho"] == 0 and row["sketch_size"] == 0
