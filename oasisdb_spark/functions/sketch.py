"""KMV (k-minimum-values) distinct-count sketch.

A bottom-k sketch: hash every value to a uniform double in (0,1), keep
the k smallest distinct hashes per group; with n >= k distinct values
the k-th smallest hash h_k estimates the density k/n, giving the
classic unbiased estimator (k-1)/h_k (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"). Standard error is
~1/sqrt(k-2) — k=64 gives ~13%, k=1024 ~3%.

Why this next to Spark's built-in HLL (approx_count_distinct): the
sketch is engine-reproducible. The hash is md5-derived (the same
cross-engine trick as the MinHash coefficients, pipeline/dedup.py:50),
so a SQL oracle recomputes the estimate EXACTLY — the correctness gate
value-checks the whole sketch rather than bounding an opaque estimate.
Like HLL the sketch is mergeable (union of bottom-k sets, re-truncate),
so partial aggregation / map-side combine applies.

Scale shape (100 TB): pass 1 dedups (group, hash) with map-side partial
dedup (a hash aggregate, not a sort); pass 2 is a per-group top-k
window over ALREADY-DEDUPED hashes — shuffle volume is the number of
distinct values, and per-group state is O(k). No collect_set (whose
per-group array would be O(n) memory on a hot group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "kmv_hash",
    "kmv_distinct",
    "heavy_hitters",
    "bottomk_sample",
    "quantile_estimates",
    "quantile_sketch",
    "grouped_quantile_sketch",
    "quantile_sketch_stream",
    "heavy_hitters_stream",
    "kmv_set_ops",
]

_TWO60 = float(1 << 60)


def kmv_hash(col: Column | str) -> Column:
    """Uniform (0,1) double from the top 60 bits of md5 — identical in
    any engine with md5(): DuckDB equivalent
    ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT / POW(2, 60).
    The integer hash is text.py's char_hash60 — the ONE cross-engine
    md5-hash primitive (bit-equality verified there), reused so all
    md5-derived operators stay in lockstep."""
    from oasisdb_spark.pipeline.text import char_hash60

    c = F.col(col) if isinstance(col, str) else col
    return char_hash60(c.cast("string")) / F.lit(_TWO60)


def _salted_hash60(key_col: str, salt: str) -> Column:
    """char_hash60 of (key || salt) — the shared selection key of
    bottomk_sample / grouped_quantile_sketch (one primitive, not three
    hand-synchronized copies)."""
    from oasisdb_spark.pipeline.text import char_hash60

    return char_hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via a KMV sketch.

    Returns one row per group: (group_cols..., out_col DOUBLE). Groups
    with fewer than k distinct values report the exact count (the
    sketch holds every hash, so no estimation error).
    """
    hashes = (
        # COUNT(DISTINCT x) semantics: nulls don't count (also keeps the
        # null-ordering difference between engines out of the window)
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, kmv_hash(value_col).alias("_h"))
        .groupBy(*group_cols, "_h")
        .agg(F.lit(1))  # distinct (group, hash) with map-side partial dedup
        .select(*group_cols, "_h")
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    wall = Window.partitionBy(*group_cols)
    ranked = hashes.withColumn("_r", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wall)
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("_h")
    )
    return ranked.filter(
        ((F.col("_n") < k) & (F.col("_r") == F.col("_n"))) | (F.col("_r") == k)
    ).select(*group_cols, F.round(est, 4).alias(out_col))


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi: float,
    out_value: str = "value",
) -> DataFrame:
    """EXACT frequency-heavy-hitters (all values with count >= phi*N)
    without ever shuffling the full key space.

    Two phases, the candidates-then-verify shape (same contract as the
    Bloom semi-join and the LSH banding):

    1. candidates — a per-partition Misra–Gries summary with
       cap = ceil(2/phi) counters (batched decrement: when the summary
       overflows, subtract the smallest counts and drop zeros — total
       decrement per item <= local_rows/cap = phi*local_rows/2).
       Pigeonhole guarantees the superset: a true hitter has local
       frequency >= phi*local_rows in SOME partition (else its global
       sum is < phi*N), and there its MG estimate stays
       >= phi*local_rows/2 > 0, so it survives. Per-partition memory
       and emitted rows are O(1/phi), independent of the partition's
       key cardinality — this is what lets the operator run over a
       100 TB token stream without a vocabulary-sized shuffle.
    2. verify — the (tiny) distinct candidate set broadcasts back into
       one exact conditional count over the raw rows; false candidates
       die on the final >= ceil(phi*N) filter.

    Returns (out_value, cnt, share) — identical to the exact
    GROUP BY / HAVING, which is what the oracle runs. The full-shuffle
    groupBy this replaces moves O(distinct values) rows; this moves
    O(partitions / phi) candidate rows plus one broadcast.

    N counts NON-NULL values (SQL COUNT(value) semantics — nulls are
    not values; the kmv_distinct precedent), matching
    heavy_hitters_stream's additive row counter exactly, so the two
    agree on threshold and share even on null-bearing inputs.
    """
    import math

    import pandas as pd

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"heavy_hitters: phi must be in (0, 1], got {phi}")
    src = df.select(F.col(value_col).alias("_v")).where(F.col("_v").isNotNull())
    n = src.count()
    thresh = max(1, math.ceil(phi * n))
    cap = max(1, math.ceil(2.0 / phi))

    def _local(batches):
        # Misra–Gries per partition: merge each Arrow batch's exact
        # counts into the summary, then batch-decrement down to cap
        counts: dict = {}
        for pdf in batches:
            for v, c in pdf["_v"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > cap:
                # subtract the (len-cap)-th smallest count from all;
                # drops >= len-cap items, error per surviving item is
                # bounded by total_decrements/cap
                m = sorted(counts.values())[len(counts) - cap - 1]
                counts = {v: c - m for v, c in counts.items() if c > m}
        if counts:
            yield pd.DataFrame({"_v": list(counts.keys())})

    cand = src.mapInPandas(_local, schema=src.schema).distinct()
    return (
        src.join(F.broadcast(cand), on="_v", how="leftsemi")
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thresh)
        .select(
            F.col("_v").alias(out_value),
            "cnt",
            F.round(F.col("cnt") / F.lit(float(n)), 6).alias("share"),
        )
    )


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    k: int,
    salt: str = "bottomk",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """The k rows with the smallest md5-derived hash of the (unique)
    key — a fixed-size uniform row sample that is DETERMINISTIC and
    engine-reproducible (the KMV selection rule applied to whole rows).

    MERGEABLE like every bottom-k sketch: the sample of A ∪ B is the
    bottom-k re-trim of sample(A) ∪ sample(B) — union the `_h`-carrying
    frames and re-apply orderBy(_h, key).limit(k). That is what makes
    it a sketch rather than a one-shot LIMIT: shards/partitions/days
    can be sampled independently and combined exactly.

    Physical shape: TakeOrderedAndProject — per-partition top-k heaps,
    no sort shuffle; k bounded rows reach the driver side of the plan
    at any input size."""
    if k < 1:
        raise ValueError(f"bottomk_sample: k must be >= 1, got {k}")
    if keep_cols is None:
        keep_cols = [c for c in df.columns]
    h = _salted_hash60(key_col, salt)
    # NULL keys have a NULL salted hash: Spark sorts NULLS FIRST asc
    # (they'd hog every sample slot) while DuckDB sorts them LAST -- a
    # cross-engine divergence on top of a broken sample. A row without
    # an identity cannot be selected deterministically; exclude it (the
    # COUNT(DISTINCT)/kmv precedent).
    return (
        df.where(F.col(key_col).isNotNull())
        .select(*keep_cols)
        .withColumn("_h", h)
        .orderBy(F.col("_h").asc(), F.col(key_col).asc())
        .limit(k)
    )


def quantile_estimates(
    sample: DataFrame,
    value_col: str,
    key_col: str,
    qs: list[tuple[int, int]],
) -> DataFrame:
    """Order statistics of a (bounded) sample as quantile estimates.

    Quantiles are RATIONALS (num, den) so the selected rank,
    ceil(num*n/den) = (num*n + den - 1) // den, is pure integer
    arithmetic — the estimate for q is the rank-th smallest sample
    value under the total order (value, key), deterministic through
    ties. Over a bottomk_sample of size k the standard error of the
    q-th quantile's RANK is ~sqrt(q(1-q)/k) (classic sample-quantile
    asymptotics): k=512 puts the median within ~2.2 percentile points,
    k=4096 within ~0.8. Returns (q, est, n_sample).

    Why this next to Spark's approx_percentile (GK sketch): same reason
    kmv_distinct sits next to HLL — the estimate is engine-reproducible
    and therefore value-checkable by the SQL oracle, and the sample is
    mergeable across shards. The window below runs over ≤k rows (one
    bounded partition), which is the point: the 100 TB table never
    sorts; only the k-row sample does."""
    for num, den in qs:
        if not (0 < num <= den):
            raise ValueError(f"quantile_estimates: bad quantile {num}/{den}")
    spark = sample.sparkSession
    qdf = spark.createDataFrame(qs, schema="num INT, den INT")
    w = Window.orderBy(F.col(value_col).asc(), F.col(key_col).asc())
    ranked = (
        sample.select(value_col, key_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(F.lit(0))))
    )
    # ceil(num*n/den) as pure integer arithmetic (all operands positive,
    # so Spark's truncating `div` IS floor, matching DuckDB's `//`)
    target = F.expr("(num * _n + den - 1) div den")
    return (
        ranked.crossJoin(F.broadcast(qdf))
        .filter(F.col("_rn") == target)
        .select(
            (F.col("num").cast("double") / F.col("den")).alias("q"),
            F.col(value_col).alias("est"),
            F.col("_n").cast("long").alias("n_sample"),
        )
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 512,
    qs: list[tuple[int, int]] | None = None,
    salt: str = "bottomk",
) -> DataFrame:
    """Approximate quantiles of ``value_col`` via a deterministic
    bottom-k row sample: bottomk_sample (TakeOrdered heaps, no global
    sort) → quantile_estimates (integer-rank order statistics). NULL
    values don't participate (percentile semantics)."""
    if qs is None:
        qs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    sample = bottomk_sample(
        df.where(F.col(value_col).isNotNull()), key_col, k,
        salt=salt, keep_cols=[key_col, value_col],
    )
    return quantile_estimates(sample, value_col, key_col, qs)


def grouped_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    k: int = 256,
    qs: list[tuple[int, int]] | None = None,
    salt: str = "bottomk",
) -> DataFrame:
    """Per-group quantile estimates via an independent deterministic
    bottom-k sample PER GROUP — the profiling shape ("p50/p99 per
    source/domain/shard") at any scale.

    One shuffle on the group key; the per-group bottom-k is a
    WindowGroupLimit-trimmed rank (each input partition forwards at
    most k rows per group before the exchange), then the rank
    statistics run over <= k rows per group. Same integer ceil-rank
    selection and md5 hash order as quantile_sketch, so every estimate
    is engine-reproducible. Returns (group, q, est, n_sample)."""
    if k < 1:
        raise ValueError(f"grouped_quantile_sketch: k must be >= 1, got {k}")
    if qs is None:
        qs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    for num, den in qs:
        if not (0 < num <= den):
            raise ValueError(f"grouped_quantile_sketch: bad quantile {num}/{den}")
    spark = df.sparkSession
    h = _salted_hash60(key_col, salt)
    wsamp = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    sample = (
        # NULL keys excluded for the same reason as bottomk_sample
        df.where(F.col(value_col).isNotNull() & F.col(key_col).isNotNull())
        .select(group_col, key_col, value_col)
        .withColumn("_srn", F.row_number().over(wsamp))
        .where(F.col("_srn") <= k)
    )
    wrank = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(key_col).asc()
    )
    ranked = (
        sample.withColumn("_rn", F.row_number().over(wrank))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    )
    qdf = spark.createDataFrame(qs, schema="num INT, den INT")
    target = F.expr("(num * _n + den - 1) div den")
    return (
        ranked.crossJoin(F.broadcast(qdf))
        .filter(F.col("_rn") == target)
        .select(
            F.col(group_col),
            (F.col("num").cast("double") / F.col("den")).alias("q"),
            F.col(value_col).alias("est"),
            F.col("_n").cast("long").alias("n_sample"),
        )
    )


def quantile_sketch_stream(
    stream: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 512,
    qs: list[tuple[int, int]] | None = None,
    salt: str = "bottomk",
) -> DataFrame:
    """STREAMING twin of quantile_sketch: drains an availableNow stream
    through foreachBatch, each micro-batch contributing its LOCAL
    bottom-k; the running state is the re-trimmed union (<= k rows,
    bounded driver memory at any stream length). By the mergeability
    property (test_approx.py: sketch(A ∪ B) == re-trim(sketch(A) ∪
    sketch(B))), the final sample — and therefore every estimate — is
    IDENTICAL to the batch sketch over the full data regardless of
    batch boundaries, so the batch oracle hash-matches the stream.

    Blocks until the stream drains; returns the (q, est, n_sample)
    estimates DataFrame."""
    import shutil
    import tempfile

    if qs is None:
        qs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    if k < 1:
        raise ValueError(f"quantile_sketch_stream: k must be >= 1, got {k}")
    spark = stream.sparkSession
    key_f = next(f for f in stream.schema.fields if f.name == key_col)
    val_f = next(f for f in stream.schema.fields if f.name == value_col)
    state: dict = {"rows": []}  # [(h, key, value)] — always <= k

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        local = bottomk_sample(
            batch_df.where(F.col(value_col).isNotNull()),
            key_col,
            k,
            salt=salt,
            keep_cols=[key_col, value_col],
        ).collect()
        merged = state["rows"] + [
            (r["_h"], r[key_col], r[value_col]) for r in local
        ]
        merged.sort(key=lambda t: (t[0], t[1]))  # the bottomk total order
        state["rows"] = merged[:k]

    ckpt = tempfile.mkdtemp(prefix="qsketch_ckpt_")
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    sample = spark.createDataFrame(
        [(kk, vv) for _, kk, vv in state["rows"]],
        schema=T.StructType([key_f, val_f]),
    )
    return quantile_estimates(sample, value_col, key_col, qs)


def heavy_hitters_stream(
    stream: DataFrame,
    value_col: str,
    phi: float,
    verify_df: DataFrame,
    out_value: str = "value",
) -> DataFrame:
    """STREAMING twin of heavy_hitters: Misra–Gries candidate tracking
    AT INGEST, exact verification at promotion — the same
    candidates-then-verify contract as the batch operator, split
    across the stream/batch boundary.

    Each micro-batch runs the per-partition MG summary (bounded
    O(1/phi) rows to the driver per batch, whatever the batch's key
    cardinality); the driver folds them into ONE running MG summary
    via the mergeable-summaries rule (add counts, batch-decrement back
    to cap — Agarwal et al., PODS'12). TWO MG layers stack their
    decrements, so the cap here is ceil(4/phi) — stricter than the
    batch operator's 2/phi: per-partition decrements charge any item
    <= N/cap <= phi*N/4 and the driver merges another <= N/(cap+1) <
    phi*N/4, total < phi*N/2 — every true phi-hitter ends the stream
    with a positive residual. The candidate set is a SUPERSET, with
    <= cap entries of driver state at any stream length. The exact row
    count N accumulates additively alongside (a NULL-keyed per-
    partition count row rides the same Arrow pass — no second scan).

    The final exact verify runs over ``verify_df`` (the promoted
    table): candidates broadcast into one conditional count, false
    candidates die on the >= ceil(phi*N) threshold. Because the verify
    is exact and the candidate set is a superset, the result is
    IDENTICAL to batch heavy_hitters — the batch oracle hash-matches
    the stream. Blocks until the stream drains."""
    import math
    import shutil
    import tempfile

    import pandas as pd

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"heavy_hitters_stream: phi must be in (0, 1], got {phi}")
    cap = max(1, math.ceil(4.0 / phi))
    state: dict = {"counts": {}, "n": 0}

    def _local(batches):
        counts: dict = {}
        rows = 0
        for pdf in batches:
            vals = pdf["_v"].dropna()
            rows += len(vals)
            for v, c in vals.value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > cap:
                m = sorted(counts.values())[len(counts) - cap - 1]
                counts = {v: c - m for v, c in counts.items() if c > m}
        if counts or rows:
            yield pd.DataFrame(
                {"_v": list(counts.keys()) + [None], "_c": list(counts.values()) + [rows]}
            )

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        src = batch_df.select(F.col(value_col).alias("_v"))
        local = src.mapInPandas(
            _local, schema=f"_v {src.schema['_v'].dataType.simpleString()}, _c long"
        ).collect()
        counts = state["counts"]
        for r in local:
            if r["_v"] is None:
                state["n"] += r["_c"]
            else:
                counts[r["_v"]] = counts.get(r["_v"], 0) + r["_c"]
        if len(counts) > cap:
            m = sorted(counts.values())[len(counts) - cap - 1]
            counts = {v: c - m for v, c in counts.items() if c > m}
        state["counts"] = counts

    ckpt = tempfile.mkdtemp(prefix="hh_ckpt_")
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    spark = verify_df.sparkSession
    n, thresh = state["n"], max(1, math.ceil(phi * state["n"]))
    vtype = next(
        f.dataType.simpleString() for f in verify_df.schema.fields if f.name == value_col
    )
    cand = spark.createDataFrame(
        [(v,) for v in state["counts"]], schema=f"_v {vtype}"
    ).distinct()
    src = verify_df.select(F.col(value_col).alias("_v")).where(F.col("_v").isNotNull())
    return (
        src.join(F.broadcast(cand), on="_v", how="leftsemi")
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thresh)
        .select(
            F.col("_v").alias(out_value),
            "cnt",
            F.round(F.col("cnt") / F.lit(float(n)), 6).alias("share"),
        )
    )


def kmv_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """KMV set-operation estimates between two value sets — the
    "audience overlap" question (|A|, |B|, |A∪B|, Jaccard, |A∩B|)
    answered from two bottom-k sketches (Beyer et al., SIGMOD'07; the
    same estimator family as Theta sketches).

    The union sketch is the bottom-k re-trim of sketch(A) ∪ sketch(B)
    — KMV's mergeability — and Kρ counts union-sketch hashes present
    in BOTH side sketches: Jaccard ≈ Kρ / |U|, |A∩B| ≈ Jaccard·|A∪B|.
    Sides with fewer than k distinct values report exact counts (their
    sketch holds every hash). Deterministic end-to-end: the hash is
    the shared md5-top-60-bit primitive, bottom-k selection is
    TakeOrderedAndProject (per-partition heaps — k rows cross the
    plan at ANY input size; the raw sides are scanned once and never
    shuffled), and the estimator divisions act on bit-identical
    doubles in a pinned operand order, so the result hash-matches the
    SQL twin.

    Returns ONE row: (n_a_est, n_b_est, union_est, jaccard_est,
    intersect_est — doubles rounded to 4, the kmv_distinct idiom —
    plus the integer evidence k_rho and sketch_size). Assumes no
    60-bit hash collisions within the sketches (expected collisions
    ~k²/2⁶¹ — negligible for any practical k)."""
    if k < 2:
        raise ValueError(f"kmv_set_ops: k must be >= 2, got {k}")

    def sk(d: DataFrame) -> DataFrame:
        return (
            d.where(F.col(value_col).isNotNull())
            .select(kmv_hash(value_col).alias("_h"))
            .distinct()
            .orderBy("_h")
            .limit(k)
        )

    # each side sketch is referenced three times (its own estimator agg,
    # the union re-trim, the rho semi-joins); left lazy, every reference
    # replays the full raw-side scan — 8 input scans at sf0.1. The
    # sketches are <= k rows, so lazy localCheckpoints truncate the
    # repeated subtrees to RDD scans: each raw side is scanned exactly
    # once. Rows unchanged; blocks tracked for release at the
    # harness's next between-queries point (ckpt.track — OPTIMIZATION
    # r13, guide §5).
    from oasisdb_spark.ckpt import track

    ha, hb = track(sk(df_a).localCheckpoint(eager=False)), track(
        sk(df_b).localCheckpoint(eager=False)
    )
    u = ha.union(hb).distinct().orderBy("_h").limit(k)
    a_agg = ha.agg(F.count(F.lit(1)).alias("_na"), F.max("_h").alias("_hka"))
    b_agg = hb.agg(F.count(F.lit(1)).alias("_nb"), F.max("_h").alias("_hkb"))
    u_agg = u.agg(F.count(F.lit(1)).alias("_nu"), F.max("_h").alias("_theta"))
    rho = (
        u.join(ha, on="_h", how="left_semi")
        .join(hb, on="_h", how="left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("k_rho"))
    )

    def est(n: str, hk: str) -> Column:
        return F.when(F.col(n) < k, F.col(n).cast("double")).otherwise(
            F.lit(float(k - 1)) / F.col(hk)
        )

    row = a_agg.crossJoin(b_agg).crossJoin(u_agg).crossJoin(rho)
    union_raw = est("_nu", "_theta")
    return row.select(
        F.round(est("_na", "_hka"), 4).alias("n_a_est"),
        F.round(est("_nb", "_hkb"), 4).alias("n_b_est"),
        F.round(union_raw, 4).alias("union_est"),
        # try_divide: an empty union sketch (both inputs empty) yields
        # NULL estimates instead of an ANSI DIVIDE_BY_ZERO crash
        F.round(F.try_divide(F.col("k_rho"), F.col("_nu")), 4).alias(
            "jaccard_est"
        ),
        F.round(
            F.try_divide(F.col("k_rho"), F.col("_nu")) * union_raw, 4
        ).alias("intersect_est"),
        F.col("k_rho"),
        F.col("_nu").cast("long").alias("sketch_size"),
    )
