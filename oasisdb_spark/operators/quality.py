"""Data-quality gates for pipeline tables.

Two operators every production ingestion pipeline runs before promoting
a snapshot, expressed as single-pass aggregates (no driver loops, no
row materialization):

- ``check_constraints``: evaluate named row-level expectations
  (dbt-test / Great-Expectations style) in ONE scan — each constraint
  is a boolean Column, and all violation counts come from a single
  partial-aggregated pass, however many constraints there are. A
  referential check is expressible by the caller as an anti-join count
  beforehand; row-level rules stay in the scan stage.
- ``snapshot_diff``: key-level delta between two table versions
  (added / removed / changed / unchanged) via one full-outer join on
  the key plus md5 row fingerprints computed scan-side — the shape of
  an incremental-pipeline promotion gate ("how much did this rebuild
  change?"). Cost: two scans + one shuffle on the key; fingerprints
  mean no column-by-column comparison ever crosses the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_constraints",
    "snapshot_diff",
    "psi_drift",
    "psi_drift_stream",
    "grouped_median_exact",
    "mad_outliers",
    "rolling_zscore_flags",
    "chi2_independence",
    "goodness_of_fit",
    "BENFORD_MICRO",
    "rapid_repeats",
]


def check_constraints(df: DataFrame, constraints: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean expectations in one aggregate pass.

    ``constraints`` maps name -> Column predicate that should hold for
    every row (NULL counts as a violation — an unknown is not a pass).
    Returns (constraint, n_rows, n_violations, violation_rate) with one
    row per constraint, in one scan regardless of len(constraints):
    each predicate becomes a conditional count in the same partial agg,
    and the per-constraint rows are a stack over the (tiny) aggregate
    row, not over the data.
    """
    if not constraints:
        raise ValueError("constraints must be non-empty")
    # internal aliases are index-based so arbitrary constraint names
    # (dots, backticks, spaces) never enter a column reference
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, pred in enumerate(constraints.values()):
        # coalesce: SUM over zero rows is NULL — an EMPTY snapshot must
        # report 0 violations / rate 0.0, not NULL, or a promotion gate
        # testing n_violations == 0 silently evaluates to NULL (ADVICE r04)
        aggs.append(
            F.coalesce(
                F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1))), F.lit(0)
            ).alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("constraint"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__v{i}").cast("bigint").alias("n_violations"),
                )
                for i, name in enumerate(constraints)
            ])
        ).alias("c")
    )
    return stacked.select(
        "c.constraint",
        "c.n_rows",
        "c.n_violations",
        F.round(F.col("c.n_violations") / F.greatest(F.col("c.n_rows"), F.lit(1)), 6)
        .alias("violation_rate"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level delta between two snapshots: one row per key present
    in either side with status in {added, removed, changed, unchanged}.

    ``compare_cols`` defaults to all shared non-key columns (sorted by
    name so the fingerprint is stable). Row contents are reduced to an
    md5 fingerprint ON EACH SCAN SIDE, so the full-outer join on the
    key carries (key, fingerprint) only — at 100 TB the shuffle moves
    ~48 bytes/row no matter how wide the table is. Aggregate the result
    by status for the promotion-gate summary, or anti-filter
    status != 'unchanged' for the change feed.

    Contract: ``key_cols`` identify rows UNIQUELY on each side --
    duplicate keys cross-product through the full-outer join (m x n
    status rows per key), which is visible but not meaningful; dedup or
    aggregate first. NULL keys never equi-match, so a NULL-key row
    shows up as one `removed` plus one `added` -- surfacing the data
    bug rather than hiding it.
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(c for c in shared if c not in set(key_cols))
    # Collision-proof fingerprint (ADVICE r04 / VERDICT r04 #4): md5
    # EACH column before joining, so a value containing the separator
    # byte can never shift field boundaries, and NULL's marker ("∅",
    # not a 32-char lowercase-hex string) can never alias a real value.
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.md5(F.col(c).cast("string")), F.lit("∅"))
                for c in compare_cols
            ],
        )
    )
    o = old.select(*key_cols, fp.alias("_fp_old"))
    n = new.select(*key_cols, fp.alias("_fp_new"))
    joined = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") == F.col("_fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard distribution-drift gate (PSI < 0.1 stable,
    0.1-0.25 moderate, > 0.25 shifted), engine-exact.

    Buckets are n_buckets fixed-width bins over the BASELINE's
    [min, max] (values outside clamp to the edge bins — drift mass
    beyond the baseline range lands in bucket 0 or n-1, which is
    exactly what a drift gate should surface). Every bucket count is
    Laplace-smoothed (+1, totals +n_buckets), so empty bins need no
    epsilon hack, and each PSI term becomes

        (a'·B' - b'·A') * (lmic(a'·B') - lmic(b'·A')) // (A'·B')

    — integer share differences times the micro-nat log-ratio of
    INTEGER products (the pipeline/lm.py lmic primitive), floor-divided
    by the total product: pure integer arithmetic in DECIMAL(38,0)
    (the chi2_independence 128-bit idiom — int64 overflows the contrib
    numerator at a few million strongly-drifted rows per snapshot),
    bit-reproducible against DuckDB's HUGEINT. Terms are non-negative
    (lmic is monotone), so floor rounding is one-sided; the result is
    in micro-PSI (1e-6 PSI units). A baseline with NO non-NULL values
    has no bucket range — the bucket expression raises loudly instead
    of silently zeroing the current side (round-6 advisory).

    Returns one row per bucket: (bucket, base_cnt, cur_cnt,
    psi_contrib_micro); total PSI = sum of contribs. NULLs don't
    participate. Shape: one bucket-keyed partial agg per side over a
    scan-stage bucket expression, then joins over n_buckets rows —
    the raw tables never co-shuffle.
    """
    if n_buckets < 2:
        raise ValueError(f"psi_drift: n_buckets must be >= 2, got {n_buckets}")
    spark = baseline.sparkSession
    # NaN is not a value: it has no bucket (Spark ranks NaN greatest —
    # it would silently clamp into the top bin AND poison the baseline
    # max) — the complete-case convention extended to NaN
    rng = baseline.where(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    ).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )

    def bucket_counts(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        raw = F.floor((v - F.col("_mn")) * n_buckets / (F.col("_mx") - F.col("_mn")))
        b = F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(
            F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw))
        )
        return (
            df.where(F.col(value_col).isNotNull() & ~F.isnan(value_col))
            .crossJoin(F.broadcast(rng))
            .select(b.cast("int").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    # the degenerate-baseline guard rides the grid (always n_buckets
    # rows), so it fires even when the CURRENT side is also empty —
    # exactly matching psi_drift_stream's up-front ValueError (the
    # r06-advisory edge; a guard inside bucket_counts would only
    # evaluate when a current-side row exists)
    counts = (
        grid.crossJoin(F.broadcast(rng))
        .select(
            F.when(
                F.col("_mn").isNull() | F.col("_mx").isNull(),
                F.raise_error(
                    f"psi_drift: baseline has no non-NULL {value_col!r} "
                    "values — no bucket range to score against"
                ),
            ).otherwise(F.col("bucket")).alias("bucket")
        )
        .join(bucket_counts(baseline, "base_cnt"), "bucket", "left")
        .join(bucket_counts(current, "cur_cnt"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("base_cnt", F.lit(0)).cast("long").alias("base_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).cast("long").alias("cur_cnt"),
        )
    )
    return _psi_from_counts(counts, n_buckets)


def _psi_from_counts(counts: DataFrame, n_buckets: int) -> DataFrame:
    """The smoothed integer PSI arithmetic over a (bucket, base_cnt,
    cur_cnt) frame — shared by psi_drift and psi_drift_stream.

    Products run in DECIMAL(38,0) with DIV (the chi2_independence
    128-bit idiom): a'·B' ~ N² and the contrib numerator ~ N²·1e⁷ both
    blow int64 at a few million strongly-drifted rows per snapshot —
    exactly the regime the gate exists to flag (round-6 advisory).
    lmic's input arrives as DECIMAL(38,0) and is cast to double inside
    lmic, identical to the int64 path for counts below 2⁵³ products —
    i.e. everywhere DuckDB's HUGEINT oracle also rounds the same ln().
    Remaining budget: the DECIMAL(38,0) numerator caps snapshots at
    ~10¹⁴ rows each (N²·1e⁸ < 10³⁸), far past any single-snapshot
    reality."""
    from pyspark.sql import Window as _W

    from oasisdb_spark.pipeline.lm import lmic

    w = _W.partitionBy(F.lit(0))  # single-group window for the totals
    # distinct names per column — Spark resolves case-insensitively by
    # default, so a1/A1-style pairs would silently alias each other
    sa = F.col("base_cnt") + 1  # smoothed bucket counts
    sb = F.col("cur_cnt") + 1
    ta = F.sum("base_cnt").over(w) + n_buckets  # smoothed totals
    tb = F.sum("cur_cnt").over(w) + n_buckets
    ab = F.expr("CAST(_sa AS DECIMAL(38,0)) * _tb")
    ba = F.expr("CAST(_sb AS DECIMAL(38,0)) * _ta")
    contrib = F.expr(
        "((_ab - _ba) * (_lab - _lba))"
        " DIV (CAST(_ta AS DECIMAL(38,0)) * _tb)"
    )
    return (
        counts.withColumn("_sa", sa.cast("long"))
        .withColumn("_sb", sb.cast("long"))
        .withColumn("_ta", ta.cast("long"))
        .withColumn("_tb", tb.cast("long"))
        .withColumn("_ab", ab)
        .withColumn("_ba", ba)
        .withColumn("_lab", lmic(F.col("_ab")))
        .withColumn("_lba", lmic(F.col("_ba")))
        .select(
            "bucket", "base_cnt", "cur_cnt",
            contrib.cast("long").alias("psi_contrib_micro"),
        )
    )


def psi_drift_stream(
    baseline: DataFrame,
    stream: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """STREAMING twin of psi_drift: the current-side snapshot arrives
    as an availableNow stream; per micro-batch the SAME bucket
    expression (baseline [min, max] inlined as literals — the exact
    float64 values the batch side computes) produces per-bucket counts,
    accumulated in an n_buckets-int dict of driver state. Bucket counts
    are ADDITIVE across batches, so the final counts — and every PSI
    contribution — equal the batch psi_drift exactly, and the batch
    oracle hash-matches the stream. Blocks until the stream drains."""
    import shutil
    import tempfile

    if n_buckets < 2:
        raise ValueError(f"psi_drift_stream: n_buckets must be >= 2, got {n_buckets}")
    spark = baseline.sparkSession
    # NaN is not a value (the batch psi_drift convention): it would
    # poison the baseline max and clamp into the top bin
    row = baseline.where(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    ).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    ).first()
    mn, mx = row["_mn"], row["_mx"]
    if mn is None or mx is None:
        # fail BEFORE starting the stream: a NULL range would bucket
        # every arriving row to NULL and KeyError inside foreachBatch,
        # surfacing as an opaque StreamingQueryException (r06 advisory)
        raise ValueError(
            f"psi_drift_stream: baseline has no non-NULL {value_col!r} "
            "values — no bucket range to score against"
        )
    acc = {i: 0 for i in range(n_buckets)}

    def bucket_col() -> Column:
        v = F.col(value_col).cast("double")
        raw = F.floor((v - F.lit(mn)) * n_buckets / (F.lit(mx) - F.lit(mn)))
        return F.when(F.lit(mx) == F.lit(mn), F.lit(0)).otherwise(
            F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw))
        ).cast("int")

    def _fold(batch_df: DataFrame, _bid: int) -> None:
        for r in (
            batch_df.where(F.col(value_col).isNotNull() & ~F.isnan(value_col))
            .select(bucket_col().alias("bucket"))
            .groupBy("bucket")
            .count()
            .collect()
        ):
            acc[r["bucket"]] += r["count"]

    ckpt = tempfile.mkdtemp(prefix="psi_ckpt_")
    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    # baseline side buckets with the ALREADY-collected [mn, mx] inlined
    # as literals (the exact values the guard scan produced) — no
    # second min/max pass over the baseline table
    base_counts = (
        baseline.where(F.col(value_col).isNotNull() & ~F.isnan(value_col))
        .select(bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("base_cnt"))
    )
    cur_counts = spark.createDataFrame(
        [(i, int(acc[i])) for i in range(n_buckets)],
        schema="bucket INT, cur_cnt LONG",
    )
    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    counts = (
        grid.join(base_counts, "bucket", "left")
        .join(cur_counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("base_cnt", F.lit(0)).cast("long").alias("base_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).cast("long").alias("cur_cnt"),
        )
    )
    return _psi_from_counts(counts, n_buckets)


def grouped_median_exact(
    df: DataFrame, value_col: str, group_cols: list[str], out_col: str = "median"
) -> DataFrame:
    """Exact per-group LOWER median of an INTEGER column — the
    deterministic median dialect (the value at ascending rank
    ceil(n/2); never an average of two middles, so the result is a
    value that OCCURS and stays integer-exact cross-engine).

    Shape: the raw table collapses to a per-(group, value) count
    histogram FIRST (one partial-agg shuffle — map-side combine does
    the heavy lifting), then cumulative-count windows run over the
    DISTINCT-VALUE frame, not the rows: for a 10^12-row group with
    10^5 distinct quantized values, the window sorts 10^5 rows. The
    median is the first value whose cumulative count reaches
    (n+1) div 2."""
    from pyspark.sql.window import Window

    # SQL median semantics: NULLs are not values. Left in, the NULL
    # histogram bucket sorts FIRST in the ascending cumulative window
    # (Spark asc = nulls first) and its count shifts every rank -- the
    # median of {NULL, NULL, 1, 2, 3} came back 1 (regression-pinned).
    df = df.where(F.col(value_col).isNotNull())
    cnt = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_k")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = cnt.withColumn("_cum", F.sum("_k").over(w_cum)).withColumn(
        "_n", F.sum("_k").over(w_all)
    )
    # integer div, not float-floor: (n+1)/2 through double is exact
    # only below 2^53 rows/group — `div` is the repo's exactness idiom
    # and matches the oracle's (n+1)//2 at any count
    r = F.expr("(_n + 1) div 2")
    return ranked.where(
        (F.col("_cum") >= r) & (F.col("_cum") - F.col("_k") < r)
    ).select(*group_cols, F.col(value_col).alias(out_col))


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    threshold: int = 3,
) -> DataFrame:
    """Robust per-group outlier gate: flag rows whose absolute
    deviation from the group's exact lower median exceeds
    ``threshold`` x the group's MAD (median absolute deviation, same
    lower-median dialect — Hampel's robust z-score with integer
    arithmetic; Leys et al. 2013 recommend exactly this over
    mean/stddev, which outliers themselves corrupt). ``value_col``
    must be an INTEGER column (quantize floats upstream, e.g.
    round(value*100)); the comparison ``dev > threshold * mad`` is
    then engine-exact with no division anywhere.

    Returns the flagged rows: group cols + (row id cols pass through)
    + value, dev, median, mad.

    Shape: two grouped-median passes (each a histogram partial-agg +
    a distinct-value window — see grouped_median_exact) + two
    group-keyed joins of group-cardinality frames back onto the scan
    (broadcast when groups are few). The raw table is scanned three
    times (median histogram, MAD histogram via the med-joined dev
    frame, and the output's left side) and never globally sorted."""
    # Both median frames are group-cardinality sized but their plans
    # embed full scans of df (and dev's plan embeds med's): left as
    # plain lazy frames, `dev` is replayed inside the MAD build AND as
    # the output's left side, so the raw table was scanned 8x / 18
    # Exchanges at sf0.1. Lazy localCheckpoints of the two TINY
    # per-group frames truncate the repeated subtrees to RDD scans —
    # df is scanned three times (checkpointing `dev` to reach two would
    # materialize a CORPUS-sized frame; round-13 advisory corrected the
    # docstring instead), rows unchanged. Checkpoint blocks are tracked
    # for release at the harness's next between-queries point
    # (ckpt.track — OPTIMIZATION r13, guide §5).
    from oasisdb_spark.ckpt import track

    med = track(grouped_median_exact(
        df, value_col, group_cols, out_col="median"
    ).localCheckpoint(eager=False))
    with_med = df.join(med, on=group_cols)
    dev = with_med.withColumn(
        "dev", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = track(grouped_median_exact(
        dev, "dev", group_cols, out_col="mad"
    ).localCheckpoint(eager=False))
    return dev.join(mad, on=group_cols).where(
        F.col("dev") > F.lit(threshold) * F.col("mad")
    )


def rolling_zscore_flags(
    df: DataFrame,
    value_col: str,
    series_cols: list[str],
    order_cols: list[str],
    window_rows: int,
    k_num: int = 3,
    k_den: int = 1,
    min_obs: int = 2,
) -> DataFrame:
    """Rolling z-score anomaly gate over INTEGER observations,
    DIVISION-FREE — the classic |x − μ| > k·σ test against the
    trailing ``window_rows`` observations (Bollinger-band style),
    evaluated entirely by integer cross-multiplication so it is
    hash-exact cross-engine with no float, sqrt, or division anywhere:

        |z| > k  ⇔  (x·n − s)² · k_den²  >  k_num² · (n·q − s²)

    with s = Σy, q = Σy² over the PRECEDING frame (current row
    EXCLUDED — the anomaly must not contaminate its own baseline) and
    k = k_num / k_den (rational thresholds like 2.5 stay exact).
    Constant windows (variance 0) flag any deviation — the inequality
    degenerates to dev² > 0, which is the right limit.

    Adds ``n_win`` / ``dev_n`` (x·n − s, the sign carries direction) /
    ``var_n`` (n·q − s²) and ``anomaly_up`` / ``anomaly_dn`` flags
    (NULL until ``min_obs`` trailing rows exist — emitted, not
    dropped, so callers see the warm-up region). One sort shuffle per
    series — the frame is ROWS-bounded, so the window state is
    ``window_rows`` values regardless of series length.

    NULL observations emit NULL flags, and their slot in the POSITIONAL
    trailing frame still displaces older rows (count/sums skip them, so
    n_win shrinks); pre-filter NULLs if the baseline should skip over
    them instead.

    int64 budget: (y·window_rows)² and k_num²·window_rows·Σy² must
    stay below 2⁶³ — at cents ≤ 10⁶, windows ≤ 10³, k ≤ 10 the
    headroom is >10³×.
    """
    from pyspark.sql.window import Window

    if window_rows < 1:
        raise ValueError(f"rolling_zscore_flags: window_rows must be >= 1")
    # The trailing-frame aggregates are evaluated as RUNNING prefix
    # aggregates differenced with lag: Spark re-aggregates a sliding
    # ROWS frame from scratch on every row (O(window_rows) per row in
    # SlidingWindowFunctionFrame), while an UNBOUNDED PRECEDING frame
    # and lag() are both O(1) per row. count/sum over rows
    # [i-W, i-1] equal prefix[i-1] - prefix[i-W-1] exactly (integer
    # sums; count skips NULL observations on both formulations, and
    # the empty/all-NULL frame's pinned 0 falls out of the 0-default
    # lags), so the emitted values are bit-identical. All frames share
    # one (series, order) sort shuffle, same as before.
    W = int(window_rows)
    w_run = (
        Window.partitionBy(*series_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ord = Window.partitionBy(*series_cols).orderBy(*order_cols)
    y = F.col(value_col).cast("long")

    def trailing(prefix_col: str) -> F.Column:
        return F.lag(prefix_col, 1, 0).over(w_ord) - F.lag(
            prefix_col, W + 1, 0
        ).over(w_ord)

    out = (
        df.withColumn("_pc", F.count(y).over(w_run))
        # empty prefixes sum to NULL; pin them to 0 so the warm-up rows
        # carry well-defined (0, 0) evidence columns
        .withColumn("_ps", F.coalesce(F.sum(y).over(w_run), F.lit(0)))
        .withColumn("_pq", F.coalesce(F.sum(y * y).over(w_run), F.lit(0)))
        .withColumn("n_win", trailing("_pc"))
        .withColumn("_s", trailing("_ps"))
        .withColumn("_q", trailing("_pq"))
        .drop("_pc", "_ps", "_pq")
    )
    dev_n = y * F.col("n_win") - F.col("_s")
    var_n = F.col("n_win") * F.col("_q") - F.col("_s") * F.col("_s")
    exceeded = (dev_n * dev_n) * F.lit(int(k_den) ** 2) > F.lit(
        int(k_num) ** 2
    ) * var_n
    ready = F.col("n_win") >= int(min_obs)
    return (
        out.withColumn("dev_n", dev_n)
        .withColumn("var_n", var_n)
        .withColumn(
            "anomaly_up",
            F.when(ready, exceeded & (dev_n > 0)).otherwise(F.lit(None)),
        )
        .withColumn(
            "anomaly_dn",
            F.when(ready, exceeded & (dev_n < 0)).otherwise(F.lit(None)),
        )
        .drop("_s", "_q")
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Pearson chi-square independence evidence between two categorical
    columns — the feature-association / stratification-drift gate —
    computed EXACTLY in wide-integer space (no float in the statistic):

        contrib = (O·N − R·C)² · scale  ÷  (N·R·C)

    per cell, where O is the observed count, R/C the marginals, N the
    total; Σ contribs / scale is the χ² statistic (the algebraic
    identity (O − E)²/E = (O·N − R·C)²/(N·R·C) with E = R·C/N keeps
    everything integral). Products run in DECIMAL(38,0) and the final
    division is Spark `DIV` ≡ DuckDB HUGEINT `//` — the identical
    128-bit-integer idiom the HITS operator proved bit-equal — so every
    cell's micro-χ² is hash-exact. Numerator and denominator are
    positive, so floor ≡ truncate and rounding is one-sided (≤ scale⁻¹
    per cell).

    Shape: ONE partial-agg shuffle builds the contingency cells; the
    marginals are window sums over the CELL frame (|A|·|B| rows, never
    the raw table). Digit budget: (O·N)²·scale must fit 38 digits —
    N ≤ ~10⁷ at scale 10⁶ (drop ``scale`` or pre-aggregate beyond;
    the raw counts themselves stay exact at any N).

    Returns one row per observed cell: (col_a, col_b, observed,
    row_tot, col_tot, n_total, chi2_contrib_micro). NULL categories
    participate as their own level only if present — filter upstream
    if NULL should be excluded. Degrees of freedom = (|A|−1)(|B|−1)
    for the caller's critical-value lookup.
    """
    from pyspark.sql.window import Window

    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("observed"))
    w_a = Window.partitionBy(col_a)
    w_b = Window.partitionBy(col_b)
    w_all = Window.partitionBy()
    m = (
        cells.withColumn("row_tot", F.sum("observed").over(w_a))
        .withColumn("col_tot", F.sum("observed").over(w_b))
        .withColumn("n_total", F.sum("observed").over(w_all))
    )
    contrib = F.expr(
        "CAST(((CAST(observed AS DECIMAL(38,0)) * n_total"
        "  - CAST(row_tot AS DECIMAL(38,0)) * col_tot)"
        " * (CAST(observed AS DECIMAL(38,0)) * n_total"
        "  - CAST(row_tot AS DECIMAL(38,0)) * col_tot)"
        f" * {int(scale)})"
        " DIV (CAST(n_total AS DECIMAL(38,0)) * row_tot * col_tot)"
        " AS BIGINT)"
    )
    return m.select(
        col_a,
        col_b,
        "observed",
        "row_tot",
        "col_tot",
        "n_total",
        contrib.alias("chi2_contrib_micro"),
    )


BENFORD_MICRO = {
    d: m
    for d, m in zip(
        range(1, 10),
        (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757),
    )
}  # round(log10(1 + 1/d) * 1e6); sums to exactly 1_000_000


def goodness_of_fit(
    df: DataFrame,
    category_col: str,
    expected_micro: dict,
) -> DataFrame:
    """Chi-square goodness-of-fit of a categorical column against FIXED
    expected probabilities — the Benford's-law fraud gate, schema-drift
    checks against a contract distribution, loaded-die tests — computed
    exactly in 128-bit integer space (the chi2_independence sibling;
    that one tests two columns against each other, this one tests one
    column against a known law):

        contrib_micro = (O·10⁶ − n·p_micro)² ÷ (n · p_micro)

    (the exact (O−E)²/E with E = n·p_micro/10⁶, multiplied through by
    10⁶ twice — once to clear E's denominator, once for the micro
    output unit — and floor-divided once at the end)

    per expected category, where ``expected_micro`` maps category →
    integer micro-probability (must sum to exactly 1e6 — validated
    loudly; BENFORD_MICRO is the canonical instance). Σ contribs / 10⁶
    is the χ² statistic against df = |categories| − 1. Expected
    categories with zero observations still contribute (n·p — the
    grid join keeps them); OBSERVED categories outside the expected
    support emit a row with NULL contrib (p = 0 means χ² is undefined
    there — surfacing them is the point, silently dropping them would
    hide exactly the fraud the gate looks for).

    Shape: one category partial agg over the scan, then every fold
    runs over the |categories|-row frame. DECIMAL(38) products ÷ via
    the proven DIV ≡ HUGEINT // idiom; digit budget (O·10⁶)² ≤
    10³⁸ → n ≤ ~10¹³ (comfortably past any audit table).
    """
    if sum(expected_micro.values()) != 1_000_000:
        raise ValueError(
            "goodness_of_fit: expected_micro must sum to exactly 1_000_000, "
            f"got {sum(expected_micro.values())}"
        )
    spark = df.sparkSession
    obs = df.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("observed")
    )
    grid = spark.createDataFrame(
        [(k, v) for k, v in expected_micro.items()],
        ["category", "p_micro"],
    )
    m = grid.join(obs, on="category", how="full_outer").withColumn(
        "observed", F.coalesce("observed", F.lit(0))
    )
    tot = m.agg(F.sum("observed").cast("long").alias("n_total"))
    m = m.crossJoin(F.broadcast(tot))
    contrib = F.expr(
        "CAST(((CAST(observed AS DECIMAL(38,0)) * 1000000"
        "  - CAST(n_total AS DECIMAL(38,0)) * p_micro)"
        " * (CAST(observed AS DECIMAL(38,0)) * 1000000"
        "  - CAST(n_total AS DECIMAL(38,0)) * p_micro))"
        " DIV (CAST(n_total AS DECIMAL(38,0)) * p_micro)"
        " AS BIGINT)"
    )
    return m.select(
        "category",
        "observed",
        "p_micro",
        "n_total",
        # n_total = 0 (empty table): chi-square is undefined, not a
        # DIVIDE_BY_ZERO crash -- every contrib is NULL, the same
        # "undefined is surfaced, not fabricated" rule as p_micro NULL
        F.when(
            F.col("p_micro").isNotNull() & (F.col("n_total") > 0), contrib
        ).alias("chi2_contrib_micro"),
    )


def rapid_repeats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    within: int,
) -> DataFrame:
    """Rapid-repeat detector — the double-charge / double-fire gate:
    rows whose EXACT key (user + amount, device + payload hash, …)
    reoccurred within ``within`` time units of the previous occurrence.
    Exact duplicates at different times are legitimate (the same user
    genuinely buys the same thing twice a month apart); the fraud /
    ingest-glitch signal is the SAME key twice in seconds, which plain
    dedup misses (different event ids) and plain windows miss (the key
    is composite).

    One sort shuffle on the key composite: ``lag`` over
    (key, (ts, id)) gives each occurrence its predecessor; the row
    flags when ``ts − prev_ts <= within`` (0 ≤ gap — equal timestamps
    flag too, tie-broken deterministically by id). Emits ALL rows with
    ``prev_id`` / ``gap`` evidence and the ``is_rapid_repeat`` flag —
    filter downstream; the FIRST occurrence never flags (NULL gap).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    ts = F.col(ts_col).cast("long")
    out = (
        df.withColumn("prev_id", F.lag(id_col).over(w))
        .withColumn("gap", ts - F.lag(ts).over(w))
    )
    return out.withColumn(
        "is_rapid_repeat",
        F.when(F.col("gap").isNotNull(), F.col("gap") <= int(within)),
    )
