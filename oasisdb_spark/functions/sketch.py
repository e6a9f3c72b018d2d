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

__all__ = ["kmv_hash", "kmv_distinct", "heavy_hitters"]

_TWO60 = float(1 << 60)


def kmv_hash(col: Column | str) -> Column:
    """Uniform (0,1) double from the top 60 bits of md5 — identical in
    any engine with md5(): DuckDB equivalent
    ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT / POW(2, 60)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long") / F.lit(_TWO60)


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
    """
    import math

    import pandas as pd

    n = df.count()
    thresh = max(1, math.ceil(phi * n))
    cap = max(1, math.ceil(2.0 / phi))
    src = df.select(F.col(value_col).alias("_v")).where(F.col("_v").isNotNull())

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
