"""Kaplan–Meier survival estimation (time-to-event with censoring).

The product-analytics "how long until they convert" curve done right:
users who never converted are CENSORED observations (they survived at
least as long as we watched them), not dropped rows — dropping them
biases conversion-time estimates toward the fast converters (the
classic survival-analysis mistake). Kaplan & Meier (JASA 1958):

    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)

over distinct event times tᵢ, with dᵢ events at tᵢ and nᵢ subjects
still at risk (duration ≥ tᵢ).

Engine-exactness: the product of rationals blows up any fixed-width
integer after a few dozen steps, so the curve is carried in QUANTIZED
LOG space — the repo's micro-nat ``lmic`` dialect shared with the LM
and PSI families::

    log S(tᵢ) ≈ Σ_{j ≤ i} (lmic(nⱼ − dⱼ) − lmic(nⱼ))   [micro-nats, ≤ 0]

Every term is the quantized log of an INTEGER count, identical
cross-engine by construction; the per-step integer evidence
(n_risk, d, c) is exact outright.

Shape: one partial agg collapses subjects to the distinct-duration
frame (two conditional counts per duration); the at-risk ladder and
the cumulative log-survival are windows over THAT frame — a 10¹²-row
cohort with 10⁵ distinct durations costs a 10⁵-row window. Nothing
else moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["kaplan_meier"]


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan–Meier curve over (integer duration, 0/1 event flag) rows
    — event 1 = the event happened at ``duration``, 0 = censored at
    ``duration`` (still event-free when observation stopped).

    ``group_cols`` computes an independent curve per group (cohort /
    variant / segment — the A/B-test form) with every window
    partitioned by the group key, so the duration frames never share a
    sort. Returns one row per (group,) DISTINCT EVENT time: (t, n_risk,
    d, c, surv_log_micro) where c counts subjects censored exactly at t
    (standard convention: censored-at-t subjects ARE at risk at t) and
    ``surv_log_micro`` is the cumulative micro-nat log of S(t) —
    ``exp(x/1e6)`` at display time, monotone non-increasing, exact-
    integer evidence columns alongside. Censoring-only times carry no
    survival step and are folded into the ladder, not emitted. Rows
    with NULL duration or NULL event flag are dropped (undefined
    observations — standard KM convention).
    """
    g = list(group_cols or [])
    # NULL durations / event flags are undefined observations, not a
    # duration: without this filter a t=NULL ladder row sorts FIRST in
    # the ascending cumulative window (Spark asc = nulls first) and
    # silently shifts every subsequent log-survival step
    df = df.where(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    )
    per_t = df.groupBy(*g, F.col(duration_col).cast("long").alias("t")).agg(
        F.sum(F.when(F.col(event_col) == 1, 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col(event_col) == 0, 1).otherwise(0)).alias("c"),
    )
    w_ge = (
        Window.partitionBy(*g)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # subjects at risk at t = all with duration >= t (censored at t incl.)
    at_risk = per_t.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_ge))
    from oasisdb_spark.pipeline.lm import lmic

    ev = at_risk.where(F.col("d") > 0)
    w_cum = (
        Window.partitionBy(*g)
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # terminal step: if everyone still at risk events at t (n == d),
    # S(t) is EXACTLY zero and its log is -inf — that row (necessarily
    # the maximum event time) emits NULL surv_log_micro, the documented
    # encoding of S = 0; guarding the step also keeps ln(0) out of both
    # engines
    step = F.when(
        F.col("n_risk") > F.col("d"),
        lmic(F.col("n_risk") - F.col("d")) - lmic(F.col("n_risk")),
    )
    cum = F.sum(step).over(w_cum)
    return ev.select(
        *g,
        "t",
        "n_risk",
        "d",
        "c",
        F.when(F.col("n_risk") == F.col("d"), F.lit(None).cast("long"))
        .otherwise(cum)
        .alias("surv_log_micro"),
    )
