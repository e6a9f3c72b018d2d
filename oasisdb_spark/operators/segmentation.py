"""Customer segmentation: RFM scoring.

The classic direct-marketing segmentation (Hughes, "Strategic Database
Marketing", 1994; the default customer-value lens in every CRM/CDP):
score each customer 1–5 on Recency (days since last purchase, lower is
better), Frequency (purchase count), and Monetary (total spend), by
quintile rank within the population, and concatenate into the familiar
"543"-style segment code.

Determinism is the whole design problem: quintiles over tied metrics
are where naive implementations diverge between engines/runs. Here
``ntile(5)`` runs over the (metric, customer key) TOTAL order — the
key tie-break pins every boundary — and both R ordering (ascending
days = best first) and F/M orderings (descending value = best first,
i.e. score 1 = best quintile... inverted to the conventional
5-is-best by ``6 − ntile``) are explicit in the code and mirrored in
the oracle.

Shape: one partial-agg shuffle on the customer key builds the three
metrics from the orders scan; the three ntile windows all run over the
same customer-cardinality frame (rows = customers, not orders) and
each needs a single-partition sort of that frame — fine for catalogs
of ≤ hundreds of millions of customers (the frame is 3 ints wide); a
population beyond that should bucket by pre-computed metric histograms
instead (the quantile-sketch operator provides the cut points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rfm_segments"]


def rfm_segments(
    orders: DataFrame,
    customer_col: str,
    ts_col: str,
    amount_col: str,
    as_of: str | None = None,
    n_tiles: int = 5,
) -> DataFrame:
    """Score every customer by RFM quintiles (``n_tiles`` configurable).

    ``ts_col`` must be a date/timestamp; ``amount_col`` an INTEGER
    amount (quantize to cents upstream — the monetary sum stays
    fold-order-free). ``as_of`` (ISO date string) anchors recency;
    default = the population's max order date (computed in-plan, no
    driver action). Returns one row per customer: the three raw
    metrics (recency_days, frequency, monetary) and r_score / f_score
    / m_score (``n_tiles`` = best) + the concatenated ``segment``.
    """
    key = F.col(customer_col)
    per_cust = orders.groupBy(customer_col).agg(
        F.max(F.to_date(F.col(ts_col))).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("long")).alias("monetary"),
    )
    if as_of is None:
        anchor = per_cust.agg(F.max("_last").alias("_as_of"))
        per_cust = per_cust.crossJoin(F.broadcast(anchor))
    else:
        per_cust = per_cust.withColumn("_as_of", F.lit(as_of).cast("date"))
    per_cust = per_cust.withColumn(
        "recency_days", F.datediff(F.col("_as_of"), F.col("_last"))
    )
    # score n_tiles = best: recency ranks ascending (fewest days first),
    # frequency/monetary descending (largest first); the customer key
    # tie-break makes every quintile boundary deterministic
    # asc_nulls_last / desc_nulls_last: Spark's default asc sorts NULLs
    # FIRST, which would hand a customer with no parseable order dates
    # (recency NULL) the BEST recency quintile; missing metrics rank
    # worst on every axis instead
    w_r = Window.orderBy(F.col("recency_days").asc_nulls_last(), key.asc())
    w_f = Window.orderBy(F.col("frequency").desc_nulls_last(), key.asc())
    w_m = Window.orderBy(F.col("monetary").desc_nulls_last(), key.asc())
    n = int(n_tiles)
    scored = (
        per_cust.withColumn("r_score", (n + 1) - F.ntile(n).over(w_r))
        .withColumn("f_score", (n + 1) - F.ntile(n).over(w_f))
        .withColumn("m_score", (n + 1) - F.ntile(n).over(w_m))
    )
    return scored.select(
        customer_col,
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )
