"""Market-basket pair mining: co-occurrence support counts.

The 2-itemset core of association-rule mining (Agrawal & Srikant,
VLDB'94) re-expressed Spark-first: which item pairs appear together in
the same basket, in how many baskets, and against what per-item
baseline. Downstream (confidence, lift, recommendations) is plain
arithmetic over the returned integer supports — kept out of the
operator so every emitted column is an exact count.

Plan shape, and why it scales:

- baskets dedup first (``(basket, item)`` DISTINCT — one partial-agg
  shuffle): pair generation must count baskets, not rows, and the
  dedup also collapses the multiplicity blow-up BEFORE the join.
- pair generation is a SELF-EQUI-JOIN on the basket key with
  ``item_a < item_b`` — co-located by the basket-key shuffle, never
  all-pairs across baskets. Per-basket cost is C(n_items, 2); the
  ``max_basket_items`` guard drops pathological mega-baskets (the one
  crawler session touching every SKU) with an exact group-size
  pre-filter, the same hot-key capping discipline as
  ``winnow_overlap_pairs``'s max_df. At TPC-H-like basket sizes
  (<= 7 lines/order) the fanout is a constant factor.
- supports: one groupBy on the pair key (map-side combine), then two
  equi-joins against the per-item basket counts — an item-cardinality
  table, re-partitioned by item key, broadcastable when the catalog is
  small.

Everything is integer counts — engine-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["copurchase_edges", "copurchase_pairs", "association_rules"]


def _basket_items(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_items: int | None,
) -> DataFrame:
    # NULL baskets/items can never form a pair (the basket equi-join
    # and the item_a < item_b filter both drop NULLs) -- but left in,
    # they still inflate item supports, basket sizes, and nothing else,
    # so confidence/lift denominators drift out of agreement with
    # n_baskets (support could exceed it). Exclude them up front so
    # every emitted count is over the same basket universe.
    items = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).where(
        F.col("_basket").isNotNull() & F.col("_item").isNotNull()
    ).distinct()
    if max_basket_items is not None:
        sizes = items.groupBy("_basket").agg(
            F.count(F.lit(1)).alias("_sz")
        )
        items = items.join(
            sizes.where(F.col("_sz") <= max_basket_items).select("_basket"),
            on="_basket",
        )
    return items


def copurchase_edges(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """The support-filtered co-occurrence GRAPH alone: (item_a, item_b,
    pair_support) with ``item_a < item_b`` — the cheap core that
    ``copurchase_pairs`` decorates with per-item supports, and the edge
    builder graph ops (triangle counting, co-purchase communities)
    compose on without dragging the support joins into their plans."""
    if min_support < 1:
        raise ValueError(
            f"copurchase_edges: min_support must be >= 1, got {min_support}"
        )
    items = _basket_items(df, basket_col, item_col, max_basket_items)
    a = items.select(F.col("_basket"), F.col("_item").alias("item_a"))
    b = items.select(F.col("_basket"), F.col("_item").alias("item_b"))
    return (
        a.join(b, on="_basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .where(F.col("pair_support") >= min_support)
    )


def copurchase_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Pairs of distinct items sharing a basket, with exact support
    counts: (item_a, item_b, pair_support, support_a, support_b,
    n_baskets) for every pair co-occurring in >= ``min_support``
    baskets, ``item_a < item_b``. ``n_baskets`` (the lift denominator)
    is the total basket count, constant across rows.

    ``max_basket_items`` drops baskets with more distinct items than
    the cap before pair generation (exact size pre-filter, one extra
    count over the same basket-key partitioning)."""
    items = _basket_items(df, basket_col, item_col, max_basket_items)
    item_support = items.groupBy("_item").agg(
        F.count(F.lit(1)).alias("_support")
    )
    # scalar as a 1-row broadcast, not a driver action — the operator
    # stays fully lazy/composable
    n_baskets = items.agg(
        F.count_distinct(F.col("_basket")).cast("long").alias("n_baskets")
    )
    pairs = copurchase_edges(
        df, basket_col, item_col, min_support, max_basket_items
    )
    return (
        pairs.join(
            item_support.select(
                F.col("_item").alias("item_a"), F.col("_support").alias("support_a")
            ),
            on="item_a",
        )
        .join(
            item_support.select(
                F.col("_item").alias("item_b"), F.col("_support").alias("support_b")
            ),
            on="item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            "n_baskets",
        )
    )


def association_rules(
    pairs: DataFrame,
    min_confidence_pct: int = 0,
) -> DataFrame:
    """Directed association rules from ``copurchase_pairs`` output —
    the Agrawal-Srikant confidence/lift step, kept EXACT: confidence
    and lift are emitted as integer numerator/denominator pairs
    (confidence(A→B) = pair_support/support_A; lift = pair_support ·
    n_baskets / (support_A · support_B) — floats would divide
    differently across engines and cannot express the thresholds
    exactly). Each undirected pair fans out to its two directed rules
    via one explode — no join, no second pass over baskets;
    ``min_confidence_pct`` (integer percent) prunes by
    cross-multiplication, never division.

    Returns (antecedent, consequent, pair_support, conf_num, conf_den,
    lift_num, lift_den) — lift shares its numerator across the two
    directions (lift is symmetric); confidence does not.

    int64 budget: ``support_a·support_b`` and ``pair_support·n_baskets``
    must fit (safe while every count stays below ~3·10⁹ — far past any
    single-catalog item support); past that the cast fails LOUDLY under
    ANSI rather than wrapping, and the caller widens to DECIMAL(38,0)
    the way grouped_trend does.
    """
    if not 0 <= min_confidence_pct <= 100:
        raise ValueError(
            f"association_rules: min_confidence_pct in [0, 100], got {min_confidence_pct}"
        )
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("support_a").alias("conf_den"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("support_b").alias("conf_den"),
                ),
            )
        ).alias("r"),
        F.col("pair_support"),
        (F.col("pair_support") * F.col("n_baskets")).alias("lift_num"),
        (F.col("support_a") * F.col("support_b")).alias("lift_den"),
    )
    out = directed.select(
        F.col("r.antecedent").alias("antecedent"),
        F.col("r.consequent").alias("consequent"),
        "pair_support",
        F.col("pair_support").alias("conf_num"),
        F.col("r.conf_den").alias("conf_den"),
        "lift_num",
        "lift_den",
    )
    if min_confidence_pct:
        out = out.where(
            F.col("conf_num") * 100 >= F.lit(int(min_confidence_pct)) * F.col("conf_den")
        )
    return out
