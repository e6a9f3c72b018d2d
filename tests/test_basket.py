"""copurchase_pairs (operators/basket.py) — brute-force parity,
dedup-before-count, the mega-basket cap, and partitioning invariance."""

from itertools import combinations

import pytest

from oasisdb_spark.operators.basket import copurchase_pairs

BASKETS = {
    1: ["p", "q", "r"],
    2: ["p", "q"],
    3: ["q", "r", "s"],
    4: ["p", "q", "q", "p"],  # duplicates: must count the basket once
    5: ["s"],
}


def _brute(min_support, max_items=None):
    sets = {b: set(v) for b, v in BASKETS.items()}
    if max_items is not None:
        sets = {b: v for b, v in sets.items() if len(v) <= max_items}
    pair_sup: dict[tuple, int] = {}
    item_sup: dict[str, int] = {}
    for v in sets.values():
        for i in v:
            item_sup[i] = item_sup.get(i, 0) + 1
        for a, b in combinations(sorted(v), 2):
            pair_sup[(a, b)] = pair_sup.get((a, b), 0) + 1
    return {
        (a, b): (s, item_sup[a], item_sup[b], len(sets))
        for (a, b), s in pair_sup.items()
        if s >= min_support
    }


def _df(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    return spark.createDataFrame(rows, "basket LONG, item STRING")


def _run(df, **kw):
    return {
        (r["item_a"], r["item_b"]): (
            r["pair_support"], r["support_a"], r["support_b"], r["n_baskets"]
        )
        for r in copurchase_pairs(df, "basket", "item", **kw).collect()
    }


def test_matches_brute_force(spark):
    assert _run(_df(spark), min_support=1) == _brute(1)
    assert _run(_df(spark), min_support=2) == _brute(2)


def test_min_support_filters(spark):
    out = _run(_df(spark), min_support=3)
    assert out == _brute(3)
    assert all(v[0] >= 3 for v in out.values())
    # (p, q) co-occurs in baskets 1, 2, 4
    assert out[("p", "q")][0] == 3


def test_mega_basket_cap_drops_whole_basket(spark):
    # cap=2 removes the 3-item baskets (1, 3) from pair generation AND
    # from the item supports / basket total — exact pre-filter semantics
    assert _run(_df(spark), min_support=1, max_basket_items=2) == _brute(1, 2)


def test_partitioning_invariance(spark):
    df = _df(spark)
    base = _run(df, min_support=1)
    assert _run(df.repartition(13), min_support=1) == base
    assert _run(df.coalesce(1), min_support=1) == base


def test_min_support_validation(spark):
    with pytest.raises(ValueError):
        copurchase_pairs(_df(spark), "basket", "item", min_support=0)


# ------------------------------------------------------------ rules


def test_association_rules_rationals_and_threshold(spark):
    from fractions import Fraction

    from oasisdb_spark.operators.basket import association_rules, copurchase_pairs

    rows = [  # baskets: {1,2,3} x3, {1,2} x2, {2,3}, {1,4}
        (b, i)
        for b, items in enumerate(
            [[1, 2, 3]] * 3 + [[1, 2]] * 2 + [[2, 3]] + [[1, 4]]
        )
        for i in items
    ]
    df = spark.createDataFrame(rows, "b LONG, i LONG")
    pairs = copurchase_pairs(df, "b", "i", min_support=1)
    rules = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(pairs).collect()
    }
    # supports: s1=6, s2=6, s3=4, s4=1, n=7; pair(1,2)=5
    r12 = rules[(1, 2)]
    assert Fraction(r12["conf_num"], r12["conf_den"]) == Fraction(5, 6)
    assert Fraction(r12["lift_num"], r12["lift_den"]) == Fraction(5 * 7, 6 * 6)
    # direction matters for confidence, not lift
    r21 = rules[(2, 1)]
    assert Fraction(r21["conf_num"], r21["conf_den"]) == Fraction(5, 6)
    r23, r32 = rules[(2, 3)], rules[(3, 2)]
    assert Fraction(r23["conf_num"], r23["conf_den"]) == Fraction(4, 6)
    assert Fraction(r32["conf_num"], r32["conf_den"]) == Fraction(4, 4)
    assert (r23["lift_num"], r23["lift_den"]) == (r32["lift_num"], r32["lift_den"])
    # integer-percent threshold prunes by cross-multiplication
    strict = {
        (r["antecedent"], r["consequent"])
        for r in association_rules(pairs, min_confidence_pct=80).collect()
    }
    assert (3, 2) in strict and (1, 2) in strict  # 100% and 83.3%
    assert (2, 3) not in strict                   # 66.7%
    import pytest

    with pytest.raises(ValueError, match="min_confidence_pct"):
        association_rules(pairs, min_confidence_pct=101)


def test_null_baskets_and_items_excluded_from_all_counts(spark):
    # NULL basket/item rows never form pairs, but they used to inflate
    # item supports past n_baskets (confidence/lift denominators drift)
    from oasisdb_spark.operators.basket import copurchase_pairs

    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (None, "x"), (2, "x"), (2, None), (2, "y")],
        "b INT, i STRING",
    )
    row = copurchase_pairs(df, "b", "i", 1).collect()[0]
    assert (row["item_a"], row["item_b"]) == ("x", "y")
    assert row["pair_support"] == 2
    assert row["support_a"] == 2 and row["support_b"] == 2
    assert row["n_baskets"] == 2
