"""Integer-exact PageRank (operators/pagerank.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oasisdb_spark.operators.pagerank import pagerank_integer

SCALE = 10**12


def _py_pagerank(edges, iters=5, scale=SCALE, d_num=85, d_den=100):
    """Straight reimplementation of the documented integer recurrence."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    base = ((d_den - d_num) * (scale // n)) // d_den
    for _ in range(iters):
        in_v = {v: 0 for v in nodes}
        for s, d in e:
            in_v[d] += r[s] // outdeg[s]
        dangling = sum(r[v] for v in nodes if v not in outdeg)
        dang_share = dangling // n
        r = {v: base + (d_num * (in_v[v] + dang_share)) // d_den for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, schema="src STRING, dst STRING")
    return {
        r["node"]: r["rank_scaled"]
        for r in pagerank_integer(df, **kw).collect()
    }


def test_matches_python_reference_with_dangling(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
        ("c", "d"),  # d is dangling (no out-edges)
        ("e", "a"),  # e has no in-edges
    ]
    assert _run(spark, edges, iters=5) == _py_pagerank(edges, iters=5)


def test_duplicate_edges_count_once(spark):
    edges = [("a", "b"), ("a", "b"), ("b", "a")]
    assert _run(spark, edges) == _py_pagerank([("a", "b"), ("b", "a")])


def test_symmetric_cycle_is_uniform(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _run(spark, edges, iters=4)
    assert len(set(got.values())) == 1


def test_mass_approximately_conserved(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    edges = cs.unionByName(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank_integer(edges, iters=3)
    total = pr.agg(F.sum("rank_scaled")).first()[0]
    n = pr.count()
    e_cnt = edges.distinct().count()
    # floor leakage bound: <= (N + E + 2) units per pass
    assert SCALE - total <= 3 * (n + e_cnt + 2)
    assert total <= SCALE


def test_partitioning_invariance(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(200)]
    df1 = spark.createDataFrame(edges, schema="src STRING, dst STRING").repartition(1)
    df7 = spark.createDataFrame(edges, schema="src STRING, dst STRING").repartition(7)
    a = sorted(map(tuple, pagerank_integer(df1, iters=3).collect()))
    b = sorted(map(tuple, pagerank_integer(df7, iters=3).collect()))
    assert a == b


def test_bad_params_raise(spark):
    df = spark.createDataFrame([("a", "b")], schema="src STRING, dst STRING")
    with pytest.raises(ValueError):
        pagerank_integer(df, iters=0)
    with pytest.raises(ValueError):
        pagerank_integer(df, d_num=0)


def _py_hits(edges, iters=3, scale=SCALE):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    h = {v: scale // n for v in nodes}

    def renorm(raw):
        s = sum(raw.values())
        if s <= 0:
            return {v: 0 for v in nodes}
        return {v: (raw[v] * scale) // s for v in nodes}

    a = {}
    for _ in range(iters):
        araw = {v: 0 for v in nodes}
        for s_, d in e:
            araw[d] += h[s_]
        a = renorm(araw)
        hraw = {v: 0 for v in nodes}
        for s_, d in e:
            hraw[s_] += a[d]
        h = renorm(hraw)
    return a, h


def test_hits_matches_python_reference(spark):
    from oasisdb_spark.operators.hits import hits_integer
    from oasisdb_spark.operators.pagerank import build_graph

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "e"),
    ]
    df = spark.createDataFrame(edges, schema="src STRING, dst STRING")
    g = build_graph(df)
    got = {
        r["node"]: (r["authority_scaled"], r["hub_scaled"])
        for r in hits_integer(g, iters=3).collect()
    }
    a, h = _py_hits(edges, iters=3)
    assert got == {v: (a[v], h[v]) for v in a}


def test_hits_bipartite_split(spark, sf_dir):
    """On the directed customer->supplier graph, suppliers are pure
    authorities and customers pure hubs; each side L1-sums to ~SCALE."""
    from oasisdb_spark.operators.hits import hits_integer
    from oasisdb_spark.operators.pagerank import build_graph

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    g = build_graph(
        orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    out = hits_integer(g, iters=2).collect()
    for r in out:
        if r["node"].startswith("s"):
            assert r["hub_scaled"] == 0
        else:
            assert r["authority_scaled"] == 0
    n = len(out)
    assert SCALE - sum(r["authority_scaled"] for r in out) <= 2 * n
    assert SCALE - sum(r["hub_scaled"] for r in out) <= 2 * n


def test_hits_partitioning_invariance(spark):
    from oasisdb_spark.operators.hits import hits_integer
    from oasisdb_spark.operators.pagerank import build_graph

    edges = [(f"n{i}", f"n{(i * 11 + 5) % 30}") for i in range(150)]
    a = sorted(map(tuple, hits_integer(build_graph(
        spark.createDataFrame(edges, "src STRING, dst STRING").repartition(1)), 2).collect()))
    b = sorted(map(tuple, hits_integer(build_graph(
        spark.createDataFrame(edges, "src STRING, dst STRING").repartition(7)), 2).collect()))
    assert a == b


def test_hits_bad_params(spark):
    from oasisdb_spark.operators.hits import hits_integer
    from oasisdb_spark.operators.pagerank import build_graph

    g = build_graph(spark.createDataFrame([("a", "b")], "src STRING, dst STRING"))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hits_integer(g, iters=0)


def test_build_graph_excludes_null_endpoint_edges(spark):
    # a NULL endpoint inflated N and was classified dangling, yet never
    # matched the rank join -- its mass silently vanished every pass
    from oasisdb_spark.operators.pagerank import build_graph, pagerank_iterate

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (None, 1), (2, None)], "src INT, dst INT"
    )
    g = build_graph(edges)
    assert g.n == 2 and not g.has_dangling
    clean = build_graph(spark.createDataFrame([(1, 2), (2, 1)], "src INT, dst INT"))
    r1 = {r["node"]: r["rank_scaled"] for r in pagerank_iterate(g, iters=2).collect()}
    r2 = {r["node"]: r["rank_scaled"] for r in pagerank_iterate(clean, iters=2).collect()}
    assert r1 == r2
    g.unpersist(); clean.unpersist()


def test_pagerank_empty_graph_raises(spark):
    import pytest

    from oasisdb_spark.operators.pagerank import build_graph, pagerank_iterate

    g = build_graph(spark.createDataFrame([], "src INT, dst INT"))
    with pytest.raises(ValueError, match="empty graph"):
        pagerank_iterate(g)
    g.unpersist()
