"""triangle_counts (operators/triangles.py) — brute-force parity,
orientation independence, noise robustness, partitioning invariance."""

from itertools import combinations

from oasisdb_spark.operators.triangles import canonical_edges, triangle_counts


def _brute(edges):
    adj: dict = {}
    es = set()
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for a, b, c in combinations(sorted(adj), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_single_triangle(spark):
    assert _run(spark, [(1, 2), (2, 3), (1, 3)]) == {1: 1, 2: 1, 3: 1}


def test_square_without_diagonal_has_none(spark):
    assert _run(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == {}


def test_matches_brute_force_on_dense_graph(spark):
    # K5 plus a pendant and an isolated edge; every node of K5 is in
    # C(4,2)=6 triangles
    edges = [(a, b) for a, b in combinations(range(5), 2)]
    edges += [(4, 10), (20, 21)]
    out = _run(spark, edges)
    assert out == _brute(edges)
    assert out[0] == 6


def test_duplicates_self_loops_and_reversed_edges_collapse(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1}
    canon = canonical_edges(
        spark.createDataFrame(edges, "src LONG, dst LONG")
    ).collect()
    assert sorted((r["a"], r["b"]) for r in canon) == [(1, 2), (1, 3), (2, 3)]


def test_hub_graph_matches_brute(spark):
    # star hub (node 0) + a clique among some leaves: exercises the
    # degree-orientation path where the hub generates no wedges
    edges = [(0, i) for i in range(1, 12)]
    edges += [(a, b) for a, b in combinations(range(1, 5), 2)]
    out = _run(spark, edges)
    assert out == _brute(edges)


def test_partitioning_invariance(spark):
    edges = [(a, b) for a, b in combinations(range(6), 2) if (a + b) % 3]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    base = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    rep = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df.repartition(9)).collect()
    }
    assert base == rep == _brute(edges)
