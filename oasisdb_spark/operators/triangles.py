"""Distributed triangle counting via degree-oriented wedge joins.

The MapReduce-classic algorithm (Suri & Vassilvitskii, WWW'11; Cohen
2009): orient every undirected edge from its lower-(degree, id)
endpoint to the higher one — a TOTAL order, so each triangle has
exactly ONE vertex with two outgoing oriented edges — then join the
wedges (u -> v, u -> w) generated at that vertex against the oriented
edge set to close them. Each triangle is found exactly once, no
dedup-by-3 needed.

Why orientation matters at 100 TB: wedge fanout is Σ_u C(out_deg(u), 2)
and degree orientation bounds out-degree by O(√m) on any graph —
a celebrity node with 10⁸ undirected neighbors generates ZERO wedges
(every edge points INTO it) instead of 10¹⁶. Both joins are
equi-joins: wedges co-locate on the apex u, closure co-locates on the
(v, w) pair key — never an all-pairs product.

Everything is integer counts — engine-exact; the oracle can count the
same triangles with the naive a<b<c three-way self-join because the
triangle SET is orientation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.ckpt import track

__all__ = ["canonical_edges", "triangle_counts"]


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge set in canonical form: (a, b) with a < b,
    self-loops dropped, duplicates (either direction) collapsed. One
    partial-agg shuffle."""
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    return (
        edges.where(F.col(src) != F.col(dst))
        .select(a.alias("a"), b.alias("b"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation over the undirected graph in
    ``edges``: (node, n_triangles) for every node in >= 1 triangle.

    Plan: canonicalize (one shuffle) -> degree agg (one shuffle) ->
    two degree joins to orient -> wedge self-equi-join on the apex ->
    closure equi-join on the (lo, hi) pair key -> explode each triangle
    row to its 3 corners (ONE array explode — not a 3-way unionAll,
    which would replicate the whole triangle subplan three times) ->
    one final count shuffle. All equi-joins; wedge fanout bounded by
    the √m orientation theorem.

    The canonical edge frame and the oriented frame are materialized
    with localCheckpoint: canon feeds the degree agg once and the
    oriented frame, and the oriented frame feeds THREE consumers (two
    wedge legs + the closure probe) — without the pin, every
    downstream reference would re-run the upstream edge-construction
    plan, fatal when the edges come from an expensive build like a
    basket self-join. localCheckpoint rather than persist because
    persist keeps the full logical lineage: with the oriented frame
    referenced three times the plan grew to 1,641 lines / 174
    Exchange nodes at sf0.1 and the optimizer replanned the whole
    edge build per reference (the guide's plan-truncation advice);
    checkpointing collapses each reference to an RDD scan. Blocks are
    edge-list-sized and non-replicated — executor loss reruns the
    batch job, the same trade as the pagerank/HITS passes.

    EAGER-EXECUTION CONTRACT (round-13 advisory): the two checkpoints
    run Spark jobs at DataFrame-CONSTRUCTION time — building the frame
    without ever acting on it still pays the edge canonicalization and
    orientation. Their blocks are tracked for release at the harness's
    next between-queries point (ckpt.track, guide §5)."""
    canon = track(canonical_edges(edges, src, dst).localCheckpoint(eager=True))
    deg = (
        canon.select(F.col("a").alias("n"))
        .unionAll(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient: lower (degree, id) endpoint -> higher; (d, n) is a total
    # order because node ids are unique
    e = (
        canon.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), on="a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), on="b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint(eager=True)
    )
    track(e)
    # wedges at the apex u: unordered neighbor pairs (v < w keeps each
    # wedge once; closure probes both orientations of the closing edge)
    w1 = e.select(F.col("u"), F.col("v").alias("x"))
    w2 = e.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, on="u").where(F.col("x") < F.col("y"))
    closing = e.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(closing, on=["x", "y"])
    corners = tri.select(
        F.explode(F.array(F.col("u"), F.col("x"), F.col("y"))).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
