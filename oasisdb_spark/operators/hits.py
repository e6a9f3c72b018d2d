"""Integer-exact HITS (Kleinberg 1999) — authority/hub scores over a
directed graph, the second member of the graph-algorithm family
(operators/pagerank.py has the build/iterate split and the engine
contract this follows).

Dialect: L1-normalized HITS with fixed iterations. Per pass t:

    araw_t(v) = sum of h_{t-1}(u) over in-edges u -> v   (exact int)
    a_t(v)    = (araw_t(v) * SCALE) // S_a               (L1 renorm)
    hraw_t(u) = sum of a_t(w) over out-edges u -> w
    h_t(u)    = (hraw_t(u) * SCALE) // S_h

where S_a / S_h are the exact integer sums of araw/hraw. The renorm
products exceed int64, so they evaluate in 128-bit integer space on
BOTH engines — Spark DECIMAL(38,0) `DIV`, DuckDB HUGEINT `//` —
verified bit-equal. The per-pass sums are exact wide-integer
aggregates (Spark DECIMAL(38,0) sum as a one-row broadcast frame in
the plan, DuckDB HUGEINT sum in a scalar subquery) — the driver never
collects them, so the full iteration runs as one composed job.
Classic HITS normalizes by L2; the L1 form keeps every step integer
and changes only the scale, not the ranking. Nodes without in-edges
get authority 0; without out-edges, hub 0.

Scale: per pass, two edge-vs-score equi-joins (the score side is
node-sized — broadcast when small) + two key-partial aggs + two scalar
sums. The per-pass raw-score frames are lazily localCheckpoint-ed
(each feeds two plan branches: the scalar-total agg and the renorm;
checkpoint blocks are node-sized and non-replicated — an executor
loss mid-job fails the query and the batch job reruns, the standard
iterative-batch trade). Precondition (loud, not silent): S_a and S_h must stay below
2^63 — sum(h) * max_outdeg bounds them; with SCALE 1e12 that holds to
~10^6 average degree. Raw sums are exact regardless (decimal/HUGEINT);
the guard is on the int64 downcast of scores, which renorm keeps at
<= SCALE by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oasisdb_spark.ckpt import track
from oasisdb_spark.operators.pagerank import GraphTopology

__all__ = ["hits_integer"]


def _renorm_lazy(df: DataFrame, raw_col: str, scale: int, out: str) -> DataFrame:
    """L1 renorm with the pass total as a BROADCAST SCALAR FRAME
    (OPTIMIZATION r12, guide §1.2 fewer passes): the exact decimal sum
    rides the plan as a one-row crossJoin instead of a per-pass
    collect, so the whole iteration composes into one job — no
    blocking driver barrier per side per pass. Bit-equal to the
    collected-int form: same DECIMAL(38,0) sum, same 128-bit DIV; a
    NULL/<=0 total (degenerate graph: no edges contributed) yields
    all-zero scores exactly like the old early-return."""
    tot = df.agg(F.sum(F.col(raw_col).cast("decimal(38,0)")).alias("_tot"))
    return df.crossJoin(F.broadcast(tot)).select(
        "node",
        F.when(
            F.coalesce(F.col("_tot"), F.lit(0).cast("decimal(38,0)")) <= 0,
            F.lit(0).cast("long"),
        )
        .otherwise(
            F.expr(
                f"CAST((CAST({raw_col} AS DECIMAL(38,0)) * {scale}) DIV _tot AS BIGINT)"
            )
        )
        .alias(out),
    )


def hits_integer(
    g: GraphTopology, iters: int = 3, scale: int = 10**12
) -> DataFrame:
    """(node, authority_scaled, hub_scaled) after ``iters`` exact
    integer passes over a built topology (operators/pagerank.py
    build_graph). Hubs initialize uniform at SCALE // N."""
    if iters < 1:
        raise ValueError(f"hits_integer: iters must be >= 1, got {iters}")
    if g.n < 1:
        raise ValueError("hits_integer: empty graph (no nodes)")
    n = g.n
    h = g.nodes.withColumn("h", F.lit(scale // n).cast("long"))
    a = None
    for _ in range(iters):
        araw = (
            g.e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("araw"))
        )
        # LAZY localCheckpoint: the raw frame feeds TWO plan branches
        # (the renorm numerator and its scalar-total crossJoin side) —
        # the checkpoint computes ONCE inside the final job and cuts
        # lineage, so the branch duplication stays node-sized instead
        # of doubling the whole upstream subtree per pass. NOT a
        # .persist(): InMemoryRelation plans bypass AQE (measured 8x
        # slower in the r11 form). With the renorm total now a
        # broadcast scalar frame (_renorm_lazy) the 3-pass loop runs
        # as ONE composed job — no per-pass collect/count barriers;
        # measured 8.8 s -> 6.6 s on trade_hits at sf0.1, output
        # bit-identical (exceptAll both ways).
        araw_all = g.nodes.join(araw, "node", "left").select(
            "node", F.coalesce("araw", F.lit(0)).cast("long").alias("araw")
        ).localCheckpoint(eager=False)
        track(araw_all)  # released by the harness between queries
        a = _renorm_lazy(araw_all, "araw", scale, "authority_scaled")
        hraw = (
            g.e.join(
                a.withColumnRenamed("node", "dst").withColumnRenamed(
                    "authority_scaled", "av"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("av").alias("hraw"))
        )
        hraw_all = g.nodes.join(hraw, "node", "left").select(
            "node", F.coalesce("hraw", F.lit(0)).cast("long").alias("hraw")
        ).localCheckpoint(eager=False)  # same two-branch split as araw_all
        track(hraw_all)
        h = _renorm_lazy(hraw_all, "hraw", scale, "h")
    return a.join(
        h.withColumnRenamed("h", "hub_scaled"), "node"
    ).select("node", "authority_scaled", "hub_scaled")
