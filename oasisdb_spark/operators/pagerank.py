"""Integer-exact distributed PageRank (Page/Brin 1998) — the repo's
iterative graph-algorithm primitive, engine-auditable like the
quantized k-means fit (pipeline/cluster_curate.py) and the BPE trainer
(pipeline/bpe.py): every arithmetic step is integer with a defined
evaluation order, the iteration count is FIXED, and the DuckDB oracle
replays the whole computation as unrolled SQL, so the final rank
VECTOR hash-matches — not an approximation of it.

Arithmetic: total rank mass is SCALE (default 10^12) integer units.
With damping d = d_num/d_den (default 85/100):

    r0(v)        = SCALE // N
    contrib(u,e) = r(u) // outdeg(u)            (per out-edge, floor)
    in(v)        = sum of contribs over in-edges (exact int sum)
    dangling     = sum of r(u) over zero-outdeg u
    r'(v)        = ((d_den - d_num) * (SCALE // N)) // d_den
                   + (d_num * (in(v) + dangling // N)) // d_den

Every division is a floor of positive operands, so Spark's `div` and
DuckDB's `//` agree bit-for-bit; every sum is an integer fold
(associative — partition-order-free). Floors leak a few units of mass
per iteration (bounded by N + E + 2 per pass) — deterministic on both
engines, and irrelevant to ranking.

Build/iterate split (the index-build pattern): `build_graph` is the
one-time artifact — distinct edges, node set, degree-joined edge list,
static dangling set, all persisted — and `pagerank_iterate` runs the
passes over it. Per pass: one src-keyed join of the (cached) edge list
against the rank vector (node-sized — Spark broadcasts it when small)
+ one dst-keyed partial agg, plus ONE scalar dangling aggregate only
when the dangling set is non-empty (it is static; a symmetrized graph
skips it entirely). Rank frames are persisted per pass to truncate
lineage. `pagerank_integer` composes both and releases the topology
caches when done.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GraphTopology", "build_graph", "pagerank_iterate", "pagerank_integer"]


@dataclass
class GraphTopology:
    """Persisted static artifacts of one graph (see build_graph)."""

    e: DataFrame  # distinct (src, dst)
    nodes: DataFrame  # distinct node ids
    ed: DataFrame  # edges with out-degree joined in
    dangling_nodes: DataFrame  # nodes with no out-edges
    n: int
    has_dangling: bool

    def unpersist(self) -> None:
        for df_ in (self.ed, self.dangling_nodes, self.nodes, self.e):
            df_.unpersist()


def build_graph(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> GraphTopology:
    """Materialize the static graph artifacts (each persisted):
    duplicate edges and self-loop duplicates collapse via distinct.
    Edges with a NULL endpoint are EXCLUDED: a NULL is not a node --
    left in, it inflated N, classified as dangling, yet never matched
    the rank join (equi-joins drop NULL keys), so its mass silently
    vanished from every pass."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(outdeg, "src").persist()
    dangling_nodes = nodes.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0
    ed.count()
    return GraphTopology(e, nodes, ed, dangling_nodes, n, has_dangling)


def pagerank_iterate(
    g: GraphTopology,
    iters: int = 5,
    scale: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
) -> DataFrame:
    """(node, rank_scaled) after ``iters`` exact integer passes over a
    built topology."""
    if iters < 1:
        raise ValueError(f"pagerank_iterate: iters must be >= 1, got {iters}")
    if not (0 < d_num <= d_den):
        raise ValueError(f"pagerank_iterate: bad damping {d_num}/{d_den}")
    if g.n < 1:
        raise ValueError("pagerank_iterate: empty graph (no nodes)")
    n = g.n
    lazy = not g.has_dangling
    r = g.nodes.withColumn("rank_scaled", F.lit(scale // n).cast("long"))
    if not lazy:
        r = r.persist()
    base = ((d_den - d_num) * (scale // n)) // d_den
    for _ in range(iters):
        contribs = g.ed.join(r.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"),
            F.expr("rank_scaled div deg").alias("c"),
        )
        # a zero contribution per node folds the "nodes with no
        # in-edges" fill into the SAME aggregation: sum(0 + contribs)
        # = in_v exactly, and no-in-edge nodes emit 0 (what the former
        # nodes-left-join's coalesce produced) — one partial-agg
        # shuffle per pass instead of an agg plus a broadcast join
        # (OPTIMIZATION r12, guide §1.2/§2.4: 5 fewer broadcast-build
        # driver jobs across a 5-pass run).
        in_sum = (
            contribs.unionByName(
                g.nodes.select("node", F.lit(0).cast("long").alias("c"))
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_v"))
        )
        dangling = (
            (
                g.dangling_nodes.join(r, "node")
                .agg(F.sum("rank_scaled"))
                .first()[0]
                or 0
            )
            if g.has_dangling
            else 0
        )
        dang_share = int(dangling) // n
        nxt = in_sum.select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({d_num} * (coalesce(in_v, CAST(0 AS BIGINT)) "
                    f"+ CAST({dang_share} AS BIGINT))) div {d_den}"
                )
            ).cast("long").alias("rank_scaled"),
        )
        if lazy:
            # OPTIMIZATION r12 (guide §1.2: remove whole passes): with
            # no dangling mass there is NO value-dependent scalar per
            # pass, and each pass references the previous rank frame
            # exactly ONCE — so the whole iteration composes into a
            # single lazy plan executed as ONE AQE-planned job (every
            # per-pass join still broadcasts the node-sized rank side),
            # instead of iters blocking persist+count jobs. Measured
            # 7.0 s → 1.9 s on trade_pagerank at sf0.1, bit-identical
            # output (exceptAll-checked both ways + the unchanged
            # driver oracle). A dangling graph keeps the materializing
            # loop: its per-pass collect forces execution anyway.
            r = nxt
            continue
        nxt = nxt.persist()
        nxt.count()
        r.unpersist()
        r = nxt
    if not lazy:
        # the final pass's persisted rank frame must not outlive its
        # consumers (guide §5: unpersist when done; it leaked per call
        # before round 13) — released by the harness between queries
        from oasisdb_spark.ckpt import track_persist

        track_persist(r)
    return r


def pagerank_integer(
    edges: DataFrame,
    iters: int = 5,
    scale: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One-shot form: build the topology, iterate, release the
    topology caches (the materialized rank frame survives them)."""
    g = build_graph(edges, src_col=src_col, dst_col=dst_col)
    r = pagerank_iterate(g, iters=iters, scale=scale, d_num=d_num, d_den=d_den)
    if not g.has_dangling:
        # the lazy no-dangling chain hasn't materialized yet — pin it
        # before dropping the topology caches it still reads from;
        # released by the harness between queries (guide §5)
        from oasisdb_spark.ckpt import track_persist

        r = r.persist()
        r.count()
        track_persist(r)
    g.unpersist()
    return r
