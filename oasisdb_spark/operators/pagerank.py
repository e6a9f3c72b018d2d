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

Scale: per iteration, one src-keyed broadcast/shuffle join of edges
against the rank vector + one dst-keyed partial agg — the standard
distributed PageRank plan; the dangling mass is ONE scalar aggregate
per pass (bounded driver state, like the k-means partial fold). Rank
frames are persisted per pass to truncate lineage. N is computed once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_integer"]


def pagerank_integer(
    edges: DataFrame,
    iters: int = 5,
    scale: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank_scaled) after ``iters`` exact integer passes over
    the DISTINCT edge set. Nodes are every distinct src or dst;
    self-loops and duplicate edges count once (distinct is applied)."""
    if iters < 1:
        raise ValueError(f"pagerank_integer: iters must be >= 1, got {iters}")
    if not (0 < d_num <= d_den):
        raise ValueError(f"pagerank_integer: bad damping {d_num}/{d_den}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the edge topology is static: join degrees into the edge list ONCE
    ed = e.join(outdeg, "src").persist()
    # the dangling SET is static too (only its mass changes per pass);
    # when it's empty — e.g. any symmetrized graph — skip the per-pass
    # mass scalar entirely
    dangling_nodes = nodes.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0
    r = nodes.withColumn("rank_scaled", F.lit(scale // n).cast("long")).persist()
    base = ((d_den - d_num) * (scale // n)) // d_den
    for _ in range(iters):
        contribs = ed.join(r.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"),
            F.expr("rank_scaled div deg").alias("c"),
        )
        in_sum = contribs.groupBy("node").agg(F.sum("c").alias("in_v"))
        dangling = (
            (
                dangling_nodes.join(r, "node")
                .agg(F.sum("rank_scaled"))
                .first()[0]
                or 0
            )
            if has_dangling
            else 0
        )
        dang_share = int(dangling) // n
        nxt = (
            nodes.join(in_sum, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({d_num} * (coalesce(in_v, CAST(0 AS BIGINT)) "
                        f"+ CAST({dang_share} AS BIGINT))) div {d_den}"
                    )
                ).cast("long").alias("rank_scaled"),
            )
            .persist()
        )
        nxt.count()
        r.unpersist()
        r = nxt
    # the final rank frame is materialized, so the topology caches can
    # unpin (a bench/session running the operator repeatedly would
    # otherwise accumulate them)
    for df_ in (ed, dangling_nodes, nodes, e):
        df_.unpersist()
    return r
