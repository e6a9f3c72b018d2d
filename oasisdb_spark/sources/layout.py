"""Z-order (Morton-curve) data layout for multi-dimensional scan
pruning.

Parquet row-group min/max statistics prune scans only along the sort
order: a table sorted by ``a`` answers ``a BETWEEN`` scans with a few
row groups, but ``b BETWEEN`` scans read everything. Interleaving the
bits of several columns into one Morton key and range-partitioning +
sorting by it makes EVERY indexed dimension's min/max tight per row
group (each group covers a small hyper-rectangle of the key space), so
filters on any subset of the z-columns prune — the same layout trick
Delta/Iceberg ``OPTIMIZE ZORDER BY`` applies, built here from plain
Column expressions.

Write path (one stats pass + one range shuffle):
1. min/max per z-column (tiny driver-side aggregate),
2. normalize each column to a ``bits``-wide integer rank,
3. interleave bits (pure Column arithmetic, no UDF),
4. ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` → parquet.

Read path needs nothing special: Spark pushes the dimension predicates
to the parquet scan as always; the layout is what turns those pushed
filters into actual row-group skips. Results are layout-independent —
the oracle equality of any query over a z-ordered copy IS the
correctness check.

At 100 TB: the stats pass is a partial-agg scan; the range shuffle is
the one full data movement (identical cost to any compaction/OPTIMIZE
run) and `file_count` sizes output files independently of input
partitioning. Skewed dimensions degrade to the rank resolution of
``bits`` (2^bits cells per dimension) — raise ``bits`` or pre-bucket
extreme skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> Column:
    """Morton key Column over ``cols`` (numeric), ``bits`` of rank
    resolution per column (len(cols)*bits <= 63 total).

    Each column is min/max-normalized to [0, 2^bits) using one tiny
    aggregate (collected to the driver — 2 doubles per column), then
    bit-interleaved: output bit (i*ncols + j) is bit i of column j.
    Constant columns map to rank 0.
    """
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a long")
    # index-based aliases + exact-name refs (the profile_table rule:
    # dotted names must not re-parse, case-only pairs must not collide)
    def _ref(c: str) -> Column:
        return F.col("`" + c.replace("`", "``") + "`")

    # NaN-guarded range: Spark's min/max rank NaN GREATEST (a single
    # NaN would make hi=NaN -> span NaN -> every rank NaN); NaN rows
    # rank like NULLs instead (coalesce-to-0 below via try_cast)
    def _finite(c: str) -> Column:
        v = _ref(c).cast("double")
        return F.when(~F.isnan(v), v)

    stats = df.agg(
        *[F.min(_finite(c)).alias(f"min_{i}") for i, c in enumerate(cols)],
        *[F.max(_finite(c)).alias(f"max_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    n = len(cols)
    top = (1 << bits) - 1
    ranks = []
    for i, c in enumerate(cols):
        lo, hi = stats[f"min_{i}"], stats[f"max_{i}"]
        if lo is None or hi is None:
            # all-NULL column: no rank signal — constant 0, same as a
            # constant column (previously a bare TypeError on hi - lo)
            ranks.append(F.lit(0).cast("long"))
            continue
        span = (hi - lo) or 1.0
        r = F.least(
            F.lit(top),
            ((_ref(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top + 1)).try_cast("long"),
        )
        ranks.append(F.coalesce(r, F.lit(0)))
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            key = key + (F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    file_count: int | None = None,
) -> None:
    """Write ``df`` to parquet at ``path``, clustered on the Morton key
    of ``cols``: range-partitioned (balanced output files regardless of
    input partitioning) and sorted within partitions so parquet
    row-group stats are tight on every z-column."""
    key = zorder_key(df, cols, bits)
    out = df.withColumn("_zkey", key)
    if file_count is not None:
        out = out.repartitionByRange(file_count, "_zkey")
    else:
        out = out.repartitionByRange("_zkey")
    (
        out.sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
