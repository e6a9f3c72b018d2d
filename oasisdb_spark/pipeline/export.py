"""Training-shard export — the corpus "last mile".

After curation / dedup / mixture sampling, a pretraining pipeline
materializes the corpus as N size-balanced shards in a deterministic
GLOBAL shuffle order (so every training run streams the same byte
sequence, and adjacent documents are decorrelated from crawl/source
order — the "shuffle then shard" step every published corpus build ends
with, e.g. the Dolma/RedPajama/C4 tooling).

Spark-first shapes:

- ``shard_assign``: pure Column arithmetic — shard id and intra-shard
  position both derive from an md5 content hash (the same
  engine-reproducible idiom as ``weighted_sample`` / ``kmv_hash``), so
  the full layout is a deterministic function of (salt, doc ids):
  reproducible across runs, cluster sizes, AND engines — the layout
  itself carries an exact DuckDB oracle. One window shuffle on
  shard_id; at 100 TB each shard is one window partition, so n_shards
  (thousands) is the parallelism unit and no global sort ever runs.
- ``write_training_shards``: materializes that layout with
  ``repartition(n_shards, shard)`` + ``sortWithinPartitions`` +
  ``partitionBy(shard)`` parquet — the shuffle is the SAME one the
  window needs, Spark just also writes the files; readers get
  ``shard=K/part-*.parquet`` directories whose row order is the
  assigned shard_pos order.

Why hash-order instead of Spark's rand(): rand() depends on partition
layout and seed plumbing, so two runs (or an engine re-run) disagree;
the md5 order is storage-order-independent and oracle-checkable. A
cryptographic-quality hash of (salt, id) is exactly the Fisher-Yates
permutation quality a training shuffle needs — change ``salt`` to get a
fresh epoch permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["shard_assign", "write_training_shards"]


def _hash60(col, salt: str):
    """Deterministic 60-bit integer from md5(salt || ':' || id) — the
    cross-engine idiom: DuckDB computes the identical value via
    ('0x' || substr(md5(..),1,15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "oasis",
) -> DataFrame:
    """Assign every row a (shard, shard_pos): shard = h % n_shards,
    position = rank of h within the shard (ties impossible up to md5
    collisions; the doc_id tiebreak makes even that case
    deterministic). Appends the two columns to the input row.

    The expected shard size is n/n_shards with binomial concentration
    (±3·sqrt(n/n_shards) at 3 sigma) — size-balanced without a
    balancing pass. One shuffle (the shard window); everything else is
    scan-stage arithmetic."""
    h = _hash60(F.col(id_col), salt)
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % n_shards).cast("bigint"))
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_h")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "oasis",
) -> DataFrame:
    """Materialize the ``shard_assign`` layout as parquet: one
    ``shard=K`` directory per shard whose row order equals shard_pos
    order. Returns the per-shard manifest (shard, n_docs, n_tokens if a
    ``n_tokens`` column exists) for bookkeeping.

    The repartition keys the SAME hash the window sorts by, so the
    whole write is one shuffle + per-partition sort — no global sort,
    no driver state; shard count is the write parallelism. (Spark
    hash-partitions the shard id, so task occupancy is ~1-1/e rather
    than exactly one shard per task — co-resident shards still write
    correct, correctly-ordered directories via the sort + partitionBy;
    at scale just set n_shards a few x the executor-core count.)"""
    assigned = shard_assign(df, id_col=id_col, n_shards=n_shards, salt=salt)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if "n_tokens" in assigned.columns:
        aggs.append(F.sum("n_tokens").alias("n_tokens"))
    return assigned.groupBy("shard").agg(*aggs)
