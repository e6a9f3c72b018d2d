"""Bloom-filter semi-join reduction: prune a huge fact table by a
compact bitset built from the (filtered) dimension keys BEFORE the
shuffle join.

Spark's own runtime filters only kick in when the build side is
broadcast-able and AQE chooses to inject them; this operator makes the
reduction explicit and key-exact in semantics — the Bloom filter has
no false negatives, and its false positives are eliminated by the
exact join that follows, so ``bloom_pruned_join`` returns *exactly*
the plain join's rows (that is what the oracle checks). The filter
only changes how many fact rows reach the shuffle.

Build: one ``mapInPandas`` pass emits a per-partition bitset
(``num_bits/8`` bytes each), OR-reduced on the driver — the driver
never sees keys, only fixed-size bitsets. Probe: the bitset is
broadcast and a vectorized Arrow batch test filters the fact table
in-place before the join.

Hashing is splitmix64-style mixing over the int64 key, computed in
numpy uint64 arithmetic identically on build and probe — it never has
to match any JVM hash, because both sides of the filter live in the
same Python kernel.

Sizing (document at call sites): m = -n·ln(p)/ln(2)^2 bits for n keys
at false-positive rate p; k = (m/n)·ln(2) hashes. 10M keys at 1% FP
is ~12 MB — broadcast-friendly far beyond where an actual broadcast
join of the dimension stops being.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_key_bloom", "bloom_prune", "bloom_pruned_join"]

_PHI1 = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 keys; vectorized, overflow-wrapping."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(seed) * _PHI1
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def _positions(keys: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(num_hashes, n) bit positions for each key."""
    u = keys.astype(np.int64).view(np.uint64)
    return np.stack(
        [_mix(u, s + 1) % np.uint64(num_bits) for s in range(num_hashes)]
    )


def build_key_bloom(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> bytes:
    """Bloom bitset over the (already filtered) dimension's int64 keys.

    Executors each reduce their partition to one ``num_bits/8``-byte
    row; the driver ORs those. Rows moved to the driver:
    ``partitions x num_bits/8`` bytes, independent of key count.
    """
    nbytes = num_bits // 8

    def to_bits(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            k = pdf[key_col].to_numpy(dtype=np.int64, na_value=0)
            if len(k) == 0:
                continue
            seen = True
            pos = _positions(k, num_bits, num_hashes).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = dim.select(key_col).mapInPandas(to_bits, schema="bits binary").collect()
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return acc.tobytes()


def bloom_prune(
    fact: DataFrame, key_col: str, bloom: bytes, num_hashes: int = 5
) -> DataFrame:
    """Rows of ``fact`` whose key *may* be in the filter (no false
    negatives). Arrow-batched membership test; all fact columns pass
    through untouched, no shuffle."""
    num_bits = len(bloom) * 8
    spark = fact.sparkSession
    b_bits = spark.sparkContext.broadcast(bloom)

    def member(batches):
        bits = np.frombuffer(b_bits.value, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            k = pdf[key_col].to_numpy(dtype=np.int64, na_value=0)
            pos = _positions(k, num_bits, num_hashes)
            hit = np.ones(len(k), dtype=bool)
            for row in pos:
                bit = (bits[row >> 3] >> (row & np.uint64(7)).astype(np.uint8)) & 1
                hit &= bit.astype(bool)
            out = pdf[hit]
            if len(out):
                yield out

    return fact.mapInPandas(member, schema=fact.schema)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Exact equi-join of fact-to-dim with a Bloom pre-prune on the fact
    side. Result rows are identical to the plain join (inner/semi);
    only the fact rows entering the shuffle change."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        # pruning the fact side changes the OUTER-join result (a fact
        # row outside the filter must still appear NULL-extended under
        # left/full) — only match-only joins keep the equivalence
        raise ValueError(
            f"bloom_pruned_join: how must be inner or a semi join, got "
            f"{how!r} — outer joins lose the pruned fact rows"
        )
    bloom = build_key_bloom(dim, dim_key, num_bits, num_hashes)
    pruned = bloom_prune(fact, fact_key, bloom, num_hashes)
    cond = pruned[fact_key] == dim[dim_key]
    return pruned.join(dim, on=cond, how=how)
