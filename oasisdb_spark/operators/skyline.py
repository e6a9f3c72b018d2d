"""Pareto skyline (maximal-vector) operator.

The classic multi-criteria OLAP operator (Börzsönyi, Kossmann &
Stocker, ICDE'01 — ``SELECT ... SKYLINE OF price MIN, size MAX``):
return every row not STRICTLY dominated by another — q dominates p iff
q is at-least-as-good in every dimension and strictly better in at
least one. Duplicated points never dominate each other, so exact ties
all survive.

Spark-first plan, built on the skyline's closure property — the
skyline of a union is contained in the union of the skylines — which
makes the operator embarrassingly mergeable:

1. **Local prune** (``mapInPandas``, Arrow-batched numpy): each
   partition folds its batches into a running candidate set. Every
   incoming block is checked against the kept set, the kept set is
   re-checked against the block (dominance is discovered in BOTH
   directions — later rows may dominate earlier keeps), and the block
   is pruned within itself, all as vectorized ``all``/``any``
   reductions over an (n_block × n_kept × d) broadcast — no per-row
   Python loop. A partition emits only its local skyline.
2. **Global resolve**: the surviving candidates (≤ Σ local skyline
   sizes — for correlated/independent dims, orders of magnitude below
   the input) repartition to ONE task and run the identical prune.
   The closure property makes this exact, and the single task touches
   candidate rows only — never the raw table.

At 100 TB the raw table is scanned once and never shuffled; only local
skylines move. The known hazard is ANTI-correlated dimensions, where
the true skyline itself is large: ``max_candidates`` bounds the final
single-task gather and fails loudly (never silently truncates) when
the candidate set exceeds it — the signal to switch to a
partition-by-grid skyline, not to wait out an OOM.

Dominance is evaluated on float64 copies of the dimension columns —
exact for integer inputs up to 2^53 (the repo's integer-cents
quantization discipline keeps real uses far below), and rows with NULL
in any dimension are dropped up front (dominance is undefined on
NULL; the oracle twin applies the same filter).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline"]

_BLOCK = 2048  # pairwise prune is O(block²·d) — 2048 keeps it in-cache


def _prune_block(X, S):
    """Return (survivors-of-X mask, survivors-of-S mask) under strict
    Pareto dominance, orienting every dimension as MINIMIZE. X is the
    incoming block, S the kept candidate set (either may be empty).

    Order of checks is the block-nested-loops optimization (Börzsönyi
    §5.1): the kept set is checked FIRST — it is small and strong, so
    it kills most of the block at O(n_block·|S|·d) — and the O(n²·d)
    within-block prune then runs over the few S-survivors only.
    Correct because dominance is transitive: a row dominated by a kept
    candidate stays excluded even if that candidate is itself later
    dominated (its dominator dominates the row too). The first block
    (S empty) pays the full quadratic once."""
    import numpy as np

    nx = X.shape[0]
    keep_x = np.ones(nx, dtype=bool)
    # 1. cheap kill against the kept set
    if S is not None and S.shape[0] > 0:
        dom_x = (
            (S[None, :, :] <= X[:, None, :]).all(2)
            & (S[None, :, :] < X[:, None, :]).any(2)
        ).any(1)
        keep_x = ~dom_x
    Xs = X[keep_x]
    # 2. within-block: survivor i dominated by survivor j (j≠i)
    if Xs.shape[0] > 1:
        le = (Xs[None, :, :] <= Xs[:, None, :]).all(2)
        lt = (Xs[None, :, :] < Xs[:, None, :]).any(2)
        keep_in = ~(le & lt).any(1)
        keep_x[keep_x] = keep_in
        Xs = Xs[keep_in]
    if S is None or S.shape[0] == 0:
        return keep_x, None
    # 3. back-prune the kept set against the block's survivors
    keep_s = ~(
        (Xs[None, :, :] <= S[:, None, :]).all(2)
        & (Xs[None, :, :] < S[:, None, :]).any(2)
    ).any(1)
    return keep_x, keep_s


def _prune_partition(ocols: list[str]):
    """mapInPandas kernel: fold a partition's batches into its local
    skyline; used verbatim for the final single-task resolve."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kept_pdf: pd.DataFrame | None = None
        S = None
        for pdf in batches:
            for lo in range(0, len(pdf), _BLOCK):
                block = pdf.iloc[lo : lo + _BLOCK]
                X = block[ocols].to_numpy(dtype=np.float64)
                keep_x, keep_s = _prune_block(X, S)
                surv = block.iloc[keep_x]
                if S is None:
                    kept_pdf, S = surv, X[keep_x]
                else:
                    kept_pdf = pd.concat(
                        [kept_pdf.iloc[keep_s], surv], ignore_index=True
                    )
                    S = np.concatenate([S[keep_s], X[keep_x]])
        if kept_pdf is not None and len(kept_pdf):
            yield kept_pdf

    return fn


def skyline(
    df: DataFrame,
    dims: list[tuple[str, str]],
    max_candidates: int = 1_000_000,
) -> DataFrame:
    """Exact Pareto skyline of ``df`` over ``dims`` — a list of
    (numeric column, 'min' | 'max') pairs. Returns the input rows
    (all columns) that no other row strictly dominates; exact
    duplicates on every dimension survive together. Rows with NULL in
    any dimension are dropped. ``max_candidates`` bounds the global
    resolve's single-task input and raises loudly if local skylines
    exceed it (anti-correlated dims — see module docstring)."""
    if not dims:
        raise ValueError("skyline: dims must be non-empty")
    for _, d in dims:
        if d not in ("min", "max"):
            raise ValueError(f"skyline: direction must be min|max, got {d!r}")
    from pyspark.sql.types import DoubleType, FloatType

    work = df
    ocols = []
    for i, (c, d) in enumerate(dims):
        work = work.where(F.col(c).isNotNull())
        # NaN passes isNotNull but compares FALSE with everything, so a
        # NaN row could never be dominated and would silently pollute
        # the skyline -- dominance is as undefined on NaN as on NULL
        if isinstance(work.schema[c].dataType, (DoubleType, FloatType)):
            work = work.where(~F.isnan(F.col(c)))
        o = f"_sky_{i}"
        ocols.append(o)
        expr = F.col(c).cast("double")
        work = work.withColumn(o, expr if d == "min" else -expr)
    kernel = _prune_partition(ocols)
    local = work.mapInPandas(kernel, schema=work.schema)
    # loud guard on the single-task gather (see module docstring)
    def _guarded(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        buf = []
        for pdf in batches:
            seen += len(pdf)
            if seen > max_candidates:
                raise ValueError(
                    f"skyline: local candidate set exceeds max_candidates="
                    f"{max_candidates}; dimensions look anti-correlated — "
                    "raise the cap or pre-partition by a grid"
                )
            buf.append(pdf)
        yield from kernel(iter(buf))

    out = local.repartition(1).mapInPandas(_guarded, schema=work.schema)
    return out.drop(*ocols)
