"""Generate the NULL-injected oracle fixture tier (VERDICT r08 #2).

The round-8 NULL/NaN hardening sweep fixed ~20 semantic bugs (NULL
histogram buckets shifting exact medians, NULL keys hogging
deterministic-sample slots, NULL baskets inflating support counts, …)
that the CLEAN sf fixtures can never exercise end-to-end — that
discipline lived only in unit tests.  This script derives an
`sf0.001-null` variant of the driver fixture deterministically, so
`check_oracle.py` can run the whole registry Spark-vs-DuckDB on data
that actually contains NULLs:

  - every column of every table is eligible (keys, measures, strings,
    timestamps, the embedding list — NULL keys and NULL vectors are
    exactly the classes the hardening sweep fixed);
  - a cell [table, column, row] goes NULL iff
    md5(f"{table}.{column}.{row}") % RATE_DEN == 0 (~2.7% per column),
    so the fixture is a pure function of the source fixture — nothing
    random, nothing committed;
  - values that stay are byte-identical to the source fixture;
  - float-vector columns additionally get ELEMENT-level NULLs on a
    third disjoint hash stream (md5(f"enull.{{t}}.{{c}}.{{row}}") %
    41 == 0, element row%dim set to NULL) — ADVICE r09: an element-
    NULL vector previously slipped through both indexability twins.

NaN is deliberately NOT injected: both engines read the same parquet,
but NaN breaks order-insensitive value hashing (NaN != NaN) in the
comparer itself, which would flag comparer artifacts, not engine bugs.
NULL is the class the r08 sweep showed finds real divergences.

Usage: python scripts/make_null_fixture.py [--nan] [SRC_DIR] [DST_DIR]
  defaults: /root/testdata/sf0.001  ->  <repo>/.nullfix/sf0.001-null
  --nan: additionally inject NaN into scalar DOUBLE columns
         (md5(f"nan.{{table}}.{{column}}.{{row}}") % 41 == 0, disjoint
         hash stream from the NULL mask) and default the output to
         <repo>/.nullfix/sf0.001-nan. check_oracle's canon() treats
         NaN as equal to itself, so the comparer is NaN-clean; the
         tier probes Spark-vs-SQL NaN ordering/aggregation semantics
         (Spark sorts NaN greatest and NaN==NaN in groupBy — engines
         differ in filters and comparisons).

Run `python scripts/check_oracle.py <repo>/.nullfix/sf0.001-null` for
the sweep; NULLSWEEP.md records each round's result.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

RATE_DEN = 37  # ~2.7% of cells per column
NAN_DEN = 41   # ~2.4% of surviving double cells per column (--nan)


def null_mask(table: str, column: str, n: int) -> pa.Array:
    """Deterministic per-cell NULL mask: md5 of 'table.column.row'."""
    flags = [
        int.from_bytes(
            hashlib.md5(f"{table}.{column}.{i}".encode()).digest()[:8], "big"
        ) % RATE_DEN == 0
        for i in range(n)
    ]
    return pa.array(flags, type=pa.bool_())


def nan_mask(table: str, column: str, n: int) -> pa.Array:
    """Deterministic per-cell NaN mask — a hash stream disjoint from
    the NULL mask's, so NaN lands on cells the NULL pass spared."""
    flags = [
        int.from_bytes(
            hashlib.md5(f"nan.{table}.{column}.{i}".encode()).digest()[:8], "big"
        ) % NAN_DEN == 0
        for i in range(n)
    ]
    return pa.array(flags, type=pa.bool_())


def elemnull_mask(table: str, column: str, n: int) -> pa.Array:
    """Deterministic per-row element-NULL mask for float-vector
    columns — a third disjoint hash stream ('enull.'). ADVICE r09:
    Spark's isnan(NULL) is false and DuckDB's list_filter drops NULL
    predicate results, so a vector with a NULL *component* slipped
    through both indexability twins untested; this stream makes the
    NULL tier exercise that path.

    Rows 1 and 7 are ALWAYS hit: every kNN-family entry draws its
    query set from the low vec_ids (vec_id < 2 / < 5 / < 10 — row 1 is
    inside ALL of them, row 7 inside the common nq=10 set), and the
    round-10 sweep showed the hash stream alone can miss the whole
    query range — which is exactly where the hard_negatives/hybrid
    divergences hid."""
    flags = [
        i in (1, 7) or int.from_bytes(
            hashlib.md5(f"enull.{table}.{column}.{i}".encode()).digest()[:8], "big"
        ) % NAN_DEN == 0
        for i in range(n)
    ]
    return pa.array(flags, type=pa.bool_())


def inject(src: str, dst: str, table: str, with_nan: bool = False) -> dict[str, int]:
    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    n = t.num_rows
    cols, counts = [], {}
    for field in t.schema:
        col = t.column(field.name).combine_chunks()
        mask = null_mask(table, field.name, n)
        is_float_vec = pa.types.is_list(field.type) and pa.types.is_floating(
            field.type.value_type
        )
        if is_float_vec and not with_nan and n > 7:
            # ADVICE r10: the rows-1/7 element-NULL guarantee below is
            # silently voided if the whole-vector mask NULLs those rows
            # first (the element pass skips NULL vectors). The current
            # hash streams spare them (so this is bit-identical today),
            # but exempting them makes the guarantee structural against
            # any future RATE_DEN/column change.
            m = mask.to_pylist()
            m[1] = m[7] = False
            mask = pa.array(m, type=pa.bool_())
        out = pc.if_else(mask, pa.nulls(n, type=field.type), col)
        counts[field.name] = out.null_count
        if not with_nan and is_float_vec:
            # NULL ELEMENTS inside float vectors (NULL tier only; the
            # NaN tier corrupts the same column with NaN elements):
            # rows on the elemnull_mask get element row%dim set to NULL
            em = elemnull_mask(table, field.name, n)
            py = out.to_pylist()
            n_hit = 0
            for i, flag in enumerate(em.to_pylist()):
                if flag and py[i]:
                    v = list(py[i])
                    v[i % len(v)] = None
                    py[i] = v
                    n_hit += 1
            out = pa.array(py, type=field.type)
            counts[field.name + "+enull"] = n_hit
            # The docstring's promise, enforced (ADVICE r10): rows 1
            # and 7 — the ones inside every kNN query filter — carry
            # an element-NULL after injection, whatever the masks did.
            for i in (1, 7):
                if i < n:
                    assert py[i] is not None and any(
                        e is None for e in py[i]
                    ), f"{table}.{field.name} row {i} lost forced element-NULL"
        if with_nan and pa.types.is_float64(field.type):
            nm = nan_mask(table, field.name, n)
            out = pc.if_else(nm, pa.scalar(float("nan"), type=field.type), out)
            counts[field.name + "+nan"] = pc.sum(
                pc.and_(nm, pc.is_valid(out))
            ).as_py() or 0
        elif with_nan and (
            pa.types.is_list(field.type)
            and pa.types.is_floating(field.type.value_type)
        ):
            # NaN ELEMENTS inside float vectors (corrupt embeddings):
            # rows on the nan_mask get element row%dim set to NaN —
            # one poisoned component is all a GEMM/argsort needs
            nm = nan_mask(table, field.name, n)
            py = out.to_pylist()
            n_hit = 0
            for i, flag in enumerate(nm.to_pylist()):
                if flag and py[i]:
                    v = list(py[i])
                    v[i % len(v)] = float("nan")
                    py[i] = v
                    n_hit += 1
            out = pa.array(py, type=field.type)
            counts[field.name + "+nan"] = n_hit
        cols.append(out)
    pq.write_table(
        pa.table(cols, schema=t.schema),
        os.path.join(dst, f"{table}.parquet"),
    )
    return counts


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv = list(sys.argv[1:])
    with_nan = "--nan" in argv
    if with_nan:
        argv.remove("--nan")
    src = argv[0] if argv else "/root/testdata/sf0.001"
    default = "sf0.001-nan" if with_nan else "sf0.001-null"
    dst = argv[1] if len(argv) > 1 else os.path.join(repo, ".nullfix", default)
    os.makedirs(dst, exist_ok=True)
    total = 0
    for table in TABLES:
        counts = inject(src, dst, table, with_nan=with_nan)
        injected = sum(counts.values())
        total += injected
        print(f"{table:12s} {injected:5d} injected cells  "
              + ", ".join(f"{c}={v}" for c, v in counts.items() if v))
    print(f"wrote {dst}: {total} NULL{'+NaN' if with_nan else ''} cells total")


if __name__ == "__main__":
    main()
