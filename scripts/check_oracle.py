"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact match required
    return repr(v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # generated oracles (pca_knn derives its quantized model from the
    # gate fixture) must target the same sf as this run
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from oasisdb_spark.session import get_spark

    spark = get_spark("check_oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:35s} rows-only: {len(srows)} rows (no oracle)")
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        ok_schema = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_schema and ok_count and rowset(srows, scols) == rowset(drows, dcols)
        status = "OK" if (ok_schema and ok_count and ok_vals) else "FAIL"
        print(f"{name:35s} {status}  rows {len(srows)}/{len(drows)} schema={ok_schema} values={ok_vals}")
        if status == "FAIL":
            failures += 1
            if not ok_schema:
                print(f"    spark cols: {scols}\n    duck  cols: {dcols}")
            elif ok_count:
                a, b = rowset(srows, scols), rowset(drows, dcols)
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                for i in diff:
                    print(f"    spark: {a[i]}\n    duck : {b[i]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
