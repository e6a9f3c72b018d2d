"""Per-query micro-bench + plan dump for the optimization rounds.

Usage:
    python scripts/qtime.py q1 q2 ...            # time each (warmup + min of N)
    python scripts/qtime.py --explain OUT_DIR q1 # also write OUT_DIR/<q>.txt
    python scripts/qtime.py --reps 3 q1

Same methodology as bench.py (noop sink, warm session, min-of-N) so
numbers are comparable per query; this is the guide §1 "isolate each
expensive query" loop without paying for the whole 165-query sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from oasisdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="filename suffix for explain dumps")
    args = ap.parse_args()

    spark = get_spark("oasisdb_spark_qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    qs.update(entrymod.bench_queries())
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    out = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"qtime:{name}:warmup")
        force(qs[name](spark, SF_DIR))  # warmup (also builds memoized artifacts)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = None
        for i in range(args.reps):
            from oasisdb_spark.ckpt import release_tracked

            release_tracked()  # previous rep's blocks, outside the timer
            spark.sparkContext.setJobDescription(f"qtime:{name}:{i}")
            t0 = time.perf_counter()
            force(qs[name](spark, SF_DIR))
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        out[name] = round(best, 3)
        print(f"{out[name]:8.3f}  {name}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
