"""Recall/QPS harness — the engine's equivalent of the reference's
benchmarks/run_benchmarks.py: ground truth by brute force
(run_benchmarks.py:126-133), recall@k by set intersection (:136-142),
sweeping the accuracy knob (efsearch there, nprobe here — SURVEY.md Q6).

Prints one JSON line per (index, knob) point:
  {"index": "ivf", "knob": {"nprobe": 4}, "recall_at_10": r, "qps": q}

Usage: python scripts/recall_harness.py [sf_dir] [n_queries]
       python scripts/recall_harness.py --clustered [n_base] [n_queries]

--clustered: generate a clustered synthetic corpus instead of reading a
fixture dir — 64-d points around 100 gaussian centers with sigma=0.15
(real embedding corpora cluster; the isotropic-gaussian fixture is the
coarse quantizer's worst case and makes PQ look artificially bad).
Generated distributed (mapInPandas over spark.range), seeded per id.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from oasisdb_spark.session import get_spark

K = 10  # run_benchmarks.py:222-226 default


def recall(approx_rows, exact: dict[object, set]) -> float:
    got: dict[object, set] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["id"])
    return sum(len(got.get(q, set()) & ids) / len(ids) for q, ids in exact.items()) / len(exact)


def clustered_base(spark, n: int, dim: int = 64, n_centers: int = 100, sigma: float = 0.15):
    """Clustered synthetic corpus: point i ~ N(center[i % n_centers],
    sigma²·I); centers ~ N(0, I) from a fixed seed. Distributed
    generation, deterministic per id."""
    import numpy as np
    import pandas as pd

    centers = np.random.default_rng(12345).standard_normal((n_centers, dim)).astype(np.float64)
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        C = bc.value
        for pdf in batches:
            ids = pdf["id"].values
            vecs = []
            for i in ids:
                rng = np.random.default_rng(int(i) + 777)
                vecs.append((C[int(i) % len(C)] + sigma * rng.standard_normal(dim)).astype(np.float32).tolist())
            yield pd.DataFrame({"id": ids, "vector": vecs})

    return spark.range(n).mapInPandas(gen, "id LONG, vector ARRAY<FLOAT>")


def main() -> None:
    clustered = len(sys.argv) > 1 and sys.argv[1] == "--clustered"
    spark = get_spark("recall_harness")
    spark.sparkContext.setLogLevel("ERROR")

    if clustered:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
        nq = int(sys.argv[3]) if len(sys.argv) > 3 else 50
        base = clustered_base(spark, n).cache()
        queries = base.filter(F.col("id") < nq).select(
            F.col("id").alias("query_id"), F.col("vector").alias("query_vec")
        ).cache()
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        nq = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector")).cache()
        queries = emb.filter(F.col("vec_id") < nq).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        ).cache()
    n_base, n_q = base.count(), queries.count()

    # ground truth: GEMM exact path (validated vs the expression oracle)
    from oasisdb_spark.pipeline.ann import knn_brute_batched

    t0 = time.perf_counter()
    exact_rows = knn_brute_batched(queries, base, K).collect()
    brute_sec = time.perf_counter() - t0
    exact: dict[object, set] = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["id"])
    print(json.dumps({"index": "brute", "n_base": n_base, "n_queries": n_q,
                      "recall_at_10": 1.0, "qps": round(n_q / brute_sec, 2)}))

    from oasisdb_spark.index.ivf import build_ivf, knn_ivf
    from oasisdb_spark.index.ivfpq import build_ivfpq, knn_ivfpq
    from oasisdb_spark.index.lsh import knn_lsh

    nlist = max(4, min(64, n_base // 50))
    cent, lists = build_ivf(base, nlist=nlist)
    lists = lists.cache(); lists.count()
    for nprobe in (1, 2, 4, 8, 16, nlist):
        if nprobe > nlist:
            continue
        t0 = time.perf_counter()
        rows = knn_ivf(queries, cent, lists, K, nprobe=nprobe).collect()
        dt = time.perf_counter() - t0
        print(json.dumps({"index": "ivf", "knob": {"nlist": nlist, "nprobe": nprobe},
                          "recall_at_10": round(recall(rows, exact), 4), "qps": round(n_q / dt, 2)}))

    cents, books, plists = build_ivfpq(base, nlist=nlist, m=8)
    plists = plists.cache(); plists.count()
    for nprobe, refine in ((4, 4), (8, 4), (16, 4), (16, 8), (16, 16), (nlist, 4)):
        if nprobe > nlist:
            continue
        t0 = time.perf_counter()
        rows = knn_ivfpq(queries, cents, books, plists, K, nprobe=nprobe,
                         refine_base=base, refine_factor=refine).collect()
        dt = time.perf_counter() - t0
        print(json.dumps({"index": "ivfpq+refine",
                          "knob": {"nlist": nlist, "nprobe": nprobe, "m": 8, "refine_factor": refine},
                          "recall_at_10": round(recall(rows, exact), 4), "qps": round(n_q / dt, 2)}))

    from oasisdb_spark.index.ivfsq import build_ivfsq, knn_ivfsq

    scents, vmin, vmax, slists = build_ivfsq(base, nlist=nlist)
    slists = slists.cache(); slists.count()
    for nprobe in (4, 16, nlist):
        if nprobe > nlist:
            continue
        t0 = time.perf_counter()
        rows = knn_ivfsq(queries, scents, vmin, vmax, slists, K, nprobe=nprobe).collect()
        dt = time.perf_counter() - t0
        print(json.dumps({"index": "ivfsq8", "knob": {"nlist": nlist, "nprobe": nprobe},
                          "recall_at_10": round(recall(rows, exact), 4), "qps": round(n_q / dt, 2)}))

    for nt in (2, 4, 8):
        t0 = time.perf_counter()
        rows = knn_lsh(queries, base, K, bucket_length=4.0, num_hash_tables=nt).collect()
        dt = time.perf_counter() - t0
        print(json.dumps({"index": "lsh", "knob": {"num_hash_tables": nt},
                          "recall_at_10": round(recall(rows, exact), 4), "qps": round(n_q / dt, 2)}))

    spark.stop()


if __name__ == "__main__":
    main()
