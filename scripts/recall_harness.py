"""Recall/QPS harness — the engine's equivalent of the reference's
benchmarks/run_benchmarks.py: ground truth by brute force
(run_benchmarks.py:126-133), recall@k by set intersection (:136-142),
sweeping the accuracy knob (efsearch there, nprobe here — SURVEY.md Q6).

Prints one JSON line per (index, knob) point:
  {"index": "ivf", "knob": {"nprobe": 4}, "recall_at_10": r, "qps": q}

Usage: python scripts/recall_harness.py [sf_dir] [n_queries]
       python scripts/recall_harness.py --clustered [n_base] [n_queries]
       python scripts/recall_harness.py --dataset fashion-mnist|sift [n_queries]

--dataset: the reference harness's real corpora (run_benchmarks.py:24-38:
Fashion-MNIST 60k x 784, SIFT1M 1M x 128) fetched from the public
ann-benchmarks mirror into /tmp on first use. Needs network + h5py;
when either is missing the harness prints one explanatory JSON line and
exits 0 (the synthetic modes remain the offline path).

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


# ann-benchmarks public HDF5 mirrors — the same fixtures the reference
# downloads (benchmarks/run_benchmarks.py:24-38)
_DATASETS = {
    "fashion-mnist": "http://ann-benchmarks.com/fashion-mnist-784-euclidean.hdf5",
    "sift": "http://ann-benchmarks.com/sift-128-euclidean.hdf5",
}


def real_dataset(spark, name: str, nq: int):
    """(base_df, queries_df) from an ann-benchmarks HDF5 fixture, or None
    with one explanatory JSON line when offline / h5py-less — callers
    fall back to exiting cleanly so the harness is safe in sandboxes."""
    url = _DATASETS[name]
    path = os.path.join("/tmp", "annbench", os.path.basename(url))
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            import urllib.request

            urllib.request.urlretrieve(url, path + ".part")
            os.replace(path + ".part", path)
        except Exception as e:  # noqa: BLE001 — offline sandbox is the normal case
            print(json.dumps({"dataset": name, "skipped": f"download failed ({type(e).__name__}); offline? synthetic modes still available"}))
            return None
    try:
        import h5py
    except ImportError:
        print(json.dumps({"dataset": name, "skipped": "h5py not installed; pip install h5py to read ann-benchmarks HDF5"}))
        return None
    import numpy as np
    import pandas as pd

    # Per-chunk createDataFrame + union so peak driver memory is ONE
    # chunk's Python lists (~100k rows), not the whole dataset — a
    # single pd.concat of SIFT1M as Python float lists is several GB
    # and OOMs a default-heap driver.
    schema = "id BIGINT, vector ARRAY<FLOAT>"
    chunk = 100_000
    base = None
    with h5py.File(path, "r") as f:
        n_train = f["train"].shape[0]
        for lo in range(0, n_train, chunk):
            arr = np.asarray(f["train"][lo : lo + chunk], dtype=np.float32)
            part = spark.createDataFrame(
                pd.DataFrame({"id": range(lo, lo + len(arr)),
                              "vector": [v.tolist() for v in arr]}),
                schema,
            )
            base = part if base is None else base.unionByName(part)
        test = np.asarray(f["test"][:nq], dtype=np.float32)
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": range(len(test)), "query_vec": [v.tolist() for v in test]}),
        "query_id BIGINT, query_vec ARRAY<FLOAT>",
    )
    return base, queries


def main() -> None:
    clustered = len(sys.argv) > 1 and sys.argv[1] == "--clustered"
    dataset = sys.argv[2] if len(sys.argv) > 2 and sys.argv[1] == "--dataset" else None
    spark = get_spark("recall_harness")
    spark.sparkContext.setLogLevel("ERROR")

    if dataset:
        if dataset not in _DATASETS:
            print(json.dumps({"error": f"unknown dataset {dataset}; choose from {sorted(_DATASETS)}"}))
            spark.stop()
            return
        nq = int(sys.argv[3]) if len(sys.argv) > 3 else 100
        pair = real_dataset(spark, dataset, nq)
        if pair is None:
            spark.stop()
            return
        base, queries = pair
        base = base.cache()
        queries = queries.cache()
    elif clustered:
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

    # filtered ANN: recall under a selective predicate (id % s == 0).
    # Selective filters thin every probed list, so fixed-nprobe recall
    # degrades with selectivity — the standard filtered-ANN tradeoff the
    # id_filter docstring points at. Ground truth = brute over survivors.
    for sel in (2, 10):
        fbase = base.filter(F.col("id") % sel == 0)
        fexact_rows = knn_brute_batched(queries, fbase, K).collect()
        fexact: dict[object, set] = {}
        for r in fexact_rows:
            fexact.setdefault(r["query_id"], set()).add(r["id"])
        ids = fbase.select("id")
        for nprobe in (4, 16, nlist):
            if nprobe > nlist:
                continue
            t0 = time.perf_counter()
            rows = knn_ivf(queries, cent, lists, K, nprobe=nprobe, id_filter=ids).collect()
            dt = time.perf_counter() - t0
            print(json.dumps({"index": "ivf+filter", "knob": {"nlist": nlist, "nprobe": nprobe,
                              "keep_1_in": sel},
                              "recall_at_10": round(recall(rows, fexact), 4),
                              "qps": round(n_q / dt, 2)}))

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

    from oasisdb_spark.index.binq import build_binq, knn_binq

    means, codes = build_binq(base)
    codes = codes.cache(); codes.count()
    for refine in (0, 2, 4, 8, 16):
        t0 = time.perf_counter()
        rows = knn_binq(
            queries, means, codes, K,
            refine_base=base if refine else None, refine_factor=refine,
        ).collect()
        dt = time.perf_counter() - t0
        print(json.dumps({"index": "binq", "knob": {"refine_factor": refine},
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
