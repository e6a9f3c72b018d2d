"""Deterministic Lloyd's k-means for IVF coarse quantization.

Reference: internal/index/ivf.go:317-377 kMeans — first-k-rows init
(ivf.go:321-328), at most 40 Lloyd iterations, squared-L2 assignment.
MLlib's KMeans (kmeans||) would work but uses a different init, which
breaks golden-test determinism (SURVEY.md §7 hard parts); nlist is small
(100-4096), so the FIT runs on a driver-collected SAMPLE in numpy while
ASSIGNMENT stays fully distributed (see ivf.py).

Scale: fitting a coarse quantizer on a bounded sample is the standard
design at any scale (FAISS does the same); sample_cap rows * dim floats
is driver-memory bounded regardless of table size.
"""

from __future__ import annotations

import numpy as np

__all__ = ["kmeans_fit", "MAX_KMEANS_ITERS"]

MAX_KMEANS_ITERS = 40  # ivf.go const usage; const.go:26-30


def kmeans_fit(x: np.ndarray, k: int, max_iters: int = MAX_KMEANS_ITERS) -> np.ndarray:
    """Lloyd's with first-k init, squared-L2, empty clusters keep their
    previous centroid (matching ivf.go:351-371 update step).

    x: (n, dim) float32. Returns (k, dim) float32 centroids.
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    n = x.shape[0]
    if n == 0:
        raise ValueError("cannot fit kmeans on empty data")
    k = min(k, n)
    centroids = x[:k].copy()  # first-k init, ivf.go:321-328
    x64 = x.astype(np.float64)  # float64 sums for the update step
    dim = x.shape[1]
    for _ in range(max_iters):
        assign = _assign(x, centroids)
        # vectorized update: per-cluster float64 sums + counts in one
        # scatter-add pass instead of k boolean-mask scans
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, assign, x64)
        new_centroids = centroids.copy()
        nonempty = counts > 0  # empty clusters keep their centroid (ivf.go:351-371)
        new_centroids[nonempty] = (
            sums[nonempty] / counts[nonempty, None]
        ).astype(np.float32)
        if np.array_equal(new_centroids, centroids):
            break
        centroids = new_centroids
    return centroids


_ASSIGN_CHUNK = 65_536


def _assign(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Vectorized argmin_c ||x-c||² — (n,) int32.

    Training-loop kernel: float32 GEMM (the reference trains in float32
    too, ivf.go); the per-row ||x||² term is constant under argmin over
    c and dropped; chunked so the (chunk, k) score matrix stays cache/
    memory bounded at any sample size."""
    c = np.ascontiguousarray(centroids, dtype=np.float32)
    c2 = (c.astype(np.float64) ** 2).sum(axis=1).astype(np.float32)
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(len(x), dtype=np.int32)
    for i in range(0, len(x), _ASSIGN_CHUNK):
        blk = x[i : i + _ASSIGN_CHUNK]
        d = blk @ c.T
        d *= -2.0
        d += c2[None, :]
        out[i : i + _ASSIGN_CHUNK] = d.argmin(axis=1)
    return out
