"""Embedding providers: text → vector column transformers.

Reference: internal/embedding/embedding.go:4-7 (EmbeddingProvider
interface: Embed / EmbedBatch); the sole implementation calls Aliyun
DashScope text-embedding-v4 over HTTPS (provider/aliyun.go:82-141).
Auto-embed triggers when `parameters.embedding=true` and the vector is
absent (db/document.go:55-68 upsert, :176-193 query, :264-278 batch).

Spark design: a provider is a function text-batch → matrix, wrapped in
an Arrow-batched pandas UDF — embedding is a column transformation, so
it scales with the data (the reference loops HTTP calls per doc batch).

Providers:
- HashEmbedder: deterministic local embedder for tests — the same role
  as the stub provider in internal/db/additional_test.go:15-35. Seeded
  from blake2b(text), unit-norm, reproducible across processes.
- HttpEmbedder: DashScope-compatible contract (aliyun.go:15-18 endpoint
  / request shape); NOT exercised in tests (no network in this env) —
  the class validates config and raises on use without a base_url.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["HashEmbedder", "Md5Embedder", "HttpEmbedder", "embed_column", "auto_embed"]


class HashEmbedder:
    """Deterministic unit-norm embedding from a text hash (test provider)."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.blake2b((t or "").encode(), digest_size=8).digest(), "big")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim).astype(np.float32)
            n = float(np.linalg.norm(v))
            out[i] = v / n if n > 0 else v
        return out


class Md5Embedder:
    """Cross-engine-reproducible embedder: v[i] is an md5-derived integer
    in [-1000, 1000], so any SQL engine with md5() can recompute the
    vector exactly (the same cross-engine trick as the MinHash
    coefficients, pipeline/dedup.py). Integer-valued float32 components
    keep dot products / norms exact in float64 — no last-ulp drift vs a
    SQL oracle. DuckDB equivalent of one component:
    (('0x' || substr(md5(text || ':' || i), 1, 15))::BIGINT % 2001) - 1000
    """

    def __init__(self, dim: int = 32):
        self.dim = dim

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            t = t or ""
            out[i] = [
                int(hashlib.md5(f"{t}:{j}".encode()).hexdigest()[:15], 16) % 2001 - 1000
                for j in range(self.dim)
            ]
        return out


class HttpEmbedder:
    """DashScope-compatible HTTP provider (aliyun.go:15-18,82-141
    contract: POST {base_url}/embeddings {model, input[]} → data[].embedding).
    Requires network + api key; raises if unconfigured."""

    def __init__(self, base_url: str | None = None, api_key: str | None = None,
                 model: str = "text-embedding-v4", dim: int = 1024):
        self.base_url, self.api_key, self.model, self.dim = base_url, api_key, model, dim

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if not self.base_url or not self.api_key:
            raise NotImplementedError(
                "HttpEmbedder needs base_url + api_key (no network in the test env); "
                "use HashEmbedder for deterministic local embedding"
            )
        import json
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/embeddings",
            data=json.dumps({"model": self.model, "input": texts}).encode(),
            headers={"Authorization": f"Bearer {self.api_key}", "Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            data = json.loads(resp.read())
        return np.array([d["embedding"] for d in data["data"]], dtype=np.float32)


def embed_column(provider, text_col: Column | str = "text") -> Column:
    """embed(text) -> ARRAY<FLOAT> as an Arrow-batched pandas UDF."""
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        mat = provider.embed_batch(texts.fillna("").tolist())
        return pd.Series(list(mat))

    return _embed(F.col(text_col) if isinstance(text_col, str) else text_col)


def auto_embed(
    df: DataFrame,
    provider,
    text_col: str = "text",
    vector_col: str = "vector",
    flag_col: str | None = None,
) -> DataFrame:
    """Auto-embed rule (document.go:55-68): embed iff the embedding flag
    is set and the vector is absent; otherwise keep the given vector."""
    cond = F.col(vector_col).isNull() | (F.size(vector_col) == 0)
    # NULL text is un-embeddable: the vector stays NULL (and ingest
    # rejects vectorless docs) instead of silently embedding "" — every
    # NULL doc would otherwise share one constant vector
    cond = cond & F.col(text_col).isNotNull()
    if flag_col is not None:
        cond = cond & (F.col(flag_col) == F.lit("true"))
    return df.withColumn(
        vector_col, F.when(cond, embed_column(provider, text_col)).otherwise(F.col(vector_col))
    )
