"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Every operator here is deterministic and built from md5-derived integer
hashes that DuckDB reproduces bit-for-bit, so even the MinHash/SimHash
paths are hash-match oracle-able (rare for LSH implementations).

Scale design:
- exact_dedup: hash-groupBy on a 60-bit fingerprint — one shuffle of
  (hash, id), never the text.
- minhash: signatures are per-row Column expressions (no shuffle);
  LSH candidate generation explodes b band keys per doc and self-joins
  on the band key — the join is equi-key and AQE-skew-handled; the
  verify step computes exact Jaccard ONLY on candidates.
- ngram_jaccard_pairs: inverted-index join on shingle hash (the
  all-pairs-without-crossjoin pattern): |A∩B| from the join, |A∪B| from
  set sizes.
- simhash: 48 single-pass conditional aggregates — no row blowup.
- embedding near-dup: exact pairwise over an LSH/IVF-bucketed candidate
  set; the brute variant is for oracle checks at small SF.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oasisdb_spark.functions.distance import vector_indexable
from oasisdb_spark.pipeline.text import char_hash60, normalize_text, tokens

__all__ = [
    "MINHASH_K", "MINHASH_BANDS", "MINHASH_P", "MINHASH_H32",
    "minhash_coeffs", "shingles", "shingle_hashes", "minhash_signature",
    "shingle_minhash_frame", "minhash_lsh_dedup",
    "exact_dedup_groups", "minhash_candidate_pairs", "jaccard_pairs",
    "jaccard_pairs_prefix",
    "simhash_expr", "embedding_neardup_pairs", "allpairs_cosine_blocked",
    "duplicate_substring_positions", "duplicate_substring_stats",
    "scrub_duplicate_substrings",
]

MINHASH_K = 32          # signature length
MINHASH_BANDS = 8       # 8 bands x 4 rows


def _band_rows(k: int, bands: int) -> int:
    """rows-per-band for LSH banding, validated loudly: bands must
    divide k exactly, else the trailing k − (k//bands)·bands signature
    values would be computed but never banded — silently changing the
    b-band collision probability the caller tuned for."""
    if bands < 1 or k < 1:
        raise ValueError(f"minhash banding: k and bands must be >= 1, got k={k}, bands={bands}")
    if k % bands != 0:
        raise ValueError(
            f"minhash banding: bands={bands} does not divide k={k}; "
            f"{k - (k // bands) * bands} signature values would be "
            "silently ignored — pick bands dividing k"
        )
    return k // bands
MINHASH_P = 4294967311  # prime > 2^32; a*h32+b stays < 2^63
MINHASH_H32 = 2147483647  # base hashes reduced mod 2^31-1


def minhash_coeffs(k: int = MINHASH_K) -> tuple[list[int], list[int]]:
    """Deterministic LCG-derived (a, b) coefficient lists — shared by the
    Spark impl and the generated DuckDB oracle SQL."""
    a = [((1103515245 * (i + 1) + 12345) % MINHASH_H32) or 1 for i in range(k)]
    b = [(1103515245 * (i + 101) + 54321) % MINHASH_H32 for i in range(k)]
    return a, b


def shingles(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of the token stream (space-joined), distinct.
    Docs shorter than n tokens yield their full token-join as 1 shingle.

    Grams build by zipping n shifted slices — O(n_tokens) total. The
    previous per-index `slice(t, i, n)` inside a transform lambda
    re-evaluated `t` per element; with `t` the unmaterialized
    tokens(text) expression that re-tokenized the document once per
    shingle — O(n²) regex work (the text.py _distinct_ngrams lesson).
    Same space-joined grams in the same positional order, so the
    array_distinct first-occurrence order is unchanged."""
    t = tokens(c)
    sz = F.size(t)
    full = F.array(F.concat_ws(" ", t))
    cnt = F.greatest(sz - (n - 1), F.lit(0))
    grams = F.slice(t, n, cnt)
    for j in range(n - 1, 0, -1):
        grams = F.zip_with(
            F.slice(t, j, cnt), grams, lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.array_distinct(F.when(sz >= n, grams).otherwise(full))


def shingle_hashes(c: Column | str, n: int = 3) -> Column:
    """Distinct 31-bit shingle hashes (md5-derived, cross-engine)."""
    return F.array_distinct(
        F.transform(
            shingles(c, n),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % MINHASH_H32,
        )
    )


def minhash_signature_expr(c: Column | str, n: int = 3, k: int = MINHASH_K) -> Column:
    """MinHash as a pure Column expression. Semantically identical to
    ``minhash_signature`` but ~9x slower: Catalyst evaluates nested
    higher-order lambdas interpreted and re-evaluates the md5-per-shingle
    subtree per hash function (no CSE across lambda scopes). Kept as the
    executable spec; the pandas UDF below is the production path."""
    a, b = minhash_coeffs(k)
    hashes = shingle_hashes(c, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                hashes,
                lambda h: (F.element_at(F.lit(a), i + 1) * h + F.element_at(F.lit(b), i + 1))
                % F.lit(MINHASH_P),
            )
        ),
    )


def minhash_signature(c: Column | str, n: int = 3, k: int = MINHASH_K) -> Column:
    """MinHash signature: sig[i] = min over shingles of (a_i*h+b_i) mod P.

    Arrow-batched pandas UDF computing the EXACT same integers as
    ``minhash_signature_expr`` (same md5-derived shingle hashes, same
    int64 arithmetic — verified element-equal), with the (k x n_shingles)
    min computed as one numpy broadcast per doc. Integer math has no
    float-order hazard, so this stays hash-match oracle-able."""
    a, b = minhash_coeffs(k)
    A = np.array(a, dtype=np.int64)[:, None]
    B = np.array(b, dtype=np.int64)[:, None]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _mh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [x for x in re.split("[^a-z0-9]+", (t or "").lower()) if x]
            if len(toks) >= n:
                sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            else:
                sh = {" ".join(toks)}
            hs = np.array(
                [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_H32 for s in sh],
                dtype=np.int64,
            )
            out.append(((A * hs[None, :] + B) % MINHASH_P).min(axis=1).tolist())
        return pd.Series(out)

    return _mh(F.col(c) if isinstance(c, str) else c)


def shingle_minhash_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
) -> DataFrame:
    """One fused Arrow pass producing BOTH the distinct shingle-hash set
    and the MinHash signature: (doc_id, hs ARRAY<LONG>, sig ARRAY<LONG>).

    This is the production entry for LSH dedup: the expression twins
    (``shingle_hashes`` / ``minhash_signature_expr``) re-evaluate the
    tokenize→shingle→md5 subtree per lambda scope (interpreted, no CSE),
    so computing hs and sig separately costs ~4 full text passes; here
    the text is shingled and hashed exactly once per doc. Integers are
    identical to the expression path (same md5-derived 31-bit hashes,
    same int64 LCG arithmetic), so DuckDB oracles still hash-match."""
    # corpus-membership contract: a NULL id cannot name a pair endpoint
    # and NULL text has no shingles — excluded on both engine sides
    # (the oracle's non-null toks CTE mirrors this); a Python kernel
    # would otherwise hash NULL as "" and pair every NULL doc together
    df = df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    a, b = minhash_coeffs(k)
    A = np.array(a, dtype=np.int64)[:, None]
    B = np.array(b, dtype=np.int64)[:, None]

    @F.pandas_udf("hs: array<bigint>, sig: array<bigint>")
    def _both(texts: pd.Series) -> pd.DataFrame:
        hs_out, sig_out = [], []
        for t in texts:
            toks = [x for x in re.split("[^a-z0-9]+", (t or "").lower()) if x]
            if len(toks) >= n:
                sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            else:
                sh = {" ".join(toks)}
            hs = np.unique(np.array(
                [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_H32 for s in sh],
                dtype=np.int64,
            ))
            hs_out.append(hs.tolist())
            sig_out.append(((A * hs[None, :] + B) % MINHASH_P).min(axis=1).tolist())
        return pd.DataFrame({"hs": hs_out, "sig": sig_out})

    c = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"), _both(c).alias("_sm")
    ).select("doc_id", F.col("_sm.hs").alias("hs"), F.col("_sm.sig").alias("sig"))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.5,
    eager: bool = False,
) -> DataFrame:
    """Full MinHash-LSH dedup pipeline: shingle+sign once (persisted),
    band the signatures, self-join band keys for candidates, verify with
    exact Jaccard over the stored hash sets. Output: (doc_a, doc_b,
    jaccard) with jaccard >= threshold.

    Scale shape: one corpus scan + one Python pass; the only shuffles
    are the (tiny) banded self-join and the two candidate joins, which
    AQE broadcasts. Nothing recomputes the text pipeline twice.

    base is persisted AND eagerly materialized: the downstream DAG scans
    it from three join sides, and broadcast-build sides start before a
    lazily-persisted cache fills — each racing scan would re-run the
    whole Python pass.

    eager=True: materialize the (tiny) pair result into a persisted
    frame and UNPERSIST the signature cache before returning. The
    default lazy mode must keep the signature frame pinned (the caller's
    downstream plan scans it three times), so each call leaks one cached
    corpus-scale frame until session end — the round-2 bench showed the
    accumulated caches slowing unrelated queries in a long session. Use
    eager mode whenever the pairs are consumed more than once or the
    caller outlives the call (memoized entries, services)."""
    r = _band_rows(k, bands)
    base = shingle_minhash_frame(df, id_col, text_col, n, k).persist()
    base.count()
    banded = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.md5(F.concat_ws(",", F.transform(F.slice("sig", j * r + 1, r), lambda x: x.cast("string")))),
            )
        ).alias("band_idx", "band_key"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    h = base.select("doc_id", "hs")
    joined = (
        cand
        .join(h.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")), on="doc_a")
        .join(h.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")), on="doc_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
    )
    out = (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double") / (F.size("hs_a") + F.size("hs_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if eager:
        out = out.persist()
        out.count()
        base.unpersist()
    return out


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one row per
    distinct content, keeping the smallest id (the canonical doc), plus
    the duplicate count. Output: (keep_id, n_dups, fingerprint)."""
    fp = char_hash60(normalize_text(text_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups", "fingerprint")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """LSH banding: docs sharing any band of their signature become a
    candidate pair. Output: (doc_a, doc_b) distinct, doc_a < doc_b.

    The banded frame (doc_id, band_idx, band_key — tiny relative to the
    corpus) is persisted AND eagerly materialized before the self-join:
    a broadcast-build side starts scanning before a lazily-persisted
    cache fills, which would re-evaluate the whole signature plan —
    i.e. re-MinHash the corpus — a second time (the minhash_lsh_dedup
    race, fixed the same way). The cache stays pinned for the caller's
    downstream DAG — the documented lazy-mode trade."""
    r = _band_rows(k, bands)
    sig = df.select(
        F.col(id_col).alias("doc_id"), minhash_signature(text_col, n, k).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.md5(F.concat_ws(",", F.transform(F.slice("sig", j * r + 1, r), lambda x: x.cast("string")))),
            )
        ).alias("band_idx", "band_key"),
    ).persist()
    banded.count()
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """Exact shingle-set Jaccard similarity. Two physical strategies,
    same semantics (hash-set intersection over union):

    - candidates given (the LSH verify step): join each side's shingle-
      hash ARRAY onto the candidate pairs (two equi-joins on doc id —
      AQE broadcasts the small candidate side) and intersect per pair
      with ``array_intersect``. Work is O(|candidates|), never all-pairs.
    - no candidates: inverted-index join on shingle hash (the all-pairs-
      without-crossjoin pattern): |A∩B| from the equi-join, |A∪B| from
      set sizes. Output: (doc_a, doc_b, jaccard).

    max_doc_freq (inverted-index path only): drop shingles appearing in
    more than this many documents BEFORE the self-join. A shingle in f
    docs contributes f² join rows — boilerplate shingles ("all rights
    reserved …") are the skew that kills the all-pairs join at corpus
    scale. Capping df is the standard mitigation; pairs sharing ONLY
    capped shingles are missed (they are overwhelmingly non-duplicates).
    The default is CAPPED at 256 so the scale-safe plan is opt-out, not
    opt-in — pass None explicitly for the exact uncapped join (only
    defensible at oracle scale, or after the MinHash-LSH pipeline whose
    banding is frequency-insensitive)."""
    # corpus-membership contract: a NULL id cannot name a pair endpoint
    # and NULL text has no shingles — excluded on both engine sides
    # (the oracle's non-null toks CTE mirrors this); a Python kernel
    # would otherwise hash NULL as "" and pair every NULL doc together
    df = df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    if candidates is not None:
        h = df.select(F.col(id_col).alias("doc_id"), shingle_hashes(text_col, n).alias("hs"))
        joined = (
            candidates
            .join(h.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")), on="doc_a")
            .join(h.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")), on="doc_b")
            .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        )
        out = joined.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        return out.filter(F.col("jaccard") >= threshold)
    sh = df.select(
        F.col(id_col).alias("doc_id"), F.explode(shingle_hashes(text_col, n)).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh")
        )
        # sizes stay FULL set sizes (true |A|,|B|); only the join input
        # is pruned, so jaccard is under- never over-estimated
        sh = sh.join(F.broadcast(hot), on="sh", how="left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 48


def simhash_expr(c: Column | str) -> Column:
    """48-bit SimHash over distinct token hashes: bit k is set when more
    token-hashes have bit k set than not.

    Arrow-batched pandas UDF (pure integer math — oracle-matchable);
    the bit-count matrix per doc is one numpy unpackbits-style broadcast
    instead of 48 interpreted fold expressions."""
    ks = np.arange(SIMHASH_BITS, dtype=np.int64)

    @F.pandas_udf(T.LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = {x for x in re.split("[^a-z0-9]+", (t or "").lower()) if x}
            if not toks:
                out.append(0)
                continue
            hs = np.array(
                [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in toks], dtype=np.int64
            )
            bits = (hs[:, None] >> ks[None, :]) & 1       # (n_tokens, 48)
            score = (2 * bits - 1).sum(axis=0)            # +1/-1 votes
            out.append(int(((score > 0).astype(np.int64) << ks).sum()))
        return pd.Series(out)

    return _sh(F.col(c) if isinstance(c, str) else c)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocking: DataFrame | None = None,
    eager: bool = False,
) -> DataFrame:
    """Embedding near-dup: pairs with cosine similarity >= threshold.
    Output: (doc_a, doc_b, cos_sim), rounded to 6dp.

    Physical strategies (both avoid the row-level theta join):
    - blocking given (LSH buckets / IVF cluster co-membership): the
      candidate pairs drive the plan — blocking → a → b equi-joins, so
      work is O(|blocking|); the N×N pair space is never formed.
    - no blocking: EXACT all-pairs via the blocked GEMM kernel
      (allpairs_cosine_blocked) — rows pack into ~block_size matrices,
      block pairs are enumerated and equi-joined (no CartesianProduct /
      BroadcastNestedLoopJoin anywhere in the plan), and each task does
      one float64 GEMM, emitting only above-threshold pairs. O(N²)
      compute distributed as (N/B)² balanced tasks — the correct shape
      for exact all-pairs; at corpus scale pass `blocking` instead."""
    from oasisdb_spark.functions.distance import cosine_distance

    # indexable-rows contract (the _emb_base convention): NULL ids
    # cannot name a pair endpoint, NULL vectors have no similarity
    # (and kill the GEMM packer inside np.asarray)
    pre = emb
    emb = emb.where(F.col(id_col).isNotNull() & vector_indexable(vec_col))

    if blocking is not None:
        a = emb.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
        b = emb.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
        # normalize candidate orientation BEFORE the vector joins: a
        # blocking table may emit (b,a), (a,a) or duplicate rows — keep
        # exactly the doc_a < doc_b triangle, once (round-2 advisory fix;
        # the no-blocking GEMM path enumerates the triangle by
        # construction)
        cand = (
            blocking.select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .filter(F.col("doc_a") < F.col("doc_b"))
            .distinct()
        )
        pairs = cand.join(a, on="doc_a").join(b, on="doc_b")
        sim = F.round(F.lit(1.0) - cosine_distance("va", "vb"), 6)
        return pairs.select("doc_a", "doc_b", sim.alias("cos_sim")).filter(
            F.col("cos_sim") >= threshold
        )
    # block-count UPPER BOUND from the pre-filter frame: a count with no
    # referenced columns is a near-free empty-projection scan (parquet
    # row-group counts), where counting the filtered frame would
    # deserialize every vector just to size the GEMM blocks (guide §1.2:
    # don't spend a full pass on a decision a bound settles — phantom
    # block ids from the overcount vanish in the inner block-pair join).
    # Counted ONLY on this GEMM path (round-13 advisory): the blocking
    # path never uses the hint, and its callers may pass an emb plan
    # whose full materialization is anything but near-free.
    n_hint = pre.count()
    return allpairs_cosine_blocked(
        emb, threshold, id_col=id_col, vec_col=vec_col, eager=eager, n_hint=n_hint
    )


def allpairs_cosine_blocked(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int | None = None,
    eager: bool = False,
    n_hint: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold as a blocked matrix product.

    Rows are packed into dense float64 blocks of <= block_size vectors
    (one applyInPandas per block); the (N/B)·(N/B+1)/2 block pairs are
    enumerated as a small DataFrame and equi-joined against the packed
    blocks twice, so every task computes one A @ Bᵀ GEMM and emits only
    the surviving pairs. No row-level pair is ever materialized through
    a shuffle, and the plan contains only equi-joins. This is the
    physical shape a BLAS cluster job would use. Sums run in float64
    through BLAS dgemm, whose blocked accumulation ORDER can differ
    from the SQL oracle's in-order fold in the last ulps (the knn_brute
    GEMM-twin contract) — identical pair sets after the 6dp rounding
    except for inputs sitting exactly on a rounding knife-edge, which
    real embeddings don't (test- and oracle-pinned on the fixture).

    ``eager=True`` materializes the (output-sized) pair frame and
    releases the packed-block cache before returning; the default lazy
    mode keeps the corpus-scale packed cache pinned for the caller's
    DAG — the minhash_lsh_dedup trade, documented there."""
    import numpy as np
    import pandas as pd

    import math

    spark = emb.sparkSession
    src = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec"))
    # n is only used to SIZE blocks and enumerate block-pair candidates,
    # so any upper bound works (see n_hint in embedding_neardup_pairs):
    # overcounted block ids simply find no packed row in the inner join.
    n = n_hint if n_hint is not None else src.count()
    if block_size is None:
        # auto-size: enough block pairs to occupy the cluster ((n/B)²/2
        # >= ~8 tasks/core), capped at 4096 so per-task GEMMs stay
        # cache-friendly and block payloads stay ~1 MB-scale
        par = max(spark.sparkContext.defaultParallelism, 1)
        block_size = min(4096, max(256, math.ceil(n / (4 * par))))
    # deterministic, dense block ids: order by doc_id (one window shuffle;
    # at cluster scale, substitute a pre-sorted/bucketed id → block map)
    from pyspark.sql import Window

    w = Window.orderBy("doc_id")
    blocked = src.withColumn("block_id", ((F.row_number().over(w) - 1) / block_size).cast("int"))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        # keep RAW float64 rows + norms: sims are computed dot/(na*nb),
        # the same formula as the SQL oracle (normalize-then-dot would
        # drift more ulps than the final division does)
        mat = np.array(pdf["vec"].tolist(), dtype=np.float64)
        return pd.DataFrame(
            {
                "block_id": [int(pdf["block_id"].iloc[0])],
                "ids": [pdf["doc_id"].tolist()],
                "mat": [mat.tobytes()],
                "norms": [np.linalg.norm(mat, axis=1).tolist()],
                "n": [len(pdf)],
                "dim": [mat.shape[1]],
            }
        )

    packed = blocked.groupBy("block_id").applyInPandas(
        _pack, "block_id INT, ids ARRAY<BIGINT>, mat BINARY, norms ARRAY<DOUBLE>, n INT, dim INT"
    ).persist()
    # block ids are dense 0..ceil(n_rows/B)-1 by construction (row_number),
    # so the candidate grid is pure arithmetic — no blocking job to count
    # the packed frame (guide §1.2: remove whole passes first). With an
    # n_hint upper bound the tail candidates are phantoms the inner join
    # drops; the pack stage itself first runs inside the final job's
    # broadcast build. The round-13 advisory's concern — two broadcast
    # builds racing a lazily-filled cache could run the pack stage
    # twice — was tried as an eager localCheckpoint and MEASURED WORSE
    # (embedding_neardup 0.88 -> 1.31-1.54 s at sf0.1): the extra
    # blocking materialization job costs more than the occasional
    # duplicated pack, which is bounded by one broadcast build and
    # deterministic either way. Lazy persist kept, now with lifecycle.
    n_blocks = max(math.ceil(n / block_size), 0)
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi INT, bj INT"
    ) if n_blocks else spark.createDataFrame([], "bi INT, bj INT")
    joined = (
        pairs.join(packed.select(
            F.col("block_id").alias("bi"), F.col("ids").alias("ids_a"),
            F.col("mat").alias("mat_a"), F.col("norms").alias("norms_a"),
            F.col("n").alias("n_a"), F.col("dim").alias("dim_a"),
        ), on="bi")
        .join(packed.select(
            F.col("block_id").alias("bj"), F.col("ids").alias("ids_b"),
            F.col("mat").alias("mat_b"), F.col("norms").alias("norms_b"),
            F.col("n").alias("n_b"), F.col("dim").alias("dim_b"),
        ), on="bj")
    )

    def _gemm(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                a = np.frombuffer(row["mat_a"], dtype=np.float64).reshape(row["n_a"], row["dim_a"])
                b = np.frombuffer(row["mat_b"], dtype=np.float64).reshape(row["n_b"], row["dim_b"])
                ids_a = np.asarray(row["ids_a"], dtype=np.int64)
                ids_b = np.asarray(row["ids_b"], dtype=np.int64)
                na = np.asarray(row["norms_a"], dtype=np.float64)
                nb = np.asarray(row["norms_b"], dtype=np.float64)
                denom = np.outer(np.where(na == 0, 1.0, na), np.where(nb == 0, 1.0, nb))
                sims = (a @ b.T) / denom
                # zero-norm vectors: cosine undefined -> sim 0 (oracle CASE)
                if (na == 0).any():
                    sims[na == 0, :] = 0.0
                if (nb == 0).any():
                    sims[:, nb == 0] = 0.0
                sims = np.round(sims, 6)
                ia, ib = np.nonzero(sims >= threshold)
                if len(ia) == 0:
                    continue
                da, db = ids_a[ia], ids_b[ib]
                # blocks are id-ordered, so cross-block pairs already
                # satisfy da < db; the diagonal block needs the triangle
                keep = da < db
                outs.append(pd.DataFrame({
                    "doc_a": da[keep], "doc_b": db[keep], "cos_sim": sims[ia, ib][keep],
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    from oasisdb_spark.ckpt import track_persist

    out = joined.mapInPandas(_gemm, "doc_a BIGINT, doc_b BIGINT, cos_sim DOUBLE")
    if eager:
        out = out.persist()
        out.count()
        packed.unpersist()
        track_persist(out)  # released by the harness between queries
        return out
    # lazy path: the packed-block cache stays pinned for the caller's
    # DAG and releases at the harness's next between-queries point
    # (OPTIMIZATION r13, guide §5: unpersist when done; previously the
    # cache leaked per call)
    track_persist(packed)
    return out


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    parallelism: int | None = None,
    eager: bool = False,
) -> DataFrame:
    """EXACT shingle-set Jaccard >= threshold via ppjoin-style prefix
    filtering (Bayardo et al. WWW'07 all-pairs; Xiao et al. WWW'08
    ppjoin — public): the scale path that needs NO df cap.

    Candidate generation: each document's distinct shingle hashes are
    ordered by ONE global total order (document frequency asc, then
    hash — rarest first); for J(A, B) >= t the overlap is at least
    ceil(t*|X|) on each side, so the first |X| - ceil(t*|X|) + 1
    shingles of BOTH documents must share an element (prefix-filter
    lemma), and a size filter t*|A| <= |B| prunes the rest. Join
    buckets are keyed by documents' RAREST shingles — boilerplate
    ("all rights reserved ...") has maximal df, lands at the END of
    every prefix order, and never keys a bucket, which is exactly the
    hot-shingle skew the inverted-index path's max_doc_freq cap exists
    to suppress — but the cap is LOSSY (pairs sharing only hot
    shingles are dropped) while the prefix is not.

    Verification is the jaccard_pairs(candidates=...) arithmetic (two
    id joins + array_intersect per surviving pair) over the SAME
    persisted shingle frame the prefix derives from. At t = 0.5 the
    prefix is half the document; higher thresholds shrink it (t = 0.9
    -> 10%).

    The shingle-hash projection (md5 per shingle) is the single most
    expensive stage and the DAG references it from three join sides, so
    it is computed ONCE into a persisted frame (round-4 profile at
    sf0.1: the un-persisted plan re-derived it 3-4x and a single pass
    was 7.4 s on one input split — together ~10.9 s/call; persisted +
    repartitioned it is ~3 s). ``parallelism`` spreads the cheap
    pre-shingle rows when the corpus arrives in fewer splits than cores
    (same rationale as bigram_lm / duplicate_substring_positions; at
    warehouse scale splits are plentiful — leave None). ``eager=True``
    materializes the (tiny) pair result and releases the shingle cache
    before returning — the default lazy mode keeps it pinned for the
    caller's DAG, leaking one corpus-scale cached frame per call (the
    minhash_lsh_dedup trade, documented there). In eager mode the PAIR
    frame itself stays persisted for the caller (it is output-sized —
    pairs above threshold, KBs not corpus-scale); unpersist it when
    done if calling in a loop.
    """
    # corpus-membership contract: a NULL id cannot name a pair endpoint
    # and NULL text has no shingles — excluded on both engine sides
    # (the oracle's non-null toks CTE mirrors this); a Python kernel
    # would otherwise hash NULL as "" and pair every NULL doc together
    df = df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    if parallelism:
        df = df.repartition(parallelism)
    h = df.select(F.col(id_col).alias("doc_id"), shingle_hashes(text_col, n).alias("hs")).persist()
    h.count()
    sh = h.select("doc_id", F.size("hs").alias("sz"), F.explode("hs").alias("sh"))
    df_tbl = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("doc_id").orderBy("_df", "sh")
    # candidate-side thresholds subtract an epsilon before ceil/compare:
    # float products can overshoot an exact integer (0.07 * 100 =
    # 7.000000000000001), which would shorten the lemma-required prefix
    # by one element / reject a legitimate size pair — silently LOSING
    # true pairs. The epsilon only errs in the safe direction (a few
    # extra candidates; the exact verify below kills false ones).
    eps = 1e-9
    prefix = (
        sh.join(df_tbl, on="sh")
        .withColumn("_r", F.row_number().over(w))
        .filter(
            F.col("_r")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(eps)) + 1
        )
        .select("doc_id", "sz", "sh")
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("_sza"), "sh"
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("_szb"), "sh"
    )
    cand = (
        a.join(b, on="sh")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("_szb") * F.lit(threshold) - F.lit(eps) <= F.col("_sza"))
            & (F.col("_sza") * F.lit(threshold) - F.lit(eps) <= F.col("_szb"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    joined = (
        cand
        .join(h.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")), on="doc_a")
        .join(h.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")), on="doc_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
    )
    out = joined.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("inter").cast("double")
            / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    if eager:
        out = out.persist()
        out.count()
        h.unpersist()
    return out


def _gram_key(hash_grams: bool | str):
    """Shuffle key for an L-gram: False -> the exact string; True ->
    64-bit xxhash64; 'wide' -> two-salt 128-bit struct (both halves are
    JVM-side whole-stage-codegen expressions; a struct of two longs
    group-bys and joins like any composite key)."""
    if hash_grams == "wide":
        return F.struct(
            F.xxhash64("gram").alias("h1"),
            F.xxhash64(F.lit(1), F.col("gram")).alias("h2"),
        )
    if hash_grams:
        return F.xxhash64("gram")
    return F.col("gram")


def duplicate_substring_positions(
    df: DataFrame,
    min_length: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hash_grams: bool | str = True,
    parallelism: int | None = None,
) -> DataFrame:
    """ExactSubstr duplicated-span detection (Lee et al., ACL 2022,
    "Deduplicating Training Data Makes Language Models Better" — public;
    their suffix-array ExactSubstr tool, re-expressed as three Spark
    shuffles): every maximal character span covered by some
    ``min_length``-gram that occurs >= ``min_count`` times ANYWHERE in
    the corpus (across documents or repeated within one).

    Returns one row per merged span: (doc_id, span_start, span_end),
    1-based inclusive character positions. A duplicated substring of
    length m >= L contributes all m - L + 1 of its L-gram start
    positions; overlapping/adjacent windows are merged by an
    islands-and-gaps window pass, so the output spans are exactly the
    maximal duplicated regions — equivalent to the suffix-array
    formulation without ever materializing a global sorted order.

    Scale design (the 100 TB plan — no suffix array needed):
    - gram generation is a per-row Column expression
      (transform(sequence) + posexplode): no shuffle, no Python.
    - duplicate detection is ONE partial-agg shuffle keyed by the gram
      (map-side combine collapses within-partition repeats first).
    - the position join-back is a left-semi equi-join on the same key
      (AQE handles hot grams — corpus-wide boilerplate — by splitting
      skewed partitions; the dup set it joins against is tiny because
      HAVING count >= min_count already collapsed it to distinct grams).
    - span merging is one window pass partitioned by doc_id: state is
      O(positions-in-dup-grams per doc), never the text.
    - ``hash_grams=True`` (the DEFAULT since the sf1 scale smoke:
      measured 3.54 s vs 4.51 s at a 10x sf0.1 corpus, and the gap
      widens as the gram shuffle dominates — scripts/scale_smoke_sf1.py)
      shuffles xxhash64(gram) (8 bytes) instead of the L-char gram
      string (~L bytes): ~L/8x less shuffle IO. A 64-bit key is exact
      up to collisions: expected colliding gram PAIRS ~ n^2/2^65, i.e.
      ~0.03 at n=1e9 distinct grams but ~27,000 at n=1e12 and ~2.7e6
      at n=1e13 — the 100 TB regime, where each collision is a
      potential silent false duplicate span handed to the scrubber.
    - ``hash_grams='wide'`` is the 100 TB default-of-choice: a TWO-SALT
      128-bit gram key, struct(xxhash64(gram), xxhash64(1, gram)) —
      16 bytes shuffled (still ~L/16x below strings), with expected
      colliding pairs ~ n^2/2^129 ~ 1.5e-15 even at n=1e12 (SCALING.md
      has the table). ``hash_grams=False`` shuffles the exact gram
      string — unconditional; the driver's oracle entry pins it so the
      hash match stays assumption-free.

    Reference parity: the reference engine has no corpus-dedup surface
    (SURVEY §2.4); this extends the dedup family alongside MinHash/
    SimHash/Jaccard per the training-pipeline mandate.
    """
    L = int(min_length)
    if L < 2:
        raise ValueError("min_length must be >= 2")
    if parallelism:
        # Gram generation multiplies each text row ~len(text)-fold and is
        # the CPU-heavy stage; when the input arrives in fewer splits than
        # cores (one small parquet file), spreading the CHEAP pre-explode
        # rows costs a tiny text shuffle and parallelizes the expensive
        # part. At warehouse scale input splits are plentiful — leave None.
        df = df.repartition(parallelism)
    grams = (
        df.filter(F.length(text_col) >= L)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {L} + 1),"
                    f" i -> substring({text_col}, i, {L}))"
                )
            ).alias("off", "gram"),
        )
        .select(
            "doc_id",
            (F.col("off") + 1).cast("long").alias("pos"),
            _gram_key(hash_grams).alias("gkey"),
        )
    )
    dup = grams.groupBy("gkey").agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") >= int(min_count)
    ).select("gkey")
    hits = grams.join(dup, on="gkey", how="left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(w) <= L, F.lit(0)).otherwise(F.lit(1)),
    )
    grouped = flagged.withColumn("_grp", F.sum("_new").over(w))
    return grouped.groupBy("doc_id", "_grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + L - 1).alias("span_end"),
    ).select("doc_id", "span_start", "span_end")


def duplicate_substring_stats(
    df: DataFrame,
    min_length: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hash_grams: bool | str = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document duplicated-span statistics over
    duplicate_substring_positions: (doc_id, doc_len, dup_chars,
    dup_spans, dup_ratio) for EVERY input document (0s for clean docs).
    dup_ratio == 1.0 flags exact/near-exact duplicate documents;
    mid-range ratios flag template boilerplate — the two standard
    ExactSubstr filter axes. The span aggregate is doc-count-sized, so
    the final join back to the corpus broadcasts."""
    spans = duplicate_substring_positions(
        df, min_length=min_length, id_col=id_col, text_col=text_col,
        min_count=min_count, hash_grams=hash_grams, parallelism=parallelism,
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("_dc"),
        F.count(F.lit(1)).alias("_ns"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.length(text_col).cast("long").alias("doc_len"))
        .join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            "doc_len",
            F.coalesce("_dc", F.lit(0)).cast("long").alias("dup_chars"),
            F.coalesce("_ns", F.lit(0)).cast("long").alias("dup_spans"),
            # zero-length docs are clean by definition: 0.0, not 0/0 =
            # NULL (which a `dup_ratio < x` gate would silently drop)
            F.when(F.col("doc_len") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("_dc", F.lit(0)).cast("double") / F.col("doc_len")
            )
            .alias("dup_ratio"),
        )
    )


def scrub_duplicate_substrings(
    df: DataFrame,
    min_length: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hash_grams: bool | str = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Remove every duplicated span (ALL copies, the ExactSubstr paper's
    policy) from the text, keeping the segments between spans. The cut
    is a pure higher-order-function fold over the per-doc sorted span
    list — no Python in the path: collect_list is bounded by spans per
    document (small by construction: spans are maximal and disjoint),
    and the fold runs inside codegen. Output: (doc_id, text) with the
    scrubbed text; clean documents pass through unchanged."""
    spans = duplicate_substring_positions(
        df, min_length=min_length, id_col=id_col, text_col=text_col,
        min_count=min_count, hash_grams=hash_grams, parallelism=parallelism,
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e")))
        ).alias("_spans")
    )
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    cut = (
        "aggregate(_spans,"
        " struct(CAST(1 AS BIGINT) AS cur, '' AS acc),"
        " (a, sp) -> struct(sp.e + CAST(1 AS BIGINT) AS cur,"
        "   concat(a.acc, substring(_text, CAST(a.cur AS INT), CAST(sp.s - a.cur AS INT))) AS acc),"
        " a -> concat(a.acc, substring(_text, CAST(a.cur AS INT), length(_text))))"
    )
    return (
        base.join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.when(F.col("_spans").isNull(), F.col("_text"))
            .otherwise(F.expr(cut))
            .alias("text"),
        )
    )
