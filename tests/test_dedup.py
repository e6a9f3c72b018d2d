"""Dedup operators: exact, minhash LSH, jaccard verify, simhash,
embedding near-dup — on constructed duplicates + the documents fixture."""

from pyspark.sql import functions as F

from oasisdb_spark.pipeline.dedup import (
    embedding_neardup_pairs,
    exact_dedup_groups,
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_signature,
    simhash_expr,
)


def _docs_with_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    near = "the quick brown fox jumps over the lazy dog and runs far away into the forest"
    other = "completely different content about spark dataframes and distributed query engines"
    rows = [
        (1, base),
        (2, base.upper()),        # exact dup after normalization
        (3, near),                # near dup (1 word differs)
        (4, other),
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_exact_dedup(spark):
    groups = exact_dedup_groups(_docs_with_dups(spark)).collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in groups}
    assert by_keep[1] == 2       # docs 1+2 collapse
    assert by_keep[3] == 1 and by_keep[4] == 1 and by_keep[5] == 1


def test_minhash_udf_matches_expression_spec(spark, documents):
    """The production pandas-UDF minhash must produce the EXACT integers
    of the Column-expression spec (same md5, same int64 arithmetic)."""
    from oasisdb_spark.pipeline.dedup import minhash_signature_expr

    sample = documents.limit(25)
    fast = {r["doc_id"]: r["s"] for r in sample.select("doc_id", minhash_signature("text").alias("s")).collect()}
    spec = {r["doc_id"]: r["s"] for r in sample.select("doc_id", minhash_signature_expr("text").alias("s")).collect()}
    assert fast == spec


def test_minhash_identical_signatures(spark):
    df = _docs_with_dups(spark)
    sigs = {r["doc_id"]: r["sig"] for r in df.select("doc_id", minhash_signature("text").alias("sig")).collect()}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 32
    # near-dup shares most minima, different doc shares few
    shared_near = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    shared_far = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert shared_near > shared_far


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(_docs_with_dups(spark)).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup caught by some band
    assert (1, 4) not in pairs


def test_jaccard_verify(spark):
    df = _docs_with_dups(spark)
    cand = minhash_candidate_pairs(df)
    verified = jaccard_pairs(df, threshold=0.5, candidates=cand).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0


def test_simhash_close_for_near_dups(spark):
    df = _docs_with_dups(spark)
    sh = {r["doc_id"]: r["sh"] for r in df.select("doc_id", simhash_expr("text").alias("sh")).collect()}
    assert sh[1] == sh[2]
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[4])


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    pairs = {(r["doc_a"], r["doc_b"]) for r in embedding_neardup_pairs(emb, threshold=0.99).collect()}
    assert pairs == {(1, 2)}


def test_allpairs_cosine_blocked_multiblock(spark):
    """Blocked GEMM with block_size smaller than the table: cross-block
    and diagonal-block pairs both surface, each exactly once, and match
    a numpy reference."""
    import numpy as np

    from oasisdb_spark.pipeline.dedup import allpairs_cosine_blocked

    rng = np.random.default_rng(9)
    X = rng.standard_normal((37, 8)).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    got = {(r["doc_a"], r["doc_b"]): r["cos_sim"]
           for r in allpairs_cosine_blocked(emb, threshold=0.3, block_size=10).collect()}
    Xd = X.astype(np.float64)
    S = (Xd @ Xd.T) / np.outer(np.linalg.norm(Xd, axis=1), np.linalg.norm(Xd, axis=1))
    want = {}
    for i in range(len(X)):
        for j in range(i + 1, len(X)):
            s = round(S[i, j], 6)
            if s >= 0.3:
                want[(i, j)] = s
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_embedding_neardup_blocking_first(spark):
    """blocking given => the plan is driven by the candidate pairs (two
    equi-joins); no CartesianProduct / BroadcastNestedLoopJoin."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.999, 0.01]),
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    blocking = spark.createDataFrame([(1, 2), (3, 4)], "doc_a BIGINT, doc_b BIGINT")
    res = embedding_neardup_pairs(emb, threshold=0.99, blocking=blocking)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert {(r["doc_a"], r["doc_b"]) for r in res.collect()} == {(1, 2), (3, 4)}


def test_jaccard_max_doc_freq_prunes_hot_shingles(spark):
    """Hot-shingle cap: pairs sharing only a boilerplate shingle vanish;
    genuinely-similar pairs keep their exact jaccard (sizes stay full)."""
    from pyspark.sql import functions as F

    from oasisdb_spark.pipeline.dedup import jaccard_pairs

    boiler = "all rights reserved forever"
    rows = [
        (0, f"alpha beta gamma delta epsilon {boiler}"),
        (1, f"alpha beta gamma delta epsilon {boiler}"),   # true dup of 0
        (2, f"unrelated text one two three {boiler}"),
        (3, f"totally different words here now {boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    uncapped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in jaccard_pairs(df, threshold=0.0).collect()}
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in jaccard_pairs(df, threshold=0.0, max_doc_freq=3).collect()}
    assert uncapped[(0, 1)] == 1.0
    # 0/1 also share the pruned boilerplate shingles, so their capped
    # jaccard UNDER-estimates (5 of 7 shingles survive, sizes stay 7):
    # 5 / (7 + 7 - 5) = 5/9 — never over-estimates, pair still surfaces.
    assert (0, 1) in capped and abs(capped[(0, 1)] - 5 / 9) < 1e-4
    # 2 and 3 share ONLY capped boilerplate shingles -> pair disappears
    assert (2, 3) in uncapped and (2, 3) not in capped


class TestJaccardPrefix:
    def test_equals_uncapped_inverted_index(self, spark, documents):
        from oasisdb_spark.pipeline.dedup import jaccard_pairs, jaccard_pairs_prefix

        got = sorted(map(tuple, jaccard_pairs_prefix(documents, threshold=0.5).collect()))
        want = sorted(map(tuple,
                          jaccard_pairs(documents, threshold=0.5, max_doc_freq=None).collect()))
        assert got == want and want  # non-trivial fixture

    def test_finds_pairs_the_df_cap_drops(self, spark):
        """Docs sharing ONLY a hot boilerplate shingle set: the capped
        inverted index misses them; the prefix filter must not."""
        from oasisdb_spark.pipeline.dedup import jaccard_pairs, jaccard_pairs_prefix

        boiler = "all rights reserved contact the owner for permission"
        rows = [(i, f"{boiler}") for i in range(40)]          # identical hot docs
        rows += [(100 + i, f"unique text number {i} entirely fresh words {i}") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        capped = jaccard_pairs(df, threshold=0.9, max_doc_freq=5)
        exact = jaccard_pairs_prefix(df, threshold=0.9)
        assert capped.count() == 0                    # cap drops every hot pair
        assert exact.count() == 40 * 39 // 2          # prefix filter keeps them

    def test_threshold_monotone(self, spark, documents):
        from oasisdb_spark.pipeline.dedup import jaccard_pairs_prefix

        lo = jaccard_pairs_prefix(documents, threshold=0.3).count()
        hi = jaccard_pairs_prefix(documents, threshold=0.7).count()
        assert hi <= lo


def test_jaccard_prefix_float_threshold_boundary(spark):
    """r07 review: float products that overshoot an exact integer
    (0.07 * 100 = 7.000000000000001) must not shorten the prefix or
    reject legitimate size pairs — boundary pairs survive."""
    from oasisdb_spark.pipeline.dedup import jaccard_pairs_prefix

    # doc A: 7 tokens, all shared with doc B's 100 tokens.
    # |A ∩ B| = 7, |A ∪ B| = 100 -> J = 0.07 exactly; the old float
    # size filter (0.07 * 100 <= 7 evaluates FALSE) dropped the pair.
    shared = [f"tok{i}" for i in range(7)]
    filler = [f"fill{i}" for i in range(93)]
    rows = [
        (1, " ".join(shared)),
        (2, " ".join(shared + filler)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = jaccard_pairs_prefix(df, threshold=0.07, n=1).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out] == [(1, 2, 0.07)]


def test_minhash_bands_must_divide_k(spark):
    """r07 review: bands not dividing k silently dropped trailing
    signature values — now a loud ValueError."""
    import pytest

    from oasisdb_spark.pipeline.dedup import minhash_candidate_pairs, minhash_lsh_dedup

    df = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="does not divide"):
        minhash_candidate_pairs(df, k=32, bands=5)
    with pytest.raises(ValueError, match="does not divide"):
        minhash_lsh_dedup(df, k=32, bands=5)


def test_substring_stats_zero_length_doc_ratio_zero(spark):
    """r07 review: empty docs report dup_ratio 0.0, never NULL (a
    `dup_ratio < x` gate must keep them)."""
    from oasisdb_spark.pipeline.dedup import duplicate_substring_stats

    long_dup = "x" * 40
    rows = [(1, ""), (2, long_dup + "a"), (3, long_dup + "b")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in duplicate_substring_stats(df, min_length=30).collect()}
    assert out[1]["doc_len"] == 0 and out[1]["dup_ratio"] == 0.0
    assert out[2]["dup_ratio"] is not None
