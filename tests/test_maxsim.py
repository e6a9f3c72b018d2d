"""Late-interaction MaxSim retrieval (pipeline/late_interaction.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oasisdb_spark.pipeline.late_interaction import maxsim_topk


def test_maxsim_hand_computed(spark):
    """score(q,d) = Σ_i max_j q_i·d_j on a hand-checkable example."""
    base = spark.createDataFrame(
        [
            (1, [[1.0, 0.0], [0.0, 1.0]]),        # identity tokens
            (2, [[2.0, 0.0]]),                    # one strong x-token
            (3, [[0.0, 0.0]]),                    # null doc
        ],
        "id BIGINT, vectors ARRAY<ARRAY<FLOAT>>",
    )
    q = spark.createDataFrame(
        [(0, [[1.0, 0.0], [0.0, 2.0]])], "query_id BIGINT, query_vecs ARRAY<ARRAY<FLOAT>>"
    )
    rows = {r["id"]: r for r in maxsim_topk(q, base, k=3).collect()}
    # doc1: max(1,0)+max(0,2) = 3; doc2: max(2)+max(0) = 2; doc3: 0
    assert rows[1]["distance"] == -3.0 and rows[1]["rank"] == 1
    assert rows[2]["distance"] == -2.0 and rows[2]["rank"] == 2
    assert rows[3]["distance"] == 0.0 and rows[3]["rank"] == 3


def test_maxsim_matches_numpy_reference(spark, embeddings):
    """Engine result equals a direct numpy MaxSim over a 30-doc slice."""
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in embeddings.filter(F.col("vec_id") < 30).collect()}
    toks = {i: v.reshape(4, 16) for i, v in emb.items()}

    def score(qi, di):
        S = toks[di] @ toks[qi].T           # (d_tok, q_tok)
        return S.max(axis=0).sum()

    tok_expr = F.transform(
        F.sequence(F.lit(0), F.lit(3)), lambda t: F.slice("embedding", t * 16 + 1, 16)
    )
    sub = embeddings.filter(F.col("vec_id") < 30)
    base = sub.select(F.col("vec_id").alias("id"), tok_expr.alias("vectors"))
    q = sub.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), tok_expr.alias("query_vecs")
    )
    got = maxsim_topk(q, base, k=5).collect()
    for qi in range(3):
        want = sorted(emb, key=lambda d: (-score(qi, d), d))[:5]
        have = [r["id"] for r in sorted(
            (r for r in got if r["query_id"] == qi), key=lambda r: r["rank"])]
        assert have == want


def test_maxsim_rejects_empty_query_tokens(spark):
    base = spark.createDataFrame([(1, [[1.0]])], "id BIGINT, vectors ARRAY<ARRAY<FLOAT>>")
    q = spark.createDataFrame([(0, [])], "query_id BIGINT, query_vecs ARRAY<ARRAY<FLOAT>>")
    with pytest.raises(ValueError, match="zero token vectors"):
        maxsim_topk(q, base, k=1)


def test_maxsim_skips_empty_docs(spark):
    base = spark.createDataFrame(
        [(1, [[1.0, 0.0]]), (2, [])], "id BIGINT, vectors ARRAY<ARRAY<FLOAT>>"
    )
    q = spark.createDataFrame(
        [(0, [[1.0, 0.0]])], "query_id BIGINT, query_vecs ARRAY<ARRAY<FLOAT>>"
    )
    rows = maxsim_topk(q, base, k=5).collect()
    assert [r["id"] for r in rows] == [1]  # token-less doc can't match
