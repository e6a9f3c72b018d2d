"""Robust winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD 2003 — the MOSS algorithm).

Where `pipeline/text.py fingerprint_md5` identifies EXACT duplicates and
MinHash estimates SET overlap, winnowing selects a small, position-aware
fingerprint set with a coverage guarantee: any shared substring of
length >= k + w - 1 between two documents is caught by at least one
shared selected fingerprint. That makes it the standard primitive for
plagiarism / benchmark-contamination detection where the EVIDENCE
(which positions matched) matters, not just a similarity score.

Algorithm: over the normalized text's k-char grams, slide a window of w
consecutive gram hashes and select each window's minimum (rightmost
occurrence on ties); the fingerprint set is the distinct selected
(position, hash) pairs. Density is ~2/(w+1) of all grams.

Cross-engine determinism: gram hash = the 40-bit md5 prefix idiom
(`('0x'||substr(md5(g),1,10))::BIGINT` in DuckDB, `conv(substr(md5(g),
1,10),16,10)` in Spark — bit-equal, same as text.py char_hash60), and
the per-window argmin with rightmost tie-break is ONE integer min over
packed keys `hash * 2^20 + (2^20 - 1 - pos)`: the low 20 bits invert
position, so the smallest key is the smallest hash at the LARGEST
position. Packed keys stay < 2^60. Docs with more than 2^20 grams
(~1 MiB of normalized text) raise loudly rather than aliasing
positions — same posture as the PCA_OFF / KM_LIMIT guards.

Scale: the whole selection is SCAN-STAGE Column arithmetic over
per-document arrays (transform/slice/array_min on a generated position
sequence) — ZERO shuffle; no window function, so documents never
co-locate. Work is O(n_grams * w) per doc with w small (default 4);
the output explode is the only row growth (~2/(w+1) * n_grams rows).
The overlap pass (`winnow_overlap_pairs`) is one fp_hash shuffle with a
document-frequency cap, pairs exploded from each fingerprint's bounded
doc set — the same hot-key discipline as the MinHash band join and
jaccard prefix filter; never all-pairs.

Reference parity: the reference engine has no winnowing; this extends
the fingerprinting family (SURVEY §2 extensions; cf. `doc_fingerprint`'s
rolling hash) with the selection rule the plagiarism/contamination
literature actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_overlap_pairs", "POS_MOD"]

POS_MOD = 1 << 20  # packed-key position field; > 2^20 grams/doc raises


def _clean(text_col: str) -> F.Column:
    """MOSS normalization: lowercase, drop everything but [a-z0-9]."""
    return F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, fp_pos, fp_hash): the winnowed fingerprint set.

    fp_pos is the 0-based gram offset in the NORMALIZED text; fp_hash
    the 40-bit gram hash. Documents with fewer than k normalized chars
    emit no rows (nothing to fingerprint); documents with fewer than w
    grams use one whole-document window, so every doc with >= 1 gram
    yields >= 1 fingerprint."""
    if k < 1 or w < 1:
        raise ValueError(f"winnow_fingerprints: need k>=1, w>=1, got {k}, {w}")
    clean = _clean(text_col)
    base = df.select(F.col(id_col), clean.alias("_clean")).where(
        F.length("_clean") >= k
    )
    ng = (F.length("_clean") - k + 1).alias("_ng")
    base = base.select(id_col, "_clean", ng)
    # guard BEFORE packing: position aliasing would silently corrupt keys
    guarded_ng = F.when(
        F.col("_ng") < POS_MOD, F.col("_ng")
    ).otherwise(
        F.raise_error(
            F.lit(f"winnow_fingerprints: document exceeds {POS_MOD} grams")
        ).cast("int")
    )
    keys = F.transform(
        F.sequence(F.lit(0), guarded_ng - 1),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(F.col("_clean"), i + 1, k)), 1, 10),
            16,
            10,
        ).cast("bigint")
        * POS_MOD
        + (F.lit(POS_MOD - 1) - i),
    )
    weff = F.least(F.lit(w), F.col("_ng"))
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.col("_ng") - weff),
            lambda i: F.array_min(F.slice(F.col("_keys"), i + 1, weff)),
        )
    )
    return (
        base.withColumn("_keys", keys)
        .select(id_col, F.explode(wins).alias("_sel"))
        .select(
            id_col,
            (F.lit(POS_MOD - 1) - F.col("_sel") % POS_MOD).cast("int").alias("fp_pos"),
            F.expr(f"_sel div {POS_MOD}").alias("fp_hash"),
        )
    )


def winnow_overlap_pairs(
    fps: DataFrame,
    docs: DataFrame,
    max_df: int = 10,
    min_shared: int = 2,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Cross-group contamination pairs with fingerprint evidence:
    (doc_a, doc_b, shared_fps) for documents from DIFFERENT groups
    sharing >= min_shared winnowed fingerprints.

    Fingerprints appearing in more than max_df documents are dropped
    first (boilerplate hashes would otherwise fan pair generation
    toward all-pairs — the hot-shingle cap of the MinHash band join,
    applied to fingerprint document frequency). Pair generation is
    array arithmetic over each fingerprint's <= max_df sorted doc set
    on one fp_hash shuffle: O(sum df^2) with df <= max_df."""
    if max_df < 2 or min_shared < 1:
        raise ValueError(
            f"winnow_overlap_pairs: need max_df>=2, min_shared>=1, "
            f"got {max_df}, {min_shared}"
        )
    # df cap as a map-side-combinable AGG + semi-join over a
    # checkpointed tagged frame (round 13, guide §2.5/§5): the
    # round-12 form counted with a window partitioned by fp_hash over
    # the raw tagged frame — co-locating every occurrence of exactly
    # the hot boilerplate fingerprints the cap exists to drop, one
    # straggler sort per hot key at corpus scale. The groupBy count
    # pre-aggregates map-side (a hot key reaches its reducer as a
    # handful of partial counts, never raw rows) and the semi-join
    # removes hot keys BEFORE the collect_list below, so no agg buffer
    # ever sees a group larger than max_df. The tagged frame feeds
    # both the count and the pair branch, so it is localCheckpoint-ed
    # — ONE compute of the join+distinct, fingerprint-row-sized
    # narrow-column blocks (the triangles edge-list trade), released
    # at the harness's next between-queries point. The cross-group
    # pairs then explode from each <= max_df sorted doc array exactly
    # as before. Row set unchanged: the window count and the grouped
    # count agree on every fp_hash, sorted arrays make positional
    # order the doc_a < doc_b value order, and each qualifying
    # (doc_a, doc_b, fp) contributes exactly one count.
    from oasisdb_spark.ckpt import track

    tagged = track(
        fps.join(
            docs.select(F.col(id_col), F.col(group_col)), id_col
        )
        .select(id_col, group_col, "fp_hash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rare_keys = (
        tagged.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("fp_hash")
    )
    rare = tagged.join(rare_keys, "fp_hash", "left_semi")
    grouped = rare.groupBy("fp_hash").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(id_col).alias("_id"), F.col(group_col).alias("_g"))
            )
        ).alias("_ds")
    )
    arr = F.col("_ds")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(
                    x["_id"].alias("doc_a"),
                    y["_id"].alias("doc_b"),
                    x["_g"].alias("_ga"),
                    y["_g"].alias("_gb"),
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_structs).alias("_p"))
        .where(
            (F.col("_p.doc_a") != F.col("_p.doc_b"))
            & (F.col("_p._ga") != F.col("_p._gb"))
        )
        .select("_p.doc_a", "_p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
