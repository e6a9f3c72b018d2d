"""Tests for sources/layout.py (Z-order clustering)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from oasisdb_spark.sources.layout import write_zordered, zorder_key


def _rowgroup_spans(path, col):
    """Average fraction of the global range each row group's [min, max]
    covers for `col` — the pruning figure of merit (lower = tighter)."""
    import glob

    spans, lo_g, hi_g = [], None, None
    groups = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            groups.append((float(st.min), float(st.max)))
    lo_g = min(g[0] for g in groups)
    hi_g = max(g[1] for g in groups)
    rng = (hi_g - lo_g) or 1.0
    return sum((g[1] - g[0]) / rng for g in groups) / len(groups), len(groups)


@pytest.fixture(scope="module")
def zordered(spark, sf_dir, tmp_path_factory):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id", "value")
    root = tmp_path_factory.mktemp("layout")
    zpath, lpath = str(root / "z"), str(root / "linear")
    write_zordered(ev, zpath, ["user_id", "value"], bits=12, file_count=8)
    # linear baseline: sorted by user_id only
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id") \
        .write.mode("overwrite").parquet(lpath)
    return ev, zpath, lpath


def test_roundtrip_lossless(spark, zordered):
    ev, zpath, _ = zordered
    back = spark.read.parquet(zpath)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_both_dimensions_tight(spark, zordered):
    """Z-order: BOTH columns' row-group spans are fractions of the
    range; linear sort: the secondary column's spans stay ~full."""
    _, zpath, lpath = zordered
    span_u_z, ngroups = _rowgroup_spans(zpath, "user_id")
    span_v_z, _ = _rowgroup_spans(zpath, "value")
    span_u_l, _ = _rowgroup_spans(lpath, "user_id")
    span_v_l, _ = _rowgroup_spans(lpath, "value")
    assert ngroups >= 4
    assert span_u_l < 0.5          # primary sort is tight in the baseline
    assert span_v_l > 0.6          # ...but its secondary column is not
    assert span_u_z < 0.6          # z-order: both dimensions tight
    assert span_v_z < 0.6
    assert span_v_z < span_v_l * 0.6


def test_query_results_layout_independent(spark, zordered):
    ev, zpath, _ = zordered
    pred = (F.col("user_id").between(100, 120)) & (F.col("value") > 50)
    a = spark.read.parquet(zpath).filter(pred).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")
    ).collect()[0]
    b = ev.filter(pred).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")
    ).collect()[0]
    assert (a["n"], a["s"]) == (b["n"], b["s"])


def test_key_range_and_determinism(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = ev.select(zorder_key(ev, ["user_id", "value"], bits=8).alias("k"))
    stats = k.agg(F.min("k"), F.max("k")).collect()[0]
    assert stats[0] >= 0 and stats[1] < (1 << 16)
    k2 = ev.repartition(9).select(zorder_key(ev, ["user_id", "value"], bits=8).alias("k"))
    assert sorted(r["k"] for r in k.collect()) == sorted(r["k"] for r in k2.collect())


def test_zorder_key_all_null_and_dotted_columns(spark):
    """An all-NULL z-column must rank constant-0 (previously a bare
    TypeError on None arithmetic), and dotted column names must resolve
    exactly (the profile_table aliasing rule)."""
    from oasisdb_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(1, None), (7, None)], "a LONG, b LONG"
    ).toDF("a.x", "b")
    keys = [r["z"] for r in
            df.select(zorder_key(df, ["a.x", "b"], bits=4).alias("z")).collect()]
    assert len(keys) == 2 and all(isinstance(k, int) for k in keys)
    # only the a.x dimension varies; b contributes constant 0 bits
    assert keys[0] != keys[1]
