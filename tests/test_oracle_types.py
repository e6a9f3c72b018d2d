"""Oracle type discipline (VERDICT r07 #1/#2/#5).

Round 7 lost 10 driver rows to un-cast HUGEINT oracle columns: DuckDB
widens sum(BIGINT) to HUGEINT (plain and windowed) and DECIMAL(38)//x
to HUGEINT/DECIMAL, the driver's hash canonicalization is
type-sensitive to int128, and duckdb's Python client hands HUGEINT
back as plain int — so the value-only local replica was blind to the
class while 10 rows sat driver-red.

Two pins:
  1. a registry-wide DESCRIBE sweep — NO oracle may emit a
     HUGEINT/DECIMAL output column (DuckDB only, no Spark needed);
  2. the check_oracle.py type differ must catch a deliberately
     re-broken oracle (the VERDICT's done-criterion for the fix).
"""

import importlib.util
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load_check_oracle():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/scripts/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


def test_no_oracle_emits_hugeint_or_decimal(con):
    """Every registry oracle DESCRIBEs to driver-safe output types.

    This is the regression pin for the r07 incident: the 12 offending
    columns (events_ohlc/_stream/_daily.value_cents,
    events_cusum/_stream.cusum_up/dn, event_type_transitions.n_from,
    events_rolling_anomaly.dev_n/var_n, customer_rfm.monetary,
    events_chi2_gate.row_tot/col_tot/n_total,
    conversion_survival.n_risk/d/c/surv_log_micro,
    events_value_drift/_drift_stream.psi_contrib_micro) are now CAST
    to BIGINT; nothing may regress or newly widen.
    """
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
    import __spark_entry__ as entry

    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (c, t) for c, t, *_ in rows
            if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"HUGEINT/DECIMAL oracle columns: {offenders}"


def test_type_diff_catches_rebroken_oracle():
    """type_diff must flag the exact failure class that cost round 7:
    a windowed sum(BIGINT) left un-cast (HUGEINT)."""
    mod = _load_check_oracle()
    # spark side says bigint; a re-broken oracle DESCRIBEs to HUGEINT
    fatal, warns = mod.type_diff(
        ["k", "value_cents"],
        [("k", "string"), ("value_cents", "bigint")],
        ["k", "value_cents"],
        ["VARCHAR", "HUGEINT"],
    )
    assert any("value_cents" in f and "HUGEINT" in f for f in fatal)
    # DECIMAL is equally fatal
    fatal, _ = mod.type_diff(
        [("x", "bigint")] and ["x"], [("x", "bigint")], ["x"], ["DECIMAL(38,0)"]
    )
    assert fatal


def test_type_diff_family_mismatch_is_fatal_but_width_is_warn():
    mod = _load_check_oracle()
    # cross-family: double vs bigint → fatal
    fatal, warns = mod.type_diff(
        ["x"], [("x", "double")], ["x"], ["BIGINT"]
    )
    assert fatal and not warns
    # intra-family width drift (driver-tolerated per r02..r07 greens):
    # int vs bigint → warn only
    fatal, warns = mod.type_diff(
        ["x"], [("x", "int")], ["x"], ["BIGINT"]
    )
    assert not fatal and warns
    # timestamp vs timestamp_ntz → warn only
    fatal, warns = mod.type_diff(
        ["t"], [("t", "timestamp_ntz")], ["t"], ["TIMESTAMP"]
    )
    assert not fatal and warns
    # engine synonyms are silent: varchar==string, integer==int
    fatal, warns = mod.type_diff(
        ["s", "i"], [("s", "string"), ("i", "int")],
        ["s", "i"], ["VARCHAR", "INTEGER"],
    )
    assert not fatal and not warns


def test_indexability_predicate_never_drifts_from_emb_ok():
    """ADVICE r09: _EMB_OK is the single source of truth for the
    vector-indexability predicate. Several oracles inline it inside
    their own FROM shapes; this pins every inlined occurrence (any
    list_filter over a vector column) to _EMB_OK's exact form —
    including the element-NULL clause — so a future edit to the
    contract cannot leave a stale copy behind."""
    import re

    import __spark_entry__ as entry

    tmpl = entry._EMB_OK
    # the predicate tail for any vector column name
    want = re.escape(
        tmpl.format(v="VEC").split("len(")[1].replace("VEC", "£")
    ).replace("£", r"(\w+)")
    oracles = entry.oracle_sql()
    hits = 0
    for name, sql in oracles.items():
        norm = re.sub(r"\s+", " ", sql)
        for m in re.finditer(r"len\(list_filter\((\w+), x -> [^)]*\)\)[^,\n]*", norm):
            frag = m.group(0)
            col = m.group(1)
            if col != "embedding" and "isnan" not in frag:
                continue
            if re.match(
                r"len\(list_filter\(\w+, x -> x IS NULL\)\) > 0", frag
            ):
                # the OTHER contract: a NULL-PROPAGATION guard
                # (_L2_SQL_NULLPROP / vector_lookup CASE) — restores
                # Spark's null-propagating fold for oracles that RANK
                # unfiltered rows instead of excluding them
                continue
            assert re.match(r"len\(" + want, frag), (
                f"{name}: inlined indexability predicate drifted "
                f"from _EMB_OK: {frag!r}"
            )
            hits += 1
    assert hits >= 10, hits  # the kNN tier alone inlines it this often


def test_no_bare_embedding_nonnull_in_oracles():
    """Complement to the drift test above (round-10 self-review): that
    test pins sites that ALREADY contain a list_filter — a MISSING
    element-NULL/NaN clause is invisible to it. In rendered oracle SQL
    the indexability contract means 'embedding IS NOT NULL' must
    always be immediately followed by the _EMB_OK list_filter clause;
    a bare occurrence is an under-guarded query/base side (the
    hard_negatives_ivf / docs_mining_stream class)."""
    import re

    import __spark_entry__ as entry

    offenders = []
    for name, sql in entry.oracle_sql().items():
        norm = re.sub(r"\s+", " ", sql)
        for m in re.finditer(r"embedding IS NOT NULL(.{0,90})", norm):
            tail = m.group(1)
            if not tail.lstrip().startswith(
                "AND len(list_filter(embedding, x -> x IS NULL OR isnan(x))) = 0"
            ):
                offenders.append((name, tail[:70]))
    assert offenders == [], offenders
