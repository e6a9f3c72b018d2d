"""rotation_audit.py's source-regex registry parser must stay in
lockstep with the real queries() registry — if the dict literal's
formatting drifts, the audit would silently mis-rank the gate window.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_audit():
    spec = importlib.util.spec_from_file_location(
        "rotation_audit", os.path.join(REPO, "scripts", "rotation_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parser_matches_live_registry():
    import __spark_entry__ as entry

    parsed = _load_audit().registry_order()
    live = list(entry.queries().keys())
    assert parsed == live


def test_green_history_covers_every_round_file():
    ra = _load_audit()
    rounds = ra.load_rounds()
    assert rounds, "no CORRECTNESS_r*.json files found"
    for rnd, rows in rounds.items():
        assert len(rows) == 50, f"r{rnd:02d} gate window should be 50 rows"


def test_registry_fn_parser_resolves_lambdas():
    """Every registry entry must resolve to a diffable function name —
    including the lambda-bound knn_flat_* variants (a lambda entry the
    parser can't resolve would silently drop out of churn tracking)."""
    ra = _load_audit()
    src = open("/root/repo/__spark_entry__.py").read()
    fns = ra.parse_registry_fns(src)
    names = ra.registry_order()
    unresolved = [n for n in names if n not in fns]
    assert unresolved == [], unresolved
    assert fns["knn_flat_cos"] == "_knn_flat"
    assert fns["knn_flat_l2"] == "_knn_flat"


def test_code_only_strips_docstrings_and_comments():
    ra = _load_audit()
    src = 'def f():\n    """mentions _helper in prose"""\n    x = 1  # _other\n    return _real(x)\n'
    stripped = ra.code_only(src)
    assert "_helper" not in stripped
    assert "_other" not in stripped
    assert "_real" in stripped


def test_closure_follows_code_references_not_prose():
    """The closure BFS must follow helpers referenced in CODE and must
    NOT explode through docstring mentions or the registry surfaces
    (queries/bench_queries reference every function)."""
    ra = _load_audit()
    spans = {
        "_entry": 'def _entry(s, d):\n    """see bench_queries and _prose_only"""\n    return _helper(s)\n',
        "_helper": "def _helper(s):\n    return _memo(s)\n",
        "_memo": "def _memo(s):\n    return s\n",
        "_prose_only": "def _prose_only():\n    return 1\n",
        "bench_queries": "def bench_queries():\n    return {'x': _entry}\n",
    }
    assert ra.closure_fns(spans, "_entry") == {"_entry", "_helper", "_memo"}


def test_module_files_maps_imports_and_attribute_tails():
    ra = _load_audit()
    text = (
        "from oasisdb_spark.pipeline.dedup import simhash_expr\n"
        "import oasisdb_spark.index.ivf\n"
        "x = oasisdb_spark.index.flat.topk_per_query\n"
    )
    files = ra.module_files(text)
    assert "oasisdb_spark/pipeline/dedup.py" in files
    assert "oasisdb_spark/index/ivf.py" in files
    assert "oasisdb_spark/index/flat.py" in files


def test_live_window_entries_have_no_unresolvable_churn_closure():
    """Every first-50 window entry's closure must be non-empty and
    resolve within the live entry file (a closure that silently comes
    back empty would make churn detection vacuously pass)."""
    ra = _load_audit()
    src = open("/root/repo/__spark_entry__.py").read()
    spans = ra.parse_spans(src)
    fns = ra.parse_registry_fns(src)
    for name in ra.registry_order()[:50]:
        closure = ra.closure_fns(spans, fns[name])
        assert fns[name] in closure, name


def test_unreadable_baseline_generation_flags_not_skips():
    """ADVICE r09: a historical entry-file generation that fails to
    exec must make oracle churn UNKNOWN-AND-FLAGGED for entries
    baselined on it — never silently unchanged."""
    ra = _load_audit()
    g = ra.Generation("this is not python !!!")
    assert g.oracles == {} and g.oracles_ok is False
    # empty source (the missing-file fallback) is likewise unreadable
    g2 = ra.Generation("")
    assert g2.oracles_ok is False
    # and a readable generation keeps oracles_ok
    ok = ra.Generation(
        "def oracle_sql():\n    return {'a': 'SELECT 1'}\n"
    )
    assert ok.oracles_ok is True and ok.oracles == {"a": "SELECT 1"}


def test_unreadable_baseline_reason_counts_as_direct_churn():
    """The 'oracle-sql: baseline unreadable' reason must rank in the
    DIRECT churn tier (it starts with 'oracle-sql'), so a conservative
    flag preempts like a real oracle edit."""
    reason = "oracle-sql: baseline unreadable"
    assert reason.startswith(("entry-fns", "oracle-sql"))


def test_missing_prior_round_commit_falls_back_to_root(monkeypatch):
    """ADVICE r09: an entry whose latest green is round 1 (no round-0
    close commit) must baseline at the repo root commit instead of
    dropping out of churn tracking."""
    ra = _load_audit()

    calls = {}
    real_git = ra._git

    def fake_git(*args):
        if args[0] == "rev-list":
            calls["root"] = True
        return real_git(*args)

    monkeypatch.setattr(ra, "_git", fake_git)
    monkeypatch.setattr(ra, "round_commits", lambda: {})  # no close commits
    names = ["collection_lifecycle"]
    churn = ra.entry_churn(names, {"collection_lifecycle": [1]})
    assert calls.get("root"), "root-commit fallback never engaged"
    # vs the root commit EVERYTHING has churned — the entry must appear
    assert churn.get("collection_lifecycle"), churn


def test_churn_report_carries_the_lines_round_close_regexes(monkeypatch, capsys):
    """round_close.py lifts two lines out of churn.log by regex —
     'churned entries (N)' and 'behind-window backlog: ...'. If either
    print drifts, the paste block silently loses its backlog figures
    (the numbers COVERAGE.md's window paragraph is refreshed from), so
    pin the coupling here against a live --churn run."""
    import re

    monkeypatch.setattr("sys.argv", ["rotation_audit.py", "--churn"])
    _load_audit().main()
    out = capsys.readouterr().out
    m = re.search(r"churned entries \((\d+)\)", out)
    b = re.search(
        r"behind-window backlog: (\d+) churned"
        r"(?: \+ (\d+) never-green \([^)]*\))?"
        r" \((\d+) of the churned are in-window\)",
        out,
    )
    assert m and b
    # the decomposition must reconcile with the total
    assert int(b.group(1)) + int(b.group(3)) == int(m.group(1))
