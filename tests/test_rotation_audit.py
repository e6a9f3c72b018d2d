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
