"""bench.py stdout contract (VERDICT r09 #2 / wrong #1): the driver
captures only the LAST 2,000 chars of stdout (measured on
BENCH_r09.json) and parses the FINAL line. bench.py therefore prints
TWO lines — the families map on its own preceding line, then a final
compact line that must fit the window with headroom (≤ 1,500 chars).
These tests pin the contract statically (no Spark run)."""

import ast
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = open(os.path.join(REPO, "bench.py")).read()


def test_final_line_fits_capture_window_worst_case():
    # mirror bench.py's compact-dict construction with worst-case
    # plausible widths (5-digit total, 4-digit query count, long sf)
    compact = {
        "metric": "headline_queries_total_sec",
        "value": 99999.999,
        "unit": "sec",
        "sf": 100.001,
        "method": {
            "passes": 99,
            "sub_second_extra_pass": True,
            "estimator": "min of 99 passes (+1 extra pass for sub-second entries)",
        },
        "n_queries": 9999,
        "per_query_record": "BENCH_LOCAL_sf100.001.json",
    }
    assert len(json.dumps(compact)) <= 1500


def test_source_has_length_tripwire_and_two_prints():
    # the runtime assert is the real gate; pin that it exists and that
    # the families map is NOT part of the final line
    assert "assert len(final_line) <= 1500" in SRC
    tree = ast.parse(SRC)
    prints = [
        n for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name) and n.func.id == "print"
    ]
    srcs = [ast.get_source_segment(SRC, p) for p in prints]
    fam_line = [s for s in srcs if '"families": families' in s]
    final = [s for s in srcs if "final_line" in s]
    assert fam_line and final
    # compact must exclude both the per-query map and the families map
    assert '"queries", "families"' in SRC
