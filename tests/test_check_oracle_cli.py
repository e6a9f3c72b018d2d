"""check_oracle.py CLI contract (VERDICT r09 wrong #2): a requested
entry name that does not exist in the registry must fail LOUDLY
(rc=2 + message) instead of silently filtering to nothing and exiting
0 — a round-close verification list with one typo'd name must never
read as green. Pure subprocess test: the unknown-name check runs
before any Spark session is created, so this is fast."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "check_oracle.py")


def _run(*names):
    return subprocess.run(
        [sys.executable, SCRIPT, "/root/testdata/sf0.001", *names],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


def test_unknown_entry_name_exits_2():
    p = _run("q7_volume_shipping")  # the exact typo the judge hit live
    assert p.returncode == 2, p.stdout + p.stderr
    assert "unknown entry name" in p.stdout
    assert "q7_volume_shipping" in p.stdout


def test_mixed_known_and_unknown_exits_2_and_names_only_the_unknown():
    p = _run("q7_nation_trade", "line_dedup_stats")
    assert p.returncode == 2, p.stdout + p.stderr
    assert "line_dedup_stats" in p.stdout
    assert "q7_nation_trade" not in p.stdout.split("unknown entry name")[1]
