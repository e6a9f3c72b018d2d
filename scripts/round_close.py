"""Round-close verification orchestrator (VERDICT r09 #4).

Runs the full local certification stack on the current tree and prints
one summary block to paste into NULLSWEEP.md. Stages, in order:

  1. regenerate the NULL + NaN fixture tiers (pure functions of the
     clean sf0.001 fixture — see scripts/make_null_fixture.py),
  2. full-registry check_oracle --vanilla on clean / NULL / NaN at
     sf0.001 (the strongest local correctness signal ahead of the
     driver gate),
  3. the 50-entry gate-window replica at sf0.01 (--window --vanilla),
     then the FULL registry at sf0.01 (gate-scale clearance for the
     next round's queue, not just the staged window),
  4. plan_audit (scale/shape assertions),
  5. pytest,
  6. bench.py at the canonical sf0.1 + bench_diff vs the committed
     BENCH_LOCAL_sf0.1.json from HEAD (run BEFORE committing the new
     record so the baseline is the previous round's).

Each stage is skippable (--skip bench,pytest,...) because the full
stack is ~1.5 h; exit code is non-zero if any executed stage failed.
Stage stdout goes to .nullfix/round_close/<stage>.log so a red stage
is diagnosable without re-running it.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(REPO, ".nullfix", "round_close")
PY = sys.executable


def run(name: str, cmd: list[str]) -> tuple[str, int, float, str]:
    t0 = time.time()
    os.makedirs(LOGDIR, exist_ok=True)
    log = os.path.join(LOGDIR, f"{name}.log")
    with open(log, "w") as f:
        # stderr joins the log (ADVICE r10): tracebacks, pytest import
        # errors, and Spark failures go to stderr — a crashed stage
        # must leave a diagnosable log, not an empty one
        p = subprocess.run(
            cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT
        )
    return name, p.returncode, time.time() - t0, log


STAGES: dict[str, list[list[str]]] = {
    "fixtures": [
        [PY, "scripts/make_null_fixture.py"],
        [PY, "scripts/make_null_fixture.py", "--nan"],
    ],
    "clean": [[PY, "scripts/check_oracle.py", "--vanilla", "/root/testdata/sf0.001"]],
    "null": [[PY, "scripts/check_oracle.py", "--vanilla", ".nullfix/sf0.001-null"]],
    "nan": [[PY, "scripts/check_oracle.py", "--vanilla", ".nullfix/sf0.001-nan"]],
    "window": [[PY, "scripts/check_oracle.py", "--vanilla", "--window",
                "/root/testdata/sf0.01"]],
    # FULL registry at the gate's own scale factor (round 11): the
    # window stage only re-proves the first 50 at sf0.01; this clears
    # the entire next-round queue at gate scale (~25 min — skip with
    # --skip=fullsf001 when iterating)
    "fullsf001": [[PY, "scripts/check_oracle.py", "--vanilla",
                   "/root/testdata/sf0.01"]],
    "plans": [[PY, "scripts/plan_audit.py"]],
    "pytest": [[PY, "-m", "pytest", "tests/", "-x", "-q"]],
    "bench": [[PY, "bench.py"]],
    # live churn backlog on the CURRENT tree (VERDICT r10 #1/#2's
    # staleness loop): COVERAGE.md's window paragraph is refreshed
    # from THIS number at close — never hand-written mid-round
    "churn": [[PY, "scripts/rotation_audit.py", "--churn"]],
}


def main() -> None:
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip |= set(a.split("=", 1)[-1].split(",")) if "=" in a else set()
        elif not a.startswith("-"):
            skip |= set(a.split(","))
    unknown = skip - set(STAGES)
    if unknown:
        raise SystemExit(f"unknown stage(s) to skip: {', '.join(sorted(unknown))}")

    # snapshot the committed bench record BEFORE bench overwrites it,
    # so the diff baseline is the previous round's
    prev_bench = os.path.join(LOGDIR, "prev_BENCH_LOCAL_sf0.1.json")
    os.makedirs(LOGDIR, exist_ok=True)
    with open(prev_bench, "w") as f:
        subprocess.run(
            ["git", "show", "HEAD:BENCH_LOCAL_sf0.1.json"],
            cwd=REPO, stdout=f, stderr=subprocess.DEVNULL,
        )

    results = []
    for name, cmds in STAGES.items():
        if name in skip:
            results.append((name, None, 0.0, ""))
            continue
        for i, cmd in enumerate(cmds):
            sub = name if len(cmds) == 1 else f"{name}.{i}"
            results.append(run(sub, cmd))

    if "bench" not in skip and os.path.getsize(prev_bench) > 2:
        results.append(run(
            "bench_diff",
            [PY, "scripts/bench_diff.py", prev_bench, "BENCH_LOCAL_sf0.1.json"],
        ))

    print("\n== round_close summary ==")
    bad = 0
    for name, rc, dt, log in results:
        if rc is None:
            print(f"  {name:12s} SKIPPED")
            continue
        # bench_diff rc=1 means a family moved beyond the noise band —
        # surfaced for judgment, but movement is not a gate failure
        advisory = name == "bench_diff" and rc == 1
        status = "OK" if rc == 0 else ("MOVED" if advisory else f"FAIL(rc={rc})")
        bad += 0 if (rc == 0 or advisory) else 1
        print(f"  {name:12s} {status:10s} {dt:7.1f}s  {log}")
    churn_log = os.path.join(LOGDIR, "churn.log")
    if "churn" not in skip and os.path.exists(churn_log):
        import re
        text = open(churn_log).read()
        m = re.search(r"churned entries \((\d+)\)", text)
        b = re.search(r"behind-window backlog: (.+)", text)
        if m:
            print(
                f"\n  live churn backlog on this tree: {m.group(1)} "
                "entries — refresh COVERAGE.md's window paragraph "
                "from THIS number (VERDICT r10 #2)"
            )
        if b:
            print(f"  {b.group(0)}")
    print(f"\n{'ALL STAGES OK' if bad == 0 else f'{bad} STAGE(S) FAILED'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
