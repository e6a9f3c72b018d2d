"""Gate-window rotation audit: recompute, from the CORRECTNESS_r*.json
driver records plus the live registry order, everything the rotation
comments in __spark_entry__.py assert by hand.

The driver's correctness gate checks only the FIRST 50 queries()
entries each round, so window staging is the mechanism that earns every
entry a (recent) green driver row. Rounds 5-8 staged those windows with
hand-run sweeps over the CORRECTNESS files; this script makes the
arithmetic mechanical and auditable:

  - per-entry gating history (which rounds produced a green row),
  - entries with NO green driver row yet (must be in the next window),
  - staleness ranking (oldest most-recent-green first — the re-green
    queue the next window fills up with),
  - what the CURRENT first-50 window covers, and which of its entries
    are first-timers vs re-greens,
  - red rows per round (diagnosis stays in VERDICT/COVERAGE; this just
    surfaces them).

Usage: python scripts/rotation_audit.py [--next N]
  --next N   also propose the next window: all never-green entries,
             then the stalest re-greens, filling to N (default 50).

Read-only; exits 0 always (it reports, the staging decision is human).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_order() -> list[str]:
    """Parse the queries() registration order from __spark_entry__.py
    WITHOUT importing it (no pyspark needed): the dict literal's
    '"name": _fn,' lines in source order."""
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(r"\ndef queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    if not m:
        raise SystemExit("could not locate the queries() dict literal")
    body = m.group(1)
    names = re.findall(r'^\s{8}"([a-z0-9_]+)":', body, re.M)
    if len(names) != len(set(names)):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise SystemExit(f"duplicate registry keys: {dupes}")
    return names


def load_rounds() -> dict[int, dict]:
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        out[rnd] = json.load(open(f))
    return out


def is_green(row: dict) -> bool:
    return bool(
        row.get("hash_match") and row.get("rows_match") and row.get("schema_match")
    )


def main() -> None:
    argv = sys.argv[1:]
    next_n = None
    if "--next" in argv:
        i = argv.index("--next")
        next_n = int(argv[i + 1]) if len(argv) > i + 1 else 50

    names = registry_order()
    rounds = load_rounds()
    latest = max(rounds)

    greens: dict[str, list[int]] = {n: [] for n in names}
    reds: dict[int, list[str]] = {}
    unknown: dict[int, list[str]] = {}
    for rnd, rows in rounds.items():
        for name, row in rows.items():
            if name not in greens:
                unknown.setdefault(rnd, []).append(name)
                continue
            if is_green(row):
                greens[name].append(rnd)
            else:
                reds.setdefault(rnd, []).append(name)

    window = names[:50]
    never = [n for n in names if not greens[n]]
    # staleness: most-recent green round, ascending (ties keep registry
    # order — deterministic and matches how the windows were staged)
    regreens = sorted(
        (n for n in names if greens[n]), key=lambda n: (max(greens[n]), names.index(n))
    )

    print(f"registry: {len(names)} entries; driver rounds on file: "
          f"{sorted(rounds)} (latest r{latest:02d})")
    for rnd in sorted(reds):
        print(f"  r{rnd:02d} red rows: {len(reds[rnd])} -> {', '.join(reds[rnd])}")
    for rnd in sorted(unknown):
        print(f"  r{rnd:02d} rows for names no longer in the registry: "
              f"{', '.join(unknown[rnd])}")

    print(f"\nnever-green entries ({len(never)}):")
    for n in never:
        pos = names.index(n) + 1
        inwin = "IN WINDOW" if n in window else "NOT in window"
        print(f"  {n:35s} position {pos:3d}  {inwin}")

    print("\ncurrent first-50 window:")
    firsts = [n for n in window if not greens[n]]
    stale = {n: max(greens[n]) for n in window if greens[n]}
    print(f"  first-driver-row entries: {len(firsts)}")
    by_round: dict[int, int] = {}
    for n, r in stale.items():
        by_round[r] = by_round.get(r, 0) + 1
    for r in sorted(by_round):
        print(f"  re-greens whose latest green is r{r:02d}: {by_round[r]}")

    behind = [n for n in names[50:] if greens[n]]
    stalest_behind = sorted(behind, key=lambda n: (max(greens[n]), names.index(n)))
    print("\nstalest entries BEHIND the window (next re-green queue):")
    for n in stalest_behind[:15]:
        print(f"  latest green r{max(greens[n]):02d}  {n}")

    if next_n:
        proposal = [n for n in names[:2]]  # standing anchors stay
        proposal += [n for n in never if n not in proposal]
        for n in regreens:
            if len(proposal) >= next_n:
                break
            if n not in proposal:
                proposal.append(n)
        print(f"\nproposed next window ({len(proposal[:next_n])} entries; "
              f"2 anchors + {len([n for n in never if n not in names[:2]])} "
              f"never-green + stalest re-greens):")
        for i, n in enumerate(proposal[:next_n], 1):
            tag = "NEVER-GREEN" if not greens[n] else f"r{max(greens[n]):02d}"
            print(f"  {i:2d}. {n:35s} {tag}")


if __name__ == "__main__":
    main()
