"""Mechanical round-over-round bench comparison, encoding BASELINE.md's
noise-floor rules so structural moves are separated from jitter by the
same discipline every round:

  - single QUERY deltas under 1.3x are noise (controlled A/B showed the
    same tree re-measuring +-30% on sub-second entries),
  - FAMILY subtotals and the shared-set total are the signal, with a
    ~±10% session band,
  - families are only comparable over their SHARED query set (new
    queries in a family make its subtotal additive, not a regression —
    the r07 mutual_knn lesson).

Usage: python scripts/bench_diff.py OLD.json NEW.json [--band 1.10]

Accepts both the bench CLI's own JSON (with "queries"/"families") and
the driver's BENCH_r*.json wrapper (whose "tail" holds the JSON line).

Exit codes:
  0 — evaluated; no family's SHARED-query subtotal moved beyond the
      band AND 0.5 s absolute. Also used for the families-only
      fallback, which is INFORMATIONAL: raw family subtotals cannot
      distinguish a regression from an added member, so that path
      never flags. The fallback is taken only for salvaged/truncated
      wrapper tails or records with no per-query map at all (the
      driver's compact line); a small-but-COMPLETE query map (e.g.
      one family deliberately re-measured) takes the full-map path
      and can exit 1.
  1 — evaluated on full query maps; some family's shared-query
      subtotal moved beyond the band — the "needs a look" signal, not
      proof of a regression (BASELINE.md: confirm with a controlled
      A/B before acting).
  2 — could not evaluate (unsalvageable input, or the FAMILIES map
      could not be read).
"""

from __future__ import annotations

import ast
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_families() -> dict:
    """The live family map, read TEXTUALLY from bench.py's FAMILIES
    literal (ast parse) — importing bench would drag in pyspark and
    __spark_entry__, and a silent import failure here would disable
    the script's only exit-1 signal."""
    tree = ast.parse(open(os.path.join(REPO, "bench.py")).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) or isinstance(node, ast.Assign):
            targets = [node.target] if isinstance(node, ast.AnnAssign) else node.targets
            for t in targets:
                if isinstance(t, ast.Name) and t.id == "FAMILIES" and node.value:
                    return ast.literal_eval(node.value)
    print("ERROR: bench.py FAMILIES literal not found — cannot evaluate")
    sys.exit(2)


def _salvage_fragment(text: str) -> dict:
    """Recover "name": number pairs from a (possibly HEAD-truncated)
    tail fragment where the '"families": {' / '"queries": {' markers
    may be cut off (VERDICT r09 #2: the r9 driver tail starts
    mid-families-map). Keys are classified against the live FAMILIES
    literal: family names -> families, member query names -> queries;
    unknown keys are dropped (they may be half-truncated)."""
    import re

    fams = load_families()
    members = {m for ms in fams.values() for m in ms}
    # keys that name BOTH a family and a member query (e.g.
    # semantic_dedup) can't be classified from a bare fragment — drop
    # them rather than record a query timing as a family subtotal
    ambiguous = set(fams) & members
    out: dict = {}
    # the float pattern accepts an exponent (ADVICE r10): json.dumps
    # emits e-notation below 1e-4, so a sub-0.1ms timing in a
    # truncated tail would otherwise be dropped or mis-parsed
    for k, v in re.findall(
        r'"([a-z0-9_]+)": ([0-9.]+(?:[eE][+-]?[0-9]+)?)', text
    ):
        if k in ambiguous:
            continue
        if k in fams:
            out.setdefault("families", {})[k] = float(v)
        elif k in members:
            out.setdefault("queries", {})[k] = float(v)
    return out


def load(path: str) -> dict:
    d = json.load(open(path))
    if "queries" not in d and "tail" in d:
        # driver wrapper: the bench stdout lives in "tail", the LAST
        # ~2,000 chars only — the head is usually cut. Salvage order:
        # (1) the final compact line if intact; (2) families/queries
        # sub-objects whose markers survive; (3) a marker-less
        # HEAD-TRUNCATED fragment, keys classified via FAMILIES.
        import re

        tail = d["tail"]
        start = tail.rfind('{"metric"')
        parsed = None
        if start >= 0:
            line = tail[start:].strip().splitlines()[0]
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                parsed = None
        if parsed is not None and "families" not in parsed:
            # two-line contract (bench.py r10+): families ride the
            # preceding line; recover whatever fragment survives
            frag = _salvage_fragment(tail[:start])
            if frag.get("families"):
                parsed["families"] = frag["families"]
                parsed["_salvaged"] = True
                print(f"note: {path} families line head-truncated — "
                      f"salvaged {len(frag['families'])} family timings")
        if parsed is not None:
            return parsed
        out = {}
        for key in ("queries", "families"):
            m = re.search(r'"%s": \{(.*?)\}' % key, tail, re.S)
            if m:
                out[key] = {
                    k: float(v)
                    for k, v in re.findall(
                        r'"([a-z0-9_]+)": ([0-9.]+(?:[eE][+-]?[0-9]+)?)',
                        m.group(1),
                    )
                }
        if not out:
            # no marker survived — the r9-style fully-head-truncated
            # single line; classify bare pairs against FAMILIES
            out = _salvage_fragment(tail)
        m = re.search(r'"value": ([0-9.]+(?:[eE][+-]?[0-9]+)?)', tail)
        if m:
            out["value"] = float(m.group(1))
        if out:
            print(f"note: {path} tail is truncated — salvaged "
                  f"{len(out.get('queries', {}))} query / "
                  f"{len(out.get('families', {}))} family timings")
            out["_salvaged"] = True
            return out
    return d


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    band = 1.10
    if "--band" in argv:
        i = argv.index("--band")
        band = float(argv[i + 1])
        del argv[i : i + 2]
    if len(argv) != 2:
        raise SystemExit(__doc__)
    old, new = load(argv[0]), load(argv[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})

    salvaged = "_salvaged" in old or "_salvaged" in new
    if salvaged or not oq or not nq:
        # a truncated/salvaged driver tail, or a record with no
        # per-query map at all (the compact driver line): per-query
        # data is partial or absent, so diff the RAW family subtotals.
        # This is informational only — a raw subtotal cannot
        # distinguish a regression from a query ADDED to the family
        # (the r07 mutual_knn lesson) — so this path reports moves but
        # never exits 1.  A SMALL-but-complete query map (e.g. one
        # family deliberately re-measured) takes the full-map path
        # below and CAN exit 1 — salvage state, not map size, picks
        # the path (VERDICT r08 advice).
        of, nf = old.get("families", {}), new.get("families", {})
        fshared = sorted(set(of) & set(nf))
        if not fshared:
            print("ERROR: no comparable data survived in either input "
                  "(no full query map, no shared families) — cannot evaluate")
            sys.exit(2)
        ot, nt = sum(of[f] for f in fshared), sum(nf[f] for f in fshared)
        print(f"shared families: {len(fshared)}  subtotal {ot:.1f} -> "
              f"{nt:.1f} s ({nt / ot:.2f}x)")
        print("NOTE: raw family subtotals (query maps truncated) — moves "
              "below may be ADDED members, not regressions; informational, "
              "exit 0 either way")
        moved = 0
        for f in fshared:
            if of[f] <= 0:
                continue
            r = nf[f] / of[f]
            if (r > band or r < 1 / band) and abs(nf[f] - of[f]) > 0.5:
                moved += 1
                print(f"  {f:20s} {of[f]:7.2f} -> {nf[f]:7.2f}  ({r:.2f}x)")
        if not moved:
            print("  no family beyond the band")
        sys.exit(0)

    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if not shared:
        # disjoint full query maps: nothing was actually compared, so
        # 'clean' would be a lie — unevaluable, like the fshared case
        print("ERROR: the two full query maps share no queries — "
              "cannot evaluate")
        sys.exit(2)
    ot = sum(oq[q] for q in shared)
    nt = sum(nq[q] for q in shared)
    print(f"shared queries: {len(shared)}  subtotal {ot:.1f} -> {nt:.1f} s "
          f"({nt / ot:.2f}x)" if ot else "no shared queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    # family subtotals over shared queries only: recompute from the
    # query map so additive entries can't masquerade as regressions
    FAMILIES = load_families()  # raises SystemExit(2) if unreadable
    flagged = 0
    print("\nfamily (shared-query subtotals, |move| > band AND > 0.5 s):")
    for fam, members in FAMILIES.items():
        ms = [q for q in members if q in oq and q in nq]
        if not ms:
            continue
        o = sum(oq[q] for q in ms)
        n = sum(nq[q] for q in ms)
        if o <= 0:
            continue
        r = n / o
        if (r > band or r < 1 / band) and abs(n - o) > 0.5:
            flagged += 1
            print(f"  {fam:20s} {o:7.2f} -> {n:7.2f}  ({r:.2f}x)  "
                  f"[{len(ms)} shared queries]")
    if not flagged:
        print("  none beyond the band")

    print("\nquery moves beyond 1.3x (noise threshold — informational):")
    noisy = 0
    for q in shared:
        if oq[q] <= 0:
            continue
        r = nq[q] / oq[q]
        if (r > 1.3 or r < 1 / 1.3) and abs(nq[q] - oq[q]) > 0.3:
            noisy += 1
            print(f"  {q:35s} {oq[q]:7.2f} -> {nq[q]:7.2f}  ({r:.2f}x)")
    if not noisy:
        print("  none")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
