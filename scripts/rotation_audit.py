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
  - CHURN ranking (VERDICT r08 #1): an entry whose code or oracle
    changed since its latest green driver row needs re-gating MORE than
    an unchanged-but-stale one.  The driver's gate snapshot runs at an
    unknown instant WITHIN its round (the winnow memo refactor landed
    before the r07-close commit yet after the r07 gate had run), so a
    green row from round N is only safely attributed to the tree at
    round N's START — the audit therefore diffs each entry against the
    commit that closed round N-1 (CORRECTNESS_r{N-1}.json's add
    commit).  This over-flags churn that landed before the snapshot
    (costing re-gate slots, never a missed re-gate) on three surfaces:
      (a) the entry function's span in __spark_entry__.py, plus every
          module-level helper it references transitively within the
          entry file (memo builders, loaders, shared kernels),
      (b) its oracle_sql() string,
      (c) the oasisdb_spark/ module files its closure imports, expanded
          through the package's internal import graph (a change to
          pipeline/text.py flags every entry whose imports reach it).
    Churned entries preempt the staleness queue in --next proposals.
  - what the CURRENT first-50 window covers, and which of its entries
    are first-timers vs re-greens,
  - red rows per round (diagnosis stays in VERDICT/COVERAGE; this just
    surfaces them).

Usage: python scripts/rotation_audit.py [--next N] [--churn]
                                        [--since COMMIT]
  --next N       also propose the next window: anchors, never-green
                 entries, churned-since-green entries (stalest first),
                 then unchanged re-greens by staleness, filling to N
                 (default 50).
  --churn        print the per-entry churn report (implied by --next).
  --since COMMIT override the per-entry baseline with ONE explicit
                 commit for every entry — use at round close to ask
                 "what changed during THIS round after the window was
                 staged" when pre-staging the following round.

Caveat: the conservative baseline means an entry repaired early in
round N and then gated green that same round still shows as churned;
its position in the churn queue is last (staleness-ordered), so the
over-flag costs nothing until genuinely-stale churn has drained.

Read-only; exits 0 always (it reports, the staging decision is human).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY_FILE = "__spark_entry__.py"


def registry_order() -> list[str]:
    """Parse the queries() registration order from __spark_entry__.py
    WITHOUT importing it (no pyspark needed): the dict literal's
    '"name": _fn,' lines in source order."""
    src = open(os.path.join(REPO, ENTRY_FILE)).read()
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


# ---------------------------------------------------------------------------
# Churn detection (VERDICT r08 #1)
# ---------------------------------------------------------------------------


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def round_commits() -> dict[int, str]:
    """Round N -> the commit that ADDED CORRECTNESS_r{N}.json (the
    driver's round-close record commit)."""
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rel = os.path.basename(f)
        rnd = int(re.search(r"_r(\d+)\.json$", rel).group(1))
        log = _git("log", "--diff-filter=A", "--format=%H", "--", rel).split()
        if log:
            out[rnd] = log[-1]  # oldest add wins if the file was re-added
    return out


def parse_spans(src: str) -> dict[str, str]:
    """Top-level 'def name(...)' spans of a source text, name -> text
    (span runs to the next top-level def or EOF, so decorators between
    functions ride with the following span — fine for diff purposes)."""
    hits = list(re.finditer(r"^def ([A-Za-z_][A-Za-z0-9_]*)\(", src, re.M))
    spans = {}
    for i, m in enumerate(hits):
        end = hits[i + 1].start() if i + 1 < len(hits) else len(src)
        spans[m.group(1)] = src[m.start() : end]
    return spans


def parse_registry_fns(src: str) -> dict[str, str]:
    """Registry name -> entry function name, from the queries() dict.
    Lambda-bound entries (e.g. 'knn_flat_cos': lambda s, d:
    _knn_flat(s, d, "cos")) resolve to the function the lambda calls."""
    m = re.search(r"\ndef queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    if not m:
        return {}
    out = dict(re.findall(r'^\s{8}"([a-z0-9_]+)": (\w+),', m.group(1), re.M))
    out.update(re.findall(
        r'^\s{8}"([a-z0-9_]+)": lambda [a-z, ]+: (\w+)\(', m.group(1), re.M))
    return out


def parse_oracles(src: str) -> dict[str, str]:
    """Registry name -> oracle SQL text, by exec'ing the module text
    (regexing multi-line SQL literals out of source is brittle; the
    module is import-side-effect-free by driver contract).

    NOTE (ADVICE r09): for `--since`/churn runs this executes the
    module-level code of HISTORICAL commits at audit time. The
    contract is only guaranteed for HEAD; old generations are this
    repo's own git history (same trust domain as `git checkout`), so
    exec is acceptable — but a generation that raises is treated as
    UNREADABLE and every entry baselined on it is conservatively
    flagged (Generation.oracles_ok), never silently skipped."""
    import warnings

    ns: dict = {}
    # historical generations are frozen text: a sloppy escape sequence
    # in an old commit (e.g. the '\s' at r10's line 5560) would warn on
    # every audit/test run and, on future Pythons where the
    # SyntaxWarning becomes an error, turn a readable generation into a
    # spuriously UNREADABLE one — suppress compile-time escape warnings
    # for these sources only (HEAD is compiled warning-clean by pytest).
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        warnings.simplefilter("ignore", SyntaxWarning)
        code = compile(src, "<entry-generation>", "exec")
    exec(code, ns)
    return dict(ns["oracle_sql"]())


def code_only(text: str) -> str:
    """Strip triple-quoted strings (docstrings cite function names in
    prose) and # comments, so reference scans see code only."""
    text = re.sub(r'""".*?"""|\'\'\'.*?\'\'\'', "", text, flags=re.S)
    return re.sub(r"#[^\n]*", "", text)


def closure_fns(spans: dict[str, str], root: str) -> set[str]:
    """Transitive set of top-level functions reachable from `root` via
    CODE references inside span texts.  Only `_`-prefixed helpers are
    followed — the registry/driver surfaces (queries, bench_queries,
    oracle_sql, entry) reference every function and would make each
    closure the whole file."""
    seen, todo = set(), [root]
    while todo:
        fn = todo.pop()
        if fn in seen or fn not in spans:
            continue
        seen.add(fn)
        body = code_only(spans[fn])
        for other in spans:
            if (other not in seen and other.startswith("_")
                    and re.search(rf"\b{re.escape(other)}\b", body)):
                todo.append(other)
    return seen


def module_files(text: str) -> set[str]:
    """oasisdb_spark module files referenced by a source text (dotted
    references + 'from oasisdb_spark import a, b' forms), as repo-
    relative paths."""
    mods = {m.group(0) for m in re.finditer(r"\boasisdb_spark(?:\.[a-zA-Z0-9_]+)+", text)}
    for m in re.finditer(r"from oasisdb_spark import ([a-zA-Z0-9_, ]+)", text):
        for name in m.group(1).split(","):
            if name.strip():
                mods.add("oasisdb_spark." + name.strip())
    files = set()
    for mod in mods:
        p = mod.replace(".", "/")
        if os.path.isfile(os.path.join(REPO, p + ".py")):
            files.add(p + ".py")
        elif os.path.isdir(os.path.join(REPO, p)):
            files.add(p + "/__init__.py")
        else:
            # 'oasisdb_spark.index.ivf.knn_ivf'-style attribute tail:
            # walk back to the longest real module prefix
            parts = p.split("/")
            while len(parts) > 1:
                parts.pop()
                q = "/".join(parts)
                if os.path.isfile(os.path.join(REPO, q + ".py")):
                    files.add(q + ".py")
                    break
    return files


def package_reverse_closure(changed: set[str]) -> set[str]:
    """Expand a set of changed oasisdb_spark files to every package file
    whose internal imports (transitively) reach one of them."""
    graph: dict[str, set[str]] = {}
    for path in glob.glob(os.path.join(REPO, "oasisdb_spark", "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, REPO)
        graph[rel] = module_files(code_only(open(path).read())) - {rel}
    affected = set(changed)
    moved = True
    while moved:
        moved = False
        for rel, deps in graph.items():
            if rel not in affected and deps & affected:
                affected.add(rel)
                moved = True
    return affected


class Generation:
    """Parsed view of __spark_entry__.py at one commit (or worktree)."""

    def __init__(self, src: str):
        self.spans = parse_spans(src)
        self.fns = parse_registry_fns(src)
        self.oracles_ok = True
        try:
            self.oracles = parse_oracles(src)
        except Exception as exc:  # old generation no longer exec-able
            # ADVICE r09: an unreadable baseline must flag, not skip —
            # entry_churn treats oracles_ok=False as unknown-and-churned
            print(f"  [churn] WARNING: could not exec generation: {exc}")
            self.oracles = {}
            self.oracles_ok = False


def entry_churn(names: list[str], greens: dict[str, list[int]],
                since: str | None = None) -> dict[str, list[str]]:
    """Registry name -> list of churn reasons ('' list = unchanged since
    its latest green).  Entries with no green row are skipped (they are
    never-green and already preempt everything)."""
    commits = round_commits()
    head = Generation(open(os.path.join(REPO, ENTRY_FILE)).read())

    # distinct baselines to diff against: round N's green row is only
    # safely attributed to the tree at round N's START (see module
    # docstring), i.e. the commit that closed round N-1
    base_of: dict[str, str] = {}
    root_commit = None
    root_based: dict[int, list[str]] = {}
    for n in names:
        if not greens[n]:
            continue
        base = since if since else commits.get(max(greens[n]) - 1)
        if not base:
            # ADVICE r09: an entry whose N-1 close commit is missing
            # (latest green is round 1, or the prior round file has no
            # add-commit) must not silently drop out of churn tracking
            # — baseline it at the repo root commit, the maximally
            # conservative choice (everything since counts as churn)
            if root_commit is None:
                root_commit = _git(
                    "rev-list", "--max-parents=0", "HEAD"
                ).split()[0]
            root_based.setdefault(max(greens[n]) - 1, []).append(n)
            base = root_commit
        base_of[n] = base
    for rnd, ns in sorted(root_based.items()):
        # every affected entry is named, grouped by the missing round,
        # so a window staged from this printout can tell a fallback
        # baseline from real churn (round-10 self-review)
        print(f"  [churn] note: no r{rnd:02d} close commit — baselining "
              f"{len(ns)} entr{'y' if len(ns) == 1 else 'ies'} at the "
              f"repo root commit: {', '.join(ns[:8])}"
              + ("…" if len(ns) > 8 else ""))

    gens: dict[str, Generation] = {}
    changed_files: dict[str, set[str]] = {}
    for sha in sorted(set(base_of.values())):
        try:
            gens[sha] = Generation(_git("show", f"{sha}:{ENTRY_FILE}"))
        except subprocess.CalledProcessError:
            gens[sha] = Generation("")
        diff = _git("diff", "--name-only", sha, "HEAD", "--", "oasisdb_spark/")
        changed_files[sha] = package_reverse_closure(
            {f for f in diff.split() if f.endswith(".py")}
        )

    churn: dict[str, list[str]] = {}
    for n, sha in base_of.items():
        old = gens[sha]
        reasons = []
        fn = head.fns.get(n)
        if not fn:
            continue
        closure = closure_fns(head.spans, fn)
        touched = sorted(  # docstring/comment-only edits don't count
            f for f in closure
            if code_only(head.spans.get(f, "")) != code_only(old.spans.get(f, ""))
        )
        if touched:
            reasons.append("entry-fns: " + ", ".join(touched[:4])
                           + ("…" if len(touched) > 4 else ""))
        if not old.oracles_ok:
            # unreadable baseline: oracle churn is UNKNOWN — flag it
            # (conservative; ADVICE r09: never a missed re-gate)
            reasons.append("oracle-sql: baseline unreadable")
        elif old.oracles and head.oracles.get(n) != old.oracles.get(n):
            reasons.append("oracle-sql")
        deps = set()
        for f in closure:
            deps |= module_files(code_only(head.spans[f]))
        hit = sorted(deps & changed_files[sha])
        if hit:
            reasons.append("modules: " + ", ".join(
                os.path.basename(f) for f in hit[:5])
                + ("…" if len(hit) > 5 else ""))
        churn[n] = reasons
    return churn


def main() -> None:
    argv = sys.argv[1:]
    next_n = None
    since = None
    want_churn = "--churn" in argv
    if "--next" in argv:
        i = argv.index("--next")
        next_n = 50
        if len(argv) > i + 1:
            try:
                next_n = int(argv[i + 1])
            except ValueError:
                pass  # non-numeric follower (flag/typo): keep default 50
    if "--since" in argv:
        i = argv.index("--since")
        if len(argv) <= i + 1:
            raise SystemExit("--since requires a commit argument")
        since = argv[i + 1]

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

    churn: dict[str, list[str]] = {}
    if want_churn or next_n:
        churn = entry_churn(names, greens, since=since)
        changed = [n for n in names if churn.get(n)]
        label = f"since {since}" if since else "since their latest-green round commit"
        print(f"\nchurned entries ({len(changed)}) — code or oracle changed {label}:")
        for n in sorted(changed, key=lambda n: (max(greens[n]), names.index(n))):
            print(f"  r{max(greens[n]):02d}  {n:35s} {'; '.join(churn[n])}")
        # The figure COVERAGE.md's window paragraph quotes (VERDICT r10
        # #2): churned entries the CURRENT window does not cover — what
        # remains as the next round's re-green queue if the gate greens
        # the window as staged. Printed directly so round_close.py's
        # paste block (and the human refreshing COVERAGE.md) never does
        # the in-window subtraction by hand.
        behind = [n for n in changed if n not in window]
        nv_behind = [n for n in never if n not in window]
        print(
            f"behind-window backlog: {len(behind)} churned"
            + (f" + {len(nv_behind)} never-green ({', '.join(nv_behind)})"
               if nv_behind else "")
            + f" ({len(changed) - len(behind)} of the churned are in-window)"
        )

    if next_n:
        proposal = [n for n in names[:2]]  # standing anchors stay
        proposal += [n for n in never if n not in proposal]
        # churned entries preempt the pure-staleness queue: DIRECT churn
        # (the entry's own function span or oracle SQL changed) before
        # module-dep-only churn, each tier stalest first — direct churn
        # is the entry's own semantics; module churn is the (wider,
        # more conservative) transitive-import signal
        def direct(n: str) -> bool:
            return any(r.startswith(("entry-fns", "oracle-sql"))
                       for r in churn.get(n, []))

        churned_q = [n for n in regreens if churn.get(n) and n not in proposal]
        for n in sorted(churned_q, key=lambda n: (not direct(n),
                                                  max(greens[n]),
                                                  names.index(n))):
            if len(proposal) >= next_n:
                break
            proposal.append(n)
        for n in regreens:
            if len(proposal) >= next_n:
                break
            if n not in proposal:
                proposal.append(n)
        n_churned = len([n for n in churned_q if n in proposal])
        print(f"\nproposed next window ({len(proposal[:next_n])} entries; "
              f"2 anchors + {len([n for n in never if n not in names[:2]])} "
              f"never-green + {n_churned} churned + stalest re-greens):")
        for i, n in enumerate(proposal[:next_n], 1):
            tag = "NEVER-GREEN" if not greens[n] else f"r{max(greens[n]):02d}"
            flag = "  CHURNED: " + "; ".join(churn[n]) if churn.get(n) else ""
            print(f"  {i:2d}. {n:35s} {tag}{flag}")


if __name__ == "__main__":
    main()
