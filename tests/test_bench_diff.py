"""bench_diff.py exit-code contract (see its docstring): 0 = clean or
informational fallback, 1 = family move beyond the band on full query
maps, 2 = unevaluable input. Pure subprocess tests — no Spark."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "bench_diff.py")


def _families():
    import ast

    tree = ast.parse(open(os.path.join(REPO, "bench.py")).read())
    for node in ast.walk(tree):
        if isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                [node.target] if isinstance(node, ast.AnnAssign) else node.targets
            )
            for t in targets:
                if isinstance(t, ast.Name) and t.id == "FAMILIES":
                    return ast.literal_eval(node.value)
    raise AssertionError("FAMILIES not found in bench.py")


def _fake_bench(times: dict) -> dict:
    return {"metric": "t", "queries": times, "value": sum(times.values())}


def _run(a, b, tmp_path):
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    return subprocess.run(
        [sys.executable, SCRIPT, str(pa), str(pb)],
        capture_output=True,
        text=True,
        cwd=REPO,
    )


def _base_times():
    # >= 50 queries so the full-map path engages; one real family's
    # members included so a family subtotal exists to move
    fam, members = next(
        (f, ms) for f, ms in _families().items() if len(ms) >= 2
    )
    times = {m: 1.0 for m in members}
    times.update({f"filler_{i}": 0.5 for i in range(60)})
    return fam, members, times


def test_exit0_when_inside_band(tmp_path):
    _, _, times = _base_times()
    p = _run(_fake_bench(times), _fake_bench(dict(times)), tmp_path)
    assert p.returncode == 0, p.stdout + p.stderr


def test_exit1_on_family_move(tmp_path):
    _, members, times = _base_times()
    moved = dict(times)
    for m in members:
        moved[m] = 2.0  # 2x the family, well beyond band and 0.5 s
    p = _run(_fake_bench(times), _fake_bench(moved), tmp_path)
    assert p.returncode == 1, p.stdout + p.stderr


def test_exit2_on_unevaluable_input(tmp_path):
    p = _run({"tail": "garbage, no json here"}, {"tail": "also garbage"}, tmp_path)
    assert p.returncode == 2, p.stdout + p.stderr


def test_fallback_families_path_is_informational(tmp_path):
    # truncated wrappers with families only: reports, never exits 1
    a = {"tail": '... "families": {"famx": 1.0, "famy": 4.0}, "value": 5.0}\n'}
    b = {"tail": '... "families": {"famx": 1.0, "famy": 9.0}, "value": 10.0}\n'}
    p = _run(a, b, tmp_path)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "informational" in p.stdout


def test_two_line_contract_head_truncated_families(tmp_path):
    # bench.py r10+ contract (VERDICT r09 #2): families ride their own
    # PRECEDING line; the driver's 2,000-char tail may cut that line's
    # head. The salvager must attach the surviving family fragment to
    # the intact final compact line.
    fam_names = list(_families())[:4]
    fams = {f: 1.0 + i for i, f in enumerate(fam_names)}
    fam_line = json.dumps({"families": fams})
    final = json.dumps(
        {"metric": "headline_queries_total_sec", "value": 10.0,
         "unit": "sec", "sf": 0.1, "n_queries": 161,
         "per_query_record": "BENCH_LOCAL_sf0.1.json"}
    )
    # cut the families line's head past the '"families": {' marker
    cut = fam_line[len('{"families": {"') + len(fam_names[0]) + 6:]
    a = {"tail": cut + "\n" + final + "\n"}
    b = {"tail": fam_line + "\n" + final + "\n"}
    p = _run(a, b, tmp_path)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "salvaged" in p.stdout
    assert "shared families" in p.stdout


def test_markerless_head_truncated_single_line_salvage(tmp_path):
    # the r9-style failure: ONE compact line whose head (including the
    # '"families": {' marker AND '{"metric"') is cut. Bare pairs must
    # be classified against the live FAMILIES literal.
    fam_names = list(_families())[:5]
    pairs = ", ".join(f'"{f}": {1.0 + i}' for i, f in enumerate(fam_names))
    tail_a = (pairs[20:] + ', "value": 15.0, "unit": "sec", '
              '"sf": 0.1, "n_queries": 161}')
    tail_b = (pairs[20:] + ', "value": 15.5, "unit": "sec", '
              '"sf": 0.1, "n_queries": 161}')
    p = _run({"tail": tail_a}, {"tail": tail_b}, tmp_path)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "salvaged" in p.stdout
    assert "shared families" in p.stdout


def test_r09_driver_record_now_salvages():
    # the actual regression artifact: BENCH_r09.json (parsed=null,
    # head-truncated mid-families tail) must yield family timings
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(REPO, "scripts", "bench_diff.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    d = mod.load(os.path.join(REPO, "BENCH_r09.json"))
    assert d.get("_salvaged")
    assert len(d.get("families", {})) >= 70, len(d.get("families", {}))


def test_marker_path_salvage_accepts_scientific_notation(tmp_path):
    # same ADVICE r10 class, other code path: when the "families"/
    # "queries" MARKER survives truncation (no intact final metric
    # line), the sub-object findall and the "value" fallback must also
    # accept e-notation
    fams = list(_families().items())
    fam, member = fams[0][0], fams[0][1][0]
    tail = ('"queries": {"%s": 3.1e-05}, "families": {"%s": 1.5e-05}, '
            '"value": 9.5e-01, "unit": "sec"}' % (member, fam))
    p = _run({"tail": tail}, {"tail": tail}, tmp_path)
    assert p.returncode == 0, p.stdout + p.stderr
    import re
    m = re.search(r"shared families: (\d+)", p.stdout)
    assert m and int(m.group(1)) == 1, p.stdout


def test_salvage_accepts_scientific_notation(tmp_path):
    # ADVICE r10: json.dumps emits e-notation below 1e-4; a sub-0.1ms
    # timing in a truncated tail must parse, not drop or mis-parse.
    fam_names = list(_families())[:3]
    vals = ["1.5e-05", "2.0", "3.25E+00"]
    pairs = ", ".join(f'"{f}": {v}' for f, v in zip(fam_names, vals))
    tail = (pairs[5:] + ', "value": 5.2, "unit": "sec", '
            '"sf": 0.1, "n_queries": 161}')
    p = _run({"tail": tail}, {"tail": tail}, tmp_path)
    assert p.returncode == 0, p.stdout + p.stderr
    # all three families (incl. the e-notation ones) must be shared
    assert "salvaged" in p.stdout
    import re
    m = re.search(r"shared families: (\d+)", p.stdout)
    assert m and int(m.group(1)) == 2, p.stdout  # first pair's head is cut
