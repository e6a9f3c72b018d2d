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
