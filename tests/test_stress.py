"""Short-run wrapper around scripts/stress_test.py — the concurrency
class the reference only covers in script/compact_test.py:23-58 (flood
upserts during compaction with concurrent readers, zero failed reads).

The full 60 s harness runs standalone (python scripts/stress_test.py);
here a ~20 s slice gates CI. Regression targets this caught on its
first runs, both now fixed:
- directory-swap overwrite deleted files under an in-flight FileScanRDD
  (now generation dirs + atomic pointer flip, catalog._atomic_overwrite)
- first tombstone append exposed a footerless dir to schema inference
  (now an explicit-schema read, catalog.read_tombstones)
"""

import subprocess
import sys
from pathlib import Path


def test_stress_short():
    script = Path(__file__).resolve().parent.parent / "scripts" / "stress_test.py"
    proc = subprocess.run(
        [sys.executable, str(script), "20"],
        capture_output=True, text=True, timeout=300,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-5:])
    assert proc.returncode == 0, f"stress harness failed:\n{tail}"
    assert "PASS" in proc.stdout, tail
