"""The external gate runs __spark_entry__ on a BARE SparkSession —
none of session.py's tuned configs exist there. These tests drive the
driver contract in a fresh subprocess JVM with default configs (a
vanilla session cannot be created in the test JVM: getOrCreate would
return the tuned shared session), covering the config-dependence class
the tuned-session suite is structurally blind to:

  - entry() end-to-end (its own sf0.001 load path),
  - one events-touching query (the TIMESTAMP(NANOS) read needs the
    sources/tables.py runtime-config retry — the scariest vanilla path),
  - one streaming twin (state-store partitioning follows the session's
    200 default shuffle partitions instead of the tuned 32).

Full-window vanilla validation stays in scripts/check_oracle.py
--vanilla (round close); this is the fast continuous guard.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("vanilla_test").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m

rows = m.entry(spark).collect()
assert len(rows) >= 1, "entry() returned no rows"

sf = "/root/testdata/sf0.001"
qs = m.queries()
n = qs["events_ohlc"](spark, sf).count()
assert n >= 1, "events_ohlc empty on vanilla session"
n = qs["events_cusum_stream"](spark, sf).count()
assert n >= 1, "events_cusum_stream empty on vanilla session"
print("VANILLA_OK")
spark.stop()
"""


def test_driver_contract_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert "VANILLA_OK" in proc.stdout, (
        f"vanilla-session driver contract failed\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
