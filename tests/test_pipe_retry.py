"""A REAL task retry against the pipe counter paths: the first task
attempt is made to fail (external command exits 9 before a marker file
exists), Spark retries it (master local[2,3] allows 3 attempts), and the
counters-as-data totals must come out retry-EXACT — the committed-attempt
Counters semantics of the reference (`MR-CORE/.../Counters.java`), which
the accumulator variant only approximates (at-least-once).

Runs in a SUBPROCESS SparkSession: the shared test session is plain
local[*], whose scheduler never retries a failed task (maxFailures=1)."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import json
import sys

sys.path.insert(0, "__REPO__")
from pyspark.sql import SparkSession

from hadoop_spark.operators.pipe import pipe_with_counter_rows

marker = sys.argv[1]

spark = (
    SparkSession.builder.master("local[2,3]")  # 3 task attempts
    .appName("pipe_retry_probe")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

words = ["alpha", "bravo", "charlie", "delta", "echo"]
df = spark.createDataFrame([(w,) for w in words], "n_name string").coalesce(1)

# first attempt: marker absent -> create it and die BEFORE writing output;
# retry attempt: marker present -> upcase + emit the counter line
cmd = (
    "sh -c 'if [ ! -e " + marker + " ]; then : > " + marker + "; "
    "echo first-attempt-crash >&2; exit 9; fi; "
    "n=0; while IFS= read -r line; do n=$((n+1)); "
    "printf \"%s\n\" \"$line\" | tr a-z A-Z; done; "
    "echo \"reporter:counter:io,lines,$n\" >&2'"
)

out, counters = pipe_with_counter_rows(df, cmd)
try:
    lines = sorted(r.line for r in out.collect())
    totals = {(r.group, r.name): r.amount for r in counters.collect()}
    again = {(r.group, r.name): r.amount for r in counters.collect()}
finally:
    spark.catalog.clearCache()

print(json.dumps({
    "lines": lines,
    "totals": {f"{g}/{n}": a for (g, n), a in totals.items()},
    "again": {f"{g}/{n}": a for (g, n), a in again.items()},
}))
spark.stop()
"""


def test_counter_rows_survive_a_real_task_retry(tmp_path):
    marker = str(tmp_path / "attempt_marker")
    script = tmp_path / "probe.py"
    script.write_text(_DRIVER.replace("__REPO__", _REPO))
    proc = subprocess.run(
        [sys.executable, str(script), marker],
        capture_output=True,
        text=True,
        timeout=300,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    import json

    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    # the marker file proves the first attempt really ran and crashed
    assert os.path.exists(marker)
    assert payload["lines"] == ["ALPHA", "BRAVO", "CHARLIE", "DELTA", "ECHO"]
    # committed-attempt-only counters: exactly the 5 input lines, not 0
    # (failed attempt) and not 10 (both attempts)
    assert payload["totals"] == {"io/lines": 5}
    assert payload["again"] == payload["totals"]
