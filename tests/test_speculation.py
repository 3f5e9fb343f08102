"""Speculative execution demonstrated for real, not just conf'd
(`MR-APP/.../speculate/DefaultSpeculator.java:57` parity): with
spark.speculation on, a straggler task attempt is speculatively re-run,
the job completes as soon as the FAST copy succeeds (wall time far below
the straggler's sleep budget), and the result is exactly-once — the
duplicate attempt's output is discarded by the scheduler, not summed.

Why the elaborate harness: speculation is a silent no-op in local[*]
(TaskSchedulerImpl only starts its speculation thread in non-local
deployments), and even in local-cluster mode the TaskSetManager refuses
to schedule a speculative attempt on a HOST that already has a running
attempt — so a single-hostname cluster can detect stragglers but never
re-run them. This test stands up a real standalone master plus TWO
workers registered under different hostnames (localhost / 127.0.0.1 —
same machine, distinct host strings), which is the smallest topology
where a speculative copy can actually launch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from tests.standalone_cluster import SPARK_CLASS, two_host_cluster as _cluster

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "__REPO__")
from pyspark import TaskContext
from pyspark.sql import SparkSession

workdir = sys.argv[1]
master = sys.argv[2]
SLEEP_S = 240  # straggler budget; the test asserts we never wait this out

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

spark = (
    SparkSession.builder.master(master)
    .appName("speculation_probe")
    .config("spark.ui.enabled", "false")
    .config("spark.executor.cores", "2")
    .config("spark.executor.memory", "768m")
    .config("spark.cores.max", "4")
    .config("spark.speculation", "true")
    .config("spark.speculation.interval", "100ms")
    .config("spark.speculation.multiplier", "1.2")
    .config("spark.speculation.quantile", "0.4")
    .config("spark.locality.wait", "0s")
    .getOrCreate()
)
sc = spark.sparkContext
sc.setLogLevel("ERROR")

# BOTH workers must have registered executors before the job starts: with
# only one host up, a speculative attempt can never schedule (TaskSetManager
# refuses the host that already runs attempt 0) and the test flakes on
# worker-registration latency under load. getExecutorInfos() includes the
# driver, so 2 executors = 3 entries.
deadline = time.time() + 90
while time.time() < deadline:
    if len(sc._jsc.sc().statusTracker().getExecutorInfos()) >= 3:
        break
    time.sleep(0.5)
else:
    raise RuntimeError("second worker's executor never registered")

done_flag = os.path.join(workdir, "job_done")


def work(pid, it):
    ctx = TaskContext.get()
    attempt = ctx.attemptNumber()
    # evidence trail: every (partition, attempt) that ever started
    open(os.path.join(workdir, f"started_p{pid}_a{attempt}"), "w").close()
    if pid == 7 and attempt == 0:
        # the straggler: attempt 0 of partition 7 stalls until either the
        # job finished without it (speculation worked) or the budget runs
        # out (speculation failed -> the wall-clock assertion fails)
        waited = 0.0
        while waited < SLEEP_S and not os.path.exists(done_flag):
            time.sleep(0.25)
            waited += 0.25
    return [sum(it)]


t0 = time.time()
total = sc.parallelize(range(800), 8).mapPartitionsWithIndex(work).sum()
wall = time.time() - t0
open(done_flag, "w").close()  # release the (killed-or-still-sleeping) straggler

started = sorted(os.path.basename(p) for p in glob.glob(os.path.join(workdir, "started_*")))
print(json.dumps({"total": total, "wall": wall, "started": started}))
spark.stop()
"""


@pytest.fixture()
def two_host_cluster(tmp_path):
    """Standalone master + two single-executor workers whose registered
    hostnames differ (localhost vs 127.0.0.1), yielding the master URL."""
    if not os.path.exists(SPARK_CLASS):
        pytest.skip("no Spark distribution for a standalone cluster")
    with _cluster(tmp_path, port=7091) as (master, _workers):
        yield master


def test_straggler_is_speculatively_rerun_exactly_once(tmp_path, two_host_cluster):
    script = tmp_path / "probe.py"
    script.write_text(_DRIVER.replace("__REPO__", _REPO))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path), two_host_cluster],
        capture_output=True,
        text=True,
        timeout=420,
        check=False,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])

    # exactly-once result: sum(range(800)) counted once, even though two
    # attempts of partition 7 produced output
    assert payload["total"] == sum(range(800))

    # the speculative copy really launched: partition 7 has BOTH attempt 0
    # (the straggler) and a later attempt (the speculation)
    p7 = {s for s in payload["started"] if s.startswith("started_p7_")}
    assert "started_p7_a0" in p7
    assert len(p7) >= 2, payload["started"]
    # every fast partition ran its first attempt. (A spurious speculative
    # copy of a fast partition is ALLOWED — under system load their median
    # inflates and the scheduler may legitimately speculate one; exactly-
    # once is what matters and the `total` assertion above pins it.)
    for i in range(7):
        assert f"started_p{i}_a0" in payload["started"], payload["started"]

    # the job finished on the speculative copy's timeline, nowhere near
    # the straggler's 240 s budget (generous bound for scheduler jitter)
    assert payload["wall"] < 90, f"speculation did not rescue the job: {payload['wall']}s"
    assert time.time() - t0 < 300
