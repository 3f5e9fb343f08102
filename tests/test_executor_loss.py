"""Node-failure fault tolerance demonstrated for real: a worker process
is SIGKILLed mid-job, taking its executor AND its shuffle files with it;
the job must (a) survive on the remaining executor, (b) re-run the map
tasks whose shuffle output died with the worker (the reference's
TaskTracker-failure re-execution — `MR-APP/.../JobImpl.java` node-failure
handling: completed maps on a lost node are re-run because their
intermediate output is unreachable), and (c) produce the exactly-right
answer anyway.

Runs on the same two-distinct-hostname standalone cluster as
tests/test_speculation.py; here the second hostname just guarantees the
map tasks spread across BOTH executors, so the kill provably destroys
needed shuffle output rather than an idle process.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pytest

from tests.standalone_cluster import SPARK_CLASS, two_host_cluster

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

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

spark = (
    SparkSession.builder.master(master)
    .appName("executor_loss_probe")
    .config("spark.ui.enabled", "false")
    .config("spark.executor.cores", "2")
    .config("spark.executor.memory", "768m")
    .config("spark.cores.max", "4")
    # don't start the job until BOTH executors hold cores, so the map
    # wave provably spreads across the two workers
    .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
    # fail fast on real scheduling trouble; FetchFailed does NOT count
    # toward task failures, so recovery is exercised, not masked
    .config("spark.task.maxFailures", "2")
    .getOrCreate()
)
sc = spark.sparkContext
sc.setLogLevel("ERROR")


def map_side(pid, it):
    ctx = TaskContext.get()
    # one marker per PHYSICAL map-task attempt: re-executed maps (same
    # partition, new taskAttemptId) are visible as extra files
    open(os.path.join(workdir, f"s1_p{pid}_t{ctx.taskAttemptId()}"), "w").close()
    time.sleep(1.0)  # spread the wave across both executors
    for x in it:
        yield (x % 16, x)


def reduce_side(kv):
    k, vals = kv
    # the reduce wave is slow enough that the pytest side can kill a
    # worker while reduces (and the shuffle fetch) are in flight
    open(os.path.join(workdir, f"s2_k{k}_{time.time_ns()}"), "w").close()
    time.sleep(1.5)
    return (k, sum(vals))


t0 = time.time()
result = (
    sc.parallelize(range(4000), 8)
    .mapPartitionsWithIndex(map_side)
    .groupByKey(16)
    .map(reduce_side)
    .collect()
)
wall = time.time() - t0

s1 = sorted(os.path.basename(p) for p in glob.glob(os.path.join(workdir, "s1_*")))
print(json.dumps({
    "result": sorted(result),
    "wall": wall,
    "s1_attempts": s1,
}))
spark.stop()
"""


def test_job_survives_worker_kill_and_recomputes_lost_shuffle(tmp_path):
    if not os.path.exists(SPARK_CLASS):
        pytest.skip("no Spark distribution for a standalone cluster")
    script = tmp_path / "probe.py"
    script.write_text(_DRIVER.replace("__REPO__", _REPO))
    with two_host_cluster(tmp_path, port=7093) as (master, workers):
        proc = subprocess.Popen(
            [sys.executable, str(script), str(tmp_path), master],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        # wait until the reduce wave is running (shuffle outputs written,
        # some already fetched), then SIGKILL one worker — executor and
        # its shuffle files die with it
        deadline = time.time() + 180
        while time.time() < deadline:
            if len(glob.glob(str(tmp_path / "s2_*"))) >= 2:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.2)
        assert len(glob.glob(str(tmp_path / "s2_*"))) >= 2, "reduce wave never started"
        os.kill(workers[0].pid, signal.SIGKILL)

        out, err = proc.communicate(timeout=300)
    assert proc.returncode == 0, err[-3000:]
    payload = json.loads(out.strip().splitlines()[-1])

    # exactly-once semantics despite the lost node: each of the 16 keys
    # sums its residue class over range(4000) — nothing lost, nothing
    # double-counted from re-executed maps
    expected = sorted((k, sum(range(k, 4000, 16))) for k in range(16))
    assert [tuple(r) for r in payload["result"]] == expected

    # the lost node's completed map output was re-computed: more physical
    # map-task attempts than the 8 partitions (reference parity with
    # re-running completed maps of a failed TaskTracker)
    parts = {m.split("_")[1] for m in payload["s1_attempts"]}
    assert len(parts) == 8
    assert len(payload["s1_attempts"]) > 8, payload["s1_attempts"]
