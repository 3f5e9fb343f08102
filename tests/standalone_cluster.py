"""A real two-worker standalone Spark cluster for runtime-behavior tests
(speculation, executor loss) that local[*] cannot exercise.

The two workers register under DIFFERENT hostnames (localhost /
127.0.0.1 — same machine, distinct host strings): speculative attempts
never schedule on a host that already has a running attempt, so a
single-hostname cluster could detect stragglers but never re-run them.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from contextlib import contextmanager

_SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(_SPARK_HOME, "bin", "spark-class")


def _wait_port(port: int, timeout: float = 60.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        with socket.socket() as s:
            s.settimeout(1.0)
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


@contextmanager
def two_host_cluster(tmp_path, port: int = 7091, cores: int = 2, memory: str = "1g"):
    """Yield (master_url, worker_procs) for a master + two workers on
    distinct host strings; tears everything down on exit."""
    env_base = {
        **os.environ,
        "SPARK_LOG_DIR": str(tmp_path / "logs"),
        "SPARK_WORKER_DIR": str(tmp_path / "work"),
        "SPARK_NO_DAEMONIZE": "1",
        "PYSPARK_PYTHON": sys.executable,
    }
    procs: list[subprocess.Popen] = []
    workers: list[subprocess.Popen] = []
    try:
        procs.append(
            subprocess.Popen(
                [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
                 "--host", "127.0.0.1", "--port", str(port), "--webui-port", "0"],
                env={**env_base, "SPARK_LOCAL_HOSTNAME": "127.0.0.1"},
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        )
        _wait_port(port)
        for host in ("localhost", "127.0.0.1"):
            w = subprocess.Popen(
                [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                 "--host", host, "--port", "0", "--webui-port", "0",
                 "--cores", str(cores), "--memory", memory,
                 f"spark://127.0.0.1:{port}"],
                env={**env_base, "SPARK_LOCAL_HOSTNAME": host},
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            procs.append(w)
            workers.append(w)
        yield f"spark://127.0.0.1:{port}", workers
    finally:
        for p in reversed(procs):
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()
