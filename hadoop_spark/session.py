"""SparkSession factory.

Replaces the reference's job-submission machinery (Job/JobSubmitter/MRAppMaster,
`hadoop-mapreduce-client-core/.../mapreduce/Job.java`,
`JobSubmitter.java:138`) with a single tuned SparkSession: the "cluster" is
configured once, queries are lazy DataFrame plans, and Catalyst + AQE replace
the hand-wired per-job configuration knobs (io.sort.mb, combiner classes,
speculative execution flags — all built into Spark).

Scale notes (targets a 1000-executor cluster even though tests run local):
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch — replaces the reference's RehashPartitioner and
  hand-tuned reduce counts.
- shuffle.partitions defaults to cores locally; on a real cluster this is
  overridden by AQE coalescing from `adaptive.coalescePartitions`.
- Arrow enabled: every Python-boundary crossing (pandas UDFs, toPandas) is
  batched, the analogue of the reference's typed-bytes streaming protocol
  (`hadoop-streaming/.../typedbytes/TypedBytesInput.java:34`) but columnar.
- Session timezone pinned UTC so timestamp semantics are stable across
  engines (and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session(
    app_name: str = "hadoop_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    On a real cluster ``master`` comes from spark-submit; locally we default to
    ``local[$SPARK_GRAFT_CPUS]`` (all cores if unset).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        ncores = os.cpu_count() or 8
        shuffle_partitions = int(cpus) if cpus.isdigit() else ncores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # 128 MiB input partitions — same placement unit as the reference's
        # HDFS block (HdfsClientConfigKeys.java:32).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # Spark 4.1's unix-domain-socket transport for Python workers stalls
        # worker handoff under concurrent grouped-Python stages (tasks wait
        # tens of seconds in ReaderInputStream.read while workers sit idle
        # in recv) — measured 5-20x wall-clock inflation on the blocked-GEMM
        # cogroup. TCP transport has none of this.
        .config("spark.python.unix.domain.socket.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
