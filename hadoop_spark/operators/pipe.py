"""External-executable pipe operator — Hadoop Streaming parity.

The reference's flagship UDF story is piping records through any executable
via stdin/stdout (`hadoop-tools/hadoop-streaming/.../PipeMapper.java:39`,
`PipeReducer.java:41`; process spawn `PipeMapRed.java:207`), with a stderr
side-channel for counters (`reporter:counter:<group>,<name>,<amount>`).

Spark-first translation: the Arrow-batched Python worker IS the modern
version of this (every pandas UDF is "streaming" in the reference's sense),
so :func:`pipe` exists for literal script parity — `-mapper /bin/grep`-style
jobs — and is the ONE deliberate drop below the DataFrame API in this engine
(SURVEY §7 risk (a)). It rides `RDD.pipe`, which spawns the command once per
partition and streams lines through it — same process lifecycle as the
reference's one-process-per-task.

Scale: one subprocess per partition (not per row); throughput is bounded by
the pipe and the external binary, exactly like Hadoop Streaming. Counters
ride a Spark accumulator, the direct analogue of the reference's counter
RPC (`MR-CORE/mapreduce/Counters.java:41`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

COUNTER_PREFIX = "reporter:counter:"


def pipe(
    df: DataFrame,
    command: str,
    line_col: str | None = None,
    out_col: str = "line",
) -> DataFrame:
    """Pipe one text line per row through `command` (spawned once per
    partition); the command's stdout lines become the output rows.

    `line_col`: which column carries the line (default: the single column,
    or a tab-joined rendering of all columns — TextOutputFormat's wire
    format, which is what a Hadoop Streaming mapper would have seen)."""
    spark = df.sparkSession
    if line_col is not None:
        lines = df.select(F.col(line_col).cast("string"))
    elif len(df.columns) == 1:
        lines = df.select(F.col(df.columns[0]).cast("string"))
    else:
        lines = df.select(
            F.concat_ws("\t", *[F.col(c).cast("string") for c in df.columns])
        )
    piped = lines.rdd.map(lambda r: r[0]).pipe(command)
    schema = StructType([StructField(out_col, StringType(), True)])
    return spark.createDataFrame(piped.map(lambda line: (line,)), schema)


def pipe_with_counters(
    df: DataFrame, command: str, line_col: str | None = None, out_col: str = "line"
) -> tuple[DataFrame, "CounterAccumulator"]:
    """:func:`pipe` + the streaming counter protocol: the external command's
    stderr lines of the form ``reporter:counter:group,name,amount`` are
    aggregated into a driver-visible counter map (Hadoop's stderr protocol,
    `PipeMapRed.java`). Other stderr output is passed through to the task
    log, like the reference does.

    Implementation note: RDD.pipe exposes stdout only, so the counter
    variant runs the subprocess via mapPartitions + subprocess and parses
    stderr per partition."""
    import subprocess

    spark = df.sparkSession
    acc = CounterAccumulator(spark)

    if line_col is not None:
        lines = df.select(F.col(line_col).cast("string"))
    elif len(df.columns) == 1:
        lines = df.select(F.col(df.columns[0]).cast("string"))
    else:
        lines = df.select(
            F.concat_ws("\t", *[F.col(c).cast("string") for c in df.columns])
        )

    counters = acc.acc
    cmd = command

    def run_partition(rows):
        proc = subprocess.Popen(
            cmd,
            shell=True,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        payload = "".join(r[0] + "\n" for r in rows if r[0] is not None)
        out, err = proc.communicate(payload)
        local: dict[tuple[str, str], int] = {}
        for eline in err.splitlines():
            if eline.startswith(COUNTER_PREFIX):
                try:
                    group, name, amount = eline[len(COUNTER_PREFIX):].split(",", 2)
                    key = (group, name)
                    local[key] = local.get(key, 0) + int(amount)
                except ValueError:
                    pass
        if local:
            counters.add(local)
        for line in out.splitlines():
            yield (line,)

    schema = StructType([StructField(out_col, StringType(), True)])
    out_df = spark.createDataFrame(lines.rdd.mapPartitions(run_partition), schema)
    return out_df, acc


class CounterAccumulator:
    """Distributed counter map: {(group, name): long}, merged at the driver —
    the Counters analogue (`MR-CORE/mapreduce/Counters.java:41`)."""

    def __init__(self, spark: SparkSession):
        from pyspark.accumulators import AccumulatorParam

        class _DictSum(AccumulatorParam):
            def zero(self, value):
                return {}

            def addInPlace(self, a, b):
                for k, v in b.items():
                    a[k] = a.get(k, 0) + v
                return a

        self.acc = spark.sparkContext.accumulator({}, _DictSum())

    def value(self) -> dict[tuple[str, str], int]:
        return dict(self.acc.value)
