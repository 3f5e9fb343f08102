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
STATUS_PREFIX = "reporter:status:"


def _spawn_captured(target):
    """Start a daemon thread that records any exception instead of dying
    silently. Returns (thread, error_slot); after join(), the caller MUST
    re-raise error_slot[0] if present — a writer thread that dies (e.g.
    tb_encode rejecting a NULL, or an OSError on a closed pipe) otherwise
    closes stdin in its finally and the partition yields truncated output
    with no task failure."""
    import threading

    err: list[BaseException] = []

    def run():
        try:
            target()
        except BaseException as e:  # noqa: BLE001 — re-raised on the task thread
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t, err


def _check_exit(proc, command: str, check_exit: bool) -> None:
    """Fail the task on nonzero subprocess exit, like the reference
    (`PipeMapRed.java` `stream.non.zero.exit.is.failure`, default true):
    a mapper that crashed or was OOM-killed must not silently contribute
    a partial partition. `check_exit=False` opts out for commands whose
    nonzero exit is benign (e.g. `grep` with no matches exits 1)."""
    rc = proc.wait()
    if check_exit and rc != 0:
        raise RuntimeError(f"piped command {command!r} exited with code {rc}")


def pipe(
    df: DataFrame,
    command: str,
    line_col: str | None = None,
    out_col: str = "line",
    check_exit: bool = True,
) -> DataFrame:
    """Pipe one text line per row through `command` (spawned once per
    partition); the command's stdout lines become the output rows.

    `line_col`: which column carries the line (default: the single column,
    or a tab-joined rendering of all columns — TextOutputFormat's wire
    format, which is what a Hadoop Streaming mapper would have seen).

    `check_exit` mirrors the reference's `stream.non.zero.exit.is.failure`
    (default true): the task fails if the command exits nonzero."""
    spark = df.sparkSession
    if line_col is not None:
        lines = df.select(F.col(line_col).cast("string"))
    elif len(df.columns) == 1:
        lines = df.select(F.col(df.columns[0]).cast("string"))
    else:
        lines = df.select(
            F.concat_ws("\t", *[F.col(c).cast("string") for c in df.columns])
        )
    piped = lines.rdd.map(lambda r: r[0]).pipe(command, checkCode=check_exit)
    schema = StructType([StructField(out_col, StringType(), True)])
    return spark.createDataFrame(piped.map(lambda line: (line,)), schema)


def pipe_with_counters(
    df: DataFrame,
    command: str,
    line_col: str | None = None,
    out_col: str = "line",
    check_exit: bool = True,
) -> tuple[DataFrame, "CounterAccumulator"]:
    """:func:`pipe` + the streaming counter protocol: the external command's
    stderr lines of the form ``reporter:counter:group,name,amount`` are
    aggregated into a driver-visible counter map (Hadoop's stderr protocol,
    `PipeMapRed.java`). Other stderr output is passed through to the task
    log, like the reference does.

    COUNTER SEMANTICS CAVEAT: the accumulator is updated from inside a
    transformation, so counts are AT-LEAST-ONCE — a retried/speculated
    task, or a second action over the un-cached lineage, adds again
    (Spark only guarantees exactly-once accumulator updates in actions).
    The reference counts only committed task attempts. When counter
    values feed downstream logic (not just progress reporting), use
    :func:`pipe_with_counter_rows`, which emits counters as data and is
    exactly-once per action (tested in tests/test_pipe_counters.py).

    Implementation note: RDD.pipe exposes stdout only, so the counter
    variant runs the subprocess via mapPartitions + subprocess and parses
    stderr per partition. I/O is fully streamed — a writer thread feeds
    stdin row-by-row while stdout is consumed incrementally and stderr is
    drained on its own thread (the reference's exact architecture:
    `PipeMapRed.java:293` output/err threads) — so memory per task is
    O(pipe buffer), not O(partition), and a partition larger than the OS
    pipe buffer cannot deadlock. Writer/stderr-thread exceptions are
    captured and re-raised on the task thread (a silent thread death would
    truncate the partition); nonzero subprocess exit fails the task unless
    `check_exit=False`."""
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
        local: dict[tuple[str, str], int] = {}

        def feed_stdin():
            try:
                for r in rows:
                    if r[0] is not None:
                        proc.stdin.write(r[0] + "\n")
            except BrokenPipeError:
                pass  # command exited early (e.g. head) — not an error
            finally:
                try:
                    proc.stdin.close()
                except BrokenPipeError:
                    pass

        last_status: list[str] = []

        def drain_stderr():
            for eline in proc.stderr:
                eline = eline.rstrip("\n")
                if eline.startswith(COUNTER_PREFIX):
                    try:
                        group, name, amount = eline[len(COUNTER_PREFIX):].split(",", 2)
                        key = (group, name)
                        local[key] = local.get(key, 0) + int(amount)
                    except ValueError:
                        pass
                elif eline.startswith(STATUS_PREFIX):
                    # reporter:status:<text> (PipeMapRed stderr protocol):
                    # the task's human-readable status line; LAST one wins,
                    # like the reference's TaskReporter.setStatus.
                    status = eline[len(STATUS_PREFIX):]
                    if last_status:
                        last_status[0] = status
                    else:
                        last_status.append(status)

        writer, werr = _spawn_captured(feed_stdin)
        errt, eerr = _spawn_captured(drain_stderr)
        for line in proc.stdout:
            yield (line.rstrip("\n"),)
        writer.join()
        errt.join()
        if werr:
            raise werr[0]
        if eerr:
            raise eerr[0]
        _check_exit(proc, cmd, check_exit)
        if local:
            counters.add(local)
        if last_status:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId() if TaskContext.get() else -1
            statuses.add({pid: last_status[0]})

    statuses = acc.status_acc
    schema = StructType([StructField(out_col, StringType(), True)])
    out_df = spark.createDataFrame(lines.rdd.mapPartitions(run_partition), schema)
    return out_df, acc


def pipe_with_counter_rows(
    df: DataFrame,
    command: str,
    line_col: str | None = None,
    out_col: str = "line",
    check_exit: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Retry-exact variant of :func:`pipe_with_counters`: counters are
    emitted AS DATA (one row per (group, name) per partition, appended to
    the partition's output) and aggregated with a normal groupBy, instead
    of added to an accumulator from inside a transformation.

    Why: Spark guarantees exactly-once accumulator updates only in
    ACTIONS; a transformation re-executed by a task retry, speculation, or
    simply a second action on the un-cached lineage adds again, so
    :func:`pipe_with_counters` counts are at-least-once. The reference
    counts only committed task attempts (`MR-CORE/mapreduce/Counters.java`
    via the umbilical protocol). Emitting counter rows into the dataflow
    restores that: whatever attempt's output is committed is the one whose
    counter rows are aggregated — retries and speculative duplicates are
    discarded with the rest of the failed attempt's output.

    Returns ``(out_df, counters_df)`` — both derived from ONE persisted
    pass over the subprocess (the partition runs once; the two frames are
    filters of the same cached combined output), so consuming both does
    not re-run the external command."""
    import subprocess

    from pyspark.sql.types import LongType

    spark = df.sparkSession
    if line_col is not None:
        lines = df.select(F.col(line_col).cast("string"))
    elif len(df.columns) == 1:
        lines = df.select(F.col(df.columns[0]).cast("string"))
    else:
        lines = df.select(
            F.concat_ws("\t", *[F.col(c).cast("string") for c in df.columns])
        )
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
        local: dict[tuple[str, str], int] = {}

        def feed_stdin():
            try:
                for r in rows:
                    if r[0] is not None:
                        proc.stdin.write(r[0] + "\n")
            except BrokenPipeError:
                pass
            finally:
                try:
                    proc.stdin.close()
                except BrokenPipeError:
                    pass

        def drain_stderr():
            for eline in proc.stderr:
                eline = eline.rstrip("\n")
                if eline.startswith(COUNTER_PREFIX):
                    try:
                        group, name, amount = eline[len(COUNTER_PREFIX):].split(",", 2)
                        key = (group, name)
                        local[key] = local.get(key, 0) + int(amount)
                    except ValueError:
                        pass

        writer, werr = _spawn_captured(feed_stdin)
        errt, eerr = _spawn_captured(drain_stderr)
        for line in proc.stdout:
            yield (line.rstrip("\n"), None, None, None)
        writer.join()
        errt.join()
        if werr:
            raise werr[0]
        if eerr:
            raise eerr[0]
        _check_exit(proc, cmd, check_exit)
        for (group, name), amount in sorted(local.items()):
            yield (None, group, name, amount)

    schema = StructType(
        [
            StructField(out_col, StringType(), True),
            StructField("__cgroup", StringType(), True),
            StructField("__cname", StringType(), True),
            StructField("__camount", LongType(), True),
        ]
    )
    from hadoop_spark.sources.tables import shared

    combined = shared(
        spark.createDataFrame(lines.rdd.mapPartitions(run_partition), schema)
    )
    out_df = combined.filter(F.col("__cgroup").isNull()).select(out_col)
    counters_df = (
        combined.filter(F.col("__cgroup").isNotNull())
        .groupBy(
            F.col("__cgroup").alias("group"), F.col("__cname").alias("name")
        )
        .agg(F.sum("__camount").alias("amount"))
    )
    return out_df, counters_df


def pipe_shipped_script(
    df: DataFrame,
    script_path: str,
    interpreter: str = "python3",
    line_col: str | None = None,
    out_col: str = "line",
    check_exit: bool = True,
) -> DataFrame:
    """Hadoop Streaming's ``-file`` flag: ship a local script to every
    executor and pipe through it. The reference stages the file in the
    DistributedCache (`MR-CORE/mapreduce/filecache/DistributedCache.java:107`,
    streaming's StreamJob `-file` handling); Spark's `sc.addFile` +
    `SparkFiles.get` is the same push-once-per-node mechanism — at 1000
    executors the script uploads once to the cluster, not once per task."""
    import os

    spark = df.sparkSession
    spark.sparkContext.addFile(script_path)
    name = os.path.basename(script_path)

    # Resolve the cached copy lazily ON THE EXECUTOR (SparkFiles.get gives
    # the task-local path), not on the driver.
    if line_col is not None:
        lines = df.select(F.col(line_col).cast("string"))
    elif len(df.columns) == 1:
        lines = df.select(F.col(df.columns[0]).cast("string"))
    else:
        lines = df.select(
            F.concat_ws("\t", *[F.col(c).cast("string") for c in df.columns])
        )

    def run_partition(rows):
        import subprocess

        from pyspark import SparkFiles

        local = SparkFiles.get(name)
        proc = subprocess.Popen(
            [interpreter, local],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )

        def feed():
            try:
                for r in rows:
                    if r[0] is not None:
                        proc.stdin.write(r[0] + "\n")
            except BrokenPipeError:
                pass
            finally:
                try:
                    proc.stdin.close()
                except BrokenPipeError:
                    pass

        t, terr = _spawn_captured(feed)
        for line in proc.stdout:
            yield (line.rstrip("\n"),)
        t.join()
        if terr:
            raise terr[0]
        _check_exit(proc, f"{interpreter} {name}", check_exit)

    schema = StructType([StructField(out_col, StringType(), True)])
    return spark.createDataFrame(lines.rdd.mapPartitions(run_partition), schema)


# ----------------------------------------------------------- typed bytes
#
# Hadoop Streaming's binary wire format (`-io typedbytes`;
# `hadoop-streaming/.../typedbytes/TypedBytesInput.java:34`, `Type.java`):
# one type-code byte, then a type-specific big-endian payload. Implemented
# here so a user with a typed-bytes mapper/reducer binary has a migration
# path. Codes are the public spec's full `Type.java` set: 0 bytes,
# 1 byte, 2 bool, 3 int, 4 long, 5 float, 6 double, 7 UTF-8 string,
# 8 vector (count-prefixed, nested values; `TypedBytesInput.java
# readVector`), 9 list (values until the 255 end-marker; `readList`),
# 10 map (count-prefixed key/value pairs; `readMap`). Python list/tuple
# encodes as VECTOR and dict as MAP; both sequence codes decode to a
# Python list, MAP to a dict. BYTE and FLOAT are decode-only (Python has
# no distinct scalar for either — ints encode as INT/LONG, floats as
# DOUBLE — but a foreign binary may emit them and must round-trip).

_TB_BYTES, _TB_BYTE, _TB_BOOL, _TB_INT, _TB_LONG = 0, 1, 2, 3, 4
_TB_FLOAT, _TB_DOUBLE, _TB_STRING = 5, 6, 7
_TB_VECTOR, _TB_LIST, _TB_MAP, _TB_MARKER = 8, 9, 10, 255


def _tb_read_exact(fh, n: int) -> bytes:
    """Read exactly ``n`` bytes or raise — ``fh.read(n)`` on a pipe may
    legally return fewer (short read), which would otherwise decode as a
    silently truncated value (the reference uses ``DataInput.readFully``,
    which throws ``EOFException`` on the same condition)."""
    chunks = []
    need = n
    while need > 0:
        chunk = fh.read(need)
        if not chunk:
            raise ValueError(
                f"typed-bytes: unexpected EOF ({n - need} of {n} bytes read)"
            )
        chunks.append(chunk)
        need -= len(chunk)
    return chunks[0] if len(chunks) == 1 else b"".join(chunks)


def tb_encode(value) -> bytes:
    """Encode one value as a typed-bytes record (`TypedBytesOutput.java`)."""
    import struct

    if isinstance(value, bool):
        return struct.pack(">BB", _TB_BOOL, 1 if value else 0)
    if isinstance(value, int):
        if -(2**31) <= value < 2**31:
            return struct.pack(">Bi", _TB_INT, value)
        return struct.pack(">Bq", _TB_LONG, value)
    if isinstance(value, float):
        return struct.pack(">Bd", _TB_DOUBLE, value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return struct.pack(">BI", _TB_STRING, len(raw)) + raw
    if isinstance(value, (bytes, bytearray)):
        return struct.pack(">BI", _TB_BYTES, len(value)) + bytes(value)
    if isinstance(value, (list, tuple)):
        # VECTOR (`TypedBytesOutput.java writeVector`): count, then each
        # element as its own typed-bytes record (nested containers nest).
        return struct.pack(">Bi", _TB_VECTOR, len(value)) + b"".join(
            tb_encode(v) for v in value
        )
    if isinstance(value, dict):
        # MAP (`TypedBytesOutput.java writeMap`): entry count, then each
        # key record followed by its value record.
        return struct.pack(">Bi", _TB_MAP, len(value)) + b"".join(
            tb_encode(k) + tb_encode(v) for k, v in value.items()
        )
    raise TypeError(f"typed-bytes: unsupported type {type(value).__name__}")


def _tb_read_one(fh, code: int):
    """Decode one value whose type-code byte has already been read.

    Every fixed-size and length-prefixed read goes through
    :func:`_tb_read_exact`, so a stream truncated mid-record raises a
    typed-bytes ``ValueError`` (the reference's ``TypedBytesInput.java``
    readers raise ``EOFException`` from ``DataInput.readFully``) instead
    of silently yielding a short value or a bare ``IndexError``."""
    import struct

    if code == _TB_BOOL:
        return _tb_read_exact(fh, 1)[0] != 0
    if code == _TB_BYTE:
        return struct.unpack(">b", _tb_read_exact(fh, 1))[0]
    if code == _TB_INT:
        return struct.unpack(">i", _tb_read_exact(fh, 4))[0]
    if code == _TB_LONG:
        return struct.unpack(">q", _tb_read_exact(fh, 8))[0]
    if code == _TB_FLOAT:
        return struct.unpack(">f", _tb_read_exact(fh, 4))[0]
    if code == _TB_DOUBLE:
        return struct.unpack(">d", _tb_read_exact(fh, 8))[0]
    if code in (_TB_STRING, _TB_BYTES):
        (n,) = struct.unpack(">I", _tb_read_exact(fh, 4))
        raw = _tb_read_exact(fh, n)
        return raw.decode("utf-8") if code == _TB_STRING else raw
    if code == _TB_VECTOR:
        (n,) = struct.unpack(">i", _tb_read_exact(fh, 4))
        return [_tb_read_one(fh, _tb_read_exact(fh, 1)[0]) for _ in range(n)]
    if code == _TB_LIST:
        out = []
        while True:
            nxt = fh.read(1)
            if not nxt:
                raise ValueError("typed-bytes: EOF inside LIST (no 255 marker)")
            if nxt[0] == _TB_MARKER:
                return out
            out.append(_tb_read_one(fh, nxt[0]))
    if code == _TB_MAP:
        (n,) = struct.unpack(">i", _tb_read_exact(fh, 4))
        entries = {}
        for _ in range(n):
            k = _tb_read_one(fh, _tb_read_exact(fh, 1)[0])
            if isinstance(k, list):  # container keys can't be dict keys
                k = tuple(k)
            entries[k] = _tb_read_one(fh, _tb_read_exact(fh, 1)[0])
        return entries
    raise ValueError(f"typed-bytes: unsupported type code {code}")


def tb_decode_stream(fh):
    """Yield decoded values from a typed-bytes byte stream until EOF
    (`TypedBytesInput.java:34` read loop)."""
    while True:
        code_b = fh.read(1)
        if not code_b:
            return
        yield _tb_read_one(fh, code_b[0])


def pipe_typedbytes(
    df: DataFrame,
    command: str,
    out_schema: str,
    check_exit: bool = True,
    ship_script: str | None = None,
) -> DataFrame:
    """:func:`pipe` speaking the typed-bytes protocol instead of text lines:
    each input row's columns are written as consecutive typed-bytes records
    to the command's stdin; stdout is decoded as typed-bytes and regrouped
    into rows of `out_schema` (DDL string, e.g. ``"word string, n bigint"``
    — field count sets the regrouping arity). One subprocess per partition,
    streamed I/O (writer thread + incremental stdout reads), same process
    lifecycle as :func:`pipe_with_counters`. Nulls are not representable in
    the reference protocol and are rejected, as the reference would — the
    rejection raises INSIDE the writer thread, so it is captured and
    re-raised on the task thread (not a silent truncation).

    ``ship_script``: local path shipped to every executor via
    ``sc.addFile`` (streaming's ``-file`` + ``-io typedbytes`` combination
    — `DistributedCache.java:107`); ``command`` is then the interpreter
    (shlex-split, so flagged interpreters like ``"python3 -u"`` work
    instead of failing at task time as a nonexistent executable name),
    and the executor runs ``shlex.split(command) +
    [SparkFiles.get(basename)]`` with the task-local cached copy —
    push-once-per-node, not once per task."""
    import os
    import shlex
    import subprocess

    spark = df.sparkSession
    n_in = len(df.columns)
    cmd = command
    script_name = None
    interp_argv = None
    if ship_script is not None:
        spark.sparkContext.addFile(ship_script)
        script_name = os.path.basename(ship_script)
        interp_argv = shlex.split(cmd)

    def run_partition(rows):
        if script_name is not None:
            from pyspark import SparkFiles

            argv = interp_argv + [SparkFiles.get(script_name)]
            proc = subprocess.Popen(
                argv,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                text=False,
            )
        else:
            proc = subprocess.Popen(
                cmd,
                shell=True,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                text=False,
            )

        def feed_stdin():
            try:
                for r in rows:
                    for i in range(n_in):
                        proc.stdin.write(tb_encode(r[i]))
            except BrokenPipeError:
                pass
            finally:
                try:
                    proc.stdin.close()
                except BrokenPipeError:
                    pass

        writer, werr = _spawn_captured(feed_stdin)
        buf = []
        for value in tb_decode_stream(proc.stdout):
            buf.append(value)
            if len(buf) == n_out:
                yield tuple(buf)
                buf = []
        writer.join()
        if werr:
            raise werr[0]
        if buf:
            raise ValueError(
                f"typed-bytes: trailing {len(buf)} values do not fill a row"
            )
        _check_exit(proc, cmd, check_exit)

    out_struct = StructType.fromDDL(out_schema)
    n_out = len(out_struct.fields)
    return spark.createDataFrame(df.rdd.mapPartitions(run_partition), out_struct)


class CounterAccumulator:
    """Distributed counter map: {(group, name): long}, merged at the driver —
    the Counters analogue (`MR-CORE/mapreduce/Counters.java:41`). Also
    carries the `reporter:status:` side-channel: the last status line each
    partition reported (`PipeMapRed.java` stderr protocol →
    TaskReporter.setStatus), exposed via :meth:`statuses`."""

    def __init__(self, spark: SparkSession):
        from pyspark.accumulators import AccumulatorParam

        class _DictSum(AccumulatorParam):
            def zero(self, value):
                return {}

            def addInPlace(self, a, b):
                for k, v in b.items():
                    a[k] = a.get(k, 0) + v
                return a

        class _DictLastWins(AccumulatorParam):
            def zero(self, value):
                return {}

            def addInPlace(self, a, b):
                a.update(b)
                return a

        self.acc = spark.sparkContext.accumulator({}, _DictSum())
        self.status_acc = spark.sparkContext.accumulator({}, _DictLastWins())

    def value(self) -> dict[tuple[str, str], int]:
        return dict(self.acc.value)

    def statuses(self) -> dict[int, str]:
        """{partition_id: last reported status line}."""
        return dict(self.status_acc.value)
