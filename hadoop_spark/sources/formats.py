"""Text / key-value / fixed-width / multi-input sources and routed sinks —
the InputFormat/OutputFormat surface (SURVEY §2.1, §2.2) re-expressed on
Spark's DataSource framework.

Parity map (all paths relative to /root/reference):
- TextInputFormat → :func:`read_text`
  (`hadoop-mapreduce-client-core/.../lib/input/TextInputFormat.java:43`;
  split-aware line reading `LineRecordReader.java` is internal to Spark's
  text source, including the skip-partial-first-line dance)
- KeyValueTextInputFormat → :func:`read_kv_text`
  (`lib/input/KeyValueTextInputFormat.java:47`)
- FixedLengthInputFormat → :func:`read_fixed_width`
  (`lib/input/FixedLengthInputFormat.java:47`)
- NLineInputFormat → :func:`nline_repartition`
  (`lib/input/NLineInputFormat.java:63` — fan-out control, not semantics)
- MultipleInputs → :func:`multi_input_union`
  (`lib/input/MultipleInputs.java:40` + `DelegatingMapper.java:58`)
- TextOutputFormat → :func:`write_kv_text`
  (`lib/output/TextOutputFormat.java:44`, key<TAB>value lines)
- MultipleOutputs → :func:`routed_write`
  (`lib/output/MultipleOutputs.java:186` — data-driven output routing =
  `partitionBy`; readers then get partition PRUNING on the route column,
  which the reference never had)
- DBInputFormat / DBOutputFormat → :func:`read_jdbc_partitioned` /
  :func:`write_jdbc` (`lib/db/DBInputFormat.java`, `DataDrivenDBInputFormat
  .java` — Spark's column-range JDBC partitioning is the identical design)
- CombineFileInputFormat (`lib/input/CombineFileInputFormat.java:84`) needs
  no code: `spark.sql.files.maxPartitionBytes` / `openCostInBytes` pack
  small files into splits natively.

Scale: all readers are DataSource scans (column pruning + predicate pushdown
+ split computation built in); writers are distributed task-committed writes
via the same FileOutputCommitter protocol the reference defined
(`lib/output/FileOutputCommitter.java` — Spark calls this very class).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str, line_col: str = "line") -> DataFrame:
    """Lines of text. The reference's byte-offset key is available on demand
    via `monotonically_increasing_id` (per-partition monotone, like offsets)."""
    return spark.read.text(path).withColumnRenamed("value", line_col)


def read_kv_text(
    spark: SparkSession, path: str, sep: str = "\t"
) -> DataFrame:
    """(key, value) from lines split at the FIRST separator; no separator →
    whole line is the key, NULL value (KeyValueLineRecordReader semantics)."""
    parts = F.split(F.col("line"), re.escape(sep), 2)
    return read_text(spark, path).select(
        F.element_at(parts, 1).alias("key"), F.element_at(parts, 2).alias("value")
    )


def read_fixed_width(
    spark: SparkSession,
    path: str,
    widths: list[tuple[str, int]],
    trim: bool = True,
) -> DataFrame:
    """Fixed-width records from text lines: `widths` = [(col, width), ...]
    consumed left to right. substring slicing is codegen'd JVM work."""
    df = read_text(spark, path)
    cols = []
    off = 1
    for name, w in widths:
        c = F.substring(F.col("line"), off, w)
        cols.append((F.rtrim(c) if trim else c).alias(name))
        off += w
    return df.select(*cols)


def nline_repartition(
    df: DataFrame, records_per_split: int, exact: bool = True
) -> DataFrame:
    """NLineInputFormat parity (`lib/input/NLineInputFormat.java:63`):
    exactly N consecutive records per task, with one short tail split —
    e.g. 25 rows at N=4 → six splits of 4 and one of 1, matching the
    reference's split construction byte for byte (it too enumerates the
    input up front to place split boundaries; our ``count()`` is that
    same pre-pass).

    ``exact=True`` (default) keys each row by ``row_index // N`` and
    places every split on its own partition via an identity-partitioned
    keyed RDD — the one spot in this repo where an RDD is the right tool,
    because no DataFrame repartitioning guarantees the 1-split-per-task
    physical mapping (hash collides splits; range sampling may merge
    them). The Python-RDD hop serializes rows, which is fine for NLine's
    actual role: fanning out a SMALL driver/control file (parameter
    sweeps, file lists) to many tasks — never a data-sized table.

    ``exact=False`` keeps the pure-JVM balanced ``repartition(parts)``
    (±1 rows per task): the right mode when only the task COUNT matters
    and the input is bigger than a control file."""
    n = df.count()
    parts = max(1, (n + records_per_split - 1) // records_per_split)
    if not exact:
        return df.repartition(parts)
    rdd = (
        df.rdd.zipWithIndex()
        .map(lambda t: (t[1] // records_per_split, t[0]))
        .partitionBy(parts, lambda split_id: int(split_id))
        .map(lambda t: t[1])
    )
    return df.sparkSession.createDataFrame(rdd, df.schema)


def multi_input_union(*dfs: DataFrame) -> DataFrame:
    """MultipleInputs parity: per-source frames (each already mapped by its
    own per-source transform — the DelegatingMapper role) unioned by column
    NAME, missing columns NULL-filled."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def write_kv_text(df: DataFrame, path: str, sep: str = "\t", mode: str = "overwrite") -> None:
    """TextOutputFormat parity: `key<SEP>value` lines, one file per task,
    job-committed atomically."""
    cols = [F.col(c).cast("string") for c in df.columns]
    df.select(F.concat_ws(sep, *cols).alias("value")).write.mode(mode).text(path)


def routed_write(
    df: DataFrame, path: str, route_col: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """MultipleOutputs parity: route every record to an output named by a
    data value. Downstream reads of `path` filtered on `route_col` are
    partition-PRUNED — the scan never opens other routes' files."""
    df.write.partitionBy(route_col).format(fmt).mode(mode).save(path)


def write_named_outputs(
    df: DataFrame,
    path: str,
    outputs: dict[str, tuple],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, list[str]]:
    """One-pass HETEROGENEOUS MultipleOutputs (`lib/output/MultipleOutputs
    .java:186`, `write(key, value, baseOutputPath):473`): route each input
    row to any number of named outputs, each with its OWN schema, in a
    single job — the reference's one-job multi-schema fan-out that
    :func:`routed_write` (single-schema `partitionBy`) cannot express.

    `outputs`: ``{name: (row_filter Column, {col_name: expr Column})}``.
    A row lands in every output whose filter matches (so outputs may
    overlap, like repeated `mos.write` calls for one record).

    Plan shape: per-output projections are analyzed (not executed) to
    build the union schema; each row becomes an array of per-output
    structs over the NULL-padded union schema, `array_compact` drops the
    non-matching ones, one `explode` + one `partitionBy(__tag)` write.
    ONE scan of the input, one shuffle-free map stage, one commit — at
    100 TB this halves (or better) the N-separate-writes cost the
    single-schema router forces. Readers use :func:`read_named_output`,
    which partition-prunes to one tag and restores that output's schema.

    Returns ``({name: [column, ...]}, read_schema)`` — each output's own
    column list plus the on-disk union schema (including `__tag`), which
    :func:`read_named_output` needs both to strip the union padding and to
    resolve a ZERO-ROW write (empty routes leave no parquet footers to
    infer from — the empty-day regime)."""
    spark = df.sparkSession
    # analyze each projection to learn its column types (no job runs)
    out_schemas: dict[str, list[tuple[str, str]]] = {}
    for name, (_filt, proj) in outputs.items():
        probe = df.select(*[c.alias(n) for n, c in proj.items()])
        out_schemas[name] = [(f.name, f.dataType.simpleString()) for f in probe.schema.fields]
    union_fields: dict[str, str] = {}
    for name, fields in out_schemas.items():
        for col, dtype in fields:
            if col in union_fields and union_fields[col] != dtype:
                raise ValueError(
                    f"named output {name!r} column {col!r}: type {dtype} "
                    f"conflicts with {union_fields[col]} from another output"
                )
            union_fields.setdefault(col, dtype)

    structs = []
    for name, (filt, proj) in outputs.items():
        fields = [F.lit(name).alias("__tag")]
        for col, dtype in union_fields.items():
            fields.append(
                proj[col].cast(dtype).alias(col)
                if col in proj
                else F.lit(None).cast(dtype).alias(col)
            )
        structs.append(F.when(filt, F.struct(*fields)))
    routed = df.select(
        F.explode(F.array_compact(F.array(*structs))).alias("__r")
    ).select("__r.*")
    routed.write.partitionBy("__tag").format(fmt).mode(mode).save(path)
    return (
        {name: [c for c, _ in fields] for name, fields in out_schemas.items()},
        routed.schema,
    )


def read_named_output(
    spark: SparkSession,
    path: str,
    name: str,
    columns: list[str],
    schema=None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read back ONE named output written by :func:`write_named_outputs`,
    restoring its own schema. The `__tag` filter is a partition filter —
    the scan never opens other outputs' files. Pass the `schema` returned
    by the writer to stay readable when the write had zero rows."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.format(fmt).load(path).filter(F.col("__tag") == name)
    return df.select(*columns)


SEQFILE_MAGIC = b"SEQ"


def sniff_format(path: str) -> str:
    """AutoInputFormat's per-file detection (`STREAMING/streaming/
    AutoInputFormat.java:40`): SequenceFile if the file starts with the
    'SEQ' magic, text otherwise."""
    with open(path, "rb") as fh:
        return "sequence" if fh.read(3) == SEQFILE_MAGIC else "text"


def read_auto(spark: SparkSession, directory: str) -> DataFrame:
    """AutoInputFormat parity: a directory holding a MIX of SequenceFiles
    and text files (the migration mess the reference's streaming tool
    handled) read as one (key, value) frame — each file sniffed by magic,
    SequenceFiles through :func:`read_sequence_file`, text as
    (NULL, line). Sniffing reads 3 bytes per file on the driver — the
    same O(#files) the reference's getRecordReader spent; the data scan
    itself stays fully distributed."""
    import os

    seq_paths, text_paths = [], []
    for entry in sorted(os.listdir(directory)):
        p = os.path.join(directory, entry)
        if not os.path.isfile(p) or entry.startswith(("_", ".")):
            continue
        (seq_paths if sniff_format(p) == "sequence" else text_paths).append(p)
    frames = []
    if seq_paths:
        frames.append(
            read_sequence_file(spark, ",".join(seq_paths)).select(
                F.col("key").cast("string").alias("key"),
                F.col("value").cast("string").alias("value"),
            )
        )
    if text_paths:
        frames.append(
            spark.read.text(text_paths).select(
                F.lit(None).cast("string").alias("key"),
                F.col("value").alias("value"),
            )
        )
    if not frames:
        from pyspark.sql.types import StringType, StructField, StructType

        return spark.createDataFrame(
            [], StructType([StructField("key", StringType()), StructField("value", StringType())])
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_xml_records(spark: SparkSession, path: str, tag: str = "rec") -> DataFrame:
    """StreamXmlRecordReader parity, SPLIT-AWARE (`STREAMING/streaming/
    StreamXmlRecordReader.java` — the reference scans each byte-range split
    for ``<tag>``…``</tag>`` frames, skipping a record that began before
    the split and reading past the split end to finish the last one).

    Spark-first: the text source with a custom record delimiter
    (``lineSep = the END tag``) rides the exact LineRecordReader contract —
    a non-first split skips forward to its first delimiter, every split
    reads past its end to complete its final record — so records that
    straddle split (or file-internal block) boundaries are recovered
    exactly once with NO whole-file reads; a single giant one-line XML file
    still fans out across tasks under
    ``spark.sql.files.maxPartitionBytes``. Each delimited chunk is
    ``[inter-record junk]<tag>body``; the begin-tag scan is one JVM regex.

    Returns one row per record with the complete re-framed element in
    ``record`` (``<tag>body</tag>``); compose with ``from_xml`` for typed
    parsing.
    """
    raw = spark.read.option("lineSep", f"</{tag}>").text(path)
    body = F.regexp_extract(F.col("value"), f"(?s)<{re.escape(tag)}>(.*)$", 1)
    return (
        raw.filter(F.col("value").contains(f"<{tag}>"))
        .select(
            F.concat(F.lit(f"<{tag}>"), body, F.lit(f"</{tag}>")).alias("record")
        )
    )


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    lower: int,
    upper: int,
    num_partitions: int,
    **options: str,
) -> DataFrame:
    """DataDrivenDBInputFormat parity: parallel JDBC scan split by ranges of
    a numeric column — Spark's built-in JDBC partitioning is the same
    min/max range-splitting design as the reference's typed splitters
    (`lib/db/IntegerSplitter.java`, `DateSplitter.java`, ...). Exercised
    end-to-end against embedded Derby in tests/test_jdbc.py."""
    return spark.read.jdbc(
        url,
        table,
        column=column,
        lowerBound=lower,
        upperBound=upper,
        numPartitions=num_partitions,
        properties=dict(options),
    )


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    """DBOutputFormat parity (`lib/db/DBOutputFormat.java:249`): batched
    INSERTs from every task."""
    df.write.jdbc(url, table, mode=mode, properties=dict(options))


def read_sequence_file(
    spark: SparkSession,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """SequenceFile ingestion (`COMMON/io/SequenceFile.java:209`): the
    migration path for a reference user's existing SequenceFile datasets.
    Rides `sc.sequenceFile`, which resolves the header's key/value Writable
    classes and converts to Python types (Text→str, Int/LongWritable→int,
    BytesWritable→bytes); the result lands in a DataFrame so everything
    downstream is Catalyst-planned. New data should be parquet (columnar,
    prunable) — this reader exists for interop, not as the native format."""
    rdd = spark.sparkContext.sequenceFile(path)
    return rdd.toDF([key_col, value_col])


SEQFILE_COMPRESSION_TYPES = ("NONE", "RECORD", "BLOCK")


def write_sequence_file(
    df: DataFrame,
    path: str,
    compression_type: str = "NONE",
    codec: str = "org.apache.hadoop.io.compress.DefaultCodec",
) -> None:
    """SequenceFile writer for interop round-trips (`SequenceFile.java:835`
    Writer): first two columns become the (key, value) Writable pair via
    Spark's reverse auto-conversion. Task-parallel, job-committed.

    ``compression_type`` mirrors `COMMON/io/SequenceFile.java:239-243`
    (CompressionType NONE / RECORD / BLOCK) — the knob rides Hadoop's own
    output conf (`mapreduce.output.fileoutputformat.compress.type`), so the
    bytes on disk are produced by the same Writer class hierarchy the
    reference uses (RecordCompressWriter / BlockCompressWriter) and any
    reference reader consumes them unchanged."""
    if compression_type not in SEQFILE_COMPRESSION_TYPES:
        raise ValueError(
            f"compression_type must be one of {SEQFILE_COMPRESSION_TYPES}, "
            f"got {compression_type!r}"
        )
    rdd = df.rdd.map(lambda r: (r[0], r[1]))
    if compression_type == "NONE":
        rdd.saveAsSequenceFile(path)
        return
    conf = {
        # modern + legacy keys: Configuration's deprecation map covers both
        "mapreduce.output.fileoutputformat.compress": "true",
        "mapreduce.output.fileoutputformat.compress.type": compression_type,
        "mapreduce.output.fileoutputformat.compress.codec": codec,
        "mapred.output.compress": "true",
        "mapred.output.compression.type": compression_type,
        "mapred.output.compression.codec": codec,
    }
    # NB: the compressionCodecClass kwarg is NOT used — Spark's
    # saveAsHadoopFile(codec) path hard-sets compress.type=BLOCK, stomping
    # a RECORD request; the conf keys alone configure both codec and type.
    rdd.saveAsHadoopFile(
        path,
        "org.apache.hadoop.mapred.SequenceFileOutputFormat",
        conf=conf,
    )


def read_seqfile_header(path: str) -> dict:
    """Parse a SequenceFile header (`SequenceFile.java:1918` Reader.init):
    magic+version, key/value class names (Text.writeString — VInt length,
    one byte for class-name-sized strings), then the two compression
    booleans (record-level, block-level). Lets tests and migration audits
    verify the on-disk compression type without a JVM."""
    with open(path, "rb") as fh:
        blob = fh.read(512)
    if blob[:3] != SEQFILE_MAGIC:
        raise ValueError(f"{path} is not a SequenceFile")
    pos = 4  # magic (3) + version byte
    names = []
    for _ in range(2):  # keyClassName, valueClassName
        ln = blob[pos]
        pos += 1
        names.append(blob[pos : pos + ln].decode("utf-8"))
        pos += ln
    value_compressed = bool(blob[pos])
    block_compressed = bool(blob[pos + 1])
    ctype = "BLOCK" if block_compressed else ("RECORD" if value_compressed else "NONE")
    return {
        "version": blob[3],
        "key_class": names[0],
        "value_class": names[1],
        "compression_type": ctype,
    }


def distcp(spark: SparkSession, src: str, dst: str, mode: str = "overwrite") -> int:
    """DistCp parity (`hadoop-tools/hadoop-distcp/.../DistCp.java:60`):
    parallel file copy through the engine — every file is a task, bytes
    stream through executors, the write is job-committed (atomic dst).
    Returns the number of files copied. The reference's snapshot-diff sync
    is out of scope; plain recursive copy is the 99% use."""
    files = spark.read.format("binaryFile").option("recursiveFileLookup", "true").load(src)
    n = files.count()
    (
        files.select("path", "content")
        .write.mode(mode)
        .format("parquet")
        .save(dst)
    )
    return n


def compact(df: DataFrame, path: str, target_files: int, fmt: str = "parquet") -> None:
    """HadoopArchives parity (`hadoop-tools/hadoop-archives/.../
    HadoopArchives.java:84`): the har tool existed because millions of small
    files crush the NameNode; the engine-native fix is rewriting the dataset
    into `target_files` right-sized files — one coalesce (no shuffle), one
    committed write."""
    df.coalesce(target_files).write.mode("overwrite").format(fmt).save(path)
