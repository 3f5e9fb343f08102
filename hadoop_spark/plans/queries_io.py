"""IO-surface + UDF-surface queries (SURVEY §2.1/2.2 M5, §2.10 M6, M9
multimodal): real file round-trips through the text/kv/fixed-width sources,
MultipleOutputs-style routed writes with pruned read-back, the Hadoop
Streaming pipe operator, Arrow-batched pandas UDAF, and the multimodal
feature extractor. Scratch files go under <repo>/.tmp/io/<sf>/ (overwritten
each run; derived purely from the input tables so results stay
deterministic).
"""

from __future__ import annotations

import os
import re
import shutil

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hadoop_spark.functions.hashing import portable_hash64_sql
from hadoop_spark.operators.multimodal import as_media, extract_features
from hadoop_spark.operators.pipe import pipe, pipe_typedbytes
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.formats import (
    read_fixed_width,
    read_kv_text,
    read_sequence_file,
    write_kv_text,
    write_sequence_file,
    routed_write,
)
from hadoop_spark.sources.tables import load_table

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# db dirs already cleared (and sibling-GC'd) by this process — see
# db_pageview_roundtrip
_DERBY_CLEARED: set[str] = set()


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(_REPO, ".tmp", "io", tag, name)


_KV_ORACLE = """
SELECT CAST(n_nationkey AS VARCHAR) AS key, n_name AS value FROM nation
"""


@query("kv_text_roundtrip", _KV_ORACLE)
def kv_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextOutputFormat → KeyValueTextInputFormat round trip: write nation
    as key<TAB>value lines (task-parallel, committer-atomic), read back via
    first-separator split."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    path = _scratch(sf_dir, "kv_nation")
    write_kv_text(nation, path)
    return read_kv_text(spark, path)


_FIXED_ORACLE = """
SELECT CAST(r_regionkey AS VARCHAR) AS r_key, r_name FROM region
"""


@query("fixed_width_parse", _FIXED_ORACLE)
def fixed_width_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FixedLengthInputFormat parity: render region as 4+16-char fixed-width
    records, read back by offset slicing."""
    region = load_table(spark, sf_dir, "region")
    path = _scratch(sf_dir, "fixed_region")
    region.select(
        F.concat(
            F.rpad(F.col("r_regionkey").cast("string"), 4, " "),
            F.rpad(F.col("r_name"), 16, " "),
        ).alias("value")
    ).write.mode("overwrite").text(path)
    return read_fixed_width(spark, path, [("r_key", 4), ("r_name", 16)])


_ROUTED_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@query("routed_write_read", _ROUTED_ORACLE)
def routed_write_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleOutputs parity + the payoff the reference never had: write
    orders routed by o_orderstatus (`partitionBy`), then read ONE route
    back — the filter on the route column is partition-PRUNED, other
    routes' files are never opened (visible as PartitionFilters in
    .explain)."""
    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "routed_orders")
    routed_write(orders, path, "o_orderstatus")
    # explicit schema: a routed write of ZERO rows leaves no data files to
    # infer from (empty-day pipelines) — the read must still resolve
    back = (
        spark.read.schema(orders.schema)
        .parquet(path)
        .filter(F.col("o_orderstatus") == "F")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
    )


_PIPE_ORACLE = r"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents WHERE text IS NOT NULL
)
SELECT word, COUNT(*) AS n FROM words WHERE word <> '' GROUP BY word
"""


@query("pipe_wordcount", _PIPE_ORACLE)
def pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hadoop Streaming parity: pipe document text through an external
    executable (`tr '[:upper:]' '[:lower:]'` — one process per partition,
    lines over stdin/stdout, `PipeMapper.java:39` semantics), then
    wordcount the piped output. The deliberate slow path — kept off the
    100 TB hot path in favor of pandas UDFs, exactly as SURVEY §2.10
    prescribes."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    piped = pipe(docs.select("text"), "tr '[:upper:]' '[:lower:]'")
    return (
        piped.select(F.explode(F.split(F.col("line"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_COUNTER_ROWS_ORACLE = """
SELECT 'io' AS counter_group, 'lines' AS counter_name,
       CAST(COUNT(*) AS BIGINT) AS amount
FROM nation
"""


@query("pipe_counter_rows", _COUNTER_ROWS_ORACLE)
def pipe_counter_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-exact streaming counters (`MR-CORE/mapreduce/Counters.java`
    committed-attempt semantics): the external command reports
    `reporter:counter:io,lines,<n>` per partition on stderr; counters ride
    the dataflow as rows and are summed with a normal aggregate, so task
    retries/speculation cannot double-count (unlike accumulator-based
    counters — see operators/pipe.py pipe_with_counter_rows)."""
    from hadoop_spark.operators.pipe import pipe_with_counter_rows

    nation = load_table(spark, sf_dir, "nation").select("n_name")
    script = (
        "python3 -c '"
        "import sys\n"
        "n = 0\n"
        "for line in sys.stdin:\n"
        "    n += 1\n"
        "    sys.stdout.write(line)\n"
        'sys.stderr.write(f"reporter:counter:io,lines,{n}\\n")\n'
        "'"
    )
    _out, counters = pipe_with_counter_rows(nation, script)
    return counters.select(
        F.col("group").alias("counter_group"),
        F.col("name").alias("counter_name"),
        "amount",
    )


_SEQFILE_ORACLE = """
SELECT CAST(s_suppkey AS BIGINT) AS key, s_name AS value FROM supplier
"""


@query("seqfile_roundtrip", _SEQFILE_ORACLE)
def seqfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFile interop round trip (`COMMON/io/SequenceFile.java:209`):
    supplier (suppkey, name) written as a real Hadoop SequenceFile
    (LongWritable/Text via reverse auto-conversion), read back through
    `sc.sequenceFile` into a DataFrame."""
    import shutil

    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("bigint").alias("key"), F.col("s_name").alias("value")
    )
    path = _scratch(sf_dir, "seq_supplier")
    shutil.rmtree(path, ignore_errors=True)
    write_sequence_file(sup, path)
    return read_sequence_file(spark, path)


_TYPEDBYTES_ORACLE = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
"""


@query("pipe_typedbytes", _TYPEDBYTES_ORACLE)
def pipe_typedbytes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-bytes pipe protocol round trip
    (`hadoop-streaming/.../typedbytes/TypedBytesInput.java:34` parity):
    nation rows are encoded as typed-bytes records, streamed through an
    identity executable (`cat` — exercising the full binary wire format in
    both directions), and decoded back into rows."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"), "n_name"
    )
    return pipe_typedbytes(nation, "cat", "n_nationkey bigint, n_name string")


_MULTIMODAL_ORACLE = """
SELECT doc_id,
       'text' AS kind,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       FALSE AS decoded
FROM documents
"""


@query("multimodal_features", _MULTIMODAL_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: text payloads wrapped as opaque binary
    media with typed metadata, features extracted via Arrow-batched
    mapInPandas (decoder stubbed — operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    media = as_media(docs, "doc_id", "text", kind="text")
    return extract_features(media)


_UDAF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("pandas_udaf_sumsq", _UDAF_ORACLE)
def pandas_udaf_sumsq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate surface
    (`lib/aggregate/UserDefinedValueAggregatorDescriptor.java:123` parity):
    a GROUPED_AGG pandas UDF (Arrow-batched, partial-aggregated by Spark).
    Integer arithmetic so the result is fold-order-independent."""

    @pandas_udf("bigint")
    def sumsq(v: pd.Series) -> int:
        q = v.astype("int64")
        return int((q * q).sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(sumsq(F.col("l_quantity")).alias("sumsq_qty"))


# ---------------------------------------------------------------------------
# Columnar/text source-sink matrix beyond the reference's formats. The
# reference's IO story is InputFormat/OutputFormat pairs over text and
# SequenceFile (`lib/input/TextInputFormat.java:43`, `SequenceFile.java:209`);
# a complete Spark-native engine also speaks CSV, JSON lines, and ORC with
# the same committer-atomic distributed writes, schema-on-read, and (for
# ORC) columnar pruning/pushdown parity with parquet.

_CSV_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 1000
"""


@query("csv_roundtrip", _CSV_ORACLE)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write → schema'd read round trip (header on, explicit schema on
    read so types survive; the filter applies post-read)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = _scratch(sf_dir, "csv_customer")
    cust.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.schema("c_custkey bigint, c_name string, c_acctbal double")
        .option("header", "true")
        .csv(path)
    )
    return back.filter(F.col("c_acctbal") > 1000)


_JSON_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


@query("json_roundtrip", _JSON_ORACLE)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write → schema'd read round trip (one JSON object per
    line — the splittable layout; schema pinned on read so column types
    don't depend on inference order)."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = _scratch(sf_dir, "json_nation")
    nation.write.mode("overwrite").json(path)
    return spark.read.schema("n_nationkey bigint, n_name string, n_regionkey bigint").json(
        path
    )


_ORC_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS sum_price_str
FROM orders WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


@query("orc_roundtrip", _ORC_ORACLE)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write → read → aggregate: the second columnar format, with the
    same predicate-pushdown/column-pruning behavior as parquet (both ride
    the DataSource v1 FileFormat path). The aggregate proves values survive
    the round trip bit-exactly (decimal-quantized sum rendered as string)."""
    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "orc_orders")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).filter(F.col("o_orderstatus") == "O")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("string")
        .alias("sum_price_str"),
    )


_GZIP_ORACLE = r"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
  FROM documents WHERE text IS NOT NULL
)
SELECT word, COUNT(*) AS n FROM words WHERE word <> '' GROUP BY word
"""


@query("gzip_text_read", _GZIP_ORACLE)
def gzip_text_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-text ingestion (`COMMON/io/compress/GzipCodec.java`
    parity): documents written as gzip text, read back transparently by
    codec-extension detection, wordcounted. Gzip is unsplittable — one task
    per file, exactly the reference's constraint — so the write fans out to
    many files first (each ≤ one split's worth), which is the production
    layout that keeps compressed ingestion parallel at 100 TB."""
    from hadoop_spark.sources.tables import fanout_small

    docs = fanout_small(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    path = _scratch(sf_dir, "gzip_docs")
    docs.select("text").write.mode("overwrite").option("compression", "gzip").text(path)
    lines = spark.read.text(path)
    return (
        lines.select(F.explode(F.split(F.lower("value"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_DECODE_ORACLE = """
WITH img AS (
  SELECT d.doc_id,
         CAST(SUM((d.doc_id * 7919 + r.i) % 256) AS BIGINT) AS sum_pixel
  FROM documents d CROSS JOIN (SELECT unnest(range(288)) AS i) r
  WHERE d.doc_id % 2 = 0
  GROUP BY d.doc_id
),
aud AS (
  SELECT d.doc_id,
         CAST(64 + d.doc_id % 64 AS BIGINT) AS n_samples,
         CAST(SUM(ABS((d.doc_id * 31 + r.i * 17) % 65536 - 32768)) AS BIGINT) AS sum_abs
  FROM documents d CROSS JOIN (SELECT unnest(range(128)) AS i) r
  WHERE d.doc_id % 2 = 1 AND r.i < 64 + d.doc_id % 64
  GROUP BY d.doc_id
)
SELECT doc_id, 'image' AS kind,
       CAST(12 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height, sum_pixel,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS BIGINT) AS sample_rate,
       CAST(NULL AS BIGINT) AS sum_abs, TRUE AS decoded
FROM img
UNION ALL
SELECT doc_id, 'audio',
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       n_samples, CAST(8000 AS BIGINT), sum_abs, TRUE
FROM aud
"""


@query("multimodal_decode", _DECODE_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode end-to-end: every even doc becomes a deterministic
    PPM P6 image and every odd doc a PCM WAV clip (both synthesized from
    doc_id — pure functions, so the decoded features are SQL-computable);
    the decoders parse real headers/PCM frames in Arrow-batched
    mapInPandas (operators/multimodal.py decode_ppm / decode_wav). The
    oracle recomputes pixel sums and |sample| sums from the generator
    formulas — a decode bug (endianness, header offset, frame width)
    cannot hash-match."""
    from pyspark.sql.types import BinaryType

    from hadoop_spark.operators.multimodal import (
        decode_features,
        make_ppm,
        make_wav,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    @pandas_udf(BinaryType())
    def ppm_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_ppm(int(s)))

    @pandas_udf(BinaryType())
    def wav_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_wav(int(s)))

    images = as_media(
        docs.filter(F.col("doc_id") % 2 == 0).withColumn("payload", ppm_bytes("doc_id")),
        "doc_id",
        "payload",
        kind="image",
    )
    audio = as_media(
        docs.filter(F.col("doc_id") % 2 == 1).withColumn("payload", wav_bytes("doc_id")),
        "doc_id",
        "payload",
        kind="audio",
    )
    return decode_features(images.unionByName(audio))


_EVOLUTION_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(o_code) AS BIGINT) AS n_with_code
FROM (
  SELECT o_orderpriority, CAST(NULL AS VARCHAR) AS o_code
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderpriority, substr(o_orderpriority, 1, 1) AS o_code
  FROM orders WHERE o_orderkey % 2 = 1
)
GROUP BY o_orderpriority
"""


@query("schema_evolution_read", _EVOLUTION_ORACLE)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations — the data-lake reality a
    100 TB table accumulates: generation v1 lacks a column that generation
    v2 added. Both generations land under one path; `mergeSchema` unions
    the schemas at read time and v1 rows surface NULL for the new column.
    The aggregate counts rows with/without the evolved column per group."""
    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "evolving_orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderpriority"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderpriority",
        F.substring("o_orderpriority", 1, 1).alias("o_code"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    back = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_code").alias("n_with_code"),
    )


_DISTCP_ORACLE = r"""
SELECT CAST(SUM(octet_length(CAST(CAST(n_nationkey AS VARCHAR) || '	' || n_name AS BLOB)) + 1) AS BIGINT)
         AS total_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM nation
"""


@query("distcp_roundtrip", _DISTCP_ORACLE)
def distcp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistCp parity, driver-verified (`hadoop-tools/hadoop-distcp/.../
    DistCp.java:60`): nation is rendered as key<TAB>value text, distcp'd
    (binaryFile scan → committed write, bytes never touch the driver), and
    the copy's byte-exactness is checked as total bytes + line count —
    invariant to how tasks grouped rows into files."""
    from hadoop_spark.sources.formats import distcp

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    src = _scratch(sf_dir, "distcp_src")
    dst = _scratch(sf_dir, "distcp_dst")
    write_kv_text(nation, src)
    distcp(spark, src, dst)
    copied = spark.read.parquet(dst).filter(~F.col("path").endswith("_SUCCESS"))
    lines = copied.select(
        F.explode(F.split(F.decode("content", "UTF-8"), "\n")).alias("line")
    ).filter(F.col("line") != "")
    return copied.agg(
        F.sum(F.octet_length("content")).cast("bigint").alias("total_bytes")
    ).crossJoin(lines.agg(F.count(F.lit(1)).cast("bigint").alias("n_lines")))


_COMPACT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
"""


@query("compact_small_files", _COMPACT_ORACLE)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HadoopArchives parity, driver-verified (`hadoop-tools/
    hadoop-archives/.../HadoopArchives.java:84`): documents scattered as
    32 small files are compacted to 4 right-sized ones (coalesce — no
    shuffle), and the compacted copy must carry identical data."""
    from hadoop_spark.sources.formats import compact

    docs = load_table(spark, sf_dir, "documents")
    scattered = _scratch(sf_dir, "scattered_docs")
    compacted = _scratch(sf_dir, "compacted_docs")
    docs.repartition(32).write.mode("overwrite").parquet(scattered)
    compact(spark.read.parquet(scattered), compacted, target_files=4)
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


_SHIPPED_ORACLE = """
SELECT upper(n_name) AS line FROM nation
"""


@query("pipe_shipped_script", _SHIPPED_ORACLE)
def pipe_shipped_script_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming `-file` flag end-to-end (`filecache/DistributedCache.
    java:107`): a mapper script written locally, shipped to executors via
    sc.addFile, resolved task-side with SparkFiles.get, and piped through
    — the exact migration path for a `-file mapper.py -mapper mapper.py`
    job."""
    from hadoop_spark.operators.pipe import pipe_shipped_script

    script_dir = _scratch(sf_dir, "shipped")
    os.makedirs(script_dir, exist_ok=True)
    script = os.path.join(script_dir, "upper_mapper.py")
    with open(script, "w") as f:
        f.write(
            "import sys\nfor line in sys.stdin:\n    sys.stdout.write(line.upper())\n"
        )
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return pipe_shipped_script(nation, script)


_NAMED_OUTPUTS_ORACLE = """
SELECT 'high_value' AS out_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
         AS checksum
FROM orders WHERE o_totalprice > 150000
UNION ALL
SELECT 'by_status' AS out_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey % 997) AS DOUBLE) AS checksum
FROM orders
"""


@query("multi_named_outputs", _NAMED_OUTPUTS_ORACLE)
def multi_named_outputs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass heterogeneous MultipleOutputs (`lib/output/MultipleOutputs
    .java:473`): orders routed in a SINGLE job to two named outputs with
    DIFFERENT schemas — `high_value` (orderkey, totalprice; filtered) and
    `by_status` (orderkey, status, priority; all rows) — then each output
    read back through its own schema and checksummed. The oracle recomputes
    both outputs straight from the table, so a row routed to the wrong
    output, dropped, or written with the wrong projection cannot match."""
    from hadoop_spark.sources.formats import read_named_output, write_named_outputs

    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "named_outputs")
    schemas, read_schema = write_named_outputs(
        orders,
        path,
        {
            "high_value": (
                F.col("o_totalprice") > 150000,
                {
                    "o_orderkey": F.col("o_orderkey"),
                    "o_totalprice": F.col("o_totalprice"),
                },
            ),
            "by_status": (
                F.lit(True),
                {
                    "o_orderkey": F.col("o_orderkey"),
                    "o_orderstatus": F.col("o_orderstatus"),
                    "o_orderpriority": F.col("o_orderpriority"),
                },
            ),
        },
    )
    hi = read_named_output(spark, path, "high_value", schemas["high_value"], read_schema)
    st = read_named_output(spark, path, "by_status", schemas["by_status"], read_schema)
    hi_agg = hi.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("checksum"),
    ).select(F.lit("high_value").alias("out_name"), "n", "checksum")
    st_agg = st.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_orderkey") % 997).cast("double").alias("checksum"),
    ).select(F.lit("by_status").alias("out_name"), "n", "checksum")
    return hi_agg.unionByName(st_agg)


_COMBINE_READ_ORACLE = """
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
         AS sum_bal
FROM supplier GROUP BY s_nationkey
"""


@query("combine_small_read", _COMBINE_READ_ORACLE)
def combine_small_read_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-side small-file combining (`lib/input/CombineFileInputFormat
    .java:84`): supplier deliberately shattered into ~100 tiny parquet
    files, then read back and aggregated. Spark's scan packs many small
    files per input split (`spark.sql.files.maxPartitionBytes` +
    `openCostInBytes`) — the split count stays proportional to BYTES, not
    file count; asserted explicitly in tests/test_plan_quality.py
    (test_small_file_read_combines_splits)."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    path = _scratch(sf_dir, "tiny_supplier")
    sup.repartition(100).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("s_acctbal").cast("decimal(18,4)")).cast("double").alias("sum_bal"),
    )


_AUTO_INPUT_ORACLE = """
SELECT 'sequence' AS src, CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(COUNT(key) AS BIGINT) AS n_keys
FROM (SELECT CAST(n_nationkey AS VARCHAR) AS key FROM nation)
UNION ALL
SELECT 'text' AS src, CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(0 AS BIGINT) AS n_keys
FROM region
"""


@query("auto_input_mixed", _AUTO_INPUT_ORACLE)
def auto_input_mixed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AutoInputFormat parity (`STREAMING/streaming/AutoInputFormat.java:40`):
    one directory holding BOTH a real Hadoop SequenceFile (nation, via
    sc.sequenceFile reverse conversion) and plain text files (region names)
    is read through per-file magic sniffing into one (key, value) frame;
    text rows carry a NULL key, sequence rows their Writable key. The
    oracle pins per-source record and key counts."""
    import glob
    import shutil

    from hadoop_spark.sources.formats import read_auto, write_sequence_file

    mixdir = _scratch(sf_dir, "auto_mixed")
    shutil.rmtree(mixdir, ignore_errors=True)
    os.makedirs(mixdir, exist_ok=True)

    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("key"), F.col("n_name").alias("value")
    )
    seq_tmp = _scratch(sf_dir, "auto_mixed_seq")
    shutil.rmtree(seq_tmp, ignore_errors=True)
    write_sequence_file(nation.coalesce(1), seq_tmp)
    region = load_table(spark, sf_dir, "region").select("r_name")
    text_tmp = _scratch(sf_dir, "auto_mixed_text")
    shutil.rmtree(text_tmp, ignore_errors=True)
    region.coalesce(1).write.mode("overwrite").text(text_tmp)

    # flatten both job outputs' data files into ONE mixed directory
    for i, p in enumerate(sorted(glob.glob(os.path.join(seq_tmp, "part-*")))):
        shutil.copy(p, os.path.join(mixdir, f"seqdata-{i:03d}"))
    for i, p in enumerate(sorted(glob.glob(os.path.join(text_tmp, "part-*")))):
        shutil.copy(p, os.path.join(mixdir, f"textdata-{i:03d}.log"))

    mixed = read_auto(spark, mixdir)
    return (
        mixed.withColumn(
            "src", F.when(F.col("key").isNotNull(), "sequence").otherwise("text")
        )
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.count("key").alias("n_keys"),
        )
    )


_PO_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(CASE WHEN event_type = 'error'
                               THEN value * 2 ELSE value END
                          AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
         AS sum_value
FROM events
GROUP BY event_type
"""


@query("partition_overwrite", _PO_ORACLE)
def partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the lakehouse form of the reference's
    job-level output commit (`FileOutputCommitter` v1/v2 commits a whole
    job's output dir; `MultipleOutputs` routes but never replaces): write
    the full event log partitioned by event_type, then OVERWRITE exactly
    one partition (the 'error' slice, values doubled) in a second job.
    With partitionOverwriteMode=dynamic only partitions present in the
    incoming data are replaced — the other partitions' files are not
    rewritten (asserted in tests/test_partition_overwrite.py), which at
    100 TB is the difference between rewriting one day's slice and
    rewriting the table. The read-back aggregation proves the final table
    state: doubled error values, untouched everything else."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(18,4)").alias("value")
    )
    path = _scratch(sf_dir, "po_events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        (
            ev.filter(F.col("event_type") == "error")
            .withColumn("value", (F.col("value") * 2).cast("decimal(18,4)"))
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(path)
        )
    finally:
        spark.conf.set(mode_key, prev)
    # explicit schema: a zero-row write leaves no files to infer from
    back = spark.read.schema(ev.schema).parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").cast("double").alias("sum_value"),
    )


_PYDS_ORACLE = """
SELECT CAST(s_suppkey AS VARCHAR) AS sk, s_name AS sname,
       CAST(s_nationkey AS VARCHAR) AS snation
FROM supplier
"""


@query("pyds_fixed_width_roundtrip", _PYDS_ORACLE)
def pyds_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom pluggable format end-to-end through Spark 4's Python
    DataSource API (`sources/pyds.py`): the supplier table is WRITTEN as
    fixed-width records by the source's RecordWriter/OutputCommitter path
    and READ back through its getSplits/RecordReader path — the full
    custom-InputFormat+OutputFormat life cycle of the reference
    (`MR-CORE/mapreduce/InputFormat.java:53`, `OutputCommitter.java:66`)
    on the modern API. Record decode runs in Arrow-batched Python workers,
    one task per planned split."""
    from hadoop_spark.sources import pyds

    pyds.register(spark)
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("sk"),
        F.col("s_name").alias("sname"),
        F.col("s_nationkey").cast("string").alias("snation"),
    )
    path = _scratch(sf_dir, "pyds_supplier")
    fields = "sk:8,sname:25,snation:4"
    (
        sup.write.format("fixedwidth")
        .option("path", path)
        .option("fields", fields)
        .mode("overwrite")
        .save()
    )
    return (
        spark.read.format("fixedwidth")
        .option("path", path)
        .option("fields", fields)
        .load()
    )


_PATCH_ORACLE = """
WITH grid AS (
  SELECT d.doc_id, py.v AS patch_y, px.v AS patch_x, dy.v AS dy, dx.v AS dx, c.v AS c
  FROM documents d
  CROSS JOIN (SELECT unnest(range(2)) AS v) py
  CROSS JOIN (SELECT unnest(range(3)) AS v) px
  CROSS JOIN (SELECT unnest(range(4)) AS v) dy
  CROSS JOIN (SELECT unnest(range(4)) AS v) dx
  CROSS JOIN (SELECT unnest(range(3)) AS v) c
  WHERE d.doc_id % 2 = 0
)
SELECT doc_id, CAST(patch_y AS INT) AS patch_y, CAST(patch_x AS INT) AS patch_x,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM((doc_id * 7919
                 + (((patch_y * 4 + dy) * 12 + (patch_x * 4 + dx)) * 3 + c))
                % 256) AS BIGINT) AS patch_sum
FROM grid
GROUP BY doc_id, patch_y, patch_x
"""


@query("image_patch_grid", _PATCH_ORACLE)
def image_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction over REAL-decoded P6 images: each even
    doc's synthetic 12x8 image splits into a 3x2 grid of 4x4 patches with
    exact per-patch pixel sums (operators/multimodal.py image_patches,
    Arrow-batched 1->N mapInPandas). The oracle recomputes every patch sum
    from the pixel-generator formula — a patch-indexing bug (row-major
    offset, channel stride, grid origin) cannot hash-match."""
    from pyspark.sql.types import BinaryType

    from hadoop_spark.operators.multimodal import as_media, image_patches, make_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    even = docs.filter(F.col("doc_id") % 2 == 0)

    @pandas_udf(BinaryType())
    def ppm_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_ppm(int(s)))

    media = as_media(
        even.withColumn("payload", ppm_bytes("doc_id")), "doc_id", "payload", "image"
    )
    return image_patches(media, patch=4)


_AUDIO_WIN_ORACLE = """
WITH samples AS (
  SELECT d.doc_id, CAST(r.i AS BIGINT) AS i,
         (d.doc_id * 31 + CAST(r.i AS BIGINT) * 17) % 65536 - 32768 AS s
  FROM documents d CROSS JOIN (SELECT unnest(range(128)) AS i) r
  WHERE d.doc_id % 2 = 1 AND r.i < 64 + d.doc_id % 64
)
SELECT doc_id, CAST(i // 16 AS INT) AS win_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       SQRT(CAST(SUM(s * s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS rms
FROM samples
GROUP BY doc_id, i // 16
"""


@query("audio_rms_windows", _AUDIO_WIN_ORACLE)
def audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy over REAL-decoded PCM WAV: 16-sample windows
    per odd doc with exact integer sum-of-squares and IEEE-exact RMS
    (sqrt of a correctly-rounded quotient — identical across engines).
    The Python stage only moves integers (operators/multimodal.py
    audio_windows); RMS is computed JVM-side."""
    from pyspark.sql.types import BinaryType

    from hadoop_spark.operators.multimodal import as_media, audio_windows, make_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    odd = docs.filter(F.col("doc_id") % 2 == 1)

    @pandas_udf(BinaryType())
    def wav_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_wav(int(s)))

    media = as_media(
        odd.withColumn("payload", wav_bytes("doc_id")), "doc_id", "payload", "audio"
    )
    w = audio_windows(media, win=16)
    return w.select(
        "doc_id",
        "win_id",
        "n_samples",
        "sum_sq",
        F.sqrt(
            F.col("sum_sq").cast("double") / F.col("n_samples").cast("double")
        ).alias("rms"),
    )


# ----------------------------------------------------------------------
# snapshot_diff — dataset diffing between two table snapshots: classify
# every key as added / removed / changed / same by comparing row
# fingerprints through ONE full-outer key join (the DistCp -update idea
# lifted from files to ROWS). Fingerprints are the 60-bit portable hash
# of the canonicalized row payload, computed map-side, so the shuffle
# carries (key, 8-byte hash) — never row bodies — and the diff of two
# 100 TB snapshots costs one co-partitioned join. Snapshot B is derived
# deterministically here (clicks' values bumped, a 3% hash-slice of
# rows dropped, a shifted slice re-keyed as inserts) so the oracle can
# replay it exactly.
# ----------------------------------------------------------------------

_DIFF_ORACLE = f"""
WITH a AS (
  SELECT event_id AS k,
         {portable_hash64_sql("concat(event_type, '|', CAST(ROUND(value * 1000) AS BIGINT), '|', user_id)")} AS h
  FROM events
),
b_src AS (
  SELECT event_id, event_type, user_id,
         CASE WHEN event_type = 'click' THEN value + 1.0 ELSE value END AS value
  FROM events
  WHERE {portable_hash64_sql('event_id', salt='#del')} % 100 >= 3
),
b_ins AS (
  SELECT event_id + 10000000 AS event_id, event_type, user_id, value
  FROM events WHERE {portable_hash64_sql('event_id', salt='#ins')} % 100 < 2
),
b AS (
  SELECT event_id AS k,
         {portable_hash64_sql("concat(event_type, '|', CAST(ROUND(value * 1000) AS BIGINT), '|', user_id)")} AS h
  FROM (SELECT * FROM b_src UNION ALL SELECT * FROM b_ins)
),
j AS (
  SELECT a.k AS ak, b.k AS bk, a.h AS ah, b.h AS bh
  FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT CASE WHEN ak IS NULL THEN 'added'
            WHEN bk IS NULL THEN 'removed'
            WHEN ah = bh THEN 'same'
            ELSE 'changed' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM j GROUP BY 1
"""


@query("snapshot_diff", _DIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )

    def fingerprint(df):
        payload = F.concat(
            F.col("event_type"),
            F.lit("|"),
            F.round(F.col("value") * 1000).cast("bigint").cast("string"),
            F.lit("|"),
            F.col("user_id").cast("string"),
        )
        return df.select(
            F.col("event_id").alias("k"), portable_hash64(payload).alias("h")
        )

    a = fingerprint(ev)
    b_src = ev.filter(
        portable_hash64(F.col("event_id"), salt="#del") % 100 >= 3
    ).withColumn(
        "value",
        F.when(F.col("event_type") == "click", F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    b_ins = ev.filter(
        portable_hash64(F.col("event_id"), salt="#ins") % 100 < 2
    ).withColumn("event_id", F.col("event_id") + 10_000_000)
    b = fingerprint(b_src.unionByName(b_ins))
    j = a.withColumnRenamed("k", "ak").withColumnRenamed("h", "ah").join(
        b.withColumnRenamed("k", "bk").withColumnRenamed("h", "bh"),
        F.col("ak") == F.col("bk"),
        "full_outer",
    )
    status = (
        F.when(F.col("ak").isNull(), "added")
        .when(F.col("bk").isNull(), "removed")
        .when(F.col("ah") == F.col("bh"), "same")
        .otherwise("changed")
    )
    return j.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))


# ----------------------------------------------------------------------
# video_frame_sample — the video half of the multimodal surface: every
# payload (an opaque binary column; here the deterministic text-bytes
# stand-in, a real codec drops in via `register_transform`) explodes
# into every-4th fixed-width frame through `operators/multimodal.
# frame_sample` — Arrow-batched mapInPandas, 1→N binary-in/binary-out,
# frames shard with their payloads. The oracle replays the byte
# arithmetic with VARCHAR slicing (the corpus is ASCII, so byte and
# character offsets coincide — asserted by the md5 contract itself).
# ----------------------------------------------------------------------

_FRAME_BYTES = 16
_FRAME_EVERY = 4

_FRAME_ORACLE = f"""
WITH m AS (
  SELECT doc_id, text AS b FROM documents WHERE text IS NOT NULL
),
n AS (
  SELECT doc_id, b,
         GREATEST(1, length(b) // {_FRAME_BYTES}) AS nf
  FROM m
),
f AS (
  SELECT doc_id, b,
         unnest(range(0, CAST(nf AS BIGINT), {_FRAME_EVERY})) AS fi
  FROM n
)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       md5(substring(b, CAST(fi * {_FRAME_BYTES} + 1 AS INT), {_FRAME_BYTES}))
         AS frame_md5
FROM f
"""


@query("video_frame_sample", _FRAME_ORACLE)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = docs.select("doc_id", F.col("text").cast("binary").alias("media"))
    frames = frame_sample(media, every_n=_FRAME_EVERY)
    return frames.select(
        "doc_id", "frame_idx", F.md5("frame").alias("frame_md5")
    )


# ----------------------------------------------------------------------
# table_fingerprint — order-insensitive whole-table checksums, the
# engine-side analogue of DistCp's post-copy CRC verification
# (`TOOLS/distcp/util/DistCpUtils.java` checksum comparison): every row
# renders to a canonical string (keys and cents as integers, so the
# rendering is engine-independent), hashes through the portable 60-bit
# md5 (`functions/hashing.py`), and the per-table fingerprint is the
# EXACT decimal sum of row hashes plus the row count. Sum-of-hashes is
# commutative — any partitioning, any engine, same fingerprint — which
# is precisely what lets a 100 TB copy be verified by two independent
# map-side scans with a 2-row comparison at the end. Output stays
# VARCHAR: the 77-bit sum does not fit a double or a BIGINT.
# ----------------------------------------------------------------------


def _canon_li_sql() -> str:
    return (
        "concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),"
        " CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),"
        " CAST(CAST(l_quantity * 100 AS DECIMAL(38,0)) AS VARCHAR),"
        " CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS VARCHAR),"
        " l_returnflag, l_linestatus)"
    )


def _canon_ord_sql() -> str:
    return (
        "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),"
        " o_orderstatus,"
        " CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS VARCHAR),"
        " CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS VARCHAR),"
        " o_orderpriority)"
    )


_FP_ORACLE = f"""
SELECT 'lineitem' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST({portable_hash64_sql(_canon_li_sql(), salt="#fp")}
            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
FROM lineitem
UNION ALL
SELECT 'orders' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST({portable_hash64_sql(_canon_ord_sql(), salt="#fp")}
            AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
FROM orders
"""


@query("table_fingerprint", _FP_ORACLE)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.hashing import portable_hash64

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cents = lambda c: (F.col(c) * 100).cast("decimal(38,0)").cast("string")  # noqa: E731
    li_canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        cents("l_quantity"),
        cents("l_extendedprice"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    )
    ord_canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        cents("o_totalprice"),
        F.floor(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .cast("string"),
        F.col("o_orderpriority"),
    )

    def fp(df: DataFrame, canon, name: str) -> DataFrame:
        return df.select(
            portable_hash64(canon, salt="#fp").alias("h")
        ).agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("fingerprint"),
        )

    return fp(li, li_canon, "lineitem").unionByName(
        fp(orders, ord_canon, "orders")
    )


# ----------------------------------------------------------------------
# audio_silence_trim — the standard speech-pipeline preprocessing step:
# find each clip's first and last NON-silent 16-sample window (window
# mean-square energy above a fixed threshold) and report the trim plan
# (how many leading/trailing windows a loader should drop). Built on the
# same REAL PCM decode as `audio_rms_windows` (Arrow-batched integer
# windows, `operators/multimodal.py`); the loud/quiet decision is the
# exact integer cross-multiplication sum_sq > TH·n — no float RMS in
# the predicate — and the trim bounds are one per-clip aggregation. The
# oracle replays the WAV generator formula end-to-end.
# ----------------------------------------------------------------------

_TRIM_TH = 358_000_000  # mean-square threshold ≈ uniform-noise average

_TRIM_ORACLE = f"""
WITH samples AS (
  SELECT d.doc_id, CAST(r.i AS BIGINT) AS i,
         (d.doc_id * 31 + CAST(r.i AS BIGINT) * 17) % 65536 - 32768 AS s
  FROM documents d CROSS JOIN (SELECT unnest(range(128)) AS i) r
  WHERE d.doc_id % 2 = 1 AND r.i < 64 + d.doc_id % 64
),
wins AS (
  SELECT doc_id, CAST(i // 16 AS INT) AS win_id,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM(s * s) AS BIGINT) AS sum_sq
  FROM samples GROUP BY doc_id, i // 16
),
flags AS (
  SELECT doc_id, win_id,
         sum_sq > {_TRIM_TH} * n_samples AS loud
  FROM wins
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(MIN(CASE WHEN loud THEN win_id END) AS INT) AS first_loud,
       CAST(MAX(CASE WHEN loud THEN win_id END) AS INT) AS last_loud,
       CAST(COUNT(*) - (MAX(CASE WHEN loud THEN win_id END)
                        - MIN(CASE WHEN loud THEN win_id END) + 1)
            AS BIGINT) AS n_trimmed
FROM flags
GROUP BY doc_id
HAVING COUNT(CASE WHEN loud THEN 1 END) > 0
"""


@query("audio_silence_trim", _TRIM_ORACLE)
def audio_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BinaryType

    from hadoop_spark.operators.multimodal import as_media, audio_windows, make_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    odd = docs.filter(F.col("doc_id") % 2 == 1)

    @pandas_udf(BinaryType())
    def wav_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_wav(int(s)))

    media = as_media(
        odd.withColumn("payload", wav_bytes("doc_id")), "doc_id", "payload", "audio"
    )
    w = audio_windows(media, win=16)
    loud = F.col("sum_sq") > F.lit(_TRIM_TH) * F.col("n_samples")
    agg = (
        w.select("doc_id", "win_id", loud.alias("loud"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.min(F.when(F.col("loud"), F.col("win_id")))
            .cast("int")
            .alias("first_loud"),
            F.max(F.when(F.col("loud"), F.col("win_id")))
            .cast("int")
            .alias("last_loud"),
            F.count(F.when(F.col("loud"), 1)).alias("n_loud"),
        )
        .filter(F.col("n_loud") > 0)
    )
    return agg.select(
        "doc_id",
        "n_windows",
        "first_loud",
        "last_loud",
        (
            F.col("n_windows")
            - (F.col("last_loud") - F.col("first_loud") + 1)
        )
        .cast("bigint")
        .alias("n_trimmed"),
    )


# ----------------------------------------------------------------------
# encoding_advisor — storage-layout profiling: one scan of the fact
# table unpivots six columns into (column, canonical value) pairs and
# derives, per column, the cardinality and hot-value statistics that
# pick a parquet encoding — DICT when the dictionary would be tiny
# relative to the data (ndv·1000 < n or ndv ≤ 64), RLE when one value
# dominates (top_share ≥ 40%), PLAIN otherwise. The decision predicates
# are integer cross-multiplications (no float thresholds to disagree
# on); values render through engine-identical canonical casts. This is
# the measure-first half of the layout work `zorder_layout` and
# `compact_small_files` finish.
# ----------------------------------------------------------------------

_ENC_COLS_SQL = [
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_orderkey", "CAST(l_orderkey AS VARCHAR)"),
    ("l_partkey", "CAST(l_partkey AS VARCHAR)"),
    ("l_quantity", "CAST(CAST(l_quantity AS DECIMAL(38,0)) AS VARCHAR)"),
    (
        "l_shipdate",
        "CAST(epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS VARCHAR)",
    ),
]


def _encoding_advisor_oracle() -> str:
    arms = "\n  UNION ALL\n".join(
        f"  SELECT '{name}' AS col, {expr} AS v FROM lineitem"
        for name, expr in _ENC_COLS_SQL
    )
    return f"""
WITH pairs AS (
{arms}
),
vc AS (
  SELECT col, v, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY col, v
),
st AS (
  SELECT col,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS ndv,
         CAST(MAX(c) AS BIGINT) AS top_c
  FROM vc GROUP BY col
)
SELECT col, n, ndv,
       CAST(top_c AS DOUBLE) / CAST(n AS DOUBLE) AS top_share,
       CASE WHEN ndv * 1000 < n OR ndv <= 64 THEN 'DICT'
            WHEN top_c * 10 >= 4 * n THEN 'RLE'
            ELSE 'PLAIN' END AS encoding
FROM st
"""


@query("encoding_advisor", _encoding_advisor_oracle())
def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    day = (
        F.floor(
            F.unix_micros(F.col("l_shipdate").cast("timestamp")) / 86_400_000_000
        )
        .cast("bigint")
        .cast("string")
    )
    cols = [
        ("l_returnflag", F.col("l_returnflag")),
        ("l_linestatus", F.col("l_linestatus")),
        ("l_orderkey", F.col("l_orderkey").cast("string")),
        ("l_partkey", F.col("l_partkey").cast("string")),
        ("l_quantity", F.col("l_quantity").cast("decimal(38,0)").cast("string")),
        ("l_shipdate", day),
    ]
    pairs = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("col"), expr.alias("v"))
                    for name, expr in cols
                ]
            )
        ).alias("p")
    ).select("p.col", "p.v")
    vc = pairs.groupBy("col", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    st = vc.groupBy("col").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.max("c").cast("bigint").alias("top_c"),
    )
    # r10 audit: raw IEEE top-value share of exact int64 counts.
    share = F.col("top_c").cast("double") / F.col("n").cast("double")
    enc = (
        F.when(
            (F.col("ndv") * 1000 < F.col("n")) | (F.col("ndv") <= 64), "DICT"
        )
        .when(F.col("top_c") * 10 >= F.col("n") * 4, "RLE")
        .otherwise("PLAIN")
    )
    return st.select(
        "col", "n", "ndv", share.alias("top_share"), enc.alias("encoding")
    )


# ----------------------------------------------------------------------
# date_dimension — generate the calendar dimension table for the fact
# span (the star-schema utility every warehouse ships): one row per day
# from the orders' min to max date with civil-date attributes. Spark-
# first AND timezone-immune: the dimension generates on the cluster from
# a 1-row span aggregate (no driver loop), and year/month/day derive
# from the Hinnant civil-from-days INTEGER algorithm — floor divisions
# only, so the result is bit-identical on any engine in any session
# timezone (an EXTRACT over to_timestamp(day·86400) shifts by the
# session zone — caught by the TZ sweep). dow is epoch day mod 7
# (1970-01-01 = Thursday → 0=Thu; weekend = Sat/Sun = 2/3).
# ----------------------------------------------------------------------

_DATE_DIM_ORACLE = """
WITH span AS (
  SELECT MIN(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000) AS d0,
         MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000) AS d1
  FROM orders
),
days AS (SELECT unnest(generate_series(d0, d1)) AS day FROM span),
c1 AS (
  SELECT day, day + 719468 AS z FROM days
),
c2 AS (
  SELECT day, z, z // 146097 AS era, z - (z // 146097) * 146097 AS doe FROM c1
),
c3 AS (
  SELECT day, era, doe,
         (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365 AS yoe
  FROM c2
),
c4 AS (
  SELECT day, era, yoe,
         doe - (365 * yoe + yoe // 4 - yoe // 100) AS doy
  FROM c3
),
c5 AS (
  SELECT day, era, yoe, doy, (5 * doy + 2) // 153 AS mp FROM c4
),
c6 AS (
  SELECT day,
         yoe + era * 400 AS y0,
         doy - (153 * mp + 2) // 5 + 1 AS dom,
         CASE WHEN mp < 10 THEN mp + 3 ELSE mp - 9 END AS m
  FROM c5
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(y0 + CASE WHEN m <= 2 THEN 1 ELSE 0 END AS INTEGER) AS yr,
       CAST((m + 2) // 3 AS INTEGER) AS qtr,
       CAST(m AS INTEGER) AS mth,
       CAST(dom AS INTEGER) AS day_of_month,
       CAST(day % 7 AS BIGINT) AS dow_epoch,
       (day % 7) IN (2, 3) AS is_weekend
FROM c6
"""


@query("date_dimension", _DATE_DIM_ORACLE)
def date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day_of = F.floor(
        F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000
    )
    span = orders.agg(
        F.min(day_of).cast("bigint").alias("d0"),
        F.max(day_of).cast("bigint").alias("d1"),
    )
    days = span.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    fdiv = lambda a, b: F.floor(a / F.lit(b)).cast("bigint")  # noqa: E731
    z = F.col("day") + 719468
    era = fdiv(z, 146097)
    doe = z - era * 146097
    yoe = fdiv(doe - fdiv(doe, 1460) + fdiv(doe, 36524) - fdiv(doe, 146096), 365)
    doy = doe - (F.lit(365) * yoe + fdiv(yoe, 4) - fdiv(yoe, 100))
    mp = fdiv(F.lit(5) * doy + 2, 153)
    dom = doy - fdiv(F.lit(153) * mp + 2, 5) + 1
    m = F.when(mp < 10, mp + 3).otherwise(mp - 9)
    yr = yoe + era * 400 + F.when(m <= 2, 1).otherwise(0)
    return days.select(
        F.col("day").cast("bigint").alias("day"),
        yr.cast("int").alias("yr"),
        fdiv(m + 2, 3).cast("int").alias("qtr"),
        m.cast("int").alias("mth"),
        dom.cast("int").alias("day_of_month"),
        (F.col("day") % 7).cast("bigint").alias("dow_epoch"),
        (F.col("day") % 7).isin(2, 3).alias("is_weekend"),
    )


# ----------------------------------------------------------------------
# posting_compression — index-layout planning for the inverted index:
# per term, the posting-list length, the delta-gap profile (max gap,
# integer average gap), and the estimated delta-encoded size in bytes —
# the numbers that decide between bitmap, delta-varint, and PEF layouts
# before an index is materialized. Gaps come from one doc_id-ordered
# window per term (posting-list bounded); the bit width is the repo's
# log-free LENGTH(BIN(x)) binary-digit-count idiom; the byte estimate is
# pure integer arithmetic: (bits(avg_gap)·(df−1) + 7) // 8 + 8.
# ----------------------------------------------------------------------

_POSTING_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
gaps AS (
  SELECT w, doc_id,
         doc_id - lag(doc_id) OVER (PARTITION BY w ORDER BY doc_id) AS gap
  FROM toks WHERE w <> ''
),
st AS (
  SELECT w,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(MAX(gap) AS BIGINT) AS max_gap,
         CAST(SUM(gap) AS BIGINT) AS sum_gap
  FROM gaps GROUP BY w
)
SELECT w AS term, df, max_gap,
       CAST(CASE WHEN df >= 2 THEN sum_gap // (df - 1) END AS BIGINT)
         AS avg_gap,
       CAST(CASE WHEN df >= 2 THEN
         (length(bin(sum_gap // (df - 1))) * (df - 1) + 7) // 8 + 8
       ELSE 8 END AS BIGINT) AS est_bytes
FROM st
"""


@query("posting_compression", _POSTING_ORACLE)
def posting_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    w = W.partitionBy("w").orderBy("doc_id")
    gaps = toks.select(
        "w", (F.col("doc_id") - F.lag("doc_id").over(w)).alias("gap")
    )
    st = gaps.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.max("gap").cast("bigint").alias("max_gap"),
        F.sum("gap").cast("bigint").alias("sum_gap"),
    )
    avg_gap = F.floor(F.col("sum_gap") / (F.col("df") - 1)).cast("bigint")
    bits = F.length(F.bin(avg_gap))
    est = F.when(
        F.col("df") >= 2,
        F.floor((bits * (F.col("df") - 1) + 7) / 8).cast("bigint") + 8,
    ).otherwise(F.lit(8))
    return st.select(
        F.col("w").alias("term"),
        "df",
        "max_gap",
        F.when(F.col("df") >= 2, avg_gap).alias("avg_gap"),
        est.cast("bigint").alias("est_bytes"),
    )


# ----------------------------------------------------------------------
# functional_dependencies — schema-discovery profiling: does column X
# functionally determine column Y? The FD holds exactly when
# ndv(X) = ndv(X, Y); the violation count ndv(X,Y) − ndv(X) measures how
# far off a near-dependency is — the signal that drives normalization,
# dictionary sharing, and join-key inference in a catalog crawler. Four
# candidate pairs profile in one pass each over bounded distinct sets;
# all integer counting.
# ----------------------------------------------------------------------

_FD_PAIRS = [
    ("part", "p_brand", "p_type"),
    ("part", "p_type", "p_brand"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_nationkey", "c_mktsegment"),
]


def _fd_oracle() -> str:
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT '{t}.{x}->{y}' AS candidate,
         (SELECT COUNT(*) FROM (SELECT DISTINCT {x} FROM {t})) AS ndv_x,
         (SELECT COUNT(*) FROM (SELECT DISTINCT {x}, {y} FROM {t})) AS ndv_xy"""
        for t, x, y in _FD_PAIRS
    )
    return f"""
WITH c AS (
{arms}
)
SELECT candidate,
       CAST(ndv_x AS BIGINT) AS ndv_x,
       CAST(ndv_xy AS BIGINT) AS ndv_xy,
       ndv_x = ndv_xy AS fd_holds,
       CAST(ndv_xy - ndv_x AS BIGINT) AS violations
FROM c
"""


@query("functional_dependencies", _fd_oracle())
def functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, x, y in _FD_PAIRS:
        df = load_table(spark, sf_dir, t)
        row = df.agg(
            F.countDistinct(x).cast("bigint").alias("ndv_x"),
            F.countDistinct(x, y).cast("bigint").alias("ndv_xy"),
        ).select(
            F.lit(f"{t}.{x}->{y}").alias("candidate"), "ndv_x", "ndv_xy"
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "candidate",
        "ndv_x",
        "ndv_xy",
        (F.col("ndv_x") == F.col("ndv_xy")).alias("fd_holds"),
        (F.col("ndv_xy") - F.col("ndv_x")).cast("bigint").alias("violations"),
    )


# ----------------------------------------------------------------------
# image_channel_stats — per-channel normalization statistics over REAL-
# decoded P6 images (the mean/std-per-channel pass every vision pipeline
# runs before training): exact integer count/sum/min/max per (image,
# channel) from `operators/multimodal.channel_stats` (Arrow-batched
# mapInPandas, 1→3 rows per image), plus the IEEE-exact channel mean.
# The oracle replays the deterministic pixel-generator formula grouped
# by i % 3 — a channel-stride bug cannot hash-match.
# ----------------------------------------------------------------------

_CHANNEL_ORACLE = """
WITH px AS (
  SELECT d.doc_id, CAST(r.i AS BIGINT) % 3 AS channel,
         (d.doc_id * 7919 + CAST(r.i AS BIGINT)) % 256 AS v
  FROM documents d CROSS JOIN (SELECT unnest(range(288)) AS i) r
  WHERE d.doc_id % 2 = 0
)
SELECT doc_id, channel,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val,
       CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_val
FROM px GROUP BY doc_id, channel
"""


@query("image_channel_stats", _CHANNEL_ORACLE)
def image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel exact pixel statistics over real-decoded P6 images."""
    from pyspark.sql.types import BinaryType

    from hadoop_spark.operators.multimodal import channel_stats, make_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    even = docs.filter(F.col("doc_id") % 2 == 0)

    @pandas_udf(BinaryType())
    def ppm_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_ppm(int(s)))

    media = as_media(
        even.withColumn("payload", ppm_bytes("doc_id")), "doc_id", "payload", "image"
    )
    stats = channel_stats(media)
    return stats.select(
        "doc_id",
        "channel",
        "n_values",
        "sum_val",
        "min_val",
        "max_val",
        (F.col("sum_val").cast("double") / F.col("n_values").cast("double"))
        .alias("mean_val"),
    )


# ----------------------------------------------------------------------
# audio_peak_normalize — the gain-staging step before audio feature
# extraction: per real-decoded PCM clip, the integer peak |sample| and
# the micro-quantized normalization gain round(32767e6 / peak) that
# scales the clip to full range. Rounding is explicit half-up in the
# Python decoder (floor(x + 0.5)) to match both engines' positive ROUND;
# everything else is exact integers. Same Arrow-batched decode path as
# `audio_rms_windows`/`audio_silence_trim`.
# ----------------------------------------------------------------------

_PEAK_ORACLE = """
WITH samples AS (
  SELECT d.doc_id,
         ABS((d.doc_id * 31 + CAST(r.i AS BIGINT) * 17) % 65536 - 32768)
           AS a
  FROM documents d CROSS JOIN (SELECT unnest(range(128)) AS i) r
  WHERE d.doc_id % 2 = 1 AND r.i < 64 + d.doc_id % 64
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(MAX(a) AS BIGINT) AS peak,
       CAST(ROUND(32767000000.0 / CAST(MAX(a) AS DOUBLE)) AS BIGINT)
         AS gain_micro
FROM samples GROUP BY doc_id
"""


@query("audio_peak_normalize", _PEAK_ORACLE)
def audio_peak_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-normalization gain plan over real-decoded PCM clips."""
    import math

    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from hadoop_spark.operators.multimodal import as_media, decode_wav, make_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    odd = docs.filter(F.col("doc_id") % 2 == 1)

    @pandas_udf(BinaryType())
    def wav_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_wav(int(s)))

    media = as_media(
        odd.withColumn("payload", wav_bytes("doc_id")), "doc_id", "payload", "audio"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("peak", LongType()),
            StructField("gain_micro", LongType()),
        ]
    )

    def run(batches):
        import io
        import struct
        import wave

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "peak": [], "gain_micro": []}
            for i, p in zip(pdf["doc_id"], pdf["media"]):
                try:
                    with wave.open(io.BytesIO(bytes(p)), "rb") as w:
                        n = w.getnframes()
                        raw = w.readframes(n)
                    samples = struct.unpack(f"<{n}h", raw)
                except Exception:
                    continue  # malformed media: skip row, never fail the task
                peak = max(abs(s) for s in samples)
                out["doc_id"].append(int(i))
                out["n_samples"].append(n)
                out["peak"].append(peak)
                # explicit half-up to match SQL ROUND on positive doubles
                out["gain_micro"].append(
                    int(math.floor(32767_000_000.0 / peak + 0.5))
                )
            yield pd.DataFrame(out)

    _ = decode_wav  # documented shared decode path (full parse used above)
    return media.mapInPandas(run, schema)


# ----------------------------------------------------------------------
# distcp_incremental — DistCp snapshot-diff sync (`hadoop-tools/
# hadoop-distcp/.../DistCp.java:60`, the `-diff <from> <to>` mode): a
# mirror holds snapshot A; the source advances to snapshot B; the sync
# must re-copy ONLY the partitions that changed, never the whole table.
# Change detection is a per-partition content fingerprint (bit_xor of
# row hashes — order-insensitive, overflow-free, computed map-side): the
# mirror side comes from an O(#partitions)-row MANIFEST written at
# mirror time, so a sync scans only the SOURCE — the mirror is never
# re-read to be diffed (the lakehouse equivalent of the HDFS snapshots
# the reference's `-diff` relies on). The changed-partition list is O(#partitions) driver
# data (the same cardinality as a partition listing), and the copy is a
# dynamic-partition-overwrite job-committed write of just those
# partitions. The `synced` flag in the result encodes WHICH partitions
# were re-copied, so a lazy full recopy (or a missed change) cannot
# hash-match the oracle; file-level laziness (untouched partitions'
# files not rewritten) is pinned in tests/test_distcp_incremental.py.
# ----------------------------------------------------------------------

_DISTCP_INC_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       -- quantize BEFORE doubling, exactly as the query does (cast to
       -- decimal(18,4) at load, then *2): the other order diverges for
       -- raw doubles finer than 4 dp
       CAST(CAST(SUM(CASE WHEN event_type = 'error'
                          THEN CAST(value AS DECIMAL(18,4)) * 2
                          ELSE CAST(value AS DECIMAL(18,4)) END)
            AS VARCHAR) AS DOUBLE) AS sum_value,
       CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT)
         AS synced
FROM events
GROUP BY event_type
"""


@query("distcp_incremental", _DISTCP_INC_ORACLE)
def distcp_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changed-partitions-only mirror sync: snapshot A mirrored, source
    advances to B ('error' values doubled), per-partition bit_xor row
    fingerprints picked the changed slice, only that slice re-copied."""
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("value"),
    )
    mirror = _scratch(sf_dir, "distcp_inc_mirror")
    # 1. the mirror holds snapshot A
    ev.write.mode("overwrite").partitionBy("event_type").parquet(mirror)
    # 2. the source advances to snapshot B
    snap_b = ev.withColumn(
        "value",
        F.when(
            F.col("event_type") == "error",
            (F.col("value") * 2).cast("decimal(18,4)"),
        ).otherwise(F.col("value")),
    )

    def fp(df):
        h = portable_hash64(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("|"),
                F.col("value").cast("string"),
            )
        )
        return (
            df.select("event_type", h.alias("h"))
            .groupBy("event_type")
            .agg(F.expr("bit_xor(h)").alias("fp"))
        )

    # The mirror's fingerprints come from a MANIFEST written at mirror
    # time (O(#partitions) rows), not from rescanning the mirror: at
    # 100 TB the sync then costs one scan of the SOURCE plus a
    # partition-count-sized join — the mirror is only ever read to be
    # served, never to be diffed (HDFS snapshots play this role for the
    # reference's `-diff`; the manifest is the lakehouse equivalent).
    manifest = _scratch(sf_dir, "distcp_inc_manifest")
    fp(ev).write.mode("overwrite").parquet(manifest)
    # persist: src_fp is consumed twice (the diff collect below and the
    # manifest refresh after the copy) — without it the refresh would
    # lazily re-run the full source scan, not reuse the result
    src_fp = fp(snap_b).withColumnRenamed("fp", "src_fp").persist()
    dst_fp = spark.read.parquet(manifest).withColumnRenamed("fp", "dst_fp")
    diff = src_fp.join(dst_fp, "event_type", "full_outer").filter(
        ~F.col("src_fp").eqNullSafe(F.col("dst_fp"))
    )
    # O(#partitions) rows — the same driver-side cardinality as DistCp's
    # copy listing of changed paths.
    changed = [r["event_type"] for r in diff.select("event_type").collect()]
    # The oracle hardcodes synced=1 for 'error', which is only valid if
    # doubling actually CHANGED that partition's fingerprint. An events
    # fixture whose error values are all 0/NULL would make the query
    # return synced=0 for a data reason, not a code bug — fail loudly on
    # the precondition instead of red-ringing the contract. A fixture
    # with NO error rows at all is fine (no 'error' group on either
    # engine — the empty-input regime), so gate on partition presence:
    # src_fp is persisted and O(#partitions) rows.
    partitions = {r["event_type"] for r in src_fp.select("event_type").collect()}
    if "error" in partitions and "error" not in changed:
        raise AssertionError(
            "distcp_incremental fixture precondition violated: the "
            "'error' partition must contain at least one nonzero value "
            "so value-doubling changes its fingerprint"
        )
    # 3. re-copy ONLY the changed partitions (dynamic overwrite commits
    # per-partition; untouched partitions' files are not rewritten)
    if changed:
        mode_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(mode_key, "static")
        spark.conf.set(mode_key, "dynamic")
        try:
            (
                snap_b.filter(F.col("event_type").isin(changed))
                .write.mode("overwrite")
                .partitionBy("event_type")
                .parquet(mirror)
            )
        finally:
            spark.conf.set(mode_key, prev)
        # refresh the manifest so the NEXT sync diffs against current
        # mirror state — reuse the already-computed source fingerprints
        # (no second source scan; same O(#partitions) write)
        src_fp.withColumnRenamed("src_fp", "fp").write.mode(
            "overwrite"
        ).parquet(manifest)
    # both eager consumers (diff collect, manifest refresh) are done —
    # release the cache entry instead of leaking it to session end
    src_fp.unpersist()
    back = spark.read.schema(ev.schema).parquet(mirror)
    synced = F.when(F.col("event_type").isin(changed), 1).otherwise(0)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").cast("double").alias("sum_value"),
        F.max(synced).cast("bigint").alias("synced"),
    )


# ----------------------------------------------------------------------
# db_pageview_roundtrip — DBCountPageView end-to-end
# (`EXAMPLES/DBCountPageView.java:78`): pageview rows batch-INSERTed into
# a relational store (`lib/db/DBOutputFormat.java:249`), then read back
# as a range-partitioned parallel scan (`lib/db/DBInputFormat.java:374`,
# `DataDrivenDBInputFormat.java`'s min/max splitters) and aggregated.
# Embedded Derby (shipped in Spark's jars) is the test stand-in; the
# operator surface — write_jdbc / read_jdbc_partitioned — is unchanged
# against a real RDBMS, where numPartitions fans the scan out to one
# range-bounded task per split and Catalyst pushes filters into the
# database (gated in tests/test_jdbc.py). The oracle recomputes the same
# aggregate straight from parquet, so a row lost in the INSERT batch, a
# split boundary off by one, or a misread column cannot hash-match.
# ----------------------------------------------------------------------

_DB_PAGEVIEW_ORACLE = """
SELECT '/page/' || event_type AS url,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE event_id % 7 = 0
GROUP BY 1
"""


@query("db_pageview_roundtrip", _DB_PAGEVIEW_ORACLE)
def db_pageview_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write pageviews to Derby, read back partitioned, count per url."""
    from hadoop_spark.sources.formats import read_jdbc_partitioned, write_jdbc

    # EMBEDDED Derby is a single-JVM database on a DRIVER-LOCAL path: on a
    # multi-process deployment (standalone/YARN/K8s) each executor JVM
    # would try to boot the same path (ERROR XSDB6) or see no database at
    # all. This catalog query is the local-mode test stand-in for the
    # DBInput/DBOutputFormat pair — real clusters point read_jdbc_partitioned
    # / write_jdbc at a network-served JDBC URL instead. Fail loudly here
    # rather than letting a cluster-mode contract run red-ring on XSDB6 or
    # silently aggregate an empty read-back.
    master = spark.sparkContext.master or ""
    if not master.startswith("local"):
        raise RuntimeError(
            "db_pageview_roundtrip uses EMBEDDED Derby (driver-local "
            f"filesystem db) and only runs on local-mode masters; got "
            f"master={master!r}. On a cluster, use write_jdbc/"
            "read_jdbc_partitioned against a network JDBC database."
        )
    # per-process db path: embedded Derby allows only ONE JVM to boot a
    # database, so a shared path would red-ring whichever of two
    # overlapping contract runs boots second (ERROR XSDB6). Before the
    # first boot of each dir in this process: clear our own (pid-reused)
    # dir so a corrupt leftover can't block the boot, and garbage-collect
    # sibling dirs belonging to DEAD pids (live pids are left alone —
    # they may be mid-query), so scratch doesn't grow one Derby database
    # per historical run.
    db_dir = _scratch(sf_dir, f"db_pageviews_{os.getpid()}")
    if db_dir not in _DERBY_CLEARED:
        shutil.rmtree(db_dir, ignore_errors=True)
        parent = os.path.dirname(db_dir)
        if os.path.isdir(parent):
            for entry in os.listdir(parent):
                m = re.fullmatch(r"db_pageviews_(\d+)", entry)
                if not m or int(m.group(1)) == os.getpid():
                    continue
                try:
                    os.kill(int(m.group(1)), 0)  # raises if pid is dead
                except ProcessLookupError:
                    shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
                except PermissionError:
                    pass  # pid alive under another user — leave it
        _DERBY_CLEARED.add(db_dir)
    url = f"jdbc:derby:{db_dir};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    # deterministic slice (a LIMIT without ORDER BY would be
    # nondeterministic between engines)
    views = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 0)
        .select(
            F.col("event_id").alias("view_id"),
            F.concat(F.lit("/page/"), F.col("event_type")).alias("url"),
            "user_id",
        )
    )
    write_jdbc(views, url, "pageviews", mode="overwrite", driver=driver)

    def per_url(df: DataFrame) -> DataFrame:
        return df.groupBy("url").agg(
            F.count(F.lit(1)).alias("n_views"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )

    # range bounds for the data-driven splits: a 1-row bounded collect,
    # the same min/max probe DataDrivenDBInputFormat issues as SQL
    b = views.agg(F.min("view_id").alias("lo"), F.max("view_id").alias("hi")).collect()[0]
    if b.lo is None:
        # empty slice (fresh day / empty partition): no split bounds to
        # read back by — the correct result is the empty aggregate, which
        # is also exactly what the oracle returns
        return per_url(views.limit(0))
    back = read_jdbc_partitioned(
        spark,
        url,
        "pageviews",
        column="view_id",
        lower=int(b.lo),
        upper=int(b.hi) + 1,
        num_partitions=4,
        driver=driver,
    )
    return per_url(back)


# ----------------------------------------------------------------------
# nline_fanout — NLineInputFormat as a driver-checkable result
# (`lib/input/NLineInputFormat.java:63`): EXACTLY N input lines per map
# task with one short tail split — 25 nation rows at N=4 → six splits of
# 4 and one of 1, the reference's split construction verbatim (r6 ADVICE
# asked for exact-N content parity over Spark's ±1-balanced round-robin,
# which the earlier version of this query certified instead). The
# observable is the SPLIT-SIZE MULTISET: floor(c/N) splits of N plus a
# (c mod N)-row tail — a pure function of COUNT(*), so the oracle
# recomputes it from the line count alone. Per-split row counts come
# from a real distributed spark_partition_id() aggregation over the
# identity-partitioned fan-out (one split per physical partition), not
# driver math.
# ----------------------------------------------------------------------

_NLINE_N = 4

_NLINE_ORACLE = f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nation)
SELECT CAST({_NLINE_N} AS BIGINT) AS rows_per_split,
       c // {_NLINE_N} AS n_splits
FROM n WHERE c // {_NLINE_N} > 0
UNION ALL
SELECT c % {_NLINE_N} AS rows_per_split,
       CAST(1 AS BIGINT) AS n_splits
FROM n WHERE c % {_NLINE_N} > 0
"""


@query("nline_fanout", _NLINE_ORACLE)
def nline_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N-lines-per-task fan-out; result = split-size histogram."""
    from hadoop_spark.sources.formats import nline_repartition, write_kv_text

    nation = load_table(spark, sf_dir, "nation").orderBy("n_nationkey")
    path = _scratch(sf_dir, "nline_nation")
    write_kv_text(
        nation.select(
            F.col("n_nationkey").cast("string").alias("key"),
            F.col("n_name").alias("value"),
        ).coalesce(1),
        path,
    )
    # single input partition -> zipWithIndex order is the file order, the
    # same order NLineInputFormat walks when placing split boundaries
    lines = spark.read.text(path).coalesce(1)
    parted = nline_repartition(lines, _NLINE_N)
    per_split = (
        parted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("rows_per_split"))
    )
    return per_split.groupBy("rows_per_split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_splits")
    )


# Oracle recomputes routes + counts from content and pins empty_files to
# a LITERAL 0 — the hash match proves the three lazy-output properties
# (no dir for the empty route, every listed file visible to the scan,
# counts intact).
_LAZY_MANIFEST_ORACLE = """
SELECT o_orderstatus AS route,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS empty_files
FROM orders
GROUP BY o_orderstatus
"""


@query("lazy_output_manifest", _LAZY_MANIFEST_ORACLE)
def lazy_output_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LazyOutputFormat / FilterOutputFormat as a driver-checkable
    observable (`lib/output/LazyOutputFormat.java:39`: the real output
    format is created only on the first actual write, so a route that
    receives zero records leaves NO file behind; `NullOutputFormat
    .java:33` is the all-routes-empty degenerate case).

    Write orders routed by status with a candidate route ('X_EMPTY') that
    matches zero rows, then build the manifest from the FILESYSTEM, not
    the data: listed route dirs + per-route file counts from the commit
    listing, row counts and file visibility from the read-back scan. If
    the writer materialized the empty route, an extra (X_EMPTY, 0, 0) row
    breaks the hash; if any committed file were empty, empty_files > 0
    breaks it. The listing is O(#files) driver work — the same order the
    committer itself pays at commit time (`FileOutputCommitter`'s task-
    dir merge); the manifest frame is O(#routes).
    """
    orders = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "lazy_routed_orders")
    routed = orders.select(
        F.when(F.col("o_totalprice") < 0, F.lit("X_EMPTY"))
        .otherwise(F.col("o_orderstatus"))
        .alias("route"),
        "o_orderkey",
    )
    routed_write(routed, path, "route")
    listed = []
    for d in sorted(os.listdir(path)):
        if not d.startswith("route="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        listed.append((d.split("=", 1)[1], len(files)))
    manifest = spark.createDataFrame(listed, "route string, n_files int")
    # explicit schema: an all-routes-empty write (the NullOutputFormat
    # degenerate case) leaves no data files to infer from — the read must
    # still resolve, returning the empty manifest
    back = (
        spark.read.schema(routed.schema)
        .parquet(path)
        .withColumn("fname", F.input_file_name())
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("fname").alias("files_with_rows"),
        )
    )
    return manifest.join(back, "route", "full_outer").select(
        "route",
        F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
        (
            F.coalesce("n_files", F.lit(0))
            - F.coalesce("files_with_rows", F.lit(0))
        )
        .cast("bigint")
        .alias("empty_files"),
    )


# ----------------------------------------------------------------------
# tb_vector_pipe — typed-bytes VECTOR type (code 8) through a real
# external process (`hadoop-streaming/.../typedbytes/Type.java` VECTOR,
# `TypedBytesInput.java readVector`): the migration path for a user whose
# typed-bytes mapper consumes ARRAY-valued records (`-io typedbytes` with
# vector payloads). The mapper script is a STANDALONE struct-based
# typed-bytes implementation (it shares no code with operators/pipe.py —
# the wire format is the only contract, exactly as a foreign binary
# would), shipped via the `-file` mechanism (sc.addFile). Embeddings are
# quantized to exact integers (the jl/q4 idiom) so the subprocess's sums
# are engine-independent. Map-side only: one subprocess per partition,
# no shuffle — at 100 TB this is the same embarrassingly-parallel shape
# as every streaming mapper.
# ----------------------------------------------------------------------

_TB_VECTOR_ORACLE = """
SELECT vec_id,
       CAST(COALESCE(list_sum(list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))), 0)
         AS BIGINT) AS vsum,
       CAST(len(embedding) AS INT) AS n_dims
FROM embeddings
"""

# Standalone typed-bytes vector mapper: reads (LONG/INT vec_id, VECTOR of
# LONG/INT) pairs, emits (vec_id, element sum, element count). Implements
# the public wire spec directly — independent of hadoop_spark.
_TB_VECTOR_MAPPER = '''\
import struct, sys

r, w = sys.stdin.buffer, sys.stdout.buffer


def read_one(code):
    if code == 3:
        return struct.unpack(">i", r.read(4))[0]
    if code == 4:
        return struct.unpack(">q", r.read(8))[0]
    if code == 8:
        (n,) = struct.unpack(">i", r.read(4))
        return [read_one(r.read(1)[0]) for _ in range(n)]
    raise ValueError(f"unexpected type code {code}")


def write_long(v):
    if -(2**31) <= v < 2**31:
        w.write(struct.pack(">Bi", 3, v))
    else:
        w.write(struct.pack(">Bq", 4, v))


while True:
    b = r.read(1)
    if not b:
        break
    vec_id = read_one(b[0])
    vec = read_one(r.read(1)[0])
    write_long(vec_id)
    write_long(sum(vec))
    write_long(len(vec))
'''


@query("tb_vector_pipe", _TB_VECTOR_ORACLE)
def tb_vector_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-bytes VECTOR records piped through a shipped foreign mapper.

    Exercises code 8 (count-prefixed nested values) in BOTH directions of
    the wire: our encoder writes (vec_id, vector<long>) records; the
    subprocess — a standalone implementation of the spec — decodes them,
    sums the vector, and writes scalar typed-bytes back. The oracle
    recomputes the quantized element sums in SQL, so a mis-framed vector
    (wrong count, wrong nesting, byte-order slip) shifts every downstream
    record and cannot hash-match.

    Quantization is ``floor(x * 10^4 + 0.5)`` on BOTH sides, not ROUND:
    multiply, add, and floor are exactly-defined IEEE operations, so the
    two engines produce bit-identical integers with no dependence on
    either engine's decimal-rounding tie rule (the r9 cross-engine
    HALF_UP-vs-half-even class). The oracle's list_sum is COALESCE'd to 0
    so a zero-length embedding row matches the mapper's ``sum([]) == 0``
    (DuckDB's list_sum of an empty list is NULL)."""
    script_dir = _scratch(sf_dir, "tb_vector")
    os.makedirs(script_dir, exist_ok=True)
    script = os.path.join(script_dir, "tb_vector_mapper.py")
    with open(script, "w") as f:
        f.write(_TB_VECTOR_MAPPER)

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 10_000 + 0.5).cast("bigint"),
        ).alias("q4"),
    )
    return pipe_typedbytes(
        emb,
        "python3",
        "vec_id bigint, vsum bigint, n_dims int",
        ship_script=script,
    )


# ----------------------------------------------------------------------
# combine_compaction_bins — CombineFileInputFormat's packing policy on
# the WRITE side (`lib/input/CombineFileInputFormat.java:365` — the
# curSplitSize >= maxSize loop accumulates files into a split until
# maxSplitSize is reached; HAR /
# small-files compaction applies the same policy when REWRITING): given a
# directory of real committed small files, plan target-size bins over the
# per-file listing (exclusive-prefix-sum binning — each bin's payload is
# < target + one file, the same straddle tolerance the reference's
# accumulate-loop has), execute the compaction (one shuffle by bin — the
# rewrite itself), and derive the result from the COMMITTED output:
# per-bin row/byte totals recomputed from content, input-file fan-in, and
# the committed-file count, which the oracle pins to a literal 1 — a bin
# split across output files, an unplanned bin, or a lost/duplicated row
# all break the hash. Scale: the plan is a window over the per-FILE
# listing (O(#files), the same order any compactor pays to list the
# directory), the file->bin map is a broadcast of that listing, and the
# data movement is one hash shuffle by bin.
# ----------------------------------------------------------------------

_COMBINE_BINS_TARGET = 16_384  # bytes of text payload per compacted bin

_COMBINE_BINS_ORACLE = f"""
WITH f AS (
  SELECT doc_id % 64 AS file_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS fbytes
  FROM documents GROUP BY 1
), p AS (
  SELECT file_id, n_rows, fbytes,
         COALESCE(SUM(fbytes) OVER (ORDER BY file_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM f
)
SELECT CAST(prefix // {_COMBINE_BINS_TARGET} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_input_files,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(fbytes) AS BIGINT) AS bin_bytes,
       CAST(1 AS BIGINT) AS files_committed
FROM p GROUP BY 1
"""


@query("combine_compaction_bins", _COMBINE_BINS_ORACLE)
def combine_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction with the CombineFileInputFormat packing policy,
    verified from the committed filesystem output (see block comment)."""
    from pyspark.sql import Window

    from hadoop_spark.operators.join import bcast_if_small

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 64).alias("file_id")
    )
    small = _scratch(sf_dir, "combine_small_in")
    out = _scratch(sf_dir, "combine_compacted")
    shutil.rmtree(small, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    docs.repartition("file_id").write.partitionBy("file_id").parquet(small)

    # Plan from the physical small-file listing's CONTENT (logical bytes —
    # the policy input; physical parquet bytes are encoder-dependent and
    # not oracle-derivable). The window is over #files rows, not data.
    # Explicit schema: a zero-row source writes no part files to infer
    # from (the partition column stays string-typed then — cast it).
    back = spark.read.schema("doc_id bigint, text string, file_id bigint").parquet(
        small
    ).select(
        F.col("file_id").cast("bigint").alias("file_id"),
        "doc_id",
        "text",
        F.octet_length("text").cast("bigint").alias("nb"),
    )
    sizes = back.groupBy("file_id").agg(F.sum("nb").alias("fbytes"))
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    plan = sizes.withColumn(
        "prefix", F.coalesce(F.sum("fbytes").over(w), F.lit(0))
    ).select(
        "file_id", F.expr(f"prefix DIV {_COMBINE_BINS_TARGET}").alias("bin")
    )

    # Execute the rewrite: file->bin map broadcast (size-guarded — the
    # listing is O(#files) and a million-file directory should degrade to
    # a shuffle join, not OOM the driver), one shuffle by bin, one
    # committed file per bin (repartition co-locates each bin in one task).
    binned = back.join(bcast_if_small(plan), "file_id")
    binned.repartition("bin").write.partitionBy("bin").parquet(out)

    comp = spark.read.schema(
        "file_id bigint, doc_id bigint, text string, nb bigint, bin bigint"
    ).parquet(out).withColumn("fname", F.input_file_name())
    return comp.groupBy(F.col("bin").cast("bigint").alias("bin")).agg(
        F.countDistinct("file_id").cast("bigint").alias("n_input_files"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("nb").cast("bigint").alias("bin_bytes"),
        F.countDistinct("fname").cast("bigint").alias("files_committed"),
    )
