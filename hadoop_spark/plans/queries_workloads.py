"""Workload-generator & misc MR-application parity (SURVEY §2.11, §2.1).

The reference ships self-contained MR applications that double as
correctness/throughput workloads; each becomes one declarative query here:

- TeraGen / TeraSort / TeraValidate (`EXAMPLES/terasort/TeraGen.java:67`,
  `TeraSort.java:49`, `TeraValidate.java:52`) → synthetic range source +
  global orderBy + order/checksum invariants.
- QuasiMonteCarlo π (`EXAMPLES/QuasiMonteCarlo.java:78`, estimatePi `:249`)
  → deterministic low-discrepancy-ish points from integer mixing, a single
  conditional aggregate.
- RandomTextWriter (`EXAMPLES/RandomTextWriter.java:77`) → deterministic
  synthetic text + the WordCount-shaped count over it.
- StreamXmlRecordReader (`STREAMING/streaming/StreamXmlRecordReader.java`)
  → XML-wrapped records parsed back to columns with `from_xml`.
- SkipBadRecords (`MR-CORE/mapred/SkipBadRecords.java:55`) → `try_cast`
  parse-or-null with skipped rows filtered, the declarative analogue of the
  reference's skip-range retry loop.
- MultipleInputs (`lib/input/MultipleInputs.java:40`) → heterogeneous
  sources aligned and unioned by name.

Determinism note: all synthetic data derives from `id` via exact BIGINT
mixing (multiply/add/mod — identical semantics in Spark and DuckDB), never
from Math.random/hash functions whose bit layout could differ between
engines. At 100 TB the generators scale linearly: `spark.range(n)` splits
the id space across executors with no input I/O and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.functions.numeric import dsum, dsum_sql
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table

_TERA_N = 60_000
# 10-digit zero-padded key from a multiplicative-mix of id: the TeraGen
# 10-byte-key/90-byte-filler record shape (`TeraGen.java:67`).
_TERA_KEY_SQL = "LPAD(CAST((id * 2654435761) % 9999999999 AS VARCHAR), 10, '0')"
_TERA_KEY_SPARK = "lpad(cast((id * 2654435761) % 9999999999 AS string), 10, '0')"


_TERAGEN_SORT_ORACLE = f"""
WITH gen AS (
  SELECT range AS id, {_TERA_KEY_SQL} AS key FROM range({_TERA_N})
)
SELECT key, id AS payload_id,
       CAST(ROW_NUMBER() OVER (ORDER BY key, id) AS BIGINT) AS rank
FROM gen
"""


@query("teragen_sort", _TERAGEN_SORT_ORACLE)
def teragen_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TeraGen + TeraSort: synthesize keyed records from a pure range source
    and totally order them. The rank column encodes the global order in row
    values so the order-insensitive oracle hash still verifies the sort.

    Scale: spark.range needs no input files (`RangeInputFormat` parity,
    `TeraGen.java:75`); the rank comes from the partition-offset idiom
    (operators/sort.py global_rank) — range partition, rank within, add
    broadcast offsets — so even rank materialization stays parallel.
    """
    from hadoop_spark.operators.sort import global_rank

    gen = spark.range(_TERA_N).select(
        F.expr(_TERA_KEY_SPARK).alias("key"), F.col("id").alias("payload_id")
    )
    return global_rank(gen, "key", "payload_id", out="rank")


_TERAVALIDATE_ORACLE = f"""
WITH gen AS (
  SELECT {_TERA_KEY_SQL} AS key FROM (SELECT range AS id FROM range({_TERA_N}))
), sorted AS (
  SELECT key, LAG(key) OVER (ORDER BY key) AS prev FROM gen
)
SELECT COUNT(*) AS n_records,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev > key THEN 1 ELSE 0 END) AS BIGINT)
         AS misordered,
       CAST(SUM(CAST(key AS BIGINT)) AS BIGINT) AS checksum
FROM sorted
"""


@query("teravalidate", _TERAVALIDATE_ORACLE)
def teravalidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TeraValidate: order + checksum invariants of the sorted stream
    (`TeraValidate.java:52`: global order, record count, key checksum).

    Spark side checks order per-partition + across range-partition
    boundaries (no global window): sortWithinPartitions after a range
    repartition gives each partition a sorted, disjoint key range, so
    misordered pairs can only be local — counted with a partition-local
    lag. The checksum is partition-order-independent.
    """
    gen = spark.range(_TERA_N).select(F.expr(_TERA_KEY_SPARK).alias("key"))
    sorted_df = gen.repartitionByRange(8, "key").sortWithinPartitions("key")
    part = F.spark_partition_id()
    from pyspark.sql import Window

    w = Window.partitionBy(part).orderBy("key")
    lagged = sorted_df.withColumn("prev", F.lag("key").over(w))
    return lagged.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(
            F.when(F.col("prev").isNotNull() & (F.col("prev") > F.col("key")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("misordered"),
        F.sum(F.col("key").cast("bigint")).cast("bigint").alias("checksum"),
    )


_PI_N = 100_000
_PI_ORACLE = f"""
WITH pts AS (
  SELECT ((range * 1103515245 + 12345) % 1048576) / 1048576.0 AS x,
         ((range * 69069 + 1) % 1048576) / 1048576.0 AS y
  FROM range({_PI_N})
)
SELECT 4.0 * SUM(CASE WHEN x * x + y * y <= 1.0 THEN 1 ELSE 0 END) / COUNT(*)
         AS pi_estimate,
       COUNT(*) AS n_points
FROM pts
"""


@query("pi_estimate", _PI_ORACLE)
def pi_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuasiMonteCarlo π (`EXAMPLES/QuasiMonteCarlo.java:249`): deterministic
    pseudo-points from integer mixing; one conditional aggregate, no input,
    no shuffle beyond the final 1-row reduction."""
    pts = spark.range(_PI_N).select(
        (((F.col("id") * 1103515245 + 12345) % 1048576) / 1048576.0).alias("x"),
        (((F.col("id") * 69069 + 1) % 1048576) / 1048576.0).alias("y"),
    )
    inside = F.when(F.col("x") * F.col("x") + F.col("y") * F.col("y") <= 1.0, 1).otherwise(0)
    return pts.agg(
        (F.lit(4.0) * F.sum(inside) / F.count(F.lit(1))).alias("pi_estimate"),
        F.count(F.lit(1)).alias("n_points"),
    )


_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()
_RTW_N = 50_000
_WORDS_SQL = "[" + ", ".join(f"'{w}'" for w in _WORDS) + "]"

_RANDOM_TEXT_ORACLE = f"""
WITH gen AS (
  SELECT {_WORDS_SQL}[CAST((range * 2654435761) % 20 AS INTEGER) + 1] AS word
  FROM range({_RTW_N})
)
SELECT word, COUNT(*) AS cnt FROM gen GROUP BY word
"""


@query("random_text_stats", _RANDOM_TEXT_ORACLE)
def random_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomTextWriter parity (`EXAMPLES/RandomTextWriter.java:77`):
    deterministic synthetic words from a fixed vocabulary + the WordCount
    aggregation over them — generator and consumer in one plan."""
    vocab = F.array(*[F.lit(w) for w in _WORDS])
    gen = spark.range(_RTW_N).select(
        F.element_at(vocab, ((F.col("id") * 2654435761) % 20).cast("int") + 1).alias("word")
    )
    return gen.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


_XML_ORACLE = """
WITH xml AS (
  SELECT '<doc><id>' || CAST(doc_id AS VARCHAR) || '</id><lang>' || lang ||
         '</lang><chars>' || CAST(n_chars AS VARCHAR) || '</chars></doc>' AS rec
  FROM documents
)
SELECT CAST(regexp_extract(rec, '<id>(-?[0-9]+)</id>', 1) AS BIGINT) AS doc_id,
       regexp_extract(rec, '<lang>([^<]*)</lang>', 1) AS lang,
       CAST(regexp_extract(rec, '<chars>(-?[0-9]+)</chars>', 1) AS BIGINT) AS n_chars
FROM xml
"""


@query("xml_records", _XML_ORACLE)
def xml_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamXmlRecordReader parity, split-aware
    (`STREAMING/streaming/StreamXmlRecordReader.java`): documents are
    WRITTEN as a contiguous `<doc>…</doc>` byte stream (concatenated
    records, no newline framing — the hard case) and read back through
    `sources/formats.read_xml_records`, which frames records with the
    text source's end-tag delimiter (the LineRecordReader split contract,
    so records straddling split boundaries are recovered exactly once).
    The read runs with `maxPartitionBytes` forced down so even at sf0.01
    the file fans out across MANY byte-range splits with records cut at
    every boundary; parse is `from_xml` (JVM-side) and the oracle
    cross-checks with pure regex extraction."""
    import os

    from hadoop_spark.sources.formats import read_xml_records

    docs = load_table(spark, sf_dir, "documents")
    rec = F.concat(
        F.lit("<doc><id>"),
        F.col("doc_id").cast("string"),
        F.lit("</id><lang>"),
        F.col("lang"),
        F.lit("</lang><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars></doc>"),
    ).alias("rec")
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(repo, ".tmp", "io", tag, "xml_docs")
    # contiguous record streams: records concatenated with no separator
    # (lineSep="" is rejected, so pre-concatenate per group). The group
    # key is doc_id // 1024, NOT a whole repartition(4) partition: each
    # concatenated stream holds ≤ 1024 records regardless of corpus size
    # (a per-partition concat is |docs|/tasks — one executor-OOM string
    # at 100 TB), writer parallelism scales with the data, and the
    # downstream byte-range-split read recovers the same record SET from
    # any layout, so the fixture stays hash-stable. The key is computed
    # in INTEGER arithmetic (subtract pmod, then exact `div`): double
    # division truncates toward zero (merging the chunks around zero for
    # negative ids) and rounds above 2^53 — floor semantics at any
    # magnitude keep the documented ≤1024-records-per-stream bound exact
    # (r7 ADVICE).
    (
        docs.select(
            F.expr("(doc_id - pmod(doc_id, 1024)) div 1024").alias("chunk"),
            rec,
        )
        .groupBy("chunk")
        .agg(F.concat_ws("", F.array_sort(F.collect_list("rec"))).alias("value"))
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )
    key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key)
    spark.conf.set(key, "4096")  # force many byte-range splits per file
    try:
        # eager localCheckpoint: the scan EXECUTES inside the conf window
        # (split planning reads the conf at action time), so the returned
        # frame really was assembled from many boundary-cut splits; rows
        # stay on executors, nothing is collected
        framed = read_xml_records(spark, path, tag="doc").localCheckpoint()
    finally:
        spark.conf.set(key, prev)
    parsed = framed.select(
        F.from_xml(F.col("record"), "id BIGINT, lang STRING, chars BIGINT").alias("x")
    )
    return parsed.select(
        F.col("x.id").alias("doc_id"),
        F.col("x.lang").alias("lang"),
        F.col("x.chars").alias("n_chars"),
    )


_BAD_RECORD_ORACLE = f"""
WITH raw AS (
  SELECT CASE WHEN l_orderkey % 97 = 0
              THEN CAST(l_quantity AS VARCHAR) || 'x'
              ELSE CAST(l_quantity AS VARCHAR) END AS qty_str
  FROM lineitem
),
parsed AS (SELECT TRY_CAST(qty_str AS DOUBLE) AS qty FROM raw)
SELECT COUNT(*) AS n_total,
       COUNT(qty) AS n_parsed,
       COUNT(*) - COUNT(qty) AS n_skipped,
       {dsum_sql("qty")} AS sum_qty
FROM parsed
"""


@query("bad_record_skip", _BAD_RECORD_ORACLE)
def bad_record_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SkipBadRecords parity (`mapred/SkipBadRecords.java:55`): malformed
    rows (deterministically corrupted here) parse to NULL via try_cast and
    are excluded from the aggregate while remaining countable — the
    declarative version of the reference's skip-range retry protocol, with
    the skip count surfacing as a metric instead of a task-attempt log."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_str = F.when(
        F.col("l_orderkey") % 97 == 0, F.concat(F.col("l_quantity").cast("string"), F.lit("x"))
    ).otherwise(F.col("l_quantity").cast("string"))
    parsed = li.select(qty_str.alias("qty_str")).select(
        F.expr("try_cast(qty_str AS DOUBLE)").alias("qty")
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("qty").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("qty")).alias("n_skipped"),
        dsum(F.col("qty")).alias("sum_qty"),
    )


_MULTI_INPUT_ORACLE = f"""
WITH unioned AS (
  SELECT o_orderkey AS key, 'orders' AS src, o_totalprice AS amount FROM orders
  UNION ALL
  SELECT l_orderkey AS key, 'lineitem' AS src, l_extendedprice AS amount FROM lineitem
)
SELECT src, COUNT(*) AS n_rows, {dsum_sql("amount")} AS total_amount
FROM unioned GROUP BY src
"""


@query("multi_input_union", _MULTI_INPUT_ORACLE)
def multi_input_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleInputs parity (`lib/input/MultipleInputs.java:40` +
    `DelegatingMapper.java:58`): per-source projection (the per-path Mapper)
    aligns heterogeneous schemas, then unionByName — each source keeps its
    own pushed-down scan; the union is a no-shuffle concatenation."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.lit("orders").alias("src"),
        F.col("o_totalprice").alias("amount"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key"),
        F.lit("lineitem").alias("src"),
        F.col("l_extendedprice").alias("amount"),
    )
    return (
        orders.unionByName(li)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum(F.col("amount")).alias("total_amount"))
    )


_NQUEENS_N = 8
_NQUEENS_ORACLE = f"""
WITH RECURSIVE q(placed, r) AS (
  SELECT '', 0
  UNION ALL
  SELECT placed || CAST(c AS VARCHAR), r + 1
  FROM q, (SELECT unnest(range({_NQUEENS_N})) AS c)
  WHERE r < {_NQUEENS_N} AND NOT EXISTS (
    SELECT 1 FROM (SELECT unnest(range(r)) AS i)
    WHERE CAST(substr(placed, CAST(i AS INT) + 1, 1) AS INT) = c
       OR ABS(CAST(substr(placed, CAST(i AS INT) + 1, 1) AS INT) - c)
          = r - CAST(i AS INT)
  )
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_solutions,
       MIN(placed) AS first_solution
FROM q WHERE r = {_NQUEENS_N}
"""


@query("search_fanout_nqueens", _NQUEENS_ORACLE)
def search_fanout_nqueens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed constraint-search fan-out — the DistributedPentomino
    shape (`EXAMPLES/dancing/DistributedPentomino.java:47`: enumerate
    search prefixes, fan the subtrees across the cluster). Here: N-queens
    via N rounds of crossJoin + higher-order-function conflict pruning; the
    frontier is a DataFrame the whole way (each round a narrow flatMap —
    no shuffle until the final count), so at scale the search tree spreads
    over however many executors the frontier fills. Oracle: the same
    search as a DuckDB recursive CTE."""
    n = _NQUEENS_N
    cols = spark.range(n).select(F.col("id").cast("int").alias("c"))
    frontier = spark.createDataFrame([("",)], "placed string")
    for r in range(n):
        cand = frontier.crossJoin(F.broadcast(cols))
        if r > 0:
            conflict = F.exists(
                F.sequence(F.lit(0), F.lit(r - 1)),
                lambda i: (
                    F.substring(F.col("placed"), i + 1, 1).cast("int") == F.col("c")
                )
                | (
                    F.abs(
                        F.substring(F.col("placed"), i + 1, 1).cast("int") - F.col("c")
                    )
                    == F.lit(r) - i
                ),
            )
            cand = cand.filter(~conflict)
        frontier = cand.select(
            F.concat(F.col("placed"), F.col("c").cast("string")).alias("placed")
        )
        if r == 2:
            # fan the surviving prefixes across the cluster: the reference
            # shipped prefix workloads to mappers; here one repartition
            # spreads the remaining subtree walk.
            frontier = frontier.repartition(
                spark.sparkContext.defaultParallelism
            )
    return frontier.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_solutions"),
        F.min("placed").alias("first_solution"),
    )


_JOBCONTROL_ORACLE = r"""
WITH clean AS (
  SELECT * FROM documents WHERE text IS NOT NULL AND n_chars > 0
),
words AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM clean
)
SELECT 'clean_docs' AS job, 'SUCCESS' AS state,
       (SELECT COUNT(*) FROM clean) AS n_rows,
       CAST(NULL AS VARCHAR) AS depends
UNION ALL
SELECT 'wordcount', 'SUCCESS',
       (SELECT COUNT(DISTINCT word) FROM words WHERE word <> ''),
       'clean_docs'
UNION ALL
SELECT 'lang_summary', 'SUCCESS',
       (SELECT COUNT(DISTINCT lang) FROM clean), 'clean_docs'
UNION ALL
SELECT 'bad_job', 'FAILED', CAST(NULL AS BIGINT), 'clean_docs'
UNION ALL
SELECT 'downstream_of_bad', 'DEPENDENT_FAILED', CAST(NULL AS BIGINT), 'bad_job'
"""


@query("job_pipeline", _JOBCONTROL_ORACLE)
def job_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JobControl parity (`lib/jobcontrol/JobControl.java:57`): a 5-job DAG
    with a materialized parquet hand-off between stages, a deliberately
    failing job, and the reference's DEPENDENT_FAILED propagation — the
    counters report (job, state, n_rows, depends) is the query result, so
    the state machine itself is oracle-checked."""
    import os

    from hadoop_spark.plans.jobcontrol import JobControl

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    stage = os.path.join(repo, ".tmp", "jobcontrol", tag, "clean_docs")

    def clean_docs() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.col("n_chars") > 0)
        )
        docs.write.mode("overwrite").parquet(stage)
        return spark.read.parquet(stage)

    def wordcount() -> DataFrame:
        return (
            spark.read.parquet(stage)
            .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .select("word")
            .distinct()
        )

    def lang_summary() -> DataFrame:
        return spark.read.parquet(stage).select("lang").distinct()

    def bad_job() -> DataFrame:
        return spark.read.parquet(stage).select("no_such_column")

    def downstream_of_bad() -> DataFrame:  # pragma: no cover — never runs
        return spark.read.parquet(stage)

    jc = (
        JobControl(spark)
        .add("clean_docs", clean_docs)
        .add("wordcount", wordcount, depends=("clean_docs",))
        .add("lang_summary", lang_summary, depends=("clean_docs",))
        .add("bad_job", bad_job, depends=("clean_docs",))
        .add("downstream_of_bad", downstream_of_bad, depends=("bad_job",))
    )
    jc.run()
    return jc.report()


_BIGRAM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
  FROM toks WHERE len(w) >= 2
)
SELECT g AS bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams GROUP BY g HAVING COUNT(*) >= 5
"""


@query("bigram_counts", _BIGRAM_ORACLE)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n-gram language-model count — the canonical MapReduce-era corpus
    workload (WordCount generalized to adjacent pairs,
    `EXAMPLES/WordCount.java:34` lineage) with the standard count cutoff
    (≥5) that keeps the LM table bounded. Map-side explode of adjacent
    pairs, one combined shuffle; at 100 TB the cutoff is what makes the
    result table storable."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("w")
    ).filter(F.size("w") >= 2)
    grams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("w", i), F.element_at("w", i + 1)
                ),
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


_INVINDEX_ORACLE = r"""
WITH posts AS (
  SELECT DISTINCT
         unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS word,
         doc_id
  FROM documents WHERE text IS NOT NULL
)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM posts GROUP BY word
"""


@query("inverted_index", _INVINDEX_ORACLE)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted index — the original MapReduce showcase workload:
    word → document frequency + doc_id-ordered posting list. Postings are
    sorted inside the aggregate (array_sort, deterministic), so the
    rendered list is engine-exact. At 100 TB a posting-length cap bounds
    stopword rows; omitted here to keep the oracle exact."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    posts = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word"), "doc_id"
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    return posts.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.array_sort(F.collect_list(F.col("doc_id"))), ","
        ).alias("postings"),
    )


# ---------------------------------------------------------------------------
# Triangle counting — the classic MapReduce graph workload (Cohen,
# "Graph Twiddling in a MapReduce World"), done the way it scales: orient
# every edge from its lower-(degree, id) endpoint to the higher one, so
# each wedge is enumerated exactly once AT the lowest-degree vertex —
# wedge fan-out is Σ_v out_deg(v)² with out-degrees bounded by ~sqrt(2m),
# instead of the unbounded in-degree hubs a naive enumeration hits.
# Graph: suppliers co-occurring in an order (distinct pairs per order).
#
# Idiom choice, measured: the wedge step is the oriented-edge SELF-JOIN
# (e1.s = e2.s, e1.t < e2.t), NOT the collect_list-adjacency + map-side
# pair expansion that `operators/graph.cooccurrence_pairs` uses for
# basket pairs. Both were benchmarked head-to-head at sf0.1 (median of
# 3, noop sink, same oriented input): self-join 6.4 s vs adjacency
# 11.0 s — the struct-array collect/copy/slice overhead of per-center
# adjacency rows costs more than the sort-merge join saves, and unlike
# baskets (≤ C(7,2) pairs per order) the post-orientation out-degree is
# only sqrt-bounded, so the array idiom also loses its bounded-group
# safety argument. The same applies to `clustering_coefficient` and
# `link_prediction_cn`, which share this wedge machinery.

_TRIANGLE_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS u,
                  GREATEST(a.l_suppkey, b.l_suppkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS s,
         CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS t
  FROM pairs p
  JOIN deg du ON du.node = p.u
  JOIN deg dv ON dv.node = p.v
),
wedges AS (
  SELECT e1.t AS b, e2.t AS c
  FROM oriented e1 JOIN oriented e2
    ON e1.s = e2.s AND e1.t < e2.t
),
-- closing edges canonicalized to (min, max) node order so the triangle
-- probe is ONE hash equi-join — the previous OR-disjunction join
-- ((s=b AND t=c) OR (s=c AND t=b)) forced DuckDB into a nested-loop
-- scan of wedges x edges (>15 min at sf0.1; this form runs in seconds).
-- Wedge (b, c) already has b < c by node id, so the match is exact.
closing AS (
  SELECT LEAST(s, t) AS x, GREATEST(s, t) AS y FROM oriented
)
SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM wedges w
             JOIN closing e ON e.x = w.b AND e.y = w.c) AS BIGINT)
         AS n_triangles
"""


@query("triangle_count", _TRIANGLE_ORACLE)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the supplier co-occurrence graph (suppliers
    sharing an order). Scale shape: per-order pair fan-out is bounded by
    the lines-per-order cap (TPC-H ≤ 7 → ≤ 21 pairs); degree-oriented
    wedge enumeration keeps the quadratic step at the LOW-degree endpoint
    (out-degree ≤ ~sqrt(2m) under this orientation — the standard bound);
    the closing step is an EQUI-join keyed on the oriented closing edge
    (wedges carry endpoint degrees, so the closing edge's orientation is
    computed, never searched — a disjunctive join condition here would
    degrade to a nested-loop join). Three shuffles over edge-sized data,
    nothing driver-side."""
    from hadoop_spark.operators.graph import cooccurrence_pairs, wedge_closure
    from hadoop_spark.sources.tables import shared

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = shared(cooccurrence_pairs(li, "l_orderkey", "l_suppkey"))
    # r11 opt (guide §4 + §1.2): the ~350 M-row wedge self-join enumerated
    # in the JVM is replaced by the vectorized wedge_closure kernel — the
    # pair list is EDGE-sized and cap-guarded (the kernel also computes
    # the degree orientation in numpy, so the deg aggregation + joins
    # below exist only on the degrade path, and n_edges/n_nodes fall out
    # of the kernel's driver pass); above the cap the JVM join below
    # remains the 100 TB shape.
    kern = wedge_closure(spark, pairs, "count")
    if kern is not None:
        n_tri = kern.out.agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_triangles")
        )
        return (
            spark.createDataFrame(
                [(kern.n_edges, kern.n_nodes)], "n_edges bigint, n_nodes bigint"
            )
            .crossJoin(n_tri)
            .select("n_edges", "n_nodes", "n_triangles")
        )
    deg = shared(
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # oriented edge (s -> t), carrying t's degree so wedges can orient
    # their closing edge without another lookup
    oriented = shared(
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
        )
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # wedge at s; closing edge must run lower-(deg,id) ->
    # higher-(deg,id), computed from the carried degrees -> plain
    # equi-join keys (cs, ct)
    b_lower = (F.col("e1.dt") < F.col("e2.dt")) | (
        (F.col("e1.dt") == F.col("e2.dt")) & (F.col("e1.t") < F.col("e2.t"))
    )
    wedges = e1.join(
        e2,
        (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t")),
    ).select(
        F.when(b_lower, F.col("e1.t")).otherwise(F.col("e2.t")).alias("cs"),
        F.when(b_lower, F.col("e2.t")).otherwise(F.col("e1.t")).alias("ct"),
    )
    closing = oriented.select(F.col("s").alias("cs"), F.col("t").alias("ct"))
    # Partial-aggregate wedges BEFORE the closing-edge join: the wedge
    # set is O(sum deg(s)^2) rows, but distinct (cs, ct) pairs are
    # bounded by |node pairs| — on dense graphs the map-side combine
    # compresses the shuffle by orders of magnitude (350M wedges ->
    # ~|edges| rows at sf0.1), and the closing join then runs over
    # edge-sized data.
    wedge_counts = wedges.groupBy("cs", "ct").agg(
        F.count(F.lit(1)).alias("w")
    )
    tri = wedge_counts.join(closing, ["cs", "ct"])
    n_tri = tri.agg(
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("n_triangles")
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        n_edges.crossJoin(n_nodes)
        .crossJoin(n_tri)
        .select("n_edges", "n_nodes", "n_triangles")
    )


# ----------------------------------------------------------------------
# bbp_pi_digits — the OTHER π example: distributed exact hex digits of π
# via the Bailey–Borwein–Plouffe spigot (`hadoop-mapreduce-examples/
# BaileyBorweinPlouffe.java:73` — digit ranges fan out to mappers, each
# computes its digits independently; the reducer concatenates). Spark-
# first: spark.range over digit positions → an Arrow-batched mapInPandas
# computing each digit with integer modular exponentiation (the one
# genuinely non-SQL scalar here — exactly the "arbitrary mapper math"
# the reference wrote Java for). Embarrassingly parallel, zero shuffle.
# The oracle is the published constant — ground truth stronger than any
# recomputation (π hex = 243F6A8885A308D3...).
# ----------------------------------------------------------------------

_BBP_N_DIGITS = 48
_BBP_KNOWN = "243F6A8885A308D313198A2E03707344A4093822299F31D0"


def _bbp_oracle() -> str:
    rows = ",\n".join(
        f"({d}, '{_BBP_KNOWN[d - 1]}')" for d in range(1, _BBP_N_DIGITS + 1)
    )
    return f"""
SELECT CAST(pos AS BIGINT) AS pos, hex_digit
FROM (VALUES
{rows}
) t(pos, hex_digit)
"""


@query("bbp_pi_digits", _bbp_oracle())
def bbp_pi_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def compute(batches):
        def digit(d: int) -> str:
            def S(j: int) -> float:
                s = 0.0
                for k in range(d):
                    s = (s + pow(16, d - 1 - k, 8 * k + j) / (8 * k + j)) % 1.0
                t, k = 0.0, d
                while True:
                    term = 16.0 ** (d - 1 - k) / (8 * k + j)
                    if term < 1e-19:
                        break
                    t += term
                    k += 1
                return (s + t) % 1.0

            x = (4 * S(1) - 2 * S(4) - S(5) - S(6)) % 1.0
            return "0123456789ABCDEF"[int(x * 16)]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "pos": pdf["id"],
                    "hex_digit": [digit(int(d)) for d in pdf["id"]],
                }
            )

    return (
        spark.range(1, _BBP_N_DIGITS + 1)
        .repartition(8)  # digit ranges fan out like the reference's splits
        .mapInPandas(compute, schema="pos bigint, hex_digit string")
    )
