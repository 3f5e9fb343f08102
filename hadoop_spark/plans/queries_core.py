"""Core MapReduce-parity queries: WordCount, Grep, field selection, K/V
splitting, deterministic sampling, set operations.

These are the reference's canonical jobs (`EXAMPLES/WordCount.java:34`,
`EXAMPLES/Grep.java:40`, `lib/fieldsel/`, `lib/input/KeyValueTextInputFormat`,
`lib/input/SequenceFileInputFilter`) as single declarative plans. The Grep
example alone is TWO chained MR jobs with a SequenceFile temp directory
(`Grep.java:60-94`); here it is one query — Catalyst pipelines the stages and
the intermediate never touches storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64_sql
from hadoop_spark.operators.transform import (
    field_select,
    kv_split,
    percent_filter,
    regex_matches,
    tokenize,
)
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table

_WORDCOUNT_ORACLE = r"""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split_regex(text, '\s+')) AS word
  FROM documents WHERE text IS NOT NULL
)
WHERE word <> ''
GROUP BY word
"""


@query("wordcount", _WORDCOUNT_ORACLE)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical job: tokenize → groupBy → count.

    Map-side partial aggregation (the reference's combiner,
    `Job.setCombinerClass` `Job.java:935`) happens automatically in Spark's
    HashAggregate, so the shuffle carries one row per (partition, word)."""
    docs = load_table(spark, sf_dir, "documents")
    return tokenize(docs, "text").groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


_GREP_ORACLE = r"""
SELECT match, COUNT(*) AS cnt
FROM (
  SELECT unnest(regexp_extract_all(text, '(sort|merge|join|scan)\w*')) AS match
  FROM documents WHERE text IS NOT NULL
)
WHERE match <> ''
GROUP BY match
"""


@query("grep", _GREP_ORACLE)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep pipeline: regex extract → count per match (+ the reference's
    second sort job collapses into an orderBy the caller can add)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        regex_matches(docs.filter(F.col("text").isNotNull()), "text", r"(sort|merge|join|scan)\w*")
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "inverse_map",
    "SELECT CAST(value AS VARCHAR) AS key, event_type AS value FROM events",
)
def inverse_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InverseMapper parity: (k, v) → (v, k)."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(F.col("event_type").alias("key"), F.col("value").cast("string").alias("value"))
    from hadoop_spark.operators.transform import inverse

    return inverse(kv)


@query(
    "field_select",
    "SELECT o_orderpriority AS f1, o_orderstatus AS f0, CAST(o_orderkey AS VARCHAR) AS f2 FROM orders",
)
def field_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FieldSelection parity: build a delimited line, cut fields 1,0,2."""
    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat_ws("|", "o_orderstatus", "o_orderpriority", "o_orderkey").alias("line")
    )
    return field_select(lines, "line", [1, 0, 2], sep="|")


@query(
    "kv_split",
    "SELECT lang AS key, text AS value FROM documents",
)
def kv_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyValueTextInputFormat parity: split line at first separator."""
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(F.concat(F.col("lang"), F.lit("\t"), F.col("text")).alias("line"))
    return kv_split(lines, "line")


_SAMPLE_ORACLE = f"""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE {portable_hash64_sql("l_orderkey")} % 10 = 0
"""


@query("percent_sample", _SAMPLE_ORACLE)
def percent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PercentFilter parity: deterministic hash-of-key ~10% sample — a pure
    function of the data, identical on any cluster size."""
    li = load_table(spark, sf_dir, "lineitem")
    return percent_filter(li, "l_orderkey", 10).select("l_orderkey", "l_linenumber")


@query(
    "union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleInputs parity: union of heterogeneous sources (then distinct)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).distinct()


@query(
    "intersect_keys",
    """
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey AS custkey FROM customer
    """,
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return orders.intersect(cust)


@query(
    "except_keys",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never placed an URGENT order — set difference
    (anti-join shaped). The right side is restricted so the fixture
    difference is NON-EMPTY: every customer has some order, so the
    unrestricted version verified nothing."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.subtract(orders)


_CHAIN_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(lower(p_name), ' ')) AS w FROM part
),
cleaned AS (
  SELECT regexp_replace(w, '[^a-z]', '', 'g') AS w FROM toks
),
kept AS (SELECT w FROM cleaned WHERE length(w) >= 3)
SELECT w AS word, COUNT(*) AS cnt FROM kept GROUP BY w
"""


@query("chained_transforms", _CHAIN_ORACLE)
def chained_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChainMapper/ChainReducer parity (`lib/chain/ChainMapper.java:84`,
    engine `Chain.java`): M1 (tokenize) → M2 (normalize) → M3 (filter) →
    R (count), expressed as df.transform composition — Catalyst fuses the
    chained narrow maps into ONE pipelined stage (the reference runs them
    in one task too, but via hand-wired in-JVM chaining), then one shuffle
    for the count."""
    # lineitem has no l_comment in this fixture; l_shipmode is absent too —
    # use the part names as the text corpus like the wordcount query does.
    docs = load_table(spark, sf_dir, "part").select(
        F.lower(F.col("p_name")).alias("line")
    )

    def tokenize(df: DataFrame) -> DataFrame:
        return df.select(F.explode(F.split(F.col("line"), " ")).alias("w"))

    def normalize(df: DataFrame) -> DataFrame:
        return df.select(F.regexp_replace(F.col("w"), "[^a-z]", "").alias("w"))

    def keep_long(df: DataFrame) -> DataFrame:
        return df.filter(F.length("w") >= 3)

    return (
        docs.transform(tokenize)
        .transform(normalize)
        .transform(keep_long)
        .groupBy(F.col("w").alias("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


from hadoop_spark.plans.queries_tpch import _Q1_ORACLE


@query("tpch_q1_sql", _Q1_ORACLE)
def tpch_q1_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry-point parity: the flagship query expressed as ANSI SQL over
    registered views (`spark.sql`), not the DataFrame builder — a user can
    drive this engine entirely in SQL, against the same DuckDB oracle as
    tpch_q1. Spark dialect notes: STRING not VARCHAR; Spark's decimal ->
    double cast is correctly rounded so no VARCHAR round-trip is needed
    (that workaround is DuckDB-side only, see functions/numeric.py)."""
    from hadoop_spark.sources.tables import register_views

    register_views(spark, sf_dir)

    def dsum(expr: str, scale: int = 4) -> str:
        return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"

    def davg(expr: str) -> str:
        return f"({dsum(expr)} / CAST(COUNT({expr}) AS DOUBLE))"

    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {dsum("l_quantity")} AS sum_qty,
               {dsum("l_extendedprice")} AS sum_base_price,
               {dsum("l_extendedprice * (1 - l_discount)", 8)} AS sum_disc_price,
               {dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 8)} AS sum_charge,
               {davg("l_quantity")} AS avg_qty,
               {davg("l_extendedprice")} AS avg_price,
               {davg("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """)


@query(
    "intersect_all_keys",
    """
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber <= 2
    INTERSECT ALL
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 25
    """,
)
def intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL — duplicates preserved up to
    the minimum multiplicity on each side): the bag semantics the
    reference's reduce-side set ops actually had, since nothing deduped
    unless you asked."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_quantity") >= 25).select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


@query(
    "except_all_keys",
    """
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 1
    EXCEPT ALL
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 45
    """,
)
def except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL — each right occurrence cancels one
    left occurrence). Operand predicates are sized so the fixture
    multiset difference is NON-EMPTY per supplier (the earlier <=2 vs
    >=25 split cancelled exactly, verifying nothing)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_quantity") >= 45).select(F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(b)


# ----------------------------------------------------------------------
# lateral_topk_sql — the SQL-text LATERAL (correlated table subquery)
# surface: per nation, the two highest-balance customers, written as
# `FROM nation, LATERAL (... ORDER BY ... LIMIT 2)` and executed through
# spark.sql against the registered views — the same decorrelation-into-
# window plan a user migrating ANSI SQL expects to just work. Ties break
# on custkey, so the LIMIT is deterministic on both engines.
# ----------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) c
"""


@query("lateral_topk_sql", _LATERAL_SQL)
def lateral_topk_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# ----------------------------------------------------------------------
# udtf_chunker — the Spark 4 PYTHON UDTF surface (SURVEY §2.10's
# user-defined TABLE function, previously covered via mapInPandas):
# a @udtf class yields fixed 10-word chunks per document, invoked with
# LATERAL correlation in SQL — the 1→N row-generating UDF shape the
# reference wrote custom RecordReaders/Mappers for. Chunk text leaves
# the plan as a portable 60-bit hash (never raw text); the oracle
# replays the chunking arithmetic with list slicing.
# ----------------------------------------------------------------------

_UDTF_CHUNK = 10


def _udtf_chunker_oracle() -> str:
    from hadoop_spark.functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("array_to_string(w[s:e], ' ')", salt="#ch")
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS chunk_id,
         CAST(i * {_UDTF_CHUNK} + 1 AS BIGINT) AS s,
         CAST(LEAST((i + 1) * {_UDTF_CHUNK}, len(w)) AS BIGINT) AS e,
         w
  FROM d, LATERAL (
    SELECT unnest(range((len(d.w) + {_UDTF_CHUNK} - 1) // {_UDTF_CHUNK})) AS i
  )
)
SELECT doc_id, chunk_id,
       CAST(e - s + 1 AS BIGINT) AS n_words,
       {h} AS chunk_hash
FROM c
"""


@query("udtf_chunker", _udtf_chunker_oracle())
def udtf_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id bigint, n_words bigint, chunk_hash bigint")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            words = text.split(" ")
            for i in range(0, (len(words) + _UDTF_CHUNK - 1) // _UDTF_CHUNK):
                chunk = words[i * _UDTF_CHUNK : (i + 1) * _UDTF_CHUNK]
                payload = (" ".join(chunk) + "#ch").encode("utf-8")
                h = int(hashlib.md5(payload).hexdigest()[:15], 16)
                yield i, len(chunk), h

    from hadoop_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("doc_chunker", Chunker)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_words, c.chunk_hash
        FROM documents d, LATERAL doc_chunker(d.doc_id, d.text) c
        """
    )
