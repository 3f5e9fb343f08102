"""Aggregation-framework queries (SURVEY §2.5).

Parity targets: the ValueAggregator descriptor set
(`lib/aggregate/ValueAggregatorBaseDescriptor.java:39-53`), ValueHistogram
(`ValueHistogram.java:38`), the word-statistics examples
(`EXAMPLES/WordMean.java:41`, `WordMedian.java:44`,
`WordStandardDeviation.java:42`), and — as Spark-native extensions the
reference lacks — cube / rollup / grouping sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64_sql
from hadoop_spark.operators.aggregate import aggregate, value_histogram
from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import fanout_small, load_table, shared

_AGG_FRAMEWORK_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(l_linenumber) AS BIGINT) AS sum_line,
       MAX(l_extendedprice) AS max_price,
       MIN(l_extendedprice) AS min_price,
       MAX(l_linestatus) AS max_status,
       MIN(l_linestatus) AS min_status,
       COUNT(DISTINCT l_partkey) AS uniq_parts,
       COUNT(l_orderkey) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_framework", _AGG_FRAMEWORK_ORACLE)
def agg_framework(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven descriptor aggregators in one pass (one HashAggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregate(
        li,
        ["l_returnflag"],
        [
            ("LongValueSum", "l_linenumber", "sum_line"),
            ("DoubleValueMax", "l_extendedprice", "max_price"),
            ("DoubleValueMin", "l_extendedprice", "min_price"),
            ("StringValueMax", "l_linestatus", "max_status"),
            ("StringValueMin", "l_linestatus", "min_status"),
            ("UniqValueCount", "l_partkey", "uniq_parts"),
            ("ValueCount", "l_orderkey", "n_rows"),
        ],
    )


_HISTOGRAM_ORACLE = """
WITH freq AS (
  SELECT l_returnflag, l_partkey, COUNT(*) AS freq
  FROM lineitem GROUP BY l_returnflag, l_partkey
)
SELECT l_returnflag,
       COUNT(*) AS n_distinct,
       MIN(freq) AS min_freq,
       quantile_cont(freq, 0.5) AS median_freq,
       MAX(freq) AS max_freq,
       CAST(SUM(freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_freq,
       sqrt(CAST(SUM(freq*freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            - pow(CAST(SUM(freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)) AS stddev_freq
FROM freq GROUP BY l_returnflag
"""


@query("value_histogram", _HISTOGRAM_ORACLE)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValueHistogram parity: per-key distribution of value frequencies."""
    li = load_table(spark, sf_dir, "lineitem")
    return value_histogram(li, "l_returnflag", "l_partkey")


_UNIQ_APPROX_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_within_15pct
FROM lineitem
GROUP BY l_returnflag
"""


@query("uniq_approx", _UNIQ_APPROX_ORACLE)
def uniq_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniqValueCount's bounded-memory mode (maxNumItems cap,
    `UniqValueCount.java:43`) → HLL sketch. The sketch estimate itself is
    engine-specific, so the driver-checkable contract is (a) the exact
    countDistinct and (b) a boolean asserting the HLL estimate landed
    within a tolerance of exact — which the oracle pins to TRUE. The
    tolerance is 15%, deliberately ~7× the configured rsd=0.02: HLL error
    is probabilistic, so a bound near the rsd could legitimately flip at
    another scale factor or after an engine-side sketch change and read
    as a confusing hash mismatch; the tight ±5% bound lives in
    tests/test_catalog_queries as a pytest assertion instead."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("__approx") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.15)
        ).alias("approx_within_15pct"),
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("cube_agg", _CUBE_ORACLE)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — a Spark-native extension (no reference analogue; §2.5 'not
    present'). NULL group cells are the subtotal rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_agg", _ROLLUP_ORACLE)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_price")
    )


_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_shipmode_dummy, COUNT(*) AS n
FROM (SELECT l_returnflag, l_linestatus AS l_shipmode_dummy FROM lineitem)
GROUP BY GROUPING SETS ((l_returnflag), (l_shipmode_dummy))
"""


@query("grouping_sets", _GROUPING_SETS_ORACLE)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.select(
        "l_returnflag", F.col("l_linestatus").alias("l_shipmode_dummy")
    ).createOrReplaceTempView("_gs_in")
    return spark.sql(
        """
        SELECT l_returnflag, l_shipmode_dummy, COUNT(*) AS n
        FROM _gs_in
        GROUP BY GROUPING SETS ((l_returnflag), (l_shipmode_dummy))
        """
    )


_WORD_STATS_ORACLE = r"""
WITH words AS (
  SELECT unnest(string_split_regex(text, '\s+')) AS word
  FROM documents WHERE text IS NOT NULL
), lens AS (
  SELECT length(word) AS len FROM words WHERE word <> ''
)
SELECT COUNT(*) AS n_words,
       CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_len,
       quantile_cont(len, 0.5) AS median_len,
       sqrt(CAST(SUM(len*len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            - pow(CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)) AS stddev_len
FROM lens
"""


@query("word_stats", _WORD_STATS_ORACLE)
def word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordMean + WordMedian + WordStandardDeviation in ONE pass — the
    reference needs a separate two-job pipeline for the median
    (`WordMedian.java:44`); exact percentile makes it a single aggregate."""
    from hadoop_spark.operators.transform import tokenize

    docs = load_table(spark, sf_dir, "documents")
    lens = tokenize(docs, "text").select(F.length("word").alias("len"))
    n = F.count(F.lit(1))
    s = F.sum("len")
    s2 = F.sum(F.col("len") * F.col("len"))
    mean = s.cast("double") / n.cast("double")
    return lens.agg(
        n.alias("n_words"),
        mean.alias("mean_len"),
        F.expr("percentile(len, 0.5)").alias("median_len"),
        F.sqrt(s2.cast("double") / n.cast("double") - mean * mean).alias("stddev_len"),
    )


_KMV_K = 64
_KMV_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT l_returnflag, {portable_hash64_sql('l_partkey', salt='#kmv')} AS h
  FROM lineitem
),
ranked AS (
  SELECT l_returnflag, h,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM hashed
),
per_key AS (
  SELECT l_returnflag,
         MAX(rn) AS n_seen,
         MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
  FROM ranked WHERE rn <= {_KMV_K}
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(CASE WHEN n_seen < {_KMV_K} THEN n_seen
                 ELSE CAST(FLOOR(({_KMV_K} - 1) * 1152921504606846975.0 / kth) AS BIGINT)
            END AS BIGINT) AS est_distinct
FROM per_key
"""


@query("kmv_distinct_sketch", _KMV_ORACLE)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch — a mergeable cardinality
    sketch whose estimate is DETERMINISTIC given the hash, so unlike HLL
    (`uniq_approx`) it is exactly oracle-checkable cross-engine: estimate =
    (K-1) * H / h_(K) with H = 2^60-ish hash space (the 60-bit portable
    hash), or the exact count when fewer than K distinct values exist.
    Mergeability (union of K-min sets → K-min of union) is what a 100 TB
    pipeline needs to maintain distinct counts incrementally per shard.
    Reference analogue: UniqValueCount's bounded-memory cap
    (`lib/aggregate/UniqValueCount.java:35`), here with a principled
    estimator instead of a truncated exact count."""
    from pyspark.sql import Window

    from hadoop_spark.functions.hashing import portable_hash64

    li = load_table(spark, sf_dir, "lineitem")
    hashed = li.select(
        "l_returnflag", portable_hash64(F.col("l_partkey"), salt="#kmv").alias("h")
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("h")
    ranked_h = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    per_key = ranked_h.groupBy("l_returnflag").agg(
        F.max("rn").alias("n_seen"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth"),
    )
    hash_space = 1152921504606846975.0  # 16^15 - 1: the 60-bit hash range
    return per_key.select(
        "l_returnflag",
        F.when(F.col("n_seen") < _KMV_K, F.col("n_seen"))
        .otherwise(F.floor((_KMV_K - 1) * hash_space / F.col("kth")))
        .cast("bigint")
        .alias("est_distinct"),
    )


_NTILE_ORACLE = """
SELECT l_returnflag, q,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM (
  SELECT l_returnflag, l_quantity,
         CAST(NTILE(4) OVER (PARTITION BY l_returnflag
                             ORDER BY l_quantity, l_orderkey, l_linenumber)
              AS INTEGER) AS q
  FROM lineitem
)
GROUP BY l_returnflag, q
"""


@query("ntile_quartiles", _NTILE_ORACLE)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quartile assignment (stratification for sampling/binning):
    NTILE within each returnflag, summarized per stratum. The window is
    PARTITIONED — each group sorts independently, no global single-partition
    bottleneck; tie-break on the unique key makes the assignment exact and
    engine-independent."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return (
        li.select("l_returnflag", "l_quantity", F.ntile(4).over(w).alias("q"))
        .groupBy("l_returnflag", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


_MODE_ORACLE = """
SELECT l_returnflag, o_orderpriority AS mode_priority, cnt
FROM (
  SELECT l_returnflag, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_returnflag, o_orderpriority
)
WHERE rn = 1
"""


@query("mode_per_group", _MODE_ORACLE)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent value per group (mode), ties broken lexicographically:
    two-level aggregate — the (group, value) count shuffles once with
    map-side partials, then the argmax window runs over the tiny per-group
    count table. The giant-window anti-pattern (row_number over raw rows)
    never appears; state per group is |distinct values|."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    # orders is the second-largest SF-scaling table — a FORCED broadcast
    # would be a driver OOM at 100 TB. Project to the 2 join columns first
    # (narrows the estimate to what actually ships) and size-guard: below
    # the cap the star-join keeps its broadcast plan, above it Catalyst
    # falls back to sort-merge on o_orderkey.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    counts = (
        li.join(bcast_if_small(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


_ORDERED_CONCAT_ORACLE = """
SELECT o_orderpriority,
       STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@query("ordered_concat_per_group", _ORDERED_CONCAT_ORACLE)
def ordered_concat_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LISTAGG: collect_set is unordered by design (shuffle
    arrival order), so the engine-independent form is collect_set →
    array_sort → concat_ws. The collected set is bounded by |distinct
    statuses| per group — safe state at any scale (never collect unbounded
    raw values)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


_PERCENTILE_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@query("percentile_profile", _PERCENTILE_ORACLE)
def percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the WordMedian idea,
    `EXAMPLES/WordMedian.java:44`, generalized): p25/p50/p75 of an INTEGER
    column, where linear interpolation is (a+b)·q exact in double — so
    Spark's percentile and DuckDB's quantile_cont agree bit-for-bit. One
    hash-shuffle; per-group state is the sorted value multiset (bounded
    here by the 1..50 quantity domain — a production profile over an
    unbounded domain switches to approx_percentile)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.50).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# count-min sketch — the frequency-estimation sibling of the KMV distinct
# sketch above: depth×width counter grid, cell = portable_hash(key, salt_d)
# mod width. Deterministic because the hashes are the repo's portable md5
# mix (identical in DuckDB), so the SKETCH ITSELF hash-matches — and being
# a sum-grid it merges across partitions/days by cell-wise addition, the
# property that makes it a 100 TB streaming-friendly summary.

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_cell_sql(d: int) -> str:
    return f"({portable_hash64_sql('l_partkey', salt=f'#cms{{d}}'.format(d=d))} % {_CMS_WIDTH})"


_CMS_ORACLE = f"""
WITH cells AS (
  {" UNION ALL ".join(
      f"SELECT {d} AS depth, {_cms_cell_sql(d)} AS cell FROM lineitem"
      for d in range(_CMS_DEPTH)
  )}
)
SELECT depth, CAST(cell AS BIGINT) AS cell, CAST(COUNT(*) AS BIGINT) AS n
FROM cells GROUP BY depth, cell
"""


@query("countmin_sketch", _CMS_ORACLE)
def countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of l_partkey frequencies: {_CMS_DEPTH}×{_CMS_WIDTH}
    counter grid built in ONE pass (explode the depth dimension map-side,
    one aggregate). Point estimate for any key = min over depths of its
    cell counts; overestimates only, ε≈2/width. The full grid is the
    query result, so the driver verifies the sketch bit-for-bit."""
    from hadoop_spark.functions.hashing import portable_hash64

    # r10 opt (guide §2.5): 4 md5 draws per row sit before the first
    # exchange — spread the under-split scan so the hash pass runs on all
    # cores, not the single parquet row group's one task (no-op at real
    # scale). Measured sf0.1: 2.64 s -> 1.56 s median.
    li = fanout_small(load_table(spark, sf_dir, "lineitem").select("l_partkey"))
    rows = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        (portable_hash64(F.col("l_partkey"), f"#cms{d}") % _CMS_WIDTH)
                        .alias("cell"),
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("dc")
    )
    return rows.groupBy(
        F.col("dc.depth").alias("depth"), F.col("dc.cell").alias("cell")
    ).agg(F.count(F.lit(1)).alias("n"))


# --- calendar-dimension rollup -----------------------------------------
# Exercises the date-function surface (extract year/quarter/month,
# day-of-week) whose conventions differ per engine: Spark's dayofweek is
# 1=Sunday while DuckDB's isodow is 1=Monday, so the weekend flag is
# written against each engine's own convention and pinned equal by the
# oracle. Revenue sums quantize to DECIMAL per the repo's float rule.

_CAL_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mth,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN EXTRACT(isodow FROM o_orderdate) IN (6, 7)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM orders GROUP BY 1, 2, 3
"""


@query("calendar_revenue", _CAL_ORACLE)
def calendar_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by calendar hierarchy (year/quarter/month) with a weekend
    order count — the date-dimension rollup every warehouse report runs.
    Engine-exact across conventions: weekday is computed per engine's own
    numbering (Spark weekday 0=Mon..6=Sun vs DuckDB isodow 1=Mon..7=Sun)
    and the revenue sum is decimal-quantized. One shuffle over a bounded
    (year x quarter x month) key space."""
    orders = load_table(spark, sf_dir, "orders")
    weekend = F.when(F.weekday("o_orderdate") >= 5, 1).otherwise(0)
    return orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mth"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(weekend).cast("bigint").alias("n_weekend"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("string")
        .cast("double")
        .alias("revenue"),
    )


# ----------------------------------------------------------------------
# predicate_sweep — a "what-if" parameter grid evaluated in ONE scan.
# The naive form of TPC-H Q6 parameter exploration re-runs the query per
# (discount, quantity) candidate — at 100 TB that is G full passes over
# the fact table. The Spark-first form evaluates the whole grid as G
# conditional aggregates in a single map-partial-aggregated pass (the
# fact table is read ONCE; each cell is a CASE WHEN inside the same
# HashAggregate), then unpivots the 1-row result to (param_d, param_q,
# n_lines, revenue) rows with stack() — driver-sized data from there.
# Exact: counts are integers, revenue is decimal-quantized, and the
# discount-band comparisons are IEEE double compares of stored values
# against repr-exact literals, identical in both engines.
# ----------------------------------------------------------------------

_SWEEP_DS = ["0.02", "0.04", "0.06", "0.08"]
_SWEEP_QS = [24, 25]


def _sweep_oracle() -> str:
    from hadoop_spark.functions.numeric import dsum_sql

    cells = []
    for d in _SWEEP_DS:
        for q in _SWEEP_QS:
            cond = (
                f"l_discount BETWEEN CAST({d} AS DOUBLE) - 0.01"
                f" AND CAST({d} AS DOUBLE) + 0.01"
                f" AND l_quantity < {q}"
            )
            rev = dsum_sql(f"CASE WHEN {cond} THEN l_extendedprice * l_discount ELSE NULL END")
            cells.append(
                f"SELECT CAST({d} AS DOUBLE) AS param_d, CAST({q} AS BIGINT) AS param_q,\n"
                f"  CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_lines,\n"
                f"  COALESCE({rev}, CAST(0 AS DOUBLE)) AS revenue\n"
                "FROM lineitem"
            )
    return "\nUNION ALL\n".join(cells)


@query("predicate_sweep", _sweep_oracle())
def predicate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.numeric import dsum

    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    names = []
    for d in _SWEEP_DS:
        for q in _SWEEP_QS:
            dv = float(d)
            cond = (
                (F.col("l_discount") >= F.lit(dv) - 0.01)
                & (F.col("l_discount") <= F.lit(dv) + 0.01)
                & (F.col("l_quantity") < q)
            )
            tag = f"{d.replace('.', '_')}_{q}"
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n_{tag}")
            )
            aggs.append(
                F.coalesce(
                    dsum(
                        F.when(
                            cond, F.col("l_extendedprice") * F.col("l_discount")
                        ).otherwise(F.lit(None))
                    ),
                    F.lit(0.0),
                ).alias(f"r_{tag}")
            )
            names.append((dv, q, tag))
    onerow = li.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({dv!r} AS DOUBLE), CAST({q} AS BIGINT), n_{tag}, r_{tag}"
        for dv, q, tag in names
    )
    return onerow.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (param_d, param_q, n_lines, revenue)"
    )


# ----------------------------------------------------------------------
# join_size_estimate — the join-planning primitive: before running a
# 100 TB join, compute its EXACT output cardinality from the two sides'
# key histograms (|A ⋈ B| = Σ_k cA(k)·cB(k)) plus the skew diagnostics
# that decide the strategy (max per-key product = the biggest single-key
# task; a hot key here means salting / AQE skew-split BEFORE the real
# join burns a day). Cost: one count-aggregate per side + a join ON THE
# HISTOGRAMS (key-cardinality-sized, not data-sized) — the measure-first
# discipline `heavy_hitters` applies to one table, extended to a join.
# ----------------------------------------------------------------------

_JOIN_EST_ORACLE = """
WITH ca AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY 1
),
cb AS (
  SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM customer GROUP BY 1
),
prod AS (
  SELECT ca.k, ca.c * cb.c AS p FROM ca JOIN cb ON ca.k = cb.k
)
SELECT CAST(SUM(p) AS BIGINT) AS join_rows,
       CAST(COUNT(*) AS BIGINT) AS matched_keys,
       CAST(MAX(p) AS BIGINT) AS max_key_rows,
       CAST((SELECT COUNT(*) FROM ca) AS BIGINT) AS left_keys,
       CAST((SELECT COUNT(*) FROM cb) AS BIGINT) AS right_keys
FROM prod
"""


@query("join_size_estimate", _JOIN_EST_ORACLE)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ca = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    prod = ca.join(cb, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("p")
    )
    stats = prod.agg(
        F.sum("p").cast("bigint").alias("join_rows"),
        F.count(F.lit(1)).alias("matched_keys"),
        F.max("p").cast("bigint").alias("max_key_rows"),
    )
    la = ca.agg(F.count(F.lit(1)).alias("left_keys"))
    lb = cb.agg(F.count(F.lit(1)).alias("right_keys"))
    return stats.crossJoin(F.broadcast(la)).crossJoin(F.broadcast(lb))


# ----------------------------------------------------------------------
# trending_parts — per-period top-k: the 5 highest-volume parts per
# order month. The two-level shape that scales: raw lineitems partial-
# aggregate to (month, part) totals first (one combiner shuffle), and
# the rank window runs over THAT bounded aggregate — partitioned by
# month, so no month's ranking rides a data-sized partition and no
# global sort happens anywhere. Integer quantities, deterministic
# part-key tie-break.
# ----------------------------------------------------------------------

_TRENDING_K = 5

_TRENDING_ORACLE = f"""
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
         l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT ym, l_partkey, qty, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY ym ORDER BY qty DESC, l_partkey
  ) AS rnk FROM monthly
)
WHERE rnk <= {_TRENDING_K}
"""


@query("trending_parts", _TRENDING_ORACLE)
def trending_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", F.col("l_quantity").cast("bigint").alias("q")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym"),
    )
    monthly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("ym", "l_partkey")
        .agg(F.sum("q").cast("bigint").alias("qty"))
    )
    w = W.partitionBy("ym").orderBy(F.desc("qty"), F.asc("l_partkey"))
    return (
        monthly.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TRENDING_K)
        .select("ym", "l_partkey", "qty", "rnk")
    )


# ----------------------------------------------------------------------
# freshness_report — data-freshness SLO check: per event type, how stale
# is the newest record relative to the whole feed's watermark, and how
# much of the last day arrived. The two aggregates both partial-combine
# map-side; the global watermark is a 1-row broadcast — the pattern for
# "is this 100 TB feed healthy" without a second scan. All integer µs.
# ----------------------------------------------------------------------

_FRESHNESS_ORACLE = """
WITH per_type AS (
  SELECT event_type,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM events GROUP BY event_type
),
wm AS (SELECT CAST(MAX(epoch_us(ts)) AS BIGINT) AS watermark_us FROM events),
last_day AS (
  SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_last_day
  FROM events e CROSS JOIN wm
  WHERE epoch_us(e.ts) > wm.watermark_us - 86400000000
  GROUP BY e.event_type
)
SELECT p.event_type, p.n_total, p.max_ts_us,
       wm.watermark_us - p.max_ts_us AS lag_us,
       COALESCE(l.n_last_day, 0) AS n_last_day
FROM per_type p CROSS JOIN wm
LEFT JOIN last_day l ON p.event_type = l.event_type
"""


@query("freshness_report", _FRESHNESS_ORACLE)
def freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.sources.tables import shared

    ev = shared(
        load_table(spark, sf_dir, "events").select(
            "event_type", F.unix_micros("ts").alias("t")
        )
    )
    per_type = ev.groupBy("event_type").agg(
        F.max("t").alias("max_ts_us"), F.count(F.lit(1)).alias("n_total")
    )
    wm = ev.agg(F.max("t").alias("watermark_us"))
    last_day = (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("t") > F.col("watermark_us") - 86_400_000_000)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_last_day"))
    )
    return (
        per_type.crossJoin(F.broadcast(wm))
        .join(last_day, "event_type", "left")
        .select(
            "event_type",
            "n_total",
            "max_ts_us",
            (F.col("watermark_us") - F.col("max_ts_us")).alias("lag_us"),
            F.coalesce(F.col("n_last_day"), F.lit(0).cast("bigint")).alias(
                "n_last_day"
            ),
        )
    )


# ----------------------------------------------------------------------
# audience_overlap — pairwise Jaccard overlap of the user bases of each
# event-type pair (the audience/segment overlap matrix). The user sets
# never materialize: distinct (type, user) pairs self-join ON USER (each
# user contributes |their types|² ≤ 25 pairs — bounded fan-out), pair
# intersections aggregate to the types² matrix, and union sizes come
# from the same distinct-pair table. Jaccard is one IEEE division of
# exact BIGINTs.
# ----------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS t1, b.event_type AS t2,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.t1, i.t2, i.n_both, s1.n AS n1, s2.n AS n2,
       (CAST(i.n_both AS DOUBLE)
        / CAST(s1.n + s2.n - i.n_both AS DOUBLE)) AS jaccard
FROM inter i
JOIN sizes s1 ON i.t1 = s1.event_type
JOIN sizes s2 ON i.t2 = s2.event_type
"""


@query("audience_overlap", _OVERLAP_ORACLE)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.sources.tables import shared

    tu = shared(
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("t1"), "user_id")
    b = tu.select(F.col("event_type").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    s1 = sizes.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .select(
            "t1",
            "t2",
            "n_both",
            "n1",
            "n2",
            (
                F.col("n_both").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )


# ----------------------------------------------------------------------
# hll_sketch — HyperLogLog from first principles with an EXACT
# cross-engine contract (the mergeable-sketch trio: KMV `kmv_distinct_
# sketch`, count-min `countmin_sketch`, and now HLL). Registers are the
# classic m=64 split of the 60-bit portable hash (6 register bits, 54
# value bits); rho = leading-zero rank via binary digit count — all
# integers. The harmonic denominator Σ 2^-Mj is kept EXACT by scaling to
# the common denominator 2^55: numerator = Σ 2^(55-Mj) is a BIGINT
# (≤ 64·2^55 < 2^62), absent registers contribute 2^55 each, and the
# final estimate is ONE IEEE division — so the sketch hash-matches the
# oracle bit-for-bit, while register maxima stay mergeable (max is
# commutative/idempotent — the property that makes HLL a one-pass
# distributed sketch at 100 TB). The output is the RAW estimate plus the
# exact sketch state; the standard small-range LinearCounting correction
# (m·ln(m/zeros)) is a client-side step — ln() is transcendental, hence
# outside the cross-engine exactness contract (accuracy asserted in
# tests/test_round4b_properties.py with the correction applied).
# ----------------------------------------------------------------------

_HLL_M = 64
_HLL_ALPHA = "0.709"  # alpha_64, the standard bias constant

_HLL_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {portable_hash64_sql('user_id', salt='#hll')} AS hv
  FROM events WHERE user_id IS NOT NULL
),
split AS (
  SELECT event_type, hv % {_HLL_M} AS reg, hv // {_HLL_M} AS w FROM h
),
rho AS (
  SELECT event_type, reg,
         CASE WHEN w = 0 THEN 55
              ELSE 55 - length(bin(w)) END AS r
  FROM split
),
regs AS (
  SELECT event_type, reg, MAX(r) AS mj FROM rho GROUP BY event_type, reg
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_regs_hit,
         CAST(SUM(CAST(2 AS BIGINT) ** (55 - mj)) AS BIGINT) AS num_hit
  FROM regs GROUP BY event_type
)
SELECT event_type, n_regs_hit,
       CAST(num_hit + ({_HLL_M} - n_regs_hit)
            * (CAST(2 AS BIGINT) ** 55) AS BIGINT) AS denom_num,
       ({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
        * CAST(CAST(2 AS BIGINT) ** 55 AS DOUBLE)
        / CAST(num_hit + ({_HLL_M} - n_regs_hit)
               * (CAST(2 AS BIGINT) ** 55) AS DOUBLE)) AS est_distinct
FROM agg
"""


@query("hll_sketch", _HLL_ORACLE)
def hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = ev.select(
        "event_type", portable_hash64(F.col("user_id"), salt="#hll").alias("hv")
    ).distinct()
    split = h.select(
        "event_type",
        (F.col("hv") % _HLL_M).alias("reg"),
        F.expr(f"hv div {_HLL_M}").alias("w"),
    )
    rho = split.select(
        "event_type",
        "reg",
        F.when(F.col("w") == 0, 55)
        .otherwise(F.lit(55) - F.length(F.bin("w")))
        .alias("r"),
    )
    regs = rho.groupBy("event_type", "reg").agg(F.max("r").alias("mj"))
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_regs_hit"),
        F.sum(F.expr("shiftleft(1L, int(55 - mj))")).cast("bigint").alias("num_hit"),
    )
    two55 = F.shiftleft(F.lit(1).cast("bigint"), 55)
    denom_num = (
        F.col("num_hit") + (F.lit(_HLL_M) - F.col("n_regs_hit")) * two55
    ).cast("bigint")
    est = (
        F.lit(float(_HLL_ALPHA))
        * F.lit(_HLL_M * _HLL_M)
        * two55.cast("double")
        / denom_num.cast("double")
    )
    return agg.select(
        "event_type",
        "n_regs_hit",
        denom_num.alias("denom_num"),
        est.alias("est_distinct"),
    )


# ----------------------------------------------------------------------
# missing_days — backfill planning / partition audit: for each event
# type, which HOURLY buckets inside its own [first, last] activity span
# have ZERO events (the holes a scheduler must backfill before
# downstream jobs trust the table). Hour granularity is what the
# fixture's feed density actually exercises — the day-level version was
# green-but-vacuous (every type covers every day at every SF, so the
# anti-join never fired). The candidate grid explodes from the per-type
# span (bounded: types × hours — never data-sized) and anti-joins the
# observed (type, hour) set; all integer epoch arithmetic. Output keeps
# the day AND hour-of-day so the backfill list reads as partitions.
# ----------------------------------------------------------------------

_MISSING_DAYS_ORACLE = """
WITH obs AS (
  SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hr FROM events
),
span AS (
  SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM obs GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM span
)
SELECT g.event_type,
       CAST(g.hr // 24 AS BIGINT) AS day,
       CAST(g.hr % 24 AS BIGINT) AS hour_of_day
FROM grid g LEFT JOIN obs o
  ON g.event_type = o.event_type AND g.hr = o.hr
WHERE o.hr IS NULL
"""


@query("missing_days", _MISSING_DAYS_ORACLE)
def missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.sources.tables import shared

    ev = load_table(spark, sf_dir, "events")
    obs = shared(
        ev.select(
            "event_type",
            F.floor(F.unix_micros("ts") / 3_600_000_000).alias("hr"),
        ).distinct()
    )
    span = obs.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = span.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    return grid.join(obs, ["event_type", "hr"], "left_anti").select(
        "event_type",
        F.floor(F.col("hr") / 24).cast("bigint").alias("day"),
        (F.col("hr") % 24).cast("bigint").alias("hour_of_day"),
    )


# ----------------------------------------------------------------------
# kmv_set_algebra — SET OPERATIONS on mergeable sketches: the union and
# intersection cardinality of two user populations (click vs view)
# estimated from one K=64 KMV sketch of the union carrying per-hash
# membership flags — the theta-sketch algebra that answers "overlap of
# two 100 TB audiences" without ever materializing either set. The K
# smallest union hashes are found with the SALTED TWO-LEVEL top-k (per-
# bucket K-min window, then K-min of the 32·K candidates — no data-sized
# single-partition sort; the chi2_terms discipline). Estimators are the
# standard ones (est_union = (K−1)·H/θ; est_inter = est_union·n_both/K,
# exact when the sketch saturates below K), every step integer-exact and
# mirrored in the oracle; exact counts ride along for the error readout.
# ----------------------------------------------------------------------

_KMVSET_K = 64
_KMVSET_H = 1152921504606846975  # 16^15 - 1

_KMVSET_ORACLE = f"""
WITH a AS (
  SELECT DISTINCT {portable_hash64_sql('user_id', salt='#kmvset')} AS h
  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
),
b AS (
  SELECT DISTINCT {portable_hash64_sql('user_id', salt='#kmvset')} AS h
  FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
),
u AS (
  SELECT h, MAX(ina) AS ina, MAX(inb) AS inb
  FROM (
    SELECT h, 1 AS ina, 0 AS inb FROM a
    UNION ALL
    SELECT h, 0 AS ina, 1 AS inb FROM b
  ) GROUP BY h
),
topk AS (
  SELECT h, ina, inb
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM u)
  WHERE rn <= {_KMVSET_K}
),
sk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_seen,
         CAST(MAX(h) AS BIGINT) AS theta,
         CAST(SUM(ina * inb) AS BIGINT) AS n_both
  FROM topk
),
ex AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS exact_a,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS exact_b,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM a JOIN b ON a.h = b.h) AS exact_inter
)
SELECT sk.n_seen, sk.n_both,
       CAST(CASE WHEN sk.n_seen < {_KMVSET_K} THEN sk.n_seen
                 ELSE CAST(FLOOR(({_KMVSET_K} - 1) * {_KMVSET_H}.0 / sk.theta)
                           AS BIGINT)
            END AS BIGINT) AS est_union,
       CAST(CASE WHEN sk.n_seen < {_KMVSET_K} THEN sk.n_both
                 ELSE CAST(FLOOR(({_KMVSET_K} - 1) * {_KMVSET_H}.0 / sk.theta)
                           AS BIGINT) * sk.n_both // {_KMVSET_K}
            END AS BIGINT) AS est_inter,
       ex.exact_a, ex.exact_b, ex.exact_inter
FROM sk CROSS JOIN ex
"""


@query("kmv_set_algebra", _KMVSET_ORACLE)
def kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from hadoop_spark.functions.hashing import portable_hash64
    from hadoop_spark.sources.tables import shared

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = portable_hash64(F.col("user_id"), salt="#kmvset")
    a = shared(
        ev.filter(F.col("event_type") == "click").select(h.alias("h")).distinct()
    )
    b = shared(
        ev.filter(F.col("event_type") == "view").select(h.alias("h")).distinct()
    )
    u = (
        a.select("h", F.lit(1).alias("ina"), F.lit(0).alias("inb"))
        .unionAll(b.select("h", F.lit(0).alias("ina"), F.lit(1).alias("inb")))
        .groupBy("h")
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
    )
    # two-level K-min: per-bucket window (32 bounded partitions), then the
    # global K-min of the ≤ 32·K candidates
    bucketed = u.withColumn("bkt", F.pmod(F.col("h"), F.lit(32)))
    wb = W.partitionBy("bkt").orderBy("h")
    cand = bucketed.withColumn("rn", F.row_number().over(wb)).filter(
        F.col("rn") <= _KMVSET_K
    )
    wg = W.orderBy("h")
    topk = cand.withColumn("grn", F.row_number().over(wg)).filter(
        F.col("grn") <= _KMVSET_K
    )
    sk = topk.agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("theta"),
        F.sum(F.col("ina") * F.col("inb")).cast("bigint").alias("n_both"),
    )
    exact = (
        a.agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("exact_b")))
        .crossJoin(a.join(b, "h").agg(F.count(F.lit(1)).alias("exact_inter")))
    )
    est_union = F.when(F.col("n_seen") < _KMVSET_K, F.col("n_seen")).otherwise(
        F.floor(
            F.lit(float(_KMVSET_K - 1)) * F.lit(float(_KMVSET_H)) / F.col("theta")
        ).cast("bigint")
    )
    est_inter = F.when(F.col("n_seen") < _KMVSET_K, F.col("n_both")).otherwise(
        F.expr(
            f"CAST(FLOOR(({_KMVSET_K} - 1) * {_KMVSET_H}.0 / theta) AS BIGINT)"
            f" * n_both div {_KMVSET_K}"
        )
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        "n_seen",
        "n_both",
        est_union.cast("bigint").alias("est_union"),
        est_inter.cast("bigint").alias("est_inter"),
        "exact_a",
        "exact_b",
        "exact_inter",
    )


# ----------------------------------------------------------------------
# order_cycle_time — fulfilment latency: days from order date to each
# line's ship date, bucketed per priority (the warehouse SLA histogram).
# Date subtraction is exact integer days in both engines; one bounded
# (priority × latency-day) aggregation.
# ----------------------------------------------------------------------

_CYCLE_ORACLE = """
SELECT o_orderpriority,
       CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag_days,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


@query("order_cycle_time", _CYCLE_ORACLE)
def order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return j.groupBy(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("lag_days"),
    ).agg(F.count(F.lit(1)).alias("n_lines"))


# ----------------------------------------------------------------------
# seasonal_baseline — the naive forecasting baseline every real model is
# graded against: predict each month's revenue with the SAME month one
# year earlier, and report the per-month absolute error plus the exact
# decimal MAE numerator. One bounded monthly aggregate + one keyed lag
# window over months (≤ |months| rows) — forecasting eval at 100 TB
# costs one rollup.
# ----------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev
  FROM orders GROUP BY 1, 2
),
lagged AS (
  SELECT yr, mo,
         CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS rev,
         CAST(CAST(lag(rev, 12) OVER (ORDER BY yr, mo) AS VARCHAR) AS DOUBLE)
           AS pred
  FROM monthly
)
SELECT yr, mo, rev, pred,
       ABS(rev - pred) AS abs_err
FROM lagged WHERE pred IS NOT NULL
"""


@query("seasonal_baseline", _SEASONAL_ORACLE)
def seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("rev_d")
    )
    # the month sequence is |months|-sized, so the unpartitioned lag
    # window is domain-bounded (the user_growth argument)
    w = W.orderBy("yr", "mo")
    lagged = monthly.select(
        "yr",
        "mo",
        F.col("rev_d").cast("double").alias("rev"),
        F.lag("rev_d", 12).over(w).cast("double").alias("pred"),
    )
    return lagged.filter(F.col("pred").isNotNull()).select(
        "yr",
        "mo",
        "rev",
        "pred",
        # r10 audit: raw |rev - pred| of identical exact-decimal-origin
        # doubles — bit-equal without re-quantization.
        F.abs(F.col("rev") - F.col("pred")).alias("abs_err"),
    )


# ----------------------------------------------------------------------
# market_concentration — Herfindahl–Hirschman concentration of supplier
# revenue within each nation: HHI = Σ share² = Σ rev² / (Σ rev)²,
# computed ENTIRELY from integer cents (Σ rev² as DECIMAL(38) so squares
# can't overflow) with one IEEE division at the end — the market-power /
# supply-risk metric, exact at any parallelism. Two bounded
# aggregations: (nation, supplier) revenue, then per-nation sums.
# ----------------------------------------------------------------------

_HHI_ORACLE = """
WITH sr AS (
  SELECT s.s_nationkey AS nation, l.l_suppkey,
         CAST(SUM(CAST(l.l_extendedprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS rev_c
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS BIGINT) AS total_rev_c,
       (CAST(CAST(SUM(CAST(rev_c AS DECIMAL(38,0))
                      * CAST(rev_c AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
        / (CAST(CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
           * CAST(CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)))
         AS hhi
FROM sr GROUP BY nation
"""


@query("market_concentration", _HHI_ORACLE)
def market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sr = (
        li.join(bcast_if_small(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("rev_c")
        )
    )
    d38 = F.col("rev_c").cast("decimal(38,0)")
    agg = sr.groupBy(F.col("nation").cast("bigint").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(d38).cast("bigint").alias("total_rev_c"),
        F.sum(d38 * d38).cast("decimal(38,0)").alias("sum_sq"),
    )
    tot_d = F.col("total_rev_c").cast("decimal(38,0)").cast("double")
    return agg.select(
        "nation",
        "n_suppliers",
        "total_rev_c",
        (F.col("sum_sq").cast("double") / (tot_d * tot_d)).alias("hhi"),
    )


# ----------------------------------------------------------------------
# unpivot_metrics — wide-to-long reshaping (UNPIVOT / melt). A per-nation
# wide metrics row (customer count, exact balance total, max balance)
# melts into (nation, metric, value) tuples — the shape metric stores and
# long-format BI tools ingest. Spark's native `DataFrame.unpivot` expands
# map-side with zero extra shuffles beyond the one aggregation that built
# the wide table; the oracle is the portable UNION ALL expansion. All
# melted values share one DOUBLE column, decimal-quantized where the
# source is a float aggregate.
# ----------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS VARCHAR)
              AS DOUBLE) AS total_acctbal,
         CAST(MAX(c.c_acctbal) AS DOUBLE) AS max_acctbal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT n_name, 'total_acctbal' AS metric, total_acctbal AS value FROM wide
UNION ALL
SELECT n_name, 'max_acctbal' AS metric, max_acctbal AS value FROM wide
"""


@query("unpivot_metrics", _UNPIVOT_ORACLE)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-nation metrics melted long via native unpivot."""
    from hadoop_spark.functions.numeric import dsum

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    wide = (
        cust.join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
            F.max("c_acctbal").cast("double").alias("max_acctbal"),
        )
    )
    return wide.unpivot(
        ["n_name"],
        ["n_customers", "total_acctbal", "max_acctbal"],
        "metric",
        "value",
    )


# ----------------------------------------------------------------------
# incremental_agg_merge — incremental materialized-view maintenance: a
# pre-aggregated base (yesterday's materialization, here the 90% of
# orders with o_orderkey % 10 != 0) absorbs a delta batch (the other
# 10%) by MERGING PARTIAL AGGREGATES — counts add, exact integer-cent
# sums add — instead of re-scanning the base fact table. This is how a
# 100 TB rollup stays fresh: the delta-sized scan plus a view-sized
# merge, never a full recompute. The oracle IS the full recompute over
# all orders, so the test asserts the merge law (partial ⊕ partial =
# total) exactly.
# ----------------------------------------------------------------------

_IVM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY o_orderpriority
"""


@query("incremental_agg_merge", _IVM_ORACLE)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("revenue_cents"),
        )

    base = partial(orders.filter(F.pmod(F.col("o_orderkey"), 10) != 0))
    delta = partial(orders.filter(F.pmod(F.col("o_orderkey"), 10) == 0))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )


# ----------------------------------------------------------------------
# year_over_year_growth — monthly revenue with the same-month-last-year
# comparison. A positional lag(12) silently lies when a month is missing
# from the series, so the previous-year row comes from a CALENDAR-exact
# self-join on (year−1, month) over the month-aggregated series (bounded
# by the calendar; the join is broadcast-sized at any fact scale).
# Revenue in exact integer cents; only the growth ratio is floating,
# quantized on both engines.
# ----------------------------------------------------------------------

_YOY_ORACLE = """
WITH m AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mth,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
)
SELECT cur.yr, cur.mth, cur.cents AS revenue_cents,
       prev.cents AS prev_year_cents,
       (CAST(cur.cents AS DOUBLE) - CAST(prev.cents AS DOUBLE))
         / CAST(prev.cents AS DOUBLE) AS yoy_growth
FROM m cur JOIN m prev
  ON prev.yr = cur.yr - 1 AND prev.mth = cur.mth
"""


@query("year_over_year_growth", _YOY_ORACLE)
def year_over_year_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year(F.col("o_orderdate").cast("timestamp")).alias("yr"),
        F.month(F.col("o_orderdate").cast("timestamp")).alias("mth"),
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("cents")
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    # r10 audit: raw IEEE growth ratio of exact integer cents.
    growth = (
        F.col("cur.cents").cast("double") - F.col("prev.cents").cast("double")
    ) / F.col("prev.cents").cast("double")
    return cur.join(
        F.broadcast(prev),
        (F.col("prev.yr") == F.col("cur.yr") - 1)
        & (F.col("prev.mth") == F.col("cur.mth")),
    ).select(
        F.col("cur.yr").alias("yr"),
        F.col("cur.mth").alias("mth"),
        F.col("cur.cents").alias("revenue_cents"),
        F.col("prev.cents").alias("prev_year_cents"),
        growth.alias("yoy_growth"),
    )


# ----------------------------------------------------------------------
# price_index — Laspeyres price index by year: how the base-year basket
# repriced over time, index(y) = Σ P(part,y)·q₀(part) / Σ P(part,0)·
# q₀(part) over parts traded in both years. The econometric rollup a
# pricing team runs over the full fact history. Scale shape: one
# (part, year) aggregation of the fact table, a partkey-keyed join of
# each year's prices against the base-year basket (bucketed-by-partkey
# at 100 TB), then a year-level sum. Unit prices are exact integer
# ratios (cents / quantity); each basket term quantizes to 1e-6 before
# the decimal-exact sum, so both engines agree bit-for-bit.
# ----------------------------------------------------------------------

_PRICE_INDEX_ORACLE = """
WITH py AS (
  SELECT l_partkey,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
         CAST(SUM(CAST(l_extendedprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,0))) AS BIGINT) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
base AS (SELECT MIN(yr) AS y0 FROM py),
p0 AS (
  SELECT l_partkey,
         CAST(cents AS DOUBLE) / CAST(qty AS DOUBLE) AS price0,
         qty AS q0
  FROM py WHERE yr = (SELECT y0 FROM base)
),
terms AS (
  -- generic quotient-products: floor-quantized to exact scale-4 integers
  -- (engine-identical IEEE ops; a DECIMAL cast here sits squarely in the
  -- shortest-repr tie zone at these magnitudes) before the exact sums
  SELECT py.yr,
         FLOOR(CAST(py.cents AS DOUBLE) / CAST(py.qty AS DOUBLE)
               * CAST(p0.q0 AS DOUBLE) * 10000 + 0.5) AS cur_term,
         FLOOR(p0.price0 * CAST(p0.q0 AS DOUBLE) * 10000 + 0.5) AS base_term
  FROM py JOIN p0 ON py.l_partkey = p0.l_partkey
)
SELECT yr,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(CAST(SUM(CAST(cur_term AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
       / CAST(CAST(SUM(CAST(base_term AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
         AS laspeyres_index
FROM terms GROUP BY yr
"""


@query("price_index", _PRICE_INDEX_ORACLE)
def price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    py = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_partkey",
            F.year(F.col("o_orderdate").cast("timestamp")).alias("yr"),
        )
        .agg(
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents"),
            F.sum(F.col("l_quantity").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    py = shared(py)
    base = py.agg(F.min("yr").alias("y0"))
    p0 = (
        py.join(F.broadcast(base), py.yr == F.col("y0"))
        .select(
            F.col("l_partkey").alias("pk0"),
            (F.col("cents").cast("double") / F.col("qty").cast("double")).alias(
                "price0"
            ),
            F.col("qty").alias("q0"),
        )
    )
    # r10 audit: the Laspeyres terms are GENERIC quotient-products whose
    # magnitudes (~1e8-1e10) sit in the DECIMAL shortest-repr tie zone, so
    # they are floor-quantized to exact scale-4 integers (engine-identical
    # by construction; pre-floor values stay far below 2^53) and the index
    # is the raw quotient of the exact sums.
    terms = py.join(p0, py.l_partkey == F.col("pk0")).select(
        "yr",
        F.floor(
            F.col("cents").cast("double")
            / F.col("qty").cast("double")
            * F.col("q0").cast("double")
            * F.lit(10_000.0)
            + F.lit(0.5)
        ).alias("cur_term"),
        F.floor(
            F.col("price0") * F.col("q0").cast("double") * F.lit(10_000.0)
            + F.lit(0.5)
        ).alias("base_term"),
    )
    idx = (
        F.sum(F.col("cur_term").cast("decimal(38,0)")).cast("string").cast("double")
        / F.sum(F.col("base_term").cast("decimal(38,0)")).cast("string").cast("double")
    )
    return terms.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        idx.alias("laspeyres_index"),
    )


# ----------------------------------------------------------------------
# topn_with_other — the BI "top N + OTHER" rollup: the ten highest-
# revenue parts keep their identity, the long tail collapses into one
# OTHER row, and shares are reported against the grand total. The
# scalable shape: revenue aggregates per part first (partial-aggregated
# shuffle), the top-10 cut comes from a TakeOrderedAndProject over the
# part-level rollup, and the tail NEVER re-scans the fact table — OTHER
# = grand total − top-10 total, two broadcast scalars. Integer cents
# end-to-end; shares quantized.
# ----------------------------------------------------------------------

_TOPN_OTHER_N = 10

_TOPN_OTHER_ORACLE = f"""
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
top AS (
  SELECT l_partkey, cents FROM pr
  ORDER BY cents DESC, l_partkey LIMIT {_TOPN_OTHER_N}
),
tot AS (SELECT CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS t FROM pr),
topt AS (SELECT CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS tt FROM top),
unioned AS (
  SELECT CAST(l_partkey AS VARCHAR) AS bucket, cents FROM top
  UNION ALL
  SELECT 'OTHER' AS bucket, (SELECT t FROM tot) - (SELECT tt FROM topt) AS cents
)
SELECT bucket, cents AS revenue_cents,
       CAST(cents AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE) AS share
FROM unioned
"""


@query("topn_with_other", _TOPN_OTHER_ORACLE)
def topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = shared(
        li.groupBy("l_partkey").agg(
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    top = shared(
        pr.orderBy(F.col("cents").desc(), F.col("l_partkey")).limit(_TOPN_OTHER_N)
    )
    tot = pr.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("bigint").alias("t")
    )
    topt = top.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("bigint").alias("tt")
    )
    other = (
        tot.join(F.broadcast(topt))
        .select(
            F.lit("OTHER").alias("bucket"),
            (F.col("t") - F.col("tt")).cast("bigint").alias("cents"),
        )
    )
    unioned = top.select(
        F.col("l_partkey").cast("string").alias("bucket"), "cents"
    ).unionByName(other)
    # r10 audit: raw IEEE share of exact integer cents.
    share = F.col("cents").cast("double") / F.col("t").cast("double")
    return unioned.join(F.broadcast(tot)).select(
        "bucket", F.col("cents").alias("revenue_cents"), share.alias("share")
    )


# ----------------------------------------------------------------------
# cube_serving — the "aggregate once, serve many" OLAP pattern: one
# (year × nation × priority) cube materializes from the fact table, and
# three different dashboard questions (annual totals, nation league
# table, priority mix) answer FROM THE CUBE — cube-sized re-aggregations,
# the fact table is scanned exactly once. This is how a 100 TB serving
# layer works: the cube is the only fact-wide shuffle; every question
# after it is interactive. Integer cents; the three answers union under
# a grouping label.
# ----------------------------------------------------------------------

_CUBE_SERVING_ORACLE = """
WITH cube_t AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS yr,
         n.n_name AS nation,
         o.o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3
)
SELECT 'by_year' AS question, CAST(yr AS VARCHAR) AS key,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS cents
FROM cube_t GROUP BY yr
UNION ALL
SELECT 'by_nation', nation,
       CAST(SUM(n_orders) AS BIGINT),
       CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT)
FROM cube_t GROUP BY nation
UNION ALL
SELECT 'by_priority', priority,
       CAST(SUM(n_orders) AS BIGINT),
       CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT)
FROM cube_t GROUP BY priority
"""


@query("cube_serving", _CUBE_SERVING_ORACLE)
def cube_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cube = shared(
        orders.join(
            bcast_if_small(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.year(F.col("o_orderdate").cast("timestamp")).alias("yr"),
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents"),
        )
    )

    def serve(dim, label: str) -> DataFrame:
        return cube.groupBy(dim.alias("key")).agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum(F.col("cents").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents"),
        ).select(F.lit(label).alias("question"), "key", "n_orders", "cents")

    return (
        serve(F.col("yr").cast("string"), "by_year")
        .unionByName(serve(F.col("nation"), "by_nation"))
        .unionByName(serve(F.col("priority"), "by_priority"))
    )


# ----------------------------------------------------------------------
# shard_manifest — training-data export planning: assign every document
# to one of 16 deterministic shards (portable hash of doc_id) and emit
# the manifest a downstream loader checks before reading — per-shard row
# count, token count, and an order-insensitive content fingerprint (the
# `table_fingerprint` integrity discipline applied per shard). At 100 TB
# this IS the export job's commit record: writers stream shards in
# parallel, the manifest is one bounded aggregation, and a re-run or a
# copy is verified by recomputing 16 numbers.
# ----------------------------------------------------------------------

_SHARD_N = 16


def _shard_manifest_oracle() -> str:
    from hadoop_spark.functions.hashing import portable_hash64_sql
    from hadoop_spark.functions.text import ws_token_count_sql

    shard = f"({portable_hash64_sql('doc_id', salt='#shard')} % {_SHARD_N})"
    row_h = portable_hash64_sql(
        "(CAST(doc_id AS VARCHAR) || '|' || text)", salt="#sm"
    )
    return f"""
SELECT CAST({shard} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST({ws_token_count_sql("text")} AS BIGINT)) AS BIGINT)
         AS n_tokens,
       CAST(CAST(SUM(CAST({row_h} AS DECIMAL(38,0))) AS DECIMAL(38,0))
            AS VARCHAR) AS fingerprint
FROM documents
GROUP BY 1
"""


@query("shard_manifest", _shard_manifest_oracle())
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.hashing import portable_hash64
    from hadoop_spark.functions.text import ws_token_count

    docs = load_table(spark, sf_dir, "documents")
    shard = (portable_hash64(F.col("doc_id"), salt="#shard") % _SHARD_N).cast(
        "bigint"
    )
    row_h = portable_hash64(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text")),
        salt="#sm",
    )
    return (
        docs.select(
            shard.alias("shard"),
            ws_token_count(F.col("text")).cast("bigint").alias("tk"),
            row_h.alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tk").cast("bigint").alias("n_tokens"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("fingerprint"),
        )
    )


# ----------------------------------------------------------------------
# approx_quantile_check — percentile_approx (Greenwald–Khanna sketch)
# pinned by a bounded contract, the `uniq_approx` pattern applied to
# quantiles: the sketch's internals are engine-specific, so the driver-
# checkable surface is (a) the EXACT histogram median and (b) a boolean
# asserting the approx p50 landed within 2% of it, which the oracle pins
# TRUE. The tolerance is ~20× the sketch's configured accuracy (1/10000)
# so a legitimate sketch-implementation change cannot read as a
# confusing hash mismatch.
# ----------------------------------------------------------------------


def _aqc_oracle() -> str:
    from hadoop_spark.operators.stats import group_median_sql

    return f"""
WITH src AS (
  SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
),
{group_median_sql("src", "g", "v", "exact_p50", "aq")}
SELECT g AS o_orderpriority, exact_p50, TRUE AS approx_within_2pct
FROM aq
"""


@query("approx_quantile_check", _aqc_oracle())
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.operators.stats import group_median

    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("v"))
    exact = group_median(src, "g", "v", "exact_p50")
    approx = src.groupBy("g").agg(
        F.percentile_approx("v", 0.5, 10000).alias("approx_p50")
    )
    return exact.join(approx, "g").select(
        F.col("g").alias("o_orderpriority"),
        "exact_p50",
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            <= F.col("exact_p50") * F.lit(0.02)
        ).alias("approx_within_2pct"),
    )


# ----------------------------------------------------------------------
# countmin_error_eval — the sketch-QA companion to `countmin_sketch`
# (the ann_recall pattern applied to frequency sketches): rebuild the
# 4×256 count-min grid, read back every part's estimate (min over the
# four hashed cells), and report the overestimation profile against the
# exact counts — CMS never underestimates (an invariant the boolean
# column pins), and the mean overestimate quantifies whether this
# width/depth is usable at the current key cardinality. All integer
# counting: grid build is one bounded shuffle, the probe joins each key
# to its 4 cells against the 1024-row broadcast grid.
# ----------------------------------------------------------------------


def _cms_eval_oracle() -> str:
    cells = ",\n  ".join(
        f"{_cms_cell_sql(d)} AS cell{d}" for d in range(_CMS_DEPTH)
    )
    joins = "\n  ".join(
        f"JOIN grid g{d} ON g{d}.depth = {d} AND g{d}.cell = k.cell{d}"
        for d in range(_CMS_DEPTH)
    )
    est = "LEAST(" + ", ".join(f"g{d}.n" for d in range(_CMS_DEPTH)) + ")"
    return f"""
WITH rows_t AS (
  SELECT l_partkey,
         {cells}
  FROM lineitem
),
exact_t AS (
  SELECT l_partkey, MIN(cell0) AS cell0, MIN(cell1) AS cell1,
         MIN(cell2) AS cell2, MIN(cell3) AS cell3,
         CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM rows_t GROUP BY l_partkey
),
grid AS (
  SELECT d.depth,
         CASE d.depth WHEN 0 THEN r.cell0 WHEN 1 THEN r.cell1
                      WHEN 2 THEN r.cell2 ELSE r.cell3 END AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM rows_t r CROSS JOIN (SELECT unnest(range({_CMS_DEPTH})) AS depth) d
  GROUP BY 1, 2
),
probe AS (
  SELECT k.l_partkey, k.exact_n, {est} AS est_n
  FROM exact_t k
  {joins}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       BOOL_AND(est_n >= exact_n) AS never_underestimates,
       CAST(SUM(est_n - exact_n) AS BIGINT) AS total_overestimate,
       CAST(MAX(est_n - exact_n) AS BIGINT) AS max_overestimate,
       CAST(SUM(est_n - exact_n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_overestimate
FROM probe
"""


@query("countmin_error_eval", _cms_eval_oracle())
def countmin_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.functions.hashing import portable_hash64

    # r10 opt (guide §2.5): same under-split-scan spread as countmin_sketch
    # — the 4-md5 cell computation feeds the persisted rows_t and ran on
    # one core. Measured sf0.1: 5.40 s -> 3.46 s median.
    li = fanout_small(load_table(spark, sf_dir, "lineitem").select("l_partkey"))
    cells = [
        (portable_hash64(F.col("l_partkey"), f"#cms{d}") % _CMS_WIDTH).alias(
            f"cell{d}"
        )
        for d in range(_CMS_DEPTH)
    ]
    rows_t = shared(li.select("l_partkey", *cells))
    exact_t = rows_t.groupBy("l_partkey").agg(
        *[F.min(f"cell{d}").alias(f"cell{d}") for d in range(_CMS_DEPTH)],
        F.count(F.lit(1)).cast("bigint").alias("exact_n"),
    )
    grid = (
        rows_t.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("depth"),
                            F.col(f"cell{d}").alias("cell"),
                        )
                        for d in range(_CMS_DEPTH)
                    ]
                )
            ).alias("dc")
        )
        .groupBy(F.col("dc.depth").alias("depth"), F.col("dc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    probe = exact_t
    for d in range(_CMS_DEPTH):
        gd = grid.filter(F.col("depth") == d).select(
            F.col("cell").alias(f"cell{d}"), F.col("n").alias(f"n{d}")
        )
        probe = probe.join(F.broadcast(gd), f"cell{d}")
    est = F.least(*[F.col(f"n{d}") for d in range(_CMS_DEPTH)])
    probe = probe.select("l_partkey", "exact_n", est.alias("est_n"))
    # r10 audit: raw IEEE mean of exact int64 overestimates.
    mean_over = F.sum(F.col("est_n") - F.col("exact_n")).cast("double") / F.count(
        F.lit(1)
    ).cast("double")
    return probe.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.min(F.col("est_n") >= F.col("exact_n")).alias("never_underestimates"),
        F.sum(F.col("est_n") - F.col("exact_n"))
        .cast("bigint")
        .alias("total_overestimate"),
        F.max(F.col("est_n") - F.col("exact_n"))
        .cast("bigint")
        .alias("max_overestimate"),
        mean_over.alias("mean_overestimate"),
    )


# ----------------------------------------------------------------------
# weighted_median_price — quantity-weighted median of the extended price
# per return flag: the smallest price whose cumulative quantity reaches
# half the total. Exact ordered selection over integer weights (the
# revenue_deciles discipline, but WEIGHTED — an unweighted median answers
# "the middle line item", this answers "the middle unit shipped").
# Keyed windows on the (flag, price, unique line key) total order; one
# shuffle on the flag, cumulative sums exact BIGINT.
# ----------------------------------------------------------------------

_WMED_ORACLE = """
WITH x AS (
  SELECT l_returnflag AS flag,
         CAST(CAST(l_extendedprice * 100 AS DECIMAL(38,0)) AS BIGINT) AS pc,
         CAST(l_quantity AS BIGINT) AS qty,
         l_orderkey, l_linenumber
  FROM lineitem
), c AS (
  SELECT flag, pc, qty,
         SUM(qty) OVER (PARTITION BY flag
                        ORDER BY pc, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(qty) OVER (PARTITION BY flag) AS tot,
         l_orderkey, l_linenumber
  FROM x
), hit AS (
  SELECT flag, pc, tot,
         ROW_NUMBER() OVER (PARTITION BY flag
                            ORDER BY pc, l_orderkey, l_linenumber) AS rn
  FROM c WHERE 2 * cum >= tot
)
SELECT flag AS l_returnflag, pc AS weighted_median_cents,
       CAST(tot AS BIGINT) AS total_qty
FROM hit WHERE rn = 1
"""


@query("weighted_median_price", _WMED_ORACLE)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median extended price per return flag."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") * 100)
        .cast("decimal(38,0)")
        .cast("bigint")
        .alias("pc"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    wrun = (
        Window.partitionBy("flag")
        .orderBy("pc", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = x.select(
        "flag",
        "pc",
        "l_orderkey",
        "l_linenumber",
        F.sum("qty").over(wrun).alias("cum"),
        F.sum("qty").over(Window.partitionBy("flag")).alias("tot"),
    )
    hit = c.filter(2 * F.col("cum") >= F.col("tot")).select(
        "flag",
        "pc",
        "tot",
        F.row_number()
        .over(Window.partitionBy("flag").orderBy("pc", "l_orderkey", "l_linenumber"))
        .alias("rn"),
    )
    return hit.filter(F.col("rn") == 1).select(
        F.col("flag").alias("l_returnflag"),
        F.col("pc").alias("weighted_median_cents"),
        F.col("tot").cast("bigint").alias("total_qty"),
    )


# ----------------------------------------------------------------------
# abc_inventory_classes — ABC revenue classification of the part
# catalog: rank parts by total line revenue, class A = parts inside the
# first 80% of cumulative revenue, B inside 95%, C the tail. The global
# ordered cumulative sum uses `operators/sort.global_running_sum` (range
# repartition + per-partition scan + broadcast offsets), never a
# single-partition window, so the ranking stage is partition-parallel at
# catalog scale. Revenue carried as exact DECIMAL(38,8); the class
# thresholds compare 100*cum against 80/95 * total in exact decimal.
# ----------------------------------------------------------------------

_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,8))) AS r
  FROM lineitem GROUP BY l_partkey
), c AS (
  SELECT l_partkey, r,
         SUM(r) OVER (ORDER BY r DESC, l_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(r) OVER () AS tot
  FROM rev
), cls AS (
  SELECT CASE WHEN 100 * cum <= 80 * tot THEN 'A'
              WHEN 100 * cum <= 95 * tot THEN 'B' ELSE 'C' END AS abc_class,
         r, tot
  FROM c
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) AS class_revenue,
       CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(MAX(tot) AS VARCHAR) AS DOUBLE) AS revenue_share
FROM cls GROUP BY abc_class
"""


@query("abc_inventory_classes", _ABC_ORACLE)
def abc_inventory_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (80/95) revenue classes over a scalable global prefix sum."""
    from hadoop_spark.operators.sort import global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,8)"
            )
        ).alias("r")
    )
    cum = global_running_sum(
        rev, "r", F.col("r").desc(), F.col("l_partkey"), out="cum"
    )
    tot = rev.agg(F.sum("r").alias("tot"))
    cls = cum.join(F.broadcast(tot)).select(
        F.when(100 * F.col("cum") <= 80 * F.col("tot"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("tot"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "r",
        "tot",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("r").cast("string").cast("double").alias("class_revenue"),
        (
            F.sum("r").cast("string").cast("double")
            / F.max("tot").cast("string").cast("double")
        ).alias("revenue_share"),
    )


# ----------------------------------------------------------------------
# hierarchical_share — percent-of-parent at every level of the
# region ▷ nation ▷ customer-segment hierarchy in ONE fact pass: revenue
# aggregated once at the leaf grain, parents recovered by re-aggregating
# the leaf table (bounded by the dimension domain, never the fact
# table), shares as exact-integer-cent ratios. The BI "% of parent"
# staple that naive implementations compute with three fact scans or a
# data-sized window.
# ----------------------------------------------------------------------

_HSHARE_ORACLE = """
WITH leaf AS (
  SELECT r.r_name AS region, n.n_name AS nation, c.c_mktsegment AS segment,
         CAST(SUM(CAST(o.o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3
), nat AS (
  SELECT region, nation, CAST(SUM(cents) AS BIGINT) AS cents
  FROM leaf GROUP BY 1, 2
), reg AS (
  SELECT region, CAST(SUM(cents) AS BIGINT) AS cents FROM nat GROUP BY 1
), tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS cents FROM reg)
SELECT l.region, l.nation, l.segment,
       l.cents AS seg_cents,
       CAST(l.cents AS DOUBLE) / CAST(n.cents AS DOUBLE) AS share_of_nation,
       CAST(n.cents AS DOUBLE) / CAST(r.cents AS DOUBLE) AS nation_share_of_region,
       CAST(r.cents AS DOUBLE) / CAST(t.cents AS DOUBLE) AS region_share_of_total
FROM leaf l
JOIN nat n ON l.region = n.region AND l.nation = n.nation
JOIN reg r ON l.region = r.region
CROSS JOIN tot t
"""


@query("hierarchical_share", _HSHARE_ORACLE)
def hierarchical_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent across region ▷ nation ▷ segment from one fact pass."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    leaf = shared(
        orders.join(
            bcast_if_small(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    natl = leaf.groupBy("region", "nation").agg(
        F.sum("cents").cast("bigint").alias("ncents")
    )
    regl = natl.groupBy("region").agg(
        F.sum("ncents").cast("bigint").alias("rcents")
    )
    tot = regl.agg(F.sum("rcents").cast("bigint").alias("tcents"))
    return (
        leaf.join(F.broadcast(natl), ["region", "nation"])
        .join(F.broadcast(regl), "region")
        .join(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "segment",
            F.col("cents").alias("seg_cents"),
            (F.col("cents").cast("double") / F.col("ncents").cast("double"))
            .alias("share_of_nation"),
            (F.col("ncents").cast("double") / F.col("rcents").cast("double"))
            .alias("nation_share_of_region"),
            (F.col("rcents").cast("double") / F.col("tcents").cast("double"))
            .alias("region_share_of_total"),
        )
    )


# ----------------------------------------------------------------------
# revenue_waterfall — the BI revenue bridge per order priority: gross
# extended price, minus the discount give-back, plus the tax collected,
# to net charge — each leg an exact decimal-quantized sum from ONE fact
# pass (the `tpch_q1` arithmetic reshaped into the waterfall the finance
# review reads). Legs reconcile exactly: net = gross − discount + tax at
# the quantization scale, pinned in tests.
# ----------------------------------------------------------------------

from hadoop_spark.functions.numeric import dsum_sql  # noqa: E402

_WATERFALL_ORACLE = f"""
SELECT l_returnflag,
       {dsum_sql('l_extendedprice', 8)} AS gross,
       {dsum_sql('l_extendedprice * l_discount', 8)} AS discount_given,
       {dsum_sql('l_extendedprice * (1 - l_discount) * l_tax', 8)}
         AS tax_collected,
       {dsum_sql('l_extendedprice', 8)}
         - {dsum_sql('l_extendedprice * l_discount', 8)}
         + {dsum_sql('l_extendedprice * (1 - l_discount) * l_tax', 8)}
         AS net_charge
FROM lineitem GROUP BY l_returnflag
"""


@query("revenue_waterfall", _WATERFALL_ORACLE)
def revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross → discount → tax → net revenue bridge per return flag."""
    from hadoop_spark.functions.numeric import dsum

    li = load_table(spark, sf_dir, "lineitem")
    gross = dsum(F.col("l_extendedprice"), 8)
    disc = dsum(F.col("l_extendedprice") * F.col("l_discount"), 8)
    tax = dsum(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax"), 8
    )
    return li.groupBy("l_returnflag").agg(
        gross.alias("gross"),
        disc.alias("discount_given"),
        tax.alias("tax_collected"),
        (gross - disc + tax).alias("net_charge"),
    )


# ----------------------------------------------------------------------
# value_iter_reset — reducer value-iterator MARK/RESET parity
# (`MR-CORE/mapred/BackupStore.java:630`, exercised by
# `MR-JC .../mapreduce/TestValueIterReset.java`): the reference lets a
# reducer mark the value iterator, drain it once, reset, and iterate the
# SAME group's values again — the canonical use being a two-pass
# statistic (first pass for the mean, second for per-value deviations).
# Spark's `applyInPandas` hands the reducer the whole group as an Arrow
# batch, so re-iteration is free; the two explicit sequential passes
# below are the BackupStore analog, and all arithmetic is integer cents
# (|v·n − Σv| avoids the mean division) so the result is bit-exact
# against the oracle. Scale: one shuffle on the group key; a group is
# buffered in memory exactly as BackupStore buffers (and spills) it —
# for groups beyond memory the relational rewrite is the two-aggregation
# join this oracle itself uses.
# ----------------------------------------------------------------------

_VIR_ORACLE = """
WITH g AS (
  SELECT l_suppkey, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
), s AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM g GROUP BY l_suppkey
)
SELECT g.l_suppkey,
       MAX(s.n) AS n,
       MAX(s.sum_cents) AS sum_cents,
       CAST(SUM(ABS(g.cents * s.n - s.sum_cents)) AS BIGINT) AS absdev_num
FROM g JOIN s ON g.l_suppkey = s.l_suppkey
GROUP BY g.l_suppkey
"""


def _vir_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )


@query("value_iter_reset", _VIR_ORACLE)
def value_iter_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass per-group reducer statistic (count+sum, then per-value
    |deviation|·n over the SAME group) — the computation BackupStore's
    mark/reset exists for (`mapred/BackupStore.java:630`,
    `TestValueIterReset.java`), expressed in the shuffle-native idiom the
    r6 verdict asked to make primary (optional #6): pass 1 is a
    groupBy().agg, pass 2 joins the per-group stats back on the SAME key
    and aggregates again — Catalyst reuses the key exchange, zero
    buffered state, no group-size ceiling. The literal buffered
    re-iteration (one Arrow batch per group, re-walked twice — the
    BackupStore analog) lives in :func:`value_iter_reset_buffered` and is
    pinned equal to this plan in tests/test_catalog_extras.py; results
    are bit-identical (integer-cents arithmetic, |v·n − Σv| avoids the
    mean division)."""
    li = _vir_cents(spark, sf_dir)
    s = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
    # same-key join: per-supplier stats back onto the fact rows. s scales
    # with the supplier dimension, so NO broadcast hint — Catalyst keeps
    # the li exchange and sort-merges (or AQE-broadcasts while small).
    return (
        li.join(s, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(
            F.max("n").alias("n"),
            F.max("sum_cents").alias("sum_cents"),
            F.sum(F.abs(F.col("cents") * F.col("n") - F.col("sum_cents")))
            .cast("bigint")
            .alias("absdev_num"),
        )
    )


def value_iter_reset_buffered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BackupStore mark/reset parity, literally: applyInPandas hands the
    reducer the whole group as one buffered Arrow batch, pass 1 drains it
    (count+sum — the marked pass), reset() re-walks the SAME values for
    the deviation pass. Faithful to the reference's buffered re-iteration
    (`BackupStore.java:630`) but WITHOUT spill, so it is the demo, not
    the scale path — :func:`value_iter_reset` is the same computation as
    two map-combined aggregations over one reused exchange."""
    li = _vir_cents(spark, sf_dir)

    def two_pass(pdf):
        import pandas as pd

        vals = pdf["cents"].tolist()
        # pass 1: drain the iterator for count + sum (the marked pass)
        n = 0
        total = 0
        for v in vals:
            n += 1
            total += int(v)
        # reset(): iterate the SAME buffered values a second time
        absdev = 0
        for v in vals:
            absdev += abs(int(v) * n - total)
        return pd.DataFrame(
            {
                "l_suppkey": [int(pdf["l_suppkey"].iloc[0])],
                "n": [n],
                "sum_cents": [total],
                "absdev_num": [absdev],
            }
        )

    return li.groupBy("l_suppkey").applyInPandas(
        two_pass,
        "l_suppkey bigint, n bigint, sum_cents bigint, absdev_num bigint",
    )
