"""TPC-H-style analytical queries (adapted to the test-table schemas).

The reference has no SQL engine — its analogue of these pipelines is a chain
of MapReduce jobs (e.g. the aggregate framework
`lib/aggregate/ValueAggregatorJob.java:85` plus a reduce-side join
`hadoop-tools/hadoop-datajoin/.../DataJoinReducerBase.java:47`). Each query
here is ONE declarative plan: Catalyst does partial aggregation (the
combiner, `MapTask.java:1057`), broadcast-joins small dims (the
DistributedCache map-side join, `filecache/DistributedCache.java:87`), and
pushes filters into the parquet scan.

Scale notes: every join's small side (region/nation/customer/supplier) is
broadcast — the only shuffles at 100 TB are the lineitem group-bys, which are
partial-aggregated map-side first. Filters are pushed into the scan
(`PushedFilters` in .explain), so the fact-table read is pruned to the
projected columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 8)} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 8)} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1", _Q1_ORACLE)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: scan → pushed filter → 8-agg groupBy.

    The flagship query: exercises scan, predicate pushdown, partial+final
    aggregation — the full WordCount-shaped pipeline of the reference
    (`EXAMPLES/WordCount.java:34`) on numeric columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 8).alias("sum_disc_price"),
            dsum(charge, 8).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q3_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderkey,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 8)} AS revenue,
         o_orderdate, o_orderpriority
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
    AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
  GROUP BY o_orderkey, o_orderdate, o_orderpriority
)
SELECT * FROM ranked
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("tpch_q3", _Q3_ORACLE)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join + agg + deterministic top-10.

    customer is broadcast (small dim); orders⋈lineitem shuffles on orderkey.
    Top-k ties-break on o_orderkey so the limit is deterministic.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(bcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 8)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@query("tpch_q5", _Q5_ORACLE)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-volume rollup: 5-way star join, dims broadcast, one shuffle.

    The reference's N-way CompositeInputFormat merge join
    (`lib/join/CompositeInputFormat.java:56`) required pre-sorted co-partitioned
    inputs; here the star shape means every dim side is broadcast and the
    single shuffle is the final groupBy on n_name.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(bcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8).alias("revenue"))
    )


_Q6_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 8)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6", _Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue: pure pushed-filter scan + global agg, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 8).alias("revenue"))
    )


_Q10_ORACLE = f"""
WITH ranked AS (
  SELECT c_custkey, c_name,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 8)} AS revenue,
         n_name
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
)
SELECT * FROM ranked ORDER BY revenue DESC, c_custkey LIMIT 20
"""


@query("tpch_q10", _Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report: join + agg + deterministic top-20."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(bcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE sum_qty > 150
"""


@query("tpch_q18", _Q18_ORACLE)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: agg-then-join (pre-aggregation before the join
    shrinks the shuffle — the combiner idea applied across operators)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(bcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )
