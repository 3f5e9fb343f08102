"""Scalable exact order statistics.

`percentile()`-style exact medians collect every value of a group into one
aggregation buffer — with few huge groups (the 100 TB norm: 5 event types
x 20 B rows) that is a guaranteed reducer OOM. The scalable exact form for
bounded-cardinality numerics is the value histogram: groupBy(group, value)
counts (partial-aggregated map-side, output bounded by |distinct values|,
not |rows|), a cumulative-count window over the TINY histogram, and rank
selection. Interpolation for even counts is the explicit (lo + hi) / 2 —
the same closed form on the Spark and oracle sides, so results are
bit-identical (engine-internal quantile interpolation formulas differ by
ulps; this one cannot).

Reference parity: the MapReduce-era form of the same idea is the median
job in `EXAMPLES/WordMedian.java:41` (histogram of lengths -> scan the
tiny count map for the middle rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_median(df: DataFrame, grp: str, val: str, out: str) -> DataFrame:
    """Exact per-group continuous median via value-histogram rank selection.

    Returns one row per group: (grp, out). Shuffle profile: one
    partial-aggregated histogram shuffle over (grp, val) — bounded by the
    distinct-value count — then windows/joins over histogram-sized data.
    """
    hist = df.groupBy(grp, val).agg(F.count(F.lit(1)).alias("c"))
    tot = hist.groupBy(grp).agg(F.sum("c").cast("long").alias("n"))
    cum = hist.withColumn(
        "cum", F.sum("c").over(Window.partitionBy(grp).orderBy(val))
    )
    j = cum.join(F.broadcast(tot), grp)
    r1 = F.floor((F.col("n") + 1) / 2).cast("long")
    r2 = (F.floor(F.col("n") / 2) + 1).cast("long")
    lo = F.min(F.when(F.col("cum") >= r1, F.col(val)))
    hi = F.min(F.when(F.col("cum") >= r2, F.col(val)))
    return j.groupBy(grp).agg(
        ((lo + hi) / F.lit(2).cast("double")).alias(out)
    )


def group_quantiles(
    df: DataFrame, grp: str, val: str, quantiles: dict[str, float]
) -> DataFrame:
    """Exact per-group NEAREST-RANK quantiles (type-1: the smallest value
    whose cumulative count reaches ceil(q*n)) from ONE value histogram —
    any number of cut points costs the same single partial-aggregated
    shuffle. Nearest-rank (vs interpolated) keeps every output an actual
    data value, so downstream clipping/winsorizing compares like with
    like, and both engines compute it from identical integer ranks.

    `quantiles` maps output column name -> q in (0, 1].
    """
    hist = df.groupBy(grp, val).agg(F.count(F.lit(1)).alias("c"))
    tot = hist.groupBy(grp).agg(F.sum("c").cast("long").alias("n"))
    cum = hist.withColumn(
        "cum", F.sum("c").over(Window.partitionBy(grp).orderBy(val))
    )
    j = cum.join(F.broadcast(tot), grp)
    aggs = []
    for out, q in quantiles.items():
        rank = F.ceil(F.col("n") * F.lit(q)).cast("long")
        aggs.append(F.min(F.when(F.col("cum") >= rank, F.col(val))).alias(out))
    return j.groupBy(grp).agg(*aggs)


def group_quantiles_sql(
    src: str, grp: str, val: str, quantiles: dict[str, float], prefix: str
) -> str:
    """DuckDB CTE block mirroring `group_quantiles` (same nearest ranks).
    Final CTE `{prefix}` has columns (grp, *quantile names)."""
    sels = ",\n         ".join(
        f"MIN(CASE WHEN h.cum >= CAST(CEIL(t.n * {q!r}) AS BIGINT)"
        f" THEN h.v END) AS {out}"
        for out, q in quantiles.items()
    )
    return f"""
{prefix}_hist AS (
  SELECT {grp} AS g, {val} AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM {src} GROUP BY {grp}, {val}
),
{prefix}_tot AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM {prefix}_hist GROUP BY g
),
{prefix}_cum AS (
  SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum
  FROM {prefix}_hist
),
{prefix} AS (
  SELECT h.g AS {grp},
         {sels}
  FROM {prefix}_cum h JOIN {prefix}_tot t ON h.g = t.g
  GROUP BY h.g
)"""


def group_median_sql(src: str, grp: str, val: str, out: str, prefix: str) -> str:
    """DuckDB CTE block mirroring `group_median` exactly (same rank
    selection, same (lo + hi) / 2 interpolation). Emits CTEs named
    `{prefix}_hist/_tot/_cum/{prefix}`; the final CTE has columns
    (grp, out)."""
    return f"""
{prefix}_hist AS (
  SELECT {grp} AS g, {val} AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM {src} GROUP BY {grp}, {val}
),
{prefix}_tot AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM {prefix}_hist GROUP BY g
),
{prefix}_cum AS (
  SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum
  FROM {prefix}_hist
),
{prefix} AS (
  SELECT h.g AS {grp},
         (MIN(CASE WHEN h.cum >= CAST(FLOOR((t.n + 1) / 2.0) AS BIGINT)
                   THEN h.v END)
          + MIN(CASE WHEN h.cum >= CAST(FLOOR(t.n / 2.0) AS BIGINT) + 1
                     THEN h.v END)) / CAST(2 AS DOUBLE) AS {out}
  FROM {prefix}_cum h JOIN {prefix}_tot t ON h.g = t.g
  GROUP BY h.g
)"""
