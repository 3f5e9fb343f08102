"""Bucketed tables — the map-side merge join without shuffles.

Reference parity: `CompositeInputFormat` (`MR-CORE/mapreduce/lib/join/
CompositeInputFormat.java:56`) joins N sources merge-style in the map phase,
but ONLY if every source is already sorted and identically partitioned on
the join key — a contract the user had to arrange by running prior jobs with
the same partitioner and reducer count (`Parser.java`, `WrappedRecordReader
.java:245` do the k-way merge). Spark's bucketed tables are the same
contract made declarative: `bucketBy(n, key).sortBy(key)` at write time
records bucket metadata; a later equi-join of two tables bucketed the same
way compiles to a sort-merge join with NO Exchange on either side — the
CompositeInputFormat plan, chosen by the optimizer instead of hand-wired.

Scale notes: at 100 TB the bucketed layout is the difference between
re-shuffling the fact table per join and reading co-located buckets; bucket
count should target HDFS-block-sized buckets per task (here small fixed
numbers — the mechanism, not the tuning, is under test). AQE cannot change
bucket counts at runtime, so both sides must agree at write time (or one
side's buckets be a divisor of the other's, which Spark coalesces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    The write shuffles once on the bucket columns — the "prior job with the
    agreed partitioner" of the reference — and every later equi-join or
    aggregation on those columns reads the layout instead of re-shuffling.
    """
    sort_cols = sort_cols or bucket_cols
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables; compiles shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the final physical plan (AQE
    aware): the CompositeInputFormat invariant is this == 0."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
