"""Canonical test-table loaders.

The reference's "table" is a directory of files on a DFS read through an
InputFormat (`FileInputFormat.getSplits`,
`hadoop-mapreduce-client-core/.../lib/input/FileInputFormat.java:438`); here a
table is a parquet path and the DataSource framework computes the splits.
Column pruning + predicate pushdown reach the scan automatically — the
capability the reference had to hand-build per-format
(`SequenceFileInputFilter.java:49`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def _prep(spark: SparkSession) -> None:
    """Session invariants every query relies on, applied defensively so the
    catalog behaves identically under a caller-provided session (the driver
    builds its own): UTC timestamp semantics (matches the oracle's naive
    timestamps) and ns-timestamp parquet tolerance."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prep(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects. Read the raw int64 nanos (legacy conf) and
    truncate to microseconds — exactly what DuckDB/Arrow do when narrowing
    ns → µs, so both engines see identical timestamps."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL entry points."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
