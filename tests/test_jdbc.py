"""JDBC round-trip against embedded Derby (shipped in Spark's jars):
DBCountPageView parity (`EXAMPLES/DBCountPageView.java:78`) — write
pageview-shaped rows with batched INSERTs (`DBOutputFormat.java:249`), read
them back as a range-partitioned parallel scan
(`DataDrivenDBInputFormat.java`), verify content and split count."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hadoop_spark.sources.formats import read_jdbc_partitioned, write_jdbc
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR

DB_DIR = "/root/repo/.tmp/pageviews_db"
URL = f"jdbc:derby:{DB_DIR};create=true"
DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def pageviews(spark):
    shutil.rmtree(DB_DIR, ignore_errors=True)
    df = (
        load_table(spark, SF_DIR, "events")
        .select(
            F.col("event_id").alias("view_id"),
            F.concat(F.lit("/page/"), F.col("event_type")).alias("url"),
            F.col("user_id"),
            "ts",
        )
        .limit(500)
    )
    write_jdbc(df, URL, "pageviews", mode="overwrite", driver="org.apache.derby.jdbc.EmbeddedDriver")
    yield df
    shutil.rmtree(DB_DIR, ignore_errors=True)


def test_jdbc_roundtrip_partitioned(spark, pageviews):
    bounds = pageviews.agg(
        F.min("view_id").alias("lo"), F.max("view_id").alias("hi")
    ).collect()[0]
    back = read_jdbc_partitioned(
        spark,
        URL,
        "pageviews",
        column="view_id",
        lower=int(bounds.lo),
        upper=int(bounds.hi) + 1,
        num_partitions=4,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    # parallel scan: one task per range split
    assert back.rdd.getNumPartitions() == 4
    got = sorted(tuple(r) for r in back.select("view_id", "url", "user_id").collect())
    want = sorted(tuple(r) for r in pageviews.select("view_id", "url", "user_id").collect())
    assert got == want


def test_jdbc_pushdown_reaches_database(spark, pageviews):
    back = read_jdbc_partitioned(
        spark,
        URL,
        "pageviews",
        column="view_id",
        lower=0,
        upper=1000,
        num_partitions=2,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).filter(F.col("user_id") == 7)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # Catalyst pushes the filter into the JDBC source (PushedFilters), the
    # SequenceFileInputFilter idea (`lib/input/SequenceFileInputFilter.java:49`)
    # done by the optimizer instead of the InputFormat.
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:120]
    want = pageviews.filter(F.col("user_id") == 7).count()
    assert back.count() == want
