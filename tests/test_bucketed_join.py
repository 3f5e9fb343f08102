"""Bucketed co-located join = CompositeInputFormat map-side merge join
(`lib/join/CompositeInputFormat.java:56`): identically bucketed + sorted
sources must join with ZERO shuffle exchanges, and produce exactly the rows
of the shuffled join."""

from __future__ import annotations

import pytest

from hadoop_spark.sources.bucketed import (
    colocated_join,
    exchanges_in_plan,
    write_bucketed,
)
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR, canon


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "key"), "b_orders", ["key"], 4
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "key"), "b_lineitem", ["key"], 4
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    auto_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # Force a non-broadcast join so the bucket merge path is what's planned.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, on=["key"])
        joined.count()  # finalize AQE plan
        assert exchanges_in_plan(joined) == 0, joined._jdf.queryExecution().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto_bc)


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, on=["key"]).select(
        "key", "o_totalprice", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    plain = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            orders.o_orderkey.alias("key"), "o_totalprice", "l_extendedprice"
        )
    )
    got = canon([tuple(r) for r in joined.collect()], joined.columns)
    want = canon([tuple(r) for r in plain.collect()], plain.columns)
    assert got == want
