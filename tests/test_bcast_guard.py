"""bcast_if_small: the size-guarded broadcast hint must (a) attach the
hint below the cap — star joins keep their BroadcastHashJoin plan at
bench scale — and (b) DEGRADE above the cap: no forced hint, Catalyst
free to pick sort-merge, which is the 100 TB survival property the
forced F.broadcast() hints lacked."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_small_side_is_broadcast(spark):
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    j = orders.join(bcast_if_small(cust), orders.o_custkey == cust.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_oversize_side_degrades_to_unhinted_join(spark):
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    guarded = bcast_if_small(cust, max_bytes=1)
    # no hint object wrapping: the exact same frame comes back
    assert guarded is cust
    j = orders.join(guarded, orders.o_custkey == cust.c_custkey)
    # Catalyst still picks SOME join; what matters is the plan builds
    # without a forced broadcast of the oversize side
    plan = _plan(j)
    assert "Join" in plan


def test_guard_result_is_correct_either_way(spark):
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    a = orders.join(bcast_if_small(cust), orders.o_custkey == cust.c_custkey)
    b = orders.join(
        bcast_if_small(cust, max_bytes=1), orders.o_custkey == cust.c_custkey
    )
    assert a.count() == b.count()
