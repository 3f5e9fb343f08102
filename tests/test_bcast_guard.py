"""bcast_if_small: the size-guarded broadcast hint must (a) attach the
hint below the cap — star joins keep their BroadcastHashJoin plan at
bench scale — and (b) DEGRADE above the cap: no forced hint, Catalyst
free to pick sort-merge, which is the 100 TB survival property the
forced F.broadcast() hints lacked.

The hint-attached test pins autoBroadcastJoinThreshold=-1 so the ONLY
way a BroadcastHashJoin can appear is through the explicit hint — a
dead guard (the round-5 py4j .toString() bug this caught) cannot pass
vacuously on Catalyst's automatic broadcast."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from hadoop_spark.operators.join import bcast_if_small
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_auto_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def test_hint_is_actually_attached(spark):
    """With auto-broadcast disabled, only the explicit hint can produce a
    BroadcastHashJoin — proves the guard's hint path executes."""
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    with _no_auto_broadcast(spark):
        hinted = orders.join(
            bcast_if_small(cust), orders.o_custkey == cust.c_custkey
        )
        assert "BroadcastHashJoin" in _plan(hinted)
        bare = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert "BroadcastHashJoin" not in _plan(bare)


def test_size_estimate_is_read(spark):
    """The Catalyst estimate must be readable (non-zero) — guards against
    the stats accessor silently failing and the except path hiding it."""
    cust = load_table(spark, SF_DIR, "customer")
    raw = cust._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    assert int(str(raw)) > 0


def test_oversize_side_degrades_to_unhinted_join(spark):
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    guarded = bcast_if_small(cust, max_bytes=1)
    # no hint object wrapping: the exact same frame comes back
    assert guarded is cust
    with _no_auto_broadcast(spark):
        j = orders.join(guarded, orders.o_custkey == cust.c_custkey)
        # above the cap there is no forced broadcast — Catalyst falls
        # back to a shuffle join
        assert "BroadcastHashJoin" not in _plan(j)


def test_guard_result_is_correct_either_way(spark):
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    a = orders.join(bcast_if_small(cust), orders.o_custkey == cust.c_custkey)
    b = orders.join(
        bcast_if_small(cust, max_bytes=1), orders.o_custkey == cust.c_custkey
    )
    assert a.count() == b.count()
