"""Catalog-wide correctness: every query with an oracle must match DuckDB
exactly (the local mirror of the driver's CORRECTNESS gate), and every
oracle-less query must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from hadoop_spark.plans import ORACLES, QUERIES, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_less_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_uniq_approx_hll_within_5pct(spark):
    """The oracle column only pins a loose 15% bound (HLL is probabilistic;
    a bound near rsd could flip at another SF and read as a hash mismatch).
    The tight engineering bound — estimate within ±5% of exact at rsd=0.02
    on this fixture — is asserted here instead."""
    from pyspark.sql import functions as F

    from hadoop_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= 0.05 * r.exact, r
