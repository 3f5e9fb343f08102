"""Combiner-invariance (FIXTURES.md invariant 4, mirroring
`TestNewCombinerGrouping.java`): partial/final aggregation must give
bit-identical results for ANY parallelism. The decimal-quantized numeric
helpers are what make this hold for float sums — this test pins it."""

from __future__ import annotations

import pytest

from hadoop_spark.plans import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()

# Aggregation-bearing queries most sensitive to fold order.
_QUERIES = ["tpch_q1", "agg_framework", "word_stats", "tumbling_window"]


@pytest.mark.parametrize("name", _QUERIES)
def test_result_invariant_under_parallelism(spark, name):
    results = []
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("1", "7", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = QUERIES[name](spark, SF_DIR)
            results.append(sorted(tuple(r) for r in df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert results[0] == results[1] == results[2]
