"""Driver contract for the spark-graft builder (PySpark target).

The real implementation lives in ``hadoop_spark/``; this module adapts the
query catalog (`hadoop_spark/plans/`) to the driver's three entry points:
``entry`` (smoke), ``queries`` (per-operator Spark builders) and
``oracle_sql`` (DuckDB-equivalent SQL for the correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_spark.plans import ORACLES, QUERIES, load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    load_all()
    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here get the driver's
    weaker rows-only check (non-SQL-expressible ops only)."""
    load_all()
    return dict(ORACLES)
