"""Shared test harness: one SparkSession per run + a DuckDB oracle comparator
that mirrors the driver's check (row count + column-name-sorted,
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_spark.session import get_session
from hadoop_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="hadoop_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def canon(rows, colnames):
    """Canonicalize a result set: sort columns by name, normalize values,
    sort rows — order-insensitive exact comparison."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if v is None:
            return "<NULL>"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, ddb_con, sql):
    got_cols = spark_df.columns
    got = canon(spark_df.collect(), got_cols)
    res = ddb_con.sql(sql)
    want = canon(res.fetchall(), res.columns)
    assert sorted(got_cols) == sorted(res.columns), (
        f"column mismatch: spark={sorted(got_cols)} oracle={sorted(res.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"row {i}: spark={g} oracle={w}"
