"""Oracle output-type audit: DuckDB must never hand the driver a DECIMAL
or HUGEINT result column. Those stringify differently from Spark's DOUBLE
/ BIGINT (trailing zeros, arbitrary precision) and have twice produced
red driver rows from CORRECT Spark answers (source_profile r3: bare
integer SUM -> HUGEINT; benford_digits r4: bare decimal literal ->
DECIMAL). Every aggregate and literal in an oracle must be cast."""

from __future__ import annotations

import duckdb
import pytest

from hadoop_spark.plans import ORACLES, load_all
from tests.conftest import SF_DIR

load_all()

_SAFE = ("BIGINT", "INTEGER", "SMALLINT", "DOUBLE", "FLOAT", "VARCHAR",
         "BOOLEAN", "DATE", "TIMESTAMP")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")
    yield c
    c.close()


def test_no_oracle_returns_decimal_or_hugeint(con):
    bad = []
    for name, sql in sorted(ORACLES.items()):
        res = con.sql(sql)
        for col, typ in zip(res.columns, res.types):
            t = str(typ)
            if t.startswith("DECIMAL") or t == "HUGEINT":
                bad.append((name, col, t))
    assert not bad, bad
