"""Cross-engine exactness of the numeric aggregation helpers (r10 audit).

The r9 ×10-SF strict sweep exposed the cross-engine decimal-cast tie class:
Spark quantizes a double's shortest repr HALF_UP, DuckDB half-even, so an
exact tie (a dyadic value whose decimal expansion ends exactly one digit
past the target scale — e.g. the float32-origin 0.3126220703125 at scale
12) quantizes DIFFERENTLY per engine. dsum carries that risk per addend;
fsum (floor-quantization: multiply/add/floor, all exactly-defined IEEE
ops) cannot diverge by construction. These tests pin both facts so a
future "simplify fsum back to dsum" regression is caught.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from hadoop_spark.functions.numeric import fsum, fsum_sql

# Dyadic doubles whose decimal expansion ends in '5' exactly one digit
# past scale 12 — the measured real-divergence class from the sf0.1
# embeddings fixture (k/2^13-style values).
_TIE_VALUES = [
    -0.0679931640625,
    0.3126220703125,
    -0.1539306640625,
    0.1871337890625,
    -0.1334228515625,
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_decimal_cast_ties_do_diverge_across_engines(spark, con):
    """The hazard is real: on exact scale-12 ties Spark HALF_UP and DuckDB
    half-even disagree — the reason fsum exists."""
    df = spark.createDataFrame([(v,) for v in _TIE_VALUES], "x double")
    got = [
        str(r.d)
        for r in df.select(
            F.col("x").cast("decimal(18,12)").alias("d")
        ).collect()
    ]
    con.execute("DROP TABLE IF EXISTS ties; CREATE TABLE ties(x DOUBLE)")
    con.executemany("INSERT INTO ties VALUES (?)", [(v,) for v in _TIE_VALUES])
    want = [
        str(r[0])
        for r in con.execute(
            "SELECT CAST(x AS DECIMAL(18,12)) FROM ties"
        ).fetchall()
    ]
    assert got != want  # every tie resolves oppositely (HALF_UP vs half-even)


@pytest.mark.parametrize("scale", [6, 8, 12])
def test_fsum_is_engine_exact_on_ties_and_generic_values(spark, con, scale):
    import random

    rng = random.Random(99)
    vals = _TIE_VALUES * 20 + [
        rng.uniform(-1, 1) * m
        for m in (1e-3, 0.0125, 0.5, 5.0, 500.0)
        for _ in range(2000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(fsum(F.col("x"), scale).alias("s")).collect()[0][0]
    con.execute("DROP TABLE IF EXISTS g; CREATE TABLE g(x DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?)", [(v,) for v in vals])
    want = con.execute(f"SELECT {fsum_sql('x', scale)} FROM g").fetchone()[0]
    assert got == want  # bit-equal, no rounding-rule dependence


def test_fsum_partition_invariance(spark):
    """fsum is order- and partitioning-independent (exact integer sum)."""
    import random

    rng = random.Random(5)
    vals = [rng.uniform(-1, 1) * 3.7 for _ in range(5000)]
    rows = [(v,) for v in vals]
    a = (
        spark.createDataFrame(rows, "x double")
        .repartition(1)
        .agg(fsum(F.col("x"), 12).alias("s"))
        .collect()[0][0]
    )
    b = (
        spark.createDataFrame(list(reversed(rows)), "x double")
        .repartition(17)
        .agg(fsum(F.col("x"), 12).alias("s"))
        .collect()[0][0]
    )
    assert a == b
