"""Deterministic numeric aggregation helpers.

Distributed SUM over doubles is order-dependent (Spark folds per-partition in
shuffle order; the oracle folds sequentially), so raw double sums never
hash-match. The fix mirrors what a money column should be anyway: quantize
per-row to DECIMAL (the cast of a double to a fixed scale is unambiguous —
rounding ties would require the double to be exactly k/10^s + 5/10^(s+1),
which is not a dyadic rational, hence not representable), SUM in exact decimal
arithmetic, cast the total back to DOUBLE. Result is bit-identical regardless
of partitioning, parallelism, or engine — which is also the property that
makes results reproducible run-to-run on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRECISION = 18


def dsum(expr: Column, scale: int = 4) -> Column:
    """Order-independent SUM: quantize to decimal(18, scale), sum, → double."""
    return F.sum(expr.cast(f"decimal({PRECISION},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    # The VARCHAR round-trip matters: DuckDB's INT128-decimal → DOUBLE cast
    # is not correctly rounded (observed 1-ulp error once the unscaled total
    # exceeds 2^53, e.g. 2828375807.43413200 → …4341316), while its
    # string → double parse IS correctly rounded, matching Spark's
    # BigDecimal.doubleValue.
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({PRECISION},{scale}))) AS VARCHAR)"
        " AS DOUBLE)"
    )


def davg(expr: Column, scale: int = 4) -> Column:
    """Order-independent AVG as exact-decimal sum / count, both in double."""
    return dsum(expr, scale) / F.count(expr).cast("double")


def davg_sql(expr: str, scale: int = 4) -> str:
    return f"({dsum_sql(expr, scale)} / CAST(COUNT({expr}) AS DOUBLE))"
