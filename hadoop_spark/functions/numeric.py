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


# ---------------------------------------------------------------------------
# floor-quantized exact sums (r10 quantization audit). dsum's per-addend
# double→DECIMAL cast is engine-identical only up to the shortest-repr
# tail-tie class: both engines round the ~17-significant-digit repr, and
# when its tail past the target scale is exactly "5…0" Spark (HALF_UP)
# and DuckDB (half-even) disagree — measured ≈ 0.5·10^-k per value, k =
# repr digits beyond the scale (e.g. 2.2e-5 at |x|≈0.5, scale 12). For
# addends that are near grid multiples (cents, source-column products)
# the tail is zeros and dsum is deterministic-safe; for GENERIC addends
# (quotients, centered values) use fsum: floor(x·10^s + 0.5) — multiply,
# add, floor are all exactly-defined IEEE ops, so both engines produce
# bit-identical integers with NO decimal-rounding rule involved — then
# exact integer sum, /10^s back. 10^s is exact for s ≤ 22; keep
# |x|·10^s < 2^53 so the pre-floor double is integer-resolving.
# ---------------------------------------------------------------------------


def fsum(expr: Column, scale: int = 4) -> Column:
    """Engine- and order-exact SUM of generic doubles via floor-quantization."""
    step = float(10**scale)
    q = F.floor(expr * F.lit(step) + F.lit(0.5)).cast("decimal(38,0)")
    return F.sum(q).cast("string").cast("double") / F.lit(step)


def fsum_sql(expr: str, scale: int = 4) -> str:
    step = f"1{'0' * scale}"
    return (
        f"(CAST(CAST(SUM(CAST(FLOOR(({expr}) * {step} + 0.5) AS DECIMAL(38,0)))"
        f" AS VARCHAR) AS DOUBLE) / {step})"
    )
