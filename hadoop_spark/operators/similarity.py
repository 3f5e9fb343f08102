"""Similarity search over embedding columns (`array<float>`): exact cosine
top-k as the baseline, IVF cell-probing as the scale path.

No reference analogue (SURVEY §7 M9 extension). Spark-first design:

- Dot products ride `zip_with` + `aggregate` (JVM higher-order functions,
  whole-stage codegen) — no Python, no UDF.
- **Integer quantization for determinism**: each float is quantized to a
  BIGINT at 1e7 scale; dot products and squared norms are then *exact*
  integer arithmetic (bounds: |q| < 1e7 ⇒ 64-dim dot < 6.4e15 < 2^63, and
  < 2^53 so DuckDB's DOUBLE-returning list_dot_product is also exact).
  The only float ops left are one sqrt+divide per pair — single IEEE ops on
  exactly-representable ints, bit-identical across engines. Cosine is
  reported as micro-units (`cos_q` = round(cos·1e6), BIGINT).
- Scale shape: brute force is O(n·q) per q queries — fine for reranking,
  wrong for n=10^9. IVF assigns every vector to its nearest centroid
  (map-side after a tiny broadcast of centroids), queries probe the
  `NPROBE` nearest cells — the candidate set shrinks by ~#cells; the
  centroid assignment join is a broadcast join, never a shuffle of the big
  side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 10_000_000  # 1e7: float32 → BIGINT micro-units
COS_SCALE = 1_000_000  # cosine reported in micro-units


def quantize(vec: Column) -> Column:
    """array<float> → array<bigint> at 1e7 scale (exact thereafter)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("bigint")
    )


def quantize_sql(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> CAST(ROUND(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def int_dot_sql(a: str, b: str) -> str:
    # list_dot_product returns DOUBLE; exact while |value| < 2^53 (see module
    # doc for bounds), cast back to BIGINT.
    return f"CAST(list_dot_product({a}, {b}) AS BIGINT)"


def cos_q(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """Quantized cosine in micro-units from exact integer dot/norms."""
    cos = dot.cast("double") / (
        F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double"))
    )
    return F.round(cos * COS_SCALE).cast("bigint")


def cos_q_sql(dot: str, norm2_a: str, norm2_b: str) -> str:
    cos = (
        f"(CAST({dot} AS DOUBLE) / (sqrt(CAST({norm2_a} AS DOUBLE)) * "
        f"sqrt(CAST({norm2_b} AS DOUBLE))))"
    )
    return f"CAST(ROUND({cos} * {COS_SCALE}) AS BIGINT)"


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add quantized vector `q` and its exact squared norm `n2` (map-side)."""
    q = quantize(F.col(vec_col))
    return df.withColumn("q", q).withColumn("n2", int_dot(F.col("q"), F.col("q")))


QUANTIZED_SQL_CTE = (
    "SELECT vec_id, {q} AS q, {n2} AS n2, label FROM embeddings"
).format(q=quantize_sql("embedding"), n2="CAST(list_dot_product({0}, {0}) AS BIGINT)".format(quantize_sql("embedding")))
