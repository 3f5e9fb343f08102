"""sign_projection_buckets (r10) replaces ann_lsh_topk's chained-HOF
bucket fold with one integer-matmul Arrow kernel. This pins the kernel to
the exact fold semantics on random vectors AND the fold's degraded path
(null q / null element / wrong length -> the fold's per-plane
``F.when(null >= 0, ...)`` falls to 0 on every plane -> bucket 0)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hadoop_spark.operators.similarity import sign_projection_buckets


@pytest.fixture(scope="module")
def spark():
    from hadoop_spark.session import get_session

    return get_session(app_name="test_sign_projection", master="local[2]")


_DIM = 8
_PLANES = [
    [((j * 37 + d * 11) % 7) - 3 for d in range(_DIM)] for j in range(4)
]


def _hof_bucket_frame(spark, df):
    bucket = F.lit(0)
    for j, plane in enumerate(_PLANES):
        w = F.array(*[F.lit(x).cast("bigint") for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col("q"), w, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return df.select("vec_id", bucket.cast("bigint").alias("bucket"))


def _rows():
    rng = random.Random(7)
    rows = [
        (i, [rng.randint(-10_000_000, 10_000_000) for _ in range(_DIM)])
        for i in range(200)
    ]
    # degraded rows: null q, short, long, null element, all-zero
    rows += [
        (1000, None),
        (1001, [1] * (_DIM - 1)),
        (1002, [1] * (_DIM + 1)),
        (1003, [1] * (_DIM - 1) + [None]),
        (1004, [0] * _DIM),
    ]
    return rows


def test_kernel_matches_hof_fold(spark):
    df = spark.createDataFrame(_rows(), "vec_id bigint, q array<bigint>")
    got = sorted(
        (r["vec_id"], r["bucket"])
        for r in sign_projection_buckets(
            df, _PLANES, keep=["vec_id"], schema="vec_id bigint, bucket bigint"
        ).collect()
    )
    want = sorted(
        (r["vec_id"], r["bucket"]) for r in _hof_bucket_frame(spark, df).collect()
    )
    assert got == want


def test_degraded_rows_bucket_zero(spark):
    df = spark.createDataFrame(
        [(1, None), (2, [1, None] + [1] * (_DIM - 2)), (3, [5] * (_DIM + 3))],
        "vec_id bigint, q array<bigint>",
    )
    got = {
        r["vec_id"]: r["bucket"]
        for r in sign_projection_buckets(
            df, _PLANES, keep=["vec_id"], schema="vec_id bigint, bucket bigint"
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0}


def test_empty_frame(spark):
    df = spark.createDataFrame([], "vec_id bigint, q array<bigint>")
    assert (
        sign_projection_buckets(
            df, _PLANES, keep=["vec_id"], schema="vec_id bigint, bucket bigint"
        ).count()
        == 0
    )
