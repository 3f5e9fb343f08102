"""Typed-bytes pipe protocol (`hadoop-streaming/.../typedbytes/
TypedBytesInput.java:34`, `Type.java`): codec round trips + an end-to-end
pipe through an external binary, plus the streamed-I/O guarantee that a
partition larger than the OS pipe buffer neither deadlocks nor buffers
whole-partition."""

from __future__ import annotations

import io

import pytest

from pyspark.sql import functions as F

from hadoop_spark.operators.pipe import (
    pipe_typedbytes,
    pipe_with_counters,
    tb_decode_stream,
    tb_encode,
)
from hadoop_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "value",
    [
        True,
        False,
        0,
        -1,
        2**31 - 1,       # max int32 → code 3
        2**31,           # first long → code 4
        -(2**63),        # min int64
        1.5,
        -0.0,
        "",
        "héllo\tworld\nline2",
        b"\x00\xff raw bytes",
    ],
)
def test_tb_codec_roundtrip(value):
    decoded = list(tb_decode_stream(io.BytesIO(tb_encode(value))))
    assert decoded == [value]


def test_tb_stream_many_values():
    vals = ["k1", 7, "k2", 9, 3.25, b"\x01\x02", True]
    blob = b"".join(tb_encode(v) for v in vals)
    assert list(tb_decode_stream(io.BytesIO(blob))) == vals


def test_tb_unknown_code_rejected():
    with pytest.raises(ValueError, match="type code"):
        list(tb_decode_stream(io.BytesIO(b"\x63")))


def test_pipe_typedbytes_identity(spark):
    nation = load_table(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("k"), F.col("n_name").alias("v")
    )
    out = pipe_typedbytes(nation, "cat", "k bigint, v string")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, nation.collect()))


def test_pipe_streams_partition_larger_than_pipe_buffer(spark):
    """A single partition well past the 64 KiB OS pipe buffer must flow
    through an external command without deadlock (the failure mode of
    write-all-then-read) — proves stdin/stdout are genuinely concurrent."""
    n = 20_000  # ~2 MB of lines through one partition
    df = (
        spark.range(n)
        .select(F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("line"))
        .coalesce(1)
    )
    out, counters = pipe_with_counters(df, "cat")
    assert out.count() == n
    assert counters.value() == {}


from hypothesis import given, settings
from hypothesis import strategies as st

tb_value = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)


@given(vals=st.lists(tb_value, max_size=30))
@settings(max_examples=200, deadline=None)
def test_tb_codec_property_roundtrip(vals):
    """Any sequence of protocol-representable values survives encode →
    concatenate → decode byte-exactly (the wire-format contract a real
    typed-bytes mapper binary depends on)."""
    blob = b"".join(tb_encode(v) for v in vals)
    assert list(tb_decode_stream(io.BytesIO(blob))) == vals
