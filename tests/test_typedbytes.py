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


# ---------------------------------------------------------- containers
# VECTOR (code 8, count-prefixed) and LIST (code 9, 255-terminated) —
# `TypedBytesInput.java readVector/readList`, added r9.

import struct


@pytest.mark.parametrize(
    "value",
    [
        [],
        [1, 2, 3],
        [2**40, -(2**40)],                # long elements
        ["a", 1.5, b"\x00", True],        # heterogeneous
        [[1, 2], ["x"], []],              # nested vectors
    ],
)
def test_tb_vector_roundtrip(value):
    decoded = list(tb_decode_stream(io.BytesIO(tb_encode(value))))
    assert decoded == [value]


def test_tb_vector_wire_format_is_the_spec():
    # code byte 8, big-endian int32 count, then each element's own record
    blob = tb_encode([1, "ab"])
    assert blob[0] == 8
    assert struct.unpack(">i", blob[1:5])[0] == 2
    assert blob[5] == 3  # int element
    assert blob[10] == 7  # string element


def test_tb_list_decode_with_marker():
    # LIST: values until the 255 marker (we decode; encode emits VECTOR)
    blob = b"\x09" + tb_encode(5) + tb_encode("x") + b"\xff"
    assert list(tb_decode_stream(io.BytesIO(blob))) == [[5, "x"]]


def test_tb_list_missing_marker_rejected():
    blob = b"\x09" + tb_encode(5)  # EOF before the 255 marker
    with pytest.raises(ValueError, match="LIST"):
        list(tb_decode_stream(io.BytesIO(blob)))


@given(vals=st.lists(st.lists(tb_value, max_size=8), max_size=10))
@settings(max_examples=100, deadline=None)
def test_tb_vector_property_roundtrip(vals):
    blob = b"".join(tb_encode(v) for v in vals)
    assert list(tb_decode_stream(io.BytesIO(blob))) == vals


def test_pipe_typedbytes_vector_shipped_script(spark, tmp_path):
    """End-to-end VECTOR pipe through a shipped foreign script: array
    column encoded as code-8 records, summed by a standalone typed-bytes
    implementation, scalars decoded back (the tb_vector_pipe idiom)."""
    from hadoop_spark.plans.queries_io import _TB_VECTOR_MAPPER

    script = tmp_path / "mapper.py"
    script.write_text(_TB_VECTOR_MAPPER)
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [10, -4]), (3, [])],
        "k bigint, vec array<bigint>",
    )
    out = pipe_typedbytes(
        df, "python3", "k bigint, vsum bigint, n int", ship_script=str(script)
    )
    assert sorted(map(tuple, out.collect())) == [(1, 6, 3), (2, 6, 2), (3, 0, 0)]


# ------------------------------------------------- full Type.java parity
# BYTE (1) and FLOAT (5) decode-only, MAP (10) both ways — added r9 after
# the VECTOR/LIST work, completing the reference's type-code set.


def test_tb_byte_and_float_decode():
    blob = struct.pack(">Bb", 1, -7) + struct.pack(">Bf", 5, 2.5)
    assert list(tb_decode_stream(io.BytesIO(blob))) == [-7, 2.5]


@pytest.mark.parametrize(
    "value",
    [
        {},
        {"a": 1, "b": 2.5},
        {1: "x", True: b"\x00"},       # NB True == 1 in Python: 1 entry
        {"nested": {"k": [1, 2]}},
    ],
)
def test_tb_map_roundtrip(value):
    decoded = list(tb_decode_stream(io.BytesIO(tb_encode(value))))
    assert decoded == [value]


def test_tb_map_wire_format_is_the_spec():
    blob = tb_encode({"k": 9})
    assert blob[0] == 10
    assert struct.unpack(">i", blob[1:5])[0] == 1
    assert blob[5] == 7  # string key record follows


def test_tb_map_vector_key_decodes_to_tuple():
    # A foreign binary may key a MAP by a VECTOR; Python dicts need a
    # hashable key, so the decoder tuples it.
    blob = struct.pack(">Bi", 10, 1) + tb_encode([1, 2]) + tb_encode("v")
    assert list(tb_decode_stream(io.BytesIO(blob))) == [{(1, 2): "v"}]


tb_scalar_key = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=20),
    st.binary(max_size=20),
)


@given(m=st.dictionaries(tb_scalar_key, tb_value, max_size=10))
@settings(max_examples=100, deadline=None)
def test_tb_map_property_roundtrip(m):
    assert list(tb_decode_stream(io.BytesIO(tb_encode(m)))) == [m]


# ----------------------------------------------- truncated-stream guard
# r9 ADVICE: fh.read(n) on a pipe may legally return fewer than n bytes,
# and EOF mid-container used to surface as IndexError. Every fixed-size /
# length-prefixed read now goes through _tb_read_exact, which raises a
# typed-bytes ValueError (the reference's readFully -> EOFException).


@pytest.mark.parametrize(
    "blob",
    [
        struct.pack(">BI", 7, 10) + b"short",          # STRING: 5 of 10 bytes
        struct.pack(">BI", 0, 4) + b"ab",              # BYTES: 2 of 4
        struct.pack(">Bi", 3, 0)[:3],                  # INT payload cut
        struct.pack(">Bq", 4, 0)[:5],                  # LONG payload cut
        struct.pack(">Bd", 6, 1.0)[:4],                # DOUBLE payload cut
        struct.pack(">Bi", 8, 2) + tb_encode(1),       # VECTOR: 1 of 2 elems
        struct.pack(">Bi", 8, 1),                      # VECTOR: EOF at elem code
        struct.pack(">Bi", 10, 1) + tb_encode("k"),    # MAP: EOF at value code
        struct.pack(">B", 8) + b"\x00\x00",            # VECTOR count cut
    ],
)
def test_tb_truncated_stream_raises_typed_error(blob):
    with pytest.raises(ValueError, match="typed-bytes"):
        list(tb_decode_stream(io.BytesIO(blob)))


def test_tb_zero_length_payloads_decode():
    blob = struct.pack(">BI", 7, 0) + struct.pack(">BI", 0, 0)
    assert list(tb_decode_stream(io.BytesIO(blob))) == ["", b""]


def test_pipe_typedbytes_interpreter_with_flags(spark, tmp_path):
    """r9 ADVICE: `command` for a shipped script is shlex-split, so an
    interpreter with flags ('python3 -u') works instead of failing as a
    nonexistent executable name."""
    from hadoop_spark.plans.queries_io import _TB_VECTOR_MAPPER

    script = tmp_path / "mapper_flags.py"
    script.write_text(_TB_VECTOR_MAPPER)
    df = spark.createDataFrame([(1, [4, 5])], "k bigint, vec array<bigint>")
    out = pipe_typedbytes(
        df, "python3 -u", "k bigint, vsum bigint, n int", ship_script=str(script)
    )
    assert sorted(map(tuple, out.collect())) == [(1, 9, 2)]
