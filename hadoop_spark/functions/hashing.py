"""Portable deterministic hashing.

The reference samples and filters by hashing record keys with MD5
(`SequenceFileInputFilter.PercentFilter` / `MD5Filter`,
`hadoop-mapreduce-client-core/.../lib/input/SequenceFileInputFilter.java:154,203`)
so that a sample is a pure function of the data, not of the scheduler. We keep
that property: ``portable_hash64`` is MD5-based and engine-independent, so the
same expression evaluates identically in Spark and in the DuckDB oracle
(`portable_hash64_sql`). Used for deterministic sampling, MinHash signatures,
SimHash bits, and document fingerprints.

Scale note: md5 is a JVM built-in (whole-stage codegen'd), no Python boundary;
at 100 TB this is a pure map-side expression with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column | str, salt: str = "") -> Column:
    """First 15 hex chars of md5(col ‖ salt) as a non-negative BIGINT.

    15 hex chars = 60 bits < 2^63, so the value is identical in any engine
    with 64-bit integers and an md5() — in particular the DuckDB oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    payload = F.concat(c.cast("string"), F.lit(salt)) if salt else c.cast("string")
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, salt: str = "") -> str:
    """DuckDB SQL rendering of :func:`portable_hash64` over ``expr``."""
    payload = f"(CAST({expr} AS VARCHAR) || '{salt}')" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST('0x' || substr(md5({payload}), 1, 15) AS BIGINT)"
