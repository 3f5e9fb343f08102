"""Degenerate-input sweep: every catalog query must run against EMPTY
tables (same schemas, zero rows) without crashing — the
EmptyInputFormat/zero-split regime (`lib/input/EmptyInputFormat.java`) that
real pipelines hit on empty partitions, fresh days, and filtered-out
sources. Row counts may legitimately be zero or constant; the gate is "no
exception, schema intact"."""

from __future__ import annotations

import os
import shutil

import pytest

from hadoop_spark.plans import QUERIES, load_all
from hadoop_spark.sources.tables import TABLE_NAMES, load_table
from tests.conftest import SF_DIR

load_all()

# Queries whose implementation contractually needs ≥1 row:
# - seqfile_roundtrip: sc.sequenceFile cannot infer Writable types from an
#   empty directory (no header to read) — matches the reference, where an
#   empty SequenceFile still has a typed header but an empty DIR does not.
#   (auto_input_mixed builds its SequenceFile fixture the same way)
_NEEDS_DATA = {"seqfile_roundtrip", "auto_input_mixed"}


@pytest.fixture(scope="module")
def empty_dir(spark):
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "sf_empty")
    marker = os.path.join(path, "_READY")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        for name in TABLE_NAMES:
            load_table(spark, SF_DIR, name).limit(0).write.mode("overwrite").parquet(
                os.path.join(path, f"{name}.parquet")
            )
        open(marker, "w").close()
    return path


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_dir, name):
    if name in _NEEDS_DATA:
        pytest.skip("contractually requires non-empty input")
    spark.catalog.clearCache()
    df = QUERIES[name](spark, empty_dir)
    assert df.columns, f"{name}: no columns"
    df.collect()  # must not raise
