"""Cross-checks that live OUTSIDE the driver contract: alternate
formulations of catalog queries pinned equal to the registered plan."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_value_iter_reset_buffered_matches_relational_plan(spark):
    """BackupStore mark/reset parity (`mapred/BackupStore.java:630`): the
    buffered two-pass applyInPandas reducer (drain → reset → re-iterate
    the SAME group) and the shuffle-native agg+join-back plan the catalog
    registers must be bit-identical — integer-cents arithmetic, so no
    float tolerance needed."""
    from hadoop_spark.plans.queries_agg import (
        value_iter_reset,
        value_iter_reset_buffered,
    )

    a = sorted(tuple(r) for r in value_iter_reset(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in value_iter_reset_buffered(spark, SF_DIR).collect())
    assert a == b
    assert len(a) > 0
