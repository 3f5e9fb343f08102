"""merge_upsert semantics (datajoin resolve-per-key parity,
`DataJoinReducerBase.java:90`): latest version wins, delta beats snapshot
on version ties, tombstones delete, unseen delta keys insert."""

from __future__ import annotations

from hadoop_spark.operators.cdc import merge_upsert


def _collect(df):
    return {r.k: (r.val, r.v) for r in df.collect()}


def test_merge_upsert_semantics(spark):
    snapshot = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 5), (3, "c", 1), (4, "d", 1)], "k int, val string, v int"
    )
    delta = spark.createDataFrame(
        [
            (1, "a2", 2, False),   # newer version → update
            (2, "b2", 3, False),   # OLDER version → snapshot wins
            (3, "c2", 1, False),   # equal version → delta wins the tie
            (4, None, 9, True),    # tombstone → key removed
            (5, "e", 1, False),    # unseen key → insert
        ],
        "k int, val string, v int, deleted boolean",
    )
    got = _collect(merge_upsert(snapshot, delta, "k", "v", delete_col="deleted"))
    assert got == {1: ("a2", 2), 2: ("b", 5), 3: ("c2", 1), 5: ("e", 1)}


def test_merge_upsert_without_tombstones(spark):
    snapshot = spark.createDataFrame([(1, "a", 1)], "k int, val string, v int")
    delta = spark.createDataFrame([(1, "a9", 9), (2, "b", 1)], "k int, val string, v int")
    got = _collect(merge_upsert(snapshot, delta, "k", "v"))
    assert got == {1: ("a9", 9), 2: ("b", 1)}
