"""Change-data-capture merge (upsert) — keep-latest-by-key consolidation.

The reference's nearest surface is the reduce-side tagged join of the
datajoin contrib (`hadoop-datajoin/.../DataJoinReducerBase.java:90`: group
tagged records by key, resolve per key) and MapFile's
merge-sorted-then-latest read pattern; every warehouse on top of it
hand-built "apply the day's delta to the snapshot" exactly this way. Here it
is one declarative operator.

Scale shape: union (no shuffle) → one hash shuffle on the key → per-key
top-1 window. At 100 TB the snapshot side stays where it is; only the
(small) delta moves with it through one exchange — and if the snapshot is
bucketed by key (`sources/bucketed.py`), even that exchange disappears on
the snapshot side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame,
    delta: DataFrame,
    key: str,
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply `delta` onto `snapshot`: per key, the highest `version_col`
    wins; among equal versions the delta row wins. If `delete_col` names a
    boolean column on the delta, winning delete rows REMOVE the key
    (tombstone semantics) and the column is dropped from the output.

    Both inputs must share the snapshot's schema (plus the optional
    tombstone column on the delta side).
    """
    snap = snapshot.withColumn("__src", F.lit(0))
    dlt = delta.withColumn("__src", F.lit(1))
    if delete_col is not None:
        snap = snap.withColumn(delete_col, F.lit(False))
    merged = snap.unionByName(dlt)
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    if delete_col is not None:
        latest = latest.filter(~F.col(delete_col)).drop(delete_col)
    return latest
