"""Join operators — all three of the reference's join algorithms, plus the
semi/anti/range extensions it lacks (SURVEY §2.4).

Reference algorithms:
1. Map-side merge join over pre-sorted co-partitioned sources with a join
   expression DSL — `inner(a,b)`, `outer(a,b)`, `override(a,b)`
   (`lib/join/CompositeInputFormat.java:56`, parser `Parser.java`,
   merge engine `CompositeRecordReader.java`).
2. Reduce-side tagged repartition join (`hadoop-tools/hadoop-datajoin/...`
   `DataJoinReducerBase.java:47` — regroup per tag, cross product per key).
3. Broadcast hash join via DistributedCache (`DistributedCache.java:87`).

Spark collapses all three into `df.join`: Catalyst picks broadcast vs
shuffle-hash vs sort-merge per side statistics, and AQE re-picks at runtime.
What needs building is only the N-way composition semantics: `inner`/`outer`
across N sources and `override` (rightmost source wins per key).

Scale notes: N-way composite joins shuffle each source once on the key
(sort-merge), not pairwise repeatedly — Catalyst reuses the exchange
partitioning across the chained joins. `override` is coalesce-after-outer:
no extra shuffle beyond the join itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def composite_inner(key: str, *sources: DataFrame) -> DataFrame:
    """`inner(a,b,...)`: emit only keys present in ALL sources, full cross
    product of per-source matches (`InnerJoinRecordReader.java:34`)."""
    return reduce(lambda a, b: a.join(b, on=key, how="inner"), sources)


def composite_outer(key: str, *sources: DataFrame) -> DataFrame:
    """`outer(a,b,...)`: emit keys present in ANY source; missing slots are
    NULL (`OuterJoinRecordReader.java:34`)."""
    return reduce(lambda a, b: a.join(b, on=key, how="full_outer"), sources)


def override(key: str, value_col: str, *sources: DataFrame) -> DataFrame:
    """`override(a,b,...)`: per key, the value from the RIGHTMOST source that
    has it (`OverrideRecordReader.java:42`, emit `:56`).

    Each source must be unique per key (the reference reads one value per
    key in this mode — MultiFilterRecordReader view). Implemented as a full
    outer N-way join + reverse-priority coalesce: one shuffle, no Python."""
    aliased = []
    for i, src in enumerate(sources):
        aliased.append(src.select(key, F.col(value_col).alias(f"_v{i}")))
    joined = reduce(lambda a, b: a.join(b, on=key, how="full_outer"), aliased)
    prio = [F.col(f"_v{i}") for i in range(len(sources) - 1, -1, -1)]
    return joined.select(key, F.coalesce(*prio).alias(value_col))


def tagged_join(key: str, tagged: dict[str, DataFrame]) -> DataFrame:
    """datajoin parity: tag each source, union, regroup per key — expressed
    as its result (the per-key cross product across tags), which is exactly
    the N-way inner join. The tag column survives as provenance."""
    sources = [
        df.select(F.lit(tag).alias(f"tag_{tag}"), "*") for tag, df in tagged.items()
    ]
    return composite_inner(key, *sources)


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """DistributedCache map-side hash join: ship the small table to every
    task. `F.broadcast` forces it regardless of autoBroadcastJoinThreshold."""
    return big.join(F.broadcast(small), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — no named operator in the reference (expressible only as a
    filter idiom); native in Spark, no right-side columns, no duplication."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — free extension over the reference."""
    return left.join(right, on=on, how="left_anti")
