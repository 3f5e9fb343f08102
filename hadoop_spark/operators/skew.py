"""Skew mitigation — salting for hot join keys.

Reference parity: `RehashPartitioner` (`lib/partition/RehashPartitioner.
java:35`) re-hashes keys whose hashCode distributes badly; it cannot help
when ONE key is genuinely hot (every record still lands on one reducer).
The engine's layered answer:

1. AQE skew-join splitting (on in session.py) — handles skewed PARTITIONS
   at runtime with zero user code.
2. Explicit salting (this module) — handles a skewed KEY: replicate the
   small side R times, scatter the big side's hot keys across R salt
   buckets, join on (key, salt). The classic trade: small-side blow-up ×R
   buys big-side parallelism ×R on hot keys.

Scale notes: salt only what's hot. `salted_join` takes an optional hot-key
frame (from a cheap pre-aggregation sample); non-hot keys join with salt=0
and the small side replicates only its hot rows — replication cost is
O(|hot keys| × R), not O(|small side| × R).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    hot_keys: DataFrame | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `big ⋈ small` on `key` with hot keys scattered over
    `num_salts` buckets.

    `hot_keys`: single-column frame of the skewed key values (broadcast);
    None ⇒ salt every key (uniform replication — simplest, costs ×R on the
    whole small side).

    The big side's salt is a hash of the ROW'S OWN columns, never
    `monotonically_increasing_id`: a mid-shuffle task retry recomputes the
    same salt for every row, so shuffle consumers that already fetched
    blocks see a consistent bucketing (retry-unstable salts are a classic
    wrong-results-under-speculation hazard). Exact duplicate rows share a
    bucket — harmless for correctness, negligible for balance.

    `pmod`, not `abs(hash) % n`: `hash` can return Int.MinValue, whose
    Java `abs` overflows back to Int.MinValue, and `%` keeps the
    dividend's sign — a negative salt with no small-side replica would
    silently drop that row from an inner join (~1 in 2^32 rows, i.e.
    real at 100 TB). `pmod` is non-negative by definition.
    """
    salt_expr = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    if hot_keys is not None:
        hot = F.broadcast(hot_keys.select(F.col(key).alias("__hot")))
        big_t = big.join(hot, big[key] == F.col("__hot"), "left").withColumn(
            "__salt",
            F.when(F.col("__hot").isNotNull(), salt_expr).otherwise(F.lit(0)),
        ).drop("__hot")
        small_t = (
            small.join(hot, small[key] == F.col("__hot"), "left")
            .withColumn(
                "__salt",
                F.explode(
                    F.when(
                        F.col("__hot").isNotNull(),
                        F.sequence(F.lit(0), F.lit(num_salts - 1)),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            .drop("__hot")
        )
    else:
        big_t = big.withColumn("__salt", salt_expr)
        small_t = small.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
        )
    out = big_t.join(small_t, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def top_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Cheap hot-key detection: keys with more than `threshold` rows.
    One partial-aggregated count — at 100 TB this is the affordable
    pre-pass that makes targeted salting possible."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > threshold)
        .select(key)
    )
