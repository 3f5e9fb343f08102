"""Aggregation-framework parity — the reference's declarative aggregate
library (`MR-CORE/mapreduce/lib/aggregate/`, wired by
`ValueAggregatorJob.java:85`): a job is configured with a list of named
aggregator descriptors and one generic map/combine/reduce trio executes them.

Here the registry maps descriptor names to Spark aggregate expressions and
one ``aggregate()`` call builds a single groupBy — Catalyst's HashAggregate
does the partial (combiner) pass map-side automatically, so the shuffle
carries one partial row per (partition, key) exactly like the reference's
combiner-on-spill (`MapTask.java:1057`).

Determinism note: avg/stddev are expanded into exact integer/decimal sums
composed with double arithmetic at the end, so results are independent of
partitioning — see `hadoop_spark/functions/numeric.py`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_spark.functions.numeric import davg, dsum


def _uniq_value_count(col: Column) -> Column:
    # UniqValueCount (`lib/aggregate/UniqValueCount.java:35`): distinct count.
    # The reference caps the in-memory set (maxNumItems); the exact analogue
    # is countDistinct, the bounded-memory analogue approx_count_distinct.
    return F.countDistinct(col)


# Descriptor name → aggregate-expression builder. Names follow the reference
# classes in `lib/aggregate/` (ValueAggregatorBaseDescriptor.java:39-53).
DESCRIPTORS: dict[str, Callable[[Column], Column]] = {
    "LongValueSum": lambda c: F.sum(c.cast("bigint")),
    "DoubleValueSum": lambda c: dsum(c, 6),
    "LongValueMax": lambda c: F.max(c.cast("bigint")),
    "LongValueMin": lambda c: F.min(c.cast("bigint")),
    "DoubleValueMax": lambda c: F.max(c.cast("double")),
    "DoubleValueMin": lambda c: F.min(c.cast("double")),
    "StringValueMax": lambda c: F.max(c.cast("string")),
    "StringValueMin": lambda c: F.min(c.cast("string")),
    "UniqValueCount": _uniq_value_count,
    "ValueCount": lambda c: F.count(c),
    "DoubleValueAvg": lambda c: davg(c, 6),
}


def aggregate(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
) -> DataFrame:
    """Run a list of (descriptor, column, alias) aggregators in ONE pass.

    Mirrors `ValueAggregatorJob`: any number of named aggregators execute in
    a single map/combine/reduce — here a single HashAggregate."""
    exprs = [DESCRIPTORS[d](F.col(c)).alias(a) for d, c, a in specs]
    return df.groupBy(*keys).agg(*exprs)


def register_descriptor(name: str, fn: Callable[[Column], Column]) -> None:
    """UserDefinedValueAggregatorDescriptor parity
    (`lib/aggregate/UserDefinedValueAggregatorDescriptor.java:123`): plug a
    custom aggregator into the registry by name."""
    DESCRIPTORS[name] = fn


def value_histogram(df: DataFrame, key: str, val: str) -> DataFrame:
    """ValueHistogram parity (`lib/aggregate/ValueHistogram.java:38`): per
    key, the distribution of VALUE FREQUENCIES — distinct-value count and
    min/median/max/mean/stddev of how often each value occurs.

    Two cascaded aggregations (both shuffle on progressively smaller data);
    moments are computed from exact integer sums so the result is
    partitioning-independent (stddev_pop's streaming merge is not)."""
    freq = df.groupBy(key, val).agg(F.count(F.lit(1)).alias("freq"))
    n = F.count(F.lit(1))
    s = F.sum("freq")
    s2 = F.sum(F.col("freq") * F.col("freq"))
    mean = s.cast("double") / n.cast("double")
    return freq.groupBy(key).agg(
        n.alias("n_distinct"),
        F.min("freq").alias("min_freq"),
        F.expr("percentile(freq, 0.5)").alias("median_freq"),
        F.max("freq").alias("max_freq"),
        mean.alias("mean_freq"),
        F.sqrt(s2.cast("double") / n.cast("double") - mean * mean).alias("stddev_freq"),
    )
