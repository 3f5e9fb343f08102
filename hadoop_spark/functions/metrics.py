"""Job counters via `df.observe` — TaskCounter / user-counter parity.

Reference: counters are distributed accumulators aggregated at the master
(`MR-CORE/mapreduce/Counters.java:41`; built-ins `TaskCounter.java:27-42`
like MAP_INPUT_RECORDS / REDUCE_OUTPUT_RECORDS; user counters via
`context.getCounter(group, name).increment(n)`). Spark's `observe` attaches
named aggregate expressions to any point in a plan; they are computed
DURING execution (no extra pass, no extra shuffle) and surfaced through
`pyspark.sql.Observation` — the same "metrics ride the job" design, with
the client printout of `Job.waitForCompletion` (`Job.java:1691`) replaced
by `Observation.get`.

Scale: observed metrics are partial-aggregated per task and merged at the
driver like any aggregate — constant overhead per task, no data movement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_record_counter(df: DataFrame, obs: Observation) -> DataFrame:
    """MAP_INPUT_RECORDS analogue: count rows flowing through this point of
    the plan (attach right after the scan for input counting, before the
    sink for output counting). Read with ``obs.get["records"]`` after an
    action has run."""
    return df.observe(obs, F.count(F.lit(1)).alias("records"))


def with_counters(df: DataFrame, obs: Observation, **metrics: Column) -> DataFrame:
    """User-counter surface: named aggregate expressions evaluated during
    the job — ``with_counters(df, obs, nulls=F.sum(c.isNull().cast("long")))``
    is the declarative ``getCounter(group, "nulls").increment(n)``."""
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()])


def counter(name: str) -> Observation:
    """A named counter group (one Observation per plan attachment point)."""
    return Observation(name)
