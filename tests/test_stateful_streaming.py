"""applyInPandasWithState custom stateful operator: the stream's final
per-user state must equal the batch aggregate over the same events (the
unified-API invariant extended to explicit state)."""

from __future__ import annotations

from hadoop_spark.sources.tables import load_table
from hadoop_spark.streaming.windows import (
    batch_user_counts,
    load_events_stream,
    run_to_memory,
    stateful_user_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_final_state_equals_batch_aggregate(spark):
    stream = stateful_user_counts(load_events_stream(spark, SF_DIR))
    got = run_to_memory(stream, "t_stateful_counts", output_mode="update")
    # update mode may emit a row per micro-batch per key; the LAST emit per
    # key is the final state. availableNow over one parquet file = one
    # batch here, but group by key and take max(n_events) to stay robust.
    from pyspark.sql import functions as F

    final = (
        got.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value_micro")).alias("s"))
        .select("user_id", "s.n_events", "s.sum_value_micro")
    )
    want = batch_user_counts(load_table(spark, SF_DIR, "events"))
    got_rows = sorted(tuple(r) for r in final.collect())
    want_rows = sorted(tuple(r) for r in want.collect())
    assert got_rows == want_rows
