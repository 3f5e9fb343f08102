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


def test_kmv_state_is_batch_slicing_independent(spark, tmp_path):
    """The KMV sketch state's set-union merge must give the SAME drained
    estimate no matter how the stream is sliced into micro-batches: run
    once over the events as a single file (1 batch) and once split into 4
    files with maxFilesPerTrigger=1 (4 batches); results must be
    identical."""
    from pyspark.sql import functions as F

    from hadoop_spark.streaming.windows import run_to_memory, stateful_kmv_distinct

    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id")
    split_dir = str(tmp_path / "ev_split")
    ev.repartition(4).write.mode("overwrite").parquet(split_dir)

    def drained(stream_df, name):
        got = run_to_memory(
            stateful_kmv_distinct(stream_df), name, output_mode="update"
        )
        return sorted(
            tuple(r)
            for r in got.groupBy("event_type")
            .agg(F.max("est_distinct").alias("est_distinct"))
            .collect()
        )

    one = spark.readStream.schema(ev.schema).parquet(split_dir)
    many = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    assert drained(one, "t_kmv_one") == drained(many, "t_kmv_many")


def test_kmv_state_tolerates_null_user_id(spark, tmp_path):
    """A NULL user_id hashes to NULL -> NaN in the Arrow batch; before the
    r4 fix int(NaN) raised inside update() and killed the streaming query.
    NULLs must be dropped JVM-side and the estimate match the non-null
    distinct count (ADVICE r3)."""
    from pyspark.sql import functions as F

    from hadoop_spark.streaming.windows import run_to_memory, stateful_kmv_distinct

    rows = [("click", 1), ("click", None), ("click", 2), ("view", None)]
    ev = spark.createDataFrame(rows, "event_type string, user_id bigint")
    src = str(tmp_path / "ev_null")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    got = run_to_memory(
        stateful_kmv_distinct(stream), "t_kmv_null", output_mode="update"
    )
    final = {
        r.event_type: r.est_distinct
        for r in got.groupBy("event_type")
        .agg(F.max("est_distinct").alias("est_distinct"))
        .collect()
    }
    # 'view' has only NULL users -> no state row at all; 'click' counts 2
    assert final == {"click": 2}


def test_histogram_state_is_batch_slicing_independent(spark, tmp_path):
    """The streaming histogram's element-wise count-vector addition must
    drain identically whether the stream arrives as 1 batch or 4."""
    from pyspark.sql import functions as F

    from hadoop_spark.streaming.windows import (
        run_to_memory,
        stateful_value_histogram,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value")
    split_dir = str(tmp_path / "ev_split_h")
    ev.repartition(4).write.mode("overwrite").parquet(split_dir)

    def drained(stream_df, name):
        got = run_to_memory(
            stateful_value_histogram(stream_df), name, output_mode="update"
        )
        return sorted(
            tuple(r)
            for r in got.groupBy("event_type", "bin")
            .agg(F.max("n").alias("n"))
            .filter(F.col("n") > 0)
            .collect()
        )

    one = spark.readStream.schema(ev.schema).parquet(split_dir)
    many = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    assert drained(one, "t_vhist_one") == drained(many, "t_vhist_many")


def test_capped_sample_is_batch_slicing_independent(spark, tmp_path):
    """min-K-by-hash state must drain to the SAME kept ids however the
    stream is sliced: 1 batch vs 4 file-batches. (A true reservoir
    sample would fail this — it depends on arrival order.)"""
    from pyspark.sql import functions as F

    from hadoop_spark.streaming.windows import run_to_memory, stateful_capped_sample

    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "ts")
    split_dir = str(tmp_path / "ev_caps_split")
    ev.repartition(4).write.mode("overwrite").parquet(split_dir)

    def drained(stream_df, name):
        got = run_to_memory(
            stateful_capped_sample(stream_df, k=4), name, output_mode="update"
        )
        final = got.groupBy("event_type", "win_start").agg(
            F.max_by("ids", "n_total").alias("ids")
        )
        return sorted(
            (r.event_type, r.win_start, tuple(r.ids)) for r in final.collect()
        )

    one = spark.readStream.schema(ev.schema).parquet(split_dir)
    many = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    assert drained(one, "t_caps_one") == drained(many, "t_caps_many")


def test_streaming_ohlc_is_batch_slicing_independent(spark, tmp_path):
    """Struct-ordered min/max aggregation must drain identical candles for
    1-batch and 4-batch slicings of the same events."""
    from pyspark.sql import functions as F

    from hadoop_spark.streaming.windows import run_to_memory, streaming_ohlc

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    split_dir = str(tmp_path / "ev_ohlc_split")
    ev.repartition(4).write.mode("overwrite").parquet(split_dir)

    def drained(stream_df, name):
        got = run_to_memory(streaming_ohlc(stream_df), name, output_mode="update")
        final = (
            got.groupBy("event_type", "bar")
            .agg(
                F.max_by(
                    F.struct(
                        "open_micro", "high_micro", "low_micro", "close_micro", "n_ticks"
                    ),
                    "n_ticks",
                ).alias("s")
            )
            .select("event_type", "bar", "s.*")
        )
        return sorted(tuple(r) for r in final.collect())

    one = spark.readStream.schema(ev.schema).parquet(split_dir)
    many = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    assert drained(one, "t_ohlc_one") == drained(many, "t_ohlc_many")


def test_stream_bloom_has_no_false_negatives(spark):
    """Every user id that actually occurs for an event type MUST test
    positive in the drained filter — Bloom filters may false-positive,
    never false-negative. The probe panel's first half are real users."""
    import duckdb

    from hadoop_spark.plans import QUERIES, load_all
    from tests.conftest import SF_DIR

    load_all()
    rows = QUERIES["stream_bloom_membership"](spark, SF_DIR).collect()
    assert rows
    con = duckdb.connect()
    present = set(
        con.execute(
            f"""SELECT DISTINCT event_type, user_id
                FROM '{SF_DIR}/events.parquet'
                WHERE user_id IS NOT NULL AND user_id < 10"""
        ).fetchall()
    )
    by_key = {(r.event_type, r.probe_id): r.in_bloom for r in rows}
    for et, uid in present:
        assert by_key[(et, uid)] == 1, (et, uid)
