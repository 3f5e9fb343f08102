"""Event-time window queries on `events` (SURVEY §2.9 extension — the
reference has no streaming model). Batch-mode executions of the SAME
builders the streaming tests run (streaming/windows.py), oracle-checked:
window boundaries reduce to integer epoch-microsecond arithmetic, sessions
to gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_spark.functions.hashing import portable_hash64_sql
from hadoop_spark.functions.numeric import dsum, dsum_sql
from hadoop_spark.plans.catalog import query
from hadoop_spark.sources.tables import load_table
from hadoop_spark.streaming.windows import (
    ATTRIBUTION_US,
    click_purchase_attribution,
    SESSION_GAP_US,
    SLIDE_US,
    TUMBLE_US,
    WATERMARK_DELAY_US,
    keep_first_dedup,
    late_events,
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)

_TUMBLING_ORACLE = f"""
SELECT (epoch_us(ts) // {TUMBLE_US}) * {TUMBLE_US} AS w_start_us,
       event_type,
       COUNT(*) AS n,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("tumbling_window", _TUMBLING_ORACLE)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


_SLIDING_ORACLE = f"""
SELECT (epoch_us(ts) // {SLIDE_US}) * {SLIDE_US} - off AS w_start_us,
       event_type,
       COUNT(*) AS n
FROM events, (SELECT unnest([0, {SLIDE_US}]) AS off)
GROUP BY 1, 2
"""


@query("sliding_window", _SLIDING_ORACLE)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"))


_SESSION_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, value, epoch_us(ts) AS e,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_e
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_e IS NULL OR e - prev_e >= {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY e, new_s ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(e) AS s_start_us,
       MAX(e) + {SESSION_GAP_US} AS s_end_us,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM numbered
GROUP BY user_id, sid
"""


@query("session_window_agg", _SESSION_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_aggregate(load_table(spark, sf_dir, "events"))


_DEDUP_ORACLE = """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id
  ) AS rn
  FROM events
)
WHERE rn = 1
"""


@query("stream_dedup", _DEDUP_ORACLE)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return keep_first_dedup(load_table(spark, sf_dir, "events"))


# Arrival order = a deterministic hash shuffle of event_id: the fixture's
# events are PERFECTLY time-ordered by event_id, under which NO watermark
# ever drops a row (the original event_id-arrival version of this query
# was green-but-vacuous — zero rows at every SF). Hash-shuffled arrival
# models network/partition reordering and exercises the drop path on
# thousands of genuinely late rows.
_ARRIVAL_SQL = "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#arrival'), 1, 15) AS BIGINT)"

_LATE_ORACLE = f"""
WITH wm AS (
  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
         MAX(epoch_us(ts)) OVER (
           ORDER BY {_ARRIVAL_SQL}, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) - {WATERMARK_DELAY_US} AS wm_us
  FROM events
)
SELECT event_id, event_type, ts_us, wm_us - ts_us AS lateness_us
FROM wm WHERE ts_us < wm_us
"""


@query("late_events", _LATE_ORACLE)
def late_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which events a 10-min watermark would drop, replayed in batch over a
    hash-shuffled (out-of-order) arrival sequence. The running max over
    arrival order rides `global_running_max`'s two-level scan (no
    single-partition window anywhere); the real streaming execution is in
    tests/test_streaming.py."""
    from hadoop_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").withColumn(
        "arrival", portable_hash64(F.col("event_id"), salt="#arrival")
    )
    return late_events(ev, "arrival", "event_id").drop("arrival")


_STATEFUL_ORACLE = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_value_micro
FROM events GROUP BY user_id
"""


@query("stateful_running_agg", _STATEFUL_ORACLE)
def stateful_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): runs the
    events stream to completion with availableNow and returns the final
    per-user running state. The oracle is the equivalent batch aggregate —
    the stream's final state MUST equal it (cross-batch state correctness).
    Executes eagerly (a streaming query runs inside); the returned frame is
    the memory-sink final snapshot reduced to one row per key."""
    from pyspark.sql import functions as F

    from hadoop_spark.streaming.windows import (
        load_events_stream,
        run_to_memory,
        stateful_user_counts,
    )

    stream = stateful_user_counts(load_events_stream(spark, sf_dir))
    got = run_to_memory(stream, "q_stateful_running_agg", output_mode="update")
    return (
        got.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value_micro")).alias("s"))
        .select("user_id", "s.n_events", "s.sum_value_micro")
    )


_HIER_ORACLE = f"""
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
       event_type,
       COUNT(*) AS n,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("hierarchical_rollup", _HIER_ORACLE)
def hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: hour-level rollup
    computed FROM minute-level partials, not from raw events — and the
    oracle computes hours directly from raw, so the hash-match PROVES the
    partials reaggregate losslessly (the property that lets a 100 TB
    pipeline maintain minute/hour/day aggregates incrementally, touching
    raw data once). Exactness comes from count/decimal-sum partials
    (always reaggregable), never avg/percentile."""
    minute_us = 60_000_000
    hour_us = 3_600_000_000
    ev = load_table(spark, sf_dir, "events")
    minutes = (
        ev.select(
            ((F.unix_micros("ts") / minute_us).cast("bigint") * minute_us).alias("minute_us"),
            "event_type",
            "value",
        )
        .groupBy("minute_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_dec"),
        )
    )
    return (
        minutes.select(
            ((F.col("minute_us") / hour_us).cast("bigint") * hour_us).alias("hour_us"),
            "event_type",
            "n",
            "sum_dec",
        )
        .groupBy("hour_us", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
    )


_SSJOIN_ORACLE = f"""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) < epoch_us(c.ts) + {ATTRIBUTION_US}
"""


@query("stream_stream_join", _SSJOIN_ORACLE)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the stream-stream interval join
    (streaming/windows.py click_purchase_attribution): purchases attributed
    to same-user clicks within the preceding 30 minutes. Timestamp
    comparisons are exact microsecond arithmetic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(ev, ev)


_INC_MERGE_ORACLE = """
SELECT user_id,
       MAX(event_id) AS v,
       arg_max(value, event_id) AS last_value
FROM events
GROUP BY user_id
"""


@query("incremental_merge", _INC_MERGE_ORACLE)
def incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert into a versioned snapshot (streaming/incremental.py):
    events split into 4 files stream through foreachBatch
    (maxFilesPerTrigger=1 → multiple micro-batches), each batch merging
    keep-latest-by-event_id per user onto the previous snapshot version.
    The final snapshot must equal the batch argmax — which is exactly the
    oracle. Batch retries are idempotent (version dir keyed by batch id)."""
    import os
    import shutil

    from hadoop_spark.streaming.incremental import (
        current_snapshot,
        stream_merge_to_snapshot,
    )

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    base = os.path.join(repo, ".tmp", "incmerge", tag)
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    snap = os.path.join(base, "snapshot")

    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("event_id").alias("v"), F.col("value").alias("last_value")
    )
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_merge_to_snapshot(stream, snap, key="user_id", version_col="v")
    return current_snapshot(spark, snap).select("user_id", "v", "last_value")


_SESSIONIZE_GAP_US = 1_800_000_000  # 30 min

_SESSIONIZE_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id
  FROM events
),
marked AS (
  SELECT user_id, t, event_id,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                   > {_SESSIONIZE_GAP_US}
              OR LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT user_id, t,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY t, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_us
FROM sess GROUP BY user_id, session_id
"""


@query("batch_sessionize", _SESSIONIZE_ORACLE)
def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the lag+cumsum classic: a session break is a
    >30-min gap since the user's previous event; the running sum of breaks
    numbers the sessions; then per-session stats. Batch complement of the
    streaming `session_window_agg` (same gap semantics, reaggregatable
    history). One hash shuffle on user_id; both windows and the final
    groupBy reuse that partitioning."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    # tie-break on event_id: equal timestamps must order identically in
    # both engines or session numbering diverges
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("t").over(w).isNull()
            | ((F.col("t") - F.lag("t").over(w)) > _SESSIONIZE_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t") - F.min("t")).alias("duration_us"),
    )


_TWA_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, value
  FROM events
),
stepped AS (
  SELECT user_id, t, value,
         LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS t_next
  FROM ev
),
areas AS (
  SELECT user_id,
         (t_next - t) AS dt,
         CAST(ROUND(value * 1000) AS BIGINT) AS v_milli
  FROM stepped WHERE t_next IS NOT NULL
)
SELECT user_id,
       CAST(SUM(dt) AS BIGINT) AS span_us,
       CAST(SUM(dt * v_milli) AS BIGINT) AS area_milli_us
FROM areas GROUP BY user_id
"""


@query("time_weighted_avg", _TWA_ORACLE)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted aggregation over IRREGULAR samples (the hypertable
    time_weight idea; no reference analogue): each observation holds its
    value until the next one, so the integral is Σ dt·v over consecutive
    pairs — one per-user window for LEAD, one aggregate. Exact integer
    areas (µs × milli-quantized value) so the result is engine- and
    order-exact; TWA itself = area/span, left to the caller to keep the
    contract integral."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    stepped = ev.withColumn("t_next", F.lead("t").over(w)).filter(
        F.col("t_next").isNotNull()
    )
    # milli (not micro) quantization: dt can reach ~10^12 us between a
    # user's events, so dt*v must stay under 2^63 — milli bounds the area
    # at ~10^18 while keeping the contract exact
    areas = stepped.select(
        "user_id",
        (F.col("t_next") - F.col("t")).alias("dt"),
        F.round(F.col("value") * 1_000).cast("bigint").alias("v_milli"),
    )
    return areas.groupBy("user_id").agg(
        F.sum("dt").cast("bigint").alias("span_us"),
        F.sum(F.col("dt") * F.col("v_milli")).cast("bigint").alias("area_milli_us"),
    )


_HOUR_US = 3_600_000_000

_OHLC_ORACLE = f"""
WITH ev AS (
  SELECT user_id,
         (epoch_us(ts) // {_HOUR_US}) AS bar,
         epoch_us(ts) * 4096 + event_id % 4096 AS k,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro
  FROM events
)
SELECT user_id, bar,
       (MIN(struct_pack(k := k, v := v_micro))).v AS open_micro,
       CAST(MAX(v_micro) AS BIGINT) AS high_micro,
       CAST(MIN(v_micro) AS BIGINT) AS low_micro,
       (MAX(struct_pack(k := k, v := v_micro))).v AS close_micro,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM ev GROUP BY user_id, bar
"""


@query("ohlc_bars", _OHLC_ORACLE)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick downsampling — first/max/min/last per hourly bar
    (the financial rollup; the reference would need a secondary-sorted
    reduce, `EXAMPLES/SecondarySort.java:51`). One hash aggregate:
    open/close are min_by/max_by on a composite (time, event_id) key so
    timestamp ties are deterministic; values micro-quantized for exact
    cross-engine equality."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_micros("ts") / _HOUR_US).cast("bigint").alias("bar"),
        (F.unix_micros("ts") * 4096 + F.col("event_id") % 4096).alias("k"),
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    # min/max over the (k, v_micro) struct, not min_by/max_by on k alone:
    # k can collide (same microsecond ts, event_id equal mod 4096), and on
    # a k-tie min_by is engine/partition-order nondeterministic while the
    # lexicographic struct order stays total.
    return ev.groupBy("user_id", "bar").agg(
        F.min(F.struct("k", "v_micro")).getField("v_micro").alias("open_micro"),
        F.max("v_micro").alias("high_micro"),
        F.min("v_micro").alias("low_micro"),
        F.max(F.struct("k", "v_micro")).getField("v_micro").alias("close_micro"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


_WEEK_US = 7 * 86_400_000_000

_COHORT_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week
  FROM events
),
first_week AS (
  SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY user_id
),
activity AS (SELECT DISTINCT user_id, week FROM ev)
SELECT f.cohort,
       CAST(a.week - f.cohort AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM activity a JOIN first_week f ON a.user_id = f.user_id
GROUP BY f.cohort, week_offset
"""


@query("cohort_retention", _COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — users grouped by first-activity week, counted
    distinct per week offset since their cohort. Two aggregates over the
    same user_id partitioning (first-week, then the offset rollup); the
    cohort table is user-cardinality and broadcastable at any realistic
    user count."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_micros("ts") / _WEEK_US).cast("bigint").alias("week")
    )
    first_week = ev.groupBy("user_id").agg(F.min("week").alias("cohort"))
    activity = ev.distinct()
    return (
        activity.join(first_week, "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
FROM firsts
"""


@query("funnel_counts", _FUNNEL_ORACLE)
def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase on FIRST occurrences):
    one conditional-min aggregate per user collapses the event log to a
    step-timestamp row, then a single scalar rollup counts each ordered
    prefix. Two aggregates total, no self-joins — the funnel shape that
    survives a 100 TB event log."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )

    def first_of(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("t")))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("int")).cast("bigint").alias("step_view"),
        F.sum(clicked.cast("int")).cast("bigint").alias("step_click"),
        F.sum(purchased.cast("int")).cast("bigint").alias("step_purchase"),
    )


_ENRICH_ORACLE = f"""
SELECT (epoch_us(e.ts) // {TUMBLE_US}) * {TUMBLE_US} AS w_start_us,
       c.c_mktsegment AS segment,
       COUNT(*) AS n,
       {dsum_sql('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


@query("stream_static_enrich", _ENRICH_ORACLE)
def stream_static_enrich_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: events joined to the broadcast
    customer dim, aggregated per (tumbling window, market segment). The
    zero-state streaming-join shape — the static side is re-read per
    micro-batch, no join state accumulates; the streaming execution of the
    SAME builder is asserted equal to this batch plan in
    tests/test_streaming.py::test_stream_static_enrich_equals_batch."""
    from hadoop_spark.streaming.windows import stream_static_enrich

    return stream_static_enrich(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


_KMV_STREAM_K = 64
_KMV_STREAM_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {portable_hash64_sql('user_id', salt='#kmv')} AS h
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
),
per_key AS (
  SELECT event_type,
         MAX(rn) AS n_seen,
         MAX(CASE WHEN rn = {_KMV_STREAM_K} THEN h END) AS kth
  FROM ranked WHERE rn <= {_KMV_STREAM_K}
  GROUP BY event_type
)
SELECT event_type,
       CAST(CASE WHEN n_seen < {_KMV_STREAM_K} THEN n_seen
                 ELSE CAST(FLOOR(({_KMV_STREAM_K} - 1)
                      * 1152921504606846975.0 / kth) AS BIGINT)
            END AS BIGINT) AS est_distinct
FROM per_key
"""


@query("stream_kmv_distinct", _KMV_STREAM_ORACLE)
def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-user estimate per event type: the KMV sketch as
    applyInPandasWithState keyed state (set-union merge — commutative and
    idempotent, so batch slicing cannot change the drained result), hash-
    checked against the batch KMV oracle. The estimate is monotone
    nondecreasing across updates, so the final state is the max."""
    from hadoop_spark.streaming.windows import (
        load_events_stream,
        run_to_memory,
        stateful_kmv_distinct,
    )

    stream = stateful_kmv_distinct(
        load_events_stream(spark, sf_dir), k=_KMV_STREAM_K
    )
    got = run_to_memory(stream, "q_stream_kmv_distinct", output_mode="update")
    return got.groupBy("event_type").agg(
        F.max("est_distinct").alias("est_distinct")
    )


_KMV_WIN_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS win_start,
         {portable_hash64_sql('user_id', salt='#kmvw')} AS h
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT event_type, win_start, h,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, win_start ORDER BY h
         ) AS rn
  FROM hashed
),
per_key AS (
  SELECT event_type, win_start,
         MAX(rn) AS n_seen,
         MAX(CASE WHEN rn = {_KMV_STREAM_K} THEN h END) AS kth
  FROM ranked WHERE rn <= {_KMV_STREAM_K}
  GROUP BY event_type, win_start
)
SELECT event_type, CAST(epoch_us(win_start) AS BIGINT) AS win_us,
       CAST(CASE WHEN n_seen < {_KMV_STREAM_K} THEN n_seen
                 ELSE CAST(FLOOR(({_KMV_STREAM_K} - 1)
                      * 1152921504606846975.0 / kth) AS BIGINT)
            END AS BIGINT) AS est_distinct
FROM per_key
"""


@query("stream_windowed_kmv", _KMV_WIN_ORACLE)
def stream_windowed_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per (event_type, hour window) over the stream — the
    KMV sketch as windowed keyed state (window assigned JVM-side before
    the state operator), drained and checked against the batch KMV
    bit-for-bit."""
    from hadoop_spark.streaming.windows import (
        load_events_stream,
        run_to_memory,
        stateful_windowed_kmv,
    )

    stream = stateful_windowed_kmv(
        load_events_stream(spark, sf_dir), k=_KMV_STREAM_K
    )
    got = run_to_memory(stream, "q_stream_windowed_kmv", output_mode="update")
    # win_start leaves as epoch µs: a raw TIMESTAMP column renders in the
    # OS timezone on plain collect() (TimestampType.fromInternal uses the
    # local clock), which broke the TZ-swept contract — integers don't.
    return got.groupBy("event_type", F.unix_micros("win_start").alias("win_us")).agg(
        F.max("est_distinct").alias("est_distinct")
    )


_SESSION_FUNNEL_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type, epoch_us(ts) AS e,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_e
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_e IS NULL OR e - prev_e >= {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
numbered AS (
  SELECT *, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY e, new_s ROWS UNBOUNDED PRECEDING
  ) AS sid
  FROM marked
),
sessions AS (
  SELECT user_id, sid,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(CASE WHEN event_type = 'click' THEN e END) AS first_click_us,
         MAX(CASE WHEN event_type = 'purchase' THEN e END) AS last_purch_us
  FROM numbered GROUP BY user_id, sid
),
flagged AS (
  SELECT CASE WHEN n_events = 1 THEN '1'
              WHEN n_events <= 3 THEN '2-3'
              WHEN n_events <= 7 THEN '4-7'
              ELSE '8+' END AS size_bucket,
         CASE WHEN first_click_us IS NOT NULL
                   AND last_purch_us IS NOT NULL
                   AND first_click_us <= last_purch_us
              THEN 1 ELSE 0 END AS converted
  FROM sessions
)
SELECT size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS conversion_rate
FROM flagged GROUP BY size_bucket
"""


@query("session_funnel_pipeline", _SESSION_FUNNEL_ORACLE)
def session_funnel_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end event analytics in ONE plan (the events-side analog of
    `pretrain_mix`'s chained-stages contract): gap-sessionize -> per-
    session click->purchase conversion (ordered: the click must precede
    the last purchase IN the session) -> session-size-bucket rollup with
    conversion rates. The oracle replays the whole chain, so a stage-
    ordering bug (flag before sessionize, bucket before flag) cannot
    hash-match. Shuffle profile: one user-keyed window + two bounded
    aggregations; conversion uses min/max epoch comparisons, never a
    per-session self-join."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = F.unix_micros("ts")
    marked = ev.select(
        "user_id",
        "event_type",
        e.alias("e"),
        F.when(
            F.lag(e).over(w).isNull()
            | ((e - F.lag(e).over(w)) >= SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("e", "new_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn("sid", F.sum("new_s").over(wc))
    sessions = numbered.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.when(F.col("event_type") == "click", F.col("e"))).alias(
            "first_click_us"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("e"))).alias(
            "last_purch_us"
        ),
    )
    bucket = (
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") <= 3, "2-3")
        .when(F.col("n_events") <= 7, "4-7")
        .otherwise("8+")
    )
    converted = F.when(
        F.col("first_click_us").isNotNull()
        & F.col("last_purch_us").isNotNull()
        & (F.col("first_click_us") <= F.col("last_purch_us")),
        1,
    ).otherwise(0)
    flagged = sessions.select(
        bucket.alias("size_bucket"), converted.alias("converted")
    )
    return flagged.groupBy("size_bucket").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        # r10 audit: raw IEEE rate of exact int64 counts.
        (
            F.sum("converted").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


_VALIDITY_ORACLE = """
SELECT user_id, event_id, value,
       epoch_us(ts) AS valid_from_us,
       LEAD(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ) AS valid_to_us
FROM events
"""


@query("validity_intervals", _VALIDITY_ORACLE)
def validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: each per-user observation becomes a validity
    interval [its timestamp, the next observation's timestamp), open-ended
    (NULL) for the current row — the dimension-table shape an as-of join
    consumes (`asof_join_events` is the read side of this write side).
    One keyed window, no self-join; at 100 TB each user's history sorts
    within its hash partition."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = F.unix_micros("ts")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        e.alias("valid_from_us"),
        F.lead(e).over(w).alias("valid_to_us"),
    )


_TOP_MOVERS_ORACLE = f"""
WITH halves AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'a' ELSE 'b' END
           AS half,
         value
  FROM events
),
agg AS (
  SELECT event_type,
         {dsum_sql("CASE WHEN half = 'a' THEN value END", 4)} AS rev_a,
         {dsum_sql("CASE WHEN half = 'b' THEN value END", 4)} AS rev_b,
         CAST(SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM halves GROUP BY event_type
)
SELECT event_type, rev_a, rev_b,
       CAST(CAST(COALESCE(rev_b, 0) - COALESCE(rev_a, 0)
            AS DECIMAL(18,4)) AS DOUBLE) AS delta,
       CAST(ROW_NUMBER() OVER (
         ORDER BY ABS(COALESCE(rev_b, 0) - COALESCE(rev_a, 0)) DESC,
                  event_type
       ) AS BIGINT) AS move_rank
FROM agg
"""


@query("top_movers", _TOP_MOVERS_ORACLE)
def top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period movers: first-half vs second-half revenue per
    event type in ONE conditional-aggregation pass (never two scans or a
    self-join), delta-ranked. The rank window runs over |event types|
    rows — group-sized, not data-sized."""
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "a"
    ).otherwise("b")
    agg = ev.select("event_type", half.alias("half"), "value").groupBy(
        "event_type"
    ).agg(
        dsum(F.when(F.col("half") == "a", F.col("value")), 4).alias("rev_a"),
        dsum(F.when(F.col("half") == "b", F.col("value")), 4).alias("rev_b"),
    )
    delta = (
        (F.coalesce(F.col("rev_b"), F.lit(0.0)) - F.coalesce(F.col("rev_a"), F.lit(0.0)))
        .cast("decimal(18,4)")
        .cast("double")
    )
    from pyspark.sql import Window

    wr = Window.orderBy(
        F.abs(
            F.coalesce(F.col("rev_b"), F.lit(0.0))
            - F.coalesce(F.col("rev_a"), F.lit(0.0))
        ).desc(),
        "event_type",
    )
    return agg.select(
        "event_type",
        "rev_a",
        "rev_b",
        delta.alias("delta"),
        F.row_number().over(wr).cast("bigint").alias("move_rank"),
    )


_VHIST_BINS = 20
_VHIST_WIDTH = 25.0

_VHIST_STREAM_ORACLE = f"""
SELECT event_type,
       CAST(LEAST({_VHIST_BINS - 1},
                  GREATEST(0, CAST(FLOOR(value / {_VHIST_WIDTH}) AS INTEGER)))
            AS INTEGER) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2
"""


@query("stream_value_histogram", _VHIST_STREAM_ORACLE)
def stream_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key equi-width value histogram via keyed state
    (element-wise count-vector addition — slicing-independent), drained
    and checked bit-for-bit against the batch GROUP BY. Empty bins are
    dropped on both sides (a bin that never saw a row has no batch
    row either)."""
    from hadoop_spark.streaming.windows import (
        load_events_stream,
        run_to_memory,
        stateful_value_histogram,
    )

    stream = stateful_value_histogram(
        load_events_stream(spark, sf_dir), lo=0.0, width=_VHIST_WIDTH, nbins=_VHIST_BINS
    )
    got = run_to_memory(stream, "q_stream_value_histogram", output_mode="update")
    return (
        got.groupBy("event_type", "bin")
        .agg(F.max("n").alias("n"))
        .filter(F.col("n") > 0)
    )


_ROLL_WIN_S = 3600

_ROLLING_ORACLE = f"""
WITH sec AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
  FROM events WHERE user_id IS NOT NULL
), rolled AS (
  SELECT user_id, t,
         CAST(COUNT(*) OVER (
           PARTITION BY user_id ORDER BY t
           RANGE BETWEEN {_ROLL_WIN_S} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS c
  FROM sec
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(c) AS BIGINT) AS peak_1h,
       CAST(MIN(CASE WHEN c = mc THEN t END) AS BIGINT) AS peak_at_s
FROM (SELECT *, MAX(c) OVER (PARTITION BY user_id) AS mc FROM rolled)
GROUP BY user_id
"""


@query("rolling_1h_count", _ROLLING_ORACLE)
def rolling_1h_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak hourly activity per user via a RANGE-frame window (interval
    frames — the window surface ROWS frames cannot express: the frame is
    "all events within the trailing 3600 s", however many rows that is;
    equal timestamps enter the frame together on both engines, so the
    count is deterministic without a tiebreak). One user-keyed window
    pass + one per-user rollup; epoch seconds are exact BIGINTs."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sec = events.select(
        "user_id", (F.unix_micros("ts") / 1_000_000).cast("bigint").alias("t")
    )
    from pyspark.sql import Window as W

    wr = (
        W.partitionBy("user_id").orderBy("t").rangeBetween(-_ROLL_WIN_S, 0)
    )
    rolled = sec.withColumn("c", F.count(F.lit(1)).over(wr))
    wm = W.partitionBy("user_id")
    return (
        rolled.withColumn("mc", F.max("c").over(wm))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("c").alias("peak_1h"),
            F.min(F.when(F.col("c") == F.col("mc"), F.col("t"))).alias("peak_at_s"),
        )
    )


_OHLC_STREAM_ORACLE = f"""
WITH ev AS (
  SELECT event_type,
         (epoch_us(ts) // {_HOUR_US}) AS bar,
         epoch_us(ts) * 4096 + event_id % 4096 AS k,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro
  FROM events
)
SELECT event_type, bar,
       (MIN(struct_pack(k := k, v := v_micro))).v AS open_micro,
       CAST(MAX(v_micro) AS BIGINT) AS high_micro,
       CAST(MIN(v_micro) AS BIGINT) AS low_micro,
       (MAX(struct_pack(k := k, v := v_micro))).v AS close_micro,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM ev GROUP BY event_type, bar
"""


@query("stream_ohlc", _OHLC_STREAM_ORACLE)
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candles computed BY THE STREAMING ENGINE (update-mode window
    aggregation over struct-ordered min/max — commutative, so micro-batch
    slicing cannot change the result), drained and checked against the
    batch arg_min/arg_max oracle bit-for-bit. The streaming twin of
    `ohlc_bars`."""
    from hadoop_spark.streaming.windows import (
        load_events_stream,
        run_to_memory,
        streaming_ohlc,
    )

    stream = streaming_ohlc(load_events_stream(spark, sf_dir))
    got = run_to_memory(stream, "q_stream_ohlc", output_mode="update")
    final = got.groupBy("event_type", "bar").agg(
        F.max_by(
            F.struct("open_micro", "high_micro", "low_micro", "close_micro", "n_ticks"),
            "n_ticks",
        ).alias("s")
    )
    return final.select(
        "event_type",
        "bar",
        F.col("s.open_micro").alias("open_micro"),
        F.col("s.high_micro").alias("high_micro"),
        F.col("s.low_micro").alias("low_micro"),
        F.col("s.close_micro").alias("close_micro"),
        F.col("s.n_ticks").alias("n_ticks"),
    )


_CAPPED_K = 8

_CAPPED_SAMPLE_ORACLE = f"""
WITH hashed AS (
  SELECT event_type, date_trunc('hour', ts) AS win_start, event_id,
         {portable_hash64_sql('event_id', salt='#caps')} AS h
  FROM events
),
ranked AS (
  SELECT event_type, win_start, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, win_start ORDER BY h, event_id
         ) AS rn
  FROM hashed
)
SELECT event_type, CAST(epoch_us(win_start) AS BIGINT) AS win_us, event_id
FROM ranked WHERE rn <= {_CAPPED_K}
"""


@query("stream_capped_sample", _CAPPED_SAMPLE_ORACLE)
def stream_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-(event_type, hour) K-row sample maintained as
    streaming keyed state (min-K by portable hash — the replayable,
    slicing-independent form of windowed reservoir sampling). Drained
    final states are exploded to the kept event ids and hash-checked
    against the batch min-K oracle."""
    from hadoop_spark.streaming.windows import (
        load_events_stream,
        run_to_memory,
        stateful_capped_sample,
    )

    stream = stateful_capped_sample(load_events_stream(spark, sf_dir), k=_CAPPED_K)
    got = run_to_memory(stream, "q_stream_capped_sample", output_mode="update")
    final = got.groupBy("event_type", "win_start").agg(
        F.max_by("ids", "n_total").alias("ids")
    )
    return final.select(
        "event_type",
        F.unix_micros("win_start").alias("win_us"),
        F.explode("ids").alias("event_id"),
    )


# ----------------------------------------------------------------------
# concurrent_sessions — interval-coverage analytics: for every hour, how
# many (user) sessions were ACTIVE during it — the load curve a capacity
# planner reads. The classic global sweep-line (sort ALL +1/-1 deltas,
# running sum) is a single-partition scan of data-sized input; the
# scalable decomposition EXPLODES each session into the hours it covers
# (fan-out bounded by session duration / hour — sessions are gap-bounded
# so this is small and data-independent) and counts per hour: one keyed
# window for sessionization (reused partitioning), one bounded (hours)
# aggregation, no global sort anywhere.
# ----------------------------------------------------------------------

_CONCURRENT_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id FROM events
),
marked AS (
  SELECT user_id, t, event_id,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                   > {_SESSIONIZE_GAP_US}
              OR LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sess AS (
  SELECT user_id,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY t, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id,
         t
  FROM marked
),
bounds AS (
  SELECT user_id, session_id,
         MIN(t) // 3600000000 AS h0, MAX(t) // 3600000000 AS h1
  FROM sess GROUP BY user_id, session_id
),
covered AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM bounds
)
SELECT CAST(hour AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM covered GROUP BY hour
"""


@query("concurrent_sessions", _CONCURRENT_ORACLE)
def concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            (F.col("t") - F.lag("t").over(w) > _SESSIONIZE_GAP_US)
            | F.lag("t").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.floor(F.min("t") / 3_600_000_000).alias("h0"),
        F.floor(F.max("t") / 3_600_000_000).alias("h1"),
    )
    covered = bounds.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    return covered.groupBy(F.col("hour").cast("bigint").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ----------------------------------------------------------------------
# activity_heatmap — the (day-of-week × hour-of-day) activity matrix.
# Day-of-week comes from pure integer epoch arithmetic ((days + 4) % 7:
# 1970-01-01 was a Thursday; 0 = Sunday) rather than either engine's
# date-part convention, so the cell keys are engine-independent by
# construction; one bounded (7 × 24) aggregation.
# ----------------------------------------------------------------------

_HEATMAP_ORACLE = f"""
WITH t AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hod,
         value
  FROM events
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql("value")} AS sum_value
FROM t GROUP BY dow, hod
"""


@query("activity_heatmap", _HEATMAP_ORACLE)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = F.unix_micros("ts")
    return ev.groupBy(
        ((F.floor(e / 86_400_000_000) + 4) % 7).cast("bigint").alias("dow"),
        F.floor((e % 86_400_000_000) / 3_600_000_000).cast("bigint").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("sum_value"),
    )


# ----------------------------------------------------------------------
# user_growth — the cumulative-adoption curve: per day, how many users
# were seen for the FIRST time, and the running total. First-seen day is
# one per-user min; the cumulative sum windows over the DAY-count-sized
# aggregate (not user-sized, not event-sized) — at any scale the window
# input is |days| rows, so the single-partition frame is domain-bounded
# (the quantile_normalize argument).
# ----------------------------------------------------------------------

_GROWTH_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS d0
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
daily AS (
  SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY d0
)
SELECT CAST(day AS BIGINT) AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM daily
"""


@query("user_growth", _GROWTH_ORACLE)
def user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    first_seen = ev.groupBy("user_id").agg(
        F.floor(F.min(F.unix_micros("ts")) / 86_400_000_000).alias("d0")
    )
    daily = first_seen.groupBy(F.col("d0").cast("bigint").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    return daily.withColumn(
        "cum_users", F.sum("new_users").over(Window.orderBy("day")).cast("bigint")
    )


# ----------------------------------------------------------------------
# stream_heavy_hitters — the skew diagnosis as a STREAM: per-user event
# counts maintained by the engine's streaming aggregation (sum — 
# commutative, so micro-batch slicing cannot change the drained counts),
# heavy keys selected at drain time against the final total with the
# same exact integer threshold as the batch `heavy_hitters`
# (cnt·nkeys > 2·total). The always-on form of "which keys will skew my
# next join".
# ----------------------------------------------------------------------

_STREAM_HH_ORACLE = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nkeys, CAST(SUM(cnt) AS BIGINT) AS total
  FROM c
)
SELECT user_id, cnt FROM c, s WHERE cnt * nkeys * 10 > 11 * total
"""


@query("stream_heavy_hitters", _STREAM_HH_ORACLE)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.streaming.windows import load_events_stream, run_to_memory

    stream = (
        load_events_stream(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = run_to_memory(stream, "q_stream_heavy_hitters", output_mode="update")
    # update mode re-emits a key per batch; the final count per key is the
    # max (counts are monotone nondecreasing)
    counts = got.groupBy("user_id").agg(F.max("cnt").alias("cnt"))
    from hadoop_spark.sources.tables import shared

    counts = shared(counts)
    stats = counts.agg(
        F.count(F.lit(1)).alias("nkeys"), F.sum("cnt").alias("total")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        # 10% above the mean: the fixture's per-user load is near-uniform,
        # so the old 2x-mean cut matched nothing at any SF (vacuous green)
        .filter(F.col("cnt") * F.col("nkeys") * 10 > 11 * F.col("total"))
        .select("user_id", "cnt")
    )


# ----------------------------------------------------------------------
# rolling_active_users — DAU / WAU / stickiness: per day, the distinct
# users active that day and in the trailing 7 days. Exact sliding-window
# COUNT DISTINCT does not decompose into window aggregates; the scalable
# exact form explodes each (user, active-day) fact into the ≤7 following
# days it keeps the user "weekly active" for (bounded fan-out, data-
# independent) and counts distinct per day — two bounded-key shuffles,
# no data-sized window state. Stickiness = one IEEE division of exact
# counts.
# ----------------------------------------------------------------------

_RAU_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL
),
span AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ud),
contrib AS (
  SELECT DISTINCT u.user_id, d.day
  FROM ud u
  CROSS JOIN span s
  JOIN LATERAL (
    SELECT unnest(generate_series(u.day, LEAST(u.day + 6, s.dmax))) AS day
  ) d ON TRUE
),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
),
wau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM contrib GROUP BY day
)
SELECT CAST(w.day AS BIGINT) AS day,
       COALESCE(d.dau, 0) AS dau,
       w.wau,
       (CAST(COALESCE(d.dau, 0) AS DOUBLE) / CAST(w.wau AS DOUBLE))
         AS stickiness
FROM wau w LEFT JOIN dau d ON w.day = d.day
"""


@query("rolling_active_users", _RAU_ORACLE)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_spark.sources.tables import shared

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ud = shared(
        ev.select(
            "user_id",
            F.floor(F.unix_micros("ts") / 86_400_000_000).alias("day"),
        ).distinct()
    )
    dmax = ud.agg(F.max("day").alias("dmax"))
    contrib = (
        ud.crossJoin(F.broadcast(dmax))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"), F.least(F.col("day") + 6, F.col("dmax"))
                )
            ).alias("day"),
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = contrib.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return (
        wau.join(dau, "day", "left")
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0).cast("bigint")).alias("dau"),
            "wau",
            (
                F.coalesce(F.col("dau"), F.lit(0).cast("bigint")).cast("double")
                / F.col("wau").cast("double")
            ).alias("stickiness"),
        )
    )


# ----------------------------------------------------------------------
# stream_bloom_membership — the streaming Bloom filter drained into a
# membership probe: per event type, a 1008-bit filter over user ids is
# built in keyed state (bit-OR — commutative and idempotent, the
# replay-proof state algebra), then a fixed probe panel (10 user ids
# that exist, 10 that don't) is tested against the drained filter. The
# oracle rebuilds bit membership relationally: a probe's bit is set iff
# SOME user's hash landed on it — so a false positive is REPRODUCED
# identically by both engines, not smoothed over. Completes the
# streaming state-algebra trio: KMV set-union, count-vector addition,
# bit-OR.
# ----------------------------------------------------------------------

_BLOOM_ST_BITS = 16 * 63
_BLOOM_PROBES = list(range(10)) + [10_000_000 + i for i in range(10)]

_BLOOM_ST_ORACLE = f"""
WITH bits AS (
  SELECT DISTINCT event_type,
         {portable_hash64_sql('user_id', salt='#bl0')} % {_BLOOM_ST_BITS} AS b
  FROM events WHERE user_id IS NOT NULL
  UNION
  SELECT DISTINCT event_type,
         {portable_hash64_sql('user_id', salt='#bl1')} % {_BLOOM_ST_BITS} AS b
  FROM events WHERE user_id IS NOT NULL
), probes AS (
  SELECT e.event_type, CAST(p.v AS BIGINT) AS probe_id,
         {portable_hash64_sql('p.v', salt='#bl0')} % {_BLOOM_ST_BITS} AS p0,
         {portable_hash64_sql('p.v', salt='#bl1')} % {_BLOOM_ST_BITS} AS p1
  FROM (SELECT DISTINCT event_type FROM events WHERE user_id IS NOT NULL) e
  CROSS JOIN (SELECT unnest({_BLOOM_PROBES!r}) AS v) p
)
SELECT pr.event_type, pr.probe_id,
       CASE WHEN EXISTS (SELECT 1 FROM bits b
                         WHERE b.event_type = pr.event_type AND b.b = pr.p0)
             AND EXISTS (SELECT 1 FROM bits b
                         WHERE b.event_type = pr.event_type AND b.b = pr.p1)
            THEN 1 ELSE 0 END AS in_bloom
FROM probes pr
"""


@query("stream_bloom_membership", _BLOOM_ST_ORACLE)
def stream_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drained streaming Bloom filter probed by a fixed member/non-member panel."""
    from hadoop_spark.functions.hashing import portable_hash64
    from hadoop_spark.streaming.windows import (
        _BLOOM_WORDS_ST,
        load_events_stream,
        run_to_memory,
        stateful_bloom_membership,
    )

    stream = stateful_bloom_membership(load_events_stream(spark, sf_dir))
    got = run_to_memory(stream, "q_stream_bloom", output_mode="update")
    final = got.groupBy("event_type").agg(
        *[F.max(f"w{i}").alias(f"w{i}") for i in range(_BLOOM_WORDS_ST)]
    )
    probes = final.select(
        "event_type",
        *[F.col(f"w{i}") for i in range(_BLOOM_WORDS_ST)],
        F.explode(
            F.array(*[F.lit(p).cast("bigint") for p in _BLOOM_PROBES])
        ).alias("probe_id"),
    )
    p0 = portable_hash64(F.col("probe_id"), salt="#bl0") % _BLOOM_ST_BITS
    p1 = portable_hash64(F.col("probe_id"), salt="#bl1") % _BLOOM_ST_BITS
    arr = "array(" + ", ".join(f"w{i}" for i in range(_BLOOM_WORDS_ST)) + ")"
    withp = probes.withColumn("p0", p0).withColumn("p1", p1)

    def bit_set(col: str) -> str:
        # shiftright with a COLUMN bit count only exists in SQL form
        return (
            f"(shiftright(element_at({arr}, CAST({col} / 63 AS INT) + 1),"
            f" CAST({col} % 63 AS INT)) & 1L) = 1L"
        )

    return withp.select(
        "event_type",
        "probe_id",
        F.when(
            F.expr(bit_set("p0")) & F.expr(bit_set("p1")), 1
        ).otherwise(0).alias("in_bloom"),
    )
