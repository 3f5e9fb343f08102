"""Total-order invariants (FIXTURES invariant 1, `TeraValidate.java:52` /
`SortValidator.java:54`): the distributed validator must pass sorted output,
FAIL unsorted data, and the sort must preserve the input multiset."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.operators.sort import sorted_run_check, total_order
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_validator_passes_sorted_output(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    out = total_order(li, "l_orderkey", "l_linenumber")
    parts, violations = sorted_run_check(out, "l_orderkey", "l_linenumber")
    assert parts >= 1
    assert violations == 0


def test_validator_detects_unsorted_input(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey").repartition(8)
    # raw repartitioned data is interleaved: the checker must notice
    parts, violations = sorted_run_check(li, "l_orderkey")
    assert violations > 0


def test_sort_preserves_multiset(spark):
    """SortValidator semantics: output multiset == input multiset, via an
    order-independent checksum (sum + count + xor-of-hashes), computed
    distributed on both sides."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    out = total_order(li, "l_orderkey")

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("s"),
            F.sum(F.hash("l_orderkey").cast("bigint")).alias("h"),
        ).collect()[0]
        return (r.n, r.s, r.h)

    assert sig(li) == sig(out)


def test_key_slice_partitioning_colocates_prefixes(spark):
    from pyspark.sql import functions as F

    from hadoop_spark.operators.sort import partition_by_key_slice

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.concat(F.col("l_returnflag"), F.col("l_linestatus"), F.col("l_orderkey").cast("string")).alias("key")
    )
    parted = partition_by_key_slice(li, "key", 1, 2, 8)
    # every distinct 2-char prefix must map to exactly one partition
    check = (
        parted.select(F.substring("key", 1, 2).alias("p"), F.spark_partition_id().alias("pid"))
        .groupBy("p")
        .agg(F.countDistinct("pid").alias("n_pids"))
    )
    assert check.filter(F.col("n_pids") > 1).count() == 0


def test_global_running_max_matches_single_partition_window(spark):
    """Two-level prefix max == the single-partition exclusive window it
    replaces, on a shuffled-arrival events sample (the late_events
    shape), including the NULL for the very first global row."""
    from pyspark.sql import Window

    from hadoop_spark.operators.sort import global_running_max

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", F.unix_micros("ts").alias("v"))
        .withColumn("arr", F.hash("event_id").cast("bigint"))
        .limit(5000)
    )
    got = global_running_max(ev, "v", "arr", "event_id", out="m")
    w = Window.orderBy("arr", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = ev.withColumn("m", F.max("v").over(w))
    cols = ["event_id", "m"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_global_running_max_inclusive(spark):
    from pyspark.sql import Window

    from hadoop_spark.operators.sort import global_running_max

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", F.col("value").alias("v"))
        .limit(2000)
    )
    got = global_running_max(ev, "v", "event_id", out="m", inclusive=True)
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    want = ev.withColumn("m", F.max("v").over(w))
    assert sorted(map(tuple, got.select("event_id", "m").collect())) == sorted(
        map(tuple, want.select("event_id", "m").collect())
    )
