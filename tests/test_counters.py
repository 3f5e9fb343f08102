"""Counter parity (`Counters.java:41`, `TaskCounter.java:27-42`): observed
metrics must ride the job and report exact record counts, including the
MAP_INPUT_RECORDS / skipped-records pair for the bad-record wrapper."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.functions.metrics import counter, with_counters, with_record_counter
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_record_counter_counts_scan_rows(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    obs = counter("map_input")
    counted = with_record_counter(li, obs)
    out = counted.groupBy("l_returnflag").count()
    out.collect()
    assert obs.get["records"] == li.count()


def test_user_counters_skipped_records(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    qty_str = F.when(
        F.col("l_orderkey") % 97 == 0,
        F.concat(F.col("l_quantity").cast("string"), F.lit("x")),
    ).otherwise(F.col("l_quantity").cast("string"))
    parsed = li.select(qty_str.alias("qty_str")).select(
        F.expr("try_cast(qty_str AS DOUBLE)").alias("qty")
    )
    obs = counter("skip_group")
    counted = with_counters(
        parsed,
        obs,
        total=F.count(F.lit(1)),
        skipped=F.sum(F.col("qty").isNull().cast("long")),
    )
    counted.agg(F.sum("qty")).collect()
    want_skipped = li.filter(F.col("l_orderkey") % 97 == 0).count()
    assert obs.get["total"] == li.count()
    assert obs.get["skipped"] == want_skipped
