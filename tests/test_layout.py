"""Z-order layout pruning (operators/layout.py): a z-clustered write must
let footer min/max statistics prune selective scans on BOTH interleaved
columns, where a single-key sort only prunes its own column."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark.operators.layout import file_stats_overlap, write_zordered
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR

N_FILES = 16


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    ck_max = orders.agg(F.max("o_custkey")).collect()[0][0]
    ok_max = orders.agg(F.max("o_orderkey")).collect()[0][0]

    zpath = str(tmp_path / "zorders")
    write_zordered(
        orders, zpath, F.col("o_custkey"), F.col("o_orderkey") / 16, num_files=N_FILES
    )
    # single-key total-order layout: perfect on custkey, useless on orderkey
    spath = str(tmp_path / "sorders")
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # ~10% box filters on each dimension
    ck_hi = max(1, ck_max // 10)
    ok_hi = max(1, ok_max // 10)

    z_ck, z_total = file_stats_overlap(zpath, "o_custkey", 0, ck_hi)
    z_ok, _ = file_stats_overlap(zpath, "o_orderkey", 0, ok_hi)
    s_ck, s_total = file_stats_overlap(spath, "o_custkey", 0, ck_hi)
    s_ok, _ = file_stats_overlap(spath, "o_orderkey", 0, ok_hi)

    assert z_total == N_FILES and s_total == N_FILES
    # z-order prunes meaningfully on BOTH columns
    assert z_ck <= N_FILES * 0.6, f"custkey: {z_ck}/{z_total} files"
    assert z_ok <= N_FILES * 0.6, f"orderkey: {z_ok}/{z_total} files"
    # the single-key sort cannot prune its non-sort column at all
    assert s_ck <= 3  # its own column: near-perfect pruning
    assert s_ok >= N_FILES * 0.9, f"sorted-by-custkey should not prune orderkey ({s_ok})"
    # and the round trip is lossless
    assert spark.read.parquet(zpath).count() == orders.count()
