"""distcp / compact / small-file coalescing / salted join: utility parity
with the reference's tooling layer, asserted on real files and plans."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from hadoop_spark.operators.skew import salted_join, top_keys
from hadoop_spark.sources.formats import compact, distcp
from hadoop_spark.sources.tables import load_table
from tests.conftest import SF_DIR

SCRATCH = "/root/repo/.tmp/io_utils"


@pytest.fixture(autouse=True, scope="module")
def _clean():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    yield
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_distcp_copies_all_files(spark):
    src = f"{SCRATCH}/src"
    load_table(spark, SF_DIR, "nation").repartition(3).write.parquet(src)
    n_src = len(glob.glob(f"{src}/*.parquet"))
    copied = distcp(spark, src, f"{SCRATCH}/dst")
    assert copied >= n_src  # binaryFile sees data files (+ any committer marker)
    back = spark.read.parquet(f"{SCRATCH}/dst")
    assert back.count() == copied
    # bytes survive: total content length equals total source file size
    import os

    src_bytes = sum(os.path.getsize(p) for p in glob.glob(f"{src}/*") if os.path.isfile(p))
    got_bytes = back.select(F.sum(F.length("content"))).collect()[0][0]
    assert got_bytes >= src_bytes  # marker files add, never subtract


def test_compact_reduces_file_count(spark):
    df = load_table(spark, SF_DIR, "lineitem").repartition(24)
    many = f"{SCRATCH}/many"
    df.write.parquet(many)
    assert len(glob.glob(f"{many}/*.parquet")) == 24
    few = f"{SCRATCH}/few"
    compact(spark.read.parquet(many), few, target_files=2)
    assert len(glob.glob(f"{few}/*.parquet")) == 2
    assert spark.read.parquet(few).count() == df.count()


def test_small_files_coalesce_into_few_splits(spark):
    """CombineFileInputFormat parity: many tiny files must NOT become one
    scan partition each — the DataSource packs them into splits of
    max(openCostInBytes, bytesPerCore). openCostInBytes is the same knob
    as the reference's rack-aware split packing threshold
    (`lib/input/CombineFileInputFormat.java:84`); the default 4 MB open
    cost is sized for real clusters, so for this KB-scale fixture we lower
    it to see the packing behavior itself."""
    tiny = f"{SCRATCH}/tiny"
    load_table(spark, SF_DIR, "lineitem").repartition(200).write.parquet(tiny)
    n_files = len(glob.glob(f"{tiny}/*.parquet"))
    assert n_files == 200
    orig = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", str(16 * 1024))
        parts = spark.read.parquet(tiny).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", orig)
    assert parts <= n_files // 3, f"{parts} partitions for {n_files} files"


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    small = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    hot = top_keys(li, "l_orderkey", threshold=3)
    got = salted_join(li, small, "l_orderkey", num_salts=4, hot_keys=hot)
    want = li.join(small, on="l_orderkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_uniform_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    small = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    got = salted_join(li, small, "l_orderkey", num_salts=4)
    want = li.join(small, on="l_orderkey")
    assert got.count() == want.count()
