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


def test_named_outputs_heterogeneous_one_pass(spark, tmp_path):
    """MultipleOutputs.java:473 semantics: different schemas per named
    output, overlapping routing, single write job; per-output read-back
    restores each schema and partition-prunes to one tag."""
    from hadoop_spark.sources.formats import read_named_output, write_named_outputs

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).alias("m"),
        F.concat(F.lit("row"), F.col("id").cast("string")).alias("s"),
    )
    path = str(tmp_path / "named")
    cols, schema = write_named_outputs(
        df,
        path,
        {
            "evens": (F.col("id") % 2 == 0, {"id": F.col("id"), "twice": F.col("id") * 2}),
            "all_str": (F.lit(True), {"id": F.col("id"), "s": F.col("s"), "m": F.col("m")}),
        },
    )
    assert cols["evens"] == ["id", "twice"]
    assert cols["all_str"] == ["id", "s", "m"]
    evens = read_named_output(spark, path, "evens", cols["evens"], schema)
    alls = read_named_output(spark, path, "all_str", cols["all_str"], schema)
    assert evens.count() == 50
    assert alls.count() == 100
    assert evens.filter(F.col("twice") != F.col("id") * 2).count() == 0
    # the read prunes on the tag partition, not a post-scan filter
    plan = evens._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__tag" in plan, plan


def test_named_outputs_type_conflict_rejected(spark, tmp_path):
    from hadoop_spark.sources.formats import write_named_outputs

    df = spark.range(5)
    with pytest.raises(ValueError, match="conflicts"):
        write_named_outputs(
            df,
            str(tmp_path / "x"),
            {
                "a": (F.lit(True), {"v": F.col("id")}),
                "b": (F.lit(True), {"v": F.col("id").cast("string")}),
            },
        )


def test_read_auto_mixed_directory(spark, tmp_path):
    """AutoInputFormat.java:40 parity: per-file magic sniffing over a dir
    mixing a real SequenceFile with plain text."""
    import os

    from hadoop_spark.sources.formats import read_auto, sniff_format, write_sequence_file

    seq_dir = str(tmp_path / "seq")
    kv = spark.range(10).select(
        F.col("id").cast("string").alias("k"), F.concat(F.lit("v"), F.col("id").cast("string")).alias("v")
    )
    write_sequence_file(kv.coalesce(1), seq_dir)
    mix = tmp_path / "mix"
    mix.mkdir()
    for i, p in enumerate(sorted(glob.glob(seq_dir + "/part-*"))):
        shutil.copy(p, mix / f"part-seq-{i}")
    (mix / "notes.txt").write_text("hello\nworld\n")
    assert sniff_format(str(next(mix.glob("part-seq-*")))) == "sequence"
    assert sniff_format(str(mix / "notes.txt")) == "text"
    out = read_auto(spark, str(mix))
    rows = out.collect()
    assert len(rows) == 12
    assert sum(1 for r in rows if r.key is None) == 2
    assert {r.value for r in rows if r.key is not None} == {f"v{i}" for i in range(10)}


@pytest.mark.parametrize("ctype", ["NONE", "RECORD", "BLOCK"])
def test_sequence_file_compression_types(spark, tmp_path, ctype):
    """SequenceFile.java:239-243 CompressionType surface: NONE / RECORD /
    BLOCK all round-trip through the reference's own Writer classes, and
    the on-disk header flags record the requested type exactly."""
    import glob as _glob

    from hadoop_spark.sources.formats import (
        read_seqfile_header,
        read_sequence_file,
        write_sequence_file,
    )

    out = str(tmp_path / f"seq_{ctype.lower()}")
    kv = spark.range(500).select(
        F.col("id").cast("string").alias("k"),
        F.concat(F.lit("value-"), F.col("id").cast("string")).alias("v"),
    )
    write_sequence_file(kv.repartition(2), out, compression_type=ctype)
    parts = sorted(p for p in _glob.glob(out + "/part-*") if not p.endswith(".crc"))
    assert parts, "no part files written"
    for p in parts:
        hdr = read_seqfile_header(p)
        assert hdr["compression_type"] == ctype
        assert hdr["key_class"] == "org.apache.hadoop.io.Text"
    back = read_sequence_file(spark, out)
    got = {(r.key, r.value) for r in back.collect()}
    assert got == {(str(i), f"value-{i}") for i in range(500)}


def test_sequence_file_rejects_unknown_compression_type(spark, tmp_path):
    from hadoop_spark.sources.formats import write_sequence_file

    kv = spark.range(2).select(F.col("id").cast("string").alias("k"), F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="compression_type"):
        write_sequence_file(kv, str(tmp_path / "x"), compression_type="ZIP")


def test_max_records_per_file_bounds_output_files(spark, tmp_path):
    """Output file-size governance (the 100 TB writer knob): with
    maxRecordsPerFile set, no produced parquet file may exceed the cap —
    the writer rolls files instead of emitting one giant part-file per
    partition."""
    out = str(tmp_path / "capped_out")
    df = spark.range(0, 10_000).repartition(2)
    df.write.option("maxRecordsPerFile", 1500).mode("overwrite").parquet(out)
    import glob

    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) >= 7  # 10k rows / 1.5k cap needs ≥7 files
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 1500, (f, n)
    total = spark.read.parquet(out).count()
    assert total == 10_000


def test_nline_exact_splits_match_reference_semantics(spark):
    """NLineInputFormat parity (`lib/input/NLineInputFormat.java:63`):
    exact-N CONSECUTIVE lines per split with one short tail — 25 rows at
    N=4 must give six splits of 4 plus one of 1 (not Spark's ±1-balanced
    round-robin), and split i must hold rows [i*N, (i+1)*N) in order."""
    from hadoop_spark.sources.formats import nline_repartition

    df = spark.range(25).selectExpr("CAST(id AS STRING) AS line").coalesce(1)
    parted = nline_repartition(df, 4)
    assert parted.rdd.getNumPartitions() == 7
    by_part = sorted(
        parted.rdd.mapPartitionsWithIndex(
            lambda i, it: [(i, sorted(int(r.line) for r in it))]
        ).collect()
    )
    sizes = sorted(len(rows) for _, rows in by_part)
    assert sizes == [1, 4, 4, 4, 4, 4, 4]
    # content parity: each split holds the CONSECUTIVE slice, not a
    # round-robin interleave
    assert by_part == [(i, list(range(i * 4, min(25, (i + 1) * 4)))) for i in range(7)]


def test_nline_balanced_mode_keeps_task_count(spark):
    from hadoop_spark.sources.formats import nline_repartition

    df = spark.range(25).selectExpr("CAST(id AS STRING) AS line").coalesce(1)
    parted = nline_repartition(df, 4, exact=False)
    assert parted.rdd.getNumPartitions() == 7
    assert parted.count() == 25
