"""Split-aware XML record framing (`sources/formats.read_xml_records`) —
StreamXmlRecordReader parity (`STREAMING/streaming/StreamXmlRecordReader
.java`): records cut by byte-range split boundaries must be recovered
exactly once, like the reference's scan-past-split-end repair."""

from __future__ import annotations

from hadoop_spark.sources.formats import read_xml_records


def _with_split_bytes(spark, n: int):
    class _Ctx:
        def __enter__(self):
            self.prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(n))
            # defeat small-file packing so tiny splits actually happen
            self.prev_cost = spark.conf.get("spark.sql.files.openCostInBytes")
            spark.conf.set("spark.sql.files.openCostInBytes", "0")

        def __exit__(self, *exc):
            spark.conf.set("spark.sql.files.maxPartitionBytes", self.prev)
            spark.conf.set("spark.sql.files.openCostInBytes", self.prev_cost)

    return _Ctx()


def _records(n: int) -> list[str]:
    # varying lengths so boundaries cut records at arbitrary offsets
    return [f"<rec><id>{i}</id><pad>{'x' * (i % 37)}</pad></rec>" for i in range(n)]


def test_records_straddling_split_boundaries_recovered_exactly_once(
    spark, tmp_path
):
    recs = _records(200)
    # ONE file, one giant line, no separators: every split boundary except
    # file edges falls MID-RECORD
    f = tmp_path / "stream" / "part-0.xml"
    f.parent.mkdir()
    f.write_text("".join(recs))
    with _with_split_bytes(spark, 256):
        df = read_xml_records(spark, str(f.parent), tag="rec").localCheckpoint()
        nparts = df.rdd.getNumPartitions()
    assert nparts > 10, f"fixture must fan out over many splits, got {nparts}"
    got = sorted(r.record for r in df.collect())
    assert got == sorted(recs)


def test_multi_file_stream_with_interrecord_junk(spark, tmp_path):
    """Records never span FILES (the reference's contract too); junk and
    whitespace between records is dropped, per-file tails handled."""
    d = tmp_path / "multi"
    d.mkdir()
    recs_a = _records(40)
    recs_b = [f"<rec><id>{i}</id></rec>" for i in range(1000, 1030)]
    (d / "a.xml").write_text("\n  ".join(recs_a) + "\ntrailing junk")
    (d / "b.xml").write_text("<!-- hdr -->" + "".join(recs_b))
    with _with_split_bytes(spark, 300):
        df = read_xml_records(spark, str(d), tag="rec").localCheckpoint()
    got = sorted(r.record for r in df.collect())
    assert got == sorted(recs_a + recs_b)


def test_empty_and_tagless_input(spark, tmp_path):
    d = tmp_path / "none"
    d.mkdir()
    (d / "a.txt").write_text("no records here at all")
    assert read_xml_records(spark, str(d), tag="rec").count() == 0
