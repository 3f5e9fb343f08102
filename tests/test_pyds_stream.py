"""Streaming half of the pluggable Python DataSource: new-file tailing
with engine-checkpointed offsets — including exactly-once across a query
restart (the contract FileStreamSource's seen-files log provides, here
from the offset range + deterministic file ordering)."""

from __future__ import annotations

from hadoop_spark.sources import pyds


def _write_file(d, name, rows):
    p = d / name
    p.write_text("".join(f"{k:<4}{v:<16}\n" for k, v in rows))


def _start(spark, src_dir, ckpt, out_dir):
    try:
        spark.dataSource.register(pyds.FixedWidthDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.readStream.format("fixedwidth")
        .option("path", str(src_dir))
        .option("fields", "k:4,v:16")
        .load()
    )
    return (
        df.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def _rows(spark, out_dir):
    return sorted(
        (r.k, r.v) for r in spark.read.parquet(str(out_dir)).collect()
    )


def test_stream_reader_tails_new_files_and_restarts_exactly_once(
    spark, tmp_path
):
    src = tmp_path / "landing"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    _write_file(src, "a.fw", [("k1", "v1"), ("k2", "v2")])
    _write_file(src, "b.fw", [("k3", "v3")])

    q = _start(spark, src, ckpt, out)
    try:
        q.processAllAvailable()
        assert len(_rows(spark, out)) == 3
        # a file arriving while the query runs is picked up by the next batch
        _write_file(src, "c.fw", [("k4", "v4"), ("k5", "v5")])
        q.processAllAvailable()
        assert len(_rows(spark, out)) == 5
    finally:
        q.stop()

    # files that arrive while the query is DOWN are replayed exactly once
    # from the checkpointed offset on restart — no duplicates of the five
    # already-committed rows, and the new file's rows appear exactly once
    _write_file(src, "d.fw", [("k6", "v6")])
    q2 = _start(spark, src, ckpt, out)
    try:
        q2.processAllAvailable()
        assert _rows(spark, out) == [
            ("k1", "v1"),
            ("k2", "v2"),
            ("k3", "v3"),
            ("k4", "v4"),
            ("k5", "v5"),
            ("k6", "v6"),
        ]
    finally:
        q2.stop()
