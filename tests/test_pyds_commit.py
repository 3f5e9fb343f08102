"""OutputCommitter parity for the Python DataSource write path
(`sources/pyds.py`): task attempts write dot-prefixed PENDING files that
readers never ingest; job commit promotes them and defers the overwrite
delete; job abort leaves previously committed output intact."""

from __future__ import annotations

import os

from hadoop_spark.sources.pyds import FixedWidthWriter, _FixedWidthCommit
from pyspark.sql.types import StringType, StructField, StructType

_SCHEMA = StructType([StructField("k", StringType()), StructField("v", StringType())])
_OPTS = {"fields": "k:4,v:8"}


def _writer(path, overwrite=True):
    return FixedWidthWriter({**_OPTS, "path": str(path)}, _SCHEMA, overwrite)


def _final_files(path):
    return sorted(f for f in os.listdir(path) if not f.startswith(("_", ".")))


def test_write_produces_pending_then_commit_promotes(tmp_path):
    out = tmp_path / "o"
    w = _writer(out)
    msg = w.write(iter([("a", "1"), ("b", "2")]))
    assert isinstance(msg, _FixedWidthCommit)
    # before commit: only a dot-prefixed pending file, invisible to readers
    assert _final_files(out) == []
    assert any(f.endswith(".pending") for f in os.listdir(out))
    w.commit([msg])
    assert _final_files(out) == [msg.final_name]
    assert not any(f.endswith(".pending") for f in os.listdir(out))
    body = (out / msg.final_name).read_text()
    assert body == "a   1       \nb   2       \n"


def test_overwrite_delete_deferred_to_commit(tmp_path):
    out = tmp_path / "o"
    w1 = _writer(out)
    m1 = w1.write(iter([("x", "old")]))
    w1.commit([m1])
    old = _final_files(out)

    # second job in overwrite mode: constructing the writer and writing the
    # attempt must NOT touch the committed output (a failed job keeps data)
    w2 = _writer(out, overwrite=True)
    m2 = w2.write(iter([("y", "new")]))
    assert set(_final_files(out)) == set(old)
    w2.abort([m2])
    assert set(_final_files(out)) == set(old)  # aborted job: data intact
    assert not any(f.endswith(".pending") for f in os.listdir(out))

    # a successful overwrite job replaces prior output only at commit
    w3 = _writer(out, overwrite=True)
    m3 = w3.write(iter([("z", "v3")]))
    w3.commit([m3])
    assert _final_files(out) == [m3.final_name]


def test_commit_sweeps_speculative_strays(tmp_path):
    out = tmp_path / "o"
    w = _writer(out)
    committed = w.write(iter([("a", "1")]))
    stray = w.write(iter([("a", "1")]))  # speculative twin, not committed
    w.commit([committed])
    assert _final_files(out) == [committed.final_name]
    assert not (out / stray.tmp_name).exists()
