"""distcp_incremental must be INCREMENTAL at the file level: after the
sync, the unchanged partitions' files are byte-for-byte the ones snapshot
A's mirror write produced (same names, same mtimes — never rewritten),
and only the changed partition's directory got new files. This is the
`-diff` contract from `hadoop-tools/hadoop-distcp/.../DistCp.java:60`:
copy the delta, not the table."""

from __future__ import annotations

import glob
import os
import shutil

from hadoop_spark.plans import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _snapshot_files(mirror: str) -> dict[str, tuple[float, int]]:
    out = {}
    for p in glob.glob(os.path.join(mirror, "event_type=*", "*.parquet")):
        st = os.stat(p)
        out[os.path.relpath(p, mirror)] = (st.st_mtime_ns, st.st_size)
    return out


def test_unchanged_partitions_not_rewritten(spark, monkeypatch):
    tag = os.path.basename(SF_DIR.rstrip("/"))
    mirror = os.path.join(_REPO, ".tmp", "io", tag, "distcp_inc_mirror")
    shutil.rmtree(mirror, ignore_errors=True)

    # Instrument: capture the mirror's file inventory right after the
    # snapshot-A write by running the query in two halves — simplest is
    # to run it once (it writes A then syncs), then diff the surviving
    # files' mtimes against a re-run where we pre-seed A ourselves. The
    # query itself overwrites A each run, so instead: run once, snapshot
    # the final state, and assert the 'error' partition is the ONLY one
    # whose files postdate the others (the sync job's commit).
    QUERIES["distcp_incremental"](spark, SF_DIR).collect()
    files = _snapshot_files(mirror)
    assert files, "mirror is empty"
    by_part: dict[str, list[int]] = {}
    for rel, (mtime, _size) in files.items():
        part = rel.split(os.sep)[0]
        by_part.setdefault(part, []).append(mtime)
    err_min = min(by_part["event_type=error"])
    others_max = max(
        m for p, ms in by_part.items() if p != "event_type=error" for m in ms
    )
    # every non-error file was written by the snapshot-A job, strictly
    # before the sync job recommitted the error partition
    assert others_max < err_min, (
        "a non-error partition was rewritten by the incremental sync: "
        f"others_max={others_max} err_min={err_min}"
    )


def test_sync_flags_only_changed_partition(spark):
    rows = QUERIES["distcp_incremental"](spark, SF_DIR).collect()
    flags = {r["event_type"]: r["synced"] for r in rows}
    assert flags.pop("error") == 1
    assert set(flags.values()) == {0}
