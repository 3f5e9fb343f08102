"""distcp_incremental must be INCREMENTAL at the file level: after the
sync, the unchanged partitions' files are byte-for-byte the ones snapshot
A's mirror write produced (same names, same mtimes — never rewritten),
and only the changed partition's directory got new files. This is the
`-diff` contract from `hadoop-tools/hadoop-distcp/.../DistCp.java:60`:
copy the delta, not the table."""

from __future__ import annotations

import glob
import os
import re
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


def _job_uuids(files: dict[str, tuple[float, int]]) -> dict[str, set[str]]:
    """Per-partition set of write-JOB uuids embedded in parquet part-file
    names (part-NNNNN-<uuid>-c000...): every file one Spark write job
    commits shares the job's uuid, so 'which job wrote this file' is
    readable from the name alone — no timestamp granularity involved."""
    out: dict[str, set[str]] = {}
    for rel in files:
        part = rel.split(os.sep)[0]
        m = re.search(r"part-\d+-([0-9a-f]{8}(?:-[0-9a-f]{4}){3}-[0-9a-f]{12})", rel)
        assert m, f"unexpected parquet file name: {rel}"
        out.setdefault(part, set()).add(m.group(1))
    return out


def test_unchanged_partitions_not_rewritten(spark):
    tag = os.path.basename(SF_DIR.rstrip("/"))
    mirror = os.path.join(_REPO, ".tmp", "io", tag, "distcp_inc_mirror")
    shutil.rmtree(mirror, ignore_errors=True)

    # The query writes snapshot A (one job) then syncs only the changed
    # partition (a second job). File names carry the writing job's uuid,
    # so the incremental contract is name-checkable without relying on
    # mtime ordering (coarse-granularity filesystems can land the A write
    # and the sync commit in the same timestamp tick): all non-error
    # partitions keep snapshot A's single job uuid, the error partition
    # holds files from a DIFFERENT (later) job only.
    QUERIES["distcp_incremental"](spark, SF_DIR).collect()
    files = _snapshot_files(mirror)
    assert files, "mirror is empty"
    uuids = _job_uuids(files)
    err = uuids.pop("event_type=error")
    others = set().union(*uuids.values())
    assert len(others) == 1, (
        f"non-error partitions written by more than one job: {uuids}"
    )
    assert err and not (err & others), (
        "the error partition was not recommitted by a separate sync job: "
        f"error={err} others={others}"
    )
    # mtime sanity stays, but non-strict — name identity above is the
    # load-bearing check
    by_part: dict[str, list[int]] = {}
    for rel, (mtime, _size) in files.items():
        by_part.setdefault(rel.split(os.sep)[0], []).append(mtime)
    err_min = min(by_part["event_type=error"])
    others_max = max(
        m for p, ms in by_part.items() if p != "event_type=error" for m in ms
    )
    assert others_max <= err_min


def test_sync_flags_only_changed_partition(spark):
    rows = QUERIES["distcp_incremental"](spark, SF_DIR).collect()
    flags = {r["event_type"]: r["synced"] for r in rows}
    assert flags.pop("error") == 1
    assert set(flags.values()) == {0}
