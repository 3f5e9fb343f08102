"""Multi-job orchestration — JobControl parity (SURVEY §7 M7).

The reference chains MapReduce jobs with explicit dependency edges and a
state machine (`hadoop-mapreduce-client-core/.../lib/jobcontrol/
JobControl.java:57`, `ControlledJob.java:45`: WAITING → READY → RUNNING →
SUCCESS / FAILED, with dependents of a failed job moved to DEPENDED_UPON
failure without running). In Spark, *intra*-query chaining is free — the
whole DAG is one lazy plan — so this module exists for the *inter*-query
case the reference's users actually had: named pipeline stages where a later
stage consumes an earlier stage's materialized output, plus an end-of-run
counters/metrics report (`MR-CORE/mapreduce/Counters.java:41` analogue via
`df.observe`).

Scale: each job is one Spark action; the pipeline adds zero driver-side data
movement — the report carries one row of scalars per job, never rows of the
data. Stage handoff should be a columnar write (parquet) so downstream jobs
re-enter Catalyst with pruning/pushdown intact.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Job states — the reference's ControlledJob.State names.
WAITING = "WAITING"
RUNNING = "RUNNING"
SUCCESS = "SUCCESS"
FAILED = "FAILED"
DEPENDENT_FAILED = "DEPENDENT_FAILED"


@dataclass
class Job:
    """One controlled job: a builder producing a DataFrame plus the action
    that materializes it (default: count). `depends` are job names that must
    reach SUCCESS first."""

    name: str
    build: Callable[[], DataFrame]
    depends: tuple[str, ...] = ()
    action: str = "count"  # "count" | "noop_write"
    # filled by run():
    state: str = WAITING
    rows: int | None = None
    seconds: float | None = None
    error: str | None = None
    extra_counters: dict[str, float] = field(default_factory=dict)


class JobControl:
    """Run a DAG of named jobs in dependency order with the reference's
    failure semantics: a job whose dependency failed is marked
    DEPENDENT_FAILED and never runs (`ControlledJob.java:45`)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.jobs: dict[str, Job] = {}

    def add(
        self,
        name: str,
        build: Callable[[], DataFrame],
        depends: tuple[str, ...] = (),
        action: str = "count",
    ) -> "JobControl":
        if name in self.jobs:
            raise ValueError(f"duplicate job name {name!r}")
        for d in depends:
            if d not in self.jobs:
                raise ValueError(f"job {name!r} depends on unknown job {d!r}")
        self.jobs[name] = Job(name, build, tuple(depends), action)
        return self

    def run(self) -> list[Job]:
        """Execute every job whose dependencies all reached SUCCESS, in
        insertion (= topological, enforced by `add`) order. Returns the job
        list with states/metrics filled; never raises for a job failure —
        failure is data in the report, as the reference's JobControl
        reported rather than threw."""
        for job in self.jobs.values():
            bad = [d for d in job.depends if self.jobs[d].state != SUCCESS]
            if bad:
                job.state = DEPENDENT_FAILED
                job.error = f"dependencies failed: {', '.join(bad)}"
                continue
            job.state = RUNNING
            t0 = time.time()
            try:
                df = job.build()
                if job.action == "noop_write":
                    df.write.format("noop").mode("overwrite").save()
                    job.rows = -1  # not counted; noop sink reports no rows
                else:
                    job.rows = df.count()
                job.state = SUCCESS
            except Exception as exc:  # noqa: BLE001 — failure is report data
                job.state = FAILED
                job.error = f"{type(exc).__name__}: {exc}"[:500]
            job.seconds = round(time.time() - t0, 3)
        return list(self.jobs.values())

    def report(self) -> DataFrame:
        """Counters report: one row per job (name, state, n_rows, depends).
        Wall-clock seconds are kept OFF the report schema so results stay
        deterministic/oracle-checkable; they remain on the Job objects."""
        rows = [
            (j.name, j.state, j.rows, ",".join(j.depends) or None)
            for j in self.jobs.values()
        ]
        return self.spark.createDataFrame(
            rows, "job string, state string, n_rows bigint, depends string"
        )
