"""JobControl state machine (`lib/jobcontrol/JobControl.java:57`,
`ControlledJob.java:45`): dependency-ordered execution, FAILED capture,
DEPENDENT_FAILED propagation (transitive), and DAG validation at add()."""

from __future__ import annotations

import pytest

from hadoop_spark.plans.jobcontrol import (
    DEPENDENT_FAILED,
    FAILED,
    SUCCESS,
    JobControl,
)


def test_success_chain_runs_in_order(spark):
    ran = []

    def mk(name):
        def build():
            ran.append(name)
            return spark.range(3)

        return build

    jc = (
        JobControl(spark)
        .add("a", mk("a"))
        .add("b", mk("b"), depends=("a",))
        .add("c", mk("c"), depends=("a", "b"))
    )
    jobs = {j.name: j for j in jc.run()}
    assert ran == ["a", "b", "c"]
    assert all(j.state == SUCCESS for j in jobs.values())
    assert jobs["a"].rows == 3
    report = {tuple(r) for r in jc.report().collect()}
    assert ("c", SUCCESS, 3, "a,b") in report


def test_failure_propagates_transitively(spark):
    def ok():
        return spark.range(1)

    def boom():
        raise RuntimeError("job exploded")

    jc = (
        JobControl(spark)
        .add("root", ok)
        .add("bad", boom, depends=("root",))
        .add("child", ok, depends=("bad",))
        .add("grandchild", ok, depends=("child",))
        .add("sibling", ok, depends=("root",))
    )
    jobs = {j.name: j for j in jc.run()}
    assert jobs["root"].state == SUCCESS
    assert jobs["bad"].state == FAILED
    assert "job exploded" in jobs["bad"].error
    assert jobs["child"].state == DEPENDENT_FAILED
    assert jobs["grandchild"].state == DEPENDENT_FAILED
    assert jobs["sibling"].state == SUCCESS


def test_dag_validated_at_add(spark):
    jc = JobControl(spark).add("a", lambda: spark.range(1))
    with pytest.raises(ValueError, match="unknown job"):
        jc.add("b", lambda: spark.range(1), depends=("nope",))
    with pytest.raises(ValueError, match="duplicate"):
        jc.add("a", lambda: spark.range(1))
