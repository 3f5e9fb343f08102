"""connected_components has two execution paths since r10: a driver-side
label propagation below _CC_DRIVER_MAX_EDGES (per-round job overhead
swamps small graphs) and the distributed join loop above it. Both must
produce the identical (node, comp = min reachable id) fixpoint."""

from __future__ import annotations

import pytest

import hadoop_spark.operators.dedup as dedup_mod
from hadoop_spark.operators.dedup import connected_components


@pytest.fixture(scope="module")
def spark():
    from hadoop_spark.session import get_session

    return get_session(app_name="test_cc_paths", master="local[2]")


# chain 1-2-3-4, triangle 10-11-12, isolated edge 20-21, self-loop 30-30
_EDGES = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21), (30, 30)]
_EXPECT = sorted(
    [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10), (20, 20), (21, 20), (30, 30)]
)


def _run(spark, cap):
    old = dedup_mod._CC_DRIVER_MAX_EDGES
    dedup_mod._CC_DRIVER_MAX_EDGES = cap
    try:
        pairs = spark.createDataFrame(_EDGES, "id_a bigint, id_b bigint")
        comp = connected_components(pairs, "id_a", "id_b")
        return sorted((r["node"], r["comp"]) for r in comp.collect())
    finally:
        dedup_mod._CC_DRIVER_MAX_EDGES = old


def test_driver_path_matches_expected(spark):
    assert _run(spark, cap=1_000_000) == _EXPECT


def test_distributed_path_matches_expected(spark):
    # cap 0 forces the join loop even for this tiny graph
    assert _run(spark, cap=0) == _EXPECT


def test_empty_pairs_both_paths(spark):
    # cap=0 exercises the DISTRIBUTED path on empty input (the driver-path
    # gate is strictly-less-than the cap since r11, per the r10 ADVICE);
    # cap=1M exercises the driver path.
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    for cap in (0, 1_000_000):
        old = dedup_mod._CC_DRIVER_MAX_EDGES
        dedup_mod._CC_DRIVER_MAX_EDGES = cap
        try:
            assert connected_components(empty, "id_a", "id_b").count() == 0
        finally:
            dedup_mod._CC_DRIVER_MAX_EDGES = old


def test_int32_ids_bigint_output_both_paths(spark):
    # Integral ids are widened to bigint ONCE before either path (r11,
    # per the r10 ADVICE): the output schema must not depend on which
    # path ran.
    for cap in (0, 1_000_000):
        old = dedup_mod._CC_DRIVER_MAX_EDGES
        dedup_mod._CC_DRIVER_MAX_EDGES = cap
        try:
            pairs = spark.createDataFrame(_EDGES, "id_a int, id_b int")
            comp = connected_components(pairs, "id_a", "id_b")
            assert [f.dataType.simpleString() for f in comp.schema.fields] == [
                "bigint",
                "bigint",
            ]
            assert sorted((r["node"], r["comp"]) for r in comp.collect()) == _EXPECT
        finally:
            dedup_mod._CC_DRIVER_MAX_EDGES = old


def test_null_ids_fall_through_to_distributed(spark):
    # A null id would round-trip through toPandas() as NaN and cast to a
    # garbage int64 label on the driver path — frames containing nulls
    # must take the distributed loop regardless of size (r11, per the r10
    # ADVICE). Both cap settings must therefore agree exactly.
    edges = [(1, 2), (2, 3), (None, 9), (20, 21)]
    results = []
    for cap in (0, 1_000_000):
        old = dedup_mod._CC_DRIVER_MAX_EDGES
        dedup_mod._CC_DRIVER_MAX_EDGES = cap
        try:
            pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
            comp = connected_components(pairs, "id_a", "id_b")
            results.append(sorted(
                ((r["node"], r["comp"]) for r in comp.collect()),
                key=lambda t: (t[0] is None, t[0]),
            ))
        finally:
            dedup_mod._CC_DRIVER_MAX_EDGES = old
    assert results[0] == results[1]
    # the non-null components are still labelled correctly
    non_null = [t for t in results[1] if t[0] is not None]
    for node, comp_label in non_null:
        if node in (1, 2, 3):
            assert comp_label == 1
        if node in (20, 21):
            assert comp_label == 20


def test_driver_path_deep_chain(spark):
    """A 60-node path graph: deep diameter exercises the pointer-jumping
    convergence of the driver pass well past one propagation round."""
    old = dedup_mod._CC_DRIVER_MAX_EDGES
    dedup_mod._CC_DRIVER_MAX_EDGES = 1_000_000
    try:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(100, 160)], "id_a bigint, id_b bigint"
        )
        comp = connected_components(pairs, "id_a", "id_b")
        rows = {r["node"]: r["comp"] for r in comp.collect()}
        assert set(rows.values()) == {100}
        assert len(rows) == 61
    finally:
        dedup_mod._CC_DRIVER_MAX_EDGES = old
