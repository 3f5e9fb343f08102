"""Property-based join/sort semantics (risk register items b and c;
mirrors `TestJoinProperties.java` / `TestJoinDatamerge.java`):

- override(a,b,c): per key, the RIGHTMOST source holding it wins, for
  arbitrary key subsets, including N=3 and disjoint/overlapping keys.
- composite inner/outer multiplicity: |inner per key| = prod(|src_k|),
  outer emits NULL slots for absent sources.
- secondary sort: within each group the sequence column enumerates rows
  in exact secondary-key order.

Hypothesis generates the key layouts; a pure-Python model is the oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_spark.operators.join import composite_inner, composite_outer, override
from hadoop_spark.operators.sort import secondary_sort

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a source = dict key -> value (unique per key, as override requires)
source_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=9), st.integers(min_value=-100, max_value=100),
    max_size=8,
)


@given(srcs=st.lists(source_strategy, min_size=2, max_size=4))
@settings(**_SETTINGS)
def test_override_rightmost_wins(spark, srcs):
    frames = [
        spark.createDataFrame(list(s.items()) or [(None, None)], "k int, v int").filter(
            F.col("k").isNotNull()
        )
        for s in srcs
    ]
    got = {r.k: r.v for r in override("k", "v", *frames).collect()}
    want = {}
    for s in srcs:  # later sources override earlier ones
        want.update(s)
    assert got == want


@given(
    left=st.lists(st.integers(0, 4), max_size=6),
    right=st.lists(st.integers(0, 4), max_size=6),
)
@settings(**_SETTINGS)
def test_inner_outer_multiplicity(spark, left, right):
    lf = spark.createDataFrame([(k, "l") for k in left] or [(None, None)], "k int, t string").filter(
        F.col("k").isNotNull()
    )
    rf = spark.createDataFrame([(k, "r") for k in right] or [(None, None)], "k int, t string").filter(
        F.col("k").isNotNull()
    )
    inner_counts: dict[int, int] = {}
    for r in composite_inner("k", lf, rf).collect():
        inner_counts[r.k] = inner_counts.get(r.k, 0) + 1
    want_inner = {
        k: left.count(k) * right.count(k)
        for k in set(left) & set(right)
    }
    assert inner_counts == {k: v for k, v in want_inner.items() if v}

    outer_keys = {r.k for r in composite_outer("k", lf, rf).collect()}
    assert outer_keys == set(left) | set(right)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=1, max_size=24
    )
)
@settings(**_SETTINGS)
def test_secondary_sort_orders_within_groups(spark, rows):
    df = spark.createDataFrame(rows, "g int, v int")
    out = secondary_sort(df, ["g"], [F.col("v").asc(), F.col("g").asc()], out="seq")
    per_group: dict[int, list[tuple[int, int]]] = {}
    for r in out.collect():
        per_group.setdefault(r.g, []).append((r.seq, r.v))
    for g, items in per_group.items():
        items.sort()  # by seq
        vals = [v for _, v in items]
        assert vals == sorted(vals), f"group {g} not value-ordered: {vals}"
        assert [s for s, _ in items] == list(range(1, len(items) + 1))


def test_salted_join_retry_stable_and_exact(spark):
    """The salt must be a pure function of row content (never
    monotonically_increasing_id): a speculative/retried task then recomputes
    identical salt buckets, so shuffle consumers can't see rows move between
    buckets. Gate: (a) results exactly match an unsalted join, (b) two
    independent executions are identical, (c) hot keys genuinely scatter
    across more than one salt bucket."""
    from pyspark.sql import functions as F

    from hadoop_spark.operators.skew import salted_join, top_keys

    big = spark.createDataFrame(
        [(k, i) for i in range(400) for k in ([0] * 3 + [i % 7])], "k int, payload int"
    )
    small = spark.createDataFrame([(k, f"d{k}") for k in range(7)], "k int, name string")
    hot = top_keys(big, "k", threshold=200)

    want = sorted(map(tuple, big.join(small, "k").collect()))
    got1 = sorted(map(tuple, salted_join(big, small, "k", hot_keys=hot).collect()))
    got2 = sorted(map(tuple, salted_join(big, small, "k", hot_keys=hot).collect()))
    assert got1 == want
    assert got2 == got1

    # the hot key's rows must actually be spread over >1 salt bucket
    salt_expr = F.abs(F.hash(*[F.col(c) for c in big.columns])) % 8
    n_buckets = (
        big.filter(F.col("k") == 0).select(salt_expr.alias("s")).distinct().count()
    )
    assert n_buckets > 1
