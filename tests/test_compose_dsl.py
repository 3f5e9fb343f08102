"""Composite join expression DSL (`lib/join/CompositeInputFormat.java:69-81`,
parser `lib/join/Parser.java`): grammar, op semantics vs the direct
composition functions, the user-defined-op registry
(`mapreduce.join.define.<ident>` parity), and loud failures on malformed
expressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_spark.operators.join import (
    compose,
    composite_inner,
    composite_outer,
    define_join_op,
    join_op,
    override,
    undefine_join_op,
)


@pytest.fixture()
def sources(spark):
    a = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "va"])
    b = spark.createDataFrame([(2, "b2"), (3, "b3")], ["k", "vb"])
    c = spark.createDataFrame([(1, "c1"), (3, "c3")], ["k", "vc"])
    return {"a": a, "b": b, "c": c}


def _resolve(sources):
    def resolve(fmt, name):
        assert fmt == "seq"
        return sources[name]

    return resolve


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_direct_call(spark, sources):
    got = compose('inner(tbl(seq,"a"), tbl(seq,"b"))', "k", _resolve(sources))
    want = composite_inner("k", sources["a"], sources["b"])
    assert _rows(got) == _rows(want)
    assert _rows(got) == [(2, "a2", "b2")]


def test_outer_matches_direct_call(spark, sources):
    got = compose('outer(tbl(seq,"a"), tbl(seq,"b"), tbl(seq,"c"))', "k", _resolve(sources))
    want = composite_outer("k", sources["a"], sources["b"], sources["c"])
    assert _rows(got) == _rows(want)
    assert len(got.collect()) == 3  # keys 1,2,3


def test_override_rightmost_wins(spark, sources):
    srcs = {
        "a": sources["a"].select("k", F.col("va").alias("v")),
        "b": sources["b"].select("k", F.col("vb").alias("v")),
    }
    got = compose(
        'override(tbl(seq,"a"), tbl(seq,"b"))', "k", _resolve(srcs), value_col="v"
    )
    want = override("k", "v", srcs["a"], srcs["b"])
    assert _rows(got) == _rows(want)
    # key 2 present in both -> rightmost (b) wins
    assert dict(got.collect())[2] == "b2"


def test_nested_expression(spark, sources):
    got = compose(
        'inner(tbl(seq,"a"), outer(tbl(seq,"b"), tbl(seq,"c")))',
        "k",
        _resolve(sources),
    )
    want = composite_inner(
        "k", sources["a"], composite_outer("k", sources["b"], sources["c"])
    )
    assert _rows(got) == _rows(want)


def test_user_defined_op(spark, sources):
    # join_op scopes the registration: nothing leaks into later tests
    with join_op("leftkeep", lambda key, left, right: left.join(right, key, "left")):
        got = compose('leftkeep(tbl(seq,"a"), tbl(seq,"b"))', "k", _resolve(sources))
        assert _rows(got) == _rows(sources["a"].join(sources["b"], "k", "left"))
    with pytest.raises(ValueError, match="unknown join op"):
        compose('leftkeep(tbl(seq,"a"), tbl(seq,"b"))', "k", _resolve(sources))


def test_redefinition_raises_unless_replaced():
    try:
        define_join_op("dupop", lambda key, *fr: fr[0])
        with pytest.raises(ValueError, match="already defined"):
            define_join_op("dupop", lambda key, *fr: fr[-1])
        define_join_op("dupop", lambda key, *fr: fr[-1], replace=True)
    finally:
        assert undefine_join_op("dupop") is True
    assert undefine_join_op("dupop") is False


def test_join_op_restores_previous_registration(spark, sources):
    marks = []
    try:
        define_join_op("outerish", lambda key, *fr: (marks.append("v1"), fr[0])[1])
        with join_op("outerish", lambda key, *fr: (marks.append("v2"), fr[0])[1]):
            compose('outerish(tbl(seq,"a"))', "k", _resolve(sources))
        compose('outerish(tbl(seq,"a"))', "k", _resolve(sources))
        assert marks == ["v2", "v1"]
    finally:
        undefine_join_op("outerish")


def test_override_per_node_value_col(spark, sources):
    # Two SIBLING override nodes whose sources carry differently-named
    # value columns ("v" vs "w") under one join — inexpressible with a
    # single global value_col (the r6 ADVICE gap). A callable value_col
    # is invoked per override node with that node's evaluated child
    # frames and resolves each node's own column.
    srcs = {
        "a": sources["a"].select("k", F.col("va").alias("v")),
        "b": sources["b"].select("k", F.col("vb").alias("v")),
        "c": sources["c"].select("k", F.col("vc").alias("w")),
        "d": spark.createDataFrame([(1, "d1"), (2, "d2")], ["k", "w"]),
    }

    def vc(frames):
        common = set.intersection(*(set(f.columns) for f in frames)) - {"k"}
        (col,) = common  # loud if the node's sources don't agree
        return col

    got = compose(
        'inner(override(tbl(seq,"a"), tbl(seq,"b")),'
        ' override(tbl(seq,"c"), tbl(seq,"d")))',
        "k",
        _resolve(srcs),
        value_col=vc,
    )
    want = composite_inner(
        "k",
        override("k", "v", srcs["a"], srcs["b"]),
        override("k", "w", srcs["c"], srcs["d"]),
    )
    assert _rows(got) == _rows(want)
    # key 1: left override keeps a1 (only a has 1); right: d rightmost-wins
    assert (1, "a1", "d1") in _rows(got)


def test_malformed_expressions_fail_loudly(spark, sources):
    r = _resolve(sources)
    with pytest.raises(ValueError, match="unknown join op"):
        compose('bogus(tbl(seq,"a"), tbl(seq,"b"))', "k", r)
    with pytest.raises(ValueError, match="bad token"):
        compose('inner(tbl(seq,"a") ! tbl(seq,"b"))', "k", r)
    with pytest.raises(ValueError, match="at least one argument"):
        compose("inner()", "k", r)
    with pytest.raises(ValueError, match="trailing tokens"):
        compose('inner(tbl(seq,"a"), tbl(seq,"b"))), extra', "k", r)
    with pytest.raises(ValueError, match="value_col"):
        compose('override(tbl(seq,"a"), tbl(seq,"b"))', "k", r)
    with pytest.raises(ValueError, match="literal"):
        compose('inner(tbl(seq,"a"), b)', "k", r)
    with pytest.raises(ValueError, match="unterminated"):
        compose('inner(tbl(seq,"a")', "k", r)
    with pytest.raises(ValueError, match="empty"):
        compose("   ", "k", r)


def test_builtin_ops_cannot_be_shadowed():
    for name in ("inner", "outer", "override", "tbl"):
        with pytest.raises(ValueError, match="built-in"):
            define_join_op(name, lambda key, *fr: fr[0])


def test_escaped_quotes_in_tbl_path(spark, sources):
    # grammar parity with lib/join/Parser.java: \" inside a quoted literal
    # reaches resolve() UNESCAPED
    seen = {}

    def resolve(fmt, name):
        seen["name"] = name
        return sources["a"]

    compose('inner(tbl(seq,"we\\"ird"), tbl(seq,"we\\"ird"))', "k", resolve)
    assert seen["name"] == 'we"ird'


def test_compose_expr_builder_round_trips(spark, sources):
    from hadoop_spark.operators.join import compose_expr

    expr = compose_expr("inner", "seq", "a", "b")
    assert expr == 'inner(tbl(seq, "a"), tbl(seq, "b"))'
    got = compose(expr, "k", _resolve(sources))
    assert _rows(got) == _rows(composite_inner("k", sources["a"], sources["b"]))
    # escaping round-trips through the tokenizer
    weird = compose_expr("outer", "seq", 'we"ird\\path')
    names = []
    compose(weird, "k", lambda fmt, n: (names.append(n), sources["a"])[1])
    assert names == ['we"ird\\path']
    with pytest.raises(ValueError, match="at least one path"):
        compose_expr("inner", "seq")


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_randomized_expression_matches_direct_composition(spark, seed):
    """r6 verdict optional #7: random >3-source expressions with a
    user-defined op must evaluate EXACTLY like the hand-built composition
    of the direct Python calls on the same random data (seeded, so the
    failure case replays)."""
    import random

    rng = random.Random(seed)
    n_sources = rng.randint(4, 6)
    srcs = {}
    for si in range(n_sources):
        rows = [
            (k, f"s{si}v{k}")
            for k in sorted(rng.sample(range(10), rng.randint(3, 8)))
        ]
        srcs[f"t{si}"] = spark.createDataFrame(rows, ["k", f"v{si}"])

    def firstwins(key, *frames):
        # user op: leftmost-wins key union — the mirror of override
        out = frames[0].select("k").distinct()
        for fr in frames[1:]:
            out = out.unionByName(fr.select("k").distinct()).distinct()
        return out

    names = list(srcs)
    rng.shuffle(names)
    cut = rng.randint(2, len(names) - 2)
    inner_names, outer_names = names[:cut], names[cut:]
    expr = (
        "keyunion("
        + "inner(" + ", ".join(f'tbl(seq,"{n}")' for n in inner_names) + "), "
        + "outer(" + ", ".join(f'tbl(seq,"{n}")' for n in outer_names) + ")"
        + ")"
    )
    with join_op("keyunion", firstwins):
        got = compose(expr, "k", _resolve(srcs))
    want = firstwins(
        "k",
        composite_inner("k", *[srcs[n] for n in inner_names]),
        composite_outer("k", *[srcs[n] for n in outer_names]),
    )
    assert _rows(got) == _rows(want)
