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
    override,
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
    define_join_op("leftkeep", lambda key, left, right: left.join(right, key, "left"))
    got = compose('leftkeep(tbl(seq,"a"), tbl(seq,"b"))', "k", _resolve(sources))
    assert _rows(got) == _rows(sources["a"].join(sources["b"], "k", "left"))


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
