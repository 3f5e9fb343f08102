"""Join operators — all three of the reference's join algorithms, plus the
semi/anti/range extensions it lacks (SURVEY §2.4).

Reference algorithms:
1. Map-side merge join over pre-sorted co-partitioned sources with a join
   expression DSL — `inner(a,b)`, `outer(a,b)`, `override(a,b)`
   (`lib/join/CompositeInputFormat.java:56`, parser `Parser.java`,
   merge engine `CompositeRecordReader.java`).
2. Reduce-side tagged repartition join (`hadoop-tools/hadoop-datajoin/...`
   `DataJoinReducerBase.java:47` — regroup per tag, cross product per key).
3. Broadcast hash join via DistributedCache (`DistributedCache.java:87`).

Spark collapses all three into `df.join`: Catalyst picks broadcast vs
shuffle-hash vs sort-merge per side statistics, and AQE re-picks at runtime.
What needs building is only the N-way composition semantics: `inner`/`outer`
across N sources and `override` (rightmost source wins per key).

Scale notes: N-way composite joins shuffle each source once on the key
(sort-merge), not pairwise repeatedly — Catalyst reuses the exchange
partitioning across the chained joins. `override` is coalesce-after-outer:
no extra shuffle beyond the join itself.
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Cap for the size-guarded broadcast hint below. 128 MiB of Catalyst's
# sizeInBytes estimate (≈ compressed parquet bytes for a scan) expands to
# well under the 8 GB broadcast hard limit in memory, and every dim table
# at bench scale (sf ≤ 1) is a few MB — so the guard keeps the star-join
# plan at bench scale and degrades to Catalyst's own choice (sort-merge,
# AQE-re-planned) when the same table is SF-scaled to 100 TB.
_BCAST_MAX_BYTES = 128 << 20


def bcast_if_small(
    df: DataFrame,
    max_bytes: int = _BCAST_MAX_BYTES,
    gauge: DataFrame | None = None,
) -> DataFrame:
    """A broadcast hint that DEGRADES instead of OOMing the driver.

    `F.broadcast(dim)` is the right star-join plan while `dim` is small —
    the DistributedCache map-side join (`DistributedCache.java:87`) — but a
    FORCED hint never falls back: at TPC-H 100 TB `customer` is ~15 B rows
    and the hint becomes a driver OOM / 8 GB broadcast-limit error instead
    of a sort-merge join. This guard reads Catalyst's own driver-side
    `sizeInBytes` statistic (parquet footers; no job is run) and only
    attaches the hint below `max_bytes` — the same degrade discipline as
    the `_UGC_BCAST_MAX` vocabulary cap in `plans/queries_lm.py`.

    For a JOIN-derived dim Catalyst's basic stats multiply the input
    sizes (a filtered supplier⋈nation⋈region measures GBs while the true
    output is KBs); pass `gauge` as an upper-bound stand-in. PRECONDITION
    the caller must guarantee: |df| ≤ |gauge| in BYTES — true only for
    key-unique, non-widening joins (each df row matches ≤1 gauge-keyed
    row and adds only narrow columns). A fan-out join or a row-widening
    join violates it and re-creates the driver-OOM hazard this guard
    exists to prevent; when in doubt, don't pass gauge."""
    try:
        # py4j hands scala.math.BigInt back as a plain Python int for
        # values that fit; str() round-trip covers both representations
        src = gauge if gauge is not None else df
        raw = src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        est = int(str(raw))
    except Exception:  # estimation unavailable (e.g. streaming) →
        return df  # let Catalyst decide alone
    return F.broadcast(df) if est <= max_bytes else df


def composite_inner(key: str, *sources: DataFrame) -> DataFrame:
    """`inner(a,b,...)`: emit only keys present in ALL sources, full cross
    product of per-source matches (`InnerJoinRecordReader.java:34`)."""
    return reduce(lambda a, b: a.join(b, on=key, how="inner"), sources)


def composite_outer(key: str, *sources: DataFrame) -> DataFrame:
    """`outer(a,b,...)`: emit keys present in ANY source; missing slots are
    NULL (`OuterJoinRecordReader.java:34`)."""
    return reduce(lambda a, b: a.join(b, on=key, how="full_outer"), sources)


def override(key: str, value_col: str, *sources: DataFrame) -> DataFrame:
    """`override(a,b,...)`: per key, the value from the RIGHTMOST source that
    has it (`OverrideRecordReader.java:42`, emit `:56`).

    Each source must be unique per key (the reference reads one value per
    key in this mode — MultiFilterRecordReader view). Implemented as a full
    outer N-way join + reverse-priority coalesce: one shuffle, no Python."""
    aliased = []
    for i, src in enumerate(sources):
        aliased.append(src.select(key, F.col(value_col).alias(f"_v{i}")))
    joined = reduce(lambda a, b: a.join(b, on=key, how="full_outer"), aliased)
    prio = [F.col(f"_v{i}") for i in range(len(sources) - 1, -1, -1)]
    return joined.select(key, F.coalesce(*prio).alias(value_col))


def tagged_join(key: str, tagged: dict[str, DataFrame]) -> DataFrame:
    """datajoin parity: tag each source, union, regroup per key — expressed
    as its result (the per-key cross product across tags), which is exactly
    the N-way inner join. The tag column survives as provenance."""
    sources = [
        df.select(F.lit(tag).alias(f"tag_{tag}"), "*") for tag, df in tagged.items()
    ]
    return composite_inner(key, *sources)


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """DistributedCache map-side hash join: ship the small table to every
    task. `F.broadcast` forces it regardless of autoBroadcastJoinThreshold."""
    return big.join(F.broadcast(small), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — no named operator in the reference (expressible only as a
    filter idiom); native in Spark, no right-side columns, no duplication."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — free extension over the reference."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_time_col: str | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join: for every left row, the LATEST right row with
    right.time <= left.time within the same key. Not expressible in the
    reference at all (would need a stateful merge the Reducer contract
    can't hold); classic in time-series stores.

    Implemented scale-first as the union-window idiom rather than a
    non-equi range join: tag both streams, union, then one window pass per
    key ordered by (time, tag) propagating the last-seen right values with
    `last(ignorenulls)`. ONE shuffle on the key, no range-join explosion,
    no per-row subquery — at 100 TB this is a single sort-merge pass, the
    same cost profile as a groupBy.
    """
    rt = right_time_col or time_col
    vcols = value_cols or [c for c in right.columns if c not in (key, rt)]
    lt = left.withColumn("__tag", F.lit(1)).withColumn("__t", F.col(time_col))
    rr = (
        right.select(
            key, F.col(rt).alias("__t"), *[F.col(c).alias(f"__r_{c}") for c in vcols]
        )
        .withColumn("__tag", F.lit(0))
    )
    unioned = lt.unionByName(rr, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal time (tag 0 < 1): ties are
    # inclusive (right.time == left.time matches), like ASOF JOIN >=.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in vcols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__f_{c}").alias(c) for c in vcols
    ]
    return filled.filter(F.col("__tag") == 1).select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_time_col: str | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Forward as-of: for every left row, the EARLIEST right row with
    right.time >= left.time within the same key (the "next event" lookup
    — time-to-next-conversion, next price tick). Same union-window idiom
    as `asof_join`, scanned in DESCENDING time order so last(ignorenulls)
    carries the nearest following right row; ties (right.time ==
    left.time) match inclusively. ONE shuffle on the key."""
    rt = right_time_col or time_col
    vcols = value_cols or [c for c in right.columns if c not in (key, rt)]
    lt = left.withColumn("__tag", F.lit(1)).withColumn("__t", F.col(time_col))
    rr = (
        right.select(
            key, F.col(rt).alias("__t"), *[F.col(c).alias(f"__r_{c}") for c in vcols]
        )
        .withColumn("__tag", F.lit(0))
    )
    unioned = lt.unionByName(rr, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").desc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in vcols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__f_{c}").alias(c) for c in vcols
    ]
    return filled.filter(F.col("__tag") == 1).select(*out_cols)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    tolerance: int,
    right_time_col: str | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of with a match-window bound (pandas merge_asof's
    `tolerance`): the latest right row at-or-before left.time is kept
    ONLY if it is within `tolerance` time units; otherwise the carried
    values are nulled. Implemented by also carrying the matched right
    TIME through the same single window pass and gating the payload on
    the distance — no extra shuffle."""
    rt = right_time_col or time_col
    vcols = value_cols or [c for c in right.columns if c not in (key, rt)]
    lt = left.withColumn("__tag", F.lit(1)).withColumn("__t", F.col(time_col))
    rr = (
        right.select(
            key, F.col(rt).alias("__t"), *[F.col(c).alias(f"__r_{c}") for c in vcols]
        )
        .withColumn("__rt", F.col("__t"))
        .withColumn("__tag", F.lit(0))
    )
    unioned = lt.unionByName(rr, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last(F.col("__rt"), ignorenulls=True).over(w).alias("__f_rt"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in vcols
        ],
    )
    in_tol = (F.col("__t") - F.col("__f_rt")) <= tolerance
    out_cols = [c for c in left.columns] + [
        F.when(in_tol, F.col(f"__f_{c}")).alias(c) for c in vcols
    ]
    return filled.filter(F.col("__tag") == 1).select(*out_cols)


# ---------------------------------------------------------------------------
# Composite join expression DSL — the string entry point of
# CompositeInputFormat (`lib/join/CompositeInputFormat.java:69-81`):
#
#   func  ::= <ident>([<func>,]*<func>)
#   func  ::= tbl(<class>,"<path>")
#
# `inner`/`outer`/`override` are the built-in idents (`addDefaults`,
# `CompositeInputFormat.java:90-101`); users add their own with
# `define_join_op`, mirroring the `mapreduce.join.define.<ident>`
# configuration hook (`CompositeInputFormat.java:43-47,106-118`). The
# parser is a ~40-line recursive descent over the same grammar as the
# reference's `lib/join/Parser.java`; evaluation maps each op onto the
# Catalyst-planned composition functions above, so an expression's plan
# is exactly the plan the direct Python calls produce — one shuffle per
# distinct key partitioning, broadcast/AQE decisions left to Spark.

_USER_JOIN_OPS: dict[str, object] = {}


def define_join_op(ident: str, fn, replace: bool = False) -> None:
    """Register a user-defined join op (``mapreduce.join.define.<ident>``
    parity): ``fn(key, *frames) -> DataFrame``. Built-in idents cannot be
    shadowed — same as the reference, where defaults are added last.

    The registry is process-global (like the reference's job conf keys), so
    redefining an existing ident is almost always an accident — it raises
    unless ``replace=True``. Use :func:`undefine_join_op` or the
    :func:`join_op` context manager to scope a registration (tests!)."""
    if not ident.isidentifier():
        raise ValueError(f"op ident must be a valid identifier: {ident!r}")
    if ident in ("inner", "outer", "override", "tbl"):
        raise ValueError(f"cannot redefine built-in op {ident!r}")
    if ident in _USER_JOIN_OPS and not replace:
        raise ValueError(
            f"join op {ident!r} is already defined — undefine_join_op() it "
            "first, pass replace=True, or scope it with the join_op() "
            "context manager"
        )
    _USER_JOIN_OPS[ident] = fn


def undefine_join_op(ident: str) -> bool:
    """Remove a user-defined join op; returns whether it was registered."""
    return _USER_JOIN_OPS.pop(ident, None) is not None


@contextmanager
def join_op(ident: str, fn):
    """Context-scoped :func:`define_join_op`: registers on enter, restores
    the previous state (prior op or absence) on exit — so a test cannot
    leak its op into the rest of the process."""
    prev = _USER_JOIN_OPS.get(ident)
    define_join_op(ident, fn, replace=True)
    try:
        yield
    finally:
        if prev is None:
            _USER_JOIN_OPS.pop(ident, None)
        else:
            _USER_JOIN_OPS[ident] = prev


_TOKEN_RE = re.compile(r'\s*("(?:[^"\\]|\\.)*"|[A-Za-z_][\w.$]*|[(),])')


def _tokenize(expr: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if m is None:
            if expr[pos:].strip() == "":
                break
            raise ValueError(
                f"bad token at offset {pos}: {expr[pos:pos + 12]!r}"
            )
        toks.append(m.group(1))
        pos = m.end()
    return toks


def _parse(toks: list[str], i: int):
    """Parse one `func` starting at toks[i]; return (node, next_index).
    Nodes: ('call', name, [args]) | ('lit', text)."""
    name = toks[i]
    if name in "(),":
        raise ValueError(f"expected identifier, got {name!r}")
    if i + 1 >= len(toks) or toks[i + 1] != "(":
        raise ValueError(f"expected '(' after {name!r}")
    args, i = [], i + 2
    while True:
        if i >= len(toks):
            raise ValueError(f"unterminated argument list of {name!r}")
        t = toks[i]
        if t == ")":  # empty or trailing — reference grammar requires >=1 arg
            raise ValueError(f"{name!r} needs at least one argument")
        if t.startswith('"'):
            # unescape \" and \\ — the tokenizer admitted them, so the
            # literal handed to resolve() must carry the unescaped text
            args.append(("lit", re.sub(r"\\(.)", r"\1", t[1:-1])))
            i += 1
        elif i + 1 < len(toks) and toks[i + 1] == "(":
            node, i = _parse(toks, i)
            args.append(node)
        else:
            args.append(("lit", t))  # bare ident leaf (tbl's <class>)
            i += 1
        if i >= len(toks):
            raise ValueError(f"unterminated argument list of {name!r}")
        if toks[i] == ",":
            i += 1
            continue
        if toks[i] == ")":
            return ("call", name, args), i + 1
        raise ValueError(f"expected ',' or ')' in {name!r}, got {toks[i]!r}")


def compose(
    expr: str,
    key: str,
    resolve,
    value_col=None,
) -> DataFrame:
    """Evaluate a composite join expression string against ``resolve``.

    ``resolve(*tbl_args) -> DataFrame`` plays WrappedRecordReader: every
    ``tbl(...)`` leaf's literal arguments (class ident + quoted path in the
    reference grammar) are passed through verbatim. ``key`` is the join
    key every source shares (the reference requires identically sorted/
    partitioned sources; Spark just shuffles on the key). ``override``
    additionally needs ``value_col`` — the single value column its
    rightmost-wins coalesce selects, the MultiFilterRecordReader view.

    ``value_col`` may be a plain column name (one name for every
    ``override`` node — the common case where all sources share a schema)
    or a callable ``value_col(frames) -> str`` invoked per ``override``
    node with that node's already-evaluated child DataFrames, for nested
    expressions whose overrides target differently-named value columns
    (the reference resolves values per reader, so one global name cannot
    express those trees)."""
    toks = _tokenize(expr)
    if not toks:
        raise ValueError("empty join expression")
    root, nxt = _parse(toks, 0)
    if nxt != len(toks):
        raise ValueError(f"trailing tokens after expression: {toks[nxt:]}")

    def ev(node) -> DataFrame:
        kind, name, args = node[0], node[1], node[2] if len(node) > 2 else None
        if kind == "lit":
            raise ValueError(f"bare literal {name!r} outside tbl()")
        if name == "tbl":
            bad = [a for a in args if a[0] != "lit"]
            if bad:
                raise ValueError("tbl() takes only literal arguments")
            return resolve(*[a[1] for a in args])
        frames = [ev(a) for a in args]
        if name == "inner":
            return composite_inner(key, *frames)
        if name == "outer":
            return composite_outer(key, *frames)
        if name == "override":
            if value_col is None:
                raise ValueError("override requires value_col")
            vc = value_col(frames) if callable(value_col) else value_col
            return override(key, vc, *frames)
        fn = _USER_JOIN_OPS.get(name)
        if fn is None:
            raise ValueError(f"unknown join op {name!r} — define_join_op it")
        return fn(key, *frames)

    return ev(root)


def compose_expr(op: str, fmt: str, *paths: str) -> str:
    """Convenience builder mirroring the reference's static
    `CompositeInputFormat.compose(op, inputFormatClass, paths...)`
    (`lib/join/CompositeInputFormat.java:157-172`): returns
    ``<op>(tbl(<fmt>,"<p1>"), ..., tbl(<fmt>,"<pn>"))`` — the string the
    Join.java driver stuffs into ``mapreduce.join.expr``. Quotes and
    backslashes inside paths are escaped so the round trip through
    :func:`compose`'s tokenizer is exact."""
    if not paths:
        raise ValueError("compose_expr needs at least one path")
    esc = [p.replace("\\", "\\\\").replace('"', '\\"') for p in paths]
    return f"{op}(" + ", ".join(f'tbl({fmt}, "{p}")' for p in esc) + ")"
