"""Property-based tests (hypothesis) for the round-4d exact-arithmetic
kernels: the closed forms and selection rules must agree with their
sequential reference implementations on RANDOM inputs, not just the
fixture. These run pure-Python models of the expression trees — the
Spark plans themselves are pinned by the oracle hash and the fixture
invariant tests; here we attack the MATH."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ----------------------------------------------------------------------
# Lindley closed form: L_t = S_t - min(0, min_{k<=t} S_k) must equal the
# sequential clamp fold for ANY signed integer sequence
# (clamped_running_stock, recursive_order_chain).
# ----------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60))
def test_lindley_closed_form_equals_fold(xs):
    lvl = 0
    peaks = []
    clamps = 0
    s = 0
    smin = 0
    for x in xs:
        raw = lvl + x
        s += x
        if raw < 0:
            clamps += 1
            raw = 0
        lvl = raw
        smin = min(smin, s)
        closed = s - min(0, smin)
        assert closed == lvl, (xs, closed, lvl)
        peaks.append(lvl)
    # clamp-event rule: S_t < min(0, m_{t-1})
    s = 0
    m_prev = 0
    n_clamps = 0
    for x in xs:
        s += x
        if s < min(0, m_prev):
            n_clamps += 1
        m_prev = min(m_prev, s)
    assert n_clamps == clamps, xs


# ----------------------------------------------------------------------
# PAVA minimax closed form: fit_i = max_{j<=i} min_{k>=i} wmean(j..k)
# must equal sequential Pool-Adjacent-Violators (isotonic_fit).
# ----------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),  # weight
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=1,
        max_size=14,
    )
)
def test_pava_minimax_equals_sequential(buckets):
    # sequential PAVA (pool while mean decreases)
    pools: list[list[int]] = []
    for w, y in buckets:
        pools.append([w, w * y])
        while len(pools) > 1 and (
            pools[-2][1] * pools[-1][0] > pools[-1][1] * pools[-2][0]
        ):
            w2, s2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
    seq: list[float] = []
    for w, s in pools:
        covered = 0
        while covered < w:
            covered += buckets[len(seq)][0]
            seq.append(s / w)
    # minimax closed form
    n = len(buckets)
    pw = [0]
    ps = [0]
    for w, y in buckets:
        pw.append(pw[-1] + w)
        ps.append(ps[-1] + w * y)

    def wmean(j, k):  # 1-based inclusive
        return (ps[k] - ps[j - 1]) / (pw[k] - pw[j - 1])

    for i in range(1, n + 1):
        fit = max(min(wmean(j, k) for k in range(i, n + 1)) for j in range(1, i + 1))
        assert abs(fit - seq[i - 1]) < 1e-9, (buckets, i, fit, seq[i - 1])


# ----------------------------------------------------------------------
# Greedy funnel window recursion: the running-min construction in
# funnel_greedy_match must equal the direct greedy matcher for any
# event sequence.
# ----------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "click", "purchase", "noise"]),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_greedy_funnel_windows_equal_direct_matcher(events):
    evs = sorted(
        [(t, ty) for ty, t in events if ty != "noise"],
        key=lambda e: (e[0], e[1]),
    )
    # direct greedy matcher
    t1 = next((t for t, ty in evs if ty == "view"), None)
    t2 = (
        next((t for t, ty in evs if ty == "click" and t > t1), None)
        if t1 is not None
        else None
    )
    t3 = (
        next((t for t, ty in evs if ty == "purchase" and t > t2), None)
        if t2 is not None
        else None
    )
    # window construction: running min of view times; qualified click =
    # click with vmin < t; running min of qualified clicks; purchase with
    # cmin < t
    vmin = None
    cmin = None
    got_s1 = got_s2 = got_s3 = False
    for t, ty in evs:
        if ty == "view":
            vmin = t if vmin is None else min(vmin, t)
            got_s1 = True
        if ty == "click" and vmin is not None and vmin < t:
            cmin = t if cmin is None else min(cmin, t)
            got_s2 = True
        if ty == "purchase" and cmin is not None and cmin < t:
            got_s3 = True
    assert got_s1 == (t1 is not None), evs
    assert got_s2 == (t2 is not None), evs
    assert got_s3 == (t3 is not None), evs
    # and the matched click time is exactly the greedy one
    if t2 is not None:
        assert cmin == t2, (evs, cmin, t2)


# ----------------------------------------------------------------------
# Weighted-median selection rule: the first row (price order) where
# 2*cum >= total is the weighted lower median (weighted_median_price).
# ----------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),  # value
            st.integers(min_value=1, max_value=20),  # weight
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_median_selection_rule(rows):
    rows = sorted(rows)
    tot = sum(w for _, w in rows)
    cum = 0
    med = None
    for v, w in rows:
        cum += w
        if 2 * cum >= tot:
            med = v
            break
    # the defining property of the weighted lower median
    below = sum(w for v, w in rows if v < med)
    at_or_below = sum(w for v, w in rows if v <= med)
    # the canonical weighted-lower-median property:
    #   W(< med) <= tot/2 <= W(<= med)
    assert 2 * below <= tot, (rows, med)
    assert 2 * at_or_below >= tot, (rows, med)


# ----------------------------------------------------------------------
# Chapman estimator sanity: for exhaustive small populations the
# estimate is exact when both samples are the whole population.
# ----------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=10_000))
def test_chapman_estimator_exact_on_full_overlap(n):
    n1 = n2 = m = n
    n_hat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert abs(n_hat - n) < 1e-9
