"""Property-based checks of the exact-arithmetic formulas behind the
r10 statistics families (Mann-Kendall, Cochran-Armitage,
Benjamini-Hochberg, Nelson-Aalen, HITS, time-decay attribution).

Same discipline as tests/test_stats5_properties.py: the Spark and
DuckDB sides share each formula by construction; these pin the
FORMULAS against naive/textbook pure-Python references so a refactor
of the grid algebra cannot silently change a statistic. No
SparkSession — hypothesis drives small integer datasets.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

series = st.lists(st.integers(min_value=0, max_value=20), min_size=3, max_size=50)


@given(series)
@settings(max_examples=200, deadline=None)
def test_mann_kendall_grid_formula_equals_naive(xs):
    # naive O(n²): S over time-ordered pairs, tie-corrected variance
    n = len(xs)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (xs[j] > xs[i]) - (xs[j] < xs[i])
    ties = Counter(xs)
    tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_sum
    # the query's grid form: same S via the pair join (identical here),
    # and Var(S) = var18/18 must be the textbook value
    assert var18 % 1 == 0 and var18 >= 0
    if var18 > 0:
        if s > 0:
            z = (s - 1) / math.sqrt(var18 / 18.0)
        elif s < 0:
            z = (s + 1) / math.sqrt(var18 / 18.0)
        else:
            z = 0.0
        # |z| is bounded for any data by |S|max = n(n-1)/2 over sqrt of
        # the no-ties variance — sanity envelope
        assert abs(z) < n * (n - 1)


groups = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=50),  # n_i
        st.integers(min_value=0, max_value=50),  # r_i (capped to n_i below)
    ),
    min_size=2,
    max_size=6,
)


@given(groups)
@settings(max_examples=200, deadline=None)
def test_cochran_armitage_integer_form_equals_textbook(cells):
    cells = [(n, min(r, n)) for n, r in cells]
    N = sum(n for n, _ in cells)
    R = sum(r for _, r in cells)
    if R == 0 or R == N:
        return  # degenerate variance
    s = list(range(1, len(cells) + 1))
    # textbook: T = Σ s_i (r_i − n_i R/N); Var = p(1−p)(Σ n s² − (Σ n s)²/N)
    t_text = sum(si * (r - n * R / N) for si, (n, r) in zip(s, cells))
    p = R / N
    var_text = p * (1 - p) * (
        sum(n * si * si for si, (n, _) in zip(s, cells))
        - sum(n * si for si, (n, _) in zip(s, cells)) ** 2 / N
    )
    # integer form used by the query
    sr = sum(si * r for si, (_, r) in zip(s, cells))
    sn = sum(si * n for si, (n, _) in zip(s, cells))
    snss = sum(n * si * si for si, (n, _) in zip(s, cells))
    t_num = N * sr - R * sn
    vcore = N * snss - sn * sn
    assert math.isclose(t_num / N, t_text, rel_tol=1e-9, abs_tol=1e-9)
    if var_text > 0:
        z_text = t_text / math.sqrt(var_text)
        z_int = t_num / math.sqrt(R * (N - R) * vcore / N)
        assert math.isclose(z_int, z_text, rel_tol=1e-9, abs_tol=1e-9)


pvals = st.lists(
    st.integers(min_value=0, max_value=1_000_000_000), min_size=1, max_size=30
)


@given(pvals)
@settings(max_examples=200, deadline=None)
def test_bh_integer_threshold_equals_float_procedure(p_q):
    scale = 1_000_000_000
    m = len(p_q)
    ranked = sorted(p_q)
    # float BH at q=0.1
    k_star_f = 0
    for k, p in enumerate(ranked, start=1):
        if p / scale <= 0.1 * k / m:
            k_star_f = k
    # integer compare used by the query: p_q·m·10 <= k·1·scale
    k_star_i = 0
    for k, p in enumerate(ranked, start=1):
        if p * m * 10 <= k * scale:
            k_star_i = k
    assert k_star_i == k_star_f


def test_normal_tail_polynomial_accuracy():
    """A&S 26.2.17 against a high-precision erfc via math.erfc: the
    shared SQL snippet's promise is |error| < 7.5e-8, well inside the
    9-dp p-value quantization."""
    for z10 in range(0, 60):
        z = z10 / 10.0
        t = 1.0 / (1.0 + 0.2316419 * z)
        poly = t * (
            0.319381530
            + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
        )
        phi = math.exp(-(z * z) / 2.0) / math.sqrt(2.0 * math.pi)
        p_two = 2.0 * phi * poly
        ref = math.erfc(z / math.sqrt(2.0))
        assert abs(p_two - ref) < 1.5e-7  # two-sided: 2 x 7.5e-8


events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # duration
        st.booleans(),  # event (True) vs censored
    ),
    min_size=1,
    max_size=60,
)


@given(events)
@settings(max_examples=200, deadline=None)
def test_nelson_aalen_grid_equals_naive(rows):
    # naive: sort by duration; at each distinct event time, d/n with n =
    # subjects with duration >= t
    durs = sorted({d for d, e in rows if e})
    h = 0.0
    expected = []
    for t in durs:
        n_risk = sum(1 for d, _ in rows if d >= t)
        d_at = sum(1 for d, e in rows if e and d == t)
        h += d_at / n_risk
        expected.append((t, n_risk, d_at, h))
    # grid form (the query's): risk via reverse cumulative counts on the
    # duration grid, hazard via forward cumulative sum
    grid = Counter()
    dgrid = Counter()
    for d, e in rows:
        grid[d] += 1
        dgrid[d] += 1 if e else 0
    keys = sorted(grid)
    n_risk_map = {}
    acc = 0
    for k in reversed(keys):
        acc += grid[k]
        n_risk_map[k] = acc
    h2 = 0.0
    got = []
    for k in keys:
        if dgrid[k] > 0:
            h2 += dgrid[k] / n_risk_map[k]
            got.append((k, n_risk_map[k], dgrid[k], h2))
    assert len(got) == len(expected)
    for (t1, n1, d1, ha), (t2, n2, d2, hb) in zip(got, expected):
        assert (t1, n1, d1) == (t2, n2, d2)
        assert math.isclose(ha, hb, rel_tol=1e-12)


edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # supplier
        st.integers(min_value=0, max_value=7),  # part
    ),
    min_size=1,
    max_size=60,
)


@given(edges)
@settings(max_examples=200, deadline=None)
def test_hits_integer_iterations_preserve_normalized_ranking(es):
    # weighted edges
    w = Counter(es)
    # integer form (the query's)
    hub1 = Counter()
    for (s, p), k in w.items():
        hub1[s] += k
    auth1 = Counter()
    for (s, p), k in w.items():
        auth1[p] += k * hub1[s]
    hub2 = Counter()
    for (s, p), k in w.items():
        hub2[s] += k * auth1[p]
    auth2 = Counter()
    for (s, p), k in w.items():
        auth2[p] += k * hub2[s]
    # float form WITH per-step L2 normalization (textbook HITS)
    import numpy as np

    parts = sorted({p for _, p in w})
    sups = sorted({s for s, _ in w})
    a = {p: 1.0 for p in parts}
    for _ in range(2):
        h = {s: sum(k * a[p] for (s2, p), k in w.items() if s2 == s) for s in sups}
        hn = math.sqrt(sum(v * v for v in h.values())) or 1.0
        h = {s: v / hn for s, v in h.items()}
        a = {p: sum(k * h[s] for (s, p2), k in w.items() if p2 == p) for p in parts}
        an = math.sqrt(sum(v * v for v in a.values())) or 1.0
        a = {p: v / an for p, v in a.items()}
    # normalization is a positive scalar per step: the RANKING by
    # (score desc, part) must agree wherever the float form can
    # distinguish (guard against float ties at 1e-12)
    int_order = sorted(parts, key=lambda p: (-auth2[p], p))
    flo_order = sorted(parts, key=lambda p: (-a[p], p))
    for pi, pf in zip(int_order, flo_order):
        if pi != pf:
            assert math.isclose(a[pi], a[pf], rel_tol=1e-9, abs_tol=1e-12)


@given(st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_time_decay_quantized_credit_sums_to_one_minus_dust(ages_weeks):
    # per-user: weights 2^(20 - min(bucket, 20)); quantized credit
    # floor(w · 1e12 / W) must sum to 1e12 minus at most (#touches - 1)
    scale = 10**12
    ws = [2 ** (20 - min(b, 20)) for b in ages_weeks]
    W = sum(ws)
    qs = [w * scale // W for w in ws]
    assert scale - len(ws) < sum(qs) <= scale
