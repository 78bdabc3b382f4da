"""Property-based checks of the exact-arithmetic formulas behind the
r9 rank/contingency battery (queries/stats5.py).

The Spark and DuckDB sides share each formula by construction; these
tests pin the FORMULAS themselves against naive O(n²)/textbook
reference implementations in pure Python, so a future refactor of the
grid algebra cannot silently change the statistic. No SparkSession —
hypothesis drives small integer datasets through both forms.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

values = st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=60)
pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=5)
    ),
    min_size=2,
    max_size=60,
)


def naive_avg_ranks(xs: list[int]) -> dict[int, float]:
    """Textbook average ranks (1-based) per distinct value."""
    s = sorted(xs)
    ranks: dict[int, list[int]] = {}
    for i, v in enumerate(s, start=1):
        ranks.setdefault(v, []).append(i)
    return {v: sum(r) / len(r) for v, r in ranks.items()}


def grid_doubled_ranks(xs: list[int]) -> dict[int, int]:
    """The stats5 grid formula: R2 = 2·cumcount − cnt + 1."""
    cnt = Counter(xs)
    out, cum = {}, 0
    for v in sorted(cnt):
        cum += cnt[v]
        out[v] = 2 * cum - cnt[v] + 1
    return out


@given(values)
@settings(max_examples=200, deadline=None)
def test_doubled_rank_formula_equals_naive_average_ranks(xs):
    naive = naive_avg_ranks(xs)
    grid = grid_doubled_ranks(xs)
    assert set(naive) == set(grid)
    for v in naive:
        assert grid[v] == 2 * naive[v]  # exact: 2×avg rank is integer


@given(pairs)
@settings(max_examples=200, deadline=None)
def test_kendall_grid_join_counts_equal_naive_pair_scan(ps):
    # naive O(n²) concordant/discordant over raw rows
    c_naive = d_naive = 0
    for i in range(len(ps)):
        for j in range(i + 1, len(ps)):
            (x1, y1), (x2, y2) = ps[i], ps[j]
            s = (x1 - x2) * (y1 - y2)
            if s > 0:
                c_naive += 1
            elif s < 0:
                d_naive += 1
    # the stats5 grid form: strict double-inequality self-join of the
    # counted joint grid, counted once from the upper cell
    grid = Counter(ps)
    c_grid = d_grid = 0
    for (xa, ya), na in grid.items():
        for (xb, yb), nb in grid.items():
            if xb < xa and yb < ya:
                c_grid += na * nb
            if xb < xa and yb > ya:
                d_grid += na * nb
    assert (c_grid, d_grid) == (c_naive, d_naive)


@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=40),
    st.lists(st.integers(0, 9), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_mannwhitney_rank_sum_formula_equals_naive_u(g1, g2):
    # naive U1: #pairs where x > y, ties counting half (doubled form
    # stays integer: 2U1 = 2·#gt + #ties)
    u2_naive = 0
    for x in g1:
        for y in g2:
            if x > y:
                u2_naive += 2
            elif x == y:
                u2_naive += 1
    # stats5 form: 2U1 = ΣR2(group1) − n1(n1+1) on combined doubled ranks
    combined = g1 + g2
    r2 = grid_doubled_ranks(combined)
    sr1 = sum(r2[x] for x in g1)
    n1 = len(g1)
    assert sr1 - n1 * (n1 + 1) == u2_naive


@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=30),
    st.lists(st.integers(0, 9), min_size=1, max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_hodges_lehmann_grid_median_equals_naive(g1, g2):
    diffs = sorted(x - y for x in g1 for y in g2)
    w = len(diffs)
    naive = (diffs[(w - 1) // 2] + diffs[w // 2]) / 2
    # stats5 form: weighted cumulative pick of the lower/upper middle
    # order statistics over the difference grid
    grid = Counter(x - y for x in g1 for y in g2)
    k1, k2 = (w + 1) // 2, (w + 2) // 2
    cum, d1, d2 = 0, None, None
    for d in sorted(grid):
        cum += grid[d]
        if d1 is None and cum >= k1:
            d1 = d
        if d2 is None and cum >= k2:
            d2 = d
    assert (d1 + d2) / 2 == naive


@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 4)), min_size=2, max_size=80))
@settings(max_examples=100, deadline=None)
def test_chi2_quantized_terms_close_to_float_chi2(cells):
    # the 10^9 quantization must stay within 15/1e9 of the float chi2
    obs = Counter(cells)
    n = len(cells)
    rows = Counter(s for s, _ in cells)
    cols = Counter(p for _, p in cells)
    chi_float = 0.0
    q_sum = 0
    for (s, p), o in obs.items():
        r, c = rows[s], cols[p]
        num = (o * n - r * c) ** 2
        den = r * c * n
        chi_float += num / den
        q_sum += (num * 10**9) // den
    assert abs(q_sum / 1e9 - chi_float) <= len(obs) / 1e9 + 1e-9


# ---------------------------------------------------------------------------
# Isotonic minimax form == PAVA (the ssl_isotonic_calibration formula)
# ---------------------------------------------------------------------------

bins_grids = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=50),  # n_k (weight)
        st.integers(min_value=0, max_value=50),  # h_k (<= n_k enforced below)
    ),
    min_size=1,
    max_size=12,
)


def _minimax_fit(cells):
    """The relational form ssl_isotonic_calibration computes:
    fit_i = max_{j<=i} min_{k>=i} weightedMean(h/n, j..k), mirrored in
    pure Python over the same prefix-sum algebra."""
    B = len(cells)
    cn = [0]
    ch = [0]
    for n, h in cells:
        cn.append(cn[-1] + n)
        ch.append(ch[-1] + h)
    fits = []
    for i in range(B):
        best = None
        for j in range(i + 1):
            inner = min(
                (ch[k + 1] - ch[j]) / (cn[k + 1] - cn[j])
                for k in range(i, B)
            )
            best = inner if best is None else max(best, inner)
        fits.append(best)
    return fits


def _pava_fit(cells):
    blocks = [[n, h] for n, h in cells]
    out = [[n, h, 1] for n, h in blocks]
    i = 0
    while i < len(out) - 1:
        a, b = out[i], out[i + 1]
        if a[1] * b[0] > b[1] * a[0]:
            out[i] = [a[0] + b[0], a[1] + b[1], a[2] + b[2]]
            del out[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fits = []
    for w, s, width in out:
        fits.extend([s / w] * width)
    return fits


@given(bins_grids)
@settings(max_examples=300, deadline=None)
def test_isotonic_minimax_equals_pava(grid):
    cells = [(n, min(h, n)) for n, h in grid]
    mm = _minimax_fit(cells)
    pv = _pava_fit(cells)
    assert len(mm) == len(pv)
    for a, b in zip(mm, pv):
        assert abs(a - b) < 1e-12
    # and the fit is monotone non-decreasing
    assert all(x <= y + 1e-12 for x, y in zip(mm, mm[1:]))


# ---------------------------------------------------------------------------
# Conformal rank: integer ceil-division == math.ceil (ssl_conformal_nb)
# ---------------------------------------------------------------------------


@given(st.integers(min_value=1, max_value=10_000_000))
@settings(max_examples=300, deadline=None)
def test_conformal_rank_integer_form(n_cal):
    import math

    k_int = (9 * (n_cal + 1) + 9) // 10
    k_ref = math.ceil(0.9 * (n_cal + 1))
    # the float form itself can be off by 1 ULP at large n; compare via
    # exact rational ceil instead
    k_exact = -((-9 * (n_cal + 1)) // 10)
    assert k_int == k_exact
    if n_cal < 10_000:  # float reference reliable in this range
        assert k_int == k_ref
