"""Property-based checks of the exact-arithmetic formulas behind the
r11 statistics families (log-rank, Kruskal-Wallis, DiD).

Same discipline as tests/test_stats_r10_properties.py: Spark and
DuckDB share each formula by construction; these pin the FORMULAS
against naive/textbook pure-Python references so a refactor of the
grid algebra cannot silently change a statistic. No SparkSession —
hypothesis drives small integer datasets.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from tfm_semisup_spark.queries.stats6 import (
    _KW_SCALE,
    _LR_E_SCALE,
    _LR_V_SCALE,
)

# ---------------------------------------------------------------------------
# Kruskal-Wallis: doubled-rank counted-grid form == naive average ranks
# ---------------------------------------------------------------------------

kw_data = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group id
        st.integers(min_value=0, max_value=8),  # value
    ),
    min_size=6,
    max_size=200,
)


@given(kw_data)
@settings(max_examples=200, deadline=None)
def test_kruskal_doubled_rank_grid_equals_naive(data):
    if len({g for g, _ in data}) < 2:
        return
    n = len(data)
    cnt = Counter(v for _, v in data)
    # naive average ranks 1..n with midrank ties
    ranks: dict[int, float] = {}
    cum = 0
    for v in sorted(cnt):
        c = cnt[v]
        ranks[v] = (2 * cum + c + 1) / 2
        cum += c
    groups: dict[int, list[int]] = defaultdict(list)
    for g, v in data:
        groups[g].append(v)
    h_naive = (
        12.0
        / (n * (n + 1))
        * sum(
            sum(ranks[v] for v in vs) ** 2 / len(vs)
            for vs in groups.values()
        )
        - 3 * (n + 1)
    )
    # the query's doubled-rank counted-grid form with quantized terms
    cum = 0
    r2: dict[int, int] = {}
    for v in sorted(cnt):
        c = cnt[v]
        cum += c
        r2[v] = 2 * cum - c + 1
    term_q = 0
    for vs in groups.values():
        sr2 = sum(r2[v] for v in vs)
        term_q += (sr2 * sr2 * _KW_SCALE) // len(vs)
    h_grid = 3.0 * (term_q / _KW_SCALE) / (n * (n + 1)) - 3.0 * (n + 1)
    # quantization bias is ≤ n_groups/_KW_SCALE on the term sum
    assert abs(h_grid - h_naive) < 3.0 * (len(groups) + 1) / _KW_SCALE * 10

    # tie correction stays in (0, 1]
    ties = sum(c**3 - c for c in cnt.values())
    corr = 1 - ties / (n**3 - n)
    if corr > 0:
        assert h_naive / corr >= h_naive - 1e-9


# ---------------------------------------------------------------------------
# Log-rank: quantized integer accumulation == textbook float form
# ---------------------------------------------------------------------------

lr_data = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # group
        st.integers(min_value=0, max_value=12),  # duration
        st.integers(min_value=0, max_value=1),  # event indicator
    ),
    min_size=4,
    max_size=200,
)


@given(lr_data)
@settings(max_examples=200, deadline=None)
def test_logrank_quantized_equals_textbook(data):
    # textbook float accumulation
    durs = sorted({d for _, d, _ in data})
    o1 = e1 = v = 0.0
    o1_i = e1_q = v_q = 0
    for t in durs:
        n_t = sum(1 for _, d, _ in data if d >= t)
        n1_t = sum(1 for g, d, _ in data if d >= t and g == 0)
        d_t = sum(ev for _, d, ev in data if d == t)
        d1_t = sum(ev for g, d, ev in data if d == t and g == 0)
        if d_t == 0 or n_t <= 1:
            continue
        o1 += d1_t
        e1 += d_t * n1_t / n_t
        v += (
            d_t * n1_t * (n_t - n1_t) * (n_t - d_t) / (n_t**2 * (n_t - 1))
        )
        o1_i += d1_t
        e1_q += (d_t * n1_t * _LR_E_SCALE) // n_t
        v_q += (
            d_t * n1_t * (n_t - n1_t) * (n_t - d_t) * _LR_V_SCALE
        ) // (n_t * n_t * (n_t - 1))
    n_terms = len(durs)
    assert o1_i == o1
    assert abs(e1_q / _LR_E_SCALE - e1) <= n_terms / _LR_E_SCALE + 1e-9
    assert abs(v_q / _LR_V_SCALE - v) <= n_terms / _LR_V_SCALE + 1e-9
    if v > 1e-6:
        z_float = (o1 - e1) / math.sqrt(v)
        z_quant = (o1_i - e1_q / _LR_E_SCALE) / math.sqrt(v_q / _LR_V_SCALE)
        assert abs(z_float - z_quant) < 1e-3 * (1 + abs(z_float))


# ---------------------------------------------------------------------------
# DiD: fixed-tree SE == naive per-cell sample variances
# ---------------------------------------------------------------------------

did_cells = st.lists(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=40),
    min_size=4,
    max_size=4,
)


@given(did_cells)
@settings(max_examples=200, deadline=None)
def test_did_moment_variance_equals_naive(cells):
    for xs in cells:
        n = len(xs)
        s = sum(xs)
        ssq = sum(x * x for x in xs)
        var_moments = (ssq - s * s / n) / (n - 1)
        mean = s / n
        var_naive = sum((x - mean) ** 2 for x in xs) / (n - 1)
        assert math.isclose(var_moments, var_naive, rel_tol=1e-9, abs_tol=1e-6)
    # the DiD point estimate is the interaction of the four cell means
    m = [sum(xs) / len(xs) for xs in cells]
    did = (m[1] - m[0]) - (m[3] - m[2])
    assert math.isfinite(did)
