"""Pin the G² collocation formula (queries/text_analysis4.py) against
the mutual-information identity: for any 2×2 table, Dunning's
G² = 2·N·I(X;Y) in nats. The query assembles G² from (a, n1, n2, N)
via the four-cell O·ln(O·N/E-product) tree; this checks that algebra
against an independent plug-in MI computation. Pure Python, no Spark.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

cells = st.tuples(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=500),
)


def _g2_query_form(a: int, n1: int, n2: int, nn: int) -> float:
    def term(o: int, num: int, den: int) -> float:
        return 0.0 if o == 0 else o * math.log(num / den)

    return 2.0 * (
        term(a, a * nn, n1 * n2)
        + term(n1 - a, (n1 - a) * nn, n1 * (nn - n2))
        + term(n2 - a, (n2 - a) * nn, (nn - n1) * n2)
        + term(
            nn - n1 - n2 + a, (nn - n1 - n2 + a) * nn, (nn - n1) * (nn - n2)
        )
    )


@given(cells)
@settings(max_examples=300, deadline=None)
def test_g2_equals_2n_mutual_information(t):
    a, b, c, d = t
    nn = a + b + c + d
    n1, n2 = a + b, a + c
    if min(n1, n2, nn - n1, nn - n2) == 0:
        return  # degenerate margins: the query never sees them (a>=5)
    g2 = _g2_query_form(a, n1, n2, nn)
    # plug-in MI over the joint (in nats)
    mi = 0.0
    for o, px, py in (
        (a, n1, n2),
        (b, n1, nn - n2),
        (c, nn - n1, n2),
        (d, nn - n1, nn - n2),
    ):
        if o > 0:
            mi += (o / nn) * math.log((o * nn) / (px * py))
    assert math.isclose(g2, 2.0 * nn * mi, rel_tol=1e-9, abs_tol=1e-7)
    assert g2 >= -1e-7  # G² is a deviance: nonnegative
