"""Pin the unrolled Durbin-Levinson recursion (queries/stats7.py
``_dl_stages``) against direct Yule-Walker solves: φ_kk from the
recursion must equal the last coefficient of the k×k Toeplitz system
R φ = r. Pure Python + numpy, no Spark — the generated expression
text is exactly what both engines evaluate.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tfm_semisup_spark.queries.stats7 import _PACF_K, _dl_stages


def _eval_stages(rho: list[float]) -> dict[str, float]:
    env = {f"r{k}": rho[k - 1] for k in range(1, _PACF_K + 1)}
    for alias, expr in _dl_stages():
        env[alias] = eval(expr.replace(" AS ", " "), {}, dict(env))
    return env


# AR(2)-generated rho sequences are guaranteed positive-definite, so
# the Yule-Walker systems stay well-conditioned.
ar = st.tuples(
    st.floats(min_value=-0.6, max_value=0.6),
    st.floats(min_value=-0.3, max_value=0.3),
)


@given(ar)
@settings(max_examples=200, deadline=None)
def test_durbin_levinson_matches_yule_walker(phi):
    a1, a2 = phi
    # theoretical ACF of a stationary AR(2)
    r = [a1 / (1 - a2)]
    r.append(a1 * r[0] + a2)
    for k in range(2, _PACF_K):
        r.append(a1 * r[k - 1] + a2 * r[k - 2])
    env = _eval_stages(r)
    for k in range(1, _PACF_K + 1):
        mat = np.array(
            [[1.0 if i == j else r[abs(i - j) - 1] for j in range(k)]
             for i in range(k)]
        )
        vec = np.array(r[:k])
        sol = np.linalg.solve(mat, vec)
        assert abs(env[f"p{k}_{k}"] - sol[-1]) < 1e-8, (k, phi)
    # PACF of an AR(2) must cut off: φ_kk ~ 0 for k > 2
    for k in range(3, _PACF_K + 1):
        assert abs(env[f"p{k}_{k}"]) < 1e-8
