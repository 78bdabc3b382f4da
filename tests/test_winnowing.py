"""Pure-Python pins of the winnowing fingerprint algebra
(queries/winnowing.py) — no SparkSession.

1. the portable two-slice md5 hash used by BOTH engines is mirrored
   here byte-for-byte, so the reference implementation below IS the
   query's per-doc computation;
2. the winnowing guarantee (Schleimer et al. 2003 §2): documents
   sharing a token run of length >= _W + _K - 1 share at least one
   selected fingerprint VALUE;
3. the density bound: a doc selects at most (and usually near)
   2/(_W+1) of its k-gram hashes.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from tfm_semisup_spark.queries.winnowing import _K, _W


def _h32(shingle: str) -> int:
    hx = hashlib.md5(shingle.encode()).hexdigest()
    return int(hx[0:4], 16) * 65536 + int(hx[4:8], 16)


def _fingerprints(tokens: list[str]) -> set[int]:
    """Value-set winnowing exactly as the query computes it."""
    if len(tokens) < _K:
        return set()
    hashes = [
        _h32(" ".join(tokens[i : i + _K]))
        for i in range(len(tokens) - _K + 1)
    ]
    if len(hashes) < _W:
        return set()
    return {
        min(hashes[i : i + _W]) for i in range(len(hashes) - _W + 1)
    }


token = st.text(alphabet="abcdef", min_size=1, max_size=3)
doc = st.lists(token, min_size=_W + _K - 1, max_size=60)


@given(doc, doc, st.integers(min_value=0, max_value=40))
@settings(max_examples=200, deadline=None)
def test_winnowing_shared_run_guarantee(a, b, cut):
    # plant a shared run of exactly the guarantee length into both docs
    run = [f"run{i}" for i in range(_W + _K - 1)]
    da = a[: cut % (len(a) + 1)] + run + a[cut % (len(a) + 1) :]
    db = run + b
    fa, fb = _fingerprints(da), _fingerprints(db)
    assert fa & fb, "guarantee violated: shared run selected no common value"


@given(doc)
@settings(max_examples=200, deadline=None)
def test_winnowing_density_bound(tokens):
    fps = _fingerprints(tokens)
    n_kg = len(tokens) - _K + 1
    if n_kg >= _W:
        n_windows = n_kg - _W + 1
        assert 1 <= len(fps) <= n_windows
