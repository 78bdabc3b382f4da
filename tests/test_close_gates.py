"""Structure pins for scripts/close_gates.py (VERDICT r13 #8): the
one-command close runner must keep covering exactly the gate
configurations the round-close evidence is defined by (four from r13,
plus the full-sf0.1 sweep from r14), and its summary parser must
match driver_sim's output format."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import close_gates

        return close_gates
    finally:
        sys.path.pop(0)


def test_gates_cover_the_close_configurations():
    cg = _mod()
    specs = {(name, sf, tuple(sorted(env.items()))) for name, sf, env in cg.GATES}
    assert ("sf0.001", "sf0.001", ()) in specs
    assert ("sf0.01", "sf0.01", ()) in specs
    # r14: full parity sweep at the bench SF — catches SF-driven
    # vacuities and DECIMAL budgets the gate SFs can't see.
    assert ("sf0.1", "sf0.1", ()) in specs
    assert (
        "shuffle7_sf0.001",
        "sf0.001",
        (("DRIVER_SIM_SHUFFLE", "7"),),
    ) in specs
    assert (
        "strict_codegen_sf0.001",
        "sf0.001",
        (("DRIVER_SIM_STRICT_CODEGEN", "1"),),
    ) in specs
    assert len(cg.GATES) == 5


def test_summary_regex_parses_driver_sim_output():
    cg = _mod()
    m = cg._SUMMARY.search(
        "rows-only: x (3 rows)\noracled ok: 321  rows-only run: 34  "
        "mismatches: []\n"
    )
    assert m and m.group(1) == "321" and m.group(3) == "[]"
    m2 = cg._SUMMARY.search(
        "oracled ok: 320  rows-only run: 34  mismatches: [('q', 'cols')]"
    )
    assert m2 and m2.group(3) == "[('q', 'cols')]"
