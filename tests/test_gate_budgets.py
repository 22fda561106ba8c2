"""Gate-cost budget regression pins.

Counterpart of reference `common/src/gadgets.rs:443-452`: the ingress-hoisted
canonical-split optimization in `sort_digests4` is worth ~3x in gates; these
pins fail if a refactor silently regresses the packing. Budgets are the
REFERENCE'S OWN budgets (n=8 → ≤900, n=64 → ≤57,000); this implementation
currently sits at 892 / 54,416 gate-rows.
"""

from qp_zk_circuits_tpu.plonk.builder import CircuitBuilder
from qp_zk_circuits_tpu.plonk.config import CircuitConfig
from qp_zk_circuits_tpu.utils import gadgets as gd


def _sort_gate_cost(n: int) -> int:
    b = CircuitBuilder(CircuitConfig())
    vals = [[b.add_virtual_target() for _ in range(4)] for _ in range(n)]
    before = b.num_gates()
    gd.sort_digests4(b, vals)
    return b.num_gates() - before


def test_sort_digests4_budget_n8():
    assert _sort_gate_cost(8) <= 900


def test_sort_digests4_budget_n64():
    assert _sort_gate_cost(64) <= 57_000
