"""Universal entry point: parse -> [OP] -> AC -> TRAN.

Contract: /root/reference/lib/analysis/simulate.ts:5-10 (the .op pass is an
extended-dialect extension; the reference has no DC analysis).
"""

from __future__ import annotations

from ..ir.circuit import build_tensors
from ..parsing.netlist import ParsedCircuit, parse_netlist
from .ac import simulate_ac
from .op import simulate_op
from .results import SimulationResult
from .tran import simulate_tran


def simulate(netlist_text: str, method: str = "gj",
             dialect: str = "spicey") -> SimulationResult:
    circuit = parse_netlist(netlist_text, dialect=dialect)
    tensors = build_tensors(circuit)
    op = simulate_op(circuit, tensors=tensors, method=method) \
        if circuit.op else None
    ac = simulate_ac(circuit, tensors=tensors, method=method)
    tran = simulate_tran(circuit, tensors=tensors, method=method)
    return SimulationResult(circuit=circuit, ac=ac, tran=tran, op=op)
