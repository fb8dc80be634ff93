"""Universal entry point: parse -> AC -> TRAN.

Contract: /root/reference/lib/analysis/simulate.ts:5-10.
"""

from __future__ import annotations

from ..ir.circuit import build_tensors
from ..parsing.netlist import ParsedCircuit, parse_netlist
from .ac import simulate_ac
from .results import SimulationResult
from .tran import simulate_tran


def simulate(netlist_text: str, method: str = "gj") -> SimulationResult:
    circuit = parse_netlist(netlist_text)
    tensors = build_tensors(circuit)
    ac = simulate_ac(circuit, tensors=tensors, method=method)
    tran = simulate_tran(circuit, tensors=tensors, method=method)
    return SimulationResult(circuit=circuit, ac=ac, tran=tran)
