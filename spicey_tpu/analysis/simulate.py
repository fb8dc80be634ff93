"""Universal entry point: parse -> [OP] -> AC -> TRAN.

Contract: /root/reference/lib/analysis/simulate.ts:5-10 (the .op pass is an
extended-dialect extension; the reference has no DC analysis).
"""

from __future__ import annotations

from ..ir.circuit import build_tensors
from ..parsing.netlist import parse_netlist
from .ac import simulate_ac
from .op import simulate_dc, simulate_op
from .results import SimulationResult
from .four import simulate_four
from .meas import simulate_meas
from .noise import simulate_noise
from .pz import simulate_pz
from .sens import simulate_sens
from .tf import simulate_tf
from ..utils.profiling import span
from .tran import simulate_tran


def simulate(netlist_text: str, method: str = "gj",
             dialect: str = "spicey",
             ac_linearize: str | None = None,
             base_dir: str | None = None) -> SimulationResult:
    """Parse and run every requested analysis.

    ``ac_linearize="op"`` makes the AC sweep linearize nonlinear devices
    around the DC operating point (analysis/ac.py); the default keeps the
    reference behavior of not stamping them. ``base_dir`` resolves
    relative ``.include``/``.lib`` paths (extended dialect)."""
    with span("parse"):
        circuit = parse_netlist(netlist_text, dialect=dialect,
                                base_dir=base_dir)
        tensors = build_tensors(circuit)
    with span("op"):
        # .tf and .noise both linearize at the operating point; solve it
        # once and share it rather than re-running Newton per analysis
        need_op = (circuit.op or circuit.tf is not None
                   or circuit.noise is not None or circuit.pz is not None
                   or circuit.sens is not None)
        op_point = simulate_op(circuit, tensors=tensors, method=method) \
            if need_op else None
        op = op_point if circuit.op else None
    with span("dc"):
        dc = simulate_dc(circuit, tensors=tensors, method=method)
    with span("tf"):
        tf = simulate_tf(circuit, tensors=tensors, method=method,
                         op=op_point)
    with span("noise"):
        noise = simulate_noise(circuit, tensors=tensors, method=method,
                               op=op_point)
    with span("pz"):
        pz = simulate_pz(circuit, tensors=tensors, method=method,
                         op=op_point)
    with span("sens"):
        sens = simulate_sens(circuit, tensors=tensors, method=method,
                             op=op_point)
    with span("ac"):
        # deck-level opt-in for op-linearized AC (.options acop) — the
        # Python kwarg wins when given; the default keeps reference
        # parity (nonlinear devices unstamped in AC)
        if ac_linearize is None and circuit.options.get("acop"):
            ac_linearize = "op"
        ac = simulate_ac(circuit, tensors=tensors, method=method,
                         linearize=ac_linearize)
    with span("tran"):
        # .options reltol/itl4 map onto the Newton toggles (reltol implies
        # iterate-to-convergence; the reference default is the
        # break-on-switch-stability loop)
        tran_kw = {}
        if "reltol" in circuit.options:
            tran_kw = dict(nr="converged", nr_tol=circuit.options["reltol"])
        if "itl4" in circuit.options:
            tran_kw["max_nr"] = int(circuit.options["itl4"])
        # vntol/abstol: per-unknown convergence floors (imply Newton to
        # convergence with ngspice's default reltol when not given)
        if "vntol" in circuit.options or "abstol" in circuit.options:
            tran_kw.setdefault("nr", "converged")
            tran_kw.setdefault("nr_tol", circuit.options.get("reltol", 1e-3))
            tran_kw["nr_vntol"] = circuit.options.get("vntol")
            tran_kw["nr_abstol"] = circuit.options.get("abstol")
        tran = simulate_tran(circuit, tensors=tensors, method=method,
                             **tran_kw)
    with span("four"):
        four = simulate_four(circuit, tran)
    with span("meas"):
        meas = simulate_meas(circuit, tran, ac=ac, dc=dc)
    with span("step"):
        # extended .step: each value is one lane of a batched run (one
        # compiled call — the TPU-native realization of LTspice stepping).
        # The single-circuit results above keep the base element values.
        step = None
        if circuit.step is not None:
            import numpy as np

            from .batch import simulate_ac_batch, simulate_tran_batch
            from .meas import meas_batch
            from .op import op_batch
            from .results import StepResult

            vals = np.asarray(circuit.step.values, dtype=np.float64)
            ov = {circuit.step.param: vals}
            s_ac = (simulate_ac_batch(circuit, ov, method=method)
                    if circuit.ac is not None else None)
            s_tran = (simulate_tran_batch(circuit, ov, method=method)
                      if circuit.tran is not None else None)
            s_op = (op_batch(circuit, ov, method=method)
                    if circuit.op else None)
            s_meas = (meas_batch(circuit, s_tran)
                      if (circuit.meas and s_tran is not None) else None)
            step = StepResult(param=circuit.step.param, values=vals,
                              ac=s_ac, tran=s_tran, op=s_op, meas=s_meas)
    res = SimulationResult(circuit=circuit, ac=ac, tran=tran, op=op, dc=dc,
                            tf=tf, four=four, noise=noise, meas=meas, pz=pz,
                            sens=sens, step=step)
    if circuit.control:
        # extended .control post-processing tail (print/echo/write/wrdata)
        # — host-side, after every analysis (analysis/control.py)
        from .control import run_control

        with span("control"):
            res.control_output = run_control(res, base_dir=base_dir)
    return res
