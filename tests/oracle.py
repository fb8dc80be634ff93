"""NumPy reference oracle for transient analysis.

There is no JS runtime in this environment, so the TypeScript reference
cannot be executed to mint golden traces. This oracle is an independent
step-for-step re-execution of the reference's *documented algorithm*
(SURVEY.md §2.10 pins every formula; contract
/root/reference/lib/analysis/simulateTRAN.ts:14-252) in plain Python/NumPy
float64:

  - fixed-step grid: dt > EPS ? dt : tstop/1000, steps = ceil(tstop/dt),
    dt snapped to tstop/steps, steps+1 inclusive output points;
  - per step: x seeded to ZERO, up to 20 iterations of
    {rebuild A,b -> solve -> update switch hysteresis}, breaking as soon as
    no switch toggled (diodes thus get one Newton step per stable pass,
    seeded from the previous timestep's vd on iteration 0);
  - backward-Euler companions (C: G=C/dt & Ieq=-G*vPrev; L: G=dt/L & iPrev),
    switch Ron/Roff with |R|>=EPS clamp, diode Shockley companion with
    vd clipped to [-1, 0.8] and gd floored at 1e-12;
  - recording and state-commit order identical to the reference.

It is deliberately slow, scalar, and direct — its only job is to be an
obviously-correct executable spec the compiled engine is compared against.
"""

from __future__ import annotations

import math

import numpy as np

EPS = 1e-15
VT_300K = 0.02585


def oracle_tran(ckt):
    """Run the reference transient algorithm on a spicey_tpu ParsedCircuit.

    Returns (times, node_voltages, element_currents) with the same key
    ordering as the reference.
    """
    if ckt.tran is None:
        return None
    dt_req, tstop = ckt.tran.dt, ckt.tran.tstop
    dt_eff = dt_req if dt_req > EPS else max(tstop / 1000.0, EPS)
    steps = max(1, math.ceil(tstop / max(dt_eff, EPS)))
    dt = tstop / steps

    n_nodes = ckt.nodes.count() - 1
    nvar = n_nodes + len(ckt.V)

    def mi(node_id):
        return -1 if node_id == 0 else node_id - 1

    def volt(x, node_id):
        return 0.0 if node_id == 0 else x[node_id - 1]

    # mutable device state (the reference keeps these on IR objects)
    v_prev = [0.0] * len(ckt.C)
    i_prev = [0.0] * len(ckt.L)
    vd_prev = [0.0] * len(ckt.D)
    is_on = [False] * len(ckt.S)

    times = []
    node_voltages = {name: [] for name in ckt.nodes.rev[1:]}
    element_currents: dict[str, list] = {}

    def stamp_adm(A, n1, n2, y):
        i1, i2 = mi(n1), mi(n2)
        if i1 >= 0:
            A[i1][i1] += y
        if i2 >= 0:
            A[i2][i2] += y
        if i1 >= 0 and i2 >= 0:
            A[i1][i2] -= y
            A[i2][i1] -= y

    def stamp_cur(b, n1, n2, cur):
        i1, i2 = mi(n1), mi(n2)
        if i1 >= 0:
            b[i1] -= cur
        if i2 >= 0:
            b[i2] += cur

    for step in range(steps + 1):
        t = step * dt
        times.append(t)
        x = np.zeros(nvar)

        for it in range(20):
            A = np.zeros((nvar, nvar))
            b = np.zeros(nvar)
            for r in ckt.R:
                stamp_adm(A, r.n1, r.n2, 1.0 / r.R)
            for k, c in enumerate(ckt.C):
                gc = c.C / max(dt, EPS)
                stamp_adm(A, c.n1, c.n2, gc)
                stamp_cur(b, c.n1, c.n2, -gc * v_prev[k])
            for k, el in enumerate(ckt.L):
                gl = max(dt, EPS) / el.L
                stamp_adm(A, el.n1, el.n2, gl)
                stamp_cur(b, el.n1, el.n2, i_prev[k])
            for k, sw in enumerate(ckt.S):
                rv = sw.model.Ron if is_on[k] else sw.model.Roff
                stamp_adm(A, sw.n1, sw.n2, 1.0 / max(abs(rv), EPS))
            for vs in ckt.V:
                vt = vs.waveform(t) if vs.waveform is not None else (
                    vs.dc if vs.dc == vs.dc and vs.dc != 0 else 0.0
                )
                i1, i2, j = mi(vs.n1), mi(vs.n2), vs.index
                if i1 >= 0:
                    A[i1][j] += 1
                    A[j][i1] += 1
                if i2 >= 0:
                    A[i2][j] -= 1
                    A[j][i2] -= 1
                b[j] += vt
            for k, d in enumerate(ckt.D):
                vd_it = volt(x, d.n_plus) - volt(x, d.n_minus)
                vd = vd_prev[k] if it == 0 else vd_it
                vth = d.model.N * VT_300K
                vd_l = min(max(vd, -1.0), 0.8)
                ev = math.exp(vd_l / vth)
                idd = d.model.Is * (ev - 1.0)
                gd = max((d.model.Is / vth) * ev, 1e-12)
                stamp_adm(A, d.n_plus, d.n_minus, gd)
                stamp_cur(b, d.n_plus, d.n_minus, idd - gd * vd_l)

            x = np.linalg.solve(A, b)

            switched = False
            for k, sw in enumerate(ckt.S):
                vctrl = volt(x, sw.nc_pos) - volt(x, sw.nc_neg)
                nxt = is_on[k]
                if is_on[k]:
                    if vctrl < sw.model.Voff:
                        nxt = False
                elif vctrl > sw.model.Von:
                    nxt = True
                if nxt != is_on[k]:
                    is_on[k] = nxt
                    switched = True
            if not switched:
                break

        for node_id in range(1, ckt.nodes.count()):
            node_voltages[ckt.nodes.rev[node_id]].append(x[node_id - 1])

        for r in ckt.R:
            element_currents.setdefault(r.name, []).append(
                (volt(x, r.n1) - volt(x, r.n2)) / r.R
            )
        for k, c in enumerate(ckt.C):
            element_currents.setdefault(c.name, []).append(
                c.C * (volt(x, c.n1) - volt(x, c.n2) - v_prev[k]) / max(dt, EPS)
            )
        for k, el in enumerate(ckt.L):
            gl = max(dt, EPS) / el.L
            element_currents.setdefault(el.name, []).append(
                gl * (volt(x, el.n1) - volt(x, el.n2)) + i_prev[k]
            )
        for vs in ckt.V:
            element_currents.setdefault(vs.name, []).append(x[vs.index])
        for k, sw in enumerate(ckt.S):
            rv = sw.model.Ron if is_on[k] else sw.model.Roff
            element_currents.setdefault(sw.name, []).append(
                (volt(x, sw.n1) - volt(x, sw.n2)) / max(abs(rv), EPS)
            )
        for d in ckt.D:
            vd = volt(x, d.n_plus) - volt(x, d.n_minus)
            vth = d.model.N * VT_300K
            element_currents.setdefault(d.name, []).append(
                d.model.Is * (math.exp(vd / vth) - 1.0)
            )

        for k, c in enumerate(ckt.C):
            v_prev[k] = volt(x, c.n1) - volt(x, c.n2)
        for k, el in enumerate(ckt.L):
            gl = max(dt, EPS) / el.L
            i_prev[k] = gl * (volt(x, el.n1) - volt(x, el.n2)) + i_prev[k]
        for k, d in enumerate(ckt.D):
            vd_prev[k] = volt(x, d.n_plus) - volt(x, d.n_minus)

    nv = {k: np.asarray(v) for k, v in node_voltages.items()}
    if ckt.tran_probes:
        upper = {p.upper() for p in ckt.tran_probes}
        nv = {k: v for k, v in nv.items() if k.upper() in upper}
    ec = {k: np.asarray(v) for k, v in element_currents.items()}
    return np.asarray(times), nv, ec
