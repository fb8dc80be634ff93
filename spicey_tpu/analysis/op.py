"""DC operating-point analysis (.op) — an extension.

The reference has NO .op analysis (SURVEY §2.9: diodes/switches are not
stamped in AC because no DC operating point exists; `.op` lines land in
`skipped`). This module adds a proper DC solve:

  - R as conductance; C open-circuit; L as an ideal 0 V source (extra MNA
    branch unknowns appended after the V-source branches, carrying the DC
    inductor currents);
  - V/I sources at their DC values;
  - diodes via damped Newton iterations on the Shockley companion (same
    limiting constants as the transient engine) run to convergence;
  - switches via the same hysteresis update as the transient engine,
    starting OFF.

The iteration is a vmap-safe masked while_loop, so `op_batch` sweeps DC
corners in one compiled call.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DIODE_VD_MAX,
    DIODE_VD_MIN,
    EPS,
    GMIN,
    VT_300K,
)
from ..ir.circuit import CircuitTensors, build_tensors, ext_arrays, nl_arrays
from ..ops.linsolve import solve
from ..ops.stamps import (
    stamp_admittance,
    stamp_current,
    stamp_extended,
    stamp_voltage_source,
)
from ..parsing.netlist import ParsedCircuit
from ..analysis.tran import _stamp_nonlinear, _switch_update
from ..models.devices import bjt_ebers_moll, mos_level1


@dataclass
class OPResult:
    node_voltages: dict[str, float]
    element_currents: dict[str, float]
    switch_states: dict[str, bool] = None  # converged hysteresis states

    @property
    def nodeVoltages(self):
        return self.node_voltages

    @property
    def elementCurrents(self):
        return self.element_currents


@partial(jax.jit, static_argnames=("nvar_op", "max_iters", "tol", "method"))
def _op_core(r_idx, r_vals, l_bidx, v_idx, v_dc, s_idx, s_ron, s_roff,
             s_von, s_voff, d_idx, d_is, d_n, i_dc, ext, nl,
             nvar_op: int, max_iters: int = 100, tol: float = 1e-12,
             method: str = "gj"):
    """Newton/hysteresis iteration to the DC solution.

    l_bidx: (nL, 3) = [i1, i2, branch] for the 0V inductor shorts.
    """
    dtype = r_vals.dtype
    n_s = s_idx.shape[0]

    def assemble(x, sw_on, it):
        A = jnp.zeros((nvar_op + 1, nvar_op + 1), dtype=dtype)
        b = jnp.zeros((nvar_op + 1,), dtype=dtype)
        A = stamp_admittance(A, r_idx, 1.0 / r_vals)
        # L shorts: voltage-source pattern with 0 V
        A, b = stamp_voltage_source(A, b, l_bidx,
                                    jnp.zeros(l_bidx.shape[0], dtype=dtype))
        A, b = stamp_voltage_source(A, b, v_idx, v_dc)
        b = stamp_current(b, ext["i_idx"], i_dc)
        A = stamp_extended(A, ext)
        r_sw = jnp.where(sw_on, s_ron, s_roff)
        A = stamp_admittance(A, s_idx[:, :2],
                             1.0 / jnp.maximum(jnp.abs(r_sw), EPS))
        x_pad = jnp.concatenate([x, jnp.zeros((1,), dtype=dtype)])
        vd = x_pad[d_idx[:, 0]] - x_pad[d_idx[:, 1]]
        vd_lim = jnp.clip(vd, DIODE_VD_MIN, DIODE_VD_MAX)
        v_th = d_n * VT_300K
        ev = jnp.exp(vd_lim / v_th)
        i_d = d_is * (ev - 1.0)
        g_d = jnp.maximum((d_is / v_th) * ev, GMIN)
        A = stamp_admittance(A, d_idx, g_d)
        b = stamp_current(b, d_idx, i_d - g_d * vd_lim)
        # MOSFET/BJT Newton companions, seeded from the current iterate
        # (it=1 bypasses the transient engine's prev-timestep seeding)
        A, b = _stamp_nonlinear(A, b, nl, x_pad, jnp.asarray(1), None, None)
        return A[:nvar_op, :nvar_op], b[:nvar_op]

    def cond(st):
        _x, _sw, it, done, _ok = st
        return jnp.logical_and(it < max_iters, ~jnp.all(done))

    def body(st):
        x, sw, it, done, ok = st
        A, b = assemble(x, sw, it)
        x_new, solve_ok = solve(A, b, method=method)
        x_pad = jnp.concatenate(
            [x_new, jnp.zeros((1,), dtype=dtype)]
        )
        new_on = _switch_update(s_idx, s_von, s_voff, sw, x_pad)
        switched = jnp.any(new_on != sw) if n_s else jnp.asarray(False)
        delta = jnp.max(jnp.abs(x_new - x)) if nvar_op else jnp.asarray(0.0)
        scale = 1.0 + (jnp.max(jnp.abs(x_new)) if nvar_op else 0.0)
        settled = jnp.logical_and(~switched, delta <= tol * scale)
        x = jnp.where(done, x, x_new)
        sw = jnp.where(done, sw, new_on)
        ok = jnp.logical_and(ok, jnp.logical_or(done, solve_ok))
        it = it + jnp.where(done, 0, 1)
        done = jnp.logical_or(done, settled)
        return x, sw, it, done, ok

    x0 = jnp.zeros((nvar_op,), dtype=dtype)
    x, sw_on, _it, done, ok = jax.lax.while_loop(
        cond, body,
        (x0, jnp.zeros((n_s,), jnp.bool_), jnp.asarray(0),
         jnp.asarray(False), jnp.asarray(True)),
    )
    return x, sw_on, jnp.logical_and(ok, done)


def simulate_op(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    max_iters: int = 100,
    tol: float = 1e-12,
) -> OPResult:
    """Solve the DC operating point."""
    if tensors is None:
        tensors = build_tensors(ckt)
    n_node = tensors.n_node_vars
    n_v = tensors.n_v
    n_e = tensors.n_e
    n_h = tensors.n_h
    n_l = tensors.n_l
    # unknown ordering: nodes, then V/E/H branches (identical to the tran/AC
    # ordering, i.e. the first tensors.nvar unknowns), then the extra
    # 0V-short branches carrying DC inductor currents
    nvar_op = n_node + n_v + n_e + n_h + n_l
    dump = nvar_op

    def remap(idx):
        """Re-target dump-slot indices from the tran/AC system size."""
        return np.where(idx == tensors.nvar, dump, idx).astype(np.int32)

    l_bidx = np.concatenate(
        [
            remap(tensors.l_idx),
            (tensors.nvar + np.arange(n_l, dtype=np.int32))[:, None],
        ],
        axis=1,
    ) if n_l else np.zeros((0, 3), np.int32)



    x, sw_on, valid = _op_core(
        jnp.asarray(remap(tensors.r_idx)), jnp.asarray(tensors.r_vals),
        jnp.asarray(l_bidx),
        jnp.asarray(np.concatenate(
            [remap(tensors.v_idx[:, :2]), tensors.v_idx[:, 2:]], axis=1
        ).astype(np.int32) if n_v else np.zeros((0, 3), np.int32)),
        jnp.asarray(tensors.v_dc),
        jnp.asarray(remap(tensors.s_idx)),
        jnp.asarray(tensors.s_ron), jnp.asarray(tensors.s_roff),
        jnp.asarray(tensors.s_von), jnp.asarray(tensors.s_voff),
        jnp.asarray(remap(tensors.d_idx)),
        jnp.asarray(tensors.d_is), jnp.asarray(tensors.d_n),
        jnp.asarray(tensors.i_dc), ext_arrays(tensors, dump=dump),
        nl_arrays(tensors, dump=dump),
        nvar_op=nvar_op, max_iters=max_iters, tol=tol, method=method,
    )
    x = np.asarray(x)
    if not bool(np.asarray(valid)):
        raise ValueError("DC operating point did not converge")

    x_pad = np.concatenate([x, [0.0]])
    node_voltages = {
        name: float(x[i]) for i, name in enumerate(tensors.node_names)
    }
    currents: dict[str, float] = {}
    ri = remap(tensors.r_idx)
    for k, name in enumerate(tensors.r_names):
        currents[name] = float(
            (x_pad[ri[k, 0]] - x_pad[ri[k, 1]]) / tensors.r_vals[k]
        )
    for name in tensors.c_names:
        currents[name] = 0.0  # open at DC
    for k, name in enumerate(tensors.l_names):
        currents[name] = float(x[tensors.nvar + k])
    for k, name in enumerate(tensors.v_names):
        currents[name] = float(x[n_node + k])
    sw_np = np.asarray(sw_on)
    si = remap(tensors.s_idx)
    for k, name in enumerate(tensors.s_names):
        rv = tensors.s_ron[k] if sw_np[k] else tensors.s_roff[k]
        currents[name] = float(
            (x_pad[si[k, 0]] - x_pad[si[k, 1]]) / max(abs(rv), EPS)
        )
    di = remap(tensors.d_idx)
    for k, name in enumerate(tensors.d_names):
        vd = x_pad[di[k, 0]] - x_pad[di[k, 1]]
        v_th = tensors.d_n[k] * VT_300K
        currents[name] = float(tensors.d_is[k] * (np.exp(vd / v_th) - 1.0))
    for k, name in enumerate(tensors.i_names):
        currents[name] = float(tensors.i_dc[k])
    switch_states = {
        name: bool(sw_np[k]) for k, name in enumerate(tensors.s_names)
    }
    gi = remap(tensors.g_idx)
    for k, name in enumerate(tensors.g_names):
        vc = x_pad[gi[k, 2]] - x_pad[gi[k, 3]]
        currents[name] = float(tensors.g_gm[k] * vc)
    for k, name in enumerate(tensors.e_names):
        currents[name] = float(x[tensors.e_idx[k, 2]])
    for k, name in enumerate(tensors.f_names):
        currents[name] = float(tensors.f_gain[k] * x[tensors.f_idx[k, 2]])
    for k, name in enumerate(tensors.h_names):
        currents[name] = float(x[tensors.h_idx[k, 2]])
    if tensors.n_m:
        mi = remap(tensors.m_idx)
        vgs = x_pad[mi[:, 1]] - x_pad[mi[:, 2]]
        vds = x_pad[mi[:, 0]] - x_pad[mi[:, 2]]
        _, _, _, i_m = mos_level1(vgs, vds, tensors.m_beta, tensors.m_vto,
                                  tensors.m_lambda, tensors.m_polarity)
        for k, name in enumerate(tensors.m_names):
            currents[name] = float(i_m[k])
    if tensors.n_q:
        qi = remap(tensors.q_idx)
        vbe = x_pad[qi[:, 1]] - x_pad[qi[:, 2]]
        vbc = x_pad[qi[:, 1]] - x_pad[qi[:, 0]]
        *_, i_c, _i_b = bjt_ebers_moll(vbe, vbc, tensors.q_is, tensors.q_bf,
                                       tensors.q_br, tensors.q_polarity)
        for k, name in enumerate(tensors.q_names):
            currents[name] = float(i_c[k])
    return OPResult(node_voltages=node_voltages, element_currents=currents,
                    switch_states=switch_states)
