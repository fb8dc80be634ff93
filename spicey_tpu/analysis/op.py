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
    EPS,
    GMIN,
    VT_300K,
)
from ..ir.circuit import (CircuitTensors, bsrc_static,
                          build_tensors, ext_arrays, nl_arrays)
from ..ops.linsolve import solve
from ..utils.fpaccuracy import accurate_exp
from ..ops.stamps import (
    pad_solution,
    stamp_admittance,
    stamp_current,
    stamp_extended,
    stamp_tline_coupling,
    stamp_tline_ports,
    stamp_voltage_source,
)
from ..parsing.netlist import ParsedCircuit
from ..analysis.tran import (_stamp_bsources, _stamp_nonlinear,
                             _switch_update)
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


def _pnjlim(vnew, vold, vt, vcrit):
    """SPICE3's pn-junction Newton limiter (devsup.c pnjlim).

    Unlike the transient engine's absolute [-1, +0.8] clamp (which is the
    reference's contract, simulateTRAN.ts:89-91, and which creates WRONG
    stationary points for junctions whose true drop exceeds the window —
    e.g. power diodes at hundreds of amps), pnjlim limits the step
    RELATIVE to the last-used junction voltage: above vcrit, voltage moves
    shrink logarithmically, so Newton walks up the exponential without
    overflowing and converges to the true solution."""
    arg = 1.0 + (vnew - vold) / vt
    v_pos = jnp.where(arg > 0.0,
                      vold + vt * jnp.log(jnp.maximum(arg, 1e-300)),
                      vcrit)
    v_neg = vt * jnp.log(jnp.maximum(vnew, 1e-300) / vt)
    v_lim = jnp.where(vold > 0.0, v_pos, v_neg)
    limit = jnp.logical_and(vnew > vcrit,
                            jnp.abs(vnew - vold) > 2.0 * vt)
    return jnp.where(limit, v_lim, vnew)


@partial(jax.jit, static_argnames=("nvar_op", "max_iters", "tol", "method",
                                   "batch", "bsrc"))
def _op_core(r_idx, r_vals, l_bidx, v_idx, v_dc, s_idx, s_ron, s_roff,
             s_von, s_voff, d_idx, d_is, d_n, i_dc, ext, nl,
             nvar_op: int, max_iters: int = 100, tol: float = 1e-12,
             method: str = "gj", batch: int | None = None, x0=None,
             bsrc=(), tl=None, node_diag=None, gshunt=None, plan=None):
    """Newton/hysteresis iteration to the DC solution.

    l_bidx: (nL, 3) = [i1, i2, branch] for the 0V inductor shorts.
    ``batch=B`` solves B corners natively: value arrays may carry a (B,)
    lead dim and each Newton pass performs one (B, N, N) solve, with
    per-lane done masking (same structure as tran._tran_core).
    """
    dtype = r_vals.dtype
    n_s = s_idx.shape[0]
    lead = () if batch is None else (batch,)

    v_th = d_n * VT_300K
    v_crit = v_th * jnp.log(v_th / (jnp.sqrt(2.0) * jnp.maximum(d_is, 1e-300)))
    q_idx = nl["q_idx"]
    n_q = q_idx.shape[0]
    vt_q = nl["vt"]
    v_crit_q = vt_q * jnp.log(
        vt_q / (jnp.sqrt(2.0) * jnp.maximum(nl["q_is"], 1e-300)))

    def assemble(x, sw_on, it, vjd, vjq):
        A = jnp.zeros(lead + (nvar_op + 1, nvar_op + 1), dtype=dtype)
        b = jnp.zeros(lead + (nvar_op + 1,), dtype=dtype)
        A = stamp_admittance(A, r_idx, 1.0 / r_vals)
        if gshunt is not None:
            # gmin-stepping homotopy: a shunt conductance from every node
            # to ground softens the Jacobian; the host wrapper steps it
            # toward 0 re-seeding from each converged stage
            A = A.at[..., node_diag, node_diag].add(gshunt)
        # L shorts: voltage-source pattern with 0 V
        A, b = stamp_voltage_source(A, b, l_bidx,
                                    jnp.zeros(l_bidx.shape[0], dtype=dtype))
        A, b = stamp_voltage_source(A, b, v_idx, v_dc)
        b = stamp_current(b, ext["i_idx"], i_dc)
        A = stamp_extended(A, ext)
        if tl is not None:
            # transmission line at DC: the theta->0 Branin steady state —
            # a differential short (v and i equal across ports), the
            # classic SPICE T-element DC behavior
            A = stamp_tline_ports(A, tl["t_idx"], tl["z0"])
            A = stamp_tline_coupling(A, tl["t_idx"], tl["z0"],
                                     -jnp.ones_like(tl["z0"]))
        r_sw = jnp.where(sw_on, s_ron, s_roff)
        A = stamp_admittance(A, s_idx[:, :2],
                             1.0 / jnp.maximum(jnp.abs(r_sw), EPS))
        x_pad = pad_solution(x, nvar_op)
        vd = x_pad[..., d_idx[:, 0]] - x_pad[..., d_idx[:, 1]]
        # pnjlim (relative, exact-converging) instead of the transient
        # engine's absolute window — see _pnjlim
        vd_lim = _pnjlim(vd, vjd, v_th, v_crit)
        ev = accurate_exp(vd_lim / v_th)
        i_d = d_is * (ev - 1.0)
        g_d = jnp.maximum((d_is / v_th) * ev, GMIN)
        A = stamp_admittance(A, d_idx, g_d)
        b = stamp_current(b, d_idx, i_d - g_d * vd_lim)
        # BJT junctions get the same pnjlim treatment (reflected frame;
        # the transient engine's absolute clamp would park a power BJT at
        # a wrong bias the moment its true vbe exceeds +0.8)
        if n_q:
            s_q = nl["q_pol"]
            vbe_r = s_q * (x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 2]])
            vbc_r = s_q * (x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 0]])
            vq_lim = jnp.stack(
                [_pnjlim(vbe_r, vjq[..., 0], vt_q, v_crit_q),
                 _pnjlim(vbc_r, vjq[..., 1], vt_q, v_crit_q)], axis=-1)
        else:
            vq_lim = vjq
        # MOSFET/BJT Newton companions, seeded from the current iterate
        # (it=1 bypasses the transient engine's prev-timestep seeding)
        A, b = _stamp_nonlinear(A, b, nl, x_pad, jnp.asarray(1), None, None,
                                vq_lim=vq_lim if n_q else None)
        if bsrc:  # behavioral sources at t=0 (time-dependent terms at DC)
            A, b = _stamp_bsources(A, b, bsrc, x_pad, jnp.asarray(0.0))
        return A[..., :nvar_op, :nvar_op], b[..., :nvar_op], vd_lim, vq_lim

    def cond(st):
        _x, _sw, _vjd, _vjq, it, done, _ok = st
        return jnp.logical_and(it < max_iters, ~jnp.all(done))

    def body(st):
        x, sw, vjd, vjq, it, done, ok = st
        A, b, vd_used, vq_used = assemble(x, sw, it, vjd, vjq)
        x_new, solve_ok = solve(A, b, method=method, plan=plan)
        x_pad = pad_solution(x_new, nvar_op)
        new_on = _switch_update(s_idx, s_von, s_voff, sw, x_pad)
        switched = (jnp.any(new_on != sw, axis=-1) if n_s
                    else jnp.zeros(lead, jnp.bool_))
        delta = (jnp.max(jnp.abs(x_new - x), axis=-1) if nvar_op
                 else jnp.zeros(lead))
        scale = 1.0 + (jnp.max(jnp.abs(x_new), axis=-1) if nvar_op else 0.0)
        settled = jnp.logical_and(~switched, delta <= tol * scale)
        mask = done[..., None]
        x = jnp.where(mask, x, x_new)
        sw = jnp.where(mask, sw, new_on)
        vjd = jnp.where(mask, vjd, vd_used) if vjd.shape[-1] else vjd
        vjq = (jnp.where(mask[..., None], vjq, vq_used)
               if n_q else vjq)
        ok = jnp.logical_and(ok, jnp.logical_or(done, solve_ok))
        it = it + 1
        done = jnp.logical_or(done, settled)
        return x, sw, vjd, vjq, it, done, ok

    if x0 is None:  # .nodeset seeds the Newton iterate; default is rest
        x0 = jnp.zeros(lead + (nvar_op,), dtype=dtype)
    else:
        x0 = jnp.broadcast_to(x0.astype(dtype), lead + (nvar_op,))
    n_d = d_idx.shape[0]
    x, sw_on, _vjd, _vjq, _it, done, ok = jax.lax.while_loop(
        cond, body,
        (x0, jnp.zeros(lead + (n_s,), jnp.bool_),
         jnp.zeros(lead + (n_d,), dtype=dtype),
         jnp.zeros(lead + (n_q, 2), dtype=dtype), jnp.asarray(0),
         jnp.zeros(lead, jnp.bool_), jnp.ones(lead, jnp.bool_)),
    )
    return x, sw_on, jnp.logical_and(ok, done)


def _op_indices(tensors: CircuitTensors):
    """Index marshaling for the op system: unknown ordering is nodes,
    then V/E/H branches (identical to the first tensors.nvar tran/AC
    unknowns), then extra 0V-short branches carrying DC inductor currents.
    Returns (nvar_op, remap, l_bidx, v_idx_op)."""
    n_l = tensors.n_l
    nvar_op = tensors.nvar + n_l
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
    v_idx_op = np.concatenate(
        [remap(tensors.v_idx[:, :2]), tensors.v_idx[:, 2:]], axis=1
    ).astype(np.int32) if tensors.n_v else np.zeros((0, 3), np.int32)
    return nvar_op, remap, l_bidx, v_idx_op


def _run_op_core(tensors, remap, l_bidx, v_idx_op, nvar_op, v_dc, i_dc,
                 r_vals, max_iters, tol, method, ext=None, nl=None,
                 batch=None, x0=None, bsrc=(), gshunt=None, plan=None):
    dump = nvar_op
    tl = None
    if tensors.n_t:
        from ..ir.circuit import tl_arrays

        tl = tl_arrays(tensors, dump=dump)
    return _op_core(
        jnp.asarray(remap(tensors.r_idx)), r_vals,
        jnp.asarray(l_bidx), jnp.asarray(v_idx_op), v_dc,
        jnp.asarray(remap(tensors.s_idx)),
        jnp.asarray(tensors.s_ron), jnp.asarray(tensors.s_roff),
        jnp.asarray(tensors.s_von), jnp.asarray(tensors.s_voff),
        jnp.asarray(remap(tensors.d_idx)),
        jnp.asarray(tensors.d_is), jnp.asarray(tensors.d_n),
        i_dc,
        ext if ext is not None else ext_arrays(tensors, dump=dump),
        nl if nl is not None else nl_arrays(tensors, dump=dump),
        nvar_op=nvar_op, max_iters=max_iters, tol=tol, method=method,
        batch=batch, x0=x0, bsrc=bsrc, tl=tl,
        node_diag=(None if gshunt is None
                   else jnp.arange(tensors.n_node_vars, dtype=jnp.int32)),
        gshunt=gshunt, plan=plan,
    )


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
    nvar_op, remap, l_bidx, v_idx_op = _op_indices(tensors)
    n_node = tensors.n_node_vars

    x0 = None
    if getattr(ckt, "nodeset", None):
        # .nodeset: initial Newton guess for the named node voltages
        # (selects the basin of attraction for multi-stable circuits)
        ns = {k.upper(): v for k, v in ckt.nodeset.items()}
        seed = np.zeros(nvar_op)
        for i, name in enumerate(tensors.node_names):
            seed[i] = ns.get(name.upper(), 0.0)
        x0 = seed  # host array: the tiny interp path below must stay jax-free

    # tiny operating points on the interp-eligible device set run on the
    # host NumPy Newton (analysis/interp.interp_op) — no jax backend
    # init, no compile, same pnjlim/ladder semantics
    from ..utils.placement import is_tiny_work
    from .interp import interp_enabled, interp_op

    _work = 24.0 * max_iters * nvar_op ** 3
    if (method == "gj" and is_tiny_work(_work) and interp_enabled()
            and not (tensors.n_m or tensors.n_q or ckt.B)):
        x, sw_np, ok = interp_op(tensors, max_iters=max_iters, tol=tol,
                                 x0=x0)
        sw_on = sw_np
        if not ok:
            raise ValueError("DC operating point did not converge")
        return _op_epilogue(ckt, tensors, x, sw_on, remap)

    # floor the tolerance at the backend's measured exp() accuracy: on
    # TPU emulated-f64 exp carries noise below which the junction Newton
    # limit-cycles — an unfloored too-tight tolerance walks the whole
    # gmin/source-stepping ladder and still reports non-convergence
    # (utils/fpaccuracy.py). AFTER the interp gate: the probe touches
    # jax, and the interp path (host libm, exact) must stay jax-free.
    from ..utils.fpaccuracy import newton_tol_floor

    tol = newton_tol_floor(tol)
    bsrc = bsrc_static(ckt, nvar_op)

    # structured BBD tier: forced by method="schur", auto-dispatched for
    # large subckt-structured op systems (ops/schur.plan_partition_op);
    # a failed schur attempt retries dense before the homotopy ladder
    plan = None
    if method == "schur" or (method == "gj" and nvar_op > 128):
        from ..ops.schur import plan_partition_op

        _plan_obj = plan_partition_op(ckt, tensors)
        if _plan_obj is not None:
            plan = _plan_obj.arrays()
        elif method == "schur":
            raise ValueError(
                "method='schur' requires block structure "
                "(subcircuit instances) the circuit does not have")
    _method = "gj" if method == "schur" else method

    def attempt(x_seed, v_scale=1.0, gshunt=None):
        x_a, sw_a, ok_a = _run_op_core(
            tensors, remap, l_bidx, v_idx_op, nvar_op,
            jnp.asarray(tensors.v_dc * v_scale),
            jnp.asarray(tensors.i_dc * v_scale),
            jnp.asarray(tensors.r_vals),
            max_iters=max_iters, tol=tol, method=_method, x0=x_seed,
            bsrc=bsrc, gshunt=gshunt, plan=plan,
        )
        packed_a = np.asarray(jnp.concatenate(
            [x_a, sw_a.astype(x_a.dtype), jnp.full((1,), ok_a, x_a.dtype)]))
        return packed_a, bool(packed_a[-1] > 0.5)

    # tiny operating points (the interactive case) run on the host CPU
    # backend — the Newton ladder is tens of microseconds of arithmetic
    # against a ~30 ms accelerator round trip per attempt
    # (utils/placement.py; same policy as simulate_ac/simulate_tran)
    from ..utils.placement import exec_device

    with exec_device(24.0 * max_iters * nvar_op ** 3):
        packed, ok = attempt(x0)
        if not ok and plan is not None:
            # block-local pivoting (or a vanished-C structural hole) failed
            # where global pivoting may not: retry dense, then the ladder
            plan = None
            packed, ok = attempt(x0)
        if not ok:
            # ngspice-style convergence aids, tried in order (each stage
            # seeds the next from its converged solution):
            # 1. gmin stepping — shunt every node with a conductance
            #    stepped from 1e-2 S down to 0;
            # 2. source stepping — ramp every independent source
            #    10% -> 100%.
            seed = x0
            for g in (1e-2, 1e-3, 1e-4, 1e-5, 1e-6, 1e-8, 1e-10, 1e-12,
                      0.0):
                packed, ok = attempt(seed, gshunt=jnp.asarray(g))
                if not ok:
                    break
                seed = jnp.asarray(packed[:nvar_op])
            if not ok:
                seed = x0
                for scale in np.linspace(0.1, 1.0, 10):
                    packed, ok = attempt(seed, v_scale=float(scale))
                    if not ok:
                        break
                    seed = jnp.asarray(packed[:nvar_op])
    x = packed[:nvar_op]
    sw_on = packed[nvar_op:nvar_op + tensors.n_s] > 0.5
    if not ok:
        raise ValueError("DC operating point did not converge")
    return _op_epilogue(ckt, tensors, x, sw_on, remap)


def _op_epilogue(ckt, tensors, x, sw_on, remap) -> OPResult:
    """Host-side OPResult assembly (element-current recovery) shared by
    the compiled Newton and the NumPy interp path."""
    n_node = tensors.n_node_vars
    nvar_op = tensors.nvar + tensors.n_l
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
        *_, i_c, _i_b = bjt_ebers_moll(
            vbe, vbc, tensors.q_is, tensors.q_bf,
            tensors.q_br, tensors.q_polarity, vt=tensors.vt,
            # record at the TRUE junction voltages (the op converged there;
            # the default clamp would misreport power devices)
            vbe_lim=tensors.q_polarity * vbe,
            vbc_lim=tensors.q_polarity * vbc)
        for k, name in enumerate(tensors.q_names):
            currents[name] = float(i_c[k])
    for bsrc_el, spec in zip(ckt.B, bsrc_static(ckt, nvar_op)):
        kind, fn, _i1, _i2, br, refs = spec
        if kind == "v":
            currents[bsrc_el.name] = float(x[br])
        else:
            vals = jnp.asarray([x_pad[a] - x_pad[b] for a, b in refs])
            currents[bsrc_el.name] = float(fn(vals, 0.0))
    for k, name in enumerate(tensors.t_names):
        currents[name] = float(x[tensors.t_idx[k, 4]])
        currents[f"{name}#p2"] = float(x[tensors.t_idx[k, 5]])
    return OPResult(node_voltages=node_voltages, element_currents=currents,
                    switch_states=switch_states)


@dataclass
class DCResult:
    """DC sweep result: per-sweep-point node voltages (extended dialect).

    For a 2D sweep (two sources), every array keeps the flattened (B1*B2,)
    layout with the SECOND source as the slow (outer) axis, ngspice-style;
    ``sweep2`` holds the outer source's value per point and ``shape2d``
    gives (B2, B1) for reshaping."""

    sweep: np.ndarray                       # (B,) swept source values
    node_voltages: dict[str, np.ndarray]    # name -> (B,)
    element_currents: dict[str, np.ndarray]
    valid: np.ndarray                       # (B,) convergence per point
    sweep2: np.ndarray | None = None        # (B,) outer source values (2D)
    shape2d: tuple[int, int] | None = None  # (B2, B1) when 2D


def simulate_dc(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    max_iters: int = 100,
    tol: float = 1e-12,
) -> DCResult | None:
    """.dc sweep (extended dialect): every sweep point is one lane of a
    single batched Newton solve — the whole transfer curve is ONE compiled
    call, not a host loop (the TPU-native answer to SPICE's serial .dc).
    """
    if ckt.dc is None:
        return None
    if tensors is None:
        tensors = build_tensors(ckt)
    spec = ckt.dc
    n1 = int(np.floor((spec.stop - spec.start) / spec.step + 0.5)) + 1
    grid1 = spec.start + spec.step * np.arange(n1)

    v_names = [n.upper() for n in tensors.v_names]
    i_names = [n.upper() for n in tensors.i_names]

    def place(col, key, label):
        if key in v_names:
            v_dc[:, v_names.index(key)] = col
        elif key in i_names:
            i_dc[:, i_names.index(key)] = col
        else:
            raise ValueError(f"Unknown .dc source {label}")

    sweep2 = shape2d = None
    if spec.src2 is not None:
        # 2D nested sweep: source 2 is the slow (outer) axis; all
        # (B2 x B1) corners solve in ONE batched Newton call
        n2 = int(np.floor((spec.stop2 - spec.start2) / spec.step2 + 0.5)) + 1
        grid2 = spec.start2 + spec.step2 * np.arange(n2)
        sweep = np.tile(grid1, n2)
        sweep2 = np.repeat(grid2, n1)
        shape2d = (n2, n1)
        B = n1 * n2
    else:
        sweep = grid1
        B = n1
    v_dc = np.broadcast_to(tensors.v_dc, (B, tensors.n_v)).copy()
    i_dc = np.broadcast_to(tensors.i_dc, (B, tensors.n_i)).copy()
    place(sweep, spec.src.upper(), spec.src)
    if spec.src2 is not None:
        place(sweep2, spec.src2.upper(), spec.src2)

    nvar_op, remap, l_bidx, v_idx_op = _op_indices(tensors)
    from ..utils.placement import exec_device, is_tiny_work
    from .interp import interp_enabled, interp_op_core

    _work = 24.0 * max_iters * B * nvar_op ** 3
    x = None
    if (method == "gj" and is_tiny_work(_work) and interp_enabled()
            and not (tensors.n_m or tensors.n_q or ckt.B)):
        # tiny sweeps, interp-eligible devices: host NumPy batched Newton
        # (analysis/interp.interp_op_core) — no jax backend init, no
        # compile. A singular batch solve falls THROUGH to the compiled
        # engine, which carries per-lane validity.
        xi, _sw, done, s_ok = interp_op_core(
            tensors, v_dc, i_dc, max_iters=max_iters, tol=tol)
        if s_ok:
            x, valid = xi, done
    if x is None:
        # backend exp-accuracy tolerance floor (see simulate_op; kept off
        # the jax-free interp path above)
        from ..utils.fpaccuracy import newton_tol_floor

        tol = newton_tol_floor(tol)
        # structured BBD tier (see simulate_op); lanes the block pivoting
        # fails retry dense as a whole sweep before surfacing invalid
        plan = None
        if method == "schur" or (method == "gj" and nvar_op > 128):
            from ..ops.schur import plan_partition_op

            _plan_obj = plan_partition_op(ckt, tensors)
            if _plan_obj is not None:
                plan = _plan_obj.arrays()
            elif method == "schur":
                raise ValueError(
                    "method='schur' requires block structure "
                    "(subcircuit instances) the circuit does not have")
        _method = "gj" if method == "schur" else method

        # tiny-but-ineligible runs still avoid the accelerator round trips
        # on the host CPU backend (utils/placement.py)
        def _dc_run(plan_arrays):
            with exec_device(_work):
                xj, sw_on, valid = _run_op_core(
                    tensors, remap, l_bidx, v_idx_op, nvar_op,
                    jnp.asarray(v_dc), jnp.asarray(i_dc),
                    jnp.asarray(tensors.r_vals),
                    max_iters=max_iters, tol=tol, method=_method, batch=B,
                    bsrc=bsrc_static(ckt, nvar_op),
                    plan=plan_arrays,
                )
                return np.asarray(jnp.concatenate(
                    [xj, valid[:, None].astype(xj.dtype)], axis=1))

        packed = _dc_run(plan)
        if plan is not None and not bool(np.all(packed[:, -1] > 0.5)):
            packed = _dc_run(None)
        x = packed[:, :nvar_op]    # (B, nvar_op)
        valid = packed[:, -1] > 0.5  # (B,)
    x_pad = np.concatenate([x, np.zeros((B, 1))], axis=1)

    node_voltages = {
        name: x[:, i] for i, name in enumerate(tensors.node_names)
    }
    currents: dict[str, np.ndarray] = {}
    ri = remap(tensors.r_idx)
    for k, name in enumerate(tensors.r_names):
        currents[name] = (x_pad[:, ri[k, 0]] - x_pad[:, ri[k, 1]]) \
            / tensors.r_vals[k]
    for k, name in enumerate(tensors.v_names):
        currents[name] = x[:, tensors.n_node_vars + k]
    for k, name in enumerate(tensors.i_names):
        currents[name] = i_dc[:, k]
    if tensors.n_m:
        mi = remap(tensors.m_idx)
        vgs = x_pad[:, mi[:, 1]] - x_pad[:, mi[:, 2]]
        vds = x_pad[:, mi[:, 0]] - x_pad[:, mi[:, 2]]
        _, _, _, i_m = mos_level1(
            vgs, vds, tensors.m_beta[None, :], tensors.m_vto[None, :],
            tensors.m_lambda[None, :], tensors.m_polarity[None, :])
        i_m = np.asarray(i_m)
        for k, name in enumerate(tensors.m_names):
            currents[name] = i_m[:, k]
    if tensors.n_q:
        qi = remap(tensors.q_idx)
        vbe = x_pad[:, qi[:, 1]] - x_pad[:, qi[:, 2]]
        vbc = x_pad[:, qi[:, 1]] - x_pad[:, qi[:, 0]]
        *_, i_c, _ = bjt_ebers_moll(
            vbe, vbc, tensors.q_is[None, :], tensors.q_bf[None, :],
            tensors.q_br[None, :], tensors.q_polarity[None, :],
            vt=tensors.vt,
            vbe_lim=tensors.q_polarity[None, :] * vbe,
            vbc_lim=tensors.q_polarity[None, :] * vbc)
        i_c = np.asarray(i_c)
        for k, name in enumerate(tensors.q_names):
            currents[name] = i_c[:, k]
    return DCResult(sweep=sweep, node_voltages=node_voltages,
                    element_currents=currents, valid=valid,
                    sweep2=sweep2, shape2d=shape2d)


@dataclass
class BatchOPResult:
    node_names: tuple[str, ...]
    x: np.ndarray      # (B, nvar_op)
    valid: np.ndarray  # (B,)

    def node_voltage(self, name: str) -> np.ndarray:
        i = [n.upper() for n in self.node_names].index(name.upper())
        return self.x[..., i]


def op_batch(
    circuit: ParsedCircuit | str,
    overrides: dict[str, np.ndarray],
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    max_iters: int = 100,
    tol: float = 1e-12,
    dialect: str = "spicey",
) -> BatchOPResult:
    """Batched DC corners: one Newton solve over all parameter variants.

    overrides sweep element values by name (R resistance, V/I DC level,
    controlled-source gains, M beta, Q Is), exactly like the other batch
    APIs."""
    from .batch import (
        _batch_size,
        _batch_values,
        _batched_ext,
        _batched_nl,
        _consumed,
        _resolve,
    )

    from ..utils.fpaccuracy import newton_tol_floor

    tol = newton_tol_floor(tol)  # backend exp-accuracy floor (simulate_op)
    ckt = _resolve(circuit, dialect=dialect)
    if tensors is None:
        tensors = build_tensors(ckt)
    B = _batch_size(overrides)
    _consumed([tensors.r_names, tensors.c_names, tensors.l_names,
               tensors.v_names, tensors.i_names, tensors.g_names,
               tensors.e_names, tensors.f_names, tensors.h_names,
               tensors.m_names, tensors.q_names], overrides)
    r_vals = _batch_values(tensors.r_vals, tensors.r_names, overrides, B)
    v_dc = _batch_values(tensors.v_dc, tensors.v_names, overrides, B)
    i_dc = _batch_values(tensors.i_dc, tensors.i_names, overrides, B)

    nvar_op, remap, l_bidx, v_idx_op = _op_indices(tensors)
    dump = nvar_op
    ext = {k: (jnp.asarray(np.where(np.asarray(v) == tensors.nvar, dump,
                                    np.asarray(v)).astype(np.int32))
               if k.endswith("idx") else v)
           for k, v in _batched_ext(tensors, overrides, B).items()}
    nl = {k: (jnp.asarray(np.where(np.asarray(v) == tensors.nvar, dump,
                                   np.asarray(v)).astype(np.int32))
              if k.endswith("idx") else v)
          for k, v in _batched_nl(tensors, overrides, B).items()}
    # structured BBD tier (see simulate_op); invalid lanes surface in the
    # per-variant valid flags like any other batch failure
    plan = None
    if method == "schur" or (method == "gj" and nvar_op > 128):
        from ..ops.schur import plan_partition_op

        _plan_obj = plan_partition_op(ckt, tensors)
        if _plan_obj is not None:
            plan = _plan_obj.arrays()
        elif method == "schur":
            raise ValueError(
                "method='schur' requires block structure "
                "(subcircuit instances) the circuit does not have")
    x, _sw, valid = _run_op_core(
        tensors, remap, l_bidx, v_idx_op, nvar_op,
        jnp.asarray(v_dc), jnp.asarray(i_dc), jnp.asarray(r_vals),
        max_iters=max_iters, tol=tol,
        method="gj" if method == "schur" else method,
        ext=ext, nl=nl, batch=B, bsrc=bsrc_static(ckt, nvar_op), plan=plan,
    )
    return BatchOPResult(node_names=tensors.node_names, x=np.asarray(x),
                         valid=np.asarray(valid))
