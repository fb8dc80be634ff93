"""Transient analysis: backward-Euler companions under a compiled time scan.

Contract: /root/reference/lib/analysis/simulateTRAN.ts:14-252. The reference
runs a Python-style sequential loop per timestep with up to 20 inner
iterations, reallocating dense matrices each pass. Here the *entire* run is
one compiled program:

  - the time axis is a ``lax.scan`` carrying ``(vPrev, iPrev, vdPrev, swOn)``
    — the loop-carried state the reference mutates onto IR objects
    (simulateTRAN.ts:221-237);
  - the inner switch/Newton loop is a ``lax.while_loop`` with per-lane done
    masking (vmap-safe), reproducing the reference's exact semantics: x seeded
    to zero each step (:149), up to 20 rebuild+solve passes, exiting as soon
    as no switch toggled (:159-161) — so diodes get exactly one Newton step
    per switch-stable pass, seeded from vdPrev on the first iteration
    (:81-85);
  - all source values are precomputed over the grid (ir/circuit.py), so the
    scan body touches only arrays;
  - element currents are NOT computed in the scan: they are recovered from
    the stacked solutions afterwards in fully vectorized form (C from the
    step-to-step voltage delta, L as a cumulative sum of companion updates —
    identical values to the reference's per-step recording at :173-219).

Device models inside the step (simulateTRAN.ts:25-106):
  - C: Gc = C/max(dt,EPS), Ieq = -Gc*vPrev;
  - L: Gl = max(dt,EPS)/L, Norton current iPrev;
  - S: R = isOn ? Ron : Roff, clamped |R| >= EPS;
  - V: precomputed waveform(t) | dc;
  - D: Shockley NR companion with vd clamped to [-1.0, +0.8], gd floored at
    1e-12 (GMIN).
Switch hysteresis update (:108-128): ON->OFF when vctrl < Voff, OFF->ON when
vctrl > Von.
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
    MAX_NR_ITERS,
    VT_300K,
)
from ..ir.circuit import (
    CircuitTensors,
    bsrc_static,
    build_tensors,
    dchg_arrays,
    qchg_arrays,
    effective_time_step,
    empty_ext,
    empty_nl,
    ext_arrays,
    lk_arrays,
    nl_arrays,
    sample_source_values,
    tl_arrays,
)
from ..models.devices import bjt_ebers_moll, mos_level1
from ..ops.linsolve import solve
from ..utils.fpaccuracy import accurate_exp
from ..ops.stamps import (
    pad_solution,
    stamp_admittance,
    stamp_current,
    stamp_extended,
    stamp_mutual,
    stamp_tline_ports,
    stamp_vccs,
    stamp_voltage_source,
)
from ..parsing.netlist import ParsedCircuit
from .results import TranResult


@dataclass
class TranState:
    """Checkpoint of a transient run: the scan carry + the end time.

    The reference has no checkpoint/resume at all (SURVEY §5 — transient
    state is discarded after the run). Here long horizons run in segments:
    ``simulate_tran(..., return_state=True)`` hands back this object and
    ``simulate_tran(..., state=...)`` continues exactly where it stopped
    (same netlist/tensors; each segment's .tran spec gives the segment
    length). Arrays are host NumPy, so checkpoints are trivially
    serializable."""

    carry: tuple
    t: float
    dt: float


def _vdrop(x_pad, idx):
    return x_pad[..., idx[:, 0]] - x_pad[..., idx[:, 1]]


def _mutual_inv(l_vals, lk):
    """Inverse inductance matrix for K-coupled inductors.

    M = diag(L) + offdiag(k_ab * sqrt(L_a * L_b)) over the coupled pairs;
    returns (M^{-1}, ok) with any leading batch dims of ``l_vals``
    preserved. Inversion is nL column solves on the one-hot-pivot gj path
    (nL is tiny; jnp.linalg.inv would route f64 through the MXU, which TPUs
    lack — see ops/linsolve.py).
    """
    nl_count = l_vals.shape[-1]
    lead = l_vals.shape[:-1]
    dtype = l_vals.dtype
    eye = jnp.eye(nl_count, dtype=dtype)
    M = l_vals[..., :, None] * eye
    a = lk["k_pairs"][:, 0]
    b = lk["k_pairs"][:, 1]
    # k_vals are stored f64 in the IR; on the f32 tier the scatter target M
    # is f32 — cast explicitly (implicit f64->f32 scatter demotion is a
    # FutureWarning today and an error in future JAX; the test gate runs
    # with -W error::FutureWarning to keep it that way).
    m = (lk["k_vals"] * jnp.sqrt(l_vals[..., a] * l_vals[..., b])).astype(
        dtype)
    M = M.at[..., a, b].add(m)
    M = M.at[..., b, a].add(m)

    def col(e):
        return solve(M, jnp.broadcast_to(e, lead + (nl_count,)), method="gj")

    X, oks = jax.vmap(col, out_axes=(-1, 0))(eye)
    return X, jnp.all(oks, axis=0)


def _l_stamp(A_pad, l_idx, c, l_vals, minv):
    """Inductor companion admittance: scalar c/L per element, or the matrix
    companion c * M^{-1} when mutual couplings are present."""
    if minv is None:
        return stamp_admittance(A_pad, l_idx, c / l_vals)
    return stamp_mutual(A_pad, l_idx, c * minv)


def _l_mv(c, l_vals, minv, v):
    """(c/L) * v per element, or c * M^{-1} @ v with mutual couplings."""
    if minv is None:
        return (c / l_vals) * v
    return c * jnp.sum(minv * v[..., None, :], axis=-1)


def _stamp_nonlinear(A, b, nl, x_pad, it, vm_prev, vq_prev, vq_lim=None):
    """MOSFET/BJT Newton companions (models/devices.py). Seeds follow the
    diode convention: previous-timestep junction voltages on iteration 0,
    else the current iterate. ``vq_lim``: (..., nQ, 2) reflected-frame
    pnjlim-limited (vbe, vbc) from the .op Newton (see op._op_core)."""
    m_idx = nl["m_idx"]
    q_idx = nl["q_idx"]
    if m_idx.shape[0]:
        vgs_it = x_pad[..., m_idx[:, 1]] - x_pad[..., m_idx[:, 2]]
        vds_it = x_pad[..., m_idx[:, 0]] - x_pad[..., m_idx[:, 2]]
        if vm_prev is None:  # .op path: always the current iterate
            vgs, vds = vgs_it, vds_it
        else:
            vgs = jnp.where(it == 0, vm_prev[..., 0], vgs_it)
            vds = jnp.where(it == 0, vm_prev[..., 1], vds_it)
        gm, gds, i_eq, _ = mos_level1(
            vgs, vds, nl["m_beta"], nl["m_vto"], nl["m_lambda"], nl["m_pol"]
        )
        ds = m_idx[:, jnp.asarray([0, 2])]
        A = stamp_admittance(A, ds, gds)
        A = stamp_vccs(A, m_idx[:, jnp.asarray([0, 2, 1, 2])], gm)
        b = stamp_current(b, ds, i_eq)
    if q_idx.shape[0]:
        vbe_it = x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 2]]
        vbc_it = x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 0]]
        if vq_prev is None:
            vbe, vbc = vbe_it, vbc_it
        else:
            vbe = jnp.where(it == 0, vq_prev[..., 0], vbe_it)
            vbc = jnp.where(it == 0, vq_prev[..., 1], vbc_it)
        gbe, gbc, gmf, gmr, ibe_eq, ibc_eq, ict_eq, _, _ = bjt_ebers_moll(
            vbe, vbc, nl["q_is"], nl["q_bf"], nl["q_br"], nl["q_pol"],
            vt=nl["vt"],
            vbe_lim=None if vq_lim is None else vq_lim[..., 0],
            vbc_lim=None if vq_lim is None else vq_lim[..., 1],
        )
        be = q_idx[:, jnp.asarray([1, 2])]
        bc = q_idx[:, jnp.asarray([1, 0])]
        ce = q_idx[:, jnp.asarray([0, 2])]
        A = stamp_admittance(A, be, gbe)
        A = stamp_admittance(A, bc, gbc)
        A = stamp_vccs(A, q_idx[:, jnp.asarray([0, 2, 1, 2])], gmf)
        A = stamp_vccs(A, q_idx[:, jnp.asarray([0, 2, 1, 0])], -gmr)
        b = stamp_current(b, be, ibe_eq)
        b = stamp_current(b, bc, ibc_eq)
        b = stamp_current(b, ce, ict_eq)
    return A, b


def _bjt_junction_charge(x_pad, nl, qchg, q_idx):
    """Physical junction charges/capacitances:
    (q_be, c_be, q_bc, c_bc, cv_be, cv_bc).

    Each junction reuses the diode charge model (models/devices.py):
    b-e with (TF, CJE, VJE, MJE), b-c with (TR, CJC, VJC, MJC); reflected
    frame for PNP, charges flip back with the polarity sign. The
    exponential (diffusion) pieces evaluate at the CLAMPED junction
    voltage; the depletion piece at the TRUE voltage (a ~5 V
    reverse-biased collector junction is far outside the clamp window —
    clamping its charge freezes the committed state, see
    diode_charge_cap). ``cv_*`` is the split Newton anchor inner product
    in the stamped frame — the b-stamp is
    ``(q - q_prev)/dt - cv/dt`` with the A-stamp ``c/dt``."""
    from ..models.devices import diode_charge_cap

    s = nl["q_pol"]
    vt = nl["vt"]
    tscale = vt / VT_300K
    u_be = s * (x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 2]])
    u_bc = s * (x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 0]])
    lo = DIODE_VD_MIN * tscale
    hi = DIODE_VD_MAX * tscale
    i_s = nl["q_is"]

    def one(u, tt, cjo, vj, m):
        u_lim = jnp.clip(u, lo, hi)
        ev = accurate_exp(u_lim / vt)
        g_diff = jnp.maximum(i_s / vt * ev, GMIN)
        q_r, c = diode_charge_cap(u, i_s * (ev - 1.0), g_diff,
                                  tt, cjo, vj, m, qchg["fc"])
        cv = tt * g_diff * (s * u_lim) + (c - tt * g_diff) * (s * u)
        return s * q_r, c, cv

    q_be, c_be, cv_be = one(u_be, qchg["tf"], qchg["cje"], qchg["vje"],
                            qchg["mje"])
    q_bc, c_bc, cv_bc = one(u_bc, qchg["tr"], qchg["cjc"], qchg["vjc"],
                            qchg["mjc"])
    return q_be, c_be, q_bc, c_bc, cv_be, cv_bc


def _stamp_bsources(A, b, bsrc, x_pad, t):
    """Behavioral-source Newton companions (parsing/bexpr.py).

    Each source linearizes as f(vals) ~ f0 + sum_j g_j * (vals_j - vals0_j)
    with vals_j = x[a_j] - x[b_j]; partials come from jax.jvp against unit
    tangents (nRef is tiny and static). An I-kind source then stamps as
    per-reference VCCS rows plus a current injection; a V-kind source adds
    its branch row v(n+) - v(n-) - f = 0 with gradient couplings.
    """
    for kind, fn, i1, i2, br, refs in bsrc:
        ra = jnp.asarray([a for a, _ in refs], jnp.int32)
        rb = jnp.asarray([b2 for _, b2 in refs], jnp.int32)
        vals = x_pad[..., ra] - x_pad[..., rb]  # (..., nRef)
        f0 = fn(vals, t)
        gs = []
        lin = f0
        for j in range(len(refs)):
            e = jnp.zeros((len(refs),), vals.dtype).at[j].set(1.0)
            e = jnp.broadcast_to(e, vals.shape)
            _, gj = jax.jvp(lambda v: fn(v, t), (vals,), (e,))
            gs.append(gj)
            lin = lin - gj * vals[..., j]
        # lin = f0 - sum_j g_j vals_j  (the constant term of the companion)
        if kind == "i":
            for j, g in enumerate(gs):
                idx4 = jnp.asarray([[i1, i2, refs[j][0], refs[j][1]]])
                A = stamp_vccs(A, idx4, g[..., None])
            b = stamp_current(b, jnp.asarray([[i1, i2]]), lin[..., None])
        else:
            A = A.at[..., i1, br].add(1.0)
            A = A.at[..., i2, br].add(-1.0)
            A = A.at[..., br, i1].add(1.0)
            A = A.at[..., br, i2].add(-1.0)
            for j, g in enumerate(gs):
                A = A.at[..., br, refs[j][0]].add(-g)
                A = A.at[..., br, refs[j][1]].add(g)
            b = b.at[..., br].add(lin)
    return A, b


def _stamp_system(tensors_arrays, nvar, dt, vs_t, x, it, v_prev_c, i_prev_c,
                  i_prev_l, v_prev_l, vd_prev_d, sw_on,
                  integration: str = "be", is_first=None, is_second=None,
                  nl=None, vm_prev=None, vq_prev=None,
                  v_prev2_c=None, i_prev2_l=None, bsrc=(), t=0.0,
                  tl=None, e_t=None, dchg=None, q_prev_d=None,
                  qchg=None, q_prev_q=None):
    (r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
     s_idx, s_ron, s_roff, _s_von, _s_voff, d_idx, d_is, d_n,
     ext, minv) = tensors_arrays
    dtype = x.dtype
    lead = x.shape[:-1]  # native batch dims (Monte-Carlo variants)
    A = jnp.zeros(lead + (nvar + 1, nvar + 1), dtype=dtype)
    b = jnp.zeros(lead + (nvar + 1,), dtype=dtype)
    dt_c = jnp.maximum(dt, EPS)

    # R
    A = stamp_admittance(A, r_idx, 1.0 / r_vals)
    if integration == "trap":
        # Trapezoidal companions (2nd-order improvement toggle):
        #   C: i = (2C/dt)(v_n+1 - v_n) - i_n  -> G=2C/dt, Ieq=-(G v_n + i_n)
        #   L: i = i_n + (dt/2L)(v_n + v_n+1)  -> G=dt/2L, Isrc=i_n + G v_n
        # The t=0 record is a backward-Euler step (trap is not self-starting:
        # the zero initial companion current would inject a persistent
        # half-step error into the marginally-damped trap recurrence).
        g_c = jnp.where(is_first, c_vals / dt_c, 2.0 * c_vals / dt_c)
        A = stamp_admittance(A, c_idx, g_c)
        b = stamp_current(b, c_idx, -(g_c * v_prev_c + i_prev_c))
        c_l = jnp.where(is_first, dt_c, dt_c / 2.0)
        A = _l_stamp(A, l_idx, c_l, l_vals, minv)
        b = stamp_current(b, l_idx,
                          i_prev_l + _l_mv(c_l, l_vals, minv, v_prev_l))
    elif integration == "gear2":
        # BDF2 companions (A-stable, 2nd-order, numerically damping —
        # unlike trap it does not ring on stiff switching circuits):
        #   C: i = (C/dt)(1.5 v_{n+1} - 2 v_n + 0.5 v_{n-1})
        #   L: v = (L/dt)(1.5 i_{n+1} - 2 i_n + 0.5 i_{n-1})
        # Startup: steps 0 and 1 are backward Euler (two history points are
        # needed before the 2-step formula applies).
        startup = jnp.logical_or(is_first, is_second)
        g_c = jnp.where(startup, c_vals / dt_c, 1.5 * c_vals / dt_c)
        ieq_c = jnp.where(
            startup,
            -(c_vals / dt_c) * v_prev_c,
            -(c_vals / dt_c) * (2.0 * v_prev_c - 0.5 * v_prev2_c),
        )
        A = stamp_admittance(A, c_idx, g_c)
        b = stamp_current(b, c_idx, ieq_c)
        c_l = jnp.where(startup, dt_c, dt_c / 1.5)
        isrc_l = jnp.where(
            startup,
            i_prev_l,
            (2.0 * i_prev_l - 0.5 * i_prev2_l) / 1.5,
        )
        A = _l_stamp(A, l_idx, c_l, l_vals, minv)
        b = stamp_current(b, l_idx, isrc_l)
    else:
        # backward-Euler companions (reference semantics,
        # simulateTRAN.ts:41-53)
        g_c = c_vals / dt_c
        A = stamp_admittance(A, c_idx, g_c)
        b = stamp_current(b, c_idx, -g_c * v_prev_c)
        A = _l_stamp(A, l_idx, dt_c, l_vals, minv)
        b = stamp_current(b, l_idx, i_prev_l)
    # Switches by current hysteresis state
    r_sw = jnp.where(sw_on, s_ron, s_roff)
    g_sw = 1.0 / jnp.maximum(jnp.abs(r_sw), EPS)
    A = stamp_admittance(A, s_idx[:, :2], g_sw)
    # V sources
    n_v = v_idx.shape[0]
    A, b = stamp_voltage_source(A, b, v_idx, vs_t[..., :n_v])
    # extended-dialect current sources: direct RHS injection
    b = stamp_current(b, ext["i_idx"], vs_t[..., n_v:])
    # transmission lines: near-end topology + delayed far-end Thevenin
    # sources from the history buffer (Branin; e_t: (..., nT, 2))
    if tl is not None:
        A = stamp_tline_ports(A, tl["t_idx"], tl["z0"])
        b = b.at[..., tl["t_idx"][:, 4]].add(e_t[..., 0])
        b = b.at[..., tl["t_idx"][:, 5]].add(e_t[..., 1])
    # extended-dialect controlled sources (linear, time-invariant)
    A = stamp_extended(A, ext)
    # Diode Shockley companions
    x_pad = pad_solution(x, nvar)
    vd_iter = _vdrop(x_pad, d_idx)
    vd = jnp.where(it == 0, vd_prev_d, vd_iter)
    # the linearization clamp scales with T/300 (at 300 K it is exactly the
    # reference's fixed [-1.0, +0.8] window; a hotter junction needs a
    # proportionally wider window or the Newton sticks at the clamp)
    tscale = 1.0 if nl is None else nl["vt"] / VT_300K
    vd_lim = jnp.clip(vd, DIODE_VD_MIN * tscale, DIODE_VD_MAX * tscale)
    v_th = d_n * VT_300K
    exp_val = accurate_exp(vd_lim / v_th)
    i_d = d_is * (exp_val - 1.0)
    g_d = jnp.maximum((d_is / v_th) * exp_val, GMIN)
    ieq = i_d - g_d * vd_lim
    A = stamp_admittance(A, d_idx, g_d)
    b = stamp_current(b, d_idx, ieq)
    if dchg is not None:
        # charge-storage companion (BE): i = (q(v) - q_prev)/dt (extended
        # TT/CJO; the reference diode is memoryless). Split Newton anchor:
        # the diffusion (exponential) part linearizes at vd_lim, the
        # depletion part at the TRUE vd — the depletion charge must see
        # voltages beyond the clamp window or the junction can never
        # discharge past it (see models/devices.py diode_charge_cap)
        from ..models.devices import diode_charge_cap

        q_d, c_d = diode_charge_cap(vd, i_d, g_d, dchg["tt"],
                                    dchg["cjo"], dchg["vj"], dchg["m"],
                                    dchg["fc"])
        g_q = c_d / dt_c
        c_dep = c_d - dchg["tt"] * g_d
        A = stamp_admittance(A, d_idx, g_q)
        b = stamp_current(
            b, d_idx,
            (q_d - q_prev_d
             - dchg["tt"] * g_d * vd_lim - c_dep * vd) / dt_c)
    if nl is not None:
        A, b = _stamp_nonlinear(A, b, nl, x_pad, it, vm_prev, vq_prev)
    if qchg is not None:
        # BJT junction-charge companions (BE), one per junction; cv_* are
        # the split-anchor products (diffusion at clamped v, depletion at
        # true v — see _bjt_junction_charge)
        q_be, c_be, q_bc, c_bc, cv_be, cv_bc = _bjt_junction_charge(
            x_pad, nl, qchg, nl["q_idx"])
        be = nl["q_idx"][:, jnp.asarray([1, 2])]
        bc = nl["q_idx"][:, jnp.asarray([1, 0])]
        A = stamp_admittance(A, be, c_be / dt_c)
        b = stamp_current(
            b, be, (q_be - q_prev_q[..., 0] - cv_be) / dt_c)
        A = stamp_admittance(A, bc, c_bc / dt_c)
        b = stamp_current(
            b, bc, (q_bc - q_prev_q[..., 1] - cv_bc) / dt_c)
    if bsrc:
        A, b = _stamp_bsources(A, b, bsrc, x_pad, t)
    return A[..., :nvar, :nvar], b[..., :nvar]


def linear_system_matrix(nvar, lead, dtype, r_idx, r_vals, c_idx, g_c,
                         l_idx, c_l, l_vals, v_idx, ext, minv=None,
                         tl=None):
    """Assemble the (sliced) time-invariant LINEAR system matrix:
    R + C-companion (g_c) + L-companion (c_l/L) + V-source rows + extended
    controlled sources (+ T-line port rows). Shared by _tran_core's
    factor-once path and the parallel-in-time core
    (analysis/timeparallel.py) so the stamp conventions live in ONE place."""
    A = jnp.zeros(lead + (nvar + 1, nvar + 1), dtype=dtype)
    A = stamp_admittance(A, r_idx, 1.0 / r_vals)
    A = stamp_admittance(A, c_idx, g_c)
    A = _l_stamp(A, l_idx, c_l, l_vals, minv)
    b_dummy = jnp.zeros(lead + (nvar + 1,), dtype=dtype)
    A, _ = stamp_voltage_source(
        A, b_dummy, v_idx, jnp.zeros(v_idx.shape[:1], dtype=dtype))
    A = stamp_extended(A, ext)
    if tl is not None:  # lines are linear: Z0 port rows are time-invariant
        A = stamp_tline_ports(A, tl["t_idx"], tl["z0"])
    return A[..., :nvar, :nvar]


def _switch_update(s_idx, s_von, s_voff, sw_on, x_pad):
    """Hysteresis state transition (simulateTRAN.ts:108-128)."""
    vctrl = x_pad[..., s_idx[:, 2]] - x_pad[..., s_idx[:, 3]]
    return jnp.where(sw_on, ~(vctrl < s_voff), vctrl > s_von)


@partial(jax.jit, static_argnames=("nvar", "method", "integration", "nr",
                                   "nr_tol", "max_nr", "batch",
                                   "interpret", "record", "resume", "bsrc",
                                   "hist_len"))
def _tran_core(vs_grid, dt, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
               v_idx, s_idx, s_ron, s_roff, s_von, s_voff, d_idx, d_is, d_n,
               nvar: int, method: str = "gj", integration: str = "be",
               nr: str = "spicey", nr_tol: float = 1e-9,
               max_nr: int | None = None, ext=None, nl=None, lk=None,
               batch: int | None = None, interpret: bool = False,
               record: int | None = None, init_state=None,
               resume: bool = False, bsrc=(), times=None,
               tl=None, hist_len: int = 0, dchg=None, qchg=None,
               nr_floor=None, plan=None):
    """scan over timesteps; returns stacked (x, sw_on, valid) per step.

    Defaults reproduce the reference exactly. Improvement toggles:
      integration="trap"  second-order trapezoidal companions;
      integration="gear2" second-order BDF2 companions (A-stable AND
                          numerically damping — the stiff-circuit choice);
      nr="converged"      iterate Newton until |dx| < nr_tol*(1+|x|) instead
                          of the reference's break-on-switch-stability (which
                          gives diodes a single Newton step per pass,
                          simulateTRAN.ts:159-161).

    ``batch=B`` runs B Monte-Carlo variants natively inside one scan: value
    arrays are (B, nE), vs_grid optionally (S+1, B, nSrc), and the per-step
    solve sees one (B, N, N) system — the layout the batch-major Pallas
    kernel (ops/pallas_gj.py) tiles across lanes, which ``vmap`` over this
    core could not express. Per-variant Newton/switch settling is handled
    with a per-lane ``done`` mask (a lane freezes once stable, exactly the
    reference's per-circuit break at simulateTRAN.ts:159-161).

    ``record=i`` stacks only unknown column i per step instead of the full
    solution — (S+1, [B]) instead of (S+1, [B], nvar) — so huge Monte-Carlo
    stats runs never materialize the full trajectory in HBM.

    Checkpoint/resume: the returned 4th element is the final scan carry
    (companion/Newton/switch state). Passing it back as ``init_state`` with
    ``resume=True`` continues a run across segments — no step is re-marked
    as the t=0 quasi-DC bootstrap (simulateTRAN.ts:149 semantics apply only
    to a fresh run).
    """
    if ext is None:
        ext = empty_ext(vs_grid.dtype)
    if nl is None:
        nl = empty_nl(vs_grid.dtype)
    # K coupled inductors: the per-inductor companion generalizes to the
    # matrix companion Gamma = c * M^{-1}; M^{-1} is fixed for the whole
    # run (l_vals/k_vals don't change mid-scan), so invert once here.
    if lk is not None:
        minv, minv_ok = _mutual_inv(l_vals, lk)
    else:
        minv, minv_ok = None, None
    tensors_arrays = (r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
                      s_idx, s_ron, s_roff, s_von, s_voff, d_idx, d_is, d_n,
                      ext, minv)
    dtype = vs_grid.dtype
    lead = () if batch is None else (batch,)
    n_c = c_idx.shape[0]
    n_l = l_idx.shape[0]
    n_s = s_idx.shape[0]
    n_d = d_idx.shape[0]
    n_m = nl["m_idx"].shape[0]
    n_q = nl["q_idx"].shape[0]
    if max_nr is None:
        max_nr = MAX_NR_ITERS if nr == "spicey" else 50

    # transmission-line history machinery (Branin): per-line delay in steps
    # (clamped >= 1 — a line shorter than the timestep can't be causal on a
    # fixed grid), circular buffer of the port Thevenin values w = v + Z0*i
    n_t = 0 if tl is None else tl["t_idx"].shape[0]
    if n_t:
        # td may be (nT,) or batch-swept (B, nT) — every consumer below
        # broadcasts, and the history gather aligns index batch dims with
        # the buffer's leading batch dims explicitly
        td_steps = jnp.maximum(tl["td"] / jnp.maximum(dt, EPS), 1.0)

        def _hist_gather(w_hist, ki):
            """w_hist: (..., H, nT, 2); ki: (nT,) or (..., nT) already
            wrapped mod hist_len -> (..., nT, 2)."""
            ki_b = jnp.broadcast_to(ki, w_hist.shape[:-3] + ki.shape[-1:])
            idx = jnp.broadcast_to(
                ki_b[..., None, :, None].astype(jnp.int32),
                ki_b.shape[:-1] + (1, ki_b.shape[-1], w_hist.shape[-1]))
            return jnp.take_along_axis(w_hist, idx, axis=-3)[..., 0, :, :]

        def tline_read(w_hist, cnt):
            """Delayed far-end Thevenin sources (..., nT, 2) = (E1, E2)
            at the step about to be solved, by linear interpolation on the
            circular buffer (zeros before the wave arrives)."""
            p = cnt.astype(dtype) - td_steps          # ([B,] nT)
            k = jnp.floor(p)
            frac = (p - k)[..., None]
            ki = k.astype(jnp.int32)
            w_k = _hist_gather(w_hist, ki % hist_len)
            w_k1 = _hist_gather(w_hist, (ki + 1) % hist_len)
            w_k = jnp.where((ki >= 0)[..., None], w_k, 0.0)
            w_k1 = jnp.where((ki >= -1)[..., None], w_k1, 0.0)
            w = w_k * (1.0 - frac) + w_k1 * frac      # (..., nT, 2)
            # E1 mirrors the FAR end's w2; E2 the near end's w1
            return jnp.stack([w[..., 1], w[..., 0]], axis=-1)

        def tline_write(w_hist, cnt, x_pad):
            t_idx = tl["t_idx"]
            w1 = (x_pad[..., t_idx[:, 0]] - x_pad[..., t_idx[:, 1]]
                  + tl["z0"] * x_pad[..., t_idx[:, 4]])
            w2 = (x_pad[..., t_idx[:, 2]] - x_pad[..., t_idx[:, 3]]
                  + tl["z0"] * x_pad[..., t_idx[:, 5]])
            w_new = jnp.stack([w1, w2], axis=-1)
            return w_hist.at[..., cnt % hist_len, :, :].set(w_new)

    linear = (n_s == 0 and n_d == 0 and n_m == 0 and n_q == 0
              and not bsrc and nr == "spicey")
    if linear:
        # Linear circuit: A is time-invariant (per integration phase), so
        # factor ONCE outside the scan — each step is then a multiply by
        # the precomputed inverse plus one iterative-refinement pass,
        # instead of a full Gauss-Jordan elimination. This is the
        # factorization reuse the reference never does (it re-eliminates
        # from scratch every timestep, solveReal.ts per simulateTRAN.ts:152).
        dt_cf = jnp.maximum(dt, EPS)

        def assemble_A(first, second):
            if integration == "trap":
                g_c = jnp.where(first, c_vals / dt_cf, 2.0 * c_vals / dt_cf)
                c_l = jnp.where(first, dt_cf, dt_cf / 2.0)
            elif integration == "gear2":
                st = jnp.logical_or(first, second)
                g_c = jnp.where(st, c_vals / dt_cf, 1.5 * c_vals / dt_cf)
                c_l = jnp.where(st, dt_cf, dt_cf / 1.5)
            else:
                g_c = c_vals / dt_cf
                c_l = dt_cf
            return linear_system_matrix(
                nvar, lead, dtype, r_idx, r_vals, c_idx, g_c,
                l_idx, c_l, l_vals, v_idx, ext, minv=minv,
                tl=tl if n_t else None)

        def inv_of(A):
            def col(e):
                return solve(A, jnp.broadcast_to(e, A.shape[:-1]),
                             method="gj", plan=plan)

            X, oks = jax.vmap(col, out_axes=(-1, 0))(
                jnp.eye(nvar, dtype=dtype))
            return X, jnp.all(oks, axis=0)

        A_main = assemble_A(jnp.asarray(False), jnp.asarray(False))
        Ainv_main, ok_main = inv_of(A_main)
        if integration in ("trap", "gear2"):
            A_start = assemble_A(jnp.asarray(True), jnp.asarray(False))
            Ainv_start, ok_start = inv_of(A_start)
            factor_ok = jnp.logical_and(ok_main, ok_start)
        else:
            A_start, Ainv_start = A_main, Ainv_main
            factor_ok = ok_main

        def mv(M, v):
            # multiply+reduce, not dot: f64 dots cannot lower onto the MXU
            return jnp.sum(M * v[..., None, :], axis=-1)

    def step_fn(carry, inputs):
        vs_t, is_first, is_second, t_step = inputs
        rest = list(carry)
        valid_all = rest.pop()
        if n_t:
            t_cnt = rest.pop()
            w_hist = rest.pop()
            e_t = tline_read(w_hist, t_cnt)
        else:
            e_t = None
        q_prev_q = rest.pop() if qchg is not None else None
        q_prev_d = rest.pop() if dchg is not None else None
        (v_prev_c, i_prev_c, i_prev_l, v_prev_l, vd_prev_d, vm_prev,
         vq_prev, sw_on, v_prev2_c, i_prev2_l) = rest

        def cond(st):
            _x, _sw, it, done, _ok = st
            return jnp.logical_and(it < max_nr, ~jnp.all(done))

        def body(st):
            x, sw, it, done, ok = st
            A, b = _stamp_system(
                tensors_arrays, nvar, dt, vs_t, x, it,
                v_prev_c, i_prev_c, i_prev_l, v_prev_l, vd_prev_d, sw,
                integration=integration, is_first=is_first,
                is_second=is_second,
                nl=nl, vm_prev=vm_prev, vq_prev=vq_prev,
                v_prev2_c=v_prev2_c, i_prev2_l=i_prev2_l,
                bsrc=bsrc, t=t_step, tl=tl, e_t=e_t,
                dchg=dchg, q_prev_d=q_prev_d,
                qchg=qchg, q_prev_q=q_prev_q,
            )
            x_new, solve_ok = solve(A, b, method=method, interpret=interpret,
                                    plan=plan)
            x_pad_new = pad_solution(x_new, nvar)
            new_on = _switch_update(s_idx, s_von, s_voff, sw, x_pad_new)
            switched = jnp.any(new_on != sw, axis=-1)  # per-lane
            if nr == "converged":
                # floor the relative tolerance at 16 ulps of the working
                # dtype: the f64 default 1e-9 is not representable
                # progress in f32, so an unfloored f32 run never settles
                # and burns all max_nr passes per step. (The backend
                # exp-accuracy floor — utils/fpaccuracy.newton_tol_floor —
                # is applied by the PUBLIC entry points: it needs an
                # eager device probe, which cannot run inside this trace.)
                tol_eff = max(float(nr_tol),
                              16.0 * float(jnp.finfo(dtype).eps))
                if nr_floor is not None:
                    # ngspice's per-unknown mixed criterion
                    # (.options vntol/abstol): node-voltage rows get the
                    # vntol floor, branch-current rows abstol
                    conv = jnp.all(
                        jnp.abs(x_new - x)
                        <= tol_eff * jnp.abs(x_new) + nr_floor, axis=-1)
                else:
                    delta = (jnp.max(jnp.abs(x_new - x), axis=-1)
                             if nvar else 0.0)
                    scale = (1.0 + jnp.max(jnp.abs(x_new), axis=-1)
                             if nvar else 1.0)
                    conv = delta <= tol_eff * scale
                settled = jnp.logical_and(~switched, conv)
            else:
                settled = ~switched
            # masked commit: once done, the lane is frozen
            mask = done[..., None]
            x = jnp.where(mask, x, x_new)
            sw_out = jnp.where(mask, sw, new_on)
            ok = jnp.logical_and(ok, jnp.logical_or(done, solve_ok))
            it = it + 1
            done = jnp.logical_or(done, settled)
            return x, sw_out, it, done, ok

        x0 = jnp.zeros(lead + (nvar,), dtype=dtype)
        if linear:
            # RHS-only assembly + apply the precomputed inverse, with one
            # refinement pass (error ~ (cond*eps)^2 — indistinguishable
            # from a fresh elimination)
            dt_c = jnp.maximum(dt, EPS)
            b = jnp.zeros(lead + (nvar + 1,), dtype=dtype)
            if integration == "trap":
                g_c = jnp.where(is_first, c_vals / dt_c,
                                2.0 * c_vals / dt_c)
                b = stamp_current(b, c_idx, -(g_c * v_prev_c + i_prev_c))
                c_l = jnp.where(is_first, dt_c, dt_c / 2.0)
                b = stamp_current(
                    b, l_idx,
                    i_prev_l + _l_mv(c_l, l_vals, minv, v_prev_l))
            elif integration == "gear2":
                startup = jnp.logical_or(is_first, is_second)
                ieq_c = jnp.where(
                    startup,
                    -(c_vals / dt_c) * v_prev_c,
                    -(c_vals / dt_c) * (2.0 * v_prev_c - 0.5 * v_prev2_c),
                )
                b = stamp_current(b, c_idx, ieq_c)
                isrc_l = jnp.where(
                    startup,
                    i_prev_l,
                    (2.0 * i_prev_l - 0.5 * i_prev2_l) / 1.5,
                )
                b = stamp_current(b, l_idx, isrc_l)
            else:
                b = stamp_current(b, c_idx, -(c_vals / dt_c) * v_prev_c)
                b = stamp_current(b, l_idx, i_prev_l)
            n_v = v_idx.shape[0]
            b = b.at[..., v_idx[:, 2]].add(vs_t[..., :n_v])
            b = stamp_current(b, ext["i_idx"], vs_t[..., n_v:])
            if n_t:
                b = b.at[..., tl["t_idx"][:, 4]].add(e_t[..., 0])
                b = b.at[..., tl["t_idx"][:, 5]].add(e_t[..., 1])
            b = b[..., :nvar]
            if integration in ("trap", "gear2"):
                sel = (is_first if integration == "trap"
                       else jnp.logical_or(is_first, is_second))
                Ainv = jnp.where(sel, Ainv_start, Ainv_main)
                A_t = jnp.where(sel, A_start, A_main)
            else:
                Ainv, A_t = Ainv_main, A_main
            x = mv(Ainv, b)
            x = x + mv(Ainv, b - mv(A_t, x))
            step_ok = factor_ok
        else:
            x, sw_on, _it, _done, step_ok = jax.lax.while_loop(
                cond, body,
                (x0, sw_on, jnp.asarray(0), jnp.zeros(lead, jnp.bool_),
                 jnp.ones(lead, jnp.bool_)),
            )
        x_pad = pad_solution(x, nvar)
        # state commit (simulateTRAN.ts:221-237; trap adds the companion
        # current/voltage states its formulas carry; gear2 keeps two-step
        # voltage/current history)
        dt_c = jnp.maximum(dt, EPS)
        if n_c:
            vd_c = _vdrop(x_pad, c_idx)
            if integration == "trap":
                # first step committed with its BE companion current
                i_prev_c = jnp.where(
                    is_first,
                    (c_vals / dt_c) * (vd_c - v_prev_c),
                    (2.0 * c_vals / dt_c) * (vd_c - v_prev_c) - i_prev_c,
                )
            v_prev2_c = v_prev_c
            v_prev_c = vd_c
        if n_l:
            vd_l = _vdrop(x_pad, l_idx)
            i_prev2_l_new = i_prev_l
            if integration == "trap":
                i_prev_l = i_prev_l + jnp.where(
                    is_first,
                    _l_mv(dt_c, l_vals, minv, vd_l),
                    _l_mv(dt_c / 2.0, l_vals, minv, v_prev_l + vd_l),
                )
                v_prev_l = vd_l
            elif integration == "gear2":
                startup = jnp.logical_or(is_first, is_second)
                i_prev_l = jnp.where(
                    startup,
                    i_prev_l + _l_mv(dt_c, l_vals, minv, vd_l),
                    _l_mv(dt_c / 1.5, l_vals, minv, vd_l)
                    + (2.0 * i_prev_l - 0.5 * i_prev2_l) / 1.5,
                )
            else:
                i_prev_l = i_prev_l + _l_mv(dt_c, l_vals, minv, vd_l)
            i_prev2_l = i_prev2_l_new
        vd_prev_d = _vdrop(x_pad, d_idx) if n_d else vd_prev_d
        if dchg is not None:
            # commit the charge at the accepted solution — diffusion part
            # at the clamped voltage (companion consistency with the
            # stamping), depletion at the TRUE voltage (so reverse swings
            # past the clamp window keep accumulating drained charge)
            from ..models.devices import diode_charge_cap

            tsc = 1.0 if nl is None else nl["vt"] / VT_300K
            vd_c = jnp.clip(vd_prev_d, DIODE_VD_MIN * tsc,
                            DIODE_VD_MAX * tsc)
            v_th_d = d_n * VT_300K
            ev_c = accurate_exp(vd_c / v_th_d)
            q_prev_d, _ = diode_charge_cap(
                vd_prev_d, d_is * (ev_c - 1.0),
                jnp.maximum((d_is / v_th_d) * ev_c, GMIN),
                dchg["tt"], dchg["cjo"], dchg["vj"], dchg["m"], dchg["fc"])
        if qchg is not None:
            q_be_n, _, q_bc_n, _, _, _ = _bjt_junction_charge(
                x_pad, nl, qchg, nl["q_idx"])
            q_prev_q = jnp.stack([q_be_n, q_bc_n], axis=-1)
        if n_m:
            m_idx = nl["m_idx"]
            vm_prev = jnp.stack(
                [x_pad[..., m_idx[:, 1]] - x_pad[..., m_idx[:, 2]],
                 x_pad[..., m_idx[:, 0]] - x_pad[..., m_idx[:, 2]]],
                axis=-1,
            )
        if n_q:
            q_idx = nl["q_idx"]
            vq_prev = jnp.stack(
                [x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 2]],
                 x_pad[..., q_idx[:, 1]] - x_pad[..., q_idx[:, 0]]],
                axis=-1,
            )
        valid_all = jnp.logical_and(valid_all, step_ok)
        carry = [v_prev_c, i_prev_c, i_prev_l, v_prev_l, vd_prev_d,
                 vm_prev, vq_prev, sw_on, v_prev2_c, i_prev2_l]
        if dchg is not None:
            carry.append(q_prev_d)
        if qchg is not None:
            carry.append(q_prev_q)
        if n_t:
            carry.extend([tline_write(w_hist, t_cnt, x_pad), t_cnt + 1])
        carry.append(valid_all)
        out = x if record is None else x[..., record]
        return tuple(carry), (out, sw_on)

    init_valid = jnp.ones(lead, jnp.bool_)
    if minv_ok is not None:  # singular coupling matrix flags every lane
        init_valid = jnp.logical_and(init_valid, minv_ok)
    if init_state is None:
        init = (
            jnp.zeros(lead + (n_c,), dtype=dtype),
            jnp.zeros(lead + (n_c,), dtype=dtype),
            jnp.zeros(lead + (n_l,), dtype=dtype),
            jnp.zeros(lead + (n_l,), dtype=dtype),
            jnp.zeros(lead + (n_d,), dtype=dtype),
            jnp.zeros(lead + (n_m, 2), dtype=dtype),
            jnp.zeros(lead + (n_q, 2), dtype=dtype),
            jnp.zeros(lead + (n_s,), jnp.bool_),
            jnp.zeros(lead + (n_c,), dtype=dtype),
            jnp.zeros(lead + (n_l,), dtype=dtype),
        )
        if dchg is not None:  # diode charge state (q(0) = 0: at rest)
            init = init + (jnp.zeros(lead + (n_d,), dtype=dtype),)
        if qchg is not None:  # BJT junction charges (b-e, b-c)
            init = init + (jnp.zeros(lead + (n_q, 2), dtype=dtype),)
        if n_t:
            init = init + (
                jnp.zeros(lead + (hist_len, n_t, 2), dtype=dtype),
                jnp.asarray(0, jnp.int32),
            )
        init = init + (init_valid,)
    else:
        init = tuple(init_state) + (init_valid,)
    n_steps = vs_grid.shape[0]
    first_flags = (jnp.zeros(n_steps, jnp.bool_) if resume
                   else jnp.arange(n_steps) == 0)
    second_flags = (jnp.zeros(n_steps, jnp.bool_) if resume
                    else jnp.arange(n_steps) == 1)
    if times is None:  # absolute times (behavioral sources reference them)
        times = jnp.arange(n_steps, dtype=vs_grid.dtype) * dt
    carry, (xs, sw_states) = jax.lax.scan(
        step_fn, init, (vs_grid, first_flags, second_flags, times)
    )
    return xs, sw_states, carry[-1], carry[:-1]


@jax.jit
def _pack_tran_result(xs, sw_states, valid):
    """Fuse the host-boundary packing into one program (one dispatch):
    [solution | switch states | validity] -> (steps+1, nvar + n_s + 1)."""
    return jnp.concatenate(
        [xs, sw_states.astype(xs.dtype),
         jnp.full((xs.shape[0], 1), valid, xs.dtype)], axis=1)


# compile-latency-first clones for the tiny host-CPU path (see
# utils/placement.TINY_COMPILER_OPTIONS): identical programs, much
# faster XLA:CPU compile — the dominant cost of an interactive cold call
from ..utils.placement import TINY_COMPILER_OPTIONS as _TINY_OPTS

_tran_core_tiny = partial(
    jax.jit, static_argnames=("nvar", "method", "integration", "nr",
                              "nr_tol", "max_nr", "batch", "interpret",
                              "record", "resume", "bsrc", "hist_len"),
    compiler_options=_TINY_OPTS)(_tran_core.__wrapped__)
_pack_tran_result_tiny = jax.jit(
    _pack_tran_result.__wrapped__, compiler_options=_TINY_OPTS)


def _tline_hist_len(tensors: CircuitTensors, dt: float) -> int:
    """Circular-buffer length covering the longest line delay (+2 slots
    for the interpolation pair and the in-flight write). Static per run."""
    if tensors.n_t == 0:
        return 0
    steps = np.maximum(tensors.t_td / max(dt, EPS), 1.0)
    return int(np.ceil(steps.max())) + 2


def _element_currents(tensors: CircuitTensors, xs, sw_states, dt,
                      integration: str = "be",
                      src_grid=None, state0=None,
                      resumed: bool | None = None) -> dict[str, np.ndarray]:
    """Vectorized post-scan recovery of per-step element currents
    (simulateTRAN.ts:173-219). The C/L companion recurrences unroll into
    (alternating-sign) cumulative sums over the stacked solutions, so no
    per-step work happens inside the compiled scan.

    ``state0``: the carry the scan started from — supplies the initial
    companion voltages/currents the recurrences need. Set for BOTH resumed
    segments and fresh .ic runs; ``resumed`` distinguishes them (fresh runs
    keep the BE bootstrap rows for trap/gear2, a resumed segment does not
    repeat them)."""
    xs_pad = np.concatenate([xs, np.zeros((xs.shape[0], 1))], axis=1)
    dt_c = max(dt, EPS)
    out: dict[str, np.ndarray] = {}
    has0 = state0 is not None
    if resumed is None:
        resumed = has0
    v_prev_c0 = np.asarray(state0[0]) if has0 else np.zeros(tensors.n_c)
    i_prev_c0 = np.asarray(state0[1]) if has0 else np.zeros(tensors.n_c)
    i_prev_l0 = np.asarray(state0[2]) if has0 else np.zeros(tensors.n_l)
    v_prev_l0 = np.asarray(state0[3]) if has0 else np.zeros(tensors.n_l)
    v_prev2_c0 = np.asarray(state0[8]) if has0 else np.zeros(tensors.n_c)
    i_prev2_l0 = np.asarray(state0[9]) if has0 else np.zeros(tensors.n_l)

    def vdrop(idx):
        return xs_pad[:, idx[:, 0]] - xs_pad[:, idx[:, 1]]  # (S+1, nE)

    if tensors.n_r:
        i_r = vdrop(tensors.r_idx) / tensors.r_vals[None, :]
        for k, name in enumerate(tensors.r_names):
            out[name] = i_r[:, k]
    if tensors.n_c:
        vd = vdrop(tensors.c_idx)
        prev = np.concatenate([v_prev_c0[None, :], vd[:-1]], axis=0)
        if integration == "trap":
            # fresh run: step 0 is BE (i_0 = (C/dt) v_0); k>=1 follows the
            # trap recurrence i_k = (2C/dt)(v_k - v_{k-1}) - i_{k-1}, which
            # telescopes to an alternating cumulative sum (plus the carried
            # initial companion current when resuming)
            a = 2.0 * tensors.c_vals[None, :] * (vd - prev) / dt_c
            if not resumed:
                a[0] = tensors.c_vals * (vd[0] - v_prev_c0) / dt_c
            sign = (-1.0) ** np.arange(a.shape[0])[:, None]
            i_c = sign * np.cumsum(sign * a, axis=0)
            if has0:
                i_c = i_c - sign * i_prev_c0[None, :]
        elif integration == "gear2":
            # direct BDF2 difference; first two rows of a fresh run are the
            # BE startup steps
            prev2 = np.concatenate(
                [v_prev2_c0[None, :], prev[:-1]], axis=0)
            i_c = (tensors.c_vals[None, :] / dt_c) * (
                1.5 * vd - 2.0 * prev + 0.5 * prev2)
            if not resumed:
                i_c[0] = tensors.c_vals * (vd[0] - v_prev_c0) / dt_c
                if vd.shape[0] > 1:
                    i_c[1] = tensors.c_vals * (vd[1] - vd[0]) / dt_c
        else:
            i_c = tensors.c_vals[None, :] * (vd - prev) / dt_c
        for k, name in enumerate(tensors.c_names):
            out[name] = i_c[:, k]
    if tensors.n_l:
        vd = vdrop(tensors.l_idx)
        if tensors.n_k:
            # K-coupled: companion updates are c * M^{-1} @ vd (host-side
            # analog of the scan's _l_mv; see _mutual_inv)
            M = np.diag(tensors.l_vals.astype(np.float64))
            a = tensors.k_pairs[:, 0]
            b = tensors.k_pairs[:, 1]
            m = tensors.k_vals * np.sqrt(
                tensors.l_vals[a] * tensors.l_vals[b])
            M[a, b] += m
            M[b, a] += m
            minv_h = np.linalg.inv(M)
            lmv = lambda c, v: c * (v @ minv_h.T)
        else:
            lmv = lambda c, v: (c / tensors.l_vals) * v
        if integration == "trap":
            prev = np.concatenate([v_prev_l0[None, :], vd[:-1]], axis=0)
            inc = lmv(dt_c / 2.0, prev + vd)
            if not resumed:
                inc[0] = lmv(dt_c, vd[0])  # BE first step
            i_l = i_prev_l0[None, :] + np.cumsum(inc, axis=0)
        elif integration == "gear2":
            # two-step recurrence: i_k = (dt/1.5L) v_k + (2 i_{k-1} -
            # 0.5 i_{k-2}) / 1.5, BE for the fresh-run startup rows
            i_l = np.zeros_like(vd)
            im1, im2 = i_prev_l0, i_prev2_l0
            for k in range(vd.shape[0]):
                if not resumed and k < 2:
                    ik = im1 + lmv(dt_c, vd[k])
                else:
                    ik = lmv(dt_c / 1.5, vd[k]) + (2.0 * im1 - 0.5 * im2) / 1.5
                i_l[k] = ik
                im2, im1 = im1, ik
        else:
            i_l = i_prev_l0[None, :] + np.cumsum(lmv(dt_c, vd), axis=0)
        for k, name in enumerate(tensors.l_names):
            out[name] = i_l[:, k]
    for k, name in enumerate(tensors.v_names):
        out[name] = xs[:, tensors.v_idx[k, 2]]
    if tensors.n_g:
        vc = (xs_pad[:, tensors.g_idx[:, 2]]
              - xs_pad[:, tensors.g_idx[:, 3]])
        i_g = tensors.g_gm[None, :] * vc
        for k, name in enumerate(tensors.g_names):
            out[name] = i_g[:, k]
    for k, name in enumerate(tensors.e_names):
        out[name] = xs[:, tensors.e_idx[k, 2]]
    for k, name in enumerate(tensors.f_names):
        out[name] = tensors.f_gain[k] * xs[:, tensors.f_idx[k, 2]]
    for k, name in enumerate(tensors.h_names):
        out[name] = xs[:, tensors.h_idx[k, 2]]
    if tensors.n_i and src_grid is not None:
        for k, name in enumerate(tensors.i_names):
            out[name] = np.asarray(src_grid[:, tensors.n_v + k])
    if tensors.n_s:
        r_sw = np.where(sw_states, tensors.s_ron[None, :],
                        tensors.s_roff[None, :])
        i_s = vdrop(tensors.s_idx[:, :2]) / np.maximum(np.abs(r_sw), EPS)
        for k, name in enumerate(tensors.s_names):
            out[name] = i_s[:, k]
    if tensors.n_d:
        vd = vdrop(tensors.d_idx)
        v_th = tensors.d_n[None, :] * VT_300K
        with np.errstate(over="ignore"):
            i_d = tensors.d_is[None, :] * (np.exp(vd / v_th) - 1.0)
        if tensors.has_d_charge:
            # capacitive current (q_k - q_{k-1})/dt on top of the Shockley
            # part; q evaluated the SAME way the scan committed it
            # (diffusion at the clamped voltage, depletion at the true one)
            from ..models.devices import diode_charge_cap

            tsc = tensors.vt / VT_300K
            vd_c = np.clip(vd, DIODE_VD_MIN * tsc, DIODE_VD_MAX * tsc)
            ev_c = np.exp(vd_c / v_th)
            q, _ = diode_charge_cap(
                vd, tensors.d_is[None, :] * (ev_c - 1.0),
                np.maximum(tensors.d_is[None, :] / v_th * ev_c, GMIN),
                tensors.d_tt[None, :], tensors.d_cjo[None, :],
                tensors.d_vj[None, :], tensors.d_m[None, :],
                tensors.d_fc[None, :], xp=np)
            q0 = (np.asarray(state0[10]) if has0
                  else np.zeros(tensors.n_d))
            q_prev = np.concatenate([q0[None, :], q[:-1]], axis=0)
            i_d = i_d + (q - q_prev) / dt_c
        for k, name in enumerate(tensors.d_names):
            out[name] = i_d[:, k]
    if tensors.n_m:
        vgs = xs_pad[:, tensors.m_idx[:, 1]] - xs_pad[:, tensors.m_idx[:, 2]]
        vds = xs_pad[:, tensors.m_idx[:, 0]] - xs_pad[:, tensors.m_idx[:, 2]]
        # host NumPy evaluation (xp=np): this epilogue is on the
        # interactive answer path — a jnp call here dispatches to the
        # default accelerator and charges a cold deck the whole backend
        # handshake
        _, _, _, i_m = mos_level1(
            vgs, vds, tensors.m_beta[None, :], tensors.m_vto[None, :],
            tensors.m_lambda[None, :], tensors.m_polarity[None, :], xp=np,
        )
        for k, name in enumerate(tensors.m_names):
            out[name] = i_m[:, k]
    if tensors.n_q:
        vbe = xs_pad[:, tensors.q_idx[:, 1]] - xs_pad[:, tensors.q_idx[:, 2]]
        vbc = xs_pad[:, tensors.q_idx[:, 1]] - xs_pad[:, tensors.q_idx[:, 0]]
        # recording convention: full nonlinear currents WITHOUT the
        # Newton clamp, mirroring the reference's unclamped diode
        # recording (simulateTRAN.ts:207-219)
        *_, i_c, _i_b = bjt_ebers_moll(
            vbe, vbc, tensors.q_is[None, :], tensors.q_bf[None, :],
            tensors.q_br[None, :], tensors.q_polarity[None, :],
            vt=tensors.vt,
            vbe_lim=tensors.q_polarity[None, :] * vbe,
            vbc_lim=tensors.q_polarity[None, :] * vbc,
            xp=np,
        )
        if tensors.has_q_charge:
            # collector terminal current loses the b->c junction charge
            # current: i_c_total = i_c - dq_bc/dt (companion-consistent
            # clamped voltages — the b-c half of _bjt_junction_charge,
            # host NumPy like the rest of this epilogue)
            from ..models.devices import diode_charge_cap

            s = tensors.q_polarity[None, :]
            vt_q = tensors.vt
            tsc_q = vt_q / VT_300K
            u_bc = s * vbc
            u_lim = np.clip(u_bc, DIODE_VD_MIN * tsc_q,
                            DIODE_VD_MAX * tsc_q)
            ev_bc = np.exp(u_lim / vt_q)
            g_diff = np.maximum(tensors.q_is[None, :] / vt_q * ev_bc, GMIN)
            q_bc_r, _ = diode_charge_cap(
                u_bc, tensors.q_is[None, :] * (ev_bc - 1.0), g_diff,
                tensors.q_chg[None, :, 1], tensors.q_chg[None, :, 5],
                tensors.q_chg[None, :, 6], tensors.q_chg[None, :, 7],
                tensors.q_chg[None, :, 8], xp=np)
            q_bc = s * q_bc_r
            q0_pos = 10 + (1 if tensors.has_d_charge else 0)
            q0 = (np.asarray(state0[q0_pos])[:, 1] if has0
                  else np.zeros(tensors.n_q))
            q_bc_prev = np.concatenate([q0[None, :], q_bc[:-1]], axis=0)
            i_c = i_c - (q_bc - q_bc_prev) / dt_c
        for k, name in enumerate(tensors.q_names):
            out[name] = i_c[:, k]
    if tensors.n_t:
        # port currents ARE branch unknowns; <name> = port 1, <name>#p2
        for k, name in enumerate(tensors.t_names):
            out[name] = xs_pad[:, tensors.t_idx[k, 4]]
            out[f"{name}#p2"] = xs_pad[:, tensors.t_idx[k, 5]]
    return out


def simulate_tran(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    integration: str = "be",
    nr: str = "spicey",
    nr_tol: float = 1e-9,
    max_nr: int | None = None,
    interpret: bool = False,
    state: TranState | None = None,
    return_state: bool = False,
    nr_vntol: float | None = None,
    nr_abstol: float | None = None,
) -> TranResult | None:
    """Transient analysis. Defaults reproduce the reference; see _tran_core
    for the `integration`/`nr` improvement toggles.

    Checkpoint/resume: ``return_state=True`` attaches the final companion/
    Newton/switch state to the result (``result.state``); passing it back
    via ``state=`` runs the netlist's .tran spec as the NEXT segment of the
    same run — times continue from the checkpoint, sources are sampled at
    absolute time, and no quasi-DC bootstrap step is repeated."""
    if ckt.tran is None:
        return None
    if integration not in ("be", "trap", "gear2"):
        raise ValueError("integration must be 'be', 'trap', or 'gear2'")
    if nr not in ("spicey", "converged"):
        raise ValueError("nr must be 'spicey' or 'converged'")
    if tensors is None:
        tensors = build_tensors(ckt)
    # MOSFET/BJT devices are extended-dialect (no reference-parity contract)
    # and genuinely need Newton iteration; auto-upgrade from the reference's
    # break-on-switch-stability semantics
    if (tensors.n_m or tensors.n_q or ckt.B) and nr == "spicey":
        nr = "converged"
    # NOTE: the converged-mode backend exp-accuracy tolerance floor
    # (newton_tol_floor) moved BELOW the interp dispatch: its probe is an
    # eager device dispatch, which would charge every interactive
    # MOSFET/BJT deck the full accelerator-handshake latency the interp
    # tier exists to avoid. The interp loop applies the dtype half of the
    # floor itself (16 f64 ulps); the exp half is inert on host libm.

    dt, steps = effective_time_step(ckt.tran.dt, ckt.tran.tstop)
    if state is None:
        times = np.arange(steps + 1, dtype=np.float64) * dt
    else:
        if abs(state.dt - dt) > EPS:
            raise ValueError(
                f"resume dt {dt} differs from checkpoint dt {state.dt}")
        # rebuild the absolute grid from the integer step count: computing
        # state.t + k*dt accumulates fp error that can move a sample across
        # a nanosecond PULSE edge and flip switch trajectories
        step0 = round(state.t / dt)
        times = (step0 + np.arange(1, steps + 1, dtype=np.float64)) * dt
    vs_grid = sample_source_values(ckt, times)  # (S+1, nV)

    init_state = None
    init_carry_np = None  # fresh-run .ic carry for element-current recovery
    if state is not None:
        init_state = tuple(jnp.asarray(a) for a in state.carry)
    elif (ckt.initial_conditions
          or any(c.ic is not None for c in ckt.C)
          or any(el.ic is not None for el in ckt.L)):
        # extended .ic: capacitor companion state starts at the specified
        # node voltages (unspecified nodes at 0), so the t=0 bootstrap pins
        # each capacitor near its initial condition. Element-level ``ic=``
        # overrides per element (and is the only way to seed an inductor
        # CURRENT). The reference has no .ic/uic support at all
        # (simulateTRAN.ts:149 starts from rest).
        ic = {k.upper(): v for k, v in ckt.initial_conditions.items()}
        node_v = np.zeros(tensors.nvar + 1)
        for i, name in enumerate(tensors.node_names):
            node_v[i] = ic.get(name.upper(), 0.0)
        v_ic = (node_v[tensors.c_idx[:, 0]]
                - node_v[tensors.c_idx[:, 1]])
        for k, c in enumerate(ckt.C):
            if c.ic is not None:
                v_ic[k] = c.ic
        i_l0 = np.zeros(tensors.n_l)
        for k, el in enumerate(ckt.L):
            if el.ic is not None:
                i_l0[k] = el.ic
        z = np.zeros
        parts = (
            v_ic, z(tensors.n_c), i_l0, z(tensors.n_l),
            z(tensors.n_d), z((tensors.n_m, 2)), z((tensors.n_q, 2)),
            np.zeros(tensors.n_s, bool), v_ic.copy(), i_l0.copy(),
        )
        if tensors.has_d_charge:
            parts = parts + (z(tensors.n_d),)
        if tensors.has_q_charge:
            parts = parts + (z((tensors.n_q, 2)),)
        if tensors.n_t:
            parts = parts + (z((_tline_hist_len(tensors, dt),
                                tensors.n_t, 2)),
                             np.int32(0))
        init_carry_np = parts
        init_state = tuple(jnp.asarray(a) for a in parts)

    # tiny transients (the reference's interactive use case) skip jax
    # entirely on the host NumPy interp tier when the run is the exact
    # reference contract (analysis/interp.py), else run on the HOST CPU
    # backend: S * NR * Nvar^3 ops cannot amortize an accelerator round
    # trip (utils/placement.py)
    from ..utils.placement import exec_device, is_tiny, is_tiny_work
    from .interp import interp_eligible_tran, interp_enabled, interp_tran

    _work = 24.0 * (steps + 1) * tensors.nvar ** 3
    # method/interpret are explicit solver-tier requests — honor them
    # (the interp tier would silently substitute its own f64 GE).
    # Fresh .ic runs are eligible: init_carry_np seeds the companion state.
    if (integration == "be" and state is None
            and not return_state
            and nr_vntol is None and nr_abstol is None
            and method == "gj" and not interpret
            and steps + 1 <= 4097 and is_tiny_work(_work)
            and interp_enabled() and interp_eligible_tran(ckt, tensors)):
        from ..constants import MAX_NR_ITERS as _MAXNR

        _default_nr = _MAXNR if nr == "spicey" else 50
        xs, sw_states, _ok = interp_tran(
            tensors, vs_grid, dt,
            max_nr if max_nr is not None else _default_nr,
            v_prev0=init_carry_np[0] if init_carry_np is not None else None,
            i_prev0=init_carry_np[2] if init_carry_np is not None else None,
            ckt=ckt, nr=nr, nr_tol=nr_tol, times=times)
        if not _ok:
            raise ValueError("Singular matrix in TRAN solve")
        return _tran_epilogue(ckt, tensors, xs, sw_states, times, vs_grid,
                              dt, integration, state, return_state=False,
                              fin_state=None, init_carry=init_carry_np)
    if nr == "converged":
        # backend exp-accuracy tolerance floor (utils/fpaccuracy.py):
        # below the measured junction-exponential noise the Newton
        # limit-cycles and burns all max_nr passes per step. Probed here,
        # on the compiled path only (see the note above).
        from ..utils.fpaccuracy import newton_tol_floor

        nr_tol = newton_tol_floor(nr_tol)
    # structured BBD tier: forced by method="schur", auto-dispatched for
    # large subckt-structured systems beyond the dense fast tiers' N=128
    # ceiling (ops/schur.py — the SAME plan the AC tier uses: the tran
    # companion stamps only touch node pairs the static patterns already
    # cover); falls back to a dense re-run on invalid
    plan = None
    if method == "schur" or (method == "gj" and tensors.nvar > 128):
        from ..ops.schur import plan_partition

        _plan_obj = plan_partition(ckt, tensors)
        if _plan_obj is not None:
            plan = _plan_obj.arrays()
        elif method == "schur":
            raise ValueError(
                "method='schur' requires block structure "
                "(subcircuit instances) the circuit does not have")
    _method = "gj" if method == "schur" else method

    _tiny = is_tiny(_work)
    _core = _tran_core_tiny if _tiny else _tran_core
    _pack = _pack_tran_result_tiny if _tiny else _pack_tran_result
    def _run(plan_arrays):
        with exec_device(_work):
            xs, sw_states, valid, fin_state = _core(
                jnp.asarray(vs_grid), jnp.asarray(dt, dtype=jnp.float64),
                jnp.asarray(tensors.r_idx), jnp.asarray(tensors.r_vals),
                jnp.asarray(tensors.c_idx), jnp.asarray(tensors.c_vals),
                jnp.asarray(tensors.l_idx), jnp.asarray(tensors.l_vals),
                jnp.asarray(tensors.v_idx),
                jnp.asarray(tensors.s_idx),
                jnp.asarray(tensors.s_ron), jnp.asarray(tensors.s_roff),
                jnp.asarray(tensors.s_von), jnp.asarray(tensors.s_voff),
                jnp.asarray(tensors.d_idx),
                jnp.asarray(tensors.d_is), jnp.asarray(tensors.d_n),
                nvar=tensors.nvar, method=_method, integration=integration,
                nr=nr, nr_tol=nr_tol, max_nr=max_nr,
                # .options vntol/abstol: ngspice's per-unknown convergence
                # floors (node-voltage rows then branch-current rows)
                nr_floor=(None if nr_vntol is None and nr_abstol is None
                          else jnp.asarray(np.where(
                              np.arange(tensors.nvar) < tensors.n_node_vars,
                              1e-6 if nr_vntol is None else nr_vntol,
                              1e-12 if nr_abstol is None else nr_abstol))),
                ext=ext_arrays(tensors), nl=nl_arrays(tensors),
                lk=lk_arrays(tensors),
                bsrc=bsrc_static(ckt, tensors.nvar),
                times=jnp.asarray(times),
                interpret=interpret,
                init_state=init_state,
                resume=state is not None,
                tl=tl_arrays(tensors),
                hist_len=_tline_hist_len(tensors, dt),
                dchg=dchg_arrays(tensors),
                qchg=qchg_arrays(tensors),
                plan=plan_arrays,
            )
            # one packed device->host transfer for the solution, switch
            # states, and the validity flag (round-trips are ~30 ms each
            # over the tunnel); packing runs as one jitted program, not
            # three eager dispatches
            return np.asarray(_pack(xs, sw_states, valid)), fin_state

    packed, fin_state = _run(plan)
    if plan is not None and not bool(packed[0, -1] > 0.5):
        # block-local pivoting failed where global pivoting may not:
        # retry the whole run dense before declaring singular
        packed, fin_state = _run(None)
    n_sw = tensors.n_s
    xs = packed[:, :tensors.nvar]
    sw_states = packed[:, tensors.nvar:tensors.nvar + n_sw] > 0.5
    if not bool(packed[0, -1] > 0.5):
        raise ValueError("Singular matrix in TRAN solve")
    return _tran_epilogue(ckt, tensors, xs, sw_states, times, vs_grid, dt,
                          integration, state, return_state, fin_state,
                          init_carry=init_carry_np)


def _tran_epilogue(ckt, tensors, xs, sw_states, times, vs_grid, dt,
                   integration, state, return_state, fin_state,
                   init_carry=None):
    """Host-side result assembly shared by the compiled engine and the
    NumPy interp tier: element-current recovery, probe filters, record
    window, checkpoint packaging.

    ``init_carry``: the initial companion carry of a FRESH .ic run — the
    element-current recurrences need the starting capacitor voltages /
    inductor currents (a resumed segment supplies them via ``state``)."""
    node_voltages = {
        name: xs[:, i] for i, name in enumerate(tensors.node_names)
    }
    element_currents = _element_currents(
        tensors, xs, sw_states, dt, integration=integration,
        src_grid=vs_grid,
        state0=state.carry if state is not None else init_carry,
        resumed=state is not None,
    )
    if ckt.B:
        # behavioral-source currents: V-kind from its branch unknown,
        # I-kind by re-evaluating the expression over the trajectory
        xs_pad_b = np.concatenate([xs, np.zeros((xs.shape[0], 1))], axis=1)
        for bsrc_el, spec in zip(
                ckt.B, bsrc_static(ckt, tensors.nvar)):
            kind, fn, _i1, _i2, br, refs = spec
            if kind == "v":
                element_currents[bsrc_el.name] = xs[:, br]
            else:
                ra = np.asarray([a for a, _ in refs], dtype=np.int64)
                rb = np.asarray([b for _, b in refs], dtype=np.int64)
                vals = jnp.asarray(xs_pad_b[:, ra] - xs_pad_b[:, rb])
                element_currents[bsrc_el.name] = np.asarray(
                    fn(vals, jnp.asarray(times)))

    # probe filter (simulateTRAN.ts:240-249): keep canonical-casing keys
    if ckt.tran_probes:
        upper = {p.upper() for p in ckt.tran_probes}
        node_voltages = {
            name: series for name, series in node_voltages.items()
            if name.upper() in upper
        }

    if getattr(ckt, "tran_iprobes", None):
        # extended .print tran i(...): filter element currents (the
        # reference recognizes only v() probes and leaves currents whole)
        upper_i = {p.upper() for p in ckt.tran_iprobes}
        element_currents = {
            name: series for name, series in element_currents.items()
            if name.upper() in upper_i
        }

    # extended ngspice-style record window: integrate from 0, keep t >=
    # tstart (resumed segments already start mid-run and keep everything)
    tstart = getattr(ckt.tran, "tstart", 0.0)
    if tstart > 0.0 and state is None:
        keep = times >= tstart - EPS
        times = times[keep]
        node_voltages = {k: v[keep] for k, v in node_voltages.items()}
        element_currents = {k: v[keep] for k, v in element_currents.items()}

    result = TranResult(
        times=times,
        node_voltages=node_voltages,
        element_currents=element_currents,
    )
    if return_state:
        result.state = TranState(
            carry=tuple(np.asarray(a) for a in fin_state),
            t=float(times[-1]), dt=dt,
        )
    return result
