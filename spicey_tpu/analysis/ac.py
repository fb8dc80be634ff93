"""AC small-signal frequency sweep.

Contract: /root/reference/lib/analysis/simulateAC.ts:9-130. The reference
loops frequencies serially, reallocating and refactorizing an
O(Nvar^2) complex matrix per point (simulateAC.ts:80-83). Here the entire
sweep is ONE compiled program: assembly is expressed per-frequency and
``vmap``ped over the whole grid, producing a batched (F, 2N, 2N) solve that
XLA schedules as a single batched factor+solve — the frequency axis is the
parallel axis the reference leaves on the table (SURVEY.md §2 parallelism
table).

TPU-native numerics: XLA:TPU has no complex support (C128 is rejected), so
the complex system A(f) = G + j*B(f) is kept as two real float64 matrices and
solved via the equivalent 2N real block system (ops/linsolve.py
``solve_complex_blocks``). No complex dtype ever enters the compiled program;
phasors are reassembled host-side.

Stamp semantics per frequency f (simulateAC.ts:24-60):
  - R as Y = 1/R (R <= 0 raises);
  - C as Y = j*2*pi*f*C                               -> imaginary part;
  - L as Y = 1/(j*2*pi*f*L) = -j/(2*pi*f*L), open circuit when
    |2*pi*f*L| < EPS                                  -> imaginary part;
  - V as phasor fromPolar(acMag, acPhaseDeg) on its branch row.
Switches and diodes are NOT stamped in AC (no DC operating point / small-
signal linearization exists in the reference).
"""

from __future__ import annotations

import math
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
from ..ir.circuit import (CircuitTensors, build_tensors,
                          bv_branch_rows, ext_arrays, lk_arrays, tl_arrays)
from ..ops.linsolve import solve_planes
from ..ops.stamps import (
    pad_solution,
    stamp_admittance,
    stamp_current,
    stamp_extended,
    stamp_mutual,
    stamp_tline_coupling,
    stamp_tline_ports,
    stamp_voltage_source,
)
from ..parsing.netlist import ParsedCircuit
from ..utils.logspace import linear_grid, logspace, octspace
from .results import ACResult


def build_frequency_array(mode: str, N: int, f1: float, f2: float) -> np.ndarray:
    if mode == "dec":
        return logspace(f1, f2, N)
    if mode == "oct":  # extended dialect (.ac oct parses only there)
        return octspace(f1, f2, N)
    return linear_grid(f1, f2, N)


def _inductor_susceptance(f, l_vals):
    """Imag part of Y_L = -1/(2*pi*f*L), masked open when |2*pi*f*L| < EPS."""
    wl = 2.0 * jnp.pi * f * l_vals
    small = jnp.abs(wl) < EPS
    return jnp.where(small, 0.0, -1.0 / jnp.where(small, 1.0, wl))


def _assemble_one(f, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
                  v_re, v_im, nvar, ext=None, i_re=None, i_im=None,
                  minv=None, tl=None):
    """Build (A_re, A_im, b_re, b_im) for one frequency; pure scatter-adds.

    ``minv``: M^{-1} for K-coupled inductors (analysis/tran._mutual_inv).
    The coupled branch admittance matrix is Y(w) = (j*w*M)^{-1} =
    -j * M^{-1} / w, stamped into the imaginary plane with the reference's
    open-at-DC quirk applied per inductor (|w*L_a| < EPS zeroes a's rows
    and columns — the k=0 limit reduces exactly to the scalar stamp).
    """
    dtype = r_vals.dtype
    A_re = jnp.zeros((nvar + 1, nvar + 1), dtype=dtype)
    A_im = jnp.zeros((nvar + 1, nvar + 1), dtype=dtype)
    b_re = jnp.zeros((nvar + 1,), dtype=dtype)
    b_im = jnp.zeros((nvar + 1,), dtype=dtype)

    A_re = stamp_admittance(A_re, r_idx, 1.0 / r_vals)
    A_im = stamp_admittance(A_im, c_idx, 2.0 * jnp.pi * f * c_vals)
    if minv is None:
        A_im = stamp_admittance(A_im, l_idx,
                                _inductor_susceptance(f, l_vals))
    else:
        w = 2.0 * jnp.pi * f
        keep = (jnp.abs(w * l_vals) >= EPS).astype(dtype)
        w_safe = jnp.where(jnp.abs(w) < EPS, 1.0, w)
        S = (-minv / w_safe) * keep[:, None] * keep[None, :]
        A_im = stamp_mutual(A_im, l_idx, S)
    A_re, b_re = stamp_voltage_source(A_re, b_re, v_idx, v_re)
    b_im = b_im.at[v_idx[:, 2]].add(v_im)
    if ext is not None:
        # extended-dialect current sources: RHS phasor injection
        b_re = stamp_current(b_re, ext["i_idx"], i_re)
        b_im = stamp_current(b_im, ext["i_idx"], i_im)
        # controlled sources: real, frequency-independent stamps
        A_re = stamp_extended(A_re, ext)
    if tl is not None:
        # transmission lines, exact lossless phasor model: near-end Z0 rows
        # plus the far-end coupling -e^{-j w Td} split across the planes
        A_re = stamp_tline_ports(A_re, tl["t_idx"], tl["z0"])
        theta = 2.0 * jnp.pi * f * tl["td"]
        A_re = stamp_tline_coupling(A_re, tl["t_idx"], tl["z0"],
                                    -jnp.cos(theta))
        A_im = stamp_tline_coupling(A_im, tl["t_idx"], tl["z0"],
                                    jnp.sin(theta))
    return (A_re[:nvar, :nvar], A_im[:nvar, :nvar],
            b_re[:nvar], b_im[:nvar])


def _assemble_grid(freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
                   v_idx, v_re, v_im, nvar, ext=None, i_re=None,
                   i_im=None, minv=None, tl=None):
    """Assembly vmapped over the frequency grid -> (F, N, N) planes.

    ``minv`` (frequency-independent) is computed once by the caller and
    closed over, NOT re-inverted per grid point."""
    assemble = jax.vmap(
        lambda f: _assemble_one(
            f, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
            v_re, v_im, nvar, ext=ext, i_re=i_re, i_im=i_im, minv=minv,
            tl=tl,
        )
    )
    return assemble(freqs)


def _assemble_grid_batchlast(freqs, r_idx, r_vals, c_idx, c_vals,
                             l_idx, l_vals, v_idx, v_re, v_im, nvar,
                             ext=None, i_re=None, i_im=None):
    """Batch-last MNA assembly: augmented (re, im) planes laid out
    (nvar, nvar+1, B*F) — the exact layout the Pallas kernel tiles.

    The general path assembles (B, F, N, N) systems and then relayouts
    them batch-last before the kernel; at small N that transpose plus the
    batch-major scatters dominate end-to-end MC time (the N=8 solve
    kernel alone sustains ~1M systems/s while the full pipeline did
    ~180k). Here every scatter writes a full (nE, B, F) lane-major slab
    and the kernel consumes the result with NO relayout.

    Value arrays lead with a variants axis B: r/c/l_vals (B, nE),
    v_re/v_im (B, nV); ext value arrays (B, nX); i_re/i_im (nI,)
    replicated. Scalar inductors only (no K coupling) and no T lines —
    callers gate on that and fall back to the general path."""
    F = freqs.shape[0]
    B = r_vals.shape[0]
    dtype = r_vals.dtype
    n = nvar
    A_re = jnp.zeros((n + 1, n + 1, B, F), dtype)
    A_im = jnp.zeros((n + 1, n + 1, B, F), dtype)
    b_re = jnp.zeros((n + 1, B, F), dtype)
    b_im = jnp.zeros((n + 1, B, F), dtype)

    def adm(A, idx, y):
        # y: (nE, B, F) lane-major contribution slabs
        i1, i2 = idx[:, 0], idx[:, 1]
        A = A.at[i1, i1].add(y)
        A = A.at[i2, i2].add(y)
        A = A.at[i1, i2].add(-y)
        A = A.at[i2, i1].add(-y)
        return A

    w = (2.0 * jnp.pi) * freqs.astype(dtype)          # (F,)
    y_r = (1.0 / r_vals).T[:, :, None]                # (nR, B, 1)
    A_re = adm(A_re, r_idx, jnp.broadcast_to(y_r, (r_idx.shape[0], B, F)))
    y_c = c_vals.T[:, :, None] * w[None, None, :]     # (nC, B, F)
    A_im = adm(A_im, c_idx, y_c)
    wl = l_vals.T[:, :, None] * w[None, None, :]      # (nL, B, F)
    small = jnp.abs(wl) < EPS
    y_l = jnp.where(small, 0.0, -1.0 / jnp.where(small, 1.0, wl))
    A_im = adm(A_im, l_idx, y_l)

    i1, i2, j = v_idx[:, 0], v_idx[:, 1], v_idx[:, 2]
    one = jnp.ones((v_idx.shape[0], B, F), dtype)
    A_re = A_re.at[i1, j].add(one)
    A_re = A_re.at[j, i1].add(one)
    A_re = A_re.at[i2, j].add(-one)
    A_re = A_re.at[j, i2].add(-one)
    b_re = b_re.at[j].add(jnp.broadcast_to(
        v_re.T[:, :, None], (v_idx.shape[0], B, F)))
    b_im = b_im.at[j].add(jnp.broadcast_to(
        v_im.T[:, :, None], (v_idx.shape[0], B, F)))

    if ext is not None:
        ii = ext["i_idx"]

        def inj(b_p, vals):
            y = jnp.broadcast_to(
                vals.astype(dtype)[:, None, None], (ii.shape[0], B, F))
            b_p = b_p.at[ii[:, 0]].add(-y)
            return b_p.at[ii[:, 1]].add(y)

        b_re = inj(b_re, i_re)
        b_im = inj(b_im, i_im)
        # controlled sources: frequency-independent real stamps
        gi = ext["g_idx"]
        g = jnp.broadcast_to(
            jnp.asarray(ext["g_gm"], dtype).T[:, :, None],
            (gi.shape[0], B, F))
        A_re = A_re.at[gi[:, 0], gi[:, 2]].add(g)
        A_re = A_re.at[gi[:, 0], gi[:, 3]].add(-g)
        A_re = A_re.at[gi[:, 1], gi[:, 2]].add(-g)
        A_re = A_re.at[gi[:, 1], gi[:, 3]].add(g)
        ei = ext["e_idx"]
        ge = jnp.broadcast_to(
            jnp.asarray(ext["e_gain"], dtype).T[:, :, None],
            (ei.shape[0], B, F))
        onee = jnp.ones_like(ge)
        A_re = A_re.at[ei[:, 0], ei[:, 2]].add(onee)
        A_re = A_re.at[ei[:, 1], ei[:, 2]].add(-onee)
        A_re = A_re.at[ei[:, 2], ei[:, 0]].add(onee)
        A_re = A_re.at[ei[:, 2], ei[:, 1]].add(-onee)
        A_re = A_re.at[ei[:, 2], ei[:, 3]].add(-ge)
        A_re = A_re.at[ei[:, 2], ei[:, 4]].add(ge)
        fi = ext["f_idx"]
        gf = jnp.broadcast_to(
            jnp.asarray(ext["f_gain"], dtype).T[:, :, None],
            (fi.shape[0], B, F))
        A_re = A_re.at[fi[:, 0], fi[:, 2]].add(gf)
        A_re = A_re.at[fi[:, 1], fi[:, 2]].add(-gf)
        hi = ext["h_idx"]
        gh = jnp.broadcast_to(
            jnp.asarray(ext["h_r"], dtype).T[:, :, None],
            (hi.shape[0], B, F))
        oneh = jnp.ones_like(gh)
        A_re = A_re.at[hi[:, 0], hi[:, 2]].add(oneh)
        A_re = A_re.at[hi[:, 1], hi[:, 2]].add(-oneh)
        A_re = A_re.at[hi[:, 2], hi[:, 0]].add(oneh)
        A_re = A_re.at[hi[:, 2], hi[:, 1]].add(-oneh)
        A_re = A_re.at[hi[:, 2], hi[:, 3]].add(-gh)

    # augmented planes, dump slot sliced off, flat batch axis last
    ab_re = jnp.concatenate(
        [A_re[:n, :n], b_re[:n][:, None]], axis=1).reshape(n, n + 1, B * F)
    ab_im = jnp.concatenate(
        [A_im[:n, :n], b_im[:n][:, None]], axis=1).reshape(n, n + 1, B * F)
    return ab_re, ab_im


@partial(jax.jit, static_argnames=("nvar", "method", "interpret"))
def _ac_sweep_core(freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
                   v_idx, v_re, v_im, nvar: int, method: str = "gj",
                   interpret: bool = False, ext=None, i_re=None, i_im=None,
                   lk=None, tl=None, plan=None):
    """vmapped assemble + one batched solve over the whole grid.

    ``plan``: SchurPlan.arrays() dict — routes the solve through the
    structured bordered-block-diagonal tier (ops/schur.py) instead of the
    dense solver; assembly is unchanged."""
    if lk is not None:
        from .tran import _mutual_inv

        minv, minv_ok = _mutual_inv(l_vals, lk)
    else:
        minv, minv_ok = None, None
    A_re, A_im, b_re, b_im = _assemble_grid(
        freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
        v_re, v_im, nvar, ext=ext, i_re=i_re, i_im=i_im, minv=minv, tl=tl,
    )
    if plan is not None:
        from ..ops.schur import schur_solve_planes

        x_re, x_im, valid = jax.vmap(
            lambda ar, ai, br_, bi_: schur_solve_planes(
                ar, ai, br_, bi_, plan["blk_ix"], plan["blk_mask"],
                plan["if_ix"]))(A_re, A_im, b_re, b_im)
    else:
        x_re, x_im, valid = solve_planes(A_re, A_im, b_re, b_im,
                                         method=method, interpret=interpret)
    if minv_ok is not None:
        valid = jnp.logical_and(valid, minv_ok)
    return x_re, x_im, valid


@partial(jax.jit, static_argnames=("nvar", "method", "interpret"))
def _ac_sweep_packed(*args, **kwargs):
    """``_ac_sweep_core`` with the host-boundary packing fused in.

    Everything from assembly to the (F, 2N+1) packed result is ONE compiled
    program, so ``simulate_ac`` dispatches exactly one executable and does
    exactly one device->host transfer. Keeping the packing out of eager mode
    matters on remote-tunnel backends where every dispatch is a round trip."""
    x_re, x_im, valid = _ac_sweep_core.__wrapped__(*args, **kwargs)
    return jnp.concatenate(
        [x_re, x_im, valid[:, None].astype(x_re.dtype)], axis=1)


# compile-latency-first clone for the tiny host-CPU path (see
# utils/placement.TINY_COMPILER_OPTIONS): identical program, ~4x faster
# XLA:CPU compile — the dominant cost of an interactive cold call
from ..utils.placement import TINY_COMPILER_OPTIONS as _TINY_OPTS

_ac_sweep_packed_tiny = partial(
    jax.jit, static_argnames=("nvar", "method", "interpret"),
    compiler_options=_TINY_OPTS)(_ac_sweep_packed.__wrapped__)


def _element_currents(tensors: CircuitTensors, freqs, x) -> dict[str, np.ndarray]:
    """Per-element current phasors, vectorized over the grid
    (simulateAC.ts:94-126). Host-side complex128 NumPy."""
    x_pad = np.concatenate(
        [x, np.zeros((x.shape[0], 1), dtype=x.dtype)], axis=1
    )
    w = 2.0 * np.pi * freqs  # (F,)
    out: dict[str, np.ndarray] = {}

    def vdrop(idx):
        return x_pad[:, idx[:, 0]] - x_pad[:, idx[:, 1]]  # (F, nE)

    if tensors.n_r:
        i_r = vdrop(tensors.r_idx) / tensors.r_vals[None, :]
        for k, name in enumerate(tensors.r_names):
            out[name] = i_r[:, k]
    if tensors.n_c:
        y_c = 1j * w[:, None] * tensors.c_vals[None, :]
        i_c = y_c * vdrop(tensors.c_idx)
        for k, name in enumerate(tensors.c_names):
            out[name] = i_c[:, k]
    if tensors.n_l:
        vd_l = vdrop(tensors.l_idx)
        if tensors.n_k:
            # coupled branch phasors: I = -j * M^{-1} Vd / w (per-inductor
            # open-at-DC mask as in _assemble_one)
            M = np.diag(tensors.l_vals.astype(np.float64))
            a = tensors.k_pairs[:, 0]
            b = tensors.k_pairs[:, 1]
            m = tensors.k_vals * np.sqrt(
                tensors.l_vals[a] * tensors.l_vals[b])
            M[a, b] += m
            M[b, a] += m
            minv_h = np.linalg.inv(M)
            keep = (np.abs(w[:, None] * tensors.l_vals[None, :])
                    >= EPS).astype(np.float64)
            w_safe = np.where(np.abs(w) < EPS, 1.0, w)
            i_l = (-1j / w_safe[:, None]) * keep * (
                (vd_l * keep) @ minv_h.T)
        else:
            wl = w[:, None] * tensors.l_vals[None, :]
            y_l = np.where(np.abs(wl) < EPS, 0.0,
                           -1.0 / np.where(np.abs(wl) < EPS, 1.0, wl))
            i_l = (1j * y_l) * vd_l
        for k, name in enumerate(tensors.l_names):
            out[name] = i_l[:, k]
    for k, name in enumerate(tensors.v_names):
        out[name] = x[:, tensors.v_idx[k, 2]]
    if tensors.n_g:
        vc = (x_pad[:, tensors.g_idx[:, 2]]
              - x_pad[:, tensors.g_idx[:, 3]])
        i_g = tensors.g_gm[None, :] * vc
        for k, name in enumerate(tensors.g_names):
            out[name] = i_g[:, k]
    for k, name in enumerate(tensors.e_names):
        out[name] = x[:, tensors.e_idx[k, 2]]
    for k, name in enumerate(tensors.f_names):
        out[name] = tensors.f_gain[k] * x[:, tensors.f_idx[k, 2]]
    for k, name in enumerate(tensors.h_names):
        out[name] = x[:, tensors.h_idx[k, 2]]
    if tensors.n_i:
        iph = tensors.i_ac_phase_deg * np.pi / 180.0
        i_ph = tensors.i_ac_mag * np.exp(1j * iph)
        for k, name in enumerate(tensors.i_names):
            out[name] = np.full(x.shape[0], i_ph[k], dtype=np.complex128)
    if tensors.n_t:
        # port-current phasors are branch unknowns (Branin model)
        for k, name in enumerate(tensors.t_names):
            out[name] = x[:, tensors.t_idx[k, 4]]
            out[f"{name}#p2"] = x[:, tensors.t_idx[k, 5]]
    return out


def _op_voltage_pad(tensors: CircuitTensors, op) -> np.ndarray:
    """Node voltages of an OPResult laid out as a padded tran/AC-ordering
    solution vector (ground dump slot = 0 V)."""
    x_pad = np.zeros(tensors.nvar + 1)
    for i, name in enumerate(tensors.node_names):
        x_pad[i] = op.node_voltages[name]
    return x_pad


def ac_vsource_arrays(ckt: ParsedCircuit, tensors: CircuitTensors):
    """(v_idx, v_re, v_im) for the AC sweep: independent V phasors
    fromPolar(acMag, acPhaseDeg) (Complex.ts:16-19), plus V-kind behavioral
    sources' branch rows stamped as 0 V small-signal shorts so the system
    stays regular (matching the reference's policy of not stamping
    nonlinear devices). Shared by simulate_ac, sensitivity_ac and fit_ac —
    AC autodiff flows through exactly the same assembly."""
    ph = tensors.v_ac_phase_deg * math.pi / 180.0
    v_re = tensors.v_ac_mag * np.cos(ph)
    v_im = tensors.v_ac_mag * np.sin(ph)
    v_idx = tensors.v_idx
    bv = bv_branch_rows(ckt, tensors.nvar)
    if bv.shape[0]:
        v_idx = np.concatenate([tensors.v_idx, bv], axis=0)
        z = np.zeros(bv.shape[0])
        v_re = np.concatenate([v_re, z])
        v_im = np.concatenate([v_im, z])
    return v_idx, v_re, v_im


def find_input_source(tensors: CircuitTensors, name: str,
                      directive: str) -> tuple[int | None, int | None]:
    """Locate a named independent source for .tf/.noise input referencing.
    Returns (v_pos, i_pos) — exactly one is set — or raises."""
    key = name.upper()
    v_pos = next((k for k, n in enumerate(tensors.v_names)
                  if n.upper() == key), None)
    i_pos = next((k for k, n in enumerate(tensors.i_names)
                  if n.upper() == key), None)
    if v_pos is None and i_pos is None:
        raise ValueError(
            f"Unknown source {name} in {directive} (must be a V or I element)")
    return v_pos, i_pos


def format_out_spec(out_pos: str, out_neg: str | None) -> str:
    """``v(out)`` / ``v(out,ref)`` display string for .tf/.noise results."""
    return f"v({out_pos})" if out_neg is None else f"v({out_pos},{out_neg})"


def small_signal_rows(tensors: CircuitTensors, op):
    """Small-signal conductances of every nonlinear device at the DC
    operating point, expressed as VCCS rows ((n,4) idx, (n,) gm).

    An admittance g between (a, b) is the self-controlled VCCS
    [a, b, a, b]; the MOSFET gm is [d, s, g, s]; the BJT transport terms
    are [c, e, b, e] (+gmf) and [c, e, b, c] (-gmr). This is the extension
    the reference lacks entirely — its AC ignores D/S devices because no
    operating point exists (SURVEY §2.9).
    """
    from ..models.devices import bjt_ebers_moll, mos_level1

    x_pad = _op_voltage_pad(tensors, op)
    rows: list[np.ndarray] = []
    vals: list[np.ndarray] = []

    def adm(idx2, g):
        rows.append(np.concatenate([idx2, idx2], axis=1))
        vals.append(np.asarray(g, np.float64))

    if tensors.n_d:
        vd = x_pad[tensors.d_idx[:, 0]] - x_pad[tensors.d_idx[:, 1]]
        tscale = tensors.vt / VT_300K  # see tran._stamp_system
        vd_lim = np.clip(vd, DIODE_VD_MIN * tscale, DIODE_VD_MAX * tscale)
        v_th = tensors.d_n * VT_300K
        g_d = np.maximum(tensors.d_is / v_th * np.exp(vd_lim / v_th), GMIN)
        adm(tensors.d_idx, g_d)
    if tensors.n_s:
        on = np.asarray([op.switch_states[n] for n in tensors.s_names])
        r_sw = np.where(on, tensors.s_ron, tensors.s_roff)
        adm(tensors.s_idx[:, :2], 1.0 / np.maximum(np.abs(r_sw), EPS))
    if tensors.n_m:
        mi = tensors.m_idx
        vgs = x_pad[mi[:, 1]] - x_pad[mi[:, 2]]
        vds = x_pad[mi[:, 0]] - x_pad[mi[:, 2]]
        gm, gds, _, _ = mos_level1(vgs, vds, tensors.m_beta, tensors.m_vto,
                                   tensors.m_lambda, tensors.m_polarity)
        rows.append(mi[:, [0, 2, 1, 2]])
        vals.append(np.asarray(gm, np.float64))
        adm(mi[:, [0, 2]], np.asarray(gds))
    if tensors.n_q:
        qi = tensors.q_idx
        vbe = x_pad[qi[:, 1]] - x_pad[qi[:, 2]]
        vbc = x_pad[qi[:, 1]] - x_pad[qi[:, 0]]
        gbe, gbc, gmf, gmr, *_ = bjt_ebers_moll(
            vbe, vbc, tensors.q_is, tensors.q_bf, tensors.q_br,
            tensors.q_polarity, vt=tensors.vt,
            vbe_lim=tensors.q_polarity * vbe,
            vbc_lim=tensors.q_polarity * vbc)
        adm(qi[:, [1, 2]], np.asarray(gbe))
        adm(qi[:, [1, 0]], np.asarray(gbc))
        rows.append(qi[:, [0, 2, 1, 2]])
        vals.append(np.asarray(gmf, np.float64))
        rows.append(qi[:, [0, 2, 1, 0]])
        vals.append(-np.asarray(gmr, np.float64))
    if not rows:
        return np.zeros((0, 4), np.int32), np.zeros((0,), np.float64)
    return (np.concatenate(rows, axis=0).astype(np.int32),
            np.concatenate(vals, axis=0))


def _bsource_small_signal(ckt, tensors: CircuitTensors, op):
    """Small-signal rows for behavioral sources at the .op point, shaped
    as VCCS rows so they ride the existing ext["g_*"] stamping.

    I-kind: each reference partial dI/d(vref) is one 4-point
    transconductance row across the source's nodes. V-kind: the source
    already owns a branch row (stamped as a 0 V short by the AC path,
    v1 - v2 = 0); its gradient couplings -dF/d(vref) target THAT row,
    expressed as a VCCS whose current rows are [branch, dump] — the dump
    half is sliced off, leaving exactly A[br, ref±] -= g. This is what
    makes op-linearized opamp macromodels (tanh output stages etc.) show
    gain in AC instead of a dead short."""
    import jax

    from ..ir.circuit import bsrc_static

    x_pad = _op_voltage_pad(tensors, op)
    dump = tensors.nvar
    # op branch currents are not part of the AC x_pad here; branch refs
    # read 0 — acceptable for the op-linearized gain of v-referenced
    # sources, the dominant behavioral use case
    rows: list[list[int]] = []
    vals: list[float] = []
    for kind, fn, i1, i2, br, refs in bsrc_static(ckt, tensors.nvar):
        v = jnp.asarray([x_pad[a] - x_pad[b] for a, b in refs])
        for j, (a, b) in enumerate(refs):
            e = jnp.zeros_like(v).at[j].set(1.0)
            _, gj = jax.jvp(lambda vv: fn(vv, 0.0), (v,), (e,))
            if kind == "i":
                rows.append([i1, i2, a, b])
                vals.append(float(gj))
            else:
                rows.append([br, dump, a, b])
                vals.append(-float(gj))
    if not rows:
        return np.zeros((0, 4), np.int32), np.zeros((0,))
    return (np.asarray(rows, np.int32), np.asarray(vals, np.float64))


def diode_smallsignal_caps(tensors: CircuitTensors, op):
    """Junction capacitances C(v) at the operating point — diode TT/CJO
    plus BJT TF/TR/CJE/CJC junctions — as extra linear C rows for
    op-linearized AC/noise/pz. Returns (idx (n,2), c_vals); empty when no
    device stores charge."""
    from ..models.devices import diode_charge_cap

    rows: list[np.ndarray] = []
    caps: list[np.ndarray] = []
    x_pad = _op_voltage_pad(tensors, op)
    if tensors.has_d_charge:
        vd = x_pad[tensors.d_idx[:, 0]] - x_pad[tensors.d_idx[:, 1]]
        v_th = tensors.d_n * VT_300K
        # the op converged at the true junction voltage; cap the exponent
        # only against overflow (vd beyond ~2 V never happens at an op)
        vd_c = np.minimum(vd, 2.0)
        ev = np.exp(vd_c / v_th)
        _, c = diode_charge_cap(vd_c, tensors.d_is * (ev - 1.0),
                                np.maximum(tensors.d_is / v_th * ev, GMIN),
                                tensors.d_tt, tensors.d_cjo, tensors.d_vj,
                                tensors.d_m, tensors.d_fc)
        rows.append(tensors.d_idx)
        caps.append(np.asarray(c, np.float64))
    if tensors.has_q_charge:
        qi = tensors.q_idx
        s = tensors.q_polarity
        g = tensors.q_chg
        vt = tensors.vt
        for pair, v_r, tt, cjo, vj, m in (
            (qi[:, [1, 2]],
             s * (x_pad[qi[:, 1]] - x_pad[qi[:, 2]]),
             g[:, 0], g[:, 2], g[:, 3], g[:, 4]),
            (qi[:, [1, 0]],
             s * (x_pad[qi[:, 1]] - x_pad[qi[:, 0]]),
             g[:, 1], g[:, 5], g[:, 6], g[:, 7]),
        ):
            v_c = np.minimum(v_r, 2.0)
            ev = np.exp(v_c / vt)
            _, c = diode_charge_cap(
                v_c, tensors.q_is * (ev - 1.0),
                np.maximum(tensors.q_is / vt * ev, GMIN),
                tt, cjo, vj, m, g[:, 8])
            rows.append(pair.astype(np.int32))
            caps.append(np.asarray(c, np.float64))
    if not rows:
        return np.zeros((0, 2), np.int32), np.zeros((0,))
    return (np.concatenate(rows, axis=0).astype(np.int32),
            np.concatenate(caps))


def simulate_ac(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    interpret: bool = False,
    linearize: str | None = None,
) -> ACResult | None:
    """AC sweep. ``linearize=None`` (default) keeps reference parity:
    nonlinear devices are NOT stamped (simulateAC.ts:24-60). With
    ``linearize="op"`` the circuit's DC operating point is solved first and
    every diode/switch/MOSFET/BJT contributes its small-signal conductances
    — proper amplifier AC analysis the reference cannot do."""
    if ckt.ac is None:
        return None
    for r in ckt.R:
        if r.R <= 0:
            raise ValueError(f"R {r.name} must be > 0")

    if tensors is None:
        tensors = build_tensors(ckt)
    if linearize not in (None, "op"):
        raise ValueError("linearize must be None or 'op'")
    freqs = build_frequency_array(ckt.ac.mode, ckt.ac.N, ckt.ac.f1, ckt.ac.f2)

    v_idx_ac, v_re, v_im = ac_vsource_arrays(ckt, tensors)

    # one packed device->host transfer (round-trips cost ~30 ms each on
    # remote-tunnel TPU setups), produced by ONE compiled program — no
    # eager ops sit between the sweep and the host boundary. Tiny sweeps
    # (the reference's interactive use case) skip jax entirely and run
    # on the host NumPy interp tier when reference-dialect (no compile,
    # no accelerator handshake — analysis/interp.py; the branch runs
    # BEFORE ext_arrays, whose jnp conversions would initialize every
    # jax backend), else on the HOST CPU backend: F * Nvar^3 ops of
    # work cannot amortize even one accelerator round trip
    # (utils/placement.py)
    from ..utils.placement import exec_device, is_tiny, is_tiny_work
    from .interp import interp_ac, interp_eligible_ac, interp_enabled

    iph = tensors.i_ac_phase_deg * math.pi / 180.0
    i_re = tensors.i_ac_mag * np.cos(iph)
    i_im = tensors.i_ac_mag * np.sin(iph)

    def _op_linearized_extras():
        """Small-signal VCCS rows + junction capacitances at the operating
        point (host NumPy; the op itself takes the interp path when
        eligible). Shared by the interp and compiled linearize="op"
        branches."""
        from .op import simulate_op

        op = simulate_op(ckt, tensors=tensors, method=method)
        ss_idx, ss_g = small_signal_rows(tensors, op)
        if ckt.B:
            bs_idx, bs_g = _bsource_small_signal(ckt, tensors, op)
            ss_idx = np.concatenate([ss_idx, bs_idx], axis=0)
            ss_g = np.concatenate([ss_g, bs_g], axis=0)
        c_idx_eff, c_vals_eff = tensors.c_idx, tensors.c_vals
        cj_idx, cj_vals = diode_smallsignal_caps(tensors, op)
        if cj_idx.shape[0]:
            c_idx_eff = np.concatenate([tensors.c_idx, cj_idx], axis=0)
            c_vals_eff = np.concatenate([tensors.c_vals, cj_vals])
        return ss_idx, ss_g, c_idx_eff, c_vals_eff

    _work = 8.0 * len(freqs) * tensors.nvar ** 3
    # method/interpret are explicit solver-tier requests — honor them
    # (the interp tier would silently substitute its own f64 GE)
    _tiny_interp = (method == "gj" and not interpret
                    and is_tiny_work(_work) and interp_enabled())
    if (linearize is None and _tiny_interp
            and interp_eligible_ac(ckt, tensors)):
        x, _ok = interp_ac(tensors, freqs, v_idx_ac, v_re, v_im, i_re, i_im)
        if not _ok:
            raise ValueError("Singular matrix in AC solve")
    elif linearize == "op" and _tiny_interp:
        # op-linearized tiny sweeps interpret too: the extras are host
        # arrays and the op point rides its own interp path when eligible
        ss_idx_i, ss_g_i, c_idx_i, c_vals_i = _op_linearized_extras()
        x, _ok = interp_ac(tensors, freqs, v_idx_ac, v_re, v_im, i_re,
                           i_im, extra_g=(ss_idx_i, ss_g_i),
                           c_idx=c_idx_i, c_vals=c_vals_i)
        if not _ok:
            raise ValueError("Singular matrix in AC solve")
    else:
        ext = ext_arrays(tensors)
        c_idx_eff, c_vals_eff = tensors.c_idx, tensors.c_vals
        if linearize == "op":
            ss_idx, ss_g, c_idx_eff, c_vals_eff = _op_linearized_extras()
            ext["g_idx"] = jnp.concatenate(
                [ext["g_idx"], jnp.asarray(ss_idx)], axis=0)
            ext["g_gm"] = jnp.concatenate(
                [ext["g_gm"], jnp.asarray(ss_g)], axis=0)

        # structured BBD tier: forced by method="schur", auto-dispatched
        # for large subckt-structured systems beyond the dense fast tiers'
        # N=128 ceiling (ops/schur.py); falls back to dense on invalid
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

        _core = _ac_sweep_packed_tiny if is_tiny(_work) else _ac_sweep_packed

        def _run(plan_arrays):
            with exec_device(_work):
                return np.asarray(_core(
                    jnp.asarray(freqs),
                    jnp.asarray(tensors.r_idx), jnp.asarray(tensors.r_vals),
                    jnp.asarray(c_idx_eff), jnp.asarray(c_vals_eff),
                    jnp.asarray(tensors.l_idx), jnp.asarray(tensors.l_vals),
                    jnp.asarray(v_idx_ac), jnp.asarray(v_re),
                    jnp.asarray(v_im),
                    nvar=tensors.nvar, method=_method, interpret=interpret,
                    ext=ext,
                    i_re=jnp.asarray(i_re), i_im=jnp.asarray(i_im),
                    lk=lk_arrays(tensors),
                    tl=tl_arrays(tensors),
                    plan=plan_arrays,
                ))

        packed = _run(plan)
        if plan is not None and not bool(np.all(packed[:, -1] > 0.5)):
            # block-local pivoting failed where global pivoting may not:
            # retry the whole sweep dense before declaring singular
            packed = _run(None)
        nv = tensors.nvar
        if not bool(np.all(packed[:, -1] > 0.5)):
            raise ValueError("Singular matrix in AC solve")
        x = packed[:, :nv] + 1j * packed[:, nv:2 * nv]  # (F, nvar) c128

    node_voltages = {
        name: x[:, i] for i, name in enumerate(tensors.node_names)
    }
    if getattr(ckt, "ac_probes", None):
        # extended .print ac v(...): filter like the reference's tran
        # probe filter (canonical-casing keys kept)
        upper = {p.upper() for p in ckt.ac_probes}
        node_voltages = {
            name: series for name, series in node_voltages.items()
            if name.upper() in upper
        }
    element_currents = _element_currents(tensors, freqs, x)
    return ACResult(
        freqs=freqs,
        node_voltages=node_voltages,
        element_currents=element_currents,
    )
