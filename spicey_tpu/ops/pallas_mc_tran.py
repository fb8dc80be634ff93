"""Fused Monte-Carlo TRANSIENT kernel: the whole BE time loop in VMEM.

Time-domain twin of ops/pallas_mc_ac.py. For LINEAR circuits under
backward-Euler companions the MNA matrix is timestep-invariant — only
the RHS changes, through the source grid and the companion state. The
engine's batch-native scan still pays, per step, an XLA op-chain over
HBM-resident buffers; at MNA sizes that is dispatch/traffic overhead for
microseconds of arithmetic.

This kernel runs the ENTIRE transient per batch tile inside one Pallas
grid cell:

  1. build A (N, N, TILE_B) in VMEM from the static stamp pattern and
     the per-variant value slab (R conductances, C/L companion
     conductances gc = C/dt and gl = dt/L — precomputed by the caller,
     so dt never enters the kernel — plus G/E/F/H stamps);
  2. reduce [A | I] ONCE with the shared one-hot-pivot Gauss-Jordan
     (ops/pallas_gj._real_inv_scratch) and unpermute the inverse in
     VMEM;
  3. fori_loop over the S+1 timesteps: assemble the RHS rows from SMEM
     source scalars + the companion state carried in registers, apply
     the inverse (N static multiply-adds of (N, TILE_B) slabs), record
     V(node) with a dynamic sublane store, and commit the companion
     state (simulateTRAN.ts:221-231 semantics; t=0 is the quasi-DC
     bootstrap with zero state, :147-149).

Nonlinear circuits — switches (S/W), diodes (including TT/CJO charge
storage), MOSFETs and BJTs (including TF/TR/CJE/CJC junction charge) —
take ``_fused_tran_nr_kernel`` instead:
the matrix is state-dependent, so step 2's factor-once is replaced by
the engine's inner rebuild+solve loop run entirely in VMEM,
re-eliminating the augmented planes per pass with the state-independent
stamp cached in a second scratch. The reference's own nonlinear set
(S/D) keeps its exact semantics (simulateTRAN.ts:149-161 — exit on
switch stability); MOSFET/BJT decks run the scan tier's
Newton-to-convergence rule with per-lane done masking.

HBM traffic for a whole B-variant MC: the (nE, B) values in, the
(S+1, B) probed trajectory out. Nothing per step ever touches HBM.

Eligibility (enforced by the caller, analysis/mc.py): device set
R/C/L/V/S/W/D/M/Q (JFETs lower to M at tensorization) plus extended
I/G/E/F/H sources, BE integration, f32 pallas tier, no K/T/B-sources,
no per-variant source overrides, N <= 16, and the source grid small
enough for SMEM. Contract:
/root/reference/lib/analysis/simulateTRAN.ts:14-231 plus
analysis/tran.py's extended-device scan semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS
from .pallas_gj import (_extract_solution, _real_gj_scratch,
                        _real_inv_scratch, _z)

Array = jax.Array

_LANE = 128
_FUSED_MAX_N = 16
# SMEM source-grid budget: (S+1) * nSrc * 4 bytes
_SMEM_SRC_BUDGET = 16 * 1024
# output VMEM budget governs the tile: (S+1) rows of the trajectory
_VMEM_BUDGET = 6 * 1024 * 1024


def build_tran_pattern(n: int, r_idx: object, c_idx: object,
                       l_idx: object, v_idx: object, n_src_i: int,
                       ext_idx: dict | None = None,
                       s_idx: object = None,
                       d_idx: object = None,
                       m_idx: object = None, m_pol: object = None,
                       q_idx: object = None, q_pol: object = None,
                       d_chg: bool = False,
                       q_chg: bool = False) -> tuple:
    """Static pattern: (n_rows, a_entries, b_src, c_state, l_state,
    s_list, d_list, m_list, q_list, dchg_list, qchg_list, row_invdt).

    Value-row layout: [R | gc | gl | g | e | f | h | s_gon | s_goff |
    s_von | s_voff | d_is | d_vth | m_beta | m_vto | m_lam | q_is |
    q_bf | q_br | (d_tt | d_cjo | d_vj | d_m | d_fc) | (q_tf | q_cje |
    q_vje | q_mje | q_tr | q_cjc | q_vjc | q_mjc | q_fc) | (inv_dt)]
    (companion conductances in place of raw C/L values; the
    charge-storage rows only exist when ``d_chg``/``q_chg``, the inv_dt
    row when either does). ``a_entries`` is
    ((i, j), terms) with term kinds "one"/"inv"/"lin" as in the AC
    pattern; ``b_src`` is (row, src_col, sign) into the (S+1, nSrc)
    source grid (V branch values first, then I injections);
    ``c_state``/``l_state`` are (elem, i1, i2, value_row) with dump-slot
    indices preserved (the kernel treats row >= n as ground).
    ``s_list``/``d_list``/``m_list``/``q_list`` describe the
    state-dependent stamps that force the per-step Newton/switch
    iteration: (i1, i2, icp, icn, row_gon, row_goff, row_von, row_voff),
    (ip, im, row_is, row_vth), (d, g, s, row_beta, row_vto, row_lam,
    pol) and (c, b, e, row_is, row_bf, row_br, pol) — MOSFET/BJT
    polarities are static floats (the model type cannot vary per
    variant). ``dchg_list`` holds per-diode (row_tt, row_cjo, row_vj,
    row_m, row_fc) parallel to ``d_list``, ``qchg_list`` per-BJT
    (row_tf, row_cje, row_vje, row_mje, row_tr, row_cjc, row_vjc,
    row_mjc, row_fc) parallel to ``q_list``, and ``row_invdt`` the 1/dt
    row (-1 when no charge storage)."""
    a_t: dict = {}

    def add(i: int, j: int, term: tuple) -> None:
        if i < n and j < n:
            a_t.setdefault((int(i), int(j)), []).append(term)

    def adm(idx: object, kind: str, base: int) -> None:
        for k, (i1, i2) in enumerate(np.asarray(idx).reshape(-1, 2)):
            row = base + k
            for (a, b, s) in ((i1, i1, 1.0), (i2, i2, 1.0),
                              (i1, i2, -1.0), (i2, i1, -1.0)):
                add(a, b, (kind, row, s))

    r = np.asarray(r_idx).reshape(-1, 2)
    c = np.asarray(c_idx).reshape(-1, 2)
    l_arr = np.asarray(l_idx).reshape(-1, 2)
    v = np.asarray(v_idx).reshape(-1, 3)
    n_r, n_c, n_l, n_v = (r.shape[0], c.shape[0], l_arr.shape[0],
                          v.shape[0])
    off_gc, off_gl = n_r, n_r + n_c
    adm(r_idx, "inv", 0)
    adm(c_idx, "lin", off_gc)
    adm(l_idx, "lin", off_gl)
    b_src = []
    for k, (i1, i2, j) in enumerate(v):
        for (a, b, s) in ((i1, j, 1.0), (j, i1, 1.0),
                          (i2, j, -1.0), (j, i2, -1.0)):
            add(a, b, ("one", 0, s))
        b_src.append((int(j), k, 1.0))
    # extended I sources: columns n_v.. of the source grid
    # (stampCurrent*.ts: b[i1] -= I, b[i2] += I)
    base = n_r + n_c + n_l
    ii = (np.asarray(ext_idx["i_idx"]).reshape(-1, 2)
          if ext_idx else np.zeros((0, 2), np.int64))
    for k in range(n_src_i):
        i1, i2 = (int(ii[k, 0]), int(ii[k, 1]))
        if i1 < n:
            b_src.append((i1, n_v + k, -1.0))
        if i2 < n:
            b_src.append((i2, n_v + k, 1.0))
    if ext_idx:
        gi = np.asarray(ext_idx["g_idx"]).reshape(-1, 4)
        for k, (i1, i2, cp, cn) in enumerate(gi):
            row = base + k
            for (a, b, s) in ((i1, cp, 1.0), (i1, cn, -1.0),
                              (i2, cp, -1.0), (i2, cn, 1.0)):
                add(a, b, ("lin", row, s))
        base += gi.shape[0]
        ei = np.asarray(ext_idx["e_idx"]).reshape(-1, 5)
        for k, (i1, i2, j, cp, cn) in enumerate(ei):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0),
                              (j, i1, 1.0), (j, i2, -1.0)):
                add(a, b, ("one", 0, s))
            for (a, b, s) in ((j, cp, -1.0), (j, cn, 1.0)):
                add(a, b, ("lin", row, s))
        base += ei.shape[0]
        fi = np.asarray(ext_idx["f_idx"]).reshape(-1, 3)
        for k, (i1, i2, j) in enumerate(fi):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0)):
                add(a, b, ("lin", row, s))
        base += fi.shape[0]
        hi = np.asarray(ext_idx["h_idx"]).reshape(-1, 4)
        for k, (i1, i2, j, jc) in enumerate(hi):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0),
                              (j, i1, 1.0), (j, i2, -1.0)):
                add(a, b, ("one", 0, s))
            add(j, jc, ("lin", row, -1.0))
        base += hi.shape[0]
    s_arr = (np.asarray(s_idx).reshape(-1, 4) if s_idx is not None
             else np.zeros((0, 4), np.int64))
    d_arr = (np.asarray(d_idx).reshape(-1, 2) if d_idx is not None
             else np.zeros((0, 2), np.int64))
    n_s, n_d = s_arr.shape[0], d_arr.shape[0]
    s_list = tuple(
        (int(s_arr[k, 0]), int(s_arr[k, 1]), int(s_arr[k, 2]),
         int(s_arr[k, 3]), base + k, base + n_s + k, base + 2 * n_s + k,
         base + 3 * n_s + k)
        for k in range(n_s))
    base += 4 * n_s
    d_list = tuple(
        (int(d_arr[k, 0]), int(d_arr[k, 1]), base + k, base + n_d + k)
        for k in range(n_d))
    base += 2 * n_d
    m_arr = (np.asarray(m_idx).reshape(-1, 3) if m_idx is not None
             else np.zeros((0, 3), np.int64))
    q_arr = (np.asarray(q_idx).reshape(-1, 3) if q_idx is not None
             else np.zeros((0, 3), np.int64))
    n_mm, n_qq = m_arr.shape[0], q_arr.shape[0]
    m_pols = np.asarray(m_pol if m_pol is not None else []).reshape(-1)
    q_pols = np.asarray(q_pol if q_pol is not None else []).reshape(-1)
    m_list = tuple(
        (int(m_arr[k, 0]), int(m_arr[k, 1]), int(m_arr[k, 2]),
         base + k, base + n_mm + k, base + 2 * n_mm + k,
         float(m_pols[k]))
        for k in range(n_mm))
    base += 3 * n_mm
    q_list = tuple(
        (int(q_arr[k, 0]), int(q_arr[k, 1]), int(q_arr[k, 2]),
         base + k, base + n_qq + k, base + 2 * n_qq + k,
         float(q_pols[k]))
        for k in range(n_qq))
    base += 3 * n_qq
    if d_chg:
        dchg_list = tuple(
            (base + k, base + n_d + k, base + 2 * n_d + k,
             base + 3 * n_d + k, base + 4 * n_d + k)
            for k in range(n_d))
        base += 5 * n_d
    else:
        dchg_list = ()
    if q_chg:
        qchg_list = tuple(
            tuple(base + j * n_qq + k for j in range(9))
            for k in range(n_qq))
        base += 9 * n_qq
    else:
        qchg_list = ()
    if d_chg or q_chg:
        row_invdt = base
        base += 1
    else:
        row_invdt = -1
    c_state = tuple(
        (k, int(c[k, 0]), int(c[k, 1]), off_gc + k) for k in range(n_c))
    l_state = tuple(
        (k, int(l_arr[k, 0]), int(l_arr[k, 1]), off_gl + k)
        for k in range(n_l))
    a_entries = tuple(sorted(
        (ij, tuple(terms)) for ij, terms in a_t.items()))
    return (base, a_entries, tuple(b_src), c_state, l_state, s_list,
            d_list, m_list, q_list, dchg_list, qchg_list, row_invdt)


def _fused_tran_kernel(vs_ref: object, ev_ref: object, out_ref: object,
                       valid_ref: object, a_s: object, m_s: object, *,
                       n: int, node_idx: int, eps: float, n_steps: int,
                       pattern: tuple) -> None:
    tb = ev_ref.shape[-1]
    dtype = ev_ref.dtype
    _n_rows, a_entries, b_src, c_state, l_state = pattern[:5]
    stamped = {ij for ij, _ in a_entries}
    zero_row = jnp.zeros((1, tb), dtype)

    def val_row(row: int) -> Array:
        return ev_ref[pl.ds(row, 1), :]  # (1, TB)

    # 1. assemble A in VMEM (static unroll; unstamped entries zeroed)
    for i in range(n):
        for j in range(n):
            if (i, j) not in stamped:
                a_s[i, pl.ds(j, 1), :] = zero_row
    for (i, j), terms in a_entries:
        acc = None
        for kind, row, sign in terms:
            s = jnp.asarray(sign, dtype)
            if kind == "one":
                t = jnp.full((1, tb), sign, dtype)
            elif kind == "inv":
                t = s / val_row(row)
            else:  # lin
                t = s * val_row(row)
            acc = t if acc is None else acc + t
        a_s[i, pl.ds(j, 1), :] = acc

    # 2. factor once: [A | I] reduction + in-VMEM row unpermutation
    colidx, valid, rows2 = _real_inv_scratch(
        a_s, m_s, n=n, tb=tb, dtype=dtype, eps=eps)
    valid_ref[:] = valid
    m = m_s[:]
    for i in range(n):
        sel = colidx == jnp.asarray(float(i), dtype)  # (N, TB)
        inv_i = jnp.sum(jnp.where(sel[:, None, :], m, 0.0), axis=0)
        a_s[pl.ds(i, 1), :, :] = inv_i[None, :, :]
    inv = a_s[:]  # (N, N, TB) — A^{-1}

    def row_of(x: Array, i: int) -> Array:
        """x[i] as (1, TB) without 1-D intermediates (i may be the dump
        slot >= n, which is ground = 0)."""
        if i >= n:
            return zero_row
        return jnp.sum(jnp.where(rows2 == jnp.asarray(float(i), dtype),
                                 x, 0.0), axis=0, keepdims=True)

    # 3. the time loop: state carried as per-element (1, TB) rows
    def step(s: Array, carry: tuple) -> tuple:
        v_prev, i_prev = carry
        b_rows: dict[int, Array] = {}

        def badd(i: int, t: Array) -> None:
            b_rows[i] = t if i not in b_rows else b_rows[i] + t

        for (i, col, sign) in b_src:
            src = vs_ref[s, col] * jnp.asarray(sign, dtype)
            badd(i, jnp.full((1, tb), 1.0, dtype) * src)
        for (k, i1, i2, gc_row) in c_state:
            # stamp_current with I = -gc*v_prev: b[i1] += gc*v_prev ...
            t = val_row(gc_row) * v_prev[k]
            if i1 < n:
                badd(i1, t)
            if i2 < n:
                badd(i2, -t)
        for (k, i1, i2, _gl_row) in l_state:
            # stamp_current with I = +i_prev: b[i1] -= i_prev ...
            if i1 < n:
                badd(i1, -i_prev[k])
            if i2 < n:
                badd(i2, i_prev[k])

        x = None
        for j in range(n):
            if j not in b_rows:
                continue
            t = inv[:, j, :] * b_rows[j]  # (N, TB) * (1, TB)
            x = t if x is None else x + t
        if x is None:
            x = jnp.zeros((n, tb), dtype)

        out_ref[pl.ds(s, 1), :] = row_of(x, node_idx)

        # state commit (simulateTRAN.ts:221-231)
        v_new = tuple(
            row_of(x, i1) - row_of(x, i2)
            for (_k, i1, i2, _g) in c_state)
        i_new = tuple(
            i_prev[k] + val_row(gl_row) * (row_of(x, i1) - row_of(x, i2))
            for (k, i1, i2, gl_row) in l_state)
        return v_new, i_new

    init = (tuple(zero_row for _ in c_state),
            tuple(zero_row for _ in l_state))
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step, init)


def _fused_tran_nr_kernel(vs_ref: object, ev_ref: object, out_ref: object,
                          valid_ref: object, ab_s: object, lin_s: object,
                          x_s: object, st_s: object,
                          *, n: int, node_idx: int, eps: float,
                          n_steps: int, pattern: tuple,
                          vd_scale: float = 1.0,
                          nr: str = "spicey", nr_tol: float = 1e-9,
                          max_nr: int = 20) -> None:
    """Nonlinear variant: the MNA matrix is state-dependent, so each
    step runs the engine's inner loop — x zero-seeded, up to ``max_nr``
    rebuild+solve passes with per-lane done masking — entirely in VMEM.

    Two exit rules, matching analysis/tran.py's scan core:
    ``nr="spicey"`` is the reference's (simulateTRAN.ts:149-161): a lane
    is done as soon as no switch toggled (diodes get exactly one Newton
    pass per toggle round). ``nr="converged"`` (the mode MOSFET/BJT
    circuits force) additionally requires the Newton update to settle:
    max|dx| <= tol * (1 + max|x|) per lane, with the tolerance floored
    at 16 f32 ulps (1e-9 is not representable progress in f32 — the
    scan tier applies the same floor).

    The linear stamp part is cached in ``lin_s`` and re-copied into the
    augmented scratch per pass. Per pass the state-dependent set stamps
    on top: switches as Ron/Roff by hysteresis state; diodes the
    Shockley companion with the reference clamps (vd in [-1, 0.8] x
    T/300, gd >= GMIN), seeded from the previous TIMESTEP on pass 0 and
    the previous pass after — plus, when the deck has charge storage
    (TT/CJO), the junction-charge companion i = (q(v) - q_prev)/dt with
    the split Newton anchor (diffusion at the clamped voltage, depletion
    at the true one — models/devices.diode_charge_cap); MOSFETs the
    level-1 (Shichman-Hodges) linearization gm/gds/i_eq
    (models/devices.mos_level1) and BJTs the Ebers-Moll transport
    companion (models/devices.bjt_ebers_moll), both seeded from the
    previous timestep's junction voltages on pass 0 exactly like the
    scan tier (analysis/tran.py _stamp_nonlinear); BJTs with junction
    charge (TF/TR/CJE/CJC) additionally get the per-junction BE charge
    companions in the reflected frame (tran.py _bjt_junction_charge —
    evaluated at the current iterate, not the pass-0 seed, matching the
    scan tier).

    Mosaic constraint that shaped this kernel: an scf.while carrying
    (1, TB) / (N, TB) vectors fails to lower — the layout join between
    the splat-initialized carries and the body's computed values dies
    with "Not implemented: Sublane broadcast" (select_n AND elementwise
    alike), while fori_loop carries are fine (the linear kernel above
    relies on them). So the Newton loop carries ONLY scalars
    (iteration counter + continue flag); all per-lane state lives in
    VMEM scratch — ``x_s`` (N, TB) holds the solution, ``st_s`` rows
    hold [switch on-states | done | validity], and every (1, TB) select
    is an arithmetic blend on {0, 1} floats."""
    from ..constants import DIODE_VD_MAX, DIODE_VD_MIN, GMIN, VT_300K
    from ..models.devices import (bjt_ebers_moll, diode_charge_cap,
                                  mos_level1)

    tb = ev_ref.shape[-1]
    dtype = ev_ref.dtype
    (_n_rows, a_entries, b_src, c_state, l_state, s_list, d_list,
     m_list, q_list, dchg_list, qchg_list, row_invdt) = pattern
    stamped = {ij for ij, _ in a_entries}
    zero_row = jnp.zeros((1, tb), dtype)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0).astype(dtype)
    # the linearization clamp window scales with T/300 like the scan
    # tier's (analysis/tran.py:361-365); temp is otherwise already folded
    # into the tensor values (d_n, d_is, r_vals) at tensorization
    vd_lo = jnp.asarray(DIODE_VD_MIN * vd_scale, dtype)
    vd_hi = jnp.asarray(DIODE_VD_MAX * vd_scale, dtype)
    gmin = jnp.asarray(GMIN, dtype)

    def val_row(row: int) -> Array:
        return ev_ref[pl.ds(row, 1), :]  # (1, TB)

    # cache the state-INDEPENDENT stamp part once
    for i in range(n):
        for j in range(n):
            if (i, j) not in stamped:
                lin_s[i, pl.ds(j, 1), :] = zero_row
    for (i, j), terms in a_entries:
        acc = None
        for kind, row, sign in terms:
            s = jnp.asarray(sign, dtype)
            if kind == "one":
                t = jnp.full((1, tb), sign, dtype)
            elif kind == "inv":
                t = s / val_row(row)
            else:  # lin
                t = s * val_row(row)
            acc = t if acc is None else acc + t
        lin_s[i, pl.ds(j, 1), :] = acc

    def row_of(x: Array, i: int) -> Array:
        if i >= n:
            return zero_row
        return jnp.sum(jnp.where(rows2 == jnp.asarray(float(i), dtype),
                                 x, 0.0), axis=0, keepdims=True)

    def adm4(i1: int, i2: int, g: Array) -> None:
        for (a, b, sgn) in ((i1, i1, 1.0), (i2, i2, 1.0),
                            (i1, i2, -1.0), (i2, i1, -1.0)):
            if a < n and b < n:
                ab_s[a, pl.ds(b, 1), :] = (
                    ab_s[a, pl.ds(b, 1), :] + jnp.asarray(sgn, dtype) * g)

    def vccs4(i1: int, i2: int, icp: int, icn: int, g: Array) -> None:
        # transconductance pattern (ops/stamps.stamp_vccs): current rows
        # (i1, i2) x control columns (icp, icn)
        for (a, b, sgn) in ((i1, icp, 1.0), (i1, icn, -1.0),
                            (i2, icp, -1.0), (i2, icn, 1.0)):
            if a < n and b < n:
                ab_s[a, pl.ds(b, 1), :] = (
                    ab_s[a, pl.ds(b, 1), :] + jnp.asarray(sgn, dtype) * g)

    # thermal voltage for the BJT transport model (temperature is folded
    # into vd_scale = T/300 at tensorization, like the diode clamps)
    vt_q = jnp.asarray(VT_300K * vd_scale, dtype)
    # converged-mode tolerance with the f32 representability floor
    tol_eff = jnp.asarray(
        max(float(nr_tol), 16.0 * float(jnp.finfo(jnp.float32).eps)),
        dtype)

    def bjt_chg_one(v: Array, i_s: Array, rows: tuple, junction: int,
                    pol: float) -> tuple:
        """One BJT junction's (q, C, cv) in the stamped frame — the
        kernel form of tran.py _bjt_junction_charge: reflected-frame
        voltages, exponential pieces at the CLAMPED voltage, depletion
        at the TRUE one, cv the split Newton anchor inner product."""
        s_p = jnp.asarray(pol, dtype)
        u = s_p * v
        u_lim = jnp.clip(u, vd_lo, vd_hi)
        ev = jnp.exp(u_lim / vt_q)
        g_diff = jnp.maximum(i_s / vt_q * ev, gmin)
        off = 0 if junction == 0 else 4
        tt = val_row(rows[off])
        q_r, c = diode_charge_cap(
            u, i_s * (ev - 1.0), g_diff, tt, val_row(rows[off + 1]),
            val_row(rows[off + 2]), val_row(rows[off + 3]),
            val_row(rows[8]))
        cv = (tt * g_diff * (s_p * u_lim)
              + (c - tt * g_diff) * (s_p * u))
        return s_p * q_r, c, cv

    n_s = len(s_list)
    row_done, row_vnr = n_s, n_s + 1  # st_s row layout

    def st_row(r: int) -> Array:
        return st_s[pl.ds(r, 1), :]  # (1, TB)

    # switch on-states persist across timesteps (isOn starts False, :85)
    for k in range(n_s):
        st_s[pl.ds(k, 1), :] = zero_row

    def step(s: Array, carry: tuple) -> tuple:
        (v_prev, i_prev, vd_prev, vm_gs, vm_ds, vq_be, vq_bc, qd_prev,
         qq_be, qq_bc, valid_acc) = carry

        # linear RHS rows: iteration-invariant within the step
        b_lin = [zero_row] * n

        def badd(i: int, t: Array) -> None:
            if i < n:
                b_lin[i] = b_lin[i] + t

        for (i, col, sign) in b_src:
            badd(i, jnp.full((1, tb), 1.0, dtype)
                 * (vs_ref[s, col] * jnp.asarray(sign, dtype)))
        for (k, i1, i2, gc_row) in c_state:
            t = val_row(gc_row) * v_prev[k]
            badd(i1, t)
            badd(i2, -t)
        for (k, i1, i2, _g) in l_state:
            badd(i1, -i_prev[k])
            badd(i2, i_prev[k])

        # x zero-seeded per step (:149); done=0, validity=1
        x_s[:] = jnp.zeros((n, tb), dtype)
        st_s[pl.ds(row_done, 1), :] = zero_row
        st_s[pl.ds(row_vnr, 1), :] = jnp.ones((1, tb), dtype)

        def nr_cond(c: tuple) -> Array:
            it, go = c
            return jnp.logical_and(it < jnp.int32(max_nr), go)

        def nr_body(c: tuple) -> tuple:
            it, _go = c
            done = st_row(row_done)
            live_f = one - done  # (1, TB) in {0, 1}
            ab_s[:, pl.ds(0, n), :] = lin_s[:]
            for k, (i1, i2, _p, _m, rg1, rg0, _von, _voff) in \
                    enumerate(s_list):
                on_k = st_row(k)
                g = val_row(rg0) + on_k * (val_row(rg1) - val_row(rg0))
                adm4(i1, i2, g)
            d_terms: dict[int, Array] = {}

            def dadd(i: int, t: Array) -> None:
                if i < n:
                    d_terms[i] = t if i not in d_terms else d_terms[i] + t

            x0 = x_s[:]
            first = jnp.where(it < jnp.int32(1), one, zero)  # scalar
            for k, (ip, im, r_is, r_vth) in enumerate(d_list):
                vd_it = row_of(x0, ip) - row_of(x0, im)
                vd = vd_it + first * (vd_prev[k] - vd_it)
                vd_l = jnp.clip(vd, vd_lo, vd_hi)
                i_s = val_row(r_is)
                vth = val_row(r_vth)
                ev = jnp.exp(vd_l / vth)
                idd = i_s * (ev - 1.0)
                gd = jnp.maximum(i_s / vth * ev, gmin)
                adm4(ip, im, gd)
                cur = idd - gd * vd_l  # stampCurrent: b[ip]-=cur, b[im]+=cur
                dadd(ip, -cur)
                dadd(im, cur)
                if dchg_list:
                    # charge-storage companion i = (q(v) - q_prev)/dt
                    # with the split Newton anchor (tran.py:373-391):
                    # diffusion linearizes at vd_l, depletion at TRUE vd
                    rtt, rcjo, rvj, rm, rfc = dchg_list[k]
                    inv_dt = val_row(row_invdt)
                    q_d, c_d = diode_charge_cap(
                        vd, idd, gd, val_row(rtt), val_row(rcjo),
                        val_row(rvj), val_row(rm), val_row(rfc))
                    adm4(ip, im, c_d * inv_dt)
                    tt_gd = val_row(rtt) * gd
                    cur_q = (q_d - qd_prev[k] - tt_gd * vd_l
                             - (c_d - tt_gd) * vd) * inv_dt
                    dadd(ip, -cur_q)
                    dadd(im, cur_q)
            for k, (dd, gg, ss, rb, rv, rl, pol) in enumerate(m_list):
                # level-1 MOSFET companion (tran.py _stamp_nonlinear):
                # gds across (d, s), gm as a VCCS (d, s) x (g, s), i_eq
                # into the drain row; seeds follow the diode convention
                vgs_it = row_of(x0, gg) - row_of(x0, ss)
                vds_it = row_of(x0, dd) - row_of(x0, ss)
                vgs = vgs_it + first * (vm_gs[k] - vgs_it)
                vds = vds_it + first * (vm_ds[k] - vds_it)
                gm, gds, i_eq, _ = mos_level1(
                    vgs, vds, val_row(rb), val_row(rv), val_row(rl),
                    jnp.asarray(pol, dtype))
                adm4(dd, ss, gds)
                vccs4(dd, ss, gg, ss, gm)
                dadd(dd, -i_eq)
                dadd(ss, i_eq)
            for k, (cc, bb, ee, ris, rbf, rbr, pol) in enumerate(q_list):
                # Ebers-Moll transport companion (tran.py
                # _stamp_nonlinear): two junction diodes + the
                # forward/reverse transport VCCS pair
                vbe_it = row_of(x0, bb) - row_of(x0, ee)
                vbc_it = row_of(x0, bb) - row_of(x0, cc)
                vbe = vbe_it + first * (vq_be[k] - vbe_it)
                vbc = vbc_it + first * (vq_bc[k] - vbc_it)
                gbe, gbc, gmf, gmr, ibe_eq, ibc_eq, ict_eq, _, _ = (
                    bjt_ebers_moll(vbe, vbc, val_row(ris), val_row(rbf),
                                   val_row(rbr), jnp.asarray(pol, dtype),
                                   vt=vt_q))
                adm4(bb, ee, gbe)
                adm4(bb, cc, gbc)
                vccs4(cc, ee, bb, ee, gmf)
                vccs4(cc, ee, bb, cc, -gmr)
                dadd(bb, -ibe_eq)
                dadd(ee, ibe_eq)
                dadd(bb, -ibc_eq)
                dadd(cc, ibc_eq)
                dadd(cc, -ict_eq)
                dadd(ee, ict_eq)
                if qchg_list:
                    # BJT junction-charge companions (tran.py:394-407 /
                    # _bjt_junction_charge): evaluated at the CURRENT
                    # iterate (no pass-0 seed — scan-tier parity),
                    # reflected frame, split anchor cv
                    inv_dt = val_row(row_invdt)
                    q_be, c_be, cv_be = bjt_chg_one(
                        vbe_it, val_row(ris), qchg_list[k], 0, pol)
                    q_bc, c_bc, cv_bc = bjt_chg_one(
                        vbc_it, val_row(ris), qchg_list[k], 1, pol)
                    adm4(bb, ee, c_be * inv_dt)
                    cur_be = (q_be - qq_be[k] - cv_be) * inv_dt
                    dadd(bb, -cur_be)
                    dadd(ee, cur_be)
                    adm4(bb, cc, c_bc * inv_dt)
                    cur_bc = (q_bc - qq_bc[k] - cv_bc) * inv_dt
                    dadd(bb, -cur_bc)
                    dadd(cc, cur_bc)
            for i in range(n):
                ab_s[i, pl.ds(n, 1), :] = b_lin[i] + d_terms.get(i, zero)

            colidx, v_i, r2 = _real_gj_scratch(
                ab_s, n=n, tb=tb, dtype=dtype, eps=eps)
            x_new = _extract_solution(colidx, ab_s[:, n, :], r2, n)
            # frozen lanes keep their committed solution
            live_full = pltpu.repeat(live_f, n, 0)  # (N, TB) in {0, 1}
            x_s[:] = x0 + live_full * (x_new - x0)
            # once done, a lane's validity is frozen too
            st_s[pl.ds(row_vnr, 1), :] = (
                st_row(row_vnr) * (v_i + done * (one - v_i)))
            toggled = zero_row
            x_b = x_s[:]
            for k, (_i1, _i2, icp, icn, _g1, _g0, rvon, rvoff) in \
                    enumerate(s_list):
                on_k = st_row(k)
                vctrl = row_of(x_b, icp) - row_of(x_b, icn)
                # hysteresis: ON stays unless vctrl < Voff; OFF flips
                # when vctrl > Von (simulateTRAN.ts:108-128)
                stay_on = jnp.where(vctrl < val_row(rvoff), zero, one)
                turn_on = jnp.where(vctrl > val_row(rvon), one, zero)
                nxt = turn_on + on_k * (stay_on - turn_on)
                nxt = on_k + live_f * (nxt - on_k)
                toggled = jnp.maximum(toggled, jnp.abs(nxt - on_k))
                st_s[pl.ds(k, 1), :] = nxt
            if nr == "converged":
                # Newton settling on top of switch stability (the scan
                # core's rule, tran.py:638-652): max|dx| <= tol*(1+max|x|)
                delta = jnp.max(jnp.abs(x_new - x0), axis=0,
                                keepdims=True)
                scale = one + jnp.max(jnp.abs(x_new), axis=0,
                                      keepdims=True)
                conv = jnp.where(delta <= tol_eff * scale, one, zero)
                settled = (one - toggled) * conv
            else:
                settled = one - toggled
            done = jnp.maximum(done, settled)
            st_s[pl.ds(row_done, 1), :] = done
            go = jnp.min(done) < 0.5  # scalar: any lane still live
            return it + 1, go

        jax.lax.while_loop(nr_cond, nr_body,
                           (jnp.int32(0), jnp.asarray(True)))

        x = x_s[:]
        out_ref[pl.ds(s, 1), :] = row_of(x, node_idx)
        v_new = tuple(row_of(x, i1) - row_of(x, i2)
                      for (_k, i1, i2, _g) in c_state)
        i_new = tuple(
            i_prev[k] + val_row(gl_row) * (row_of(x, i1) - row_of(x, i2))
            for (k, i1, i2, gl_row) in l_state)
        vd_new = tuple(row_of(x, ip) - row_of(x, im)
                       for (ip, im, _ri, _rv) in d_list)
        # junction-voltage seeds for the next step's pass 0
        # (tran.py:777-790)
        vm_gs_new = tuple(row_of(x, gg) - row_of(x, ss)
                          for (_d, gg, ss, _rb, _rv, _rl, _p) in m_list)
        vm_ds_new = tuple(row_of(x, dd) - row_of(x, ss)
                          for (dd, _g, ss, _rb, _rv, _rl, _p) in m_list)
        vq_be_new = tuple(row_of(x, bb) - row_of(x, ee)
                          for (_c, bb, ee, _ri, _rf, _rr, _p) in q_list)
        vq_bc_new = tuple(row_of(x, bb) - row_of(x, cc)
                          for (cc, bb, _e, _ri, _rf, _rr, _p) in q_list)
        if dchg_list:
            # commit the charge at the accepted solution — diffusion at
            # the clamped voltage, depletion at the TRUE one
            # (tran.py:757-772)
            qd_new = []
            for k, (ip, im, r_is, r_vth) in enumerate(d_list):
                rtt, rcjo, rvj, rm, rfc = dchg_list[k]
                vd_t = vd_new[k]
                vd_c = jnp.clip(vd_t, vd_lo, vd_hi)
                i_s = val_row(r_is)
                vth = val_row(r_vth)
                ev_c = jnp.exp(vd_c / vth)
                qd_new.append(diode_charge_cap(
                    vd_t, i_s * (ev_c - 1.0),
                    jnp.maximum(i_s / vth * ev_c, gmin),
                    val_row(rtt), val_row(rcjo), val_row(rvj),
                    val_row(rm), val_row(rfc))[0])
            qd_new = tuple(qd_new)
        else:
            qd_new = ()
        if qchg_list:
            # committed junction charges at the accepted solution
            # (tran.py:773-776)
            qq_be_new = tuple(
                bjt_chg_one(vq_be_new[k], val_row(q_list[k][3]),
                            qchg_list[k], 0, q_list[k][6])[0]
                for k in range(len(q_list)))
            qq_bc_new = tuple(
                bjt_chg_one(vq_bc_new[k], val_row(q_list[k][3]),
                            qchg_list[k], 1, q_list[k][6])[0]
                for k in range(len(q_list)))
        else:
            qq_be_new, qq_bc_new = (), ()
        return (v_new, i_new, vd_new, vm_gs_new, vm_ds_new, vq_be_new,
                vq_bc_new, qd_new, qq_be_new, qq_bc_new,
                valid_acc * st_row(row_vnr))

    init = (tuple(zero_row for _ in c_state),
            tuple(zero_row for _ in l_state),
            tuple(zero_row for _ in d_list),
            tuple(zero_row for _ in m_list),
            tuple(zero_row for _ in m_list),
            tuple(zero_row for _ in q_list),
            tuple(zero_row for _ in q_list),
            tuple(zero_row for _ in dchg_list),
            tuple(zero_row for _ in qchg_list),
            tuple(zero_row for _ in qchg_list),
            jnp.ones((1, tb), dtype))
    final = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step,
                              init)
    valid_ref[:] = final[-1]


def _tran_tile(n: int, n_steps: int, n_rows: int) -> int:
    # 512-lane cap, measured on v5e across the three workload shapes:
    # smaller tiles decouple the Newton while_loop's per-tile tail (the
    # loop runs to the slowest LANE in the tile — ring MC +16% vs 2048),
    # and 512 still amortizes the per-cell fixed cost that craters the
    # 1M-variant linear and boost workloads at 128-256 (-45%/-35%)
    per_lane = 4 * (n_steps + 2 * n * n + n_rows + 10 * n)
    tile = _VMEM_BUDGET // (per_lane * _LANE) * _LANE
    return int(max(_LANE, min(512, tile)))


@functools.partial(
    jax.jit, static_argnames=("n", "node_idx", "pattern", "eps",
                              "vd_scale", "nr", "nr_tol", "max_nr",
                              "interpret"))
def mc_tran_fused_f32(vs_grid: Array, values: Array, n: int,
                      node_idx: int, pattern: tuple, eps: float = EPS,
                      vd_scale: float = 1.0, nr: str = "spicey",
                      nr_tol: float = 1e-9, max_nr: int = 20,
                      interpret: bool = False) -> tuple[Array, Array]:
    """Fused whole-transient MC: vs_grid (S+1, nSrc), values (n_rows, B)
    -> (v_node (B, S+1) f32, valid (B,) bool)."""
    f32 = jnp.float32
    vs_grid = vs_grid.astype(f32)
    if vs_grid.shape[1] == 0:  # sourceless deck: keep SMEM non-empty
        vs_grid = jnp.zeros((vs_grid.shape[0], 1), f32)
    values = values.astype(f32)
    n_steps = vs_grid.shape[0]
    B = values.shape[-1]
    tile = _tran_tile(n, n_steps, values.shape[0])
    pad = (-B) % tile
    if pad:
        values = jnp.concatenate(
            [values, jnp.ones((values.shape[0], pad), f32)], axis=-1)
    Bp = B + pad
    has_nl = any(bool(pattern[i]) for i in (5, 6, 7, 8))
    kernel = (functools.partial(
        _fused_tran_nr_kernel, n=n, node_idx=node_idx, eps=eps,
        n_steps=n_steps, pattern=pattern, vd_scale=vd_scale, nr=nr,
        nr_tol=nr_tol, max_nr=max_nr)
        if has_nl else functools.partial(
            _fused_tran_kernel, n=n, node_idx=node_idx, eps=eps,
            n_steps=n_steps, pattern=pattern))
    out, valid = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((n_steps, vs_grid.shape[1]),
                         lambda i: (_z(), _z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((values.shape[0], tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_steps, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, Bp), f32),
            jax.ShapeDtypeStruct((1, Bp), f32),
        ],
        scratch_shapes=(
            # NR mode: augmented working planes + cached linear part +
            # solution + per-lane Newton state rows (on|done|vnr);
            # linear mode: [A | I] planes for the factor-once path
            [pltpu.VMEM((n, n + 1, tile), f32),
             pltpu.VMEM((n, n, tile), f32),
             pltpu.VMEM((n, tile), f32),
             pltpu.VMEM((len(pattern[5]) + 2, tile), f32)]
            if has_nl else
            [pltpu.VMEM((n, n, tile), f32),
             pltpu.VMEM((n, n, tile), f32)]),
        interpret=interpret,
    )(vs_grid, values)
    return out[:, :B].T, valid[0, :B] > 0.5
