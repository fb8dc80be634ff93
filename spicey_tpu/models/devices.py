"""Nonlinear device linearizations: MOSFET level-1 and BJT (Ebers-Moll).

Extended-dialect device families the reference does not implement (M and Q
lines land in `skipped`, /root/reference/lib/parsing/parseNetlist.ts:444-446;
BASELINE.json lists CMOS/BJT stamps as the stretch config). These are the
Newton companion models consumed by the transient scan and the .op solve:
each function maps junction/terminal voltages to (conductances, equivalent
currents) for branch-free vectorized stamping — batch-dim agnostic, so one
call linearizes every device across all Monte-Carlo lanes at once. The
``xp`` parameter selects the array backend: jnp (default) for the compiled
engines, np for the host interp tier (analysis/interp.py), which must not
touch jax (the whole point of that tier is zero backend initialization).

Conventions:
  - device polarity is a ±1 "type" array (NMOS/NPN = +1, PMOS/PNP = -1);
    equations run in the reflected (+1) frame and currents map back by the
    type sign, so no boolean branching enters the compiled program;
  - conductances get a GMIN floor (same 1e-12 the diode companion uses,
    simulateTRAN.ts:95) so cutoff devices never produce singular systems;
  - BJT junctions use the diode's voltage clamp [-1.0, +0.8] V
    (simulateTRAN.ts:89-91) to bound exp() during Newton; the MOSFET square
    law is polynomial and needs no limiting.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as _np

from ..constants import DIODE_VD_MAX, DIODE_VD_MIN, GMIN, VT_300K
from ..utils.fpaccuracy import accurate_exp


def mos_level1(vgs, vds, beta, vto, lam, mtype, xp=jnp):
    """MOSFET level-1 (Shichman-Hodges) linearization.

    vgs, vds: (..., nM) terminal voltages (gate-source, drain-source);
    beta = Kp*W/L; vto threshold; lam channel-length modulation; mtype ±1.

    Returns (gm, gds, i_eq, i_d):
      i_d(vgs, vds) ≈ gm*vgs + gds*vds + i_eq  (drain->source current)
    with source/drain swap symmetry for vds < 0.
    """
    s = mtype
    vgs_r = s * vgs
    vds_r = s * vds
    # symmetric operation: for vds_r < 0 exchange drain and source
    swap = vds_r < 0
    vgs_e = xp.where(swap, vgs_r - vds_r, vgs_r)  # = vgd when swapped
    vds_e = xp.abs(vds_r)

    # the threshold reflects with the device polarity: an enhancement PMOS
    # carries Vto < 0 (SPICE convention) and conducts when s*vgs > s*vto
    vov = vgs_e - s * vto
    cutoff = vov <= 0.0
    sat = vds_e >= vov
    one_lam = 1.0 + lam * vds_e

    id_sat = 0.5 * beta * vov * vov * one_lam
    id_tri = beta * (vov - 0.5 * vds_e) * vds_e * one_lam
    i_fwd = xp.where(cutoff, 0.0, xp.where(sat, id_sat, id_tri))

    gm_sat = beta * vov * one_lam
    gm_tri = beta * vds_e * one_lam
    gm_e = xp.where(cutoff, 0.0, xp.where(sat, gm_sat, gm_tri))

    gds_sat = 0.5 * beta * vov * vov * lam
    gds_tri = (beta * (vov - vds_e) * one_lam
               + beta * (vov - 0.5 * vds_e) * vds_e * lam)
    gds_e = xp.where(cutoff, 0.0, xp.where(sat, gds_sat, gds_tri))

    # map the swapped frame back: i_d = -i_fwd; with vgs_e = vgs_r - vds_r,
    # vds_e = -vds_r the chain rule gives
    #   gm  = d i_d / d vgs_r = -gm_e
    #   gds = d i_d / d vds_r = gm_e + gds_e
    i_r = xp.where(swap, -i_fwd, i_fwd)
    gm_r = xp.where(swap, -gm_e, gm_e)
    gds_r = xp.where(swap, gm_e + gds_e, gds_e)
    gds_r = xp.maximum(gds_r, GMIN)

    # reflect to the physical frame: i_d = s * i_r(s*vgs, s*vds), so the
    # conductances are sign-invariant and only the equivalent source flips
    i_d = s * i_r
    i_eq = i_d - gm_r * vgs - gds_r * vds
    return gm_r, gds_r, i_eq, i_d


def diode_charge_cap(vd, i_d, g_d, tt, cjo, vj, m, fc, xp=jnp):
    """SPICE diode charge q(vd) and capacitance C(vd) = dq/dvd.

    ``vd`` is the TRUE junction voltage: the depletion model is
    polynomial and needs no Newton limiting — and it must see the real
    reverse voltage. Evaluating it at the clamped voltage freezes the
    committed charge at q(DIODE_VD_MIN) once the junction swings past
    the clamp window, so the discharge current never accumulates and a
    reverse-recovery transient pins at the clamp (LTE steppers then
    crawl at dt_min forever). Only the exponential pieces are limited:
    pass ``i_d``/``g_d`` (Shockley current and conductance) already
    evaluated at the limited voltage.

    Diffusion charge TT*i_d plus
    the depletion charge: below fc*vj the closed form
    ``CJO*VJ/(1-M)*(1-(1-v/VJ)^(1-M))``, above it SPICE's quadratic
    extension (C is linear in v there), continuous in both q and C at the
    breakpoint. All-zero TT and CJO give exactly q = C = 0 — the
    reference's memoryless diode.
    """
    fcv = fc * vj
    below = vd < fcv
    arg = xp.maximum(1.0 - xp.where(below, vd, 0.0) / vj, 1e-12)
    q_dep_b = cjo * vj / (1.0 - m) * (1.0 - arg ** (1.0 - m))
    c_dep_b = cjo * arg ** (-m)
    f1 = cjo * vj / (1.0 - m) * (1.0 - (1.0 - fc) ** (1.0 - m))
    c0 = cjo * (1.0 - fc) ** (-(1.0 + m))
    q_dep_a = f1 + c0 * ((1.0 - fc * (1.0 + m)) * (vd - fcv)
                         + m / (2.0 * vj) * (vd * vd - fcv * fcv))
    c_dep_a = c0 * (1.0 - fc * (1.0 + m) + m * vd / vj)
    q = tt * i_d + xp.where(below, q_dep_b, q_dep_a)
    c = tt * g_d + xp.where(below, c_dep_b, c_dep_a)
    return q, c


def bjt_ebers_moll(vbe, vbc, i_s, bf, br, qtype, vt=VT_300K,
                   vbe_lim=None, vbc_lim=None, xp=jnp):
    """BJT Ebers-Moll (transport form) linearization.

    vbe, vbc: (..., nQ) junction voltages; i_s saturation current;
    bf/br forward/reverse beta; qtype ±1 (NPN/PNP); vt the thermal voltage
    kT/q (VT_300K default; extended ``.temp`` passes tensors.vt).
    ``vbe_lim``/``vbc_lim``: REFLECTED-frame junction voltages already
    limited by the caller (the .op Newton's pnjlim) — when given they
    replace the default absolute clamp, which creates wrong stationary
    points for power devices whose true drop exceeds the window.

    Returns (gbe, gbc, gmf, gmr, ibe_eq, ibc_eq, ict_eq, i_c, i_b) where
      base-emitter diode:  i = gbe*vbe + ibe_eq
      base-collector diode: i = gbc*vbc + ibc_eq
      transport source c->e: i = gmf*vbe - gmr*vbc + ict_eq
    and i_c/i_b are the full nonlinear collector/base terminal currents
    (for result recording).
    """
    s = qtype
    if vbe_lim is not None:
        vbe_l, vbc_l = vbe_lim, vbc_lim
    else:
        tscale = vt / VT_300K  # clamp window scales with T (see tran)
        vbe_l = xp.clip(s * vbe, DIODE_VD_MIN * tscale,
                         DIODE_VD_MAX * tscale)
        vbc_l = xp.clip(s * vbc, DIODE_VD_MIN * tscale,
                         DIODE_VD_MAX * tscale)

    _exp = accurate_exp if xp is jnp else _np.exp
    ebe = _exp(vbe_l / vt)
    ebc = _exp(vbc_l / vt)

    ibe = (i_s / bf) * (ebe - 1.0)
    ibc = (i_s / br) * (ebc - 1.0)
    ict = i_s * (ebe - ebc)

    gbe = xp.maximum((i_s / bf) / vt * ebe, GMIN)
    gbc = xp.maximum((i_s / br) / vt * ebc, GMIN)
    gmf = xp.maximum(i_s / vt * ebe, GMIN)
    gmr = xp.maximum(i_s / vt * ebc, GMIN)

    # equivalent sources in the reflected frame, then flip by the type sign
    # (conductances are invariant: i and v flip together)
    ibe_eq = s * (ibe - gbe * vbe_l)
    ibc_eq = s * (ibc - gbc * vbc_l)
    ict_eq = s * (ict - gmf * vbe_l + gmr * vbc_l)

    i_c = s * (ict - ibc)
    i_b = s * (ibe + ibc)
    return gbe, gbc, gmf, gmr, ibe_eq, ibc_eq, ict_eq, i_c, i_b
