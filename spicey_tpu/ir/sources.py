"""Device-side source evaluation at arbitrary time points.

The fixed-step engines precompute source values over the whole grid
(ir/circuit.sample_source_values) because their time points are known ahead
of the scan. The adaptive-timestep engine chooses its own time points ON
DEVICE, so sources must evaluate inside the compiled program. This module
compiles every independent source (V then I, same column order as the
sampled grid) into a flat parameter table:

  kind: (nSrc,) int32   0=DC  1=PULSE  2=PWL  3=SIN  4=EXP
  par:  (nSrc, 8)       type-specific scalars (see _eval_* below)
  pwl_t/pwl_v: (nSrc, L) padded PWL breakpoints (clamp-end semantics)

``eval_sources(prog, t)`` computes every source's value at scalar time t as
pure vectorized arithmetic — all five waveform kinds are evaluated and the
right one selected by kind mask (branch-free; nSrc is tiny so the redundant
flops are irrelevant). Semantics mirror the host-side waveforms
(parsing/waveforms.py): PULSE follows pulseValue.ts:4-22 exactly, PWL is
clamp-end linear interpolation (pwlValue.ts:3-16), SIN/EXP the ngspice
extended forms.
"""

from __future__ import annotations

import math

import numpy as np

from ..parsing.netlist import ParsedCircuit
from ..parsing.waveforms import (
    ExpWaveform,
    PulseWaveform,
    PwlWaveform,
    SinWaveform,
)

K_DC, K_PULSE, K_PWL, K_SIN, K_EXP = 0, 1, 2, 3, 4
_NPAR = 8


def build_source_program(ckt: ParsedCircuit) -> dict:
    """Compile V then I sources into the flat device-evaluable table."""
    sources = list(ckt.V) + list(ckt.I)
    n = len(sources)
    kind = np.zeros(n, np.int32)
    par = np.zeros((n, _NPAR), np.float64)
    pwl_len = max(
        [len(s.waveform.pairs) for s in sources
         if isinstance(getattr(s, "waveform", None), PwlWaveform)] or [1]
    )
    pwl_t = np.zeros((n, pwl_len), np.float64)
    pwl_v = np.zeros((n, pwl_len), np.float64)

    for k, s in enumerate(sources):
        w = s.waveform
        dc = s.dc
        dc = 0.0 if (dc != dc or dc == 0.0) else dc  # JS `|| 0`
        if w is None:
            kind[k] = K_DC
            par[k, 0] = dc
        elif isinstance(w, PulseWaveform):
            kind[k] = K_PULSE
            p = w.spec
            ncyc = p.ncycles if math.isfinite(p.ncycles) else 1e300
            par[k, :8] = [p.v1, p.v2, p.td, p.tr, p.tf, p.ton, p.period,
                          ncyc]
        elif isinstance(w, PwlWaveform):
            kind[k] = K_PWL
            pairs = w.pairs
            ts = [t for t, _ in pairs]
            vs = [v for _, v in pairs]
            # pad by repeating the last breakpoint: interp then clamps
            ts += [ts[-1]] * (pwl_len - len(ts))
            vs += [vs[-1]] * (pwl_len - len(vs))
            pwl_t[k] = ts
            pwl_v[k] = vs
        elif isinstance(w, SinWaveform):
            kind[k] = K_SIN
            p = w.spec
            par[k, :6] = [p.vo, p.va, p.freq, p.td, p.theta, p.phase_deg]
        elif isinstance(w, ExpWaveform):
            kind[k] = K_EXP
            p = w.spec
            par[k, :6] = [p.v1, p.v2, p.td1, p.tau1, p.td2, p.tau2]
        else:  # pragma: no cover - future waveform kinds
            raise ValueError(f"unsupported waveform on source {s.name}")
    return {
        "kind": kind, "par": par, "pwl_t": pwl_t, "pwl_v": pwl_v,
    }


def eval_sources(prog, t):
    """Value of every source at scalar time t (traced). Returns (nSrc,)."""
    import jax.numpy as jnp

    par = prog["par"]
    kind = prog["kind"]

    # DC
    v_dc = par[:, 0]

    # PULSE (pulseValue.ts:4-22): before delay -> v1; fold by period; after
    # ncycles cycles -> v1; linear rise tr, hold ton, linear fall tf.
    v1, v2, td, tr, tf, ton, period, ncyc = (par[:, i] for i in range(8))
    tc = t - td
    safe_period = jnp.where(period > 0, period, 1.0)
    cycle = jnp.floor(tc / safe_period)
    tin = tc - cycle * safe_period
    after_cycles = cycle >= ncyc
    rise_frac = jnp.where(tr > 0, jnp.clip(tin / jnp.where(tr > 0, tr, 1.0),
                                           0.0, 1.0), 1.0)
    in_rise = tin < tr
    in_on = jnp.logical_and(~in_rise, tin < tr + ton)
    in_fall = jnp.logical_and(tin >= tr + ton, tin < tr + ton + tf)
    fall_frac = jnp.where(
        tf > 0, jnp.clip((tin - tr - ton) / jnp.where(tf > 0, tf, 1.0),
                         0.0, 1.0), 1.0)
    v_pulse = jnp.where(
        in_rise, v1 + (v2 - v1) * rise_frac,
        jnp.where(in_on, v2,
                  jnp.where(in_fall, v2 + (v1 - v2) * fall_frac, v1)))
    v_pulse = jnp.where(jnp.logical_or(tc < 0, after_cycles), v1, v_pulse)

    # PWL: clamp-end linear interpolation over padded breakpoints
    pwl_t = prog["pwl_t"]
    pwl_v = prog["pwl_v"]
    v_pwl = jnp.stack([
        jnp.interp(t, pwl_t[k], pwl_v[k]) for k in range(pwl_t.shape[0])
    ]) if pwl_t.shape[0] else jnp.zeros((0,))

    # SIN
    vo, va, freq, std, theta, phase = (par[:, i] for i in range(6))
    dt_s = t - std
    act = dt_s >= 0
    v_sin = vo + va * jnp.exp(-jnp.where(act, dt_s, 0.0) * theta) * jnp.sin(
        2.0 * jnp.pi * (freq * dt_s + phase / 360.0))
    v_sin = jnp.where(act, v_sin, vo)

    # EXP
    e1, e2, td1, tau1, td2, tau2 = (par[:, i] for i in range(6))
    tau1 = jnp.maximum(tau1, 1e-30)
    tau2 = jnp.maximum(tau2, 1e-30)
    d1 = jnp.maximum(t - td1, 0.0)
    d2 = jnp.maximum(t - td2, 0.0)
    v_exp = (e1
             + jnp.where(t >= td1,
                         (e2 - e1) * (1.0 - jnp.exp(-d1 / tau1)), 0.0)
             + jnp.where(t >= td2,
                         (e1 - e2) * (1.0 - jnp.exp(-d2 / tau2)), 0.0))

    out = jnp.where(kind == K_PULSE, v_pulse, v_dc)
    out = jnp.where(kind == K_PWL, v_pwl, out)
    out = jnp.where(kind == K_SIN, v_sin, out)
    out = jnp.where(kind == K_EXP, v_exp, out)
    return out
