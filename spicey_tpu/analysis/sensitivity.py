"""Sensitivity analysis via automatic differentiation.

No reference analog (and no classical-SPICE adjoint machinery needed): the
whole engine is differentiable JAX, so exact parameter sensitivities come
from ``jax.jacfwd`` through the same compiled assemble+solve programs the
analyses use. Forward mode is the right choice here — parameter counts are
small (a handful of swept elements), response vectors are long (F
frequencies / S timesteps), and forward mode differentiates cleanly through
the transient ``lax.while_loop`` Newton iteration, which reverse mode
cannot.

APIs:
  sensitivity_ac(ckt, node, wrt)   -> {name: d|V(node)|/dvalue, (F,)}
  sensitivity_tran(ckt, node, wrt) -> {name: dV(node,t)/dvalue, (S+1,)}

``wrt`` names R/C/L element values and V-source DC levels (case-
insensitive). Sensitivities are exact derivatives of the discretized
response — the same quantity a finite-difference sweep of the engine would
estimate, without step-size error or extra solves per parameter direction
beyond the one JVP each.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.circuit import (
    CircuitTensors,
    build_tensors,
    effective_time_step,
    ext_arrays,
    lk_arrays,
    nl_arrays,
    sample_source_values,
    tl_arrays,
)
from ..parsing.netlist import ParsedCircuit
from .ac import _ac_sweep_core, ac_vsource_arrays, build_frequency_array
from .tran import _tran_core


def _wrt_slots(tensors: CircuitTensors, wrt) -> list[tuple[str, int]]:
    """Resolve wrt names to (group, index) slots; raises on unknowns."""
    groups = {
        "r": [n.upper() for n in tensors.r_names],
        "c": [n.upper() for n in tensors.c_names],
        "l": [n.upper() for n in tensors.l_names],
        "v": [n.upper() for n in tensors.v_names],
    }
    slots = []
    for name in wrt:
        key = name.upper()
        for g, names in groups.items():
            if key in names:
                slots.append((g, names.index(key)))
                break
        else:
            raise ValueError(f"unknown sensitivity target {name!r}")
    return slots


def _apply(tensors: CircuitTensors, slots, theta):
    """Scatter the wrt parameter vector theta into the value arrays."""
    vals = {
        "r": jnp.asarray(tensors.r_vals),
        "c": jnp.asarray(tensors.c_vals),
        "l": jnp.asarray(tensors.l_vals),
        "v": jnp.asarray(tensors.v_dc),
    }
    for j, (g, i) in enumerate(slots):
        vals[g] = vals[g].at[i].set(theta[j])
    return vals


def sensitivity_ac(
    ckt: ParsedCircuit,
    node: str,
    wrt,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
) -> dict[str, np.ndarray]:
    """d|V(node, f)|/d(value) for each element named in ``wrt``.

    One jacfwd over the full AC sweep: returns (F,) arrays keyed by the
    original wrt spellings. (V-source targets differentiate w.r.t. the AC
    drive's *scale* via the DC slot only when the source has no AC spec;
    for AC sweeps, R/C/L values are the meaningful targets.)
    """
    if ckt.ac is None:
        raise ValueError("netlist has no .ac analysis")
    if tensors is None:
        tensors = build_tensors(ckt)
    slots = _wrt_slots(tensors, wrt)
    freqs = build_frequency_array(ckt.ac.mode, ckt.ac.N, ckt.ac.f1, ckt.ac.f2)
    node_idx = [n.upper() for n in tensors.node_names].index(node.upper())

    # B sources ride as 0 V small-signal shorts and T lines as their exact
    # phasor stamps — the same assembly simulate_ac jits, so jacfwd
    # differentiates exactly what the engine computes
    v_idx_ac, v_re, v_im = ac_vsource_arrays(ckt, tensors)
    v_re, v_im = jnp.asarray(v_re), jnp.asarray(v_im)
    iph = tensors.i_ac_phase_deg * math.pi / 180.0
    i_re = jnp.asarray(tensors.i_ac_mag * np.cos(iph))
    i_im = jnp.asarray(tensors.i_ac_mag * np.sin(iph))
    ext = ext_arrays(tensors)

    @partial(jax.jit, static_argnames=())
    def response(theta):
        vals = _apply(tensors, slots, theta)
        x_re, x_im, _valid = _ac_sweep_core(
            jnp.asarray(freqs),
            jnp.asarray(tensors.r_idx), vals["r"],
            jnp.asarray(tensors.c_idx), vals["c"],
            jnp.asarray(tensors.l_idx), vals["l"],
            jnp.asarray(v_idx_ac), v_re, v_im,
            nvar=tensors.nvar, method=method,
            ext=ext, i_re=i_re, i_im=i_im, lk=lk_arrays(tensors),
            tl=tl_arrays(tensors),
        )
        return jnp.sqrt(x_re[:, node_idx] ** 2 + x_im[:, node_idx] ** 2)

    theta0 = jnp.asarray(
        [float({"r": tensors.r_vals, "c": tensors.c_vals,
                "l": tensors.l_vals, "v": tensors.v_dc}[g][i])
         for g, i in slots]
    )
    jac = jax.jacfwd(response)(theta0)  # (F, nWrt)
    jac = np.asarray(jac)
    return {name: jac[:, j] for j, name in enumerate(wrt)}


def sensitivity_tran(
    ckt: ParsedCircuit,
    node: str,
    wrt,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    integration: str = "be",
    nr: str = "spicey",
) -> dict[str, np.ndarray]:
    """dV(node, t)/d(value) over the whole transient, per wrt element.

    Forward-mode AD flows the tangents through the scan, the Newton
    while_loop, the companion-state commits, and the switch hysteresis
    masking — the derivative of exactly what the engine computes.
    """
    if ckt.tran is None:
        raise ValueError("netlist has no .tran analysis")
    if tensors is None:
        tensors = build_tensors(ckt)
    slots = _wrt_slots(tensors, wrt)
    node_idx = [n.upper() for n in tensors.node_names].index(node.upper())

    dt, steps = effective_time_step(ckt.tran.dt, ckt.tran.tstop)
    times = np.arange(steps + 1, dtype=np.float64) * dt
    vs_grid = sample_source_values(ckt, times)
    has_wave = np.concatenate([tensors.v_has_waveform,
                               tensors.i_has_waveform])
    ext = ext_arrays(tensors)
    nl = nl_arrays(tensors)
    if (tensors.n_m or tensors.n_q) and nr == "spicey":
        nr = "converged"
    # B sources / T lines / junction charge flow through the same scan
    # simulate_tran runs; forward-mode tangents ride the history carries
    from ..ir.circuit import bsrc_static, dchg_arrays, qchg_arrays, tl_arrays
    from .tran import _tline_hist_len
    bsrc = bsrc_static(ckt, tensors.nvar)
    tl = tl_arrays(tensors)
    hist_len = _tline_hist_len(tensors, dt)
    dchg = dchg_arrays(tensors)
    qchg = qchg_arrays(tensors)
    times_j = jnp.asarray(times)

    @partial(jax.jit, static_argnames=())
    def response(theta):
        vals = _apply(tensors, slots, theta)
        # a V-source wrt target drives the whole (waveform-less) grid column
        vs = jnp.asarray(vs_grid)
        for j, (g, i) in enumerate(slots):
            if g == "v" and not has_wave[i]:
                vs = vs.at[:, i].set(theta[j])
        xs, _sw, _valid, _st = _tran_core(
            vs, jnp.asarray(dt, jnp.float64),
            jnp.asarray(tensors.r_idx), vals["r"],
            jnp.asarray(tensors.c_idx), vals["c"],
            jnp.asarray(tensors.l_idx), vals["l"],
            jnp.asarray(tensors.v_idx),
            jnp.asarray(tensors.s_idx),
            jnp.asarray(tensors.s_ron), jnp.asarray(tensors.s_roff),
            jnp.asarray(tensors.s_von), jnp.asarray(tensors.s_voff),
            jnp.asarray(tensors.d_idx),
            jnp.asarray(tensors.d_is), jnp.asarray(tensors.d_n),
            nvar=tensors.nvar, method=method, integration=integration,
            nr=nr, ext=ext, nl=nl, lk=lk_arrays(tensors), record=node_idx,
            bsrc=bsrc, times=times_j, tl=tl, hist_len=hist_len,
            dchg=dchg, qchg=qchg,
        )
        return xs  # (S+1,)

    theta0 = jnp.asarray(
        [float({"r": tensors.r_vals, "c": tensors.c_vals,
                "l": tensors.l_vals, "v": tensors.v_dc}[g][i])
         for g, i in slots]
    )
    jac = np.asarray(jax.jacfwd(response)(theta0))  # (S+1, nWrt)
    return {name: jac[:, j] for j, name in enumerate(wrt)}
