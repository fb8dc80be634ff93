"""Gradient-based circuit fitting / design optimization.

The engine is end-to-end differentiable, so element values can be *solved
for*: given a target response (a measured frequency response, a desired
transient trace), gradient descent through the compiled simulation finds
the R/C/L/V values that produce it. The reference — and classical SPICE —
can only wrap finite-difference optimizers around whole simulations.

Parameters are optimized in log-space (element values are positive and
span decades), with plain Adam implemented inline (no optimizer-library
dependency). AC fitting uses reverse-mode gradients (one backward pass per
step regardless of parameter count); transient fitting uses forward-mode
(reverse cannot differentiate the Newton ``while_loop``), which is cheap
for the few-parameter fits this targets.

API:
  fit_ac(ckt, node, target, wrt)    -> FitResult (fitted values, loss curve)
  fit_tran(ckt, node, target, wrt)  -> FitResult
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.circuit import CircuitTensors, build_tensors, lk_arrays
from ..parsing.netlist import ParsedCircuit
from .sensitivity import _apply, _wrt_slots


@dataclass
class FitResult:
    values: dict[str, float]      # fitted element values
    loss: float                   # final loss
    loss_history: np.ndarray      # (steps,)
    converged: bool               # loss decreased and is finite


def _theta0(tensors: CircuitTensors, slots, x0):
    base = {"r": tensors.r_vals, "c": tensors.c_vals,
            "l": tensors.l_vals, "v": tensors.v_dc}
    vals = [float(base[g][i]) for g, i in slots]
    if x0 is not None:
        vals = [float(x0.get(name, v)) for name, v in zip(x0.keys(), vals)] \
            if False else vals  # x0 applied by name below
    return np.asarray(vals, np.float64)


def _adam_fit(loss_fn, theta0_log, steps, lr, grad_mode):
    """Inline Adam in log-parameter space. Returns (theta_log, history)."""
    if grad_mode == "reverse":
        vg = jax.jit(jax.value_and_grad(loss_fn))
    else:
        loss_j = jax.jit(loss_fn)
        grad_j = jax.jit(jax.jacfwd(loss_fn))

        def vg(p):
            return loss_j(p), grad_j(p)

    m = jnp.zeros_like(theta0_log)
    v = jnp.zeros_like(theta0_log)
    p = jnp.asarray(theta0_log)
    b1, b2, eps = 0.9, 0.999, 1e-8
    history = []
    for k in range(1, steps + 1):
        val, g = vg(p)
        history.append(float(val))
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** k)
        vh = v / (1 - b2 ** k)
        p = p - lr * mh / (jnp.sqrt(vh) + eps)
    return p, np.asarray(history)


def fit_ac(
    ckt: ParsedCircuit,
    node: str,
    target_mag: np.ndarray,
    wrt,
    tensors: CircuitTensors | None = None,
    x0: dict[str, float] | None = None,
    steps: int = 200,
    lr: float = 0.05,
    method: str = "gj",
) -> FitResult:
    """Fit the named element values so |V(node, f)| matches ``target_mag``
    (one value per frequency of the netlist's .ac grid). Loss = mean squared
    relative error; optimization in log-space via Adam."""
    import math as _math

    from ..ir.circuit import ext_arrays, tl_arrays
    from .ac import _ac_sweep_core, ac_vsource_arrays, build_frequency_array

    if ckt.ac is None:
        raise ValueError("netlist has no .ac analysis")
    if tensors is None:
        tensors = build_tensors(ckt)
    slots = _wrt_slots(tensors, wrt)
    freqs = build_frequency_array(ckt.ac.mode, ckt.ac.N, ckt.ac.f1, ckt.ac.f2)
    if len(target_mag) != len(freqs):
        raise ValueError(
            f"target has {len(target_mag)} points, grid has {len(freqs)}")
    node_idx = [n.upper() for n in tensors.node_names].index(node.upper())

    # B sources as 0 V small-signal shorts, T lines as phasor stamps —
    # the same assembly simulate_ac jits (see sensitivity_ac)
    v_idx_ac, v_re, v_im = ac_vsource_arrays(ckt, tensors)
    v_re, v_im = jnp.asarray(v_re), jnp.asarray(v_im)
    iph = tensors.i_ac_phase_deg * _math.pi / 180.0
    i_re = jnp.asarray(tensors.i_ac_mag * np.cos(iph))
    i_im = jnp.asarray(tensors.i_ac_mag * np.sin(iph))
    ext = ext_arrays(tensors)
    target = jnp.asarray(np.asarray(target_mag, np.float64))

    def loss_fn(theta_log):
        vals = _apply(tensors, slots, jnp.exp(theta_log))
        x_re, x_im, _ = _ac_sweep_core(
            jnp.asarray(freqs),
            jnp.asarray(tensors.r_idx), vals["r"],
            jnp.asarray(tensors.c_idx), vals["c"],
            jnp.asarray(tensors.l_idx), vals["l"],
            jnp.asarray(v_idx_ac), v_re, v_im,
            nvar=tensors.nvar, method=method,
            ext=ext, i_re=i_re, i_im=i_im, lk=lk_arrays(tensors),
            tl=tl_arrays(tensors),
        )
        mag = jnp.sqrt(x_re[:, node_idx] ** 2 + x_im[:, node_idx] ** 2)
        rel = (mag - target) / (jnp.abs(target) + 1e-12)
        return jnp.mean(rel * rel)

    th0 = _theta0(tensors, slots, None)
    if x0:
        lower = {n.upper(): j for j, n in enumerate(wrt)}
        for name, val in x0.items():
            th0[lower[name.upper()]] = float(val)
    p, history = _adam_fit(loss_fn, np.log(th0), steps, lr, "reverse")
    fitted = np.exp(np.asarray(p))
    return FitResult(
        values={name: float(fitted[j]) for j, name in enumerate(wrt)},
        loss=float(history[-1]),
        loss_history=history,
        converged=bool(np.isfinite(history[-1])
                       and history[-1] <= history[0]),
    )


def fit_tran(
    ckt: ParsedCircuit,
    node: str,
    target: np.ndarray,
    wrt,
    tensors: CircuitTensors | None = None,
    x0: dict[str, float] | None = None,
    steps: int = 150,
    lr: float = 0.05,
    method: str = "gj",
    integration: str = "be",
    nr: str = "spicey",
) -> FitResult:
    """Fit element values so V(node, t) matches ``target`` over the .tran
    grid (steps+1 points). Forward-mode gradients through the scan."""
    from ..ir.circuit import (
        bsrc_static,
        dchg_arrays,
        effective_time_step,
        ext_arrays,
        nl_arrays,
        qchg_arrays,
        sample_source_values,
        tl_arrays,
    )
    from .tran import _tline_hist_len, _tran_core

    if ckt.tran is None:
        raise ValueError("netlist has no .tran analysis")
    if tensors is None:
        tensors = build_tensors(ckt)
    slots = _wrt_slots(tensors, wrt)
    node_idx = [n.upper() for n in tensors.node_names].index(node.upper())
    dt, nsteps = effective_time_step(ckt.tran.dt, ckt.tran.tstop)
    times = np.arange(nsteps + 1, dtype=np.float64) * dt
    if len(target) != len(times):
        raise ValueError(
            f"target has {len(target)} points, grid has {len(times)}")
    vs_grid = jnp.asarray(sample_source_values(ckt, times))
    ext = ext_arrays(tensors)
    nl = nl_arrays(tensors)
    if (tensors.n_m or tensors.n_q) and nr == "spicey":
        nr = "converged"
    # B sources / T lines / junction charge through the same scan
    bsrc = bsrc_static(ckt, tensors.nvar)
    tl = tl_arrays(tensors)
    hist_len = _tline_hist_len(tensors, dt)
    dchg = dchg_arrays(tensors)
    qchg = qchg_arrays(tensors)
    times_j = jnp.asarray(times)
    tgt = jnp.asarray(np.asarray(target, np.float64))
    scale = jnp.maximum(jnp.max(jnp.abs(tgt)), 1e-12)

    def loss_fn(theta_log):
        vals = _apply(tensors, slots, jnp.exp(theta_log))
        xs, _sw, _valid, _st = _tran_core(
            vs_grid, jnp.asarray(dt, jnp.float64),
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
        rel = (xs - tgt) / scale
        return jnp.mean(rel * rel)

    th0 = _theta0(tensors, slots, None)
    if x0:
        lower = {n.upper(): j for j, n in enumerate(wrt)}
        for name, val in x0.items():
            th0[lower[name.upper()]] = float(val)
    p, history = _adam_fit(loss_fn, np.log(th0), steps, lr, "forward")
    fitted = np.exp(np.asarray(p))
    return FitResult(
        values={name: float(fitted[j]) for j, name in enumerate(wrt)},
        loss=float(history[-1]),
        loss_history=history,
        converged=bool(np.isfinite(history[-1])
                       and history[-1] <= history[0]),
    )
