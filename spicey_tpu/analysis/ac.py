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

from ..constants import EPS
from ..ir.circuit import CircuitTensors, build_tensors, ext_arrays
from ..ops.linsolve import solve_planes
from ..ops.stamps import (
    pad_solution,
    stamp_admittance,
    stamp_current,
    stamp_extended,
    stamp_voltage_source,
)
from ..parsing.netlist import ParsedCircuit
from ..utils.logspace import linear_grid, logspace
from .results import ACResult


def build_frequency_array(mode: str, N: int, f1: float, f2: float) -> np.ndarray:
    if mode == "dec":
        return logspace(f1, f2, N)
    return linear_grid(f1, f2, N)


def _inductor_susceptance(f, l_vals):
    """Imag part of Y_L = -1/(2*pi*f*L), masked open when |2*pi*f*L| < EPS."""
    wl = 2.0 * jnp.pi * f * l_vals
    small = jnp.abs(wl) < EPS
    return jnp.where(small, 0.0, -1.0 / jnp.where(small, 1.0, wl))


def _assemble_one(f, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
                  v_re, v_im, nvar, ext=None, i_re=None, i_im=None):
    """Build (A_re, A_im, b_re, b_im) for one frequency; pure scatter-adds."""
    dtype = r_vals.dtype
    A_re = jnp.zeros((nvar + 1, nvar + 1), dtype=dtype)
    A_im = jnp.zeros((nvar + 1, nvar + 1), dtype=dtype)
    b_re = jnp.zeros((nvar + 1,), dtype=dtype)
    b_im = jnp.zeros((nvar + 1,), dtype=dtype)

    A_re = stamp_admittance(A_re, r_idx, 1.0 / r_vals)
    A_im = stamp_admittance(A_im, c_idx, 2.0 * jnp.pi * f * c_vals)
    A_im = stamp_admittance(A_im, l_idx, _inductor_susceptance(f, l_vals))
    A_re, b_re = stamp_voltage_source(A_re, b_re, v_idx, v_re)
    b_im = b_im.at[v_idx[:, 2]].add(v_im)
    if ext is not None:
        # extended-dialect current sources: RHS phasor injection
        b_re = stamp_current(b_re, ext["i_idx"], i_re)
        b_im = stamp_current(b_im, ext["i_idx"], i_im)
        # controlled sources: real, frequency-independent stamps
        A_re = stamp_extended(A_re, ext)
    return (A_re[:nvar, :nvar], A_im[:nvar, :nvar],
            b_re[:nvar], b_im[:nvar])


def _assemble_grid(freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
                   v_idx, v_re, v_im, nvar, ext=None, i_re=None,
                   i_im=None):
    """Assembly vmapped over the frequency grid -> (F, N, N) planes."""
    assemble = jax.vmap(
        lambda f: _assemble_one(
            f, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
            v_re, v_im, nvar, ext=ext, i_re=i_re, i_im=i_im,
        )
    )
    return assemble(freqs)


@partial(jax.jit, static_argnames=("nvar", "method", "interpret"))
def _ac_sweep_core(freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
                   v_idx, v_re, v_im, nvar: int, method: str = "gj",
                   interpret: bool = False, ext=None, i_re=None, i_im=None):
    """vmapped assemble + one batched solve over the whole grid."""
    A_re, A_im, b_re, b_im = _assemble_grid(
        freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
        v_re, v_im, nvar, ext=ext, i_re=i_re, i_im=i_im,
    )
    x_re, x_im, valid = solve_planes(A_re, A_im, b_re, b_im,
                                     method=method, interpret=interpret)
    return x_re, x_im, valid


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
        wl = w[:, None] * tensors.l_vals[None, :]
        y_l = np.where(np.abs(wl) < EPS, 0.0,
                       -1.0 / np.where(np.abs(wl) < EPS, 1.0, wl))
        i_l = (1j * y_l) * vdrop(tensors.l_idx)
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
    return out


def simulate_ac(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    interpret: bool = False,
) -> ACResult | None:
    if ckt.ac is None:
        return None
    for r in ckt.R:
        if r.R <= 0:
            raise ValueError(f"R {r.name} must be > 0")

    if tensors is None:
        tensors = build_tensors(ckt)
    freqs = build_frequency_array(ckt.ac.mode, ckt.ac.N, ckt.ac.f1, ckt.ac.f2)

    # V phasors: fromPolar(acMag, acPhaseDeg) (Complex.ts:16-19)
    ph = tensors.v_ac_phase_deg * math.pi / 180.0
    v_re = tensors.v_ac_mag * np.cos(ph)
    v_im = tensors.v_ac_mag * np.sin(ph)
    iph = tensors.i_ac_phase_deg * math.pi / 180.0
    i_re = tensors.i_ac_mag * np.cos(iph)
    i_im = tensors.i_ac_mag * np.sin(iph)

    x_re, x_im, valid = _ac_sweep_core(
        jnp.asarray(freqs),
        jnp.asarray(tensors.r_idx), jnp.asarray(tensors.r_vals),
        jnp.asarray(tensors.c_idx), jnp.asarray(tensors.c_vals),
        jnp.asarray(tensors.l_idx), jnp.asarray(tensors.l_vals),
        jnp.asarray(tensors.v_idx), jnp.asarray(v_re), jnp.asarray(v_im),
        nvar=tensors.nvar, method=method, interpret=interpret,
        ext=ext_arrays(tensors),
        i_re=jnp.asarray(i_re), i_im=jnp.asarray(i_im),
    )
    if not bool(np.all(np.asarray(valid))):
        raise ValueError("Singular matrix in AC solve")
    x = np.asarray(x_re) + 1j * np.asarray(x_im)  # (F, nvar) complex128

    node_voltages = {
        name: x[:, i] for i, name in enumerate(tensors.node_names)
    }
    element_currents = _element_currents(tensors, freqs, x)
    return ACResult(
        freqs=freqs,
        node_voltages=node_voltages,
        element_currents=element_currents,
    )
