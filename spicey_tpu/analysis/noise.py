"""Small-signal noise analysis (.noise) — an extension.

The reference has no noise analysis (SURVEY §2.9 lists only AC/TRAN). This
mirrors ngspice's ``.noise v(out[,ref]) <src> <dec|lin> <N> <f1> <f2>``:

  1. solve the DC operating point and linearize every nonlinear device
     there (same small-signal rows the ``linearize="op"`` AC path uses);
  2. for the whole frequency grid at once, solve the ADJOINT system
     ``A(f)^T z = e_out`` — one batched complex solve, exactly the shape
     the AC sweep core already runs, so the TPU sees two (F, N, N) solves
     regardless of how many noise sources the circuit has. By the adjoint
     (reciprocal-network) property, ``z_i - z_j`` is the transfer from a
     unit current injected between nodes (i, j) to v(out), so every noise
     generator's contribution is one vectorized |z_p - z_n|^2 * S product;
  3. solve the forward system with a unit excitation at ``src`` to get the
     gain that refers the output noise back to the input.

Noise generators (all white; no flicker — KF is not in the model set):
  resistor/switch thermal 4kT/R, diode shot 2q*Id, BJT collector and base
  shot 2q*Ic / 2q*Ib, MOSFET channel thermal (8/3)kT*gm.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..constants import EPS, GMIN, K_BOLTZMANN, Q_ELECTRON, T_NOISE
from ..ir.circuit import CircuitTensors, build_tensors, ext_arrays
from ..ops.linsolve import solve_planes
from ..parsing.netlist import ParsedCircuit
from .ac import (
    _assemble_grid,
    _op_voltage_pad,
    build_frequency_array,
    find_input_source,
    format_out_spec,
    small_signal_rows,
)
from .op import simulate_op


@dataclass
class NoiseResult:
    freqs: np.ndarray               # (F,)
    output_psd: np.ndarray          # (F,) V^2/Hz at the output port
    input_psd: np.ndarray           # (F,) referred through |gain|^2
    gain: np.ndarray                # (F,) complex transfer src -> out
    contributions: dict[str, np.ndarray]  # per-device (F,) V^2/Hz
    total_output_rms: float         # sqrt(integral of output_psd over band)
    out_spec: str
    src_name: str

    @property
    def output_v_per_sqrt_hz(self) -> np.ndarray:
        return np.sqrt(self.output_psd)

    @property
    def input_v_per_sqrt_hz(self) -> np.ndarray:
        return np.sqrt(self.input_psd)


def _noise_generators(tensors: CircuitTensors, op) -> tuple[
        np.ndarray, np.ndarray, list[str]]:
    """Every white-noise current generator as (node-pair rows, PSD A^2/Hz,
    owning-device names). Node indices are tran/AC matrix indices with the
    ground dump at tensors.nvar."""
    from ..models.devices import bjt_ebers_moll, mos_level1

    four_kt = 4.0 * K_BOLTZMANN * T_NOISE
    x_pad = _op_voltage_pad(tensors, op)
    idx: list[np.ndarray] = []
    psd: list[np.ndarray] = []
    names: list[str] = []

    if tensors.n_r:
        idx.append(tensors.r_idx)
        psd.append(four_kt / tensors.r_vals)
        names.extend(tensors.r_names)
    if tensors.n_s:
        on = np.asarray([op.switch_states[n] for n in tensors.s_names])
        r_sw = np.maximum(np.abs(np.where(on, tensors.s_ron,
                                          tensors.s_roff)), EPS)
        idx.append(tensors.s_idx[:, :2])
        psd.append(four_kt / r_sw)
        names.extend(tensors.s_names)
    if tensors.n_d:
        i_d = np.abs([op.element_currents[n] for n in tensors.d_names])
        idx.append(tensors.d_idx)
        psd.append(2.0 * Q_ELECTRON * i_d)
        names.extend(tensors.d_names)
    if tensors.n_m:
        mi = tensors.m_idx
        vgs = x_pad[mi[:, 1]] - x_pad[mi[:, 2]]
        vds = x_pad[mi[:, 0]] - x_pad[mi[:, 2]]
        gm, *_ = mos_level1(vgs, vds, tensors.m_beta, tensors.m_vto,
                            tensors.m_lambda, tensors.m_polarity)
        idx.append(mi[:, [0, 2]])  # drain-source channel
        psd.append((8.0 / 3.0) * K_BOLTZMANN * T_NOISE
                   * np.maximum(np.abs(np.asarray(gm)), GMIN))
        names.extend(tensors.m_names)
    if tensors.n_q:
        qi = tensors.q_idx
        vbe = x_pad[qi[:, 1]] - x_pad[qi[:, 2]]
        vbc = x_pad[qi[:, 1]] - x_pad[qi[:, 0]]
        *_, i_c, i_b = bjt_ebers_moll(vbe, vbc, tensors.q_is, tensors.q_bf,
                                      tensors.q_br, tensors.q_polarity)
        idx.append(qi[:, [0, 2]])  # collector shot, c-e
        psd.append(2.0 * Q_ELECTRON * np.abs(np.asarray(i_c)))
        names.extend(tensors.q_names)
        idx.append(qi[:, [1, 2]])  # base shot, b-e
        psd.append(2.0 * Q_ELECTRON * np.abs(np.asarray(i_b)))
        names.extend(tensors.q_names)

    if not idx:
        return (np.zeros((0, 2), np.int32), np.zeros((0,)), [])
    return (np.concatenate(idx, axis=0).astype(np.int32),
            np.concatenate(psd, axis=0).astype(np.float64), names)


def simulate_noise(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    op=None,
) -> NoiseResult | None:
    """Run the `.noise` analysis (None if the netlist has no .noise line).
    ``op`` optionally reuses an already-solved operating point."""
    if ckt.noise is None:
        return None
    if tensors is None:
        tensors = build_tensors(ckt)
    spec = ckt.noise
    nvar = tensors.nvar

    def node_index(name: str) -> int:
        node_id = ckt.nodes.get(name)
        if node_id is None:
            raise ValueError(f"Unknown node {name} in .noise output spec")
        return nvar if node_id == 0 else node_id - 1

    out_p = node_index(spec.out_pos)
    out_n = node_index(spec.out_neg) if spec.out_neg is not None else nvar

    v_pos, i_pos = find_input_source(tensors, spec.src, ".noise")

    if op is None:
        op = simulate_op(ckt, tensors=tensors, method=method)
    ss_idx, ss_g = small_signal_rows(tensors, op)
    ext = ext_arrays(tensors)
    ext["g_idx"] = jnp.concatenate([ext["g_idx"], jnp.asarray(ss_idx)], axis=0)
    ext["g_gm"] = jnp.concatenate([ext["g_gm"], jnp.asarray(ss_g)], axis=0)

    freqs = build_frequency_array(spec.mode, spec.N, spec.f1, spec.f2)
    F = freqs.shape[0]

    # unit excitation at the input source only (all other sources zeroed)
    v_unit = np.zeros(tensors.n_v)
    i_unit = np.zeros(tensors.n_i)
    if v_pos is not None:
        v_unit[v_pos] = 1.0
    else:
        i_unit[i_pos] = 1.0

    A_re, A_im, b_re, b_im = _assemble_grid(
        jnp.asarray(freqs),
        jnp.asarray(tensors.r_idx), jnp.asarray(tensors.r_vals),
        jnp.asarray(tensors.c_idx), jnp.asarray(tensors.c_vals),
        jnp.asarray(tensors.l_idx), jnp.asarray(tensors.l_vals),
        jnp.asarray(tensors.v_idx),
        jnp.asarray(v_unit), jnp.zeros(tensors.n_v),
        nvar, ext=ext,
        i_re=jnp.asarray(i_unit), i_im=jnp.zeros(tensors.n_i),
    )
    # forward solve: gain(f) = v(out) per unit input
    x_re, x_im, ok_f = solve_planes(A_re, A_im, b_re, b_im, method=method)
    # adjoint solve: A^T z = e_out (complex transpose = transpose each plane)
    e_pad = np.zeros(nvar + 1)
    e_pad[out_p] += 1.0
    e_pad[out_n] -= 1.0
    e = jnp.broadcast_to(jnp.asarray(e_pad[:nvar]), (F, nvar))
    z_re, z_im, ok_a = solve_planes(
        jnp.swapaxes(A_re, -1, -2), jnp.swapaxes(A_im, -1, -2),
        e, jnp.zeros_like(e), method=method)

    packed = np.asarray(jnp.concatenate(
        [x_re, x_im, z_re, z_im,
         ok_f[:, None].astype(x_re.dtype), ok_a[:, None].astype(x_re.dtype)],
        axis=1))
    if not bool(np.all(packed[:, -2:] > 0.5)):
        raise ValueError("Singular matrix in .noise solve")
    x = packed[:, :nvar] + 1j * packed[:, nvar:2 * nvar]
    z = packed[:, 2 * nvar:3 * nvar] + 1j * packed[:, 3 * nvar:4 * nvar]
    x_pad = np.concatenate([x, np.zeros((F, 1), np.complex128)], axis=1)
    z_pad = np.concatenate([z, np.zeros((F, 1), np.complex128)], axis=1)

    gain = x_pad[:, out_p] - x_pad[:, out_n]

    g_idx, g_psd, g_names = _noise_generators(tensors, op)
    h = z_pad[:, g_idx[:, 0]] - z_pad[:, g_idx[:, 1]]  # (F, nSrc)
    contrib = (np.abs(h) ** 2) * g_psd[None, :]
    s_out = contrib.sum(axis=1) if g_psd.size else np.zeros(F)

    gain_sq = np.abs(gain) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        s_in = np.where(gain_sq > 0.0, s_out / gain_sq, np.inf)

    contributions: dict[str, np.ndarray] = {}
    for k, name in enumerate(g_names):
        if name in contributions:
            contributions[name] = contributions[name] + contrib[:, k]
        else:
            contributions[name] = contrib[:, k]

    total = float(np.sqrt(np.trapezoid(s_out, freqs))) if F > 1 else 0.0
    out_spec = format_out_spec(spec.out_pos, spec.out_neg)
    return NoiseResult(
        freqs=freqs, output_psd=s_out, input_psd=s_in, gain=gain,
        contributions=contributions, total_output_rms=total,
        out_spec=out_spec, src_name=spec.src)
