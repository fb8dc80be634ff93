"""Vectorized MNA stamp assembly.

The reference's six stamp functions (/root/reference/lib/stamping/*.ts) are
per-element scatter-adds with ground guards. Here each becomes ONE batched
``.at[...].add`` over all elements of a device type, operating on a padded
(nvar+1)-sized system whose last row/column is a dump slot for ground
(see ir/circuit.py). XLA lowers these to fused scatters; under ``vmap`` the
whole assembly batches over frequencies/variants for free.

Patterns:
  - admittance (4-point ±Y): stampAdmittance{Real,Complex}.ts:10-29
  - RHS current injection:   stampCurrent{Real,Complex}.ts:10-14
  - voltage-source rows (±1 couplings + RHS voltage):
                             stampVoltageSource{Real,Complex}.ts:11-34
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def stamp_admittance(A_pad: Array, idx: Array, y: Array) -> Array:
    """Scatter ±y for each 2-terminal element.

    idx: (nE,2); y: (..., nE) broadcasting over any leading batch dims of
    A_pad (..., n+1, n+1).
    """
    i1 = idx[:, 0]
    i2 = idx[:, 1]
    A_pad = A_pad.at[..., i1, i1].add(y)
    A_pad = A_pad.at[..., i2, i2].add(y)
    A_pad = A_pad.at[..., i1, i2].add(-y)
    A_pad = A_pad.at[..., i2, i1].add(-y)
    return A_pad


def stamp_current(b_pad: Array, idx: Array, current: Array) -> Array:
    """RHS injection: b[i1] -= I, b[i2] += I. Batch dims broadcast."""
    b_pad = b_pad.at[..., idx[:, 0]].add(-current)
    b_pad = b_pad.at[..., idx[:, 1]].add(current)
    return b_pad


def stamp_voltage_source(A_pad: Array, b_pad: Array, v_idx: Array,
                         volts: Array) -> tuple[Array, Array]:
    """±1 node/branch couplings and branch-row RHS voltage.

    v_idx: (nV,3) = [i1, i2, branch]; volts: (..., nV) real or complex.
    """
    i1 = v_idx[:, 0]
    i2 = v_idx[:, 1]
    j = v_idx[:, 2]
    A_pad = A_pad.at[..., i1, j].add(1.0)
    A_pad = A_pad.at[..., j, i1].add(1.0)
    A_pad = A_pad.at[..., i2, j].add(-1.0)
    A_pad = A_pad.at[..., j, i2].add(-1.0)
    b_pad = b_pad.at[..., j].add(volts)
    return A_pad, b_pad


def stamp_mutual(A_pad: Array, l_idx: Array, G: Array) -> Array:
    """Coupled-inductor companion matrix stamp (extended K lines).

    The current of inductor a is sum_b G[a,b] * (v[i1_b] - v[i2_b]), so
    every (a, b) pair contributes the 4-point pattern across a's KCL rows
    and b's voltage columns. G: (..., nL, nL); duplicate dump-slot indices
    accumulate (scatter-add semantics), matching the 2-terminal stamps.
    """
    i1 = l_idx[:, 0]
    i2 = l_idx[:, 1]
    A_pad = A_pad.at[..., i1[:, None], i1[None, :]].add(G)
    A_pad = A_pad.at[..., i1[:, None], i2[None, :]].add(-G)
    A_pad = A_pad.at[..., i2[:, None], i1[None, :]].add(-G)
    A_pad = A_pad.at[..., i2[:, None], i2[None, :]].add(G)
    return A_pad


def pad_solution(x: Array, nvar: int) -> Array:
    """Append the ground slot (0) so dump-mapped indices read 0 volts."""
    zero_shape = x.shape[:-1] + (1,)
    return jnp.concatenate([x, jnp.zeros(zero_shape, dtype=x.dtype)], axis=-1)


def stamp_vccs(A_pad: Array, idx: Array, gm: Array) -> Array:
    """Voltage-controlled current source (extended dialect, no reference
    analog — parseNetlist.ts:444-446 skips G lines).

    idx: (nG, 4) = [i1, i2, ic_pos, ic_neg]; gm: (..., nG). Injects
    gm*(v(ic+)-v(ic-)) out of i1's KCL row into i2's: the classic 4-point
    transconductance pattern across (current rows x control columns).
    """
    i1, i2, icp, icn = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
    A_pad = A_pad.at[..., i1, icp].add(gm)
    A_pad = A_pad.at[..., i1, icn].add(-gm)
    A_pad = A_pad.at[..., i2, icp].add(-gm)
    A_pad = A_pad.at[..., i2, icn].add(gm)
    return A_pad


def stamp_vcvs(A_pad: Array, idx: Array, gain: Array) -> Array:
    """Voltage-controlled voltage source (extended dialect).

    idx: (nE, 5) = [i1, i2, branch, ic_pos, ic_neg]; gain: (..., nE).
    Branch current enters the node KCL rows (±1 in the branch column) and
    the branch row enforces v(i1) - v(i2) - gain*(v(ic+) - v(ic-)) = 0.
    """
    i1, i2, j = idx[:, 0], idx[:, 1], idx[:, 2]
    icp, icn = idx[:, 3], idx[:, 4]
    A_pad = A_pad.at[..., i1, j].add(1.0)
    A_pad = A_pad.at[..., i2, j].add(-1.0)
    A_pad = A_pad.at[..., j, i1].add(1.0)
    A_pad = A_pad.at[..., j, i2].add(-1.0)
    A_pad = A_pad.at[..., j, icp].add(-gain)
    A_pad = A_pad.at[..., j, icn].add(gain)
    return A_pad


def stamp_cccs(A_pad: Array, idx: Array, gain: Array) -> Array:
    """Current-controlled current source (extended dialect).

    idx: (nF, 3) = [i1, i2, ctrl_branch]; gain: (..., nF). Couples the
    controlling V-source branch current into the node KCL rows:
    i(F) = gain * x[ctrl_branch], flowing i1 -> i2 through the source.
    """
    i1, i2, jv = idx[:, 0], idx[:, 1], idx[:, 2]
    A_pad = A_pad.at[..., i1, jv].add(gain)
    A_pad = A_pad.at[..., i2, jv].add(-gain)
    return A_pad


def stamp_ccvs(A_pad: Array, idx: Array, r: Array) -> Array:
    """Current-controlled voltage source (extended dialect).

    idx: (nH, 4) = [i1, i2, branch, ctrl_branch]; r: (..., nH).
    Branch row enforces v(i1) - v(i2) - r * x[ctrl_branch] = 0.
    """
    i1, i2, j, jv = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
    A_pad = A_pad.at[..., i1, j].add(1.0)
    A_pad = A_pad.at[..., i2, j].add(-1.0)
    A_pad = A_pad.at[..., j, i1].add(1.0)
    A_pad = A_pad.at[..., j, i2].add(-1.0)
    A_pad = A_pad.at[..., j, jv].add(-r)
    return A_pad


def stamp_tline_ports(A_pad: Array, t_idx: Array, z0: Array) -> Array:
    """Transmission-line near-end pattern (Branin model; extended T lines).

    t_idx: (nT, 6) = [i1, i2, i3, i4, br1, br2]; z0: (..., nT). Each port's
    branch row enforces v(+) - v(-) - Z0*i_port = E(t) (the delayed far-end
    Thevenin source lands in the RHS), and the port currents enter the node
    KCL rows. This is the WHOLE A-matrix contribution in the transient scan
    — the far-end coupling is history, not topology.
    """
    i1, i2, i3, i4 = t_idx[:, 0], t_idx[:, 1], t_idx[:, 2], t_idx[:, 3]
    b1, b2 = t_idx[:, 4], t_idx[:, 5]
    for (p, q, br) in ((i1, i2, b1), (i3, i4, b2)):
        A_pad = A_pad.at[..., p, br].add(1.0)
        A_pad = A_pad.at[..., q, br].add(-1.0)
        A_pad = A_pad.at[..., br, p].add(1.0)
        A_pad = A_pad.at[..., br, q].add(-1.0)
        A_pad = A_pad.at[..., br, br].add(-z0)
    return A_pad


def stamp_tline_coupling(A_pad: Array, t_idx: Array, z0: Array,
                         c: Array) -> Array:
    """Far-end coupling rows with coefficient ``c`` (..., nT) per plane.

    Branch row br1 gains ``c`` times (v(i3) - v(i4) + Z0*i2) and br2 the
    mirror; in AC ``c = -e^{-j w Td}`` split into per-plane real/imag calls
    (ops are real — TPUs have no complex dtypes), at DC ``c = -1`` (the
    theta -> 0 steady state: differential short, the classic SPICE
    T-element DC behavior).
    """
    i1, i2, i3, i4 = t_idx[:, 0], t_idx[:, 1], t_idx[:, 2], t_idx[:, 3]
    b1, b2 = t_idx[:, 4], t_idx[:, 5]
    for (br, p, q, obr) in ((b1, i3, i4, b2), (b2, i1, i2, b1)):
        A_pad = A_pad.at[..., br, p].add(c)
        A_pad = A_pad.at[..., br, q].add(-c)
        A_pad = A_pad.at[..., br, obr].add(c * z0)
    return A_pad


def stamp_extended(A_pad: Array, ext: dict) -> Array:
    """All linear extended-dialect controlled sources from an ext pytree
    (ir.circuit.ext_arrays): G/E/F/H. Independent I sources are RHS-only
    and handled by the callers."""
    A_pad = stamp_vccs(A_pad, ext["g_idx"], ext["g_gm"])
    A_pad = stamp_vcvs(A_pad, ext["e_idx"], ext["e_gain"])
    A_pad = stamp_cccs(A_pad, ext["f_idx"], ext["f_gain"])
    A_pad = stamp_ccvs(A_pad, ext["h_idx"], ext["h_r"])
    return A_pad
