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

Noise generators:
  - resistor/switch thermal 4kT/R;
  - diode shot 2q*Id plus flicker KF*|Id|^AF / f;
  - BJT collector/base shot 2q*Ic / 2q*Ib plus base flicker
    KF*|Ib|^AF / f;
  - MOSFET channel thermal, region-dependent from the operating point:
    (8/3)kT*gm in saturation, 4kT*gds in triode, zero in cutoff
    (ngspice's region forms), plus flicker KF*|Id|^AF / f (simplified —
    no Cox*L^2 normalization, those are not level-1 model inputs here).
  kT uses the circuit's ``.temp`` (300 K default). KF/AF come from the
  .model cards (KF defaults to 0 = no flicker).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPS, K_BOLTZMANN, Q_ELECTRON, T_NOISE
from ..ir.circuit import (CircuitTensors, build_tensors,
                          bv_branch_rows, ext_arrays, lk_arrays, tl_arrays)
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
        np.ndarray, np.ndarray, np.ndarray, list[str]]:
    """Every noise current generator as (node-pair rows, white PSD A^2/Hz,
    flicker coefficient A^2, owning-device names); the full PSD at
    frequency f is ``white + flicker / f``. Node indices are tran/AC matrix
    indices with the ground dump at tensors.nvar."""
    from ..models.devices import bjt_ebers_moll, mos_level1

    # T_NOISE (=VT_300K*q/k ~ 299.98 K) keeps kT consistent with the
    # reference's rounded VT constant at the default temperature; .temp
    # scales it proportionally
    t_eff = T_NOISE * (tensors.temp_k / 300.0)
    four_kt = 4.0 * K_BOLTZMANN * t_eff
    x_pad = _op_voltage_pad(tensors, op)
    idx: list[np.ndarray] = []
    psd: list[np.ndarray] = []
    flick: list[np.ndarray] = []
    names: list[str] = []

    def gen(rows, white, flicker=None):
        idx.append(rows)
        white = np.asarray(white, np.float64)
        psd.append(white)
        flick.append(np.zeros_like(white) if flicker is None
                     else np.asarray(flicker, np.float64))

    if tensors.n_r:
        gen(tensors.r_idx, four_kt / tensors.r_vals)
        names.extend(tensors.r_names)
    if tensors.n_s:
        on = np.asarray([op.switch_states[n] for n in tensors.s_names])
        r_sw = np.maximum(np.abs(np.where(on, tensors.s_ron,
                                          tensors.s_roff)), EPS)
        gen(tensors.s_idx[:, :2], four_kt / r_sw)
        names.extend(tensors.s_names)
    if tensors.n_d:
        i_d = np.abs([op.element_currents[n] for n in tensors.d_names])
        gen(tensors.d_idx, 2.0 * Q_ELECTRON * i_d,
            tensors.d_kf * i_d ** tensors.d_af)
        names.extend(tensors.d_names)
    if tensors.n_m:
        mi = tensors.m_idx
        vgs = x_pad[mi[:, 1]] - x_pad[mi[:, 2]]
        vds = x_pad[mi[:, 0]] - x_pad[mi[:, 2]]
        gm, gds, _, i_ds = mos_level1(
            vgs, vds, tensors.m_beta, tensors.m_vto,
            tensors.m_lambda, tensors.m_polarity)
        # operating region at the DC point (reflected frame, symmetric in
        # vds like mos_level1): cutoff -> no channel noise; triode -> the
        # resistive-channel form 4kT*gds; saturation -> (8/3)kT*gm
        s = tensors.m_polarity
        vgs_r = s * np.asarray(vgs)
        vds_e = np.abs(np.asarray(vds))
        vov = np.where(s * np.asarray(vds) < 0,
                       vgs_r + vds_e, vgs_r) - s * tensors.m_vto
        cutoff = vov <= 0.0
        sat = vds_e >= vov
        white_m = np.where(
            cutoff, 0.0,
            np.where(sat,
                     (8.0 / 3.0) * K_BOLTZMANN * t_eff
                     * np.abs(np.asarray(gm)),
                     four_kt * np.abs(np.asarray(gds))))
        gen(mi[:, [0, 2]], white_m,  # drain-source channel
            tensors.m_kf * np.abs(np.asarray(i_ds)) ** tensors.m_af)
        names.extend(tensors.m_names)
    if tensors.n_q:
        qi = tensors.q_idx
        vbe = x_pad[qi[:, 1]] - x_pad[qi[:, 2]]
        vbc = x_pad[qi[:, 1]] - x_pad[qi[:, 0]]
        *_, i_c, i_b = bjt_ebers_moll(
            vbe, vbc, tensors.q_is, tensors.q_bf,
            tensors.q_br, tensors.q_polarity, vt=tensors.vt,
            vbe_lim=tensors.q_polarity * vbe,
            vbc_lim=tensors.q_polarity * vbc)
        gen(qi[:, [0, 2]], 2.0 * Q_ELECTRON * np.abs(np.asarray(i_c)))
        names.extend(tensors.q_names)  # collector shot, c-e
        gen(qi[:, [1, 2]], 2.0 * Q_ELECTRON * np.abs(np.asarray(i_b)),
            tensors.q_kf * np.abs(np.asarray(i_b)) ** tensors.q_af)
        names.extend(tensors.q_names)  # base shot + flicker, b-e

    if not idx:
        return (np.zeros((0, 2), np.int32), np.zeros((0,)),
                np.zeros((0,)), [])
    return (np.concatenate(idx, axis=0).astype(np.int32),
            np.concatenate(psd, axis=0).astype(np.float64),
            np.concatenate(flick, axis=0).astype(np.float64), names)


@partial(jax.jit, static_argnames=("nvar", "method"))
def _noise_core(freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
                v_idx, v_re, v_im, i_re, i_im, ext, e_out,
                nvar: int, method: str, minv=None, tl=None, plan=None):
    """Assemble + forward solve + adjoint solve + pack as ONE compiled
    program: eager vmap/fori_loop here would re-trace on every call
    (~0.9 s warm measured), turning the interactive .noise path into a
    tracer benchmark.

    ``plan`` routes both solves through the structured BBD tier
    (ops/schur.py): the transpose of a BBD matrix is BBD with the SAME
    partition (blocks transpose, borders swap roles), so the adjoint
    solve reuses the plan unchanged."""
    A_re, A_im, b_re, b_im = _assemble_grid(
        freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
        v_re, v_im, nvar, ext=ext, i_re=i_re, i_im=i_im, minv=minv, tl=tl)
    x_re, x_im, ok_f = solve_planes(A_re, A_im, b_re, b_im, method=method,
                                    plan=plan)
    e = jnp.broadcast_to(e_out, (freqs.shape[0], nvar))
    z_re, z_im, ok_a = solve_planes(
        jnp.swapaxes(A_re, -1, -2), jnp.swapaxes(A_im, -1, -2),
        e, jnp.zeros_like(e), method=method, plan=plan)
    return jnp.concatenate(
        [x_re, x_im, z_re, z_im,
         ok_f[:, None].astype(x_re.dtype), ok_a[:, None].astype(x_re.dtype)],
        axis=1)


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

    freqs = build_frequency_array(spec.mode, spec.N, spec.f1, spec.f2)
    F = freqs.shape[0]

    # host-side linearization pieces (op itself rides the interp tier when
    # eligible; ss rows and junction caps are plain numpy)
    if op is None:
        op = simulate_op(ckt, tensors=tensors, method=method)
    ss_idx, ss_g = small_signal_rows(tensors, op)
    if ckt.B:
        # behavioral sources are noiseless (ngspice semantics) but their
        # op-point gradients shape the transfer: I-kind add VCCS rows here;
        # V-kind branch rows are stamped as 0 V shorts below
        from .ac import _bsource_small_signal

        bs_idx, bs_g = _bsource_small_signal(ckt, tensors, op)
        ss_idx = np.concatenate([ss_idx, bs_idx], axis=0)
        ss_g = np.concatenate([ss_g, bs_g], axis=0)

    # unit excitation at the input source only (all other sources zeroed)
    v_unit = np.zeros(tensors.n_v)
    i_unit = np.zeros(tensors.n_i)
    if v_pos is not None:
        v_unit[v_pos] = 1.0
    else:
        i_unit[i_pos] = 1.0
    v_idx_ac = tensors.v_idx
    bv = bv_branch_rows(ckt, tensors.nvar)
    if bv.shape[0]:
        v_idx_ac = np.concatenate([tensors.v_idx, bv], axis=0)
        v_unit = np.concatenate([v_unit, np.zeros(bv.shape[0])])
    # diode junction capacitances at the op point shape the transfer
    # (the noise system is op-linearized by definition)
    from .ac import diode_smallsignal_caps

    c_idx_eff, c_vals_eff = tensors.c_idx, tensors.c_vals
    cj_idx, cj_vals = diode_smallsignal_caps(tensors, op)
    if cj_idx.shape[0]:
        c_idx_eff = np.concatenate([tensors.c_idx, cj_idx], axis=0)
        c_vals_eff = np.concatenate([tensors.c_vals, cj_vals])
    # adjoint excitation: unit current probe into the output port
    e_pad = np.zeros(nvar + 1)
    e_pad[out_p] += 1.0
    e_pad[out_n] -= 1.0

    from ..utils.placement import exec_device, is_tiny_work
    from .interp import interp_enabled, interp_noise

    _work = 16.0 * F * tensors.nvar ** 3
    if method == "gj" and is_tiny_work(_work) and interp_enabled():
        # tiny sweeps interpret: forward + adjoint host GE — jax-free
        # whenever the op point was (analysis/interp.interp_noise)
        x, z, _ok = interp_noise(
            tensors, freqs, v_idx_ac, v_unit, i_unit,
            extra_g=(ss_idx, ss_g), c_idx=c_idx_eff, c_vals=c_vals_eff,
            e_out=e_pad[:nvar])
        if not _ok:
            if tensors.n_k:
                from .interp import _mutual_inv_np

                if not _mutual_inv_np(tensors)[1]:
                    raise ValueError(
                        "Singular coupled-inductance matrix in .noise")
            raise ValueError("Singular matrix in .noise solve")
    else:
        # tiny-but-ineligible runs still avoid accelerator round trips on
        # the host CPU backend; the eager ext/minv array building below
        # must share the compiled solve's device
        with exec_device(_work):
            ext = ext_arrays(tensors)
            ext["g_idx"] = jnp.concatenate(
                [ext["g_idx"], jnp.asarray(ss_idx)], axis=0)
            ext["g_gm"] = jnp.concatenate(
                [ext["g_gm"], jnp.asarray(ss_g)], axis=0)
            lk = lk_arrays(tensors)
            if lk is not None:
                from .tran import _mutual_inv

                minv, minv_ok = _mutual_inv(jnp.asarray(tensors.l_vals), lk)
                if not bool(minv_ok):
                    raise ValueError(
                        "Singular coupled-inductance matrix in .noise")
            else:
                minv = None
            # structured BBD tier (AC space; ops/schur.py), dense retry
            # on block-pivot failure
            plan = None
            if method == "schur" or (method == "gj" and nvar > 128):
                from ..ops.schur import plan_partition

                _plan_obj = plan_partition(ckt, tensors)
                if _plan_obj is not None:
                    plan = _plan_obj.arrays()
                elif method == "schur":
                    raise ValueError(
                        "method='schur' requires block structure "
                        "(subcircuit instances) the circuit does not have")

            # ONE compiled program: assembly + forward solve (gain(f) =
            # v(out) per unit input) + adjoint solve (A^T z = e_out) + pack
            def _noise_run(plan_arrays):
                return np.asarray(_noise_core(
                    jnp.asarray(freqs),
                    jnp.asarray(tensors.r_idx), jnp.asarray(tensors.r_vals),
                    jnp.asarray(c_idx_eff), jnp.asarray(c_vals_eff),
                    jnp.asarray(tensors.l_idx), jnp.asarray(tensors.l_vals),
                    jnp.asarray(v_idx_ac),
                    jnp.asarray(v_unit), jnp.zeros(v_unit.shape[0]),
                    jnp.asarray(i_unit), jnp.zeros(tensors.n_i),
                    ext, jnp.asarray(e_pad[:nvar]),
                    nvar=nvar,
                    method="gj" if method == "schur" else method,
                    minv=minv, tl=tl_arrays(tensors),
                    plan=plan_arrays,
                ))

            packed = _noise_run(plan)
            if plan is not None and not bool(np.all(packed[:, -2:] > 0.5)):
                packed = _noise_run(None)
            if not bool(np.all(packed[:, -2:] > 0.5)):
                raise ValueError("Singular matrix in .noise solve")
        x = packed[:, :nvar] + 1j * packed[:, nvar:2 * nvar]
        z = packed[:, 2 * nvar:3 * nvar] + 1j * packed[:, 3 * nvar:4 * nvar]
    x_pad = np.concatenate([x, np.zeros((F, 1), np.complex128)], axis=1)
    z_pad = np.concatenate([z, np.zeros((F, 1), np.complex128)], axis=1)

    gain = x_pad[:, out_p] - x_pad[:, out_n]

    g_idx, g_psd, g_flick, g_names = _noise_generators(tensors, op)
    h = z_pad[:, g_idx[:, 0]] - z_pad[:, g_idx[:, 1]]  # (F, nSrc)
    s_gen = g_psd[None, :] + g_flick[None, :] / freqs[:, None]  # (F, nSrc)
    contrib = (np.abs(h) ** 2) * s_gen
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
