"""Batched Monte-Carlo / corner-sweep analysis.

The reference simulates ONE netlist per call (simulate.ts:5-10); parameter
sweeps require re-parsing and re-running serially. This module is the TPU
lever the reference leaves on the table (SURVEY.md §2 parallelism table):
thousands of parameter variants of one topology solve in a single compiled
call — a leading ``variants`` axis on the element value arrays, ``vmap``ped
over the same assemble+solve cores used by the single-circuit engines, and
optionally sharded over a device mesh (spicey_tpu.parallel).

API:
  overrides = {"r1": values_B, "c1": values_B, "v1": dc_values_B, ...}
  simulate_ac_batch(netlist_or_ckt, overrides)   -> BatchACResult
  simulate_tran_batch(netlist_or_ckt, overrides) -> BatchTranResult

Element names are matched case-insensitively against parsed element names.
Voltage-source overrides set the DC value (and the whole time grid for
sources without waveforms); waveform-driven sources keep their waveform.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.circuit import (
    CircuitTensors,
    bsrc_static,
    bv_branch_rows,
    build_tensors,
    effective_time_step,
    dchg_arrays,
    qchg_arrays,
    ext_arrays,
    lk_arrays,
    nl_arrays,
    sample_source_values,
    tl_arrays,
)
from ..parsing.netlist import ParsedCircuit, parse_netlist
from .ac import _assemble_grid, build_frequency_array
from .tran import _mutual_inv, _tline_hist_len, _tran_core


@dataclass
class BatchACResult:
    freqs: np.ndarray          # (F,)
    node_names: tuple[str, ...]
    x: np.ndarray              # (B, F, nvar) complex128 solution
    valid: np.ndarray          # (B, F) bool

    def node_voltage(self, name: str) -> np.ndarray:
        i = [n.upper() for n in self.node_names].index(name.upper())
        return self.x[..., i]


@dataclass
class BatchTranResult:
    times: np.ndarray          # (S+1,)
    node_names: tuple[str, ...]
    xs: np.ndarray             # (B, S+1, nvar)
    sw_states: np.ndarray      # (B, S+1, nS)
    valid: np.ndarray          # (B,)

    def node_voltage(self, name: str) -> np.ndarray:
        i = [n.upper() for n in self.node_names].index(name.upper())
        return self.xs[..., i]


def _resolve(ckt: ParsedCircuit | str,
             dialect: str = "spicey") -> ParsedCircuit:
    return parse_netlist(ckt, dialect=dialect) if isinstance(ckt, str) else ckt


@partial(jax.jit, static_argnames=("nvar", "method", "interpret"))
def _batch_ac_core(freqs, r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
                   v_idx, v_re, v_im, i_re, i_im, ext,
                   nvar: int, method: str, interpret: bool = False,
                   lk=None, tl=None):
    """Assemble over (B, F), then ONE lane-dense solve over the flat batch.

    Only the assembly is vmapped; the solve sees the whole (B*F, N, N)
    grid in one call, which is what the batch-major Pallas kernel tiles
    (a vmapped per-variant solve would hand it B mostly-padding calls).
    ``ext`` value arrays arrive batched (B, nX); index arrays replicated.
    """
    from ..ops.linsolve import solve_planes

    ext_axes = {k: (None if k.endswith("idx") else 0) for k in ext}
    # lk["k_vals"] arrives batched (B, nK); k_pairs closes over (replicated)
    kv_in = lk["k_vals"] if lk is not None else None
    kv_axis = 0 if lk is not None else None
    # tl z0/td arrive batched (B, nT) when present (Z0/Td are sweepable —
    # _batched_tl); t_idx replicates
    tl_axes = ({"t_idx": None, "z0": 0, "td": 0}
               if tl is not None else None)

    def one(rv, cv, lv, vre, vim, ext_b, kv, tl_b):
        if kv is not None:
            minv, mok = _mutual_inv(
                lv, {"k_pairs": lk["k_pairs"], "k_vals": kv})
        else:
            minv, mok = None, jnp.asarray(True)
        planes = _assemble_grid(freqs, r_idx, rv, c_idx, cv, l_idx, lv,
                                v_idx, vre, vim, nvar,
                                ext=ext_b, i_re=i_re, i_im=i_im, minv=minv,
                                tl=tl_b)
        return planes + (mok,)

    A_re, A_im, b_re, b_im, mok = jax.vmap(
        one, in_axes=(0, 0, 0, 0, 0, ext_axes, kv_axis, tl_axes)
    )(r_vals, c_vals, l_vals, v_re, v_im, ext, kv_in, tl)
    x_re, x_im, valid = solve_planes(A_re, A_im, b_re, b_im, method=method,
                                     interpret=interpret)
    if lk is not None:
        valid = jnp.logical_and(valid, mok[:, None])
    return x_re, x_im, valid


def _batch_values(base: np.ndarray, names: tuple[str, ...],
                  overrides: dict[str, np.ndarray], B: int) -> np.ndarray:
    """Tile (nE,) base values to (B, nE), applying per-element overrides."""
    out = np.broadcast_to(base, (B,) + base.shape).copy()
    lower = {n.lower(): i for i, n in enumerate(names)}
    for key, vals in overrides.items():
        idx = lower.get(key.lower())
        if idx is None:
            continue
        vals = np.asarray(vals, dtype=np.float64)
        if vals.shape != (B,):
            raise ValueError(
                f"override for {key!r} must have shape ({B},), got {vals.shape}"
            )
        out[:, idx] = vals
    return out


def _batched_ext(tensors: CircuitTensors, overrides, B: int) -> dict:
    """ext pytree with value arrays tiled to (B, nX) + overrides applied.

    Built from the host NumPy tensors directly — converting freshly created
    device arrays back with np.asarray costs a full device round-trip per
    array on remote-tunnel TPU setups (~30 ms each)."""
    ext = ext_arrays(tensors)
    for key, base, names in (("g_gm", tensors.g_gm, tensors.g_names),
                             ("e_gain", tensors.e_gain, tensors.e_names),
                             ("f_gain", tensors.f_gain, tensors.f_names),
                             ("h_r", tensors.h_r, tensors.h_names)):
        ext[key] = jnp.asarray(_batch_values(base, names, overrides, B))
    return ext


def _batched_nl(tensors: CircuitTensors, overrides, B: int) -> dict:
    """nl pytree with per-device betas/Is tiled to (B, nX); overriding an
    M element name sweeps its beta, a J name its model Beta (the stored
    channel value is 2x the model's — m_beta_scale undoes the lowering so
    user values stay in model units), a Q element name its Is."""
    nl = nl_arrays(tensors)
    scale = tensors.m_beta_scale
    nl["m_beta"] = jnp.asarray(
        _batch_values(tensors.m_beta / scale, tensors.m_names, overrides, B)
        * scale)
    nl["q_is"] = jnp.asarray(
        _batch_values(tensors.q_is, tensors.q_names, overrides, B))
    return nl


def _batched_lk(tensors: CircuitTensors, overrides, B: int):
    """lk pytree with coupling coefficients tiled to (B, nK) + overrides
    applied (overriding a K element name sweeps its coefficient), or None
    when the circuit has no couplings. _mutual_inv broadcasts the (B, nK)
    k_vals against (B, nL) l_vals, so the batched transient core consumes
    this directly; the AC cores vmap over the k_vals axis."""
    if tensors.n_k == 0:
        return None
    return {
        "k_pairs": jnp.asarray(tensors.k_pairs),
        "k_vals": jnp.asarray(
            _batch_values(tensors.k_vals, tensors.k_names, overrides, B)),
    }


def _batched_tl(tensors: CircuitTensors, overrides, B: int, dtype=None):
    """tl pytree with Z0/Td tiled to (B, nT) + overrides applied, or None
    when the circuit has no T lines.

    Transmission-line elements carry TWO sweepable parameters, so override
    keys are suffixed: ``"t1.z0"`` sweeps the characteristic impedance,
    ``"t1.td"`` the delay. The batched stamps/history machinery broadcasts
    (B, nT) parameter planes (tran._hist_gather aligns the index batch
    dims), so sweeping either is just another value axis."""
    if tensors.n_t == 0:
        return None
    z0 = _batch_values(
        tensors.t_z0, tuple(f"{n}.z0" for n in tensors.t_names),
        overrides, B)
    td = _batch_values(
        tensors.t_td, tuple(f"{n}.td" for n in tensors.t_names),
        overrides, B)
    return {
        "t_idx": jnp.asarray(tensors.t_idx),
        "z0": jnp.asarray(z0, dtype),
        "td": jnp.asarray(td, dtype),
    }


def _tl_hist_len_batched(tl, dt: float) -> int:
    """Fixed-grid history length covering the LONGEST swept delay."""
    if tl is None:
        return 0
    td_max = float(np.max(np.asarray(tl["td"])))
    from ..constants import EPS as _EPS
    return int(np.ceil(max(td_max / max(dt, _EPS), 1.0))) + 2


def _tl_names(tensors: CircuitTensors) -> tuple[str, ...]:
    """Override-addressable T-line parameter names (suffixed)."""
    return tuple(f"{n}.{p}" for n in tensors.t_names for p in ("z0", "td"))


def _batch_size(overrides: dict[str, np.ndarray]) -> int:
    sizes = {np.asarray(v).shape[0] for v in overrides.values()}
    if len(sizes) != 1:
        raise ValueError(f"inconsistent override batch sizes: {sizes}")
    return sizes.pop()


def _consumed(names_groups, overrides) -> set[str]:
    known = set()
    for names in names_groups:
        known.update(n.lower() for n in names)
    unknown = {k for k in overrides if k.lower() not in known}
    if unknown:
        raise ValueError(f"overrides reference unknown elements: {sorted(unknown)}")
    return known


def simulate_ac_batch(
    circuit: ParsedCircuit | str,
    overrides: dict[str, np.ndarray],
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    device_put=None,
    interpret: bool = False,
    dialect: str = "spicey",
) -> BatchACResult:
    """One compiled batched AC sweep over all parameter variants.

    ``device_put``: optional callable mapping (array, axes) -> placed array,
    used by spicey_tpu.parallel to shard the batch/freq axes over a mesh.
    """
    ckt = _resolve(circuit, dialect=dialect)
    if ckt.ac is None:
        raise ValueError("netlist has no .ac analysis")
    if tensors is None:
        tensors = build_tensors(ckt)
    B = _batch_size(overrides)
    _consumed([tensors.r_names, tensors.c_names, tensors.l_names,
               tensors.k_names, _tl_names(tensors),
               tensors.v_names, tensors.i_names, tensors.g_names,
               tensors.e_names, tensors.f_names, tensors.h_names], overrides)

    r_vals = _batch_values(tensors.r_vals, tensors.r_names, overrides, B)
    c_vals = _batch_values(tensors.c_vals, tensors.c_names, overrides, B)
    l_vals = _batch_values(tensors.l_vals, tensors.l_names, overrides, B)
    ext = _batched_ext(tensors, overrides, B)
    if np.any(r_vals <= 0):
        bad = tensors.r_names[int(np.argwhere(r_vals <= 0)[0][1])]
        raise ValueError(f"R {bad} must be > 0")

    freqs = build_frequency_array(ckt.ac.mode, ckt.ac.N, ckt.ac.f1, ckt.ac.f2)
    ph = tensors.v_ac_phase_deg * math.pi / 180.0
    v_re = np.broadcast_to(tensors.v_ac_mag * np.cos(ph), (B, tensors.n_v))
    v_im = np.broadcast_to(tensors.v_ac_mag * np.sin(ph), (B, tensors.n_v))
    # V-kind behavioral branches stamp as 0 V small-signal shorts (the
    # same policy simulate_ac applies); I-kind are open in AC
    v_idx_ac = tensors.v_idx
    bv = bv_branch_rows(ckt, tensors.nvar)
    if bv.shape[0]:
        v_idx_ac = np.concatenate([tensors.v_idx, bv], axis=0)
        z = np.zeros((B, bv.shape[0]))
        v_re = np.concatenate([v_re, z], axis=1)
        v_im = np.concatenate([v_im, z], axis=1)

    arrays = dict(
        freqs=jnp.asarray(freqs),
        r_vals=jnp.asarray(r_vals), c_vals=jnp.asarray(c_vals),
        l_vals=jnp.asarray(l_vals),
        v_re=jnp.asarray(v_re), v_im=jnp.asarray(v_im),
    )
    if device_put is not None:
        arrays["freqs"] = device_put(arrays["freqs"], ("freq",))
        for key in ("r_vals", "c_vals", "l_vals", "v_re", "v_im"):
            arrays[key] = device_put(arrays[key], ("batch", None))

    iph = tensors.i_ac_phase_deg * math.pi / 180.0
    i_re = jnp.asarray(tensors.i_ac_mag * np.cos(iph))
    i_im = jnp.asarray(tensors.i_ac_mag * np.sin(iph))
    x_re, x_im, valid = _batch_ac_core(
        arrays["freqs"],
        jnp.asarray(tensors.r_idx), arrays["r_vals"],
        jnp.asarray(tensors.c_idx), arrays["c_vals"],
        jnp.asarray(tensors.l_idx), arrays["l_vals"],
        jnp.asarray(v_idx_ac), arrays["v_re"], arrays["v_im"],
        i_re, i_im, ext,
        nvar=tensors.nvar, method=method, interpret=interpret,
        lk=_batched_lk(tensors, overrides, B),
        tl=_batched_tl(tensors, overrides, B),
    )
    x = np.asarray(x_re) + 1j * np.asarray(x_im)
    return BatchACResult(
        freqs=freqs, node_names=tensors.node_names, x=x,
        valid=np.asarray(valid),
    )


def simulate_tran_batch(
    circuit: ParsedCircuit | str,
    overrides: dict[str, np.ndarray],
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    device_put=None,
    interpret: bool = False,
    dialect: str = "spicey",
    time_parallel: str = "auto",
) -> BatchTranResult:
    """One compiled batched transient run over all parameter variants.

    ``time_parallel``: "auto" (default) evaluates LINEAR circuits in the
    long-horizon/modest-batch regime with the parallel-in-time affine-map
    core (analysis/timeparallel.py) — full trajectories, O(log S) depth;
    "never" forces the sequential scan."""
    ckt = _resolve(circuit, dialect=dialect)
    if ckt.tran is None:
        raise ValueError("netlist has no .tran analysis")
    if tensors is None:
        tensors = build_tensors(ckt)
    B = _batch_size(overrides)
    _consumed([tensors.r_names, tensors.c_names, tensors.l_names,
               tensors.k_names, _tl_names(tensors),
               tensors.v_names, tensors.i_names, tensors.g_names,
               tensors.e_names, tensors.f_names, tensors.h_names,
               tensors.m_names, tensors.q_names], overrides)

    r_vals = _batch_values(tensors.r_vals, tensors.r_names, overrides, B)
    c_vals = _batch_values(tensors.c_vals, tensors.c_names, overrides, B)
    l_vals = _batch_values(tensors.l_vals, tensors.l_names, overrides, B)
    ext = _batched_ext(tensors, overrides, B)
    nl = _batched_nl(tensors, overrides, B)
    tl_batched = _batched_tl(tensors, overrides, B)
    # MOSFET/BJT/behavioral Newton needs convergence iterations
    # (see tran.simulate_tran)
    nr = ("converged" if (tensors.n_m or tensors.n_q or ckt.B)
          else "spicey")

    dt, steps = effective_time_step(ckt.tran.dt, ckt.tran.tstop)
    times = np.arange(steps + 1, dtype=np.float64) * dt
    vs_grid = sample_source_values(ckt, times)  # (S+1, nV)

    # DC overrides on waveform-less sources batch the source grid
    # (V columns first, then extended-dialect I columns; ir/circuit.py)
    src_lower = {n.lower(): i for i, n in enumerate(tensors.v_names)}
    src_lower.update({
        n.lower(): tensors.n_v + i for i, n in enumerate(tensors.i_names)
    })
    has_wave = np.concatenate([tensors.v_has_waveform,
                               tensors.i_has_waveform])
    v_over = {k: v for k, v in overrides.items() if k.lower() in src_lower}
    vs_batched = None
    if v_over:
        vs_batched = np.broadcast_to(
            vs_grid, (B,) + vs_grid.shape
        ).copy()  # (B, S+1, nV+nI)
        for key, vals in v_over.items():
            i = src_lower[key.lower()]
            if has_wave[i]:
                raise ValueError(
                    f"cannot override waveform-driven source {key!r}"
                )
            vs_batched[:, :, i] = np.asarray(vals, dtype=np.float64)[:, None]

    # batch-native core: the scan carries a (B, ...) lane axis so each
    # per-step solve is one (B, N, N) batched call — the layout the
    # batch-major Pallas kernel tiles across VPU lanes (vmap over the scan
    # could not hand the kernel the whole variant batch at once). Sources
    # are scanned over axis 0, so the batched grid is laid out (S+1, B, nSrc).
    if vs_batched is not None:
        vs_in = jnp.asarray(np.moveaxis(vs_batched, 0, 1))
    else:
        vs_in = jnp.asarray(vs_grid)
    arrays = dict(
        r_vals=jnp.asarray(r_vals), c_vals=jnp.asarray(c_vals),
        l_vals=jnp.asarray(l_vals), vs=vs_in,
    )
    if device_put is not None:
        for key in ("r_vals", "c_vals", "l_vals"):
            arrays[key] = device_put(arrays[key], ("batch", None))
        if vs_batched is not None:
            arrays["vs"] = device_put(arrays["vs"], (None, "batch", None))

    from .timeparallel import eligible as _tp_eligible
    from .timeparallel import worthwhile as _tp_worthwhile
    if time_parallel not in ("auto", "never"):
        raise ValueError("time_parallel must be 'auto' or 'never'")
    if (time_parallel == "auto" and _tp_eligible(tensors, ckt, nr, "be")
            and _tp_worthwhile(tensors, steps, B, 8)):
        # linear circuit in the parallel-in-time regime: full trajectories
        # from the affine-map associative scan (mc._tp_solutions), SPMD
        # over the variants axis when sharded
        from .mc import _tran_tp_full_core

        xs_tp, valid = _tran_tp_full_core(
            arrays["vs"], jnp.asarray(dt, jnp.float64),
            jnp.asarray(tensors.r_idx), arrays["r_vals"],
            jnp.asarray(tensors.c_idx), arrays["c_vals"],
            jnp.asarray(tensors.l_idx), arrays["l_vals"],
            jnp.asarray(tensors.v_idx),
            {k: (v if k.endswith("idx") else jnp.asarray(v))
             for k, v in ext.items()},
            nvar=tensors.nvar, method=method, interpret=interpret,
            lk=_batched_lk(tensors, overrides, B),
        )
        xs = np.moveaxis(np.asarray(xs_tp), 0, 1)     # (B, S+1, N)
        sw_states = np.zeros((B, steps + 1, 0), bool)
        tstart = getattr(ckt.tran, "tstart", 0.0)
        if tstart > 0.0:
            keep = times >= tstart - 1e-15
            times, xs = times[keep], xs[:, keep]
            sw_states = sw_states[:, keep]
        return BatchTranResult(
            times=times, node_names=tensors.node_names,
            xs=xs, sw_states=sw_states, valid=np.asarray(valid),
        )

    xs, sw_states, valid, _state = _tran_core(
        arrays["vs"], jnp.asarray(dt, jnp.float64),
        jnp.asarray(tensors.r_idx), arrays["r_vals"],
        jnp.asarray(tensors.c_idx), arrays["c_vals"],
        jnp.asarray(tensors.l_idx), arrays["l_vals"],
        jnp.asarray(tensors.v_idx),
        jnp.asarray(tensors.s_idx),
        jnp.asarray(tensors.s_ron), jnp.asarray(tensors.s_roff),
        jnp.asarray(tensors.s_von), jnp.asarray(tensors.s_voff),
        jnp.asarray(tensors.d_idx),
        jnp.asarray(tensors.d_is), jnp.asarray(tensors.d_n),
        nvar=tensors.nvar, method=method, nr=nr,
        ext=ext, nl=nl, lk=_batched_lk(tensors, overrides, B), batch=B,
        bsrc=bsrc_static(ckt, tensors.nvar),
        interpret=interpret,
        # transmission lines: Z0/Td sweep as "t<name>.z0"/".td" override
        # keys; (B, nT) planes broadcast through the stamps and the
        # batch-aligned history gather (tran._hist_gather)
        tl=tl_batched,
        hist_len=_tl_hist_len_batched(tl_batched, dt),
        dchg=dchg_arrays(tensors),
        qchg=qchg_arrays(tensors),
    )
    xs = np.moveaxis(np.asarray(xs), 0, 1)
    sw_states = np.moveaxis(np.asarray(sw_states), 0, 1)
    tstart = getattr(ckt.tran, "tstart", 0.0)
    if tstart > 0.0:  # extended record window (see tran.simulate_tran)
        keep = times >= tstart - 1e-15
        times, xs, sw_states = times[keep], xs[:, keep], sw_states[:, keep]
    return BatchTranResult(
        times=times, node_names=tensors.node_names,
        xs=xs,
        sw_states=sw_states,
        valid=np.asarray(valid),
    )
