"""Adaptive-timestep transient analysis with local-truncation-error control.

The reference is strictly fixed-step ("no adaptive timestep, no LTE
control" — SURVEY §2.10 / simulateTRAN.ts:14-19). This engine chooses its
own step sizes by step-doubling error estimation:

  - every iteration takes one backward-Euler step of size dt AND two of
    size dt/2 from the same state; their difference estimates the local
    truncation error;
  - the step is accepted when ``max |x_h - x_f| / (atol + rtol*|x_h|) <= 1``
    (or dt already at dt_min), advancing with the more accurate half-step
    state; otherwise it is rejected and retried smaller;
  - dt then scales by the standard order-1 controller
    ``clip(0.9/err, 0.2, 2.0)``, clamped to [dt_min, dt_max] and to the
    remaining horizon.

XLA cannot grow arrays, so the engine scans over a fixed ``max_steps``
attempt budget with per-iteration accept masks; accepted points are
filtered host-side. Sources evaluate ON DEVICE at the adaptive time points
(ir/sources.py) — precomputed grids cannot serve steps whose times the
compiled program itself chooses.

Newton always runs to convergence here (the reference's one-step-diode
quirk makes no sense under error control), reusing the same stamps,
companions, and switch hysteresis as the fixed-step engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (DIODE_VD_MAX, DIODE_VD_MIN, EPS, GMIN,
                         VT_300K)
from ..ir.circuit import (
    CircuitTensors,
    bsrc_static,
    build_tensors,
    dchg_arrays,
    ext_arrays,
    lk_arrays,
    nl_arrays,
    qchg_arrays,
    tl_arrays,
)
from ..ir.sources import build_source_program, eval_sources
from ..ops.linsolve import solve
from ..utils.fpaccuracy import accurate_exp
from ..ops.stamps import pad_solution
from ..parsing.netlist import ParsedCircuit
from .tran import (_bjt_junction_charge, _l_mv, _mutual_inv, _stamp_system,
                   _switch_update, _vdrop)


@dataclass
class AdaptiveTranResult:
    times: np.ndarray                      # (nAccepted+1,) incl. t=0 record
    node_voltages: dict[str, np.ndarray]
    n_accepted: int
    n_rejected: int
    n_attempts: int
    exhausted: bool                        # budget ran out before tstop


@partial(jax.jit, static_argnames=("nvar", "method", "max_steps", "max_nr",
                                   "nr_tol", "bsrc"))
def _adaptive_core(prog, tstop, dt0, dt_min, dt_max, rtol, atol,
                   r_idx, r_vals, c_idx, c_vals, l_idx, l_vals,
                   v_idx, s_idx, s_ron, s_roff, s_von, s_voff,
                   d_idx, d_is, d_n, ext, nl, lk=None, bsrc=(), tl=None,
                   dchg=None, qchg=None,
                   nvar: int = 0, method: str = "gj", max_steps: int = 4096,
                   max_nr: int = 50, nr_tol: float = 1e-9):
    dtype = jnp.float64
    if lk is not None:
        minv, _minv_ok = _mutual_inv(l_vals, lk)
    else:
        minv = None
    tensors_arrays = (r_idx, r_vals, c_idx, c_vals, l_idx, l_vals, v_idx,
                      s_idx, s_ron, s_roff, s_von, s_voff, d_idx, d_is, d_n,
                      ext, minv)
    n_c = c_idx.shape[0]
    n_l = l_idx.shape[0]
    n_s = s_idx.shape[0]
    n_d = d_idx.shape[0]
    n_m = nl["m_idx"].shape[0]
    n_q = nl["q_idx"].shape[0]

    # Transmission lines under a VARIABLE step grid: the fixed-step engine's
    # circular buffer indexes history by step count (tran.py tline_read),
    # which has no meaning here. Instead the accepted trajectory's port
    # Thevenin waves w = v + Z0*i are recorded TIME-STAMPED — (h_t, h_w,
    # h_cnt) append-only over the attempt budget — and each solve reads the
    # delayed far-end values by linear interpolation at t_eval - Td,
    # clamped to the newest accepted sample (the same causality clamp as
    # the fixed grid's td >= 1 step) and to w = 0 before t = 0 (rest).
    n_t = 0 if tl is None else tl["t_idx"].shape[0]
    H = max_steps + 2

    def tl_read(hist, t_eval):
        h_t, h_w, h_cnt = hist
        t_newest = jnp.take(h_t, jnp.maximum(h_cnt - 1, 0))
        tq = jnp.minimum(t_eval - tl["td"], t_newest)      # (nT,)
        # h_t is globally sorted: the written prefix [0, h_cnt) is the
        # strictly increasing accepted-time sequence, slot h_cnt may hold
        # a speculative time > prefix (see the step loop's ungated write),
        # and the tail is +inf — so the bracketing sample is one
        # O(nT log H) searchsorted, not an O(H x nT) masked reduction
        # (which dominated every Newton solve; round-3 review)
        k = jnp.searchsorted(h_t, tq, side="right") - 1    # (nT,)
        before = k < 0
        k_c = jnp.clip(k, 0, H - 1)
        k1 = jnp.minimum(k_c + 1, jnp.maximum(h_cnt - 1, 0))
        lines = jnp.arange(n_t)
        w_k = h_w[k_c, lines, :]
        w_k1 = h_w[k1, lines, :]
        t_k = jnp.take(h_t, k_c)
        t_k1 = jnp.take(h_t, k1)
        frac = ((tq - t_k)
                / jnp.maximum(t_k1 - t_k, EPS))[:, None]
        frac = jnp.clip(frac, 0.0, 1.0)
        w = jnp.where(before[:, None], 0.0,
                      w_k * (1.0 - frac) + w_k1 * frac)    # (nT, 2)
        # E1 mirrors the FAR end's w2; E2 the near end's w1
        return jnp.stack([w[:, 1], w[:, 0]], axis=-1)

    def tl_write(hist, t_new, x_pad, advance=None):
        """Write the port waves into slot h_cnt; advance the count by
        ``advance`` (bool; default always). Writing UNCONDITIONALLY and
        gating only the count keeps the buffer sorted (the speculative
        slot's time exceeds the prefix and reads never reach it, since
        queries clamp to h_t[h_cnt-1]) and avoids blending the whole
        H-sized buffer through a select every step."""
        h_t, h_w, h_cnt = hist
        t_idx = tl["t_idx"]
        w1 = (x_pad[..., t_idx[:, 0]] - x_pad[..., t_idx[:, 1]]
              + tl["z0"] * x_pad[..., t_idx[:, 4]])
        w2 = (x_pad[..., t_idx[:, 2]] - x_pad[..., t_idx[:, 3]]
              + tl["z0"] * x_pad[..., t_idx[:, 5]])
        inc = 1 if advance is None else advance.astype(jnp.int32)
        return (h_t.at[h_cnt].set(t_new),
                h_w.at[h_cnt].set(jnp.stack([w1, w2], axis=-1)),
                h_cnt + inc)

    def newton(state, dt_step, t_eval, is_first, hist=None):
        """One BE step of size dt_step evaluated at absolute time t_eval.
        Returns (x, new_state, ok)."""
        (v_prev_c, i_prev_l, vd_prev_d, vm_prev, vq_prev,
         q_prev_d, q_prev_q, sw_on) = state
        vs_t = eval_sources(prog, t_eval)
        e_t = tl_read(hist, t_eval) if n_t else None
        zc = jnp.zeros((n_c,), dtype)
        zl = jnp.zeros((n_l,), dtype)

        def cond(st):
            _x, _sw, it, done, _ok = st
            return jnp.logical_and(it < max_nr, ~done)

        def body(st):
            x, sw, it, done, ok = st
            A, b = _stamp_system(
                tensors_arrays, nvar, dt_step, vs_t, x, it,
                v_prev_c, zc, i_prev_l, zl, vd_prev_d, sw,
                integration="be", is_first=is_first,
                nl=nl, vm_prev=vm_prev, vq_prev=vq_prev,
                bsrc=bsrc, t=t_eval,
                tl=tl if n_t else None, e_t=e_t,
                dchg=dchg, q_prev_d=q_prev_d,
                qchg=qchg, q_prev_q=q_prev_q,
            )
            x_new, solve_ok = solve(A, b, method=method)
            x_pad = pad_solution(x_new, nvar)
            new_on = _switch_update(s_idx, s_von, s_voff, sw, x_pad)
            switched = jnp.any(new_on != sw)
            delta = jnp.max(jnp.abs(x_new - x)) if nvar else 0.0
            scale = 1.0 + (jnp.max(jnp.abs(x_new)) if nvar else 0.0)
            settled = jnp.logical_and(~switched, delta <= nr_tol * scale)
            ok = jnp.logical_and(ok, solve_ok)
            return x_new, new_on, it + 1, settled, ok

        x0 = jnp.zeros((nvar,), dtype)
        x, sw_new, _it, _done, ok = jax.lax.while_loop(
            cond, body,
            (x0, sw_on, jnp.asarray(0), jnp.asarray(False),
             jnp.asarray(True)),
        )
        x_pad = pad_solution(x, nvar)
        dt_c = jnp.maximum(dt_step, EPS)
        vd_new = _vdrop(x_pad, d_idx) if n_d else vd_prev_d
        if dchg is not None:
            # commit the diode junction charge at the accepted solution —
            # diffusion at the clamped voltage (companion consistency with
            # the stamping), depletion at the TRUE voltage (mirrors
            # tran.py's fixed-step commit)
            from ..models.devices import diode_charge_cap

            tsc = 1.0 if nl is None else nl["vt"] / VT_300K
            vd_c = jnp.clip(vd_new, DIODE_VD_MIN * tsc, DIODE_VD_MAX * tsc)
            v_th_d = d_n * VT_300K
            ev_c = accurate_exp(vd_c / v_th_d)
            q_d_new, _ = diode_charge_cap(
                vd_new, d_is * (ev_c - 1.0),
                jnp.maximum((d_is / v_th_d) * ev_c, GMIN),
                dchg["tt"], dchg["cjo"], dchg["vj"], dchg["m"], dchg["fc"])
        else:
            q_d_new = q_prev_d
        if qchg is not None:
            q_be_n, _, q_bc_n, _, _, _ = _bjt_junction_charge(
                x_pad, nl, qchg, nl["q_idx"])
            q_q_new = jnp.stack([q_be_n, q_bc_n], axis=-1)
        else:
            q_q_new = q_prev_q
        new_state = (
            _vdrop(x_pad, c_idx) if n_c else v_prev_c,
            (i_prev_l + _l_mv(dt_c, l_vals, minv, _vdrop(x_pad, l_idx)))
            if n_l else i_prev_l,
            vd_new,
            jnp.stack(
                [x_pad[..., nl["m_idx"][:, 1]] - x_pad[..., nl["m_idx"][:, 2]],
                 x_pad[..., nl["m_idx"][:, 0]] - x_pad[..., nl["m_idx"][:, 2]]],
                axis=-1) if n_m else vm_prev,
            jnp.stack(
                [x_pad[..., nl["q_idx"][:, 1]] - x_pad[..., nl["q_idx"][:, 2]],
                 x_pad[..., nl["q_idx"][:, 1]] - x_pad[..., nl["q_idx"][:, 0]]],
                axis=-1) if n_q else vq_prev,
            q_d_new,
            q_q_new,
            sw_new,
        )
        return x, new_state, ok

    def select(pred, a, b):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    # t = 0 record: the TRUE rest state — the dt->0 limit of the BE
    # bootstrap pins capacitors at their zero initial voltage (Gc -> inf)
    # and opens inductors (Gl -> 0, i = 0). The fixed-step engines instead
    # keep the reference's one-dt0-step-from-rest quirk; error-controlled
    # integration starts from the honest initial condition.
    state0 = (
        jnp.zeros((n_c,), dtype), jnp.zeros((n_l,), dtype),
        jnp.zeros((n_d,), dtype), jnp.zeros((n_m, 2), dtype),
        jnp.zeros((n_q, 2), dtype),
        jnp.zeros((n_d,), dtype),      # diode junction charge (rest: q=0)
        jnp.zeros((n_q, 2), dtype),    # BJT junction charges (b-e, b-c)
        jnp.zeros((n_s,), jnp.bool_),
    )
    hist0 = (jnp.full((H,), jnp.inf, dtype),
             jnp.zeros((H, n_t, 2), dtype),
             jnp.asarray(0, jnp.int32)) if n_t else None
    dt_ic = tstop * 1e-12
    x0, state, ok0 = newton(state0, dt_ic, jnp.asarray(0.0),
                            jnp.asarray(True), hist=hist0)
    if n_t:
        hist0 = tl_write(hist0, jnp.asarray(0.0, dtype),
                         pad_solution(x0, nvar))

    def step(carry, _):
        t, dt, st, hist, done, ok = carry
        dt_eff = jnp.clip(jnp.minimum(dt, tstop - t), dt_min, dt_max)
        t_new = t + dt_eff
        nf = jnp.asarray(False)
        x_f, st_f, ok_f = newton(st, dt_eff, t_new, nf, hist=hist)
        x_h1, st_h, ok_h1 = newton(st, dt_eff / 2, t + dt_eff / 2, nf,
                                   hist=hist)
        x_h, st_h2, ok_h2 = newton(st_h, dt_eff / 2, t_new, nf, hist=hist)
        err = jnp.max(jnp.abs(x_h - x_f) / (atol + rtol * jnp.abs(x_h))) \
            if nvar else jnp.asarray(0.0)
        # Richardson extrapolation: 2*half - full cancels BE's O(dt) term,
        # making the advanced trajectory (and the recorded point) globally
        # second-order while the error estimate still bounds the raw BE LTE
        x_rec = 2.0 * x_h - x_f
        # Richardson-extrapolate only the LINEAR companion states (capacitor
        # voltage, inductor current), where 2*half - full cancels BE's O(dt)
        # term. The nonlinear-device states — vd/vm/vq NR seeds and the
        # junction charges — must stay a CONSISTENT (v, q(v)) pair from the
        # half-step chain: extrapolating q and v separately injects a
        # spurious companion current (q(v) - q_prev)/dt that GROWS as dt
        # shrinks, which pins the LTE controller at dt_min (death spiral).
        (vc_h, il_h, vd_h, vm_h, vq_h, qd_h, qq_h, sw_h) = st_h2
        (vc_f, il_f) = st_f[0], st_f[1]
        st_adv = (2.0 * vc_h - vc_f, 2.0 * il_h - il_f,
                  vd_h, vm_h, vq_h, qd_h, qq_h, sw_h)
        at_floor = dt_eff <= dt_min * 1.0000001
        accept = jnp.logical_and(
            jnp.logical_or(err <= 1.0, at_floor), ~done)
        fac = jnp.clip(0.9 / jnp.maximum(err, 1e-12), 0.2, 2.0)
        dt_next = jnp.clip(dt_eff * fac, dt_min, dt_max)
        t_out = jnp.where(accept, t_new, t)
        st_out = select(accept, st_adv, st)
        if n_t:
            # record the Richardson-extrapolated port waves; the slot
            # write is unconditional, only the count is accept-gated
            # (a rejected write is overwritten by the next accept)
            hist = tl_write(hist, t_new, pad_solution(x_rec, nvar),
                            advance=accept)
        step_ok = jnp.logical_and(ok_h1, ok_h2)
        ok = jnp.logical_and(ok, jnp.logical_or(~accept, step_ok))
        finished = t_out >= tstop * (1.0 - 1e-12)
        done_out = jnp.logical_or(done, finished)
        rejected = jnp.logical_and(~accept, ~done)
        return ((t_out, dt_next, st_out, hist, done_out, ok),
                (t_out, x_rec, accept, rejected))

    init = (jnp.asarray(0.0), jnp.asarray(dt0, dtype), state, hist0,
            jnp.asarray(False), ok0)
    carry, (ts, xs, acc, rej) = jax.lax.scan(step, init, None,
                                             length=max_steps)
    t_end, _dt, _st, _hist, done, ok = carry
    return x0, ts, xs, acc, rej, done, ok


def simulate_tran_adaptive(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    rtol: float = 1e-4,
    atol: float = 1e-9,
    dt_min: float | None = None,
    dt_max: float | None = None,
    max_steps: int = 4096,
    method: str = "gj",
    max_nr: int = 50,
    nr_tol: float = 1e-9,
) -> AdaptiveTranResult | None:
    """LTE-controlled transient: the .tran spec supplies the initial step
    (``dt``) and the horizon (``tstop``); the engine then picks its own
    steps. Raises if the attempt budget is exhausted before tstop."""
    if ckt.tran is None:
        return None
    from ..utils.fpaccuracy import newton_tol_floor

    # inner-Newton tolerance floored at the backend's measured exp()
    # accuracy (TPU emulated-f64 exp ~2e-8 relative): below it the
    # junction Newton limit-cycles and burns max_nr every attempt
    nr_tol = newton_tol_floor(nr_tol)
    if tensors is None:
        tensors = build_tensors(ckt)
    tstop = ckt.tran.tstop
    dt0 = ckt.tran.dt if ckt.tran.dt > EPS else tstop / 1000.0
    if dt_min is None:
        dt_min = tstop * 1e-9
    if dt_max is None:
        dt_max = tstop / 10.0
    prog = {k: jnp.asarray(v) for k, v in build_source_program(ckt).items()}

    x0, ts, xs, acc, rej, done, ok = _adaptive_core(
        prog, jnp.asarray(tstop), jnp.asarray(dt0), jnp.asarray(dt_min),
        jnp.asarray(dt_max), jnp.asarray(rtol), jnp.asarray(atol),
        jnp.asarray(tensors.r_idx), jnp.asarray(tensors.r_vals),
        jnp.asarray(tensors.c_idx), jnp.asarray(tensors.c_vals),
        jnp.asarray(tensors.l_idx), jnp.asarray(tensors.l_vals),
        jnp.asarray(tensors.v_idx),
        jnp.asarray(tensors.s_idx),
        jnp.asarray(tensors.s_ron), jnp.asarray(tensors.s_roff),
        jnp.asarray(tensors.s_von), jnp.asarray(tensors.s_voff),
        jnp.asarray(tensors.d_idx),
        jnp.asarray(tensors.d_is), jnp.asarray(tensors.d_n),
        ext_arrays(tensors), nl_arrays(tensors),
        lk=lk_arrays(tensors), bsrc=bsrc_static(ckt, tensors.nvar),
        tl=tl_arrays(tensors),
        dchg=dchg_arrays(tensors), qchg=qchg_arrays(tensors),
        nvar=tensors.nvar, method=method, max_steps=max_steps,
        max_nr=max_nr, nr_tol=nr_tol,
    )
    packed = np.asarray(jnp.concatenate(
        [ts[:, None], xs, acc[:, None].astype(xs.dtype),
         rej[:, None].astype(xs.dtype)], axis=1))
    x0 = np.asarray(jnp.concatenate([jnp.asarray([0.0]), x0,
                                     jnp.asarray([1.0, 0.0])]))
    done_ok = np.asarray(jnp.stack([done, ok]))
    if not bool(done_ok[1] > 0.5):
        raise ValueError("Singular matrix in adaptive TRAN solve")
    nvar = tensors.nvar
    mask = packed[:, nvar + 1] > 0.5
    times = np.concatenate([[0.0], packed[mask, 0]])
    sols = np.concatenate([x0[None, 1:nvar + 1], packed[mask, 1:nvar + 1]])
    node_voltages = {
        name: sols[:, i] for i, name in enumerate(tensors.node_names)
    }
    if ckt.tran_probes:
        upper = {p.upper() for p in ckt.tran_probes}
        node_voltages = {
            name: series for name, series in node_voltages.items()
            if name.upper() in upper
        }
    return AdaptiveTranResult(
        times=times,
        node_voltages=node_voltages,
        n_accepted=int(mask.sum()),
        n_rejected=int((packed[:, nvar + 2] > 0.5).sum()),
        n_attempts=int(len(mask)),
        exhausted=not bool(done_ok[0] > 0.5),
    )
