"""Parallel-in-time linear transient: the whole time axis in O(log S) depth.

For a LINEAR circuit under backward Euler the engine's per-step recurrence
(tran.py's factor-once path, itself a reuse the reference never does —
simulateTRAN.ts re-eliminates every step) is an affine map on the companion
state s = [v_prev_C | i_prev_L]:

    x_t     = X s_t + Y u_t          (solution at step t)
    s_{t+1} = T s_t + R u_t          (companion-state commit)

with T, R, X, Y assembled ONCE per variant from A^{-1} and the stamp
selection matrices. A sequential `lax.scan` walks this chain in S dependent
steps; but affine maps compose associatively, so `lax.associative_scan`
evaluates every prefix in O(log S) DEPTH — the time axis itself becomes a
parallel dimension, which is exactly the shape of work a TPU wants and a
thing no classical SPICE formulation has (their per-step Newton rebuilds
preclude it; reference: simulateTRAN.ts:147 sequential loop).

The state dimension k = nC + nL is tiny (1-10s), so the composed
(B, k, k) matmuls are cheap. Measured regime (v5e): ~2.2x at S = 100k
steps / B = 16 variants and ~1.6x at S = 10k (the sequential scan
under-utilizes the chip there); at short-S / huge-B (S = 201, B = 10k)
the sequential scan is already throughput-saturated and the affine
compositions' extra flops make tp a wash (f32) or worse (f64) — callers
gate "auto" on (S+1)*32 > B accordingly. Exactness: the algebra is the SAME backward-Euler recurrence —
differences from the sequential path are float reassociation only
(~sqrt(S)*eps growth; guarded in tests against the sequential engine).

Eligibility (callers fall back to the sequential core otherwise): linear
elements only (no switches/diodes/MOS/BJT/behavioral), no transmission
lines, no K coupling (the matrix companion is linear too — future work),
backward Euler, reference inner-loop semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def linear_tran_maps(Ainv: Array, c_idx, c_vals, l_idx, l_vals,
                     v_idx, i_idx, dt, nvar: int):
    """Build (T, R, X, Y) for the BE affine recurrence.

    Ainv: (..., N, N) inverse of the BE system matrix (R + C/dt + dt/L
    conductances + V-source rows). c_vals/l_vals: (..., nC)/(..., nL)
    (leading batch dims allowed). u = [V-source volts | I-source amps]
    ordered as the engine's source grid. Returns
    T: (..., k, k), R: (..., k, m), X: (..., N, k), Y: (..., N, m)
    with k = nC + nL, m = nV + nI.
    """
    dtype = Ainv.dtype
    lead = Ainv.shape[:-2]
    n_c = c_idx.shape[0]
    n_l = l_idx.shape[0]
    n_v = v_idx.shape[0]
    n_i = i_idx.shape[0]
    k = n_c + n_l
    m = n_v + n_i

    def sel(rows_idx, n_items):
        """(N, n_items) selection: column j = e_{i1(j)} - e_{i2(j)} with
        the ground dump slot dropped."""
        S = jnp.zeros((nvar + 1, n_items), dtype)
        cols = jnp.arange(n_items)
        S = S.at[rows_idx[:, 0], cols].add(1.0)
        S = S.at[rows_idx[:, 1], cols].add(-1.0)
        return S[:nvar]

    # b(s, u) = Bs @ s + Bu @ u  (RHS injections; tran._stamp_system BE):
    #   C: Ieq = -(C/dt) v_prev  via stamp_current -> b += (C/dt) v_prev
    #      on the (i1, i2) pattern;
    #   L: Isrc = +i_prev        -> b -= i_prev on the pattern;
    #   V: b[branch] += u;  I: b += u on the pattern (stamp_current(-u)).
    g_c = c_vals / dt                                     # (..., nC)
    Bs_c = sel(c_idx, n_c) * g_c[..., None, :]            # (..., N, nC)
    Bs_l = -sel(l_idx, n_l)                               # (N, nL)
    Bs = jnp.concatenate(
        [jnp.broadcast_to(Bs_c, lead + (nvar, n_c)),
         jnp.broadcast_to(Bs_l, lead + (nvar, n_l))], axis=-1)

    Bu_v = jnp.zeros((nvar + 1, n_v), dtype)
    Bu_v = Bu_v.at[v_idx[:, 2], jnp.arange(n_v)].add(1.0)
    Bu_v = Bu_v[:nvar]
    # I sources go through stamp_current(b, idx, u): b[i1] -= u, b[i2] += u
    Bu_i = -sel(i_idx, n_i)
    Bu = jnp.broadcast_to(jnp.concatenate([Bu_v, Bu_i], axis=-1),
                          lead + (nvar, m))

    X = Ainv @ Bs                                         # (..., N, k)
    Y = Ainv @ Bu                                         # (..., N, m)

    # s' = Sx @ x + Ss @ s:
    #   v_prev' = vdrop_C(x);  i_prev' = i_prev + (dt/L) vdrop_L(x)
    Dc = jnp.swapaxes(sel(c_idx, n_c), -1, -2)            # (nC, N)
    Dl = jnp.swapaxes(sel(l_idx, n_l), -1, -2)            # (nL, N)
    Sx_l = (dt / l_vals)[..., :, None] * Dl               # (..., nL, N)
    Sx = jnp.concatenate(
        [jnp.broadcast_to(Dc, lead + (n_c, nvar)),
         jnp.broadcast_to(Sx_l, lead + (n_l, nvar))], axis=-2)
    Ss = jnp.zeros((k, k), dtype)
    Ss = Ss.at[n_c + jnp.arange(n_l), n_c + jnp.arange(n_l)].set(1.0)

    T = Sx @ X + Ss                                       # (..., k, k)
    R = Sx @ Y                                            # (..., k, m)
    return T, R, X, Y


def affine_prefix_states(T: Array, Ru: Array):
    """All companion states s_t for t = 0..S from s_0 = 0.

    T: (..., k, k) constant per variant; Ru: (S+1, ..., k) per-step affine
    offsets R @ u_t. Returns s: (S+1, ..., k) where s_0 = 0 and
    s_{t+1} = T s_t + Ru_t — every prefix composed by associative_scan in
    O(log S) depth."""
    S1 = Ru.shape[0]
    Ts = jnp.broadcast_to(T[None], (S1,) + T.shape)

    def combine(a, b):
        Ma, ca = a
        Mb, cb = b
        return Mb @ Ma, (Mb @ ca[..., None])[..., 0] + cb

    Mc, cc = jax.lax.associative_scan(combine, (Ts, Ru), axis=0)
    # cc[t] = s_{t+1} (cumulative affine applied to s_0 = 0)
    zeros = jnp.zeros_like(Ru[:1])
    return jnp.concatenate([zeros, cc[:-1]], axis=0)      # s_t for t=0..S


def linear_tran_solutions(T, R, X, Y, u_grid, record_row=None):
    """Evaluate x_t for all steps. u_grid: (S+1, ..., m). With
    ``record_row`` (an int), returns that solution row only: (S+1, ...).
    Otherwise the full (S+1, ..., N)."""
    Ru = (R[None] @ u_grid[..., None])[..., 0]            # (S+1, ..., k)
    s = affine_prefix_states(T, Ru)                       # (S+1, ..., k)
    if record_row is not None:
        Xr = X[..., record_row, :]                        # (..., k)
        Yr = Y[..., record_row, :]
        return (jnp.sum(Xr[None] * s, axis=-1)
                + jnp.sum(Yr[None] * u_grid, axis=-1))
    x = (X[None] @ s[..., None])[..., 0]
    x = x + (Y[None] @ u_grid[..., None])[..., 0]
    return x


def eligible(tensors, ckt, nr: str, integration: str) -> bool:
    """Can this run take the parallel-in-time path?"""
    return (tensors.n_s == 0 and tensors.n_d == 0 and tensors.n_m == 0
            and tensors.n_q == 0 and tensors.n_t == 0 and tensors.n_k == 0
            and not ckt.B and integration == "be" and nr == "spicey")


def default_mem_budget() -> float:
    """Memory budget for the associative scan's intermediates.

    Resolution order: SPICEY_TPU_TP_MEM_BUDGET env var (bytes), else 1/4 of
    the default device's reported HBM (memory_stats — present on TPU, absent
    on CPU), else a 2 GB fallback calibrated on v5e (16 GB HBM)."""
    import os

    env = os.environ.get("SPICEY_TPU_TP_MEM_BUDGET")
    if env:
        return float(env)
    try:
        stats = jax.devices()[0].memory_stats()
        limit = stats.get("bytes_limit") if stats else None
        if limit:
            return float(limit) / 4.0
    except Exception:
        pass
    return 2e9


def default_crossover() -> float:
    """Sequential-scan-underutilization crossover factor (see worthwhile);
    overridable via SPICEY_TPU_TP_CROSSOVER for non-v5e hardware."""
    import os

    env = os.environ.get("SPICEY_TPU_TP_CROSSOVER")
    return float(env) if env else 32.0


def worthwhile(tensors, steps: int, B: int, itemsize: int,
               mem_budget_bytes: float | None = None,
               crossover: float | None = None) -> bool:
    """Is the parallel-in-time path the right REGIME for this workload?

    Two conditions: (a) the sequential scan under-utilizes the chip —
    (S+1)*crossover > B (measured on v5e: 2.2x at S=100k/B=16, a
    wash-or-worse at S=201/B=10k where the scan is already
    throughput-saturated); and (b) the associative scan's materialized
    intermediates fit — it holds O((S+1) * B * k^2) composed maps (~3x for
    the scan temporaries), while the sequential scan only ever holds one
    step. Without (b), an admissible-looking long-horizon run with k
    reactive elements and a large B would OOM where the sequential core
    runs fine.

    Both knobs are tunable for other TPU generations: pass them explicitly
    (plumbed through mc_tran_stats/mc_tran_sampled as tp_crossover /
    tp_mem_budget), or set SPICEY_TPU_TP_CROSSOVER /
    SPICEY_TPU_TP_MEM_BUDGET; the budget otherwise derives from the
    device's reported HBM (default_mem_budget)."""
    if mem_budget_bytes is None:
        mem_budget_bytes = default_mem_budget()
    if crossover is None:
        crossover = default_crossover()
    k = tensors.n_c + tensors.n_l
    mem = 3.0 * (steps + 1) * B * (k * k + k) * itemsize
    return (steps + 1) * crossover > B and mem < mem_budget_bytes
