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
lines, backward-Euler or trapezoidal integration, reference inner-loop
semantics. K-coupled inductors ARE eligible: the mutual companion is
linear too — the state-update rows use Gamma = dt * M^{-1}
(tran._mutual_inv) instead of the scalar dt/L.

Trapezoidal runs carry the doubled companion state
s = [v_prev_C | i_prev_C | i_prev_L | v_prev_L] (trap's formulas need the
companion current/voltage history the BE state does not — tran.py's trap
commit), and the engine's non-self-starting bootstrap (the t=0 record is
a backward-Euler solve; tran._stamp_system is_first) maps exactly onto
the affine chain because s_0 = 0: only the step-0 offset R_start @ u_0
and output Y_start @ u_0 come from the BE-matrix maps, every later step
composes the trap maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _sel(rows_idx, n_items, nvar: int, dtype):
    """(N, n_items) selection: column j = e_{i1(j)} - e_{i2(j)} with
    the ground dump slot dropped."""
    S = jnp.zeros((nvar + 1, n_items), dtype)
    cols = jnp.arange(n_items)
    S = S.at[rows_idx[:, 0], cols].add(1.0)
    S = S.at[rows_idx[:, 1], cols].add(-1.0)
    return S[:nvar]


def _source_matrix(v_idx, i_idx, nvar: int, dtype):
    """Bu: (N, m) mapping u = [V volts | I amps] to RHS injections —
    V: b[branch row] += u; I sources go through stamp_current(b, idx, u)
    (b[i1] -= u, b[i2] += u)."""
    n_v = v_idx.shape[0]
    Bu_v = jnp.zeros((nvar + 1, n_v), dtype)
    Bu_v = Bu_v.at[v_idx[:, 2], jnp.arange(n_v)].add(1.0)
    Bu_v = Bu_v[:nvar]
    Bu_i = -_sel(i_idx, i_idx.shape[0], nvar, dtype)
    return jnp.concatenate([Bu_v, Bu_i], axis=-1)


def _gamma_rows(Dl, c_l, l_vals, minv):
    """c_l * M^{-1} @ Dl — the inductor state-update rows (..., nL, N):
    scalar c_l/L per element, or the matrix companion with K coupling
    (tran._l_mv on the vdrop selector)."""
    if minv is None:
        return (c_l / l_vals)[..., :, None] * Dl
    return c_l * (minv @ Dl)


def linear_tran_maps(Ainv: Array, c_idx, c_vals, l_idx, l_vals,
                     v_idx, i_idx, dt, nvar: int, minv=None):
    """Build (T, R, X, Y) for the BE affine recurrence.

    Ainv: (..., N, N) inverse of the BE system matrix (R + C/dt + dt/L
    conductances + V-source rows). c_vals/l_vals: (..., nC)/(..., nL)
    (leading batch dims allowed). u = [V-source volts | I-source amps]
    ordered as the engine's source grid. ``minv``: (..., nL, nL) inverse
    inductance matrix when K couplings are present (tran._mutual_inv) —
    the commit rows become dt * M^{-1} @ Dl. Returns
    T: (..., k, k), R: (..., k, m), X: (..., N, k), Y: (..., N, m)
    with k = nC + nL, m = nV + nI.
    """
    dtype = Ainv.dtype
    lead = Ainv.shape[:-2]
    n_c = c_idx.shape[0]
    n_l = l_idx.shape[0]
    k = n_c + n_l
    m = v_idx.shape[0] + i_idx.shape[0]

    # b(s, u) = Bs @ s + Bu @ u  (RHS injections; tran._stamp_system BE):
    #   C: Ieq = -(C/dt) v_prev  via stamp_current -> b += (C/dt) v_prev
    #      on the (i1, i2) pattern;
    #   L: Isrc = +i_prev        -> b -= i_prev on the pattern.
    g_c = c_vals / dt                                     # (..., nC)
    Bs_c = _sel(c_idx, n_c, nvar, dtype) * g_c[..., None, :]
    Bs_l = -_sel(l_idx, n_l, nvar, dtype)                 # (N, nL)
    Bs = jnp.concatenate(
        [jnp.broadcast_to(Bs_c, lead + (nvar, n_c)),
         jnp.broadcast_to(Bs_l, lead + (nvar, n_l))], axis=-1)
    Bu = jnp.broadcast_to(_source_matrix(v_idx, i_idx, nvar, dtype),
                          lead + (nvar, m))

    X = Ainv @ Bs                                         # (..., N, k)
    Y = Ainv @ Bu                                         # (..., N, m)

    # s' = Sx @ x + Ss @ s:
    #   v_prev' = vdrop_C(x);  i_prev' = i_prev + dt * M^{-1} vdrop_L(x)
    Dc = jnp.swapaxes(_sel(c_idx, n_c, nvar, dtype), -1, -2)  # (nC, N)
    Dl = jnp.swapaxes(_sel(l_idx, n_l, nvar, dtype), -1, -2)  # (nL, N)
    Sx_l = _gamma_rows(Dl, dt, l_vals, minv)              # (..., nL, N)
    Sx = jnp.concatenate(
        [jnp.broadcast_to(Dc, lead + (n_c, nvar)),
         jnp.broadcast_to(Sx_l, lead + (n_l, nvar))], axis=-2)
    Ss = jnp.zeros((k, k), dtype)
    Ss = Ss.at[n_c + jnp.arange(n_l), n_c + jnp.arange(n_l)].set(1.0)

    T = Sx @ X + Ss                                       # (..., k, k)
    R = Sx @ Y                                            # (..., k, m)
    return T, R, X, Y


def linear_tran_maps_trap(Ainv_start: Array, Ainv_main: Array, c_idx,
                          c_vals, l_idx, l_vals, v_idx, i_idx, dt,
                          nvar: int, minv=None):
    """Affine maps for TRAPEZOIDAL integration with the engine's BE
    bootstrap step (tran._stamp_system integration="trap").

    State s = [v_prev_C | i_prev_C | i_prev_L | v_prev_L], k = 2(nC+nL).
    Steps >= 1 use the trap companions
        C: G = 2C/dt,  b += sel_C (G v_prev + i_prev_C)
        L: G = (dt/2) M^{-1},  b -= sel_L (i_prev_L + (dt/2) M^{-1} v_prev_L)
    and commit (tran.py trap branch)
        v_C' = Dc x;  i_C' = G (Dc x - v_C) - i_C
        i_L' = i_L + (dt/2) M^{-1} (v_L + Dl x);  v_L' = Dl x.
    Step 0 solves the BE matrix (Ainv_start) and commits with the is_first
    branches (i_C' = (C/dt) Dc x, i_L' = i_L + dt M^{-1} Dl x). Because
    s_0 = 0, only its input map matters: R_start = Sx_start @ Y_start.

    Returns (T, R, X, Y, R_start, Y_start) — main-step maps plus the
    step-0 offset/output maps for linear_tran_solutions' trap mode.
    """
    dtype = Ainv_main.dtype
    lead = Ainv_main.shape[:-2]
    n_c = c_idx.shape[0]
    n_l = l_idx.shape[0]
    k = 2 * (n_c + n_l)
    m = v_idx.shape[0] + i_idx.shape[0]
    half = dt / 2.0

    sel_c = _sel(c_idx, n_c, nvar, dtype)                 # (N, nC)
    sel_l = _sel(l_idx, n_l, nvar, dtype)                 # (N, nL)
    Dc = jnp.swapaxes(sel_c, -1, -2)                      # (nC, N)
    Dl = jnp.swapaxes(sel_l, -1, -2)                      # (nL, N)
    g_c = 2.0 * c_vals / dt                               # (..., nC)

    # Bs over [v_C | i_C | i_L | v_L]
    Bs_vc = sel_c * g_c[..., None, :]                     # (..., N, nC)
    Bs_ic = jnp.broadcast_to(sel_c, lead + (nvar, n_c))
    Bs_il = jnp.broadcast_to(-sel_l, lead + (nvar, n_l))
    # b -= sel_L (dt/2) M^{-1} v_L  ->  -sel_L @ ((dt/2) M^{-1})
    if minv is None:
        Bs_vl = -sel_l * (half / l_vals)[..., None, :]
    else:
        Bs_vl = -(sel_l @ (half * minv))
    Bs = jnp.concatenate(
        [jnp.broadcast_to(Bs_vc, lead + (nvar, n_c)), Bs_ic, Bs_il,
         jnp.broadcast_to(Bs_vl, lead + (nvar, n_l))], axis=-1)
    Bu = jnp.broadcast_to(_source_matrix(v_idx, i_idx, nvar, dtype),
                          lead + (nvar, m))

    X = Ainv_main @ Bs                                    # (..., N, k)
    Y = Ainv_main @ Bu                                    # (..., N, m)
    Y_start = Ainv_start @ Bu

    # Sx: coefficient of x in s' (rows ordered as the state)
    gamma_half = _gamma_rows(Dl, half, l_vals, minv)      # (..., nL, N)
    Sx = jnp.concatenate(
        [jnp.broadcast_to(Dc, lead + (n_c, nvar)),
         g_c[..., :, None] * Dc,
         jnp.broadcast_to(gamma_half, lead + (n_l, nvar)),
         jnp.broadcast_to(Dl, lead + (n_l, nvar))], axis=-2)
    # Ss: coefficient of s in s'
    Ss = jnp.zeros(lead + (k, k), dtype)
    rc = jnp.arange(n_c)
    rl = jnp.arange(n_l)
    # i_C' rows: -G on v_C, -1 on i_C
    Ss = Ss.at[..., n_c + rc, rc].add(-g_c)
    Ss = Ss.at[..., n_c + rc, n_c + rc].add(-1.0)
    # i_L' rows: +1 on i_L, (dt/2) M^{-1} on v_L
    Ss = Ss.at[..., 2 * n_c + rl, 2 * n_c + rl].add(1.0)
    if minv is None:
        Ss = Ss.at[..., 2 * n_c + rl, 2 * n_c + n_l + rl].add(half / l_vals)
    else:
        Ss = Ss.at[..., 2 * n_c + rl[:, None],
                   2 * n_c + n_l + rl[None, :]].add(half * minv)

    T = Sx @ X + Ss                                       # (..., k, k)
    R = Sx @ Y                                            # (..., k, m)

    # step-0 commit: BE branches (is_first) applied to x_0 = Y_start u_0
    gamma_full = _gamma_rows(Dl, dt, l_vals, minv)
    Sx_start = jnp.concatenate(
        [jnp.broadcast_to(Dc, lead + (n_c, nvar)),
         (c_vals / dt)[..., :, None] * Dc,
         jnp.broadcast_to(gamma_full, lead + (n_l, nvar)),
         jnp.broadcast_to(Dl, lead + (n_l, nvar))], axis=-2)
    R_start = Sx_start @ Y_start                          # (..., k, m)
    return T, R, X, Y, R_start, Y_start


def affine_prefix_states(T: Array, Ru_tl: Array):
    """All companion states s_t for t = 0..S from s_0 = 0, TIME-LAST.

    T: (..., k, k) constant per variant; Ru_tl: (..., k, S+1) per-step
    affine offsets R @ u_t with the time axis LAST. Returns
    s: (..., k, S+1) where s_0 = 0 and s_{t+1} = T s_t + Ru_t — every
    prefix composed by associative_scan in O(log S) depth.

    LAYOUT (the whole ballgame on TPU): the scan runs over elements
    (..., k, k, S+1) / (..., k, S+1). TPU tiles the trailing two dims to
    (8, 128); the naive time-major (S+1, ..., k, k) layout puts the tiny
    (k, k) matrix dims in the tile, padding k=2 to (2, 128) — a 64x
    memory/bandwidth blowup that made the scan HBM-bound on padding and
    OOM'd at S=300k (observed: a 19.6 GB allocation for 0.3 GB of
    payload). Time-last keeps the 128-lane dim on the huge S axis (exact)
    and pads only k -> 8 sublanes."""
    S1 = Ru_tl.shape[-1]
    Ts = jnp.broadcast_to(T[..., None], T.shape + (S1,))
    # offsets carry a dummy column axis so both scan leaves share rank
    # (associative_scan applies ONE axis index to every leaf)
    rus = Ru_tl[..., :, None, :]               # (..., k, 1, S+1)

    def combine(a, b):
        Ma, ca = a                         # (..., k, k, s) / (..., k, 1, s)
        Mb, cb = b
        # k x k composition as broadcast-multiply-reduce, NOT einsum:
        # einsum lowers to dot_general with s as a batch dim, and XLA
        # canonicalizes batch dims LEADING — materializing transposed
        # (..., s, k, k) operands whose trailing k=2..8 dims tile to
        # (8, 128), the exact 64x padding blowup time-last exists to
        # avoid (observed: a 26 GB broadcast at B=64, S=100k). The
        # explicit form keeps s on the lanes through every op and the
        # multiply fuses into the reduction.
        M = jnp.sum(Mb[..., :, :, None, :] * Ma[..., None, :, :, :],
                    axis=-3)
        c = jnp.sum(Mb[..., :, :, None, :] * ca[..., None, :, :, :],
                    axis=-3) + cb
        return M, c

    Mc, cc = jax.lax.associative_scan(combine, (Ts, rus), axis=-1)
    cc = cc[..., :, 0, :]                      # (..., k, S+1)
    # cc[..., t] = s_{t+1} (cumulative affine applied to s_0 = 0)
    return jnp.concatenate(
        [jnp.zeros_like(cc[..., :1]), cc[..., :-1]], axis=-1)


def linear_tran_solutions(T, R, X, Y, u_grid, record_row=None,
                          R_start=None, Y_start=None):
    """Evaluate x_t for all steps. u_grid: (S+1, ..., m). With
    ``record_row`` (an int), returns that solution row only: (S+1, ...).
    Otherwise the full (S+1, ..., N).

    ``R_start``/``Y_start`` (trap mode): step 0 is the engine's BE
    bootstrap solve — its offset into s_1 uses R_start and its recorded
    output uses Y_start (s_0 = 0, so no X_start term exists).

    All intermediates are TIME-LAST (see affine_prefix_states); only the
    returned array is time-major, one output-side transpose. Every
    s-carrying contraction is written as broadcast-multiply-reduce, not
    einsum/matmul — dot_general would put the batch s dim leading and
    materialize (s, tiny, tiny)-trailing transposes that pad 64x under
    TPU tiling (see affine_prefix_states.combine)."""
    u_tl = jnp.moveaxis(u_grid, 0, -1)                    # (..., m, S+1)
    Ru = jnp.sum(R[..., :, :, None] * u_tl[..., None, :, :],
                 axis=-2)                                 # (..., k, S+1)
    if R_start is not None:
        Ru0 = jnp.einsum("...km,...m->...k", R_start, u_grid[0])
        Ru = jnp.concatenate([Ru0[..., None], Ru[..., 1:]], axis=-1)
    s = affine_prefix_states(T, Ru)                       # (..., k, S+1)
    if record_row is not None:
        Xr = X[..., record_row, :]                        # (..., k)
        Yr = Y[..., record_row, :]
        x = (jnp.sum(Xr[..., :, None] * s, axis=-2)
             + jnp.sum(Yr[..., :, None] * u_tl, axis=-2))  # (..., S+1)
        if Y_start is not None:
            x0 = jnp.einsum("...m,...m->...",
                            Y_start[..., record_row, :], u_grid[0])
            x = jnp.concatenate([x0[..., None], x[..., 1:]], axis=-1)
        return jnp.moveaxis(x, -1, 0)                     # (S+1, ...)
    x = (jnp.sum(X[..., :, :, None] * s[..., None, :, :], axis=-2)
         + jnp.sum(Y[..., :, :, None] * u_tl[..., None, :, :],
                   axis=-2))                              # (..., N, S+1)
    if Y_start is not None:
        x0 = jnp.einsum("...nm,...m->...n", Y_start, u_grid[0])
        x = jnp.concatenate([x0[..., None], x[..., 1:]], axis=-1)
    return jnp.moveaxis(x, -1, 0)                         # (S+1, ..., N)


def eligible(tensors, ckt, nr: str, integration: str) -> bool:
    """Can this run take the parallel-in-time path? Linear circuits only
    (K-coupled inductors ARE linear — their matrix companion rides the
    affine map), BE or trapezoidal integration, reference inner-loop
    semantics. gear2's two-step history would triple the state for a
    scheme whose damping exists for circuits (stiff switching) that are
    nonlinear anyway — it stays on the sequential core."""
    return (tensors.n_s == 0 and tensors.n_d == 0 and tensors.n_m == 0
            and tensors.n_q == 0 and tensors.n_t == 0
            and not ckt.B and integration in ("be", "trap")
            and nr == "spicey")


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
               crossover: float | None = None,
               integration: str = "be") -> bool:
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
    if integration == "trap":
        k *= 2  # s = [v_C | i_C | i_L | v_L] (linear_tran_maps_trap)
    # the scan's (..., k, k, S+1) elements tile the SECOND-TO-LAST dim to
    # 8 sublanes (time-last layout, affine_prefix_states) — account for
    # the padding or long-horizon runs OOM where the model said "fits"
    k_pad = -(-k // 8) * 8
    mem = 3.0 * (steps + 1) * B * (k + 1.0) * k_pad * itemsize
    return (steps + 1) * crossover > B and mem < mem_budget_bytes
