"""Pallas TPU kernel: batch-major Gauss-Jordan solve for tiny dense systems.

This is the engine's native kernel tier (SURVEY.md §7 step 7), replacing the
reference's scalar Gaussian elimination (lib/math/solveReal.ts,
solveComplex.ts) with a layout designed for the TPU VPU:

  - MNA matrices are tiny (N ~ 3..64) but arrive in HUGE batches
    (variants x frequencies). Intra-matrix parallelism is worthless at this
    size; the batch axis is the vector axis.
  - The augmented systems are laid out **batch-last**: (N, N+1, TILE_B) with
    the batch in the 128-wide lane dimension, so every elimination step is a
    full-width VPU op across TILE_B independent systems. The (B, N, N)
    layout XLA picks by default wastes >90% of each (8,128) tile padding an
    N=6 row to 128 lanes.
  - Pivoting uses the same one-hot trick as ops/linsolve.gj_solve: per-lane
    argmax over unused rows via max + first-match-select (iota min), pivot
    row extraction and application via masked reductions — zero gathers,
    zero data-dependent control flow.
  - Complex systems are solved directly on (re, im) planes with
    |pivot|^2 = re^2 + im^2 pivoting — the reference's complex-magnitude
    pivot choice (solveComplex.ts:24) — at ~3x fewer flops than the 2N
    real-block embedding.

Singularity (|pivot| < EPS, solveReal.ts:28) is reported as a per-system
validity flag; batched device code cannot throw.

Precision: Mosaic on this TPU generation is float32-only (f64 stores fail to
lower), while the engine's fidelity contract is float64. The wrappers
therefore run the elimination in f32 and recover f64 accuracy with mixed-
precision iterative refinement: residuals r = b - A x are computed in f64 by
XLA *outside* the kernel, correction solves reuse the f32 factorized path.
This converges to ~f64 accuracy when cond(A) << 1/eps_f32 (~1e7). Circuits
with extreme conductance spreads (e.g. Roff = 1e12 switches) break that
assumption, so the refined tier is **guarded**: after refinement the f64
relative residual ||b - A x|| / (||A||*||x|| + ||b||) is computed per
system (rtol = 1e-12: converged refinement lands at ~n*eps_f64 ~ 1e-15,
divergence stalls >= ~eps_f32 ~ 1e-8, so the threshold sits 3 decades from
either cluster and bounds the fallback path's forward error to
~cond(A)*1e-12), and any system above ``rtol`` is either re-solved on the f64
one-hot-GJ path (``fallback=True``, the default — a whole-batch
``lax.cond`` branch that only executes when at least one system diverged)
or has its ``valid`` flag cleared (``fallback=False``). Either way no
silently-wrong result is marked valid — the batched analog of the
reference's throw-on-singular philosophy (solveReal.ts:28).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS

Array = jax.Array

_LANE = 128

# Largest N for which the Gauss-Jordan INVERSE kernels fit in scoped VMEM
# (four (N, N, 128) matrix blocks + double-buffering; the x-solve kernels
# carry only two (N, N+1, 128) blocks and reach N=128). Beyond this the
# refined tier re-eliminates per refinement round instead.
_INV_KERNEL_MAX_N = 96


def _z() -> Array:
    # int32 zero for BlockSpec index maps: under x64 a literal 0 traces to
    # i64 and Mosaic fails to legalize the index-map function's return
    import jax.numpy as _jnp
    return _jnp.asarray(0, _jnp.int32)


def _tile_b(n: int, dtype_bytes: int, n_bufs: int) -> int:
    """Pick a lane-aligned batch tile that keeps VMEM usage ~<= 4 MB."""
    budget = 4 * 1024 * 1024
    per_lane = n * (n + 2) * dtype_bytes * n_bufs + 8 * dtype_bytes
    tile = budget // (per_lane * _LANE) * _LANE
    return int(max(_LANE, min(2048, tile)))


def _vmem_limit(n: int) -> int:
    """Scoped-VMEM limit for the GJ kernels. v5e has 128 MB of VMEM; the
    compiler's default 16 MB scoped limit rejects the N=64 blocks
    (planes + loop double-buffer ~ 20 MB), and N >= ~96 needs ~80 MB
    (two input planes + two scratch planes at (N, N+1, 128) f32, each
    double-buffered) — measured 78.5 MB at N=128."""
    return (100 if n >= 96 else 64) * 1024 * 1024


def _first_match_onehot(score: Array, rows_f: Array, n: int) -> Array:
    """Per-lane argmax over axis 0 as a one-hot, ties to the lowest row.

    Row indices live in FLOAT (exact for n << 2^24): under x64 mode Mosaic
    crashes on integer min-reductions (the i64-typed reduce init can't
    lower), while float reductions are fine.
    """
    m = jnp.max(score, axis=0, keepdims=True)
    cand = score == m
    nf = jnp.asarray(float(n), dtype=score.dtype)
    ridx = jnp.min(jnp.where(cand, rows_f, nf), axis=0, keepdims=True)
    return rows_f == ridx


def _extract_solution(colidx: Array, rhs: Array, rows2: Array,
                      n: int) -> Array:
    """x[k, b] = rhs[r, b] where colidx[r, b] == k, as one masked reduction.

    ``colidx`` maps each row to the column it pivoted (float-encoded exact
    small integers). The (n, n, tb) one-shot mask replaces the per-column
    one-hot buffer list the unrolled kernel used to keep live — that list
    was the scoped-VMEM blowup at N=64."""
    eq = colidx[None, :, :] == rows2[:, None, :]  # (Nk, Nr, TB)
    return jnp.sum(jnp.where(eq, rhs[None, :, :], 0.0), axis=1)


def _real_gj_scratch(ab_s: object, *, n: int, tb: int, dtype: object,
                     eps: float) -> tuple:
    """The real one-hot-pivot Gauss-Jordan loop on an augmented
    (N, N+1, TB) VMEM scratch; shared by the batch-last solve kernel and
    the fused transient MC kernel's Newton iterations
    (ops/pallas_mc_tran.py). Returns (colidx, valid, rows2) with the
    reduced planes left in the scratch ref."""
    # tpu.iota must be integer-typed; convert to float for the reductions
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0).astype(dtype)
    # explicit typed constants: under x64, literals in scalar-scalar
    # jnp.where become weak f64, which Mosaic cannot lower
    eps_t = jnp.asarray(eps, dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)

    def body(k: Array, carry: tuple) -> tuple:
        used, valid, colidx = carry
        kf = k.astype(dtype)
        col = ab_s[:, pl.ds(k, 1), :][:, 0, :]  # (N, TB)
        score = jnp.where(used > 0, -1.0, jnp.abs(col))
        onehot = _first_match_onehot(score, rows2, n)  # (N, TB) bool
        pv = jnp.sum(jnp.where(onehot, col, 0.0), axis=0, keepdims=True)
        ok = jnp.abs(pv) >= eps_t
        valid = valid * jnp.where(ok, one, zero)
        inv_pv = 1.0 / jnp.where(ok, pv, 1.0)  # (1, TB)
        ab = ab_s[:]
        prow = (
            jnp.sum(jnp.where(onehot[:, None, :], ab, 0.0), axis=0)
            * inv_pv
        )  # (N+1, TB)
        factor = jnp.where(onehot, 0.0, col)  # (N, TB)
        ab = ab - factor[:, None, :] * prow[None, :, :]
        ab_s[:] = jnp.where(onehot[:, None, :], prow[None, :, :], ab)
        # no bool->float astype: Mosaic cannot lower that convert
        used = used + jnp.where(onehot, one, zero)
        colidx = colidx + jnp.where(onehot, kf, zero)
        return used, valid, colidx

    init = (jnp.zeros((n, tb), dtype), jnp.ones((1, tb), dtype),
            jnp.zeros((n, tb), dtype))
    _used, valid, colidx = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), body, init)
    return colidx, valid, rows2


def _gj_real_kernel(ab_ref: object, x_ref: object, valid_ref: object,
                    ab_s: object, *, n: int, eps: float) -> None:
    """One grid cell: solve TILE_B real systems laid out (N, N+1, TILE_B).

    The elimination runs as an in-kernel ``fori_loop`` (one step's
    temporaries live at a time — an unrolled loop multiplies them by N and
    blows Mosaic's scoped VMEM at N ~ 64). Loop bounds are pinned to i32:
    under x64 Python-int bounds trace to i64, which Mosaic cannot lower.

    The working matrix lives in the ``ab_s`` VMEM scratch so column k is a
    DYNAMIC SUBLANE SLICE ``ab_s[:, pl.ds(k, 1), :]`` — O(N*TB) — instead
    of the O(N^2*TB) masked iota-reduction the first kernel generation
    used (value-level dynamic_slice doesn't lower in Mosaic, but ref
    loads do; measured +17% at N=64, bit-identical results).
    """
    ab_s[:] = ab_ref[:]  # (N, N+1, TB)
    tb = ab_ref.shape[-1]
    colidx, valid, rows2 = _real_gj_scratch(
        ab_s, n=n, tb=tb, dtype=ab_ref.dtype, eps=eps)
    rhs = ab_s[:, n, :]  # (N, TB) final RHS column
    x_ref[:] = _extract_solution(colidx, rhs, rows2, n)
    valid_ref[:] = valid


def _complex_gj_scratch(ar_s: object, ai_s: object, *, n: int, tb: int,
                        dtype: object, eps: float) -> tuple:
    """The complex one-hot-pivot Gauss-Jordan loop on (re, im) VMEM
    scratch planes shaped (N, N+1, TB). Shared by the batch-last solve
    kernel and the fused assemble+solve MC kernel (ops/pallas_mc_ac.py);
    returns (colidx, valid, rows2) with the reduced planes left in the
    scratch refs."""
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0).astype(dtype)
    eps2 = jnp.asarray(eps * eps, dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)

    def body(k: Array, carry: tuple) -> tuple:
        used, valid, colidx = carry
        kf = k.astype(dtype)
        cr = ar_s[:, pl.ds(k, 1), :][:, 0, :]
        ci = ai_s[:, pl.ds(k, 1), :][:, 0, :]
        mag2 = cr * cr + ci * ci
        score = jnp.where(used > 0, -1.0, mag2)
        onehot = _first_match_onehot(score, rows2, n)
        pvr = jnp.sum(jnp.where(onehot, cr, 0.0), axis=0, keepdims=True)
        pvi = jnp.sum(jnp.where(onehot, ci, 0.0), axis=0, keepdims=True)
        d = pvr * pvr + pvi * pvi
        # reference pivot test is |pv| >= EPS, i.e. |pv|^2 >= EPS^2
        ok = d >= eps2
        valid = valid * jnp.where(ok, one, zero)
        inv_d = 1.0 / jnp.where(ok, d, 1.0)
        ar = ar_s[:]
        ai = ai_s[:]
        prr = jnp.sum(jnp.where(onehot[:, None, :], ar, 0.0), axis=0)
        pri = jnp.sum(jnp.where(onehot[:, None, :], ai, 0.0), axis=0)
        # pivot_row / pv  (complex divide by the pivot)
        prow_r = (prr * pvr + pri * pvi) * inv_d  # (N+1, TB)
        prow_i = (pri * pvr - prr * pvi) * inv_d
        fr = jnp.where(onehot, 0.0, cr)
        fi = jnp.where(onehot, 0.0, ci)
        ar = ar - (fr[:, None, :] * prow_r[None, :, :]
                   - fi[:, None, :] * prow_i[None, :, :])
        ai = ai - (fr[:, None, :] * prow_i[None, :, :]
                   + fi[:, None, :] * prow_r[None, :, :])
        ar_s[:] = jnp.where(onehot[:, None, :], prow_r[None, :, :], ar)
        ai_s[:] = jnp.where(onehot[:, None, :], prow_i[None, :, :], ai)
        used = used + jnp.where(onehot, one, zero)
        colidx = colidx + jnp.where(onehot, kf, zero)
        return used, valid, colidx

    init = (jnp.zeros((n, tb), dtype), jnp.ones((1, tb), dtype),
            jnp.zeros((n, tb), dtype))
    _used, valid, colidx = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), body, init)
    return colidx, valid, rows2


def _gj_complex_kernel(abr_ref: object, abi_ref: object, xr_ref: object,
                       xi_ref: object, valid_ref: object,
                       ar_s: object, ai_s: object,
                       *, n: int, eps: float) -> None:
    """Complex GJ on (re, im) planes with |pivot|^2 pivoting.

    Same fori_loop + colidx structure as the real kernel; the planes live
    in VMEM scratch so column k is a dynamic sublane slice (see there)."""
    ar_s[:] = abr_ref[:]
    ai_s[:] = abi_ref[:]
    tb = abr_ref.shape[-1]
    colidx, valid, rows2 = _complex_gj_scratch(
        ar_s, ai_s, n=n, tb=tb, dtype=abr_ref.dtype, eps=eps)
    xr_ref[:] = _extract_solution(colidx, ar_s[:, n, :], rows2, n)
    xi_ref[:] = _extract_solution(colidx, ai_s[:, n, :], rows2, n)
    valid_ref[:] = valid


def _gj_inv_real_kernel(a_ref: object, m_ref: object, colidx_ref: object,
                        valid_ref: object, a_s: object, *, n: int,
                        eps: float) -> None:
    """Gauss-Jordan INVERSE: reduce [A | I] so every later solve is a matvec.

    Outputs M = R (the row-op matrix applied to I) and the pivot column map
    ``colidx``; the true inverse is the row-unpermutation of M
    (A^-1[i, :] = M[p_i, :], recovered outside the kernel with a one-hot
    contraction). Refined f64 solves use this so the O(N^3) elimination runs
    ONCE and each refinement round is an O(N^2) matvec — the previous
    design re-eliminated the same matrix once per refinement round.

    The A planes live in VMEM scratch (dynamic-sublane column slice, see
    ``_gj_real_kernel``); M accumulates directly in its output ref."""
    a_s[:] = a_ref[:]  # (N, N, TB)
    tb = a_ref.shape[-1]
    colidx, valid, _rows2 = _real_inv_scratch(
        a_s, m_ref, n=n, tb=tb, dtype=a_ref.dtype, eps=eps)
    colidx_ref[:] = colidx
    valid_ref[:] = valid


def _real_inv_scratch(a_s: object, m_s: object, *, n: int, tb: int,
                      dtype: object, eps: float) -> tuple:
    """The real [A | I] Gauss-Jordan reduction on VMEM refs; shared by
    the inverse kernel and the fused transient MC kernel
    (ops/pallas_mc_tran.py). Initializes ``m_s`` to identity, reduces
    both in place, returns (colidx, valid, rows2) — the true inverse is
    the colidx row-unpermutation of M."""
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0).astype(dtype)
    eps_t = jnp.asarray(eps, dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, tb), 0)
    cols3i = jax.lax.broadcasted_iota(jnp.int32, (n, n, tb), 1)
    m_s[:] = jnp.where(rows3 == cols3i, one, zero)  # identity planes

    def body(k: Array, carry: tuple) -> tuple:
        used, valid, colidx = carry
        kf = k.astype(dtype)
        col = a_s[:, pl.ds(k, 1), :][:, 0, :]  # (N, TB)
        score = jnp.where(used > 0, -1.0, jnp.abs(col))
        onehot = _first_match_onehot(score, rows2, n)
        pv = jnp.sum(jnp.where(onehot, col, 0.0), axis=0, keepdims=True)
        ok = jnp.abs(pv) >= eps_t
        valid = valid * jnp.where(ok, one, zero)
        inv_pv = 1.0 / jnp.where(ok, pv, 1.0)
        a = a_s[:]
        m = m_s[:]
        prow_a = jnp.sum(
            jnp.where(onehot[:, None, :], a, 0.0), axis=0) * inv_pv
        prow_m = jnp.sum(
            jnp.where(onehot[:, None, :], m, 0.0), axis=0) * inv_pv
        factor = jnp.where(onehot, 0.0, col)
        a = a - factor[:, None, :] * prow_a[None, :, :]
        m = m - factor[:, None, :] * prow_m[None, :, :]
        a_s[:] = jnp.where(onehot[:, None, :], prow_a[None, :, :], a)
        m_s[:] = jnp.where(onehot[:, None, :], prow_m[None, :, :], m)
        used = used + jnp.where(onehot, one, zero)
        colidx = colidx + jnp.where(onehot, kf, zero)
        return used, valid, colidx

    init = (jnp.zeros((n, tb), dtype), jnp.ones((1, tb), dtype),
            jnp.zeros((n, tb), dtype))
    _used, valid, colidx = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), body, init)
    return colidx, valid, rows2


def _gj_inv_complex_kernel(ar_ref: object, ai_ref: object, mr_ref: object,
                           mi_ref: object, colidx_ref: object,
                           valid_ref: object, ar_s: object, ai_s: object,
                           *, n: int, eps: float) -> None:
    """Complex GJ inverse on (re, im) planes (see ``_gj_inv_real_kernel``).

    |pivot|^2 pivoting as in ``_gj_complex_kernel``; column k is a dynamic
    sublane slice of the A scratch planes, the M planes accumulate in their
    output refs — one elimination over effective width 2N replaces the old
    THREE eliminations over width N+1 in the refined f64 tier."""
    ar_s[:] = ar_ref[:]
    ai_s[:] = ai_ref[:]
    tb = ar_ref.shape[-1]
    dtype = ar_ref.dtype
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0).astype(dtype)
    eps2 = jnp.asarray(eps * eps, dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, tb), 0)
    cols3i = jax.lax.broadcasted_iota(jnp.int32, (n, n, tb), 1)
    mr_ref[:] = jnp.where(rows3 == cols3i, one, zero)
    mi_ref[:] = jnp.zeros((n, n, tb), dtype)

    def body(k: Array, carry: tuple) -> tuple:
        used, valid, colidx = carry
        kf = k.astype(dtype)
        cr = ar_s[:, pl.ds(k, 1), :][:, 0, :]
        ci = ai_s[:, pl.ds(k, 1), :][:, 0, :]
        mag2 = cr * cr + ci * ci
        score = jnp.where(used > 0, -1.0, mag2)
        onehot = _first_match_onehot(score, rows2, n)
        pvr = jnp.sum(jnp.where(onehot, cr, 0.0), axis=0, keepdims=True)
        pvi = jnp.sum(jnp.where(onehot, ci, 0.0), axis=0, keepdims=True)
        d = pvr * pvr + pvi * pvi
        ok = d >= eps2
        valid = valid * jnp.where(ok, one, zero)
        inv_d = 1.0 / jnp.where(ok, d, 1.0)
        ar = ar_s[:]
        ai = ai_s[:]
        mr = mr_ref[:]
        mi = mi_ref[:]

        def prow(pr: Array, pi: Array) -> tuple[Array, Array]:
            # (pivot row of [pr, pi]) / pivot, complex divide
            sr = jnp.sum(jnp.where(onehot[:, None, :], pr, 0.0), axis=0)
            si = jnp.sum(jnp.where(onehot[:, None, :], pi, 0.0), axis=0)
            return ((sr * pvr + si * pvi) * inv_d,
                    (si * pvr - sr * pvi) * inv_d)

        par_r, par_i = prow(ar, ai)
        pm_r, pm_i = prow(mr, mi)
        fr = jnp.where(onehot, 0.0, cr)
        fi = jnp.where(onehot, 0.0, ci)

        def upd(p: Array, pr_r: Array, pr_i: Array,
                real: bool) -> Array:
            if real:
                return p - (fr[:, None, :] * pr_r[None, :, :]
                            - fi[:, None, :] * pr_i[None, :, :])
            return p - (fr[:, None, :] * pr_i[None, :, :]
                        + fi[:, None, :] * pr_r[None, :, :])

        ar = upd(ar, par_r, par_i, True)
        ai = upd(ai, par_r, par_i, False)
        mr = upd(mr, pm_r, pm_i, True)
        mi = upd(mi, pm_r, pm_i, False)
        ar_s[:] = jnp.where(onehot[:, None, :], par_r[None, :, :], ar)
        ai_s[:] = jnp.where(onehot[:, None, :], par_i[None, :, :], ai)
        mr_ref[:] = jnp.where(onehot[:, None, :], pm_r[None, :, :], mr)
        mi_ref[:] = jnp.where(onehot[:, None, :], pm_i[None, :, :], mi)
        used = used + jnp.where(onehot, one, zero)
        colidx = colidx + jnp.where(onehot, kf, zero)
        return used, valid, colidx

    init = (jnp.zeros((n, tb), dtype), jnp.ones((1, tb), dtype),
            jnp.zeros((n, tb), dtype))
    _used, valid, colidx = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), body, init)
    colidx_ref[:] = colidx
    valid_ref[:] = valid


def _pad_batch(arr: Array, tile: int) -> tuple[Array, int]:
    b = arr.shape[-1]
    pad = (-b) % tile
    if pad:
        arr = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, pad)])
    return arr, b


def _solve_real_f32(A: Array, b: Array, eps: float,
                    interpret: bool) -> tuple[Array, Array]:
    """Raw f32 batch-major kernel dispatch. A: (B, N, N) f32; b: (B, N) f32."""
    _, n, _ = A.shape
    dtype = A.dtype
    ab = jnp.concatenate([A, b[:, :, None]], axis=2)  # (B, N, N+1)
    ab = jnp.moveaxis(ab, 0, -1)  # (N, N+1, B)
    tile = _tile_b(n, dtype.itemsize, 2)
    ab, b_orig = _pad_batch(ab, tile)
    bp = ab.shape[-1]

    kernel = functools.partial(_gj_real_kernel, n=n, eps=eps)
    x, valid = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((n, n + 1, tile), lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((1, bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, n + 1, tile), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(n)),  # see _vmem_limit
        interpret=interpret,
    )(ab)
    x = jnp.moveaxis(x[:, :b_orig], -1, 0)  # (B, N)
    valid = valid[0, :b_orig] > 0
    return x, valid


def _inverse_real_f32(A: Array, eps: float,
                      interpret: bool) -> tuple[Array, Array, Array]:
    """Dispatch ``_gj_inv_real_kernel``. A: (B, N, N) f32.
    Returns (M: (B, N, N), colidx: (B, N), valid: (B,) bool)."""
    _, n, _ = A.shape
    dtype = A.dtype
    a = jnp.moveaxis(A, 0, -1)  # (N, N, B)
    tile = _tile_b(n, dtype.itemsize, 4)
    a, b_orig = _pad_batch(a, tile)
    bp = a.shape[-1]
    kernel = functools.partial(_gj_inv_real_kernel, n=n, eps=eps)
    m, colidx, valid = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((n, n, tile), lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, n, tile), lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, bp), dtype),
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((1, bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, n, tile), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(n)),  # see _vmem_limit
        interpret=interpret,
    )(a)
    return (jnp.moveaxis(m[..., :b_orig], -1, 0),
            jnp.moveaxis(colidx[:, :b_orig], -1, 0),
            valid[0, :b_orig] > 0)


def _inverse_complex_f32(
        Ar: Array, Ai: Array, eps: float,
        interpret: bool) -> tuple[Array, Array, Array, Array]:
    """Dispatch ``_gj_inv_complex_kernel``. Ar/Ai: (B, N, N) f32.
    Returns (Mr, Mi: (B, N, N), colidx: (B, N), valid: (B,) bool)."""
    _, n, _ = Ar.shape
    dtype = Ar.dtype
    ar = jnp.moveaxis(Ar, 0, -1)
    ai = jnp.moveaxis(Ai, 0, -1)
    tile = _tile_b(n, dtype.itemsize, 8)
    ar, b_orig = _pad_batch(ar, tile)
    ai, _ = _pad_batch(ai, tile)
    bp = ar.shape[-1]
    kernel = functools.partial(_gj_inv_complex_kernel, n=n, eps=eps)
    mat_spec = pl.BlockSpec((n, n, tile), lambda i: (_z(), _z(), i),
                            memory_space=pltpu.VMEM)
    mr, mi, colidx, valid = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[mat_spec, mat_spec],
        out_specs=[
            mat_spec, mat_spec,
            pl.BlockSpec((n, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, bp), dtype),
            jax.ShapeDtypeStruct((n, n, bp), dtype),
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((1, bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, n, tile), dtype),
                        pltpu.VMEM((n, n, tile), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(n)),
        interpret=interpret,
    )(ar, ai)
    return (jnp.moveaxis(mr[..., :b_orig], -1, 0),
            jnp.moveaxis(mi[..., :b_orig], -1, 0),
            jnp.moveaxis(colidx[:, :b_orig], -1, 0),
            valid[0, :b_orig] > 0)


def _unperm_onehot(colidx: Array, n: int) -> Array:
    """(B, N_row, N_col) one-hot with unperm[b, r, k] = [colidx[b, r] == k]:
    row r of M is row colidx[r] of the true inverse (see the inverse-kernel
    docstring), so x = einsum('brk,br->bk', unperm, M @ y)."""
    cols = jnp.arange(n, dtype=colidx.dtype)
    return (colidx[:, :, None] == cols[None, None, :]).astype(colidx.dtype)


def _rel_residual(r_max: Array, a_max: Array, x_max: Array,
                  b_max: Array) -> Array:
    """Per-system relative residual ||r|| / (||A||*||x|| + ||b||), inf-norms."""
    scale = jnp.maximum(a_max * x_max + b_max, jnp.finfo(r_max.dtype).tiny)
    return r_max / scale


@functools.partial(
    jax.jit,
    static_argnames=("eps", "refine", "interpret", "rtol", "fallback"),
)
def pallas_gj_solve_real(A: Array, b: Array, eps: float = EPS,
                         refine: int = 2, interpret: bool = False,
                         rtol: float = 1e-12,
                         fallback: bool = True) -> tuple[Array, Array]:
    """Solve A[i] x = b[i] for a batch. A: (B, N, N); b: (B, N).

    Returns (x: (B, N), valid: (B,) bool) in the input dtype. f32 inputs run
    the raw x-solve kernel. f64 inputs with ``refine`` > 0 run the INVERSE
    kernel once (O(N^3)) and then do the initial solve plus every
    refinement round as O(N^2) matvecs against the produced inverse — the
    elimination is never repeated. Refined solves are residual-guarded:
    systems whose final relative residual exceeds ``rtol`` are re-solved on
    the f64 gj path (``fallback=True``) or flagged invalid
    (``fallback=False``).
    """
    in_dtype = A.dtype
    A32 = A.astype(jnp.float32)
    if in_dtype == jnp.float32 or refine <= 0:
        # refine=0 with f64 inputs: caller accepts raw-kernel f32 accuracy
        x32, valid = _solve_real_f32(A32, b.astype(jnp.float32), eps,
                                     interpret)
        return x32.astype(in_dtype), valid
    if A.shape[-1] > _INV_KERNEL_MAX_N:
        # the inverse kernel's four matrix blocks exceed scoped VMEM at
        # large N; re-eliminate per refinement round with the (narrower)
        # x-solve kernel instead — still far ahead of the pure-f64 path
        x32, valid = _solve_real_f32(A32, b.astype(jnp.float32), eps,
                                     interpret)
        x = x32.astype(in_dtype)

        def apply_inv(r: Array) -> Array:
            dx, _ = _solve_real_f32(A32, r.astype(jnp.float32), eps,
                                    interpret)
            return dx.astype(in_dtype)
    else:
        M, colidx, valid = _inverse_real_f32(A32, eps, interpret)
        unperm = _unperm_onehot(colidx, A.shape[-1])

        def apply_inv(r: Array) -> Array:
            y = jnp.einsum("bij,bj->bi", M, r.astype(jnp.float32))
            return jnp.einsum("brk,br->bk", unperm, y).astype(in_dtype)

        x = apply_inv(b)
    for _ in range(refine):
        # multiply+reduce, not einsum: f64 dots cannot lower to the MXU
        r = b - jnp.sum(A * x[:, None, :], axis=-1)
        x = x + apply_inv(r)
    # residual guard: catch refinement divergence (cond(A) >~ 1e7)
    r = b - jnp.sum(A * x[:, None, :], axis=-1)
    rel = _rel_residual(
        jnp.max(jnp.abs(r), axis=-1),
        jnp.max(jnp.abs(A), axis=(-2, -1)),
        jnp.max(jnp.abs(x), axis=-1),
        jnp.max(jnp.abs(b), axis=-1),
    )
    bad = valid & (~jnp.isfinite(rel) | (rel > rtol))
    if fallback:
        from .linsolve import gj_solve

        def resolve_f64(_: None) -> tuple:
            x64, v64 = jax.vmap(gj_solve, in_axes=(0, 0, None))(A, b, eps)
            return (jnp.where(bad[:, None], x64, x),
                    jnp.where(bad, v64, valid))

        x, valid = jax.lax.cond(
            jnp.any(bad), resolve_f64, lambda _: (x, valid), None
        )
    else:
        valid = valid & ~bad
    return x, valid


def _solve_complex_f32_batchlast(
        abr: Array, abi: Array, eps: float,
        interpret: bool) -> tuple[Array, Array, Array]:
    """Kernel dispatch on ALREADY batch-last augmented planes.

    abr/abi: (N, N+1, M) f32. Returns batch-last (xr, xi: (N, M),
    valid: (M,)) — no relayout on either side, which is the whole point:
    callers that assemble lane-major (analysis/ac._assemble_grid_batchlast)
    feed the kernel and read the probed row without a single transpose."""
    n = abr.shape[0]
    dtype = abr.dtype
    tile = _tile_b(n, dtype.itemsize, 4)
    abr, b_orig = _pad_batch(abr, tile)
    abi, _ = _pad_batch(abi, tile)
    bp = abr.shape[-1]

    kernel = functools.partial(_gj_complex_kernel, n=n, eps=eps)
    xr, xi, valid = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((n, n + 1, tile), lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n + 1, tile), lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((1, bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, n + 1, tile), dtype),
                        pltpu.VMEM((n, n + 1, tile), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(n)),  # see _vmem_limit
        interpret=interpret,
    )(abr, abi)
    return xr[:, :b_orig], xi[:, :b_orig], valid[0, :b_orig] > 0


def _solve_complex_f32(Ar: Array, Ai: Array, br: Array, bi: Array,
                       eps: float,
                       interpret: bool) -> tuple[Array, Array, Array]:
    """Raw f32 complex-planes kernel dispatch. Ar/Ai: (B, N, N)."""
    abr = jnp.moveaxis(jnp.concatenate([Ar, br[:, :, None]], axis=2), 0, -1)
    abi = jnp.moveaxis(jnp.concatenate([Ai, bi[:, :, None]], axis=2), 0, -1)
    xr, xi, valid = _solve_complex_f32_batchlast(abr, abi, eps, interpret)
    return jnp.moveaxis(xr, -1, 0), jnp.moveaxis(xi, -1, 0), valid


@functools.partial(
    jax.jit,
    static_argnames=("eps", "refine", "interpret", "rtol", "fallback"),
)
def pallas_gj_solve_complex(
        Ar: Array, Ai: Array, br: Array, bi: Array, eps: float = EPS,
        refine: int = 2, interpret: bool = False, rtol: float = 1e-12,
        fallback: bool = True) -> tuple[Array, Array, Array]:
    """Solve (Ar + j Ai) x = (br + j bi) batched on (re, im) planes.

    Ar/Ai: (B, N, N); br/bi: (B, N). Returns (xr, xi, valid) in the input
    dtype. f32 inputs run the raw x-solve kernel; f64 inputs with
    ``refine`` > 0 run the complex INVERSE kernel once and do the initial
    solve plus every refinement round as O(N^2) matvecs (see
    ``pallas_gj_solve_real``). Refined solves are residual-guarded:
    diverged systems are re-solved on the f64 2N-real-block path
    (``fallback=True``) or flagged invalid (``fallback=False``).
    """
    in_dtype = Ar.dtype
    f32 = jnp.float32
    Ar32, Ai32 = Ar.astype(f32), Ai.astype(f32)
    if in_dtype == jnp.float32 or refine <= 0:
        xr32, xi32, valid = _solve_complex_f32(
            Ar32, Ai32, br.astype(f32), bi.astype(f32), eps, interpret
        )
        return xr32.astype(in_dtype), xi32.astype(in_dtype), valid

    if Ar.shape[-1] > _INV_KERNEL_MAX_N:
        # see pallas_gj_solve_real: VMEM-infeasible inverse at large N —
        # re-eliminate per refinement round with the x-solve kernel
        xr0, xi0, valid = _solve_complex_f32(
            Ar32, Ai32, br.astype(f32), bi.astype(f32), eps, interpret)

        def apply_inv(rr: Array, ri: Array) -> tuple[Array, Array]:
            dxr, dxi, _ = _solve_complex_f32(
                Ar32, Ai32, rr.astype(f32), ri.astype(f32), eps, interpret)
            return dxr.astype(in_dtype), dxi.astype(in_dtype)
    else:
        xr0 = xi0 = None
        Mr, Mi, colidx, valid = _inverse_complex_f32(Ar32, Ai32, eps,
                                                     interpret)
        unperm = _unperm_onehot(colidx, Ar.shape[-1])

        def apply_inv(rr: Array, ri: Array) -> tuple[Array, Array]:
            rr32, ri32 = rr.astype(f32), ri.astype(f32)
            yr = (jnp.einsum("bij,bj->bi", Mr, rr32)
                  - jnp.einsum("bij,bj->bi", Mi, ri32))
            yi = (jnp.einsum("bij,bj->bi", Mi, rr32)
                  + jnp.einsum("bij,bj->bi", Mr, ri32))
            return (jnp.einsum("brk,br->bk", unperm, yr).astype(in_dtype),
                    jnp.einsum("brk,br->bk", unperm, yi).astype(in_dtype))

    # multiply+reduce (f64 dots cannot lower to the MXU)
    mv = lambda M, v: jnp.sum(M * v[:, None, :], axis=-1)

    def residual(xr: Array, xi: Array) -> tuple[Array, Array]:
        ax_r = mv(Ar, xr) - mv(Ai, xi)
        ax_i = mv(Ar, xi) + mv(Ai, xr)
        return br - ax_r, bi - ax_i

    if xr0 is not None:
        xr, xi = xr0.astype(in_dtype), xi0.astype(in_dtype)
    else:
        xr, xi = apply_inv(br, bi)
    for _ in range(refine):
        rr, ri = residual(xr, xi)
        dxr, dxi = apply_inv(rr, ri)
        xr = xr + dxr
        xi = xi + dxi
    # residual guard (inf-norms over max(|re|, |im|) — within 2x of the
    # true complex magnitudes, ample for a divergence test)
    rr, ri = residual(xr, xi)
    amax = lambda p, q, ax: jnp.maximum(
        jnp.max(jnp.abs(p), axis=ax), jnp.max(jnp.abs(q), axis=ax)
    )
    rel = _rel_residual(
        amax(rr, ri, -1), amax(Ar, Ai, (-2, -1)),
        amax(xr, xi, -1), amax(br, bi, -1),
    )
    bad = valid & (~jnp.isfinite(rel) | (rel > rtol))
    if fallback:
        from .linsolve import solve_complex_blocks

        def resolve_f64(_: None) -> tuple:
            xr64, xi64, v64 = solve_complex_blocks(
                Ar, Ai, br, bi, method="gj", eps=eps
            )
            return (jnp.where(bad[:, None], xr64, xr),
                    jnp.where(bad[:, None], xi64, xi),
                    jnp.where(bad, v64, valid))

        xr, xi, valid = jax.lax.cond(
            jnp.any(bad), resolve_f64, lambda _: (xr, xi, valid), None
        )
    else:
        valid = valid & ~bad
    return xr, xi, valid
