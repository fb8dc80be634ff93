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
This converges to ~f64 accuracy when cond(A) << 1/eps_f32 (~1e7) — fine for
typical RC/RLC sweeps; circuits with extreme conductance spreads (e.g.
Roff = 1e12 switches) should use the default f64 XLA path (method="gj").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS

_LANE = 128


def _z():
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


def _first_match_onehot(score, rows_f, n):
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


def _gj_real_kernel(ab_ref, x_ref, valid_ref, *, n: int, eps: float):
    """One grid cell: solve TILE_B real systems laid out (N, N+1, TILE_B)."""
    ab = ab_ref[:]  # (N, N+1, TB)
    tb = ab.shape[-1]
    dtype = ab.dtype
    # tpu.iota must be integer-typed; convert to float for the reductions
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0).astype(dtype)
    used = jnp.zeros((n, tb), dtype=dtype)
    valid = jnp.ones((1, tb), dtype=dtype)
    # explicit typed constants: under x64, literals in scalar-scalar
    # jnp.where become weak f64, which Mosaic cannot lower
    eps_t = jnp.asarray(eps, dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    pivots = []  # per-column one-hot masks, consumed in the extraction pass

    for k in range(n):
        col = ab[:, k, :]  # (N, TB)
        score = jnp.where(used > 0, -1.0, jnp.abs(col))
        onehot = _first_match_onehot(score, rows2, n)  # (N, TB) bool
        pv = jnp.sum(jnp.where(onehot, col, 0.0), axis=0, keepdims=True)
        ok = jnp.abs(pv) >= eps_t
        valid = valid * jnp.where(ok, one, zero)
        inv_pv = 1.0 / jnp.where(ok, pv, 1.0)  # (1, TB)
        prow = (
            jnp.sum(jnp.where(onehot[:, None, :], ab, 0.0), axis=0)
            * inv_pv
        )  # (N+1, TB)
        factor = jnp.where(onehot, 0.0, col)  # (N, TB)
        ab = ab - factor[:, None, :] * prow[None, :, :]
        ab = jnp.where(onehot[:, None, :], prow[None, :, :], ab)
        # no bool->float astype: Mosaic cannot lower that convert
        used = used + jnp.where(onehot, one, zero)
        pivots.append(onehot)

    rhs = ab[:, n, :]  # (N, TB) final RHS column
    # keep all intermediates >= 2D: Mosaic rejects 1D vectors
    x = jnp.concatenate(
        [jnp.sum(jnp.where(pivots[k], rhs, 0.0), axis=0, keepdims=True)
         for k in range(n)],
        axis=0,
    )  # (N, TB)
    x_ref[:] = x
    valid_ref[:] = valid


def _gj_complex_kernel(abr_ref, abi_ref, xr_ref, xi_ref, valid_ref,
                       *, n: int, eps: float):
    """Complex GJ on (re, im) planes with |pivot|^2 pivoting."""
    ar = abr_ref[:]
    ai = abi_ref[:]
    tb = ar.shape[-1]
    dtype = ar.dtype
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0).astype(dtype)
    used = jnp.zeros((n, tb), dtype=dtype)
    valid = jnp.ones((1, tb), dtype=dtype)
    eps2 = jnp.asarray(eps * eps, dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    pivots = []

    for k in range(n):
        cr = ar[:, k, :]
        ci = ai[:, k, :]
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
        ar = jnp.where(onehot[:, None, :], prow_r[None, :, :], ar)
        ai = jnp.where(onehot[:, None, :], prow_i[None, :, :], ai)
        used = used + jnp.where(onehot, one, zero)
        pivots.append(onehot)

    rr = ar[:, n, :]
    ri = ai[:, n, :]
    xr = jnp.concatenate(
        [jnp.sum(jnp.where(pivots[k], rr, 0.0), axis=0, keepdims=True)
         for k in range(n)], axis=0,
    )
    xi = jnp.concatenate(
        [jnp.sum(jnp.where(pivots[k], ri, 0.0), axis=0, keepdims=True)
         for k in range(n)], axis=0,
    )
    xr_ref[:] = xr
    xi_ref[:] = xi
    valid_ref[:] = valid


def _pad_batch(arr, tile):
    b = arr.shape[-1]
    pad = (-b) % tile
    if pad:
        arr = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, pad)])
    return arr, b


def _solve_real_f32(A, b, eps: float, interpret: bool):
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
        interpret=interpret,
    )(ab)
    x = jnp.moveaxis(x[:, :b_orig], -1, 0)  # (B, N)
    valid = valid[0, :b_orig] > 0
    return x, valid


@functools.partial(jax.jit, static_argnames=("eps", "refine", "interpret"))
def pallas_gj_solve_real(A, b, eps: float = EPS, refine: int = 2,
                         interpret: bool = False):
    """Solve A[i] x = b[i] for a batch. A: (B, N, N); b: (B, N).

    Returns (x: (B, N), valid: (B,) bool) in the input dtype. Elimination
    runs in the f32 Pallas kernel; `refine` rounds of f64 iterative
    refinement recover full precision for reasonably conditioned systems.
    """
    in_dtype = A.dtype
    A32 = A.astype(jnp.float32)
    x32, valid = _solve_real_f32(A32, b.astype(jnp.float32), eps, interpret)
    x = x32.astype(in_dtype)
    if in_dtype != jnp.float32:
        for _ in range(refine):
            # multiply+reduce, not einsum: f64 dots cannot lower to the MXU
            r = b - jnp.sum(A * x[:, None, :], axis=-1)
            dx, _ = _solve_real_f32(A32, r.astype(jnp.float32), eps, interpret)
            x = x + dx.astype(in_dtype)
    return x, valid


def _solve_complex_f32(Ar, Ai, br, bi, eps: float, interpret: bool):
    """Raw f32 complex-planes kernel dispatch."""
    _, n, _ = Ar.shape
    dtype = Ar.dtype
    abr = jnp.moveaxis(jnp.concatenate([Ar, br[:, :, None]], axis=2), 0, -1)
    abi = jnp.moveaxis(jnp.concatenate([Ai, bi[:, :, None]], axis=2), 0, -1)
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
        interpret=interpret,
    )(abr, abi)
    xr = jnp.moveaxis(xr[:, :b_orig], -1, 0)
    xi = jnp.moveaxis(xi[:, :b_orig], -1, 0)
    valid = valid[0, :b_orig] > 0
    return xr, xi, valid


@functools.partial(jax.jit, static_argnames=("eps", "refine", "interpret"))
def pallas_gj_solve_complex(Ar, Ai, br, bi, eps: float = EPS,
                            refine: int = 2, interpret: bool = False):
    """Solve (Ar + j Ai) x = (br + j bi) batched on (re, im) planes.

    Ar/Ai: (B, N, N); br/bi: (B, N). Returns (xr, xi, valid) in the input
    dtype, with f64 iterative refinement around the f32 kernel.
    """
    in_dtype = Ar.dtype
    f32 = jnp.float32
    Ar32, Ai32 = Ar.astype(f32), Ai.astype(f32)
    xr32, xi32, valid = _solve_complex_f32(
        Ar32, Ai32, br.astype(f32), bi.astype(f32), eps, interpret
    )
    xr = xr32.astype(in_dtype)
    xi = xi32.astype(in_dtype)
    if in_dtype != jnp.float32:
        for _ in range(refine):
            # complex residual r = b - A x on (re, im) planes in f64,
            # multiply+reduce (f64 dots cannot lower to the MXU)
            mv = lambda M, v: jnp.sum(M * v[:, None, :], axis=-1)
            ax_r = mv(Ar, xr) - mv(Ai, xi)
            ax_i = mv(Ar, xi) + mv(Ai, xr)
            rr = br - ax_r
            ri = bi - ax_i
            dxr, dxi, _ = _solve_complex_f32(
                Ar32, Ai32, rr.astype(f32), ri.astype(f32), eps, interpret
            )
            xr = xr + dxr.astype(in_dtype)
            xi = xi + dxi.astype(in_dtype)
    return xr, xi, valid
