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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS

_LANE = 128


def _tile_b(n: int, dtype_bytes: int, n_bufs: int) -> int:
    """Pick a lane-aligned batch tile that keeps VMEM usage ~<= 4 MB."""
    budget = 4 * 1024 * 1024
    per_lane = n * (n + 2) * dtype_bytes * n_bufs + 8 * dtype_bytes
    tile = budget // (per_lane * _LANE) * _LANE
    return int(max(_LANE, min(2048, tile)))


def _first_match_onehot(score, rows_iota, n):
    """Per-lane argmax over axis 0 as a one-hot, ties to the lowest row."""
    m = jnp.max(score, axis=0, keepdims=True)
    cand = score == m
    ridx = jnp.min(jnp.where(cand, rows_iota, n), axis=0, keepdims=True)
    return rows_iota == ridx


def _gj_real_kernel(ab_ref, x_ref, valid_ref, *, n: int, eps: float):
    """One grid cell: solve TILE_B real systems laid out (N, N+1, TILE_B)."""
    ab = ab_ref[:]  # (N, N+1, TB)
    tb = ab.shape[-1]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0)
    used = jnp.zeros((n, tb), dtype=ab.dtype)
    valid = jnp.ones((1, tb), dtype=ab.dtype)
    pivots = []  # per-column one-hot masks, consumed in the extraction pass

    for k in range(n):
        col = ab[:, k, :]  # (N, TB)
        score = jnp.where(used > 0, -1.0, jnp.abs(col))
        onehot = _first_match_onehot(score, rows2, n)  # (N, TB) bool
        pv = jnp.sum(jnp.where(onehot, col, 0.0), axis=0, keepdims=True)
        ok = jnp.abs(pv) >= eps
        valid = valid * jnp.where(ok, 1.0, 0.0)
        inv_pv = 1.0 / jnp.where(ok, pv, 1.0)  # (1, TB)
        prow = (
            jnp.sum(jnp.where(onehot[:, None, :], ab, 0.0), axis=0)
            * inv_pv
        )  # (N+1, TB)
        factor = jnp.where(onehot, 0.0, col)  # (N, TB)
        ab = ab - factor[:, None, :] * prow[None, :, :]
        ab = jnp.where(onehot[:, None, :], prow[None, :, :], ab)
        used = used + onehot.astype(ab.dtype)
        pivots.append(onehot)

    rhs = ab[:, n, :]  # (N, TB) final RHS column
    x = jnp.stack(
        [jnp.sum(jnp.where(pivots[k], rhs, 0.0), axis=0) for k in range(n)],
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
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0)
    used = jnp.zeros((n, tb), dtype=ar.dtype)
    valid = jnp.ones((1, tb), dtype=ar.dtype)
    eps2 = eps * eps
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
        valid = valid * jnp.where(ok, 1.0, 0.0)
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
        used = used + onehot.astype(ar.dtype)
        pivots.append(onehot)

    rr = ar[:, n, :]
    ri = ai[:, n, :]
    xr = jnp.stack(
        [jnp.sum(jnp.where(pivots[k], rr, 0.0), axis=0) for k in range(n)], 0
    )
    xi = jnp.stack(
        [jnp.sum(jnp.where(pivots[k], ri, 0.0), axis=0) for k in range(n)], 0
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


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def pallas_gj_solve_real(A, b, eps: float = EPS, interpret: bool = False):
    """Solve A[i] x = b[i] for a batch. A: (B, N, N); b: (B, N).

    Returns (x: (B, N), valid: (B,) bool). Dispatches to the batch-major
    Pallas kernel; identity-padded to a lane-aligned batch tile.
    """
    B, n, _ = A.shape
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
            pl.BlockSpec((n, n + 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
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


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def pallas_gj_solve_complex(Ar, Ai, br, bi, eps: float = EPS,
                            interpret: bool = False):
    """Solve (Ar + j Ai) x = (br + j bi) batched on (re, im) planes.

    Ar/Ai: (B, N, N); br/bi: (B, N). Returns (xr, xi, valid)."""
    B, n, _ = Ar.shape
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
            pl.BlockSpec((n, n + 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n + 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
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
