"""Dense linear solves for tiny MNA systems, batch-first.

The reference solves each system with scalar Gaussian elimination + partial
pivoting (/root/reference/lib/math/solveReal.ts:3-74, solveComplex.ts:4-74),
throwing on |pivot| < EPS. The TPU formulation must (a) avoid data-dependent
control flow and (b) vectorize across a huge batch axis (frequencies /
Monte-Carlo variants) rather than inside one tiny matrix.

``gj_solve`` implements Gauss-Jordan elimination with *one-hot partial
pivoting*: the pivot row is selected per step with an argmax over unused rows
and extracted/applied via one-hot masks — no gathers, no row swaps, no
data-dependent shapes. Every operation is an elementwise op or a reduction,
so ``vmap`` turns it into pure VPU work over the batch axis. Singularity is
reported as a per-system ``valid`` flag instead of a host exception (batched
code can't throw; callers surface errors at the host boundary).

``solve`` picks between this and ``jnp.linalg.solve`` (LAPACK/XLA LU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

from ..constants import EPS


def gj_solve(A: Array, b: Array,
             eps: float = EPS) -> tuple[Array, Array]:
    """Solve A x = b via one-hot-pivoted Gauss-Jordan.

    A: (N, N) real or complex; b: (N,). Returns (x, valid).
    vmap over leading axes for batching.
    """
    N = A.shape[-1]
    dtype = jnp.result_type(A.dtype, b.dtype)
    Ab = jnp.concatenate(
        [A.astype(dtype), b.astype(dtype)[..., None]], axis=-1
    )  # (N, N+1)
    used = jnp.zeros((N,), jnp.bool_)
    # perm[k] = pivot row chosen for column k. A permutation VECTOR plus
    # one final gather replaces the former one-hot permutation MATRIX,
    # whose N^2-per-step accumulation was ~1/3 of the whole elimination's
    # work (measured 1.5x end-to-end at N=64 f64 on TPU; identical
    # residuals — the elimination math is unchanged).
    perm = jnp.zeros((N,), jnp.int32)
    valid = jnp.asarray(True)
    rows = jnp.arange(N)

    def body(k: Array, state: tuple) -> tuple:
        Ab, used, perm, valid = state
        col = lax.dynamic_slice_in_dim(Ab, k, 1, axis=1)[:, 0]  # (N,)
        mag = jnp.abs(col)
        score = jnp.where(used, -jnp.ones_like(mag), mag)
        p = jnp.argmax(score)
        onehot = rows == p  # (N,) bool
        pivot_val = jnp.sum(jnp.where(onehot, col, jnp.zeros_like(col)))
        ok = jnp.abs(pivot_val) >= eps
        valid = jnp.logical_and(valid, ok)
        safe_pv = jnp.where(ok, pivot_val, jnp.asarray(1, dtype))
        # extract the pivot row with a masked reduction (no gather)
        pivot_row = (
            jnp.sum(jnp.where(onehot[:, None], Ab, jnp.zeros_like(Ab)), axis=0)
            / safe_pv
        )  # (N+1,)
        # pivot_row is already normalized by the pivot, so eliminating row r
        # subtracts col[r] * (Ab[p]/pv) — the standard col[r]/pv * Ab[p].
        factor = jnp.where(onehot, jnp.zeros_like(col), col)
        Ab = Ab - factor[:, None] * pivot_row[None, :]
        Ab = jnp.where(onehot[:, None], pivot_row[None, :], Ab)
        used = jnp.logical_or(used, onehot)
        perm = lax.dynamic_update_index_in_dim(
            perm, p.astype(jnp.int32), k, 0)
        return Ab, used, perm, valid

    Ab, used, perm, valid = lax.fori_loop(0, N, body, (Ab, used, perm, valid))
    # After full elimination pivot row perm[k] carries x[k] in its RHS
    # entry. Un-permute with ONE one-hot masked reduce built outside the
    # loop (x[k] = sum_r [perm[k]==r] * rhs[r]): a vmapped gather here is
    # slow on TPU at tiny N, and the former per-step one-hot matrix was
    # ~1/3 of the whole elimination's work at N=64.
    x = jnp.sum(jnp.where(perm[:, None] == rows[None, :],
                          Ab[:, N][None, :], jnp.zeros((), dtype)), axis=1)
    return x, valid


def gj_solve_multi(A: Array, B: Array,
                   eps: float = EPS) -> tuple[Array, Array]:
    """Multi-RHS one-hot-pivoted Gauss-Jordan: A X = B.

    A: (N, N); B: (N, M). Returns (X: (N, M), valid). Identical pivoting
    and elimination to ``gj_solve`` — the augmented block is simply M
    columns wide, so the Schur tier's per-block solves (solution vector
    plus the full border) cost one elimination, not M. vmap over leading
    axes for batching.
    """
    N = A.shape[-1]
    M = B.shape[-1]
    dtype = jnp.result_type(A.dtype, B.dtype)
    Ab = jnp.concatenate([A.astype(dtype), B.astype(dtype)], axis=-1)
    used = jnp.zeros((N,), jnp.bool_)
    perm = jnp.zeros((N,), jnp.int32)
    valid = jnp.asarray(True)
    rows = jnp.arange(N)

    def body(k: Array, state: tuple) -> tuple:
        Ab, used, perm, valid = state
        col = lax.dynamic_slice_in_dim(Ab, k, 1, axis=1)[:, 0]
        mag = jnp.abs(col)
        score = jnp.where(used, -jnp.ones_like(mag), mag)
        p = jnp.argmax(score)
        onehot = rows == p
        pivot_val = jnp.sum(jnp.where(onehot, col, jnp.zeros_like(col)))
        ok = jnp.abs(pivot_val) >= eps
        valid = jnp.logical_and(valid, ok)
        safe_pv = jnp.where(ok, pivot_val, jnp.asarray(1, dtype))
        pivot_row = (
            jnp.sum(jnp.where(onehot[:, None], Ab, jnp.zeros_like(Ab)),
                    axis=0) / safe_pv
        )
        factor = jnp.where(onehot, jnp.zeros_like(col), col)
        Ab = Ab - factor[:, None] * pivot_row[None, :]
        Ab = jnp.where(onehot[:, None], pivot_row[None, :], Ab)
        used = jnp.logical_or(used, onehot)
        perm = lax.dynamic_update_index_in_dim(
            perm, p.astype(jnp.int32), k, 0)
        return Ab, used, perm, valid

    Ab, used, perm, valid = lax.fori_loop(0, N, body, (Ab, used, perm, valid))
    unperm = (perm[:, None] == rows[None, :]).astype(dtype)  # (N, N)
    X = unperm @ Ab[:, N:]
    return X, valid


def gj_solve_planes_multi(A_re: Array, A_im: Array, B_re: Array,
                          B_im: Array, eps: float = EPS
                          ) -> tuple[Array, Array, Array]:
    """Multi-RHS complex Gauss-Jordan on (re, im) planes: A X = B.

    A_*: (N, N); B_*: (N, M). Returns (X_re, X_im, valid). Same
    |pivot|^2 pivoting as ``gj_solve_planes`` with an M-column augmented
    block; vmap over leading axes for batching.
    """
    N = A_re.shape[-1]
    dtype = jnp.result_type(A_re.dtype, B_re.dtype)
    Ar = jnp.concatenate([A_re.astype(dtype), B_re.astype(dtype)], axis=-1)
    Ai = jnp.concatenate([A_im.astype(dtype), B_im.astype(dtype)], axis=-1)
    used = jnp.zeros((N,), jnp.bool_)
    perm = jnp.zeros((N,), jnp.int32)
    valid = jnp.asarray(True)
    rows = jnp.arange(N)
    eps2 = eps * eps

    def body(k: Array, state: tuple) -> tuple:
        Ar, Ai, used, perm, valid = state
        cr = lax.dynamic_slice_in_dim(Ar, k, 1, axis=1)[:, 0]
        ci = lax.dynamic_slice_in_dim(Ai, k, 1, axis=1)[:, 0]
        mag2 = cr * cr + ci * ci
        score = jnp.where(used, -jnp.ones_like(mag2), mag2)
        p = jnp.argmax(score)
        onehot = rows == p
        pvr = jnp.sum(jnp.where(onehot, cr, 0.0))
        pvi = jnp.sum(jnp.where(onehot, ci, 0.0))
        d = pvr * pvr + pvi * pvi
        ok = d >= eps2
        valid = jnp.logical_and(valid, ok)
        inv_d = 1.0 / jnp.where(ok, d, 1.0)
        prr = jnp.sum(jnp.where(onehot[:, None], Ar, 0.0), axis=0)
        pri = jnp.sum(jnp.where(onehot[:, None], Ai, 0.0), axis=0)
        prow_r = (prr * pvr + pri * pvi) * inv_d
        prow_i = (pri * pvr - prr * pvi) * inv_d
        fr = jnp.where(onehot, 0.0, cr)
        fi = jnp.where(onehot, 0.0, ci)
        Ar = Ar - (fr[:, None] * prow_r[None, :]
                   - fi[:, None] * prow_i[None, :])
        Ai = Ai - (fr[:, None] * prow_i[None, :]
                   + fi[:, None] * prow_r[None, :])
        Ar = jnp.where(onehot[:, None], prow_r[None, :], Ar)
        Ai = jnp.where(onehot[:, None], prow_i[None, :], Ai)
        used = jnp.logical_or(used, onehot)
        perm = lax.dynamic_update_index_in_dim(
            perm, p.astype(jnp.int32), k, 0)
        return Ar, Ai, used, perm, valid

    Ar, Ai, used, perm, valid = lax.fori_loop(
        0, N, body, (Ar, Ai, used, perm, valid))
    unperm = (perm[:, None] == rows[None, :]).astype(dtype)
    X_re = unperm @ Ar[:, N:]
    X_im = unperm @ Ai[:, N:]
    return X_re, X_im, valid


def solve(A: Array, b: Array, method: str = "gj", eps: float = EPS,
          interpret: bool = False,
          plan: dict | None = None) -> tuple[Array, Array]:
    """Batched solve. A: (..., N, N); b: (..., N). Returns (x, valid).

    ``plan``: SchurPlan.arrays() dict — routes through the structured
    bordered-block-diagonal tier (ops/schur.py), which gathers diagonal
    blocks + borders out of the dense-assembled system; callers fall back
    to a dense re-solve when the returned valid flag is False."""
    if plan is not None:
        from .schur import schur_solve

        def fn(Ai: Array, bi: Array) -> tuple[Array, Array]:
            return schur_solve(Ai, bi, plan["blk_ix"], plan["blk_mask"],
                               plan["if_ix"], eps)

        for _ in range(A.ndim - 2):
            fn = jax.vmap(fn)
        return fn(A, b)
    if method == "lax":
        x = jnp.linalg.solve(A, b[..., None])[..., 0]
        valid = jnp.all(
            jnp.isfinite(x.real) & jnp.isfinite(x.imag), axis=-1
        )
        return x, valid
    if method == "pallas":
        from .pallas_gj import pallas_gj_solve_real

        lead = A.shape[:-2]
        n = A.shape[-1]
        x, valid = pallas_gj_solve_real(
            A.reshape((-1, n, n)), b.reshape((-1, n)),
            eps=eps, refine=0 if A.dtype == jnp.float32 else 2,
            interpret=interpret,
        )
        return x.reshape(lead + (n,)), valid.reshape(lead)
    fn = gj_solve
    batch_dims = A.ndim - 2
    for _ in range(batch_dims):
        fn = jax.vmap(fn, in_axes=(0, 0, None))
    return fn(A, b, eps)


def gj_solve_planes(A_re: Array, A_im: Array, b_re: Array, b_im: Array,
                    eps: float = EPS) -> tuple[Array, Array, Array]:
    """Complex Gauss-Jordan directly on (re, im) planes, one system.

    Pivots by |pivot|^2 — the reference's complex-magnitude partial
    pivoting (solveComplex.ts:24), which the 2N real-block embedding does
    NOT reproduce (the block system pivots on individual re/im entries).
    At ~(1/4) the flops of the (2N)^3 block elimination this is also the
    faster f64 fidelity path once N is beyond trivial. One-hot pivot
    selection as in ``gj_solve``; vmap over leading axes for batching.
    """
    N = A_re.shape[-1]
    dtype = jnp.result_type(A_re.dtype, b_re.dtype)
    Ar = jnp.concatenate(
        [A_re.astype(dtype), b_re.astype(dtype)[..., None]], axis=-1)
    Ai = jnp.concatenate(
        [A_im.astype(dtype), b_im.astype(dtype)[..., None]], axis=-1)
    used = jnp.zeros((N,), jnp.bool_)
    perm = jnp.zeros((N,), jnp.int32)  # see gj_solve: vector, not one-hot
    valid = jnp.asarray(True)
    rows = jnp.arange(N)
    eps2 = eps * eps

    def body(k: Array, state: tuple) -> tuple:
        Ar, Ai, used, perm, valid = state
        cr = lax.dynamic_slice_in_dim(Ar, k, 1, axis=1)[:, 0]
        ci = lax.dynamic_slice_in_dim(Ai, k, 1, axis=1)[:, 0]
        mag2 = cr * cr + ci * ci
        score = jnp.where(used, -jnp.ones_like(mag2), mag2)
        p = jnp.argmax(score)
        onehot = rows == p
        pvr = jnp.sum(jnp.where(onehot, cr, 0.0))
        pvi = jnp.sum(jnp.where(onehot, ci, 0.0))
        d = pvr * pvr + pvi * pvi
        ok = d >= eps2  # |pivot| >= eps, the reference threshold
        valid = jnp.logical_and(valid, ok)
        inv_d = 1.0 / jnp.where(ok, d, 1.0)
        prr = jnp.sum(jnp.where(onehot[:, None], Ar, 0.0), axis=0)
        pri = jnp.sum(jnp.where(onehot[:, None], Ai, 0.0), axis=0)
        # pivot_row / pivot (complex divide)
        prow_r = (prr * pvr + pri * pvi) * inv_d
        prow_i = (pri * pvr - prr * pvi) * inv_d
        fr = jnp.where(onehot, 0.0, cr)
        fi = jnp.where(onehot, 0.0, ci)
        Ar = Ar - (fr[:, None] * prow_r[None, :]
                   - fi[:, None] * prow_i[None, :])
        Ai = Ai - (fr[:, None] * prow_i[None, :]
                   + fi[:, None] * prow_r[None, :])
        Ar = jnp.where(onehot[:, None], prow_r[None, :], Ar)
        Ai = jnp.where(onehot[:, None], prow_i[None, :], Ai)
        used = jnp.logical_or(used, onehot)
        perm = lax.dynamic_update_index_in_dim(
            perm, p.astype(jnp.int32), k, 0)
        return Ar, Ai, used, perm, valid

    Ar, Ai, used, perm, valid = lax.fori_loop(
        0, N, body, (Ar, Ai, used, perm, valid))
    # one-hot un-permute outside the loop (see gj_solve — no gathers)
    unperm = perm[:, None] == rows[None, :]
    zero = jnp.zeros((), dtype)
    x_re = jnp.sum(jnp.where(unperm, Ar[:, N][None, :], zero), axis=1)
    x_im = jnp.sum(jnp.where(unperm, Ai[:, N][None, :], zero), axis=1)
    return x_re, x_im, valid


def solve_planes(A_re: Array, A_im: Array, b_re: Array, b_im: Array,
                 method: str = "gj", eps: float = EPS,
                 interpret: bool = False,
                 plan: dict | None = None) -> tuple[Array, Array, Array]:
    """Complex solve on (re, im) planes with method dispatch.

    method:
      - "gj" (default): complex Gauss-Jordan on the planes with
        |pivot|-magnitude pivoting (``gj_solve_planes``) — the reference's
        complex solver semantics at ~1/4 the flops of the block embedding;
      - "lax" / "gj2n": 2N real block embedding (``solve_complex_blocks``);
      - "pallas": batch-major Pallas kernel on the planes directly (fast
        tier; f32 inputs run the raw kernel, f64 inputs get mixed-precision
        refinement). Leading batch dims are flattened for the kernel.
    ``plan``: SchurPlan.arrays() — structured BBD tier (see ``solve``).
    Shapes: A_*: (..., N, N); b_*: (..., N). Returns (x_re, x_im, valid).
    """
    if plan is not None:
        from .schur import schur_solve_planes

        def pfn(ar: Array, ai: Array, br: Array,
                bi: Array) -> tuple[Array, Array, Array]:
            return schur_solve_planes(ar, ai, br, bi, plan["blk_ix"],
                                      plan["blk_mask"], plan["if_ix"], eps)

        for _ in range(A_re.ndim - 2):
            pfn = jax.vmap(pfn)
        return pfn(A_re, A_im, b_re, b_im)
    if method == "gj":
        fn = gj_solve_planes
        batch_dims = A_re.ndim - 2
        for _ in range(batch_dims):
            fn = jax.vmap(fn, in_axes=(0, 0, 0, 0, None))
        return fn(A_re, A_im, b_re, b_im, eps)
    if method != "pallas":
        return solve_complex_blocks(A_re, A_im, b_re, b_im, method=method,
                                    eps=eps)
    from .pallas_gj import pallas_gj_solve_complex

    lead = A_re.shape[:-2]
    n = A_re.shape[-1]
    flat_m = lambda a: a.reshape((-1, n, n))
    flat_v = lambda a: a.reshape((-1, n))
    refine = 0 if A_re.dtype == jnp.float32 else 2
    xr, xi, valid = pallas_gj_solve_complex(
        flat_m(A_re), flat_m(A_im), flat_v(b_re), flat_v(b_im),
        eps=eps, refine=refine, interpret=interpret,
    )
    return (xr.reshape(lead + (n,)), xi.reshape(lead + (n,)),
            valid.reshape(lead))


def solve_complex_blocks(A_re: Array, A_im: Array, b_re: Array,
                         b_im: Array, method: str = "gj",
                         eps: float = EPS) -> tuple[Array, Array, Array]:
    """Solve (A_re + j*A_im) x = (b_re + j*b_im) without complex dtypes.

    TPU hardware has no complex support (C128 rejected by XLA:TPU), so the
    complex MNA system is solved as the equivalent 2N real block system
        [[A_re, -A_im], [A_im, A_re]] [x_re; x_im] = [b_re; b_im].
    Shapes: A_*: (..., N, N); b_*: (..., N). Returns (x_re, x_im, valid).
    """
    top = jnp.concatenate([A_re, -A_im], axis=-1)
    bot = jnp.concatenate([A_im, A_re], axis=-1)
    K = jnp.concatenate([top, bot], axis=-2)  # (..., 2N, 2N)
    rhs = jnp.concatenate([b_re, b_im], axis=-1)
    x, valid = solve(K, rhs, method=method, eps=eps)
    N = A_re.shape[-1]
    return x[..., :N], x[..., N:], valid
