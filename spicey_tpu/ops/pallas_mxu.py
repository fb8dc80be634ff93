"""Pallas TPU kernel: MXU-blocked Gauss-Jordan solve for mid-size systems.

The batch-last VPU kernel (ops/pallas_gj.py) is optimal for tiny MNA systems
(N <~ 32) where the 128-lane batch axis is everything. At N >= ~48 the
O(N^3) elimination dominates and the VPU (~1.2 TF/s f32 measured on this
v5e) is the wrong engine: Gauss-Jordan trailing updates are rank-P
matmul-shaped work that belongs on the MXU (measured via a VMEM-resident
Pallas dot chain on this chip: 4.1 TF/s at K=32, 7.3 TF/s at K=64,
12 TF/s at K=128 — all at ``Precision.HIGHEST``, i.e. true-f32 bf16x3
passes; DEFAULT bf16 dots at 3e-3 relative error are useless for a
solver). This kernel restructures the same one-hot-pivot Jordan
elimination (semantically identical pivot choices to ops/linsolve.gj_solve
— replacing the reference's scalar row-swap elimination,
/root/reference/lib/math/solveReal.ts:14-53) into panel form:

  - Layout is batch-MAJOR and per-system TRANSPOSED: the augmented system
    lives in VMEM as T[col, row] with matrix columns in the sublane
    dimension and rows in the 128-wide lane dimension. Columns are then
    dynamic *sublane* slices (Mosaic supports those; dynamic lane slices
    don't lower), pivot search is a lane reduction, and a whole Jordan
    step  row_i -= (col_i/pv) * row_p ; row_p /= pv  collapses to ONE
    outer product  T_panel += prow (x) u  via the elementary-matrix form
    E = I + u e_p^T  (u_i = -col_i/pv, u_p = 1/pv - 1).
  - Panels of P columns are factorized on the VPU while accumulating the
    composite transform  M = E_{P-1}...E_0 = I + C S  (C: (N, P) packed
    transposed as Ct, S: the P pivot-row selectors OHt). The recurrence
    C <- C + u_j (x) C[p_j, :]; C[:, j] += u_j  is two (P, 128) VPU ops
    per step.
  - The trailing update for each panel is TWO MXU matmuls over a
    statically-sized shrinking window Tw of not-yet-eliminated columns:
        TP = dot_NT(Tw, OHt)   -- gathers the P pivot rows   (width, P)
        Tw += dot_NN(TP, Ct)   -- applies  C @ (S @ trail)   (width, 128)
    This is where ~(1 - P/N) of the elimination flops run, at the MXU's
    K=P rate instead of the VPU's elementwise rate.
  - Systems whose N is not a multiple of P are padded with identity
    diagonal columns/rows; pad pivots are exact no-ops (pv = 1, u = 0).

Pivot selection per column is the argmax over unused rows of the CURRENT
column — exactly the batch-last kernel's rule — so the two tiers make
identical pivot choices in exact arithmetic; only the f32 summation order
of the trailing updates differs (MXU K-dim accumulation vs sequential
rank-1s). Singularity is a per-system ``valid`` flag, as everywhere in
the engine (batched code cannot throw; solveReal.ts:28 parity at the host
boundary).

Precision: f32 (Mosaic cannot lower f64 stores). All dots use
``Precision.HIGHEST`` so MXU passes are true f32.

MEASURED OUTCOME (v5e, B large enough to amortize dispatch; scalar-sync
timing with per-rep input perturbation): this tier LOSES to the batch-last
VPU kernel at every supported size —

    real    N=64  B=32768:  50k sys/s   vs VPU 720k   (0.07x)
    real    N=96  B=16384:  33k sys/s   vs VPU 286k   (0.12x)
    real    N=128 B=8192:   24k sys/s   vs VPU 125k   (0.19x)
    complex N=64  B=16384:  45k sys/s   vs VPU 286k   (0.16x)
    complex N=128 B=4096:   21k sys/s   vs VPU  45k   (0.47x)

Root cause: with one system per grid cell the panel phase is op-ISSUE
bound — Np sequential fori_loop steps of ~15 tiny (1..P, 128) VPU ops
each — and the per-panel MXU matmuls are only ~0.7 MFLOP apiece, far too
small to amortize grid overhead, while the batch-last kernel keeps all
128 lanes busy with independent systems on every single op. The trend
(0.07x -> 0.47x as N and the flops/system grow) says the crossover where
per-system MXU blocking wins sits well above N=128 — beyond any MNA
system this engine meets (SURVEY.md §2: N ~ 3..128). The module is kept
as a correct, tested negative result and is NOT routed by the dispatch
in ops/pallas_gj.py / ops/linsolve.py; the VPU batch-last layout remains
the production tier. See BASELINE.md (round 4) for the full analysis.
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
_HI = jax.lax.Precision.HIGHEST

# Smallest N the MXU tier accepts; below this the batch-last VPU kernel
# (one lane per system, zero padding waste) is the right engine.
MXU_MIN_N = 40
# Largest N: rows live in the 128-lane dimension.
MXU_MAX_N = 128


def _z() -> Array:
    # i32 zero for BlockSpec index maps (under x64 a literal 0 traces to
    # i64, which Mosaic cannot legalize in index maps)
    return jnp.asarray(0, jnp.int32)


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def blocked_plan(n: int) -> tuple[int, int, int, tuple[int, ...]]:
    """(P, Np, S, widths): panel width, padded N, sublane extent, and the
    per-panel trailing-window widths (cols (k+1)P .. Np inclusive of the
    RHS column at sublane Np, rounded up to the 8-sublane granule)."""
    if not MXU_MIN_N <= n <= MXU_MAX_N:
        raise ValueError(f"MXU tier supports N in [{MXU_MIN_N}, {MXU_MAX_N}], got {n}")
    # P=32 balances the VPU panel cost (linear in P) against the MXU K=P
    # rate; for small/awkward N a 16-panel wastes fewer identity-pad steps
    best = None
    for p in (32, 16):
        np_ = _roundup(n, p)
        widths = tuple(
            _roundup(np_ - (k + 1) * p + 1, 8) for k in range(np_ // p)
        )
        s = max(np_ + 1, max((k + 1) * p + w for k, w in enumerate(widths)))
        s = _roundup(s, 8)
        # cost model: VPU panel slots ~ 4*P*128*Np; MXU padded flops at
        # the measured K-rate (4.1 TF @K=32, 2.2 TF @K=16, VPU 1.17 TF)
        mxu_rate = 4.1e3 if p == 32 else 2.2e3  # GFLOP/s
        vpu = 4.0 * p * _LANE * np_ / 1.17e3
        mxu = sum(4.0 * w * _LANE * p for w in widths) / mxu_rate
        cost = vpu + mxu
        if best is None or cost < best[0]:
            best = (cost, p, np_, s, widths)
    _, p, np_, s, widths = best
    return p, np_, s, widths


def _mxu_gj_real_kernel(a_ref: object, meta_ref: object, t_s: object,
                        ct_s: object, oht_s: object, *, n: int,
                        eps: float) -> None:
    """One grid cell: solve ONE system laid out transposed (S, 128).

    a_ref: (1, S, 128) augmented transposed input (see mxu_solve_real).
    meta_ref: (1, 8, 128) output — sublane 0: final RHS by row (lane),
    sublane 1: colidx (lane r pivoted column colidx[r]), sublane 2: valid.
    """
    p_, np_, s_, widths = blocked_plan(n)
    dtype = a_ref.dtype
    t_s[:] = a_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1).astype(dtype)
    eps_t = jnp.asarray(eps, dtype)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    npf = jnp.asarray(float(np_), dtype)
    # lanes >= Np are dead rows: pre-mark used so an all-zero column picks
    # a real row (pv = 0 -> invalid), matching the batch-last kernel
    used0 = jnp.where(lanes >= npf, one, zero)
    init = (used0, jnp.ones((1, _LANE), dtype),
            jnp.full((1, _LANE), -1.0, dtype))

    def panel_step(k0: int) -> object:
        def body(j: Array, carry: tuple) -> tuple:
            used, valid, colidx = carry
            jj = jnp.asarray(k0, jnp.int32) + j
            colv = t_s[pl.ds(jj, 1), :][0:1, :]          # (1, 128)
            score = jnp.where(used > 0, -one, jnp.abs(colv))
            m = jnp.max(score, axis=1, keepdims=True)
            cand = score == m
            ridx = jnp.min(jnp.where(cand, lanes, jnp.asarray(
                float(_LANE), dtype)), axis=1, keepdims=True)
            oh = lanes == ridx                           # (1, 128) bool
            pv = jnp.sum(jnp.where(oh, colv, zero), axis=1, keepdims=True)
            ok = jnp.abs(pv) >= eps_t
            valid = valid * jnp.where(ok, one, zero)
            ipv = one / jnp.where(ok, pv, one)
            u = jnp.where(oh, ipv - one, -colv * ipv)    # (1, 128)
            # panel block Jordan step: Tp += prow (x) u  (E = I + u e_p^T)
            tp = t_s[pl.ds(k0, p_), :]                   # (P, 128) static
            prow = jnp.sum(jnp.where(oh, tp, zero), axis=1, keepdims=True)
            t_s[pl.ds(k0, p_), :] = tp + prow * u
            # C recurrence (transposed): Ct += Ctpiv (x) u ; Ct[j, :] += u
            ct = ct_s[:]
            ctpiv = jnp.sum(jnp.where(oh, ct, zero), axis=1, keepdims=True)
            ct = ct + ctpiv * u
            ct_s[:] = ct
            cur = ct_s[pl.ds(j, 1), :]
            ct_s[pl.ds(j, 1), :] = cur + u
            oht_s[pl.ds(j, 1), :] = jnp.where(oh, one, zero)
            used = used + jnp.where(oh, one, zero)
            colidx = jnp.where(oh, jj.astype(dtype), colidx)
            return used, valid, colidx

        return body

    carry = init
    for k in range(np_ // p_):
        k0 = k * p_
        ct_s[:] = jnp.zeros((p_, _LANE), dtype)
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(p_), panel_step(k0), carry)
        # trailing update: Tw += (Tw . OHt^T) @ Ct  over the static window
        w0 = (k + 1) * p_
        w = widths[k]
        tw = t_s[pl.ds(w0, w), :]                        # (w, 128)
        tp_m = jax.lax.dot_general(
            tw, oht_s[:], (((1,), (1,)), ((), ())),
            precision=_HI, preferred_element_type=dtype)  # (w, P)
        upd = jax.lax.dot_general(
            tp_m, ct_s[:], (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=dtype)  # (w, 128)
        t_s[pl.ds(w0, w), :] = tw + upd

    used, valid, colidx = carry
    meta_ref[0] = jnp.concatenate(
        [t_s[pl.ds(np_, 1), :],                          # final RHS (by row)
         colidx, valid, jnp.zeros((5, _LANE), dtype)], axis=0)


def _mxu_gj_complex_kernel(ar_ref: object, ai_ref: object, meta_ref: object,
                           tr_s: object, ti_s: object, ctr_s: object,
                           cti_s: object, oht_s: object, *, n: int,
                           eps: float) -> None:
    """Complex twin of ``_mxu_gj_real_kernel`` on (re, im) planes with
    |pivot|^2 pivoting (the reference's complex-magnitude partial pivot,
    solveComplex.ts:24). Same transposed layout and panel structure; the
    elementary vector u and the C recurrence are complex, so the panel
    work is ~3x the real kernel's and each trailing window update is SIX
    MXU matmuls (2 pivot-row gathers + 4 for the complex product).

    meta sublanes: 0 rhs_re, 1 rhs_im, 2 colidx, 3 valid."""
    p_, np_, s_, widths = blocked_plan(n)
    dtype = ar_ref.dtype
    tr_s[:] = ar_ref[0]
    ti_s[:] = ai_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1).astype(dtype)
    eps2 = jnp.asarray(eps * eps, dtype)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    npf = jnp.asarray(float(np_), dtype)
    used0 = jnp.where(lanes >= npf, one, zero)
    init = (used0, jnp.ones((1, _LANE), dtype),
            jnp.full((1, _LANE), -1.0, dtype))

    def panel_step(k0: int) -> object:
        def body(j: Array, carry: tuple) -> tuple:
            used, valid, colidx = carry
            jj = jnp.asarray(k0, jnp.int32) + j
            cr = tr_s[pl.ds(jj, 1), :][0:1, :]
            ci = ti_s[pl.ds(jj, 1), :][0:1, :]
            mag2 = cr * cr + ci * ci
            score = jnp.where(used > 0, -one, mag2)
            m = jnp.max(score, axis=1, keepdims=True)
            cand = score == m
            ridx = jnp.min(jnp.where(cand, lanes, jnp.asarray(
                float(_LANE), dtype)), axis=1, keepdims=True)
            oh = lanes == ridx
            pvr = jnp.sum(jnp.where(oh, cr, zero), axis=1, keepdims=True)
            pvi = jnp.sum(jnp.where(oh, ci, zero), axis=1, keepdims=True)
            d = pvr * pvr + pvi * pvi
            ok = d >= eps2
            valid = valid * jnp.where(ok, one, zero)
            ipd = one / jnp.where(ok, d, one)
            # u = -col/pv off-pivot, 1/pv - 1 at the pivot (complex)
            ur = jnp.where(oh, pvr * ipd - one, -(cr * pvr + ci * pvi) * ipd)
            ui = jnp.where(oh, -pvi * ipd, -(ci * pvr - cr * pvi) * ipd)
            # panel block: Tp += prow (x) u  (complex outer product)
            tpr = tr_s[pl.ds(k0, p_), :]
            tpi = ti_s[pl.ds(k0, p_), :]
            prr = jnp.sum(jnp.where(oh, tpr, zero), axis=1, keepdims=True)
            pri = jnp.sum(jnp.where(oh, tpi, zero), axis=1, keepdims=True)
            tr_s[pl.ds(k0, p_), :] = tpr + prr * ur - pri * ui
            ti_s[pl.ds(k0, p_), :] = tpi + prr * ui + pri * ur
            # C recurrence: Ct += Ctpiv (x) u ; Ct[j, :] += u  (complex)
            ctr = ctr_s[:]
            cti = cti_s[:]
            cpr = jnp.sum(jnp.where(oh, ctr, zero), axis=1, keepdims=True)
            cpi = jnp.sum(jnp.where(oh, cti, zero), axis=1, keepdims=True)
            ctr_s[:] = ctr + cpr * ur - cpi * ui
            cti_s[:] = cti + cpr * ui + cpi * ur
            curr = ctr_s[pl.ds(j, 1), :]
            ctr_s[pl.ds(j, 1), :] = curr + ur
            curi = cti_s[pl.ds(j, 1), :]
            cti_s[pl.ds(j, 1), :] = curi + ui
            oht_s[pl.ds(j, 1), :] = jnp.where(oh, one, zero)
            used = used + jnp.where(oh, one, zero)
            colidx = jnp.where(oh, jj.astype(dtype), colidx)
            return used, valid, colidx

        return body

    carry = init
    for k in range(np_ // p_):
        k0 = k * p_
        ctr_s[:] = jnp.zeros((p_, _LANE), dtype)
        cti_s[:] = jnp.zeros((p_, _LANE), dtype)
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(p_), panel_step(k0), carry)
        w0 = (k + 1) * p_
        w = widths[k]
        twr = tr_s[pl.ds(w0, w), :]
        twi = ti_s[pl.ds(w0, w), :]
        nt = (((1,), (1,)), ((), ()))
        nn = (((1,), (0,)), ((), ()))
        tpr = jax.lax.dot_general(twr, oht_s[:], nt, precision=_HI,
                                  preferred_element_type=dtype)
        tpi = jax.lax.dot_general(twi, oht_s[:], nt, precision=_HI,
                                  preferred_element_type=dtype)
        dot = functools.partial(jax.lax.dot_general, dimension_numbers=nn,
                                precision=_HI, preferred_element_type=dtype)
        tr_s[pl.ds(w0, w), :] = (twr + dot(tpr, ctr_s[:])
                                 - dot(tpi, cti_s[:]))
        ti_s[pl.ds(w0, w), :] = (twi + dot(tpr, cti_s[:])
                                 + dot(tpi, ctr_s[:]))

    used, valid, colidx = carry
    meta_ref[0] = jnp.concatenate(
        [tr_s[pl.ds(np_, 1), :], ti_s[pl.ds(np_, 1), :],
         colidx, valid, jnp.zeros((4, _LANE), dtype)], axis=0)


def _extract_x(meta: Array, n: int) -> tuple[Array, Array]:
    """meta: (B, 8, 128) -> (x: (B, n), valid: (B,) bool). x[b, k] is the
    final RHS entry of the row that pivoted column k."""
    rhs = meta[:, 0, :]                                   # (B, 128)
    colidx = meta[:, 1, :]
    valid = meta[:, 2, 0] > 0
    ks = jnp.arange(n, dtype=meta.dtype)
    sel = colidx[:, :, None] == ks[None, None, :]         # (B, 128, n)
    x = jnp.sum(jnp.where(sel, rhs[:, :, None], 0.0), axis=1)
    return x, valid


def _prep_augt(A: Array, b: Array, n: int) -> Array:
    """(B, N, N) + (B, N) -> transposed augmented (B, S, 128) f32 planes:
    T[b, c, r] = A[b, r, c] for c < N; identity diagonal for the P-padding
    columns N <= c < Np; row Np holds the RHS. Lanes r >= N are zero."""
    p_, np_, s_, _ = blocked_plan(n)
    bsz = A.shape[0]
    at = jnp.swapaxes(A, 1, 2)                            # (B, N, N)
    augt = jnp.zeros((bsz, s_, _LANE), A.dtype)
    augt = augt.at[:, :n, :n].set(at)
    if np_ > n:
        diag = jnp.arange(n, np_)
        augt = augt.at[:, diag, diag].set(1.0)
    augt = augt.at[:, np_, :n].set(b)
    return augt


def _extract_x_complex(meta: Array, n: int) -> tuple[Array, Array, Array]:
    """meta: (B, 8, 128) -> (xr, xi: (B, n), valid: (B,) bool)."""
    colidx = meta[:, 2, :]
    valid = meta[:, 3, 0] > 0
    ks = jnp.arange(n, dtype=meta.dtype)
    sel = colidx[:, :, None] == ks[None, None, :]
    xr = jnp.sum(jnp.where(sel, meta[:, 0, :, None], 0.0), axis=1)
    xi = jnp.sum(jnp.where(sel, meta[:, 1, :, None], 0.0), axis=1)
    return xr, xi, valid


def _prep_augt_planes(Ar: Array, Ai: Array, br: Array,
                      bi: Array, n: int) -> tuple[Array, Array]:
    """Complex twin of ``_prep_augt``: identity pad goes in the REAL plane."""
    p_, np_, s_, _ = blocked_plan(n)
    bsz = Ar.shape[0]
    tr = jnp.zeros((bsz, s_, _LANE), Ar.dtype)
    ti = jnp.zeros((bsz, s_, _LANE), Ai.dtype)
    tr = tr.at[:, :n, :n].set(jnp.swapaxes(Ar, 1, 2))
    ti = ti.at[:, :n, :n].set(jnp.swapaxes(Ai, 1, 2))
    if np_ > n:
        diag = jnp.arange(n, np_)
        tr = tr.at[:, diag, diag].set(1.0)
    tr = tr.at[:, np_, :n].set(br)
    ti = ti.at[:, np_, :n].set(bi)
    return tr, ti


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def mxu_solve_complex(Ar: Array, Ai: Array, br: Array, bi: Array,
                      eps: float = EPS,
                      interpret: bool = False) -> tuple[Array, Array, Array]:
    """Solve (Ar + j Ai) x = (br + j bi), batch-major MXU tier.
    Ar/Ai: (B, N, N) f32; br/bi: (B, N) f32.
    Returns (xr, xi: (B, N), valid: (B,) bool)."""
    bsz, n, _ = Ar.shape
    dtype = Ar.dtype
    p_, np_, s_, _ = blocked_plan(n)
    tr, ti = _prep_augt_planes(Ar, Ai, br, bi, n)
    kernel = functools.partial(_mxu_gj_complex_kernel, n=n, eps=eps)
    plane_spec = pl.BlockSpec((1, s_, _LANE), lambda i: (i, _z(), _z()),
                              memory_space=pltpu.VMEM)
    meta = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[plane_spec, plane_spec],
        out_specs=pl.BlockSpec((1, 8, _LANE), lambda i: (i, _z(), _z()),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 8, _LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((s_, _LANE), dtype),
            pltpu.VMEM((s_, _LANE), dtype),
            pltpu.VMEM((p_, _LANE), dtype),
            pltpu.VMEM((p_, _LANE), dtype),
            pltpu.VMEM((p_, _LANE), dtype),
        ],
        interpret=interpret,
    )(tr, ti)
    return _extract_x_complex(meta, n)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def mxu_solve_real(A: Array, b: Array, eps: float = EPS,
                   interpret: bool = False) -> tuple[Array, Array]:
    """Solve A[i] x = b[i], batch-major MXU tier. A: (B, N, N) f32,
    b: (B, N) f32. Returns (x: (B, N), valid: (B,) bool)."""
    bsz, n, _ = A.shape
    dtype = A.dtype
    _, np_, s_, _ = blocked_plan(n)
    augt = _prep_augt(A, b, n)
    kernel = functools.partial(_mxu_gj_real_kernel, n=n, eps=eps)
    meta = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, s_, _LANE), lambda i: (i, _z(), _z()),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, _LANE), lambda i: (i, _z(), _z()),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 8, _LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((s_, _LANE), dtype),
            pltpu.VMEM((blocked_plan(n)[0], _LANE), dtype),
            pltpu.VMEM((blocked_plan(n)[0], _LANE), dtype),
        ],
        interpret=interpret,
    )(augt)
    return _extract_x(meta, n)
