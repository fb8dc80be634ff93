"""Fused Monte-Carlo AC kernel: MNA assembly INSIDE the Pallas solve.

Round-4 measurement of the 1M-variant AC yield headline (BASELINE.md):
per 100k-variant chunk, batch-last assembly took 90 ms and the solve
31 ms — the pipeline is ASSEMBLY-bound, because XLA materializes the
augmented (N, N+1, B*F) float32 planes (2.6 GB at N=3) in HBM and makes
~18 scatter read-modify-write passes over them, while the information
content is just the per-variant element VALUES ((B, nE) — a few MB) and
the frequency grid.

This kernel never materializes the planes: each grid cell holds one
(nE, TILE_B) slab of element values in VMEM and, per frequency, BUILDS
the (N, N+1, TILE_B) augmented planes directly in VMEM scratch from the
host-precomputed static stamp pattern, then runs the shared complex
one-hot-pivot Gauss-Jordan loop (ops/pallas_gj._complex_gj_scratch) and
writes only |V(node)| and the validity flag — (F, B) float32, the only
HBM output. HBM traffic per chunk drops from ~5 GB to ~170 MB.

The stamp pattern is the SAME static-index information the scatter
assembly uses (`analysis/ac._assemble_grid_batchlast`), precomputed on
the host as per-entry term lists; each term is (kind, value_row, sign)
with kind encoding the frequency dependence:

  one   +-1 constants (V/E/H branch couplings)        -> real plane
  inv   1/v (resistors)                               -> real plane
  lin   v (VCCS gm, CCCS/VCVS/CCVS gains, phasor b)   -> real plane / b
  w     2*pi*f * v (capacitors)                       -> imag plane
  winv  -1/(2*pi*f * v), open when |2*pi*f*v| < EPS
        (inductors, simulateAC.ts:47-52)              -> imag plane

Eligibility mirrors the batch-last tier (f32, no K coupling, no T lines)
plus N <= _FUSED_MAX_N (the per-entry unroll is trace-time work; at MNA
sizes beyond that the solve dominates anyway and the batch-last tier is
the right shape). Contract: /root/reference/lib/analysis/simulateAC.ts:24-60.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS
from .pallas_gj import _LANE, _complex_gj_scratch, _tile_b, _z

Array = jax.Array

# beyond this the unrolled per-entry assembly stops paying for itself
# (and trace/compile time grows with nnz); the batch-last tier takes over
_FUSED_MAX_N = 16


def build_stamp_pattern(n: int, r_idx: object, c_idx: object,
                        l_idx: object, v_idx: object,
                        ext_idx: dict | None = None) -> tuple:
    """Host-side static stamp pattern for the fused kernel.

    Returns (n_rows, re_entries, im_entries) where each entries item is
    ((i, j), terms) with j == n meaning the RHS column and terms a tuple
    of (kind, value_row, sign). Value rows index the combined value
    matrix in the order [R | C | L | v_re | v_im | i_re | i_im | g | e |
    f | h] (see combine_values). Hashable throughout, so it can key the
    jit cache."""
    re_t: dict = {}
    im_t: dict = {}

    def add(d: dict, i: int, j: int, term: tuple) -> None:
        if i >= n or j > n:
            return
        d.setdefault((int(i), int(j)), []).append(term)

    def adm(d: dict, idx: object, kind: str, base: int) -> None:
        for k, (i1, i2) in enumerate(np.asarray(idx).reshape(-1, 2)):
            row = base + k
            for (a, b, s) in ((i1, i1, 1.0), (i2, i2, 1.0),
                              (i1, i2, -1.0), (i2, i1, -1.0)):
                if a < n and b < n:
                    add(d, a, b, (kind, row, s))

    n_r = np.asarray(r_idx).reshape(-1, 2).shape[0]
    n_c = np.asarray(c_idx).reshape(-1, 2).shape[0]
    n_l = np.asarray(l_idx).reshape(-1, 2).shape[0]
    n_v = np.asarray(v_idx).reshape(-1, 3).shape[0]
    off_r, off_c, off_l = 0, n_r, n_r + n_c
    off_vre = n_r + n_c + n_l
    off_vim = off_vre + n_v
    adm(re_t, r_idx, "inv", off_r)
    adm(im_t, c_idx, "w", off_c)
    adm(im_t, l_idx, "winv", off_l)
    for k, (i1, i2, j) in enumerate(np.asarray(v_idx).reshape(-1, 3)):
        for (a, b, s) in ((i1, j, 1.0), (j, i1, 1.0),
                          (i2, j, -1.0), (j, i2, -1.0)):
            if a < n and b < n:
                add(re_t, a, b, ("one", 0, s))
        add(re_t, j, n, ("lin", off_vre + k, 1.0))
        add(im_t, j, n, ("lin", off_vim + k, 1.0))
    base = off_vim + n_v
    if ext_idx:
        ii = np.asarray(ext_idx["i_idx"]).reshape(-1, 2)
        n_i = ii.shape[0]
        off_ire, off_iim = base, base + n_i
        for k, (i1, i2) in enumerate(ii):
            # b[i1] -= I, b[i2] += I (stampCurrent*.ts)
            add(re_t, i1, n, ("lin", off_ire + k, -1.0))
            add(re_t, i2, n, ("lin", off_ire + k, 1.0))
            add(im_t, i1, n, ("lin", off_iim + k, -1.0))
            add(im_t, i2, n, ("lin", off_iim + k, 1.0))
        base = off_iim + n_i
        gi = np.asarray(ext_idx["g_idx"]).reshape(-1, 4)
        for k, (i1, i2, cp, cn) in enumerate(gi):
            row = base + k
            for (a, b, s) in ((i1, cp, 1.0), (i1, cn, -1.0),
                              (i2, cp, -1.0), (i2, cn, 1.0)):
                if a < n and b < n:
                    add(re_t, a, b, ("lin", row, s))
        base += gi.shape[0]
        ei = np.asarray(ext_idx["e_idx"]).reshape(-1, 5)
        for k, (i1, i2, j, cp, cn) in enumerate(ei):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0),
                              (j, i1, 1.0), (j, i2, -1.0)):
                if a < n and b < n:
                    add(re_t, a, b, ("one", 0, s))
            for (a, b, s) in ((j, cp, -1.0), (j, cn, 1.0)):
                if a < n and b < n:
                    add(re_t, a, b, ("lin", row, s))
        base += ei.shape[0]
        fi = np.asarray(ext_idx["f_idx"]).reshape(-1, 3)
        for k, (i1, i2, j) in enumerate(fi):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0)):
                if a < n and b < n:
                    add(re_t, a, b, ("lin", row, s))
        base += fi.shape[0]
        hi = np.asarray(ext_idx["h_idx"]).reshape(-1, 4)
        for k, (i1, i2, j, jc) in enumerate(hi):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0),
                              (j, i1, 1.0), (j, i2, -1.0)):
                if a < n and b < n:
                    add(re_t, a, b, ("one", 0, s))
            if j < n and jc < n:
                add(re_t, j, jc, ("lin", row, -1.0))
        base += hi.shape[0]

    def freeze(d: dict) -> tuple:
        return tuple(sorted(
            (ij, tuple(terms)) for ij, terms in d.items()
        ))

    return base, freeze(re_t), freeze(im_t)


def combine_values(r_vals: Array, c_vals: Array, l_vals: Array,
                   v_re: Array, v_im: Array, ext: dict | None = None,
                   i_re: Array | None = None,
                   i_im: Array | None = None,
                   dtype: object = jnp.float32) -> Array:
    """Stack every per-variant value array into one (n_rows, B) matrix
    in the row order build_stamp_pattern assigns. (B, 0) groups
    contribute no rows; unbatched (nI,) current phasors broadcast.
    ``dtype`` is f32 for the raw fused tier; the refined f64 tier keeps
    f64 so the pattern residuals see the true element values."""
    B = r_vals.shape[0]
    cols = [r_vals, c_vals, l_vals, v_re, v_im]
    if ext is not None:
        cols.append(jnp.broadcast_to(i_re[None, :], (B, i_re.shape[0])))
        cols.append(jnp.broadcast_to(i_im[None, :], (B, i_im.shape[0])))
        cols.extend([ext["g_gm"], ext["e_gain"], ext["f_gain"],
                     ext["h_r"]])
    vals = jnp.concatenate(
        [jnp.asarray(c, dtype) for c in cols], axis=1)
    return vals.T  # (n_rows, B)


def _entry_term(kind: str, v: Array, sign: float, w: Array, tb: int,
                dtype: object) -> Array:
    s = jnp.asarray(sign, dtype)
    if kind == "one":
        return jnp.full((tb,), sign, dtype)
    if kind == "inv":
        return s / v
    if kind == "lin":
        return s * v
    if kind == "w":
        return s * w * v
    # winv: open circuit below EPS (simulateAC.ts:47-52)
    wl = w * v
    small = jnp.abs(wl) < jnp.asarray(EPS, dtype)
    return jnp.where(small, jnp.asarray(0.0, dtype),
                     -s / jnp.where(small, jnp.asarray(1.0, dtype), wl))


def _fused_kernel(f_ref: object, ev_ref: object, mag_ref: object,
                  valid_ref: object, ar_s: object, ai_s: object, *,
                  n: int, node_idx: int, eps: float, n_freq: int,
                  pattern: tuple) -> None:
    tb = ev_ref.shape[-1]
    dtype = ev_ref.dtype
    _n_rows, re_entries, im_entries = pattern
    nonzero = {ij for ij, _ in re_entries} | {ij for ij, _ in im_entries}

    def one_freq(fi: Array, carry: Array) -> Array:
        w = (2.0 * np.pi) * f_ref[fi]  # SMEM scalar
        # zero only the entries no stamp writes; stamped entries are
        # overwritten below (full-scratch zeroing would double the stores)
        zero_row = jnp.zeros((1, tb), dtype)
        for i in range(n):
            for j in range(n + 1):
                if (i, j) not in nonzero:
                    ar_s[i, pl.ds(j, 1), :] = zero_row
                    ai_s[i, pl.ds(j, 1), :] = zero_row

        def write(scratch: object, entries: tuple) -> None:
            for (i, j), terms in entries:
                acc = None
                for kind, row, sign in terms:
                    t = _entry_term(kind, ev_ref[row, :], sign, w, tb,
                                    dtype)
                    acc = t if acc is None else acc + t
                scratch[i, pl.ds(j, 1), :] = acc[None, :]

        write(ar_s, re_entries)
        # an entry both planes stamp must be zero in the plane that
        # doesn't own a term (handled: entries are per-plane; a slot
        # stamped only in re needs zero in im and vice versa)
        im_keys = {ij for ij, _ in im_entries}
        re_keys = {ij for ij, _ in re_entries}
        for (i, j) in sorted(re_keys - im_keys):
            ai_s[i, pl.ds(j, 1), :] = zero_row
        for (i, j) in sorted(im_keys - re_keys):
            ar_s[i, pl.ds(j, 1), :] = zero_row
        write(ai_s, im_entries)

        colidx, valid, _rows2 = _complex_gj_scratch(
            ar_s, ai_s, n=n, tb=tb, dtype=dtype, eps=eps)
        node_f = jnp.asarray(float(node_idx), dtype)
        sel = colidx == node_f  # (N, TB)
        xr = jnp.sum(jnp.where(sel, ar_s[:, n, :], 0.0), axis=0)
        xi = jnp.sum(jnp.where(sel, ai_s[:, n, :], 0.0), axis=0)
        mag_ref[pl.ds(fi, 1), :] = jnp.sqrt(xr * xr + xi * xi)[None, :]
        valid_ref[pl.ds(fi, 1), :] = valid
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_freq), one_freq,
                      jnp.int32(0))


def _fused_x_kernel(f_ref: object, ev_ref: object, *refs: object,
                    n: int, eps: float, n_freq: int, pattern: tuple,
                    ext_rhs: bool) -> None:
    """Fused assemble+solve emitting the FULL solution planes (F, N, TB).

    Same in-VMEM assembly as ``_fused_kernel`` but (a) the whole solution
    vector is written out, not just one probed |V|, and (b) with
    ``ext_rhs`` the pattern's RHS column is replaced by caller-supplied
    (rr, ri) planes. Both together make the kernel usable as the O(N^3)
    inner solve of mixed-precision iterative refinement: the f64 tier
    calls it once for the initial solve and once per refinement round
    with the f64 residual as the RHS (see ``mc_ac_fused_f64``)."""
    if ext_rhs:
        rr_ref, ri_ref, xr_ref, xi_ref, valid_ref, ar_s, ai_s = refs
    else:
        rr_ref = ri_ref = None
        xr_ref, xi_ref, valid_ref, ar_s, ai_s = refs
    tb = ev_ref.shape[-1]
    dtype = ev_ref.dtype
    _n_rows, re_entries, im_entries = pattern
    if ext_rhs:
        # the RHS column is fully overwritten from the input planes;
        # drop the pattern's b entries and zero/stamp only A columns
        re_entries = tuple((ij, t) for ij, t in re_entries if ij[1] < n)
        im_entries = tuple((ij, t) for ij, t in im_entries if ij[1] < n)
    nonzero = {ij for ij, _ in re_entries} | {ij for ij, _ in im_entries}

    def one_freq(fi: Array, carry: Array) -> Array:
        w = (2.0 * np.pi) * f_ref[fi]  # SMEM scalar
        zero_row = jnp.zeros((1, tb), dtype)
        jmax = n if ext_rhs else n + 1
        for i in range(n):
            for j in range(jmax):
                if (i, j) not in nonzero:
                    ar_s[i, pl.ds(j, 1), :] = zero_row
                    ai_s[i, pl.ds(j, 1), :] = zero_row

        def write(scratch: object, entries: tuple) -> None:
            for (i, j), terms in entries:
                acc = None
                for kind, row, sign in terms:
                    t = _entry_term(kind, ev_ref[row, :], sign, w, tb,
                                    dtype)
                    acc = t if acc is None else acc + t
                scratch[i, pl.ds(j, 1), :] = acc[None, :]

        write(ar_s, re_entries)
        im_keys = {ij for ij, _ in im_entries}
        re_keys = {ij for ij, _ in re_entries}
        for (i, j) in sorted(re_keys - im_keys):
            ai_s[i, pl.ds(j, 1), :] = zero_row
        for (i, j) in sorted(im_keys - re_keys):
            ar_s[i, pl.ds(j, 1), :] = zero_row
        write(ai_s, im_entries)
        if ext_rhs:
            rr = rr_ref[pl.ds(fi, 1), :, :][0]  # (N, TB)
            ri = ri_ref[pl.ds(fi, 1), :, :][0]
            for i in range(n):  # i is static: plain value indexing
                ar_s[i, pl.ds(n, 1), :] = rr[i][None, :]
                ai_s[i, pl.ds(n, 1), :] = ri[i][None, :]

        colidx, valid, rows2 = _complex_gj_scratch(
            ar_s, ai_s, n=n, tb=tb, dtype=dtype, eps=eps)
        from .pallas_gj import _extract_solution
        xr = _extract_solution(colidx, ar_s[:, n, :], rows2, n)
        xi = _extract_solution(colidx, ai_s[:, n, :], rows2, n)
        xr_ref[pl.ds(fi, 1), :, :] = xr[None, :, :]
        xi_ref[pl.ds(fi, 1), :, :] = xi[None, :, :]
        valid_ref[pl.ds(fi, 1), :] = valid
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_freq), one_freq,
                      jnp.int32(0))


def _tile_fx(n: int, n_freq: int, n_rows: int, ext_rhs: bool) -> int:
    """Lane tile for the full-solution kernel: the (F, N, TILE) x planes
    (and rhs planes with ext_rhs) dominate VMEM, so the tile shrinks with
    F*N. Budget ~24 MB leaves headroom for double-buffering under the
    100 MB scoped limit."""
    budget = 24 * 1024 * 1024
    planes = 4 if ext_rhs else 2
    per_lane = 4 * (2 * n * (n + 1) + planes * n_freq * n + n_rows + 8)
    tile = budget // (per_lane * _LANE) * _LANE
    return int(max(_LANE, min(2048, tile)))


@functools.partial(
    jax.jit, static_argnames=("n", "pattern", "eps", "interpret"))
def mc_ac_fused_x_f32(freqs: Array, values: Array, n: int, pattern: tuple,
                      rhs: tuple[Array, Array] | None = None,
                      eps: float = EPS,
                      interpret: bool = False) -> tuple[Array, Array,
                                                        Array]:
    """Fused assemble+solve returning full solutions, batch-last.

    freqs (F,), values (n_rows, B) f32; optional rhs = (rr, ri) planes
    (F, N, B) f32 replacing the pattern's source phasors. Returns
    (xr, xi: (F, N, B), valid: (F, B) f32)."""
    f32 = jnp.float32
    freqs = freqs.astype(f32)
    values = values.astype(f32)
    F = freqs.shape[0]
    B = values.shape[-1]
    tile = _tile_fx(n, F, values.shape[0], rhs is not None)
    pad = (-B) % tile
    if pad:
        values = jnp.concatenate(
            [values, jnp.ones((values.shape[0], pad), f32)], axis=-1)
        if rhs is not None:
            rhs = tuple(
                jnp.concatenate(
                    [r.astype(f32),
                     jnp.zeros((F, n, pad), f32)], axis=-1)
                for r in rhs)
    Bp = B + pad
    grid = (Bp // tile,)
    kernel = functools.partial(
        _fused_x_kernel, n=n, eps=eps, n_freq=F, pattern=pattern,
        ext_rhs=rhs is not None)
    in_specs = [
        pl.BlockSpec((F,), lambda i: (_z(),), memory_space=pltpu.SMEM),
        pl.BlockSpec((values.shape[0], tile), lambda i: (_z(), i),
                     memory_space=pltpu.VMEM),
    ]
    args = [freqs, values]
    if rhs is not None:
        x_in = pl.BlockSpec((F, n, tile), lambda i: (_z(), _z(), i),
                            memory_space=pltpu.VMEM)
        in_specs += [x_in, x_in]
        args += [rhs[0].astype(f32), rhs[1].astype(f32)]
    xr, xi, valid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((F, n, tile), lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, n, tile), lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, n, Bp), f32),
            jax.ShapeDtypeStruct((F, n, Bp), f32),
            jax.ShapeDtypeStruct((F, Bp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n + 1, tile), f32),
            pltpu.VMEM((n, n + 1, tile), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return xr[..., :B], xi[..., :B], valid[:, :B]


# --- double-float (df32) arithmetic for the in-kernel refined f64 tier.
# Mosaic on this TPU generation lowers f32 only, but refinement needs the
# residual computed at better-than-f32 precision. Each df32 value is an
# UNEVALUATED SUM of two f32s (hi + lo), giving ~2^-48 ~ 3.6e-15 relative
# precision — comfortably below the tier's 1e-12 residual guard. The
# error-free transforms are the classic Dekker/Knuth ones (two-sum,
# split-based two-product: exact under round-to-nearest f32; no FMA or
# reassociation assumptions). ---


def _dd_opaque(x: Array) -> Array:
    """Block FMA contraction of a multiply feeding the two-sum subs.

    LLVM (XLA:CPU backend) contracts ``sub(s, mul(a, b))`` into an fma
    whose EXACT product replaces the rounded one — which breaks the
    error-free transforms (the computed "rounding error" then includes
    the product's own rounding; observed as a 5.5e-8 coefficient error,
    the optimized HLO being correct). A data-dependent select between
    the multiply and its consumer cannot be contracted or folded
    (``x == x`` is only provably true under nnan fast-math)."""
    return jnp.where(x == x, x, jnp.zeros_like(x))


def _dd_two_sum(a: Array, b: Array) -> tuple[Array, Array]:
    a = _dd_opaque(a)
    b = _dd_opaque(b)
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _dd_fast_two_sum(a: Array, b: Array) -> tuple[Array, Array]:
    # requires |a| >= |b| (holds: a is the dominant sum/product term)
    a = _dd_opaque(a)
    b = _dd_opaque(b)
    s = a + b
    return s, b - (s - a)


def _dd_split(a: Array) -> tuple[Array, Array]:
    # Veltkamp split. Vectors: by MANTISSA BITMASK — rewrite-proof, and
    # hi (12 mantissa bits) / lo = a - hi (exact by Sterbenz) keep all
    # split products exact in f32. Scalars: Mosaic's tpu.bitcast needs
    # vectors, so fall back to the multiply-based Dekker split with the
    # contraction-blocking select (see _dd_opaque) on its cancellation.
    if getattr(a, "ndim", 0) == 0:
        c = a * 4097.0  # 2^12 + 1
        hi = c - _dd_opaque(c - a)
        return hi, a - hi
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        bits & np.uint32(0xFFFFF000), jnp.float32)
    return hi, a - hi


def _dd_two_prod(a: Array, b: Array) -> tuple[Array, Array]:
    p = a * b
    ah, al = _dd_split(a)
    bh, bl = _dd_split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def dd_add(x: tuple, y: tuple) -> tuple[Array, Array]:
    # the accurate (QD "ieee_add") variant, NOT the sloppy 3-op one: the
    # refinement residual b - A x cancels its hi parts by construction,
    # exactly where the sloppy add loses up to ~2^-24 relative (observed
    # as a 6.7e-9 tier error on XLA:CPU before the upgrade)
    sh, se = _dd_two_sum(x[0], y[0])
    tl, te = _dd_two_sum(x[1], y[1])
    sh, se = _dd_fast_two_sum(sh, se + tl)
    return _dd_fast_two_sum(sh, se + te)


def dd_sub(x: tuple, y: tuple) -> tuple[Array, Array]:
    return dd_add(x, (-y[0], -y[1]))


def dd_mul(x: tuple, y: tuple) -> tuple[Array, Array]:
    p, e = _dd_two_prod(x[0], y[0])
    return _dd_fast_two_sum(p, e + (x[0] * y[1] + x[1] * y[0]))


def dd_div(x: tuple, y: tuple) -> tuple[Array, Array]:
    q1 = x[0] / y[0]
    p = dd_mul((q1, jnp.zeros_like(q1)), y)
    r = dd_sub(x, p)
    return _dd_fast_two_sum(q1, r[0] / y[0])


# 2*pi as a df32 constant (hi = f32(2*pi), lo = f32(2*pi - hi))
_TWOPI_HI = np.float32(2.0 * np.pi)
_TWOPI_LO = np.float32(2.0 * np.pi - float(_TWOPI_HI))


def _entry_term_dd(kind: str, v: tuple, sign: float, w: tuple,
                   eps: float) -> tuple:
    """df32 stamp coefficient — the double-float twin of ``_entry_term``.
    v = (hi, lo) value vectors (TB,); w = df32 2*pi*f scalars."""
    z = jnp.zeros_like(v[0])
    s = jnp.full_like(v[0], sign)
    if kind == "one":
        return s, z
    if kind == "inv":
        return dd_div((s, z), v)
    if kind == "lin":
        # sign is exactly +-1: scaling is exact in both components
        return sign * v[0], sign * v[1]
    if kind == "w":
        p = dd_mul(w, v)
        return sign * p[0], sign * p[1]
    # winv: open circuit below EPS on the hi part (simulateAC.ts:47-52)
    wl = dd_mul(w, v)
    small = jnp.abs(wl[0]) < jnp.float32(eps)
    safe = (jnp.where(small, 1.0, wl[0]), jnp.where(small, 0.0, wl[1]))
    q = dd_div((-s, z), safe)
    return jnp.where(small, 0.0, q[0]), jnp.where(small, 0.0, q[1])


def _fused_dd_kernel(f_ref: object, ev_ref: object, xnr_h_ref: object,
                     xnr_l_ref: object, xni_h_ref: object,
                     xni_l_ref: object, valid_ref: object, rel_ref: object,
                     ar_s: object, ai_s: object, *, n: int, node_idx: int,
                     eps: float, n_freq: int, n_rows: int, pattern: tuple,
                     refine: int) -> None:
    """Fused assemble+solve+REFINE: the whole mixed-precision iterative
    refinement loop runs inside one kernel invocation.

    Per frequency: assemble the f32 augmented planes in VMEM (as the f32
    kernel does), Gauss-Jordan -> x0; then ``refine`` rounds of
    {df32 residual from the df32 element values -> re-assemble -> solve
    correction -> df32-accumulate x}; finally a df32 guard residual. Only
    the probed node's df32 solution, the validity flag, and the relative
    residual leave the kernel — the refinement loop's solution/residual
    planes never touch HBM (they cost the HBM-round-trip version ~2x the
    whole f32 tier's wall time). ``ev_ref`` carries hi rows then lo rows
    ((2*n_rows, TB)); ``f_ref`` is (2, F) SMEM hi/lo frequencies."""
    tb = ev_ref.shape[-1]
    dtype = ev_ref.dtype
    _nr, re_entries, im_entries = pattern
    a_re = tuple((ij, t) for ij, t in re_entries if ij[1] < n)
    a_im = tuple((ij, t) for ij, t in im_entries if ij[1] < n)
    b_re = {ij[0]: t for ij, t in re_entries if ij[1] == n}
    b_im = {ij[0]: t for ij, t in im_entries if ij[1] == n}
    nonzero = {ij for ij, _ in re_entries} | {ij for ij, _ in im_entries}

    def vdd(row: int) -> tuple:
        return ev_ref[row, :], ev_ref[n_rows + row, :]

    def one_freq(fi: Array, carry: Array) -> Array:
        w = dd_mul((jnp.float32(_TWOPI_HI), jnp.float32(_TWOPI_LO)),
                   (f_ref[0, fi], f_ref[1, fi]))
        zero_row = jnp.zeros((1, tb), dtype)
        z = jnp.zeros((tb,), dtype)

        # df32 coefficients per A entry and per b row, computed ONCE per
        # frequency (reused by the assembly hi-parts, every refinement
        # residual, and the guard) — entries are trace-time static
        def coeffs(entries: tuple) -> list:
            out = []
            for key, terms in entries:  # key: (i, j) for A, i for b
                acc = (z, z)
                for kind, row, sign in terms:
                    acc = dd_add(acc, _entry_term_dd(
                        kind, vdd(row), float(sign), w, eps))
                out.append((key, acc))
            return out

        ca_re = coeffs(a_re)
        ca_im = coeffs(a_im)
        cb_re = dict(coeffs(tuple(b_re.items())))
        cb_im = dict(coeffs(tuple(b_im.items())))

        amax = z
        for _ij, c in ca_re + ca_im:
            amax = jnp.maximum(amax, jnp.abs(c[0]))
        bmax = z
        for c in list(cb_re.values()) + list(cb_im.values()):
            bmax = jnp.maximum(bmax, jnp.abs(c[0]))

        re_keys = {ij for ij, _ in a_re}
        im_keys = {ij for ij, _ in a_im}

        def assemble(rhs: tuple | None) -> None:
            """Write the f32 planes: A hi-parts + RHS (pattern b when
            rhs is None, else the residual hi-parts). A slot stamped in
            only one plane must be zeroed in the other."""
            for i in range(n):
                for j in range(n + 1):
                    if (i, j) not in nonzero or j == n:
                        ar_s[i, pl.ds(j, 1), :] = zero_row
                        ai_s[i, pl.ds(j, 1), :] = zero_row
            for (i, j) in sorted(re_keys - im_keys):
                ai_s[i, pl.ds(j, 1), :] = zero_row
            for (i, j) in sorted(im_keys - re_keys):
                ar_s[i, pl.ds(j, 1), :] = zero_row
            for (i, j), c in ca_re:
                ar_s[i, pl.ds(j, 1), :] = c[0][None, :]
            for (i, j), c in ca_im:
                ai_s[i, pl.ds(j, 1), :] = c[0][None, :]
            if rhs is None:
                for i, c in cb_re.items():
                    ar_s[i, pl.ds(n, 1), :] = c[0][None, :]
                for i, c in cb_im.items():
                    ai_s[i, pl.ds(n, 1), :] = c[0][None, :]
            else:
                rr, ri = rhs
                for i in range(n):
                    ar_s[i, pl.ds(n, 1), :] = rr[i][0][None, :]
                    ai_s[i, pl.ds(n, 1), :] = ri[i][0][None, :]

        def solve() -> tuple:
            colidx, valid, rows2 = _complex_gj_scratch(
                ar_s, ai_s, n=n, tb=tb, dtype=dtype, eps=eps)
            from .pallas_gj import _extract_solution
            xr = _extract_solution(colidx, ar_s[:, n, :], rows2, n)
            xi = _extract_solution(colidx, ai_s[:, n, :], rows2, n)
            return xr, xi, valid

        def residual(x_r: list, x_i: list) -> tuple:
            """df32 r = b - A x; x_r/x_i are per-row df32 tuples."""
            rr = [cb_re.get(i, (z, z)) for i in range(n)]
            ri = [cb_im.get(i, (z, z)) for i in range(n)]
            for (i, j), c in ca_re:
                rr[i] = dd_sub(rr[i], dd_mul(c, x_r[j]))
                ri[i] = dd_sub(ri[i], dd_mul(c, x_i[j]))
            for (i, j), c in ca_im:
                rr[i] = dd_add(rr[i], dd_mul(c, x_i[j]))
                ri[i] = dd_sub(ri[i], dd_mul(c, x_r[j]))
            return rr, ri

        assemble(None)
        xr0, xi0, valid = solve()
        x_r = [(xr0[i], z) for i in range(n)]
        x_i = [(xi0[i], z) for i in range(n)]
        for _round in range(refine):
            rr, ri = residual(x_r, x_i)
            assemble((rr, ri))
            dxr, dxi, _v = solve()
            x_r = [dd_add(x_r[i], (dxr[i], z)) for i in range(n)]
            x_i = [dd_add(x_i[i], (dxi[i], z)) for i in range(n)]

        rr, ri = residual(x_r, x_i)
        rmax = z
        xmax = z
        for i in range(n):
            rmax = jnp.maximum(rmax, jnp.maximum(jnp.abs(rr[i][0]),
                                                 jnp.abs(ri[i][0])))
            xmax = jnp.maximum(xmax, jnp.maximum(jnp.abs(x_r[i][0]),
                                                 jnp.abs(x_i[i][0])))
        scale = jnp.maximum(amax * xmax + bmax,
                            jnp.float32(np.finfo(np.float32).tiny))
        rel = rmax / scale

        xnr_h_ref[pl.ds(fi, 1), :] = x_r[node_idx][0][None, :]
        xnr_l_ref[pl.ds(fi, 1), :] = x_r[node_idx][1][None, :]
        xni_h_ref[pl.ds(fi, 1), :] = x_i[node_idx][0][None, :]
        xni_l_ref[pl.ds(fi, 1), :] = x_i[node_idx][1][None, :]
        valid_ref[pl.ds(fi, 1), :] = valid
        rel_ref[pl.ds(fi, 1), :] = rel[None, :]
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_freq), one_freq,
                      jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("n", "node_idx", "pattern", "eps", "refine",
                              "interpret"))
def mc_ac_fused_dd(freqs: Array, values: Array, n: int, node_idx: int,
                   pattern: tuple, eps: float = EPS, refine: int = 2,
                   interpret: bool = False) -> tuple:
    """Dispatch the in-kernel df32-refined fused kernel.

    freqs (F,) f64, values (n_rows, B) f64. Returns batch-last
    (node_re, node_im: (F, B) f64 recombined from the df32 pair,
    valid: (F, B) bool, rel: (F, B) f32 relative residuals)."""
    f32 = jnp.float32
    f64 = jnp.float64
    freqs = freqs.astype(f64)
    values = values.astype(f64)
    fh = freqs.astype(f32)
    fl = (freqs - fh.astype(f64)).astype(f32)
    fdd = jnp.stack([fh, fl])  # (2, F)
    vh = values.astype(f32)
    vl = (values - vh.astype(f64)).astype(f32)
    vdd = jnp.concatenate([vh, vl], axis=0)  # (2*n_rows, B)
    n_rows = values.shape[0]
    F = freqs.shape[0]
    B = values.shape[-1]
    tile = _tile_b(n, 4, 3)
    pad = (-B) % tile
    if pad:
        vdd = jnp.concatenate(
            [vdd, jnp.ones((vdd.shape[0], pad), f32)], axis=-1)
    Bp = B + pad
    kernel = functools.partial(
        _fused_dd_kernel, n=n, node_idx=node_idx, eps=eps, n_freq=F,
        n_rows=n_rows, pattern=pattern, refine=refine)
    out_spec = pl.BlockSpec((F, tile), lambda i: (_z(), i),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((2, F), lambda i: (_z(), _z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((vdd.shape[0], tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((F, Bp), f32)] * 6,
        scratch_shapes=[
            pltpu.VMEM((n, n + 1, tile), f32),
            pltpu.VMEM((n, n + 1, tile), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fdd, vdd)
    xnr_h, xnr_l, xni_h, xni_l, valid, rel = [o[:, :B] for o in outs]
    node_r = xnr_h.astype(f64) + xnr_l.astype(f64)
    node_i = xni_h.astype(f64) + xni_l.astype(f64)
    return node_r, node_i, valid > 0.5, rel


def _coeff_xla(kind: str, v: Array, sign: float, w: Array) -> Array:
    """One stamp term's coefficient, batch-last XLA version of
    ``_entry_term``: v (B,), w (F, 1) -> (F, B) or broadcastable."""
    if kind == "one":
        return jnp.asarray(sign, v.dtype)
    if kind == "inv":
        return sign / v
    if kind == "lin":
        return sign * v
    if kind == "w":
        return sign * (w * v)
    wl = w * v
    small = jnp.abs(wl) < EPS
    return jnp.where(small, 0.0, -sign / jnp.where(small, 1.0, wl))


def _pattern_apply(pattern: tuple, values: Array, freqs: Array,
                   xr: Array, xi: Array) -> tuple:
    """Residual r = b - A x from the STAMP PATTERN, never materializing A.

    values (n_rows, B) f64, freqs (F,), xr/xi (F, N, B) f64. Returns
    (rr, ri: (F, N, B), amax, bmax: (F, B) — max |A entry| / |b entry|).
    This is the f64 residual of mixed-precision refinement: pure fused
    elementwise work (one multiply-add per stamp nonzero), replacing the
    scatter-assembled dense (N, N+1, B*F) f64 planes whose ~18 HBM
    read-modify-write passes made the old f64 tier assembly-bound."""
    _n_rows, re_entries, im_entries = pattern
    F = freqs.shape[0]
    B = values.shape[-1]
    n = xr.shape[1]
    dtype = xr.dtype
    w = (2.0 * np.pi) * freqs[:, None]  # (F, 1)
    acc_r: list = [None] * n
    acc_i: list = [None] * n
    br: list = [None] * n
    bi: list = [None] * n
    amax = jnp.zeros((F, B), dtype)
    bmax = jnp.zeros((F, B), dtype)

    def addto(lst: list, i: int, t: Array) -> None:
        lst[i] = t if lst[i] is None else lst[i] + t

    for plane, entries in (("re", re_entries), ("im", im_entries)):
        for (i, j), terms in entries:
            c = None
            for kind, row, sign in terms:
                t = _coeff_xla(kind, values[row, :].astype(dtype),
                               float(sign), w)
                c = t if c is None else c + t
            cb = jnp.broadcast_to(c, (F, B))
            if j == n:  # RHS column: b entries
                bmax = jnp.maximum(bmax, jnp.abs(cb))
                addto(br if plane == "re" else bi, i, cb)
                continue
            amax = jnp.maximum(amax, jnp.abs(cb))
            if plane == "re":
                # (Ar + jAi)(xr + jxi): re += Ar xr - Ai xi, etc.
                addto(acc_r, i, cb * xr[:, j, :])
                addto(acc_i, i, cb * xi[:, j, :])
            else:
                addto(acc_r, i, -cb * xi[:, j, :])
                addto(acc_i, i, cb * xr[:, j, :])

    zeros = jnp.zeros((F, B), dtype)
    rr = jnp.stack([(zeros if br[i] is None else br[i])
                    - (zeros if acc_r[i] is None else acc_r[i])
                    for i in range(n)], axis=1)
    ri = jnp.stack([(zeros if bi[i] is None else bi[i])
                    - (zeros if acc_i[i] is None else acc_i[i])
                    for i in range(n)], axis=1)
    return rr, ri, amax, bmax


def _pattern_dense_single(pattern: tuple, values: Array, freq: Array,
                          n: int) -> tuple:
    """Materialize the dense f64 planes from the pattern for ONE
    frequency (fallback path only — executes under lax.cond when
    refinement diverged, streamed per frequency so the reserved branch
    buffers stay (B, N, N)-sized instead of (F, B, N, N)). Returns
    (Ar, Ai: (B, N, N), br, bi: (B, N))."""
    _n_rows, re_entries, im_entries = pattern
    B = values.shape[-1]
    dtype = values.dtype
    w = (2.0 * np.pi) * jnp.reshape(freq, (1,))  # (1,): broadcasts to (B,)

    def build(entries: tuple) -> tuple:
        A = jnp.zeros((B, n, n), dtype)
        b = jnp.zeros((B, n), dtype)
        for (i, j), terms in entries:
            c = None
            for kind, row, sign in terms:
                t = _coeff_xla(kind, values[row, :], float(sign), w)
                c = t if c is None else c + t
            cb = jnp.broadcast_to(c, (B,))
            if j == n:
                b = b.at[:, i].add(cb)
            else:
                A = A.at[:, i, j].add(cb)
        return A, b

    Ar, br = build(re_entries)
    Ai, bi = build(im_entries)
    return Ar, Ai, br, bi


def _fused_f64_guard(freqs: Array, values: Array, n: int, node_idx: int,
                     pattern: tuple, eps: float, rtol: float,
                     fallback: bool, node_r: Array, node_i: Array,
                     valid: Array, rel: Array) -> tuple:
    """Shared residual-guard epilogue of the fused f64 tiers: systems
    whose relative residual exceeds ``rtol`` are re-solved on a dense f64
    GJ path built from the pattern under lax.cond (``fallback=True``) or
    flagged invalid. No silently-wrong result is marked valid (the
    batched analog of solveReal.ts:28's throw)."""
    bad = valid & (~jnp.isfinite(rel) | (rel > rtol))
    if fallback:
        from .linsolve import solve_complex_blocks

        def resolve_f64(_: None) -> tuple:
            # streamed per frequency: lax.map keeps the reserved branch
            # buffers at one frequency's dense planes (XLA allocates
            # both cond branches; the whole-(F, B) dense build OOMed the
            # compiler at B=100k even though the branch rarely runs)
            def one_freq(fr: Array) -> tuple:
                Ar, Ai, br, bi = _pattern_dense_single(
                    pattern, values, fr, n)
                xr64, xi64, v64 = solve_complex_blocks(
                    Ar, Ai, br, bi, method="gj", eps=eps)
                return xr64[:, node_idx], xi64[:, node_idx], v64

            nr, ni, v64 = jax.lax.map(one_freq, freqs)  # (F, B) each
            return (jnp.where(bad, nr, node_r),
                    jnp.where(bad, ni, node_i),
                    jnp.where(bad, v64, valid))

        node_r, node_i, valid = jax.lax.cond(
            jnp.any(bad), resolve_f64,
            lambda _: (node_r, node_i, valid), None)
    else:
        valid = valid & ~bad
    mag = jnp.sqrt(node_r * node_r + node_i * node_i)
    return mag.T, valid.T  # (B, F)


@functools.partial(
    jax.jit, static_argnames=("n", "node_idx", "pattern", "eps", "refine",
                              "rtol", "fallback", "interpret"))
def mc_ac_fused_f64(freqs: Array, values: Array, n: int, node_idx: int,
                    pattern: tuple, eps: float = EPS, refine: int = 2,
                    rtol: float = 1e-12, fallback: bool = True,
                    interpret: bool = False) -> tuple[Array, Array]:
    """f64-fidelity fused MC AC sweep (VERDICT r4 do #2): the WHOLE
    mixed-precision refinement loop runs inside one Pallas kernel
    (``_fused_dd_kernel``) — in-VMEM f32 assembly+solve, df32 residuals
    computed from the df32-split element values, df32 solution
    accumulation — so HBM sees only the element values in and the probed
    node's df32 solution out, the same traffic shape as the f32 tier.

    freqs (F,), values (n_rows, B) f64 -> (mag (B, F) f64, valid (B, F)).
    The same residual guard as the refined batch-last tier applies
    (rtol=1e-12, measured in-kernel at df32 precision ~3.6e-15 — see
    ops/pallas_gj.py's module docstring for the threshold derivation):
    diverged systems are re-solved on a dense f64 GJ path under lax.cond
    (``fallback=True``) or flagged invalid."""
    freqs = freqs.astype(jnp.float64)
    values = values.astype(jnp.float64)
    node_r, node_i, valid, rel = mc_ac_fused_dd(
        freqs, values, n, node_idx, pattern, eps=eps, refine=refine,
        interpret=interpret)
    return _fused_f64_guard(freqs, values, n, node_idx, pattern, eps,
                            rtol, fallback, node_r, node_i, valid,
                            rel.astype(jnp.float64))


@functools.partial(
    jax.jit, static_argnames=("n", "node_idx", "pattern", "eps", "refine",
                              "rtol", "fallback", "interpret"))
def mc_ac_fused_f64_hbm(freqs: Array, values: Array, n: int,
                        node_idx: int, pattern: tuple, eps: float = EPS,
                        refine: int = 2, rtol: float = 1e-12,
                        fallback: bool = True,
                        interpret: bool = False) -> tuple[Array, Array]:
    """HBM-round-trip variant of the refined fused f64 tier: the fused
    full-solution kernel (``mc_ac_fused_x_f32``) as the inner solve, f64
    residuals computed by XLA from the pattern (``_pattern_apply``), and
    f64 accumulation between kernel calls. ~2x slower than the in-kernel
    df32 loop (the (F, N, B) solution/residual planes round-trip HBM
    every round) but built from independently-testable pieces — kept as
    the cross-check oracle for the df32 arithmetic (tests/test_pallas_fused
    pins the two against each other) and as the reference implementation."""
    f64 = jnp.float64
    f32 = jnp.float32
    freqs = freqs.astype(f64)
    values = values.astype(f64)
    freqs32 = freqs.astype(f32)
    v32 = values.astype(f32)
    xr0, xi0, valid32 = mc_ac_fused_x_f32(freqs32, v32, n, pattern,
                                          eps=eps, interpret=interpret)
    valid = valid32 > 0.5  # (F, B)
    xr, xi = xr0.astype(f64), xi0.astype(f64)
    for _ in range(refine):
        rr, ri, _, _ = _pattern_apply(pattern, values, freqs, xr, xi)
        dxr, dxi, _ = mc_ac_fused_x_f32(
            freqs32, v32, n, pattern,
            rhs=(rr.astype(f32), ri.astype(f32)),
            eps=eps, interpret=interpret)
        xr = xr + dxr.astype(f64)
        xi = xi + dxi.astype(f64)
    rr, ri, amax, bmax = _pattern_apply(pattern, values, freqs, xr, xi)
    from .pallas_gj import _rel_residual
    rmax = jnp.maximum(jnp.max(jnp.abs(rr), axis=1),
                       jnp.max(jnp.abs(ri), axis=1))  # (F, B)
    xmax = jnp.maximum(jnp.max(jnp.abs(xr), axis=1),
                       jnp.max(jnp.abs(xi), axis=1))
    rel = _rel_residual(rmax, amax, xmax, bmax)
    return _fused_f64_guard(freqs, values, n, node_idx, pattern, eps,
                            rtol, fallback, xr[:, node_idx, :],
                            xi[:, node_idx, :], valid, rel)


@functools.partial(
    jax.jit, static_argnames=("n", "node_idx", "pattern", "eps",
                              "interpret"))
def mc_ac_fused_f32(freqs: Array, values: Array, n: int, node_idx: int,
                    pattern: tuple, eps: float = EPS,
                    interpret: bool = False) -> tuple[Array, Array]:
    """Fused assemble+solve AC Monte-Carlo sweep.

    freqs (F,), values (n_rows, B) f32 -> (mag (B, F), valid (B, F));
    B is padded to the lane tile internally."""
    f32 = jnp.float32
    freqs = freqs.astype(f32)
    values = values.astype(f32)
    F = freqs.shape[0]
    B = values.shape[-1]
    tile = _tile_b(n, 4, 3)
    pad = (-B) % tile
    if pad:
        values = jnp.concatenate(
            [values, jnp.ones((values.shape[0], pad), f32)], axis=-1)
    Bp = B + pad
    grid = (Bp // tile,)
    kernel = functools.partial(
        _fused_kernel, n=n, node_idx=node_idx, eps=eps, n_freq=F,
        pattern=pattern)
    mag, valid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # explicit index map: the default one returns i64 literals
            # under x64, which Mosaic cannot legalize
            pl.BlockSpec((F,), lambda i: (_z(),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((values.shape[0], tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((F, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, Bp), f32),
            jax.ShapeDtypeStruct((F, Bp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n + 1, tile), f32),
            pltpu.VMEM((n, n + 1, tile), f32),
        ],
        interpret=interpret,
    )(freqs, values)
    mag = mag[:, :B].T  # (B, F)
    valid = valid[:, :B].T > 0.5
    return mag, valid
