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
from .pallas_gj import _complex_gj_scratch, _tile_b, _z

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
                   i_im: Array | None = None) -> Array:
    """Stack every per-variant value array into one (n_rows, B) f32
    matrix in the row order build_stamp_pattern assigns. (B, 0) groups
    contribute no rows; unbatched (nI,) current phasors broadcast."""
    B = r_vals.shape[0]
    cols = [r_vals, c_vals, l_vals, v_re, v_im]
    if ext is not None:
        cols.append(jnp.broadcast_to(i_re[None, :], (B, i_re.shape[0])))
        cols.append(jnp.broadcast_to(i_im[None, :], (B, i_im.shape[0])))
        cols.extend([ext["g_gm"], ext["e_gain"], ext["f_gain"],
                     ext["h_r"]])
    vals = jnp.concatenate(
        [jnp.asarray(c, jnp.float32) for c in cols], axis=1)
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
