"""Fused Monte-Carlo TRANSIENT kernel: the whole BE time loop in VMEM.

Time-domain twin of ops/pallas_mc_ac.py. For LINEAR circuits under
backward-Euler companions the MNA matrix is timestep-invariant — only
the RHS changes, through the source grid and the companion state. The
engine's batch-native scan still pays, per step, an XLA op-chain over
HBM-resident buffers; at MNA sizes that is dispatch/traffic overhead for
microseconds of arithmetic.

This kernel runs the ENTIRE transient per batch tile inside one Pallas
grid cell:

  1. build A (N, N, TILE_B) in VMEM from the static stamp pattern and
     the per-variant value slab (R conductances, C/L companion
     conductances gc = C/dt and gl = dt/L — precomputed by the caller,
     so dt never enters the kernel — plus G/E/F/H stamps);
  2. reduce [A | I] ONCE with the shared one-hot-pivot Gauss-Jordan
     (ops/pallas_gj._real_inv_scratch) and unpermute the inverse in
     VMEM;
  3. fori_loop over the S+1 timesteps: assemble the RHS rows from SMEM
     source scalars + the companion state carried in registers, apply
     the inverse (N static multiply-adds of (N, TILE_B) slabs), record
     V(node) with a dynamic sublane store, and commit the companion
     state (simulateTRAN.ts:221-231 semantics; t=0 is the quasi-DC
     bootstrap with zero state, :147-149).

HBM traffic for a whole B-variant MC: the (nE, B) values in, the
(S+1, B) probed trajectory out. Nothing per step ever touches HBM.

Eligibility (enforced by the caller, analysis/mc.py): reference-linear
device set R/C/L/V plus extended I/G/E/F/H sources, BE integration,
f32 pallas tier, no switches/diodes/MOSFETs/BJTs/K/T/B-sources, no
per-variant source overrides, N <= 16, and the source grid small enough
for SMEM. Contract: /root/reference/lib/analysis/simulateTRAN.ts:14-231
restricted to the linear stamp set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS
from .pallas_gj import _real_inv_scratch, _z

Array = jax.Array

_LANE = 128
_FUSED_MAX_N = 16
# SMEM source-grid budget: (S+1) * nSrc * 4 bytes
_SMEM_SRC_BUDGET = 16 * 1024
# output VMEM budget governs the tile: (S+1) rows of the trajectory
_VMEM_BUDGET = 6 * 1024 * 1024


def build_tran_pattern(n: int, r_idx: object, c_idx: object,
                       l_idx: object, v_idx: object, n_src_i: int,
                       ext_idx: dict | None = None) -> tuple:
    """Static pattern: (n_rows, a_entries, b_src, c_state, l_state).

    Value-row layout: [R | gc | gl | g | e | f | h] (companion
    conductances in place of raw C/L values). ``a_entries`` is
    ((i, j), terms) with term kinds "one"/"inv"/"lin" as in the AC
    pattern; ``b_src`` is (row, src_col, sign) into the (S+1, nSrc)
    source grid (V branch values first, then I injections);
    ``c_state``/``l_state`` are (elem, i1, i2, value_row) with dump-slot
    indices preserved (the kernel treats row >= n as ground)."""
    a_t: dict = {}

    def add(i: int, j: int, term: tuple) -> None:
        if i < n and j < n:
            a_t.setdefault((int(i), int(j)), []).append(term)

    def adm(idx: object, kind: str, base: int) -> None:
        for k, (i1, i2) in enumerate(np.asarray(idx).reshape(-1, 2)):
            row = base + k
            for (a, b, s) in ((i1, i1, 1.0), (i2, i2, 1.0),
                              (i1, i2, -1.0), (i2, i1, -1.0)):
                add(a, b, (kind, row, s))

    r = np.asarray(r_idx).reshape(-1, 2)
    c = np.asarray(c_idx).reshape(-1, 2)
    l_arr = np.asarray(l_idx).reshape(-1, 2)
    v = np.asarray(v_idx).reshape(-1, 3)
    n_r, n_c, n_l, n_v = (r.shape[0], c.shape[0], l_arr.shape[0],
                          v.shape[0])
    off_gc, off_gl = n_r, n_r + n_c
    adm(r_idx, "inv", 0)
    adm(c_idx, "lin", off_gc)
    adm(l_idx, "lin", off_gl)
    b_src = []
    for k, (i1, i2, j) in enumerate(v):
        for (a, b, s) in ((i1, j, 1.0), (j, i1, 1.0),
                          (i2, j, -1.0), (j, i2, -1.0)):
            add(a, b, ("one", 0, s))
        b_src.append((int(j), k, 1.0))
    # extended I sources: columns n_v.. of the source grid
    # (stampCurrent*.ts: b[i1] -= I, b[i2] += I)
    base = n_r + n_c + n_l
    ii = (np.asarray(ext_idx["i_idx"]).reshape(-1, 2)
          if ext_idx else np.zeros((0, 2), np.int64))
    for k in range(n_src_i):
        i1, i2 = (int(ii[k, 0]), int(ii[k, 1]))
        if i1 < n:
            b_src.append((i1, n_v + k, -1.0))
        if i2 < n:
            b_src.append((i2, n_v + k, 1.0))
    if ext_idx:
        gi = np.asarray(ext_idx["g_idx"]).reshape(-1, 4)
        for k, (i1, i2, cp, cn) in enumerate(gi):
            row = base + k
            for (a, b, s) in ((i1, cp, 1.0), (i1, cn, -1.0),
                              (i2, cp, -1.0), (i2, cn, 1.0)):
                add(a, b, ("lin", row, s))
        base += gi.shape[0]
        ei = np.asarray(ext_idx["e_idx"]).reshape(-1, 5)
        for k, (i1, i2, j, cp, cn) in enumerate(ei):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0),
                              (j, i1, 1.0), (j, i2, -1.0)):
                add(a, b, ("one", 0, s))
            for (a, b, s) in ((j, cp, -1.0), (j, cn, 1.0)):
                add(a, b, ("lin", row, s))
        base += ei.shape[0]
        fi = np.asarray(ext_idx["f_idx"]).reshape(-1, 3)
        for k, (i1, i2, j) in enumerate(fi):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0)):
                add(a, b, ("lin", row, s))
        base += fi.shape[0]
        hi = np.asarray(ext_idx["h_idx"]).reshape(-1, 4)
        for k, (i1, i2, j, jc) in enumerate(hi):
            row = base + k
            for (a, b, s) in ((i1, j, 1.0), (i2, j, -1.0),
                              (j, i1, 1.0), (j, i2, -1.0)):
                add(a, b, ("one", 0, s))
            if j < n and jc < n:
                add(a, b, ("lin", row, -1.0))
        base += hi.shape[0]
    c_state = tuple(
        (k, int(c[k, 0]), int(c[k, 1]), off_gc + k) for k in range(n_c))
    l_state = tuple(
        (k, int(l_arr[k, 0]), int(l_arr[k, 1]), off_gl + k)
        for k in range(n_l))
    a_entries = tuple(sorted(
        (ij, tuple(terms)) for ij, terms in a_t.items()))
    return base, a_entries, tuple(b_src), c_state, l_state


def _fused_tran_kernel(vs_ref: object, ev_ref: object, out_ref: object,
                       valid_ref: object, a_s: object, m_s: object, *,
                       n: int, node_idx: int, eps: float, n_steps: int,
                       pattern: tuple) -> None:
    tb = ev_ref.shape[-1]
    dtype = ev_ref.dtype
    _n_rows, a_entries, b_src, c_state, l_state = pattern
    stamped = {ij for ij, _ in a_entries}
    zero_row = jnp.zeros((1, tb), dtype)

    def val_row(row: int) -> Array:
        return ev_ref[pl.ds(row, 1), :]  # (1, TB)

    # 1. assemble A in VMEM (static unroll; unstamped entries zeroed)
    for i in range(n):
        for j in range(n):
            if (i, j) not in stamped:
                a_s[i, pl.ds(j, 1), :] = zero_row
    for (i, j), terms in a_entries:
        acc = None
        for kind, row, sign in terms:
            s = jnp.asarray(sign, dtype)
            if kind == "one":
                t = jnp.full((1, tb), sign, dtype)
            elif kind == "inv":
                t = s / val_row(row)
            else:  # lin
                t = s * val_row(row)
            acc = t if acc is None else acc + t
        a_s[i, pl.ds(j, 1), :] = acc

    # 2. factor once: [A | I] reduction + in-VMEM row unpermutation
    colidx, valid, rows2 = _real_inv_scratch(
        a_s, m_s, n=n, tb=tb, dtype=dtype, eps=eps)
    valid_ref[:] = valid
    m = m_s[:]
    for i in range(n):
        sel = colidx == jnp.asarray(float(i), dtype)  # (N, TB)
        inv_i = jnp.sum(jnp.where(sel[:, None, :], m, 0.0), axis=0)
        a_s[pl.ds(i, 1), :, :] = inv_i[None, :, :]
    inv = a_s[:]  # (N, N, TB) — A^{-1}

    def row_of(x: Array, i: int) -> Array:
        """x[i] as (1, TB) without 1-D intermediates (i may be the dump
        slot >= n, which is ground = 0)."""
        if i >= n:
            return zero_row
        return jnp.sum(jnp.where(rows2 == jnp.asarray(float(i), dtype),
                                 x, 0.0), axis=0, keepdims=True)

    # 3. the time loop: state carried as per-element (1, TB) rows
    def step(s: Array, carry: tuple) -> tuple:
        v_prev, i_prev = carry
        b_rows: dict[int, Array] = {}

        def badd(i: int, t: Array) -> None:
            b_rows[i] = t if i not in b_rows else b_rows[i] + t

        for (i, col, sign) in b_src:
            src = vs_ref[s, col] * jnp.asarray(sign, dtype)
            badd(i, jnp.full((1, tb), 1.0, dtype) * src)
        for (k, i1, i2, gc_row) in c_state:
            # stamp_current with I = -gc*v_prev: b[i1] += gc*v_prev ...
            t = val_row(gc_row) * v_prev[k]
            if i1 < n:
                badd(i1, t)
            if i2 < n:
                badd(i2, -t)
        for (k, i1, i2, _gl_row) in l_state:
            # stamp_current with I = +i_prev: b[i1] -= i_prev ...
            if i1 < n:
                badd(i1, -i_prev[k])
            if i2 < n:
                badd(i2, i_prev[k])

        x = None
        for j in range(n):
            if j not in b_rows:
                continue
            t = inv[:, j, :] * b_rows[j]  # (N, TB) * (1, TB)
            x = t if x is None else x + t
        if x is None:
            x = jnp.zeros((n, tb), dtype)

        out_ref[pl.ds(s, 1), :] = row_of(x, node_idx)

        # state commit (simulateTRAN.ts:221-231)
        v_new = tuple(
            row_of(x, i1) - row_of(x, i2)
            for (_k, i1, i2, _g) in c_state)
        i_new = tuple(
            i_prev[k] + val_row(gl_row) * (row_of(x, i1) - row_of(x, i2))
            for (k, i1, i2, gl_row) in l_state)
        return v_new, i_new

    init = (tuple(zero_row for _ in c_state),
            tuple(zero_row for _ in l_state))
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step, init)


def _tran_tile(n: int, n_steps: int, n_rows: int) -> int:
    per_lane = 4 * (n_steps + 2 * n * n + n_rows + 10 * n)
    tile = _VMEM_BUDGET // (per_lane * _LANE) * _LANE
    return int(max(_LANE, min(2048, tile)))


@functools.partial(
    jax.jit, static_argnames=("n", "node_idx", "pattern", "eps",
                              "interpret"))
def mc_tran_fused_f32(vs_grid: Array, values: Array, n: int,
                      node_idx: int, pattern: tuple, eps: float = EPS,
                      interpret: bool = False) -> tuple[Array, Array]:
    """Fused whole-transient MC: vs_grid (S+1, nSrc), values (n_rows, B)
    -> (v_node (B, S+1) f32, valid (B,) bool)."""
    f32 = jnp.float32
    vs_grid = vs_grid.astype(f32)
    if vs_grid.shape[1] == 0:  # sourceless deck: keep SMEM non-empty
        vs_grid = jnp.zeros((vs_grid.shape[0], 1), f32)
    values = values.astype(f32)
    n_steps = vs_grid.shape[0]
    B = values.shape[-1]
    tile = _tran_tile(n, n_steps, values.shape[0])
    pad = (-B) % tile
    if pad:
        values = jnp.concatenate(
            [values, jnp.ones((values.shape[0], pad), f32)], axis=-1)
    Bp = B + pad
    kernel = functools.partial(
        _fused_tran_kernel, n=n, node_idx=node_idx, eps=eps,
        n_steps=n_steps, pattern=pattern)
    out, valid = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((n_steps, vs_grid.shape[1]),
                         lambda i: (_z(), _z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((values.shape[0], tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_steps, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, Bp), f32),
            jax.ShapeDtypeStruct((1, Bp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n, tile), f32),
            pltpu.VMEM((n, n, tile), f32),
        ],
        interpret=interpret,
    )(vs_grid, values)
    return out[:, :B].T, valid[0, :B] > 0.5
