"""Structured bordered-block-diagonal (Schur-complement) solver tier.

The reference's dense Gaussian elimination (solveReal.ts:3, solveComplex.ts:4)
is O(N^3) per system and tops out — in this engine's Pallas form — at N=128
(VMEM budget, ops/pallas_gj.py). Real boards are bigger but *structured*:
the extended dialect's ``.subckt`` flattener names every instance element
``<el>.<instance-path>`` (parsing/netlist.py, _expand_instance), so the MNA
matrix is bordered block diagonal — each instance's interior unknowns couple
only among themselves and to a thin interface border (ports, top-level nets).

This tier exploits that structure TPU-first:

  1. ``plan_partition`` (host, NumPy) derives the partition from *element
     connectivity*, not names-as-trust: an unknown is interior to block g iff
     every element that stamps it belongs to instance group g (group = the
     element name's top-level instance suffix). Unknowns touched by multiple
     groups or by top-level elements form the interface. A fixpoint pass
     promotes structurally-singular block rows/columns (e.g. a V-source
     branch between two port nodes) to the interface, so each diagonal block
     is structurally nonsingular by construction.
  2. ``schur_solve`` / ``schur_solve_planes`` (device): gather the K padded
     (n_max, n_max) diagonal blocks plus full-width borders from the dense
     assembled matrix, run ONE batched multi-RHS Gauss-Jordan over all
     interiors (the engine's proven batched-tiny-solve primitive), form the
     interface Schur complement S = D - sum_k C_k A_kk^{-1} B_k with batched
     MXU matmuls, solve S (size N_I <= ~128, the fast dense regime), and
     back-substitute. Flops drop from N^3 to K*n^2*(n+N_I) + N_I^3 — at
     N=512 with 16 blocks of 28 plus a 64-wide interface that is ~100x.

Pivoting is partial *within* blocks (and within the Schur system) — the
classic BBD compromise. Per-system ``valid`` flags (block solves AND Schur
solve) surface numerical failure exactly like the dense tiers; callers fall
back to dense on invalid.

Everything here is vmap-friendly: ``schur_solve*`` take one (N, N) system
and batch via vmap over frequency / Monte-Carlo axes, like the dense tiers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

from ..constants import EPS
from .linsolve import (gj_solve, gj_solve_multi, gj_solve_planes,
                       gj_solve_planes_multi)


# ---------------------------------------------------------------------------
# Host-side partition planning
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SchurPlan:
    """Static partition of the MNA unknowns for the structured tier.

    blk_ix[k, i] is the global unknown index of block k's i-th interior
    slot (0-padded where blk_mask is False); if_ix lists the interface
    unknowns. Together they cover every unknown exactly once.
    """

    blk_ix: np.ndarray    # (K, n_max) int32
    blk_mask: np.ndarray  # (K, n_max) bool
    if_ix: np.ndarray     # (N_I,) int32
    nvar: int
    group_names: tuple[str, ...] = field(default=())

    @property
    def n_blocks(self) -> int:
        return self.blk_ix.shape[0]

    @property
    def n_max(self) -> int:
        return self.blk_ix.shape[1]

    @property
    def n_interface(self) -> int:
        return self.if_ix.shape[0]

    def arrays(self) -> dict:
        """jnp views for passing into jitted solvers."""
        return {
            "blk_ix": jnp.asarray(self.blk_ix),
            "blk_mask": jnp.asarray(self.blk_mask),
            "if_ix": jnp.asarray(self.if_ix),
        }


def _group_of(name: str) -> str | None:
    """Top-level instance group of a flattened element name.

    ``_expand_instance`` suffixes names with the instance path
    (``r1.x3.x1`` = r1 inside x3 inside x1), so the LAST dot component is
    the top-level instance. Top-level elements have no suffix -> None.
    Correctness never depends on this being subckt-derived: the partition
    is validated by connectivity, so an accidental dot in a user name can
    only change the blocking, not the solution.
    """
    if "." in name:
        return name.rsplit(".", 1)[1].lower()
    return None


def _element_structs(tensors: object) -> list[tuple[str | None, list[int],
                                            list[tuple[int, int]]]]:
    """(group, touched-unknowns, structural (row, col) entries) per element.

    Mirrors the stamp patterns in ops/stamps.py exactly; dump-slot (ground)
    indices are filtered by the caller. Touch sets drive interface
    detection; the (row, col) pairs drive the structural-singularity
    promotion pass.
    """
    out: list[tuple[str | None, list[int], list[tuple[int, int]]]] = []
    dump = tensors.nvar

    def adm(idx_arr: np.ndarray, names: tuple) -> None:
        for (i1, i2), nm in zip(idx_arr, names):
            i1, i2 = int(i1), int(i2)
            touch = [u for u in (i1, i2) if u != dump]
            pairs = [(r, c) for r in (i1, i2) for c in (i1, i2)
                     if r != dump and c != dump]
            out.append((_group_of(nm), touch, pairs))

    adm(tensors.r_idx, tensors.r_names)
    adm(tensors.c_idx, tensors.c_names)
    adm(tensors.l_idx, tensors.l_names)
    adm(tensors.d_idx, tensors.d_names)
    # switches stamp Ron/Roff admittance between i1, i2 in TRAN; control
    # nodes are read from x only (no matrix entry)
    adm(tensors.s_idx[:, :2] if tensors.s_idx.size else tensors.s_idx,
        tensors.s_names)

    for (i1, i2, br), nm in zip(tensors.v_idx, tensors.v_names):
        i1, i2, br = int(i1), int(i2), int(br)
        touch = [u for u in (i1, i2, br) if u != dump]
        pairs = []
        for n in (i1, i2):
            if n != dump:
                pairs += [(n, br), (br, n)]
        out.append((_group_of(nm), touch, pairs))

    for row, nm in zip(tensors.g_idx, tensors.g_names):
        i1, i2, cp, cn = (int(v) for v in row)
        touch = [u for u in (i1, i2, cp, cn) if u != dump]
        pairs = [(r, c) for r in (i1, i2) for c in (cp, cn)
                 if r != dump and c != dump]
        out.append((_group_of(nm), touch, pairs))

    for row, nm in zip(tensors.e_idx, tensors.e_names):
        i1, i2, br, cp, cn = (int(v) for v in row)
        touch = [u for u in (i1, i2, br, cp, cn) if u != dump]
        pairs = []
        for n in (i1, i2):
            if n != dump:
                pairs += [(n, br), (br, n)]
        for c in (cp, cn):
            if c != dump:
                pairs.append((br, c))
        out.append((_group_of(nm), touch, pairs))

    for row, nm in zip(tensors.f_idx, tensors.f_names):
        i1, i2, cb = (int(v) for v in row)
        touch = [u for u in (i1, i2, cb) if u != dump]
        pairs = [(r, cb) for r in (i1, i2) if r != dump]
        out.append((_group_of(nm), touch, pairs))

    for row, nm in zip(tensors.h_idx, tensors.h_names):
        i1, i2, br, cb = (int(v) for v in row)
        touch = [u for u in (i1, i2, br, cb) if u != dump]
        pairs = [(br, cb)]
        for n in (i1, i2):
            if n != dump:
                pairs += [(n, br), (br, n)]
        out.append((_group_of(nm), touch, pairs))

    def three_term(idx_arr: np.ndarray, names: tuple) -> None:
        # NR linearization cross-couples all terminal pairs (overapprox
        # is safe: extra structural entries can only ADD interface nodes
        # or keep a row that the valid flag would catch)
        for row, nm in zip(idx_arr, names):
            ids = [int(v) for v in row]
            touch = [u for u in ids if u != dump]
            pairs = [(r, c) for r in touch for c in touch]
            out.append((_group_of(nm), touch, pairs))

    three_term(tensors.m_idx, tensors.m_names)
    three_term(tensors.q_idx, tensors.q_names)

    for row, nm in zip(tensors.t_idx, tensors.t_names):
        i1, i2, i3, i4, b1, b2 = (int(v) for v in row)
        touch = [u for u in (i1, i2, i3, i4, b1, b2) if u != dump]
        pairs = [(b1, b1), (b2, b2), (b1, b2), (b2, b1)]
        for (p, q, br, op_, oq) in ((i1, i2, b1, i3, i4),
                                    (i3, i4, b2, i1, i2)):
            for n in (p, q):
                if n != dump:
                    pairs += [(n, br), (br, n)]
            for n in (op_, oq):
                if n != dump:
                    pairs.append((br, n))
        out.append((_group_of(nm), touch, pairs))

    # current sources are RHS-only: no matrix entries, no touch needed
    return out


def plan_partition(ckt: object, tensors: object,
                   max_interface: int | None = None,
                   min_blocks: int = 2,
                   min_speedup: float = 2.0) -> SchurPlan | None:
    """Derive a BBD partition from the circuit, or None if not worthwhile.

    Returns None when: behavioral sources exist (their v()/i() references
    couple arbitrary unknowns), mutual couplings exist (the dense M^{-1}
    companion couples every inductor), fewer than ``min_blocks`` non-empty
    blocks emerge, the interface exceeds ``max_interface``, or the
    estimated flop ratio vs dense elimination is below ``min_speedup``.

    ``max_interface`` defaults to ``max(256, nvar // 2)``: the profitability
    guard is the flop model, not the absolute border size — a board whose
    border grows with its stage count (2 unknowns/stage on the bench board)
    must not fall back to the O(N^3) dense tier just for being large.
    """
    if ckt is not None and getattr(ckt, "B", None):
        return None
    if tensors.n_k:
        return None
    nvar = tensors.nvar
    if nvar < 32:
        return None
    if max_interface is None:
        max_interface = max(256, nvar // 2)

    elems = _element_structs(tensors)

    touch_groups: dict[int, set] = {}
    for g, touch, _ in elems:
        for u in touch:
            touch_groups.setdefault(u, set()).add(g)

    block_of: dict[int, str] = {}
    interface: set[int] = set()
    for u in range(nvar):
        gs = touch_groups.get(u, set())
        if len(gs) == 1 and None not in gs:
            block_of[u] = next(iter(gs))
        else:
            # untouched unknowns (can't normally happen) and multi-group /
            # top-level unknowns go to the border
            interface.add(u)

    # structural adjacency (rows -> cols and the reverse)
    adj: dict[int, set] = {}
    radj: dict[int, set] = {}
    for _, _, pairs in elems:
        for r, c in pairs:
            adj.setdefault(r, set()).add(c)
            radj.setdefault(c, set()).add(r)

    # fixpoint: a block row/column that has no structural entry inside its
    # own block would make A_kk singular (e.g. a V branch between two
    # ports); promote such unknowns to the interface
    changed = True
    while changed:
        changed = False
        for u in list(block_of):
            g = block_of[u]
            row_ok = any(c == u or block_of.get(c) == g
                         for c in adj.get(u, ()))
            col_ok = any(r == u or block_of.get(r) == g
                         for r in radj.get(u, ()))
            if not (row_ok and col_ok):
                del block_of[u]
                interface.add(u)
                changed = True

    groups: dict[str, list[int]] = {}
    for u, g in block_of.items():
        groups.setdefault(g, []).append(u)
    groups = {g: sorted(us) for g, us in groups.items() if us}
    if len(groups) < min_blocks:
        return None
    n_i = len(interface)
    if n_i == 0 or n_i > max_interface:
        return None

    K = len(groups)
    n_max = max(len(us) for us in groups.values())
    # flop model: block eliminations (multi-RHS width n_max + N_I + 1),
    # Schur matmuls, interface solve — vs one dense elimination
    flops_schur = (K * n_max * n_max * (n_max + n_i + 1)
                   + 2 * K * n_max * n_i * (n_max + n_i)
                   + n_i ** 3)
    flops_dense = nvar ** 3
    if flops_dense < min_speedup * flops_schur:
        return None

    names = tuple(sorted(groups))
    blk_ix = np.zeros((K, n_max), np.int32)
    blk_mask = np.zeros((K, n_max), bool)
    for k, g in enumerate(names):
        us = groups[g]
        blk_ix[k, :len(us)] = us
        blk_mask[k, :len(us)] = True
    if_ix = np.asarray(sorted(interface), np.int32)
    return SchurPlan(blk_ix=blk_ix, blk_mask=blk_mask, if_ix=if_ix,
                     nvar=nvar, group_names=names)


def plan_partition_op(ckt: object, tensors: object,
                      **kw: object) -> SchurPlan | None:
    """Partition for the DC operating-point system (analysis/op.py).

    Op unknowns 0..nvar-1 are exactly the tran/AC unknowns; one extra
    0V-short branch per inductor is appended at nvar+k (_op_indices), so
    the base plan transfers with two deltas:

      - capacitors stamp NOTHING at DC — structural entries only
        *disappear*, which can never put an entry outside the partition;
        a block made structurally singular by a vanished C is caught by
        the per-system valid flag and the caller's dense fallback;
      - each inductor's admittance pattern becomes the V-short pattern
        (rows/cols between its nodes and the NEW branch unknown). The
        branch joins its inductor's block when one of the nodes is
        interior there — its row/col then has an in-block entry — and
        borders otherwise (e.g. an L directly between two ports).
    """
    base = plan_partition(ckt, tensors, **kw)
    if base is None:
        return None
    nvar = tensors.nvar
    n_l = tensors.n_l
    if n_l == 0:
        return base
    block_of: dict[int, int] = {}
    for k in range(base.n_blocks):
        for i in range(base.n_max):
            if base.blk_mask[k, i]:
                block_of[int(base.blk_ix[k, i])] = k
    groups: dict[int, list[int]] = {k: [] for k in range(base.n_blocks)}
    for u, k in block_of.items():
        groups[k].append(u)
    interface = [int(u) for u in base.if_ix]
    gname = {g: k for k, g in enumerate(base.group_names)}
    for j, ((i1, i2), nm) in enumerate(zip(tensors.l_idx, tensors.l_names)):
        br = nvar + j
        g = _group_of(nm)
        k = gname.get(g) if g is not None else None
        if k is not None and (block_of.get(int(i1)) == k
                              or block_of.get(int(i2)) == k):
            groups[k].append(br)
        else:
            interface.append(br)
    K = base.n_blocks
    n_max = max(len(us) for us in groups.values())
    blk_ix = np.zeros((K, n_max), np.int32)
    blk_mask = np.zeros((K, n_max), bool)
    for k in range(K):
        us = sorted(groups[k])
        blk_ix[k, :len(us)] = us
        blk_mask[k, :len(us)] = True
    return SchurPlan(blk_ix=blk_ix, blk_mask=blk_mask,
                     if_ix=np.asarray(sorted(interface), np.int32),
                     nvar=nvar + n_l, group_names=base.group_names)


# ---------------------------------------------------------------------------
# Device-side solves (one system; vmap for batches)
# ---------------------------------------------------------------------------


def _gather_blocks(A: Array, blk_ix: Array, blk_mask: Array,
                   if_ix: Array, dtype: object
                   ) -> tuple[Array, Array, Array, Array]:
    """Slice diagonal blocks + borders + interface block out of dense A.

    Padded block slots become identity rows/cols (solve to 0, harmless).
    """
    m2 = blk_mask[:, :, None] & blk_mask[:, None, :]
    n_max = blk_ix.shape[1]
    eye = jnp.eye(n_max, dtype=dtype)
    Abb = A[blk_ix[:, :, None], blk_ix[:, None, :]]          # (K, n, n)
    Abb = jnp.where(m2, Abb, eye[None])
    Bb = A[blk_ix[:, :, None], if_ix[None, None, :]]         # (K, n, NI)
    Bb = jnp.where(blk_mask[:, :, None], Bb, 0)
    Cb = A[if_ix[None, :, None], blk_ix[:, None, :]]         # (K, NI, n)
    Cb = jnp.where(blk_mask[:, None, :], Cb, 0)
    D = A[if_ix[:, None], if_ix[None, :]]                    # (NI, NI)
    return Abb, Bb, Cb, D


def _scatter_back(xk: Array, xI: Array, blk_ix: Array,
                  blk_mask: Array, if_ix: Array, nvar: int,
                  dtype: object) -> Array:
    x = jnp.zeros((nvar + 1,), dtype)
    safe_ix = jnp.where(blk_mask, blk_ix, nvar)  # pads land in a dump slot
    x = x.at[safe_ix].set(xk)
    x = x.at[if_ix].set(xI)
    return x[:nvar]


def schur_solve(A: Array, b: Array, blk_ix: Array, blk_mask: Array,
                if_ix: Array, eps: float = EPS) -> tuple[Array, Array]:
    """Real structured solve of one dense-assembled (N, N) system.

    A, b come straight from the existing scatter-add assembly (the tier
    changes the SOLVE, not the stamping); blk_ix/blk_mask/if_ix from a
    SchurPlan. Returns (x: (N,), valid: scalar bool).
    """
    dtype = A.dtype
    Abb, Bb, Cb, D = _gather_blocks(A, blk_ix, blk_mask, if_ix, dtype)
    bk = jnp.where(blk_mask, b[blk_ix], 0)                   # (K, n)
    bI = b[if_ix]                                            # (NI,)

    rhs = jnp.concatenate([bk[:, :, None], Bb], axis=2)      # (K, n, 1+NI)
    Y, blk_valid = jax.vmap(gj_solve_multi, in_axes=(0, 0, None))(
        Abb, rhs, eps)
    y, W = Y[:, :, 0], Y[:, :, 1:]

    S = D - jnp.einsum("kin,knj->ij", Cb, W)
    rS = bI - jnp.einsum("kin,kn->i", Cb, y)
    xI, s_valid = gj_solve(S, rS, eps)
    xk = y - jnp.einsum("knj,j->kn", W, xI)

    valid = jnp.logical_and(jnp.all(blk_valid), s_valid)
    x = _scatter_back(xk, xI, blk_ix, blk_mask, if_ix, A.shape[-1], dtype)
    return x, valid


def schur_solve_planes(A_re: Array, A_im: Array, b_re: Array, b_im: Array,
                       blk_ix: Array, blk_mask: Array, if_ix: Array,
                       eps: float = EPS) -> tuple[Array, Array, Array]:
    """Complex structured solve on (re, im) planes (TPU has no complex).

    Same algorithm as ``schur_solve`` with plane arithmetic: the block
    eliminations and the interface solve pivot on |pivot|^2 (reference
    complex semantics, solveComplex.ts:24); the Schur updates are four
    real MXU einsums per complex product.
    """
    dtype = A_re.dtype
    Arr, Brr, Crr, Dr = _gather_blocks(A_re, blk_ix, blk_mask, if_ix, dtype)
    Aii, Bii, Cii, Di = _gather_blocks(A_im, blk_ix, blk_mask, if_ix, dtype)
    # imaginary plane padding must be 0, not identity, on the pad diagonal
    m2 = blk_mask[:, :, None] & blk_mask[:, None, :]
    Aii = jnp.where(m2, Aii, 0)
    bkr = jnp.where(blk_mask, b_re[blk_ix], 0)
    bki = jnp.where(blk_mask, b_im[blk_ix], 0)
    bIr = b_re[if_ix]
    bIi = b_im[if_ix]

    rhs_r = jnp.concatenate([bkr[:, :, None], Brr], axis=2)
    rhs_i = jnp.concatenate([bki[:, :, None], Bii], axis=2)
    Yr, Yi, blk_valid = jax.vmap(
        gj_solve_planes_multi, in_axes=(0, 0, 0, 0, None))(
        Arr, Aii, rhs_r, rhs_i, eps)
    yr, Wr = Yr[:, :, 0], Yr[:, :, 1:]
    yi, Wi = Yi[:, :, 0], Yi[:, :, 1:]

    # S = D - sum_k C_k W_k (complex product on planes)
    Sr = Dr - (jnp.einsum("kin,knj->ij", Crr, Wr)
               - jnp.einsum("kin,knj->ij", Cii, Wi))
    Si = Di - (jnp.einsum("kin,knj->ij", Crr, Wi)
               + jnp.einsum("kin,knj->ij", Cii, Wr))
    rSr = bIr - (jnp.einsum("kin,kn->i", Crr, yr)
                 - jnp.einsum("kin,kn->i", Cii, yi))
    rSi = bIi - (jnp.einsum("kin,kn->i", Crr, yi)
                 + jnp.einsum("kin,kn->i", Cii, yr))
    xIr, xIi, s_valid = gj_solve_planes(Sr, Si, rSr, rSi, eps)

    xkr = yr - (jnp.einsum("knj,j->kn", Wr, xIr)
                - jnp.einsum("knj,j->kn", Wi, xIi))
    xki = yi - (jnp.einsum("knj,j->kn", Wr, xIi)
                + jnp.einsum("knj,j->kn", Wi, xIr))

    valid = jnp.logical_and(jnp.all(blk_valid), s_valid)
    nvar = A_re.shape[-1]
    x_re = _scatter_back(xkr, xIr, blk_ix, blk_mask, if_ix, nvar, dtype)
    x_im = _scatter_back(xki, xIi, blk_ix, blk_mask, if_ix, nvar, dtype)
    return x_re, x_im, valid
