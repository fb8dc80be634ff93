"""Host NumPy interpreter tier: interactive single-circuit latency.

The reference IS an interpreter (/root/reference/lib/analysis/simulate.ts:5
— parse + a few hundred tiny solves, no compile step), and its headline use
case is ONE small netlist, answer NOW. For that workload every compiled
path pays costs that dwarf the arithmetic: XLA compilation (~1 s for the
sweep programs even at backend-opt level 0) and — on remote-relay TPU
setups — the accelerator client-creation handshake (0.1 s to minutes of
relay-side queueing, paid by the FIRST jax backend touch in a process;
``jax.devices("cpu")`` initializes every registered platform, so even a
CPU-pinned jitted path pays it). This module answers the interactive case
the way the reference does — interpreted, float64 NumPy, zero jax — while
batched/swept/large workloads keep the compiled TPU engines.

Semantics are the reference's, pinned formula-for-formula:
  - AC assembly/solve:  /root/reference/lib/analysis/simulateAC.ts:24-83
    (R as 1/R, C as jwC, L open below EPS, V phasors; Gaussian elimination
    with partial pivoting and the |pivot| < EPS singularity throw,
    lib/math/solveComplex.ts:15-53);
  - TRAN inner loop:    /root/reference/lib/analysis/simulateTRAN.ts:130-252
    (x zero-seeded per step, <= 20 rebuild+solve passes breaking when no
    switch toggled, BE companions, diode clamp [-1, 0.8] with the GMIN
    conductance floor, switch hysteresis update order).

Eligibility is exactly the reference dialect (R/C/L/V/S/D devices, BE
integration, break-on-switch-stability Newton, no .ic/.temp); anything
extended falls back to the compiled engine (utils/placement.py picks the
host-CPU jitted variant for those when tiny). The compiled engine remains
the source of truth at scale; this tier is cross-checked against it on
every reference fixture (tests/test_interp.py) and against the basics01
golden strings.

Set ``SPICEY_TPU_INTERP=0`` to disable (the test suite does, so the
compiled engines keep their end-to-end coverage; dedicated interp tests
re-enable it).
"""

from __future__ import annotations

import os

import numpy as np

from ..constants import (
    DIODE_VD_MAX,
    DIODE_VD_MIN,
    EPS,
    GMIN,
    VT_300K,
)


def interp_enabled() -> bool:
    return os.environ.get("SPICEY_TPU_INTERP", "1") != "0"


def interp_eligible(ckt, tensors) -> bool:
    """Reference-dialect circuits only: R/C/L/V/S/D with reference model
    parameters, no initial conditions, no temperature override. Extended
    devices OR extended model behavior on reference element types (diode
    TT/CJO charge storage — an extra companion this tier does not stamp)
    fall back to the compiled engine."""
    return not (
        ckt.I or ckt.G or ckt.E or ckt.F or ckt.H or ckt.M or ckt.Q
        or ckt.J or ckt.W or ckt.K or ckt.B or ckt.T or ckt.U
        or ckt.initial_conditions or ckt.nodeset
        or any(c.ic is not None for c in ckt.C)
        or any(el.ic is not None for el in ckt.L)
        or ckt.temp_c is not None
        or tensors.has_d_charge
    )


def _ge_solve(aug: np.ndarray) -> tuple[np.ndarray, bool]:
    """Batched Gaussian elimination with partial pivoting on augmented
    systems — the reference's algorithm (solveReal.ts:14-72 /
    solveComplex.ts:15-53) vectorized over a leading batch axis.

    ``aug``: (B, n, n+1) float64 or complex128, modified in place.
    Returns (x (B, n), ok) with ok=False when any batch member hits the
    reference's |max pivot| < EPS singularity condition.
    """
    B, n, _ = aug.shape
    rows = np.arange(B)
    for k in range(n):
        piv = np.argmax(np.abs(aug[:, k:, k]), axis=1) + k
        if not bool(np.all(np.abs(aug[rows, piv, k]) >= EPS)):
            return np.zeros((B, n), dtype=aug.dtype), False
        swap = piv != k
        if np.any(swap):
            tmp = aug[rows, k].copy()
            aug[rows, k] = aug[rows, piv]
            aug[rows, piv] = tmp
        f = aug[:, :, k] / aug[:, k, k][:, None]
        f[:, : k + 1] = 0.0  # eliminate below the pivot row only
        aug -= f[:, :, None] * aug[:, k][:, None, :]
    x = np.zeros((B, n), dtype=aug.dtype)
    for k in range(n - 1, -1, -1):
        s = aug[:, k, n] - np.einsum(
            "bj,bj->b", aug[:, k, k + 1 : n], x[:, k + 1 :]
        )
        x[:, k] = s / aug[:, k, k]
    return x, True


def _lu_factor(A: np.ndarray) -> tuple[np.ndarray, np.ndarray, bool]:
    """Partial-pivot LU with the reference's pivot rule and singularity
    test (|max column pivot| < EPS -> singular). Multipliers are stored
    below the diagonal. Used by the linear-transient fast path: the MNA
    matrix is timestep-invariant when no switches/diodes are present, and
    applying the stored multipliers to b per step performs the SAME
    floating-point operations, in the same order, as re-running the
    augmented elimination — bit-identical to per-step GE at ~O(n^2)/step.
    """
    n = A.shape[0]
    perm = np.arange(n)
    for k in range(n):
        piv = int(np.argmax(np.abs(A[k:, k]))) + k
        if not abs(A[piv, k]) >= EPS:
            return A, perm, False
        if piv != k:
            A[[k, piv]] = A[[piv, k]]
            perm[[k, piv]] = perm[[piv, k]]
        f = A[k + 1:, k] / A[k, k]
        A[k + 1:, k] = f
        A[k + 1:, k + 1:] -= f[:, None] * A[k, k + 1:]
    return A, perm, True


def _lu_solve(lu: np.ndarray, perm: np.ndarray, b: np.ndarray) -> np.ndarray:
    y = b[perm]
    n = lu.shape[0]
    for k in range(n - 1):
        y[k + 1:] -= lu[k + 1:, k] * y[k]
    for k in range(n - 1, -1, -1):
        y[k] = (y[k] - lu[k, k + 1:] @ y[k + 1:]) / lu[k, k]
    return y


def _add_adm(A: np.ndarray, idx: np.ndarray, y: np.ndarray) -> None:
    """4-point admittance scatter into a padded (n+1, n+1[, ...]) matrix
    (stampAdmittance*.ts; ground rows land in the dump slot)."""
    i1, i2 = idx[:, 0], idx[:, 1]
    np.add.at(A, (i1, i1), y)
    np.add.at(A, (i2, i2), y)
    np.add.at(A, (i1, i2), -y)
    np.add.at(A, (i2, i1), -y)


def _add_cur(b: np.ndarray, idx: np.ndarray, cur: np.ndarray) -> None:
    """RHS current injection (stampCurrent*.ts): b[i1] -= I, b[i2] += I."""
    np.add.at(b, idx[:, 0], -cur)
    np.add.at(b, idx[:, 1], cur)


def interp_ac(tensors, freqs: np.ndarray, v_re: np.ndarray,
              v_im: np.ndarray) -> tuple[np.ndarray, bool]:
    """Full AC sweep, interpreted: returns ((F, nvar) complex128 x, ok).

    Assembly is vectorized over the frequency grid with the frequency
    axis LAST (one scatter per device class), then solved by the
    reference's complex Gaussian elimination batched over F.
    """
    n = tensors.nvar
    F = freqs.shape[0]
    w = 2.0 * np.pi * np.asarray(freqs, dtype=np.float64)  # (F,)
    A = np.zeros((n + 1, n + 1, F), dtype=np.complex128)
    b = np.zeros((n + 1, F), dtype=np.complex128)

    if tensors.n_r:
        _add_adm(A, tensors.r_idx,
                 np.broadcast_to((1.0 / tensors.r_vals)[:, None],
                                 (tensors.n_r, F)))
    if tensors.n_c:
        _add_adm(A, tensors.c_idx, 1j * tensors.c_vals[:, None] * w[None, :])
    if tensors.n_l:
        wl = tensors.l_vals[:, None] * w[None, :]
        small = np.abs(wl) < EPS
        y_l = np.where(small, 0.0, -1.0 / np.where(small, 1.0, wl))
        _add_adm(A, tensors.l_idx, 1j * y_l)
    if tensors.n_v:
        i1, i2, j = (tensors.v_idx[:, 0], tensors.v_idx[:, 1],
                     tensors.v_idx[:, 2])
        one = np.ones((tensors.n_v, F))
        np.add.at(A, (i1, j), one)
        np.add.at(A, (j, i1), one)
        np.add.at(A, (i2, j), -one)
        np.add.at(A, (j, i2), -one)
        np.add.at(b, j, np.broadcast_to(
            (v_re + 1j * v_im)[:, None], (tensors.n_v, F)))

    aug = np.concatenate(
        [A[:n, :n], b[:n][:, None, :]], axis=1
    ).transpose(2, 0, 1).copy()  # (F, n, n+1)
    return _ge_solve(aug)


def interp_tran(tensors, vs_grid: np.ndarray, dt: float,
                max_nr: int) -> tuple[np.ndarray, np.ndarray, bool]:
    """Full transient run, interpreted: returns (xs (S+1, nvar),
    sw_states (S+1, nS) bool, ok).

    The per-step loop mirrors simulateTRAN.ts:147-237 exactly; the
    frequency-independent stamp pattern (R, C/L companion conductances,
    V rows) is assembled once and copied per Newton pass — summation
    order differences against the reference are at rounding level.
    """
    n = tensors.nvar
    steps_p1 = vs_grid.shape[0]
    dt_c = max(dt, EPS)

    gc = tensors.c_vals / dt_c  # C companion conductances
    gl = dt_c / tensors.l_vals  # L companion conductances

    A_base = np.zeros((n + 1, n + 1))
    if tensors.n_r:
        _add_adm(A_base, tensors.r_idx, 1.0 / tensors.r_vals)
    if tensors.n_c:
        _add_adm(A_base, tensors.c_idx, gc)
    if tensors.n_l:
        _add_adm(A_base, tensors.l_idx, gl)
    if tensors.n_v:
        i1, i2, j = (tensors.v_idx[:, 0], tensors.v_idx[:, 1],
                     tensors.v_idx[:, 2])
        np.add.at(A_base, (i1, j), 1.0)
        np.add.at(A_base, (j, i1), 1.0)
        np.add.at(A_base, (i2, j), -1.0)
        np.add.at(A_base, (j, i2), -1.0)

    v_prev = np.zeros(tensors.n_c)
    i_prev = np.zeros(tensors.n_l)
    vd_prev = np.zeros(tensors.n_d)
    is_on = np.zeros(tensors.n_s, dtype=bool)

    s_g_on = 1.0 / np.maximum(np.abs(tensors.s_ron), EPS)
    s_g_off = 1.0 / np.maximum(np.abs(tensors.s_roff), EPS)
    d_vth = tensors.d_n * VT_300K

    xs = np.zeros((steps_p1, n))
    sw_states = np.zeros((steps_p1, tensors.n_s), dtype=bool)
    x_pad = np.zeros(n + 1)

    if not (tensors.n_s or tensors.n_d):
        # LINEAR fast path: the MNA matrix never changes across steps —
        # factor once, substitute per step (bit-identical to per-step GE;
        # see _lu_factor). The loop stays sequential (companion state is
        # the loop-carried dependency) but each step is O(n^2).
        lu, perm, ok = _lu_factor(A_base[:n, :n].copy())
        if not ok:
            return xs, sw_states, False
        for step in range(steps_p1):
            b = np.zeros(n + 1)
            if tensors.n_c:
                _add_cur(b, tensors.c_idx, -gc * v_prev)
            if tensors.n_l:
                _add_cur(b, tensors.l_idx, i_prev)
            if tensors.n_v:
                np.add.at(b, tensors.v_idx[:, 2], vs_grid[step])
            x_pad[:n] = _lu_solve(lu, perm, b[:n])
            xs[step] = x_pad[:n]
            if tensors.n_c:
                v_prev = (x_pad[tensors.c_idx[:, 0]]
                          - x_pad[tensors.c_idx[:, 1]])
            if tensors.n_l:
                i_prev = i_prev + gl * (x_pad[tensors.l_idx[:, 0]]
                                        - x_pad[tensors.l_idx[:, 1]])
        return xs, sw_states, True

    for step in range(steps_p1):
        x_pad[:] = 0.0  # x seeded to zero each step (simulateTRAN.ts:149)
        for it in range(max_nr):
            A = A_base.copy()
            b = np.zeros(n + 1)
            if tensors.n_c:
                _add_cur(b, tensors.c_idx, -gc * v_prev)
            if tensors.n_l:
                _add_cur(b, tensors.l_idx, i_prev)
            if tensors.n_v:
                np.add.at(b, tensors.v_idx[:, 2], vs_grid[step])
            if tensors.n_s:
                _add_adm(A, tensors.s_idx[:, :2],
                         np.where(is_on, s_g_on, s_g_off))
            if tensors.n_d:
                vd_it = (x_pad[tensors.d_idx[:, 0]]
                         - x_pad[tensors.d_idx[:, 1]])
                vd = vd_prev if it == 0 else vd_it
                vd_l = np.clip(vd, DIODE_VD_MIN, DIODE_VD_MAX)
                ev = np.exp(vd_l / d_vth)
                i_d = tensors.d_is * (ev - 1.0)
                g_d = np.maximum(tensors.d_is / d_vth * ev, GMIN)
                _add_adm(A, tensors.d_idx, g_d)
                _add_cur(b, tensors.d_idx, i_d - g_d * vd_l)

            aug = np.concatenate(
                [A[:n, :n], b[:n, None]], axis=1)[None]
            x, ok = _ge_solve(aug)
            if not ok:
                return xs, sw_states, False
            x_pad[:n] = x[0]
            x_pad[n] = 0.0

            if not tensors.n_s:
                break
            vctrl = (x_pad[tensors.s_idx[:, 2]]
                     - x_pad[tensors.s_idx[:, 3]])
            new_on = np.where(is_on, ~(vctrl < tensors.s_voff),
                              vctrl > tensors.s_von)
            if bool(np.all(new_on == is_on)):
                break
            is_on = new_on

        xs[step] = x_pad[:n]
        sw_states[step] = is_on

        # state commit (simulateTRAN.ts:221-237)
        if tensors.n_c:
            v_prev = (x_pad[tensors.c_idx[:, 0]]
                      - x_pad[tensors.c_idx[:, 1]])
        if tensors.n_l:
            i_prev = i_prev + gl * (x_pad[tensors.l_idx[:, 0]]
                                    - x_pad[tensors.l_idx[:, 1]])
        if tensors.n_d:
            vd_prev = (x_pad[tensors.d_idx[:, 0]]
                       - x_pad[tensors.d_idx[:, 1]])

    return xs, sw_states, True
