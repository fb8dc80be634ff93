"""MXU-blocked Gauss-Jordan kernel tests (interpret mode on CPU; the
compiled path targets the TPU and is exercised by bench runs).

Same solve contract as ops/pallas_gj.py / ops/linsolve.py — replacing the
reference's scalar elimination (lib/math/solveReal.ts:14-53 /
solveComplex.ts:15-53) with a batch-major blocked-panel formulation whose
trailing updates are MXU matmuls. These tests pin: f32-level accuracy for
every supported N (including identity-padded non-multiples of the panel
width), per-system singularity flags instead of throws (solveReal.ts:28
parity at the host boundary), MNA zero-diagonal pivoting, and agreement
with the batch-last VPU kernel's pivot semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from spicey_tpu.ops.pallas_mxu import (
    MXU_MAX_N,
    MXU_MIN_N,
    blocked_plan,
    mxu_solve_complex,
    mxu_solve_real,
)


def _rand_real(B, N, seed=0, diag=8.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, N, N)).astype(np.float32)
    A += diag * np.eye(N, dtype=np.float32)[None]
    b = rng.standard_normal((B, N)).astype(np.float32)
    return A, b


def _rand_cplx(B, N, seed=0, diag=8.0):
    rng = np.random.default_rng(seed)
    Ar = rng.standard_normal((B, N, N)).astype(np.float32)
    Ar += diag * np.eye(N, dtype=np.float32)[None]
    Ai = rng.standard_normal((B, N, N)).astype(np.float32)
    br = rng.standard_normal((B, N)).astype(np.float32)
    bi = rng.standard_normal((B, N)).astype(np.float32)
    return Ar, Ai, br, bi


# N values covering: exact P=32 multiples, P=16-plan sizes, identity-padded
# awkward sizes, and both interval endpoints.
NS = [MXU_MIN_N, 48, 64, 67, 96, 100, MXU_MAX_N]


@pytest.mark.parametrize("N", NS)
def test_real_accuracy(N):
    A, b = _rand_real(12, N, seed=N)
    x, valid = mxu_solve_real(jnp.asarray(A), jnp.asarray(b), interpret=True)
    ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(x) - ref) / denom).max() < 5e-5
    assert bool(np.asarray(valid).all())


@pytest.mark.parametrize("N", [MXU_MIN_N, 64, 96, MXU_MAX_N])
def test_complex_accuracy(N):
    Ar, Ai, br, bi = _rand_cplx(8, N, seed=N)
    xr, xi, valid = mxu_solve_complex(
        *map(jnp.asarray, (Ar, Ai, br, bi)), interpret=True)
    Ac = Ar.astype(np.float64) + 1j * Ai.astype(np.float64)
    bc = br.astype(np.float64) + 1j * bi.astype(np.float64)
    ref = np.linalg.solve(Ac, bc[..., None])[..., 0]
    got = np.asarray(xr) + 1j * np.asarray(xi)
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(got - ref) / denom).max() < 5e-5
    assert bool(np.asarray(valid).all())


def test_singular_systems_flagged():
    """Exactly-singular systems (zero matrix) must be flagged. Linearly
    DEPENDENT columns are intentionally not asserted: in raw f32 the
    trailing update leaves roundoff-level pivots above EPS (a - (a/pv)*pv
    != 0 in f32) — catching those is the refined tier's residual guard's
    job (ops/pallas_gj.py), same contract as the batch-last raw kernel."""
    A, b = _rand_real(4, 64, seed=3)
    A[1] = 0.0
    x, valid = mxu_solve_real(jnp.asarray(A), jnp.asarray(b), interpret=True)
    v = np.asarray(valid)
    assert v[0] and v[2] and v[3]
    assert not v[1]


def test_complex_singular_flagged():
    Ar, Ai, br, bi = _rand_cplx(3, 64, seed=4)
    Ar[1] = 0.0
    Ai[1] = 0.0
    _, _, valid = mxu_solve_complex(
        *map(jnp.asarray, (Ar, Ai, br, bi)), interpret=True)
    v = np.asarray(valid)
    assert v[0] and v[2] and not v[1]


def test_zero_diagonal_mna_structure():
    """Voltage-source branch rows have zero diagonals — the one-hot pivot
    search must reorder, as in the tiny-N kernel and the reference's
    partial pivot (solveReal.ts:14-28)."""
    N = 64
    rng = np.random.default_rng(5)
    # block MNA-like structure: conductance block + two V-source branch
    # rows/cols with exactly zero diagonal
    G = rng.standard_normal((N - 2, N - 2)).astype(np.float32)
    G += 8 * np.eye(N - 2, dtype=np.float32)
    A = np.zeros((1, N, N), np.float32)
    A[0, : N - 2, : N - 2] = G
    A[0, N - 2, 0] = 1.0
    A[0, 0, N - 2] = 1.0
    A[0, N - 1, 1] = 1.0
    A[0, 1, N - 1] = 1.0
    b = rng.standard_normal((1, N)).astype(np.float32)
    x, valid = mxu_solve_real(jnp.asarray(A), jnp.asarray(b), interpret=True)
    ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    denom = np.abs(ref).max()
    assert (np.abs(np.asarray(x) - ref) / denom).max() < 5e-5
    assert bool(np.asarray(valid).all())


def test_plan_bounds():
    with pytest.raises(ValueError):
        blocked_plan(MXU_MIN_N - 1)
    with pytest.raises(ValueError):
        blocked_plan(MXU_MAX_N + 1)
    for n in NS:
        p, np_, s, widths = blocked_plan(n)
        assert np_ % p == 0 and np_ >= n
        assert len(widths) == np_ // p
        assert s >= np_ + 1 and s % 8 == 0
        # every trailing window must stay inside the scratch extent
        for k, w in enumerate(widths):
            assert (k + 1) * p + w <= s


def test_matches_vpu_kernel_solutions():
    """The MXU tier and the batch-last VPU f32 tier make identical pivot
    choices (same argmax rule); solutions agree to f32 roundoff."""
    from spicey_tpu.ops.pallas_gj import _solve_real_f32

    A, b = _rand_real(6, 64, seed=9)
    x_mxu, v_mxu = mxu_solve_real(jnp.asarray(A), jnp.asarray(b),
                                  interpret=True)
    x_vpu, v_vpu = _solve_real_f32(jnp.asarray(A), jnp.asarray(b),
                                   1e-15, True)
    ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(x_mxu) - ref) / denom).max() < 5e-5
    assert (np.abs(np.asarray(x_vpu) - ref) / denom).max() < 5e-5
    np.testing.assert_array_equal(np.asarray(v_mxu), np.asarray(v_vpu))
