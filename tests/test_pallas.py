"""Pallas batch-major Gauss-Jordan kernel tests (interpret mode on CPU; the
compiled path targets the TPU and is exercised by bench/production runs).

Contract being replaced: lib/math/solveReal.ts / solveComplex.ts — same
pivot-threshold semantics (|pivot| >= EPS), flagged per system instead of
thrown."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spicey_tpu.ops.pallas_gj import (
    pallas_gj_solve_complex,
    pallas_gj_solve_real,
)


def _rand_systems(B, N, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    if complex_:
        return (rng.normal(size=(B, N, N)), rng.normal(size=(B, N, N)),
                rng.normal(size=(B, N)), rng.normal(size=(B, N)))
    return rng.normal(size=(B, N, N)), rng.normal(size=(B, N))


@pytest.mark.parametrize("N", [3, 6, 13])
def test_real_refined_accuracy(N):
    A, b = _rand_systems(200, N)
    x, valid = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True)
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    # relative to solution magnitude: refinement reaches ~f64 for
    # well-conditioned systems; allow slack for random outliers
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    rel = (np.abs(np.asarray(x) - ref) / denom).max()
    assert rel < 1e-9
    assert bool(np.asarray(valid).all())


def test_real_f32_only_is_coarser():
    A, b = _rand_systems(100, 6, seed=1)
    x0, _ = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b), refine=0,
                                 interpret=True)
    x2, _ = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b), refine=2,
                                 interpret=True)
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    err0 = np.abs(np.asarray(x0) - ref).max()
    err2 = np.abs(np.asarray(x2) - ref).max()
    assert err2 < err0 / 100


def test_complex_refined_accuracy():
    Ar, Ai, br, bi = _rand_systems(200, 6, seed=2, complex_=True)
    xr, xi, valid = pallas_gj_solve_complex(
        *map(jnp.asarray, (Ar, Ai, br, bi)), interpret=True
    )
    ref = np.linalg.solve(Ar + 1j * Ai, (br + 1j * bi)[..., None])[..., 0]
    got = np.asarray(xr) + 1j * np.asarray(xi)
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(got - ref) / denom).max() < 1e-9
    assert bool(np.asarray(valid).all())


def test_singular_systems_flagged():
    A, b = _rand_systems(4, 3, seed=3)
    A[1] = 0.0
    A[3, :, 0] = A[3, :, 1]  # linearly dependent columns
    x, valid = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True)
    v = np.asarray(valid)
    assert v[0] and v[2]
    assert not v[1]


def test_zero_diagonal_mna_structure():
    """Voltage-source branch rows have zero diagonals — pivoting must
    reorder (the no-pivot failure mode of naive GE)."""
    A = np.array([[[1 / 30, -1 / 30, 1.0],
                   [-1 / 30, 1 / 30 + 1e-3, 0.0],
                   [1.0, 0.0, 0.0]]])
    b = np.array([[0.0, 0.0, 1.0]])
    x, valid = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True)
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-10)
    assert bool(np.asarray(valid).all())


def test_vmap_composes():
    A, b = _rand_systems(120, 5, seed=4)
    A = A.reshape(4, 30, 5, 5)
    b = b.reshape(4, 30, 5)
    f = jax.vmap(lambda A, b: pallas_gj_solve_real(A, b, interpret=True))
    x, v = f(jnp.asarray(A), jnp.asarray(b))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(x) - ref) / denom).max() < 1e-8
    assert x.shape == (4, 30, 5)


def _ill_conditioned(B, N, cond, seed=0):
    """SVD-constructed systems with a prescribed condition number."""
    rng = np.random.default_rng(seed)
    mats = []
    for _ in range(B):
        U, _ = np.linalg.qr(rng.normal(size=(N, N)))
        V, _ = np.linalg.qr(rng.normal(size=(N, N)))
        s = np.logspace(0, -np.log10(cond), N)
        mats.append(U @ np.diag(s) @ V.T)
    return np.stack(mats), rng.normal(size=(B, N))


def test_refinement_guard_flags_divergence():
    """cond ~ 1e10 (the Roff=1e12 switch-circuit class) breaks f32
    refinement; with fallback disabled the residual guard must clear
    `valid` rather than return silently-wrong results."""
    A, b = _ill_conditioned(8, 6, 1e10, seed=5)
    x, valid = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True, fallback=False)
    assert not bool(np.asarray(valid).any())


def test_refinement_guard_fallback_matches_f64():
    """With fallback on (the default), diverged systems are re-solved on
    the f64 gj path: results match numpy f64 to the cond*eps_f64 bound and
    stay valid."""
    A, b = _ill_conditioned(8, 6, 1e10, seed=5)
    x, valid = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True)
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(x) - ref) / denom).max() < 1e-5
    assert bool(np.asarray(valid).all())


def test_refinement_guard_complex():
    Ar, br = _ill_conditioned(6, 5, 1e10, seed=6)
    _, bi = _ill_conditioned(6, 5, 1e10, seed=7)
    # A = (1 + 1e-3 j) * Ar keeps cond(A) = cond(Ar) = 1e10 — an
    # independent random Ai would regularize the complex matrix
    Ai = Ar * 1e-3
    args = tuple(map(jnp.asarray, (Ar, Ai, br, bi)))
    xr_g, xi_g, v_g = pallas_gj_solve_complex(*args, interpret=True,
                                              fallback=False)
    xr, xi, valid = pallas_gj_solve_complex(*args, interpret=True)
    ref = np.linalg.solve(Ar + 1j * Ai, (br + 1j * bi)[..., None])[..., 0]
    got = np.asarray(xr) + 1j * np.asarray(xi)
    denom = np.abs(ref).max(axis=-1, keepdims=True)
    # guard-only run flags at least the diverged systems...
    unguarded = np.asarray(xr_g) + 1j * np.asarray(xi_g)
    diverged = (np.abs(unguarded - ref) / denom).max(axis=-1) > 1e-6
    assert not np.asarray(v_g)[diverged].any()
    # ...and the fallback run recovers f64 accuracy, all valid
    assert (np.abs(got - ref) / denom).max() < 1e-5
    assert bool(np.asarray(valid).all())


def test_well_conditioned_never_falls_back():
    """Residual guard must not flag ordinary systems (no false positives)."""
    A, b = _rand_systems(200, 6, seed=8)
    x, valid = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True, fallback=False)
    assert bool(np.asarray(valid).all())


def test_switch_circuit_pallas_matches_gj():
    """End-to-end: a VSWITCH transient (Roff-class conductance spread)
    through method='pallas' must match the f64 gj path — the guarded tier
    either refines successfully or falls back, never silently diverges."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from fixtures.netlists import VSWITCH_PWL

    from spicey_tpu.analysis.batch import simulate_tran_batch

    overrides = {"R1": np.array([100.0, 150.0])}
    ref = simulate_tran_batch(VSWITCH_PWL, overrides, method="gj")
    got = simulate_tran_batch(VSWITCH_PWL, overrides, method="pallas",
                              interpret=True)
    np.testing.assert_allclose(got.xs, ref.xs, rtol=1e-6, atol=1e-9)


def test_large_n_refined_falls_back_to_resolve():
    """Above _INV_KERNEL_MAX_N the refined f64 tier re-eliminates per
    refinement round (the inverse kernel's blocks exceed scoped VMEM);
    accuracy must still reach f64 level under the residual guard."""
    N, B = 100, 4
    rng = np.random.default_rng(3)
    A = rng.standard_normal((B, N, N)) + N * np.eye(N)[None]
    b = rng.standard_normal((B, N))
    x, valid = pallas_gj_solve_real(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True)
    assert bool(np.asarray(valid).all())
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-9, atol=1e-11)

    Ar = rng.standard_normal((B, N, N)) + N * np.eye(N)[None]
    Ai = rng.standard_normal((B, N, N))
    br = rng.standard_normal((B, N))
    bi = rng.standard_normal((B, N))
    xr, xi, valid = pallas_gj_solve_complex(
        jnp.asarray(Ar), jnp.asarray(Ai), jnp.asarray(br),
        jnp.asarray(bi), interpret=True)
    assert bool(np.asarray(valid).all())
    refc = np.linalg.solve(Ar + 1j * Ai, (br + 1j * bi)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(xr) + 1j * np.asarray(xi), refc,
                               rtol=1e-9, atol=1e-11)
