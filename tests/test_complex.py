"""Complex helper class tests (contract: /root/reference/lib/math/Complex.ts)."""

import math

import pytest

from spicey_tpu import Complex


def test_arith():
    a = Complex(1, 2)
    b = Complex(3, -1)
    assert a.add(b) == Complex(4, 1)
    assert a.sub(b) == Complex(-2, 3)
    assert a.mul(b) == Complex(5, 5)
    q = a.div(b)
    assert q.re == pytest.approx(0.1)
    assert q.im == pytest.approx(0.7)
    inv = b.inv()
    assert inv.re == pytest.approx(0.3)
    assert inv.im == pytest.approx(0.1)


def test_polar_degrees():
    c = Complex.fromPolar(2.0, 90.0)
    assert c.re == pytest.approx(0.0, abs=1e-15)
    assert c.im == pytest.approx(2.0)
    assert c.abs() == pytest.approx(2.0)
    assert c.phaseDeg() == pytest.approx(90.0)
    assert Complex.from_polar(1.0).re == 1.0


def test_div_by_zero_guard():
    with pytest.raises(ZeroDivisionError):
        Complex(1, 0).div(Complex(0, 0))
    with pytest.raises(ZeroDivisionError):
        Complex(0, 0).inv()


def test_interop():
    assert complex(Complex(1, -2)) == 1 - 2j
    assert Complex(0.5, 0).clone() == Complex(0.5, 0)
    assert math.isclose(Complex(3, 4).abs(), 5.0)


def test_plane_gj_matches_block_embedding():
    """The default complex solver (plane GJ, |pivot| pivoting like
    solveComplex.ts) and the 2N real-block embedding agree to fp rounding;
    both flag the same singular systems."""
    import numpy as np
    import jax.numpy as jnp

    from spicey_tpu.ops.linsolve import solve_planes

    rng = np.random.default_rng(11)
    B, N = 64, 9
    Ar = rng.normal(size=(B, N, N))
    Ai = rng.normal(size=(B, N, N))
    br = rng.normal(size=(B, N))
    bi = rng.normal(size=(B, N))
    Ar[5] = 0.0  # singular system
    Ai[5] = 0.0
    args = tuple(map(jnp.asarray, (Ar, Ai, br, bi)))
    xr_p, xi_p, v_p = solve_planes(*args, method="gj")
    xr_b, xi_b, v_b = solve_planes(*args, method="gj2n")
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_b))
    ok = np.asarray(v_p)
    got_p = np.asarray(xr_p)[ok] + 1j * np.asarray(xi_p)[ok]
    got_b = np.asarray(xr_b)[ok] + 1j * np.asarray(xi_b)[ok]
    ref = np.linalg.solve(Ar[ok] + 1j * Ai[ok],
                          (br[ok] + 1j * bi[ok])[..., None])[..., 0]
    den = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(got_p - ref) / den).max() < 1e-10
    assert (np.abs(got_b - ref) / den).max() < 1e-10
