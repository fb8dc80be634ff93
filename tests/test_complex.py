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
