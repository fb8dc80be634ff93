"""Backend floating-point accuracy (utils/fpaccuracy.py).

Root cause pinned here: XLA:TPU lowers a TOTAL-SIZE-1 float64 exp through
a scalar path with ~3.8e-8 relative error (measured on v5e; >= 2 elements
take the accurate ~1e-14 expansion, XLA:CPU is exact at every shape). A
one-diode circuit's junction companion is exactly a (1,)-shaped exp, so
on TPU the op Newton limit-cycled below its default tol=1e-12 and a plain
V-R-diode .op walked the whole gmin/source-stepping ladder into
"DC operating point did not converge". accurate_exp() pads size-1
operands to 2 lanes; newton_tol_floor() additionally floors tolerances at
the MEASURED backend exp accuracy as defense.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spicey_tpu.utils import fpaccuracy
from spicey_tpu.utils.fpaccuracy import (
    accurate_exp,
    exp_rel_error,
    newton_tol_floor,
)


def test_accurate_exp_matches_vector_path_exactly():
    """The padded scalar must be bit-identical to the same value computed
    inside a >= 2-element exp on the SAME backend — that is the whole
    contract (scalar callers get the vector path's accuracy)."""
    for v in (0.1, 0.69249037522418511, 26.789956682947588, -3.0):
        single = np.asarray(accurate_exp(jnp.asarray([v], dtype=jnp.float64)))
        pair = np.asarray(jnp.exp(jnp.asarray([v, v], dtype=jnp.float64)))
        assert single[0] == pair[0]
    # 0-d input keeps its shape
    out = accurate_exp(jnp.asarray(1.5, dtype=jnp.float64))
    assert out.shape == ()
    # >= 2 elements: plain exp, identity behavior
    a = jnp.asarray([0.5, 1.5, 30.0], dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(accurate_exp(a)),
                                  np.asarray(jnp.exp(a)))


def test_accurate_exp_accuracy_vs_libm():
    """On the suite's CPU backend the padded exp matches libm to a few
    ulps across the junction operating range."""
    args = np.linspace(0.5, 34.5, 18)
    for v in args:
        got = float(accurate_exp(jnp.asarray([v], dtype=jnp.float64))[0])
        assert got == pytest.approx(float(np.exp(v)), rel=1e-13)


def test_newton_tol_floor(monkeypatch):
    # exact backend: strict tolerances survive
    monkeypatch.setitem(fpaccuracy._cache,
                        (fpaccuracy._current_platform(), "float64"), 0.0)
    assert newton_tol_floor(1e-12) == 1e-12
    # noisy backend: floored at 8x the measured error
    monkeypatch.setitem(fpaccuracy._cache,
                        (fpaccuracy._current_platform(), "float64"), 2e-8)
    assert newton_tol_floor(1e-12) == pytest.approx(1.6e-7)
    # a user tolerance above the floor is untouched
    assert newton_tol_floor(1e-3) == 1e-3
    # f32: the 16-ulp representability floor still applies
    monkeypatch.setitem(fpaccuracy._cache,
                        (fpaccuracy._current_platform(), "float32"), 0.0)
    assert newton_tol_floor(1e-9, np.float32) == pytest.approx(
        16.0 * np.finfo(np.float32).eps)


def test_exp_rel_error_is_cached_and_small_on_cpu():
    fpaccuracy._cache.clear()
    e1 = exp_rel_error()
    assert (fpaccuracy._current_platform(), "float64") in fpaccuracy._cache
    assert e1 == exp_rel_error()  # cache hit
    assert e1 < 1e-12  # suite runs on XLA:CPU — exp is libm-exact there


def test_single_diode_op_converges_at_default_tol():
    """The original failing workload: one diode, default tolerance. On
    the TPU backend this limit-cycled to non-convergence before
    accurate_exp; it must solve on every backend now."""
    from spicey_tpu.analysis.op import simulate_op
    from spicey_tpu.parsing.netlist import parse_netlist

    ckt = parse_netlist(
        "op bias deck\nV1 in 0 dc 5\nR1 in out 1k\nD1 out 0 DD\n"
        ".model DD d(is=1e-14)\n.op\n.end", dialect="extended")
    r = simulate_op(ckt)
    # i = (5 - v)/1k = Is*(e^(v/VT) - 1) -> v = 0.692490375...
    assert r.node_voltages["out"] == pytest.approx(0.69249037522418511,
                                                   rel=1e-9)
