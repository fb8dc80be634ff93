"""Adaptive-timestep transient (LTE-controlled, device-side source
evaluation) — the capability the reference lacks entirely (SURVEY §2.10:
fixed step, no LTE control)."""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate_tran, simulate_tran_adaptive

RC_DC = "t\nV1 1 0 dc 5\nR1 1 2 1k\nC1 2 0 1u\n.tran 10u 10m\n"


def test_adaptive_error_tracks_rtol():
    errs = {}
    for rtol in (1e-3, 1e-5):
        res = simulate_tran_adaptive(parse_netlist(RC_DC), rtol=rtol,
                                     atol=1e-9)
        assert not res.exhausted
        t = res.times
        exact = 5.0 * (1 - np.exp(-t / 1e-3))
        errs[rtol] = np.max(np.abs(res.node_voltages["2"] - exact))
        assert errs[rtol] < 2 * rtol * 5.0  # error ~ rtol * scale
    assert errs[1e-5] < errs[1e-3] / 20  # tighter tolerance -> smaller error


def test_adaptive_beats_fixed_step_per_point():
    """At rtol=1e-3 the adaptive run uses far fewer points than the fixed
    1000-step run AND is more accurate."""
    adaptive = simulate_tran_adaptive(parse_netlist(RC_DC), rtol=1e-3)
    fixed = simulate_tran(parse_netlist(RC_DC))
    t_a = adaptive.times
    err_a = np.max(np.abs(adaptive.node_voltages["2"]
                          - 5.0 * (1 - np.exp(-t_a / 1e-3))))
    t_f = np.asarray(fixed.times)
    dt = t_f[1] - t_f[0]
    err_f = np.max(np.abs(np.asarray(fixed.node_voltages["2"])
                          - 5.0 * (1 - np.exp(-(t_f + dt) / 1e-3))))
    assert adaptive.n_accepted < len(t_f) / 3
    assert err_a < err_f / 5


def test_adaptive_step_growth():
    """Steps must grow as the exponential settles (dt_max >> dt_init)."""
    res = simulate_tran_adaptive(parse_netlist(RC_DC), rtol=1e-4)
    steps = np.diff(res.times)
    assert steps[-1] > 10 * steps[0]
    assert res.times[-1] == pytest.approx(10e-3, rel=1e-9)


def test_adaptive_sources_evaluated_at_adaptive_times():
    """SIN drive: adaptive points do not lie on any precomputed grid, so
    source values must come from the device-side evaluator."""
    net = ("t\nv1 1 0 SIN(0 1 1k)\nr1 1 2 1k\nc1 2 0 100n\n"
           ".tran 10u 2m\n")
    res = simulate_tran_adaptive(parse_netlist(net, dialect="extended"),
                                 rtol=1e-5)
    t = res.times
    # analytic RC response to a sine (zero initial state)
    w = 2 * np.pi * 1e3
    tau = 1e3 * 100e-9
    h = 1.0 / (1 + (w * tau) ** 2)
    exact = h * (np.sin(w * t) - w * tau * np.cos(w * t)
                 + w * tau * np.exp(-t / tau))
    assert np.max(np.abs(res.node_voltages["2"] - exact)) < 5e-4


def test_adaptive_nonlinear_rectifier():
    """Diode half-wave rectifier: output clamps near source-0.7 on positive
    half cycles and decays on negative ones; Newton runs to convergence."""
    net = ("t\n.model dm d\nV1 in 0 SIN(0 5 10k)\nD1 in out dm\n"
           "R1 out 0 10k\nC1 out 0 100n\n.tran 1u 200u\n")
    res = simulate_tran_adaptive(parse_netlist(net, dialect="extended"),
                                 rtol=1e-4)
    v = res.node_voltages["out"]
    assert v.max() > 3.9 and v.max() < 4.6  # peak minus diode drop
    assert v.min() > -0.1                   # never follows negative swing


def test_adaptive_switch_circuit():
    from tests.fixtures import netlists

    res = simulate_tran_adaptive(parse_netlist(netlists.VSWITCH_PWL),
                                 rtol=1e-3, max_steps=8192)
    assert not res.exhausted
    t = res.times
    v = res.node_voltages["OUT"]

    def sample(target):
        return v[np.abs(t - target).argmin()]

    assert abs(sample(0.0005)) < 0.05  # switch ON shorts the output
    assert sample(0.0035) > 2          # OFF -> recharges


def test_adaptive_budget_exhaustion_flag():
    res = simulate_tran_adaptive(parse_netlist(RC_DC), rtol=1e-6,
                                 max_steps=16)
    assert res.exhausted
    assert res.times[-1] < 10e-3
