"""Gradient-based circuit fitting: element values recovered by descending
through the differentiable engine (analysis/fit.py)."""

import numpy as np
import pytest

from spicey_tpu import (
    fit_ac,
    fit_tran,
    parse_netlist,
    simulate_ac,
    simulate_tran,
)


def test_fit_ac_recovers_rc_product():
    """|H| of the RC low-pass identifies only the R*C product; the fit must
    recover it to high precision from a mismatched starting point."""
    true_net = ("t\nv1 1 0 dc 0 ac 1\nr1 1 2 47\nc1 2 0 220u\n"
                ".ac dec 10 1 100\n")
    start_net = ("t\nv1 1 0 dc 0 ac 1\nr1 1 2 30\nc1 2 0 100u\n"
                 ".ac dec 10 1 100\n")
    target = np.abs(simulate_ac(parse_netlist(true_net)).node_voltages["2"])
    res = fit_ac(parse_netlist(start_net), "2", target, ["r1", "c1"],
                 steps=300, lr=0.05)
    assert res.converged
    assert res.loss < 1e-10
    rc = res.values["r1"] * res.values["c1"]
    assert rc == pytest.approx(47 * 220e-6, rel=1e-5)


def test_fit_ac_single_param_exact():
    """With C known, fitting R alone is fully identifiable."""
    true_net = ("t\nv1 1 0 dc 0 ac 1\nr1 1 2 47\nc1 2 0 100u\n"
                ".ac dec 10 1 100\n")
    start_net = ("t\nv1 1 0 dc 0 ac 1\nr1 1 2 20\nc1 2 0 100u\n"
                 ".ac dec 10 1 100\n")
    target = np.abs(simulate_ac(parse_netlist(true_net)).node_voltages["2"])
    res = fit_ac(parse_netlist(start_net), "2", target, ["r1"],
                 steps=250, lr=0.05)
    assert res.values["r1"] == pytest.approx(47.0, rel=1e-4)


def test_fit_tran_recovers_capacitance():
    true_net = "t\nV1 1 0 dc 5\nR1 1 2 1k\nC1 2 0 2.2u\n.tran 20u 5m\n"
    start_net = "t\nV1 1 0 dc 5\nR1 1 2 1k\nC1 2 0 1u\n.tran 20u 5m\n"
    target = np.asarray(
        simulate_tran(parse_netlist(true_net)).node_voltages["2"])
    res = fit_tran(parse_netlist(start_net), "2", target, ["C1"],
                   steps=150, lr=0.05)
    assert res.converged
    assert res.values["C1"] == pytest.approx(2.2e-6, rel=5e-3)


def test_fit_rejects_bad_target_length():
    net = parse_netlist(
        "t\nv1 1 0 dc 0 ac 1\nr1 1 2 30\nc1 2 0 100u\n.ac dec 10 1 100\n")
    with pytest.raises(ValueError, match="target has"):
        fit_ac(net, "2", np.ones(3), ["r1"])
