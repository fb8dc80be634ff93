"""Autodiff sensitivity analysis: exact derivatives of engine responses
w.r.t. element values — a capability with no reference analog (and none of
classical SPICE's adjoint machinery), possible because the whole engine is
differentiable JAX."""

import numpy as np
import pytest

from spicey_tpu import (
    parse_netlist,
    sensitivity_ac,
    sensitivity_tran,
    simulate_tran,
)
from spicey_tpu.analysis.ac import build_frequency_array

RC_AC = ("t\nv1 1 0 dc 0 ac 1\nr1 1 2 30\nc1 2 0 100u\n"
         ".ac dec 10 1 100\n")
RC_TRAN = ("t\nV1 1 0 PULSE(0 5 0 1n 1n 5u 10u)\nR1 1 2 1k\nC1 2 0 1u\n"
           ".tran 0.1u 20u\n")


def test_ac_sensitivity_matches_analytic_lowpass():
    """|H| = 1/sqrt(1+(wRC)^2): closed-form d|H|/dR and d|H|/dC."""
    ckt = parse_netlist(RC_AC)
    sens = sensitivity_ac(ckt, "2", ["r1", "c1"])
    f = build_frequency_array("dec", 10, 1, 100)
    w = 2 * np.pi * f
    R, C = 30.0, 100e-6
    denom = (1 + (w * R * C) ** 2) ** 1.5
    np.testing.assert_allclose(sens["r1"], -(w ** 2) * R * C ** 2 / denom,
                               rtol=1e-9)
    np.testing.assert_allclose(sens["c1"], -(w ** 2) * R ** 2 * C / denom,
                               rtol=1e-9)


def test_tran_sensitivity_matches_finite_difference():
    ckt = parse_netlist(RC_TRAN)
    sens = sensitivity_tran(ckt, "2", ["R1"])
    a = simulate_tran(parse_netlist(RC_TRAN.replace("R1 1 2 1k",
                                                    "R1 1 2 1000.5")))
    b = simulate_tran(parse_netlist(RC_TRAN.replace("R1 1 2 1k",
                                                    "R1 1 2 999.5")))
    fd = np.asarray(a.node_voltages["2"]) - np.asarray(b.node_voltages["2"])
    scale = np.max(np.abs(fd))
    assert np.max(np.abs(sens["R1"] - fd)) < 1e-5 * scale


def test_tran_sensitivity_vsource_dc():
    """Linear circuit: dV(out)/dVdc is the settled divider ratio."""
    net = "t\nV1 1 0 dc 5\nR1 1 2 1k\nR2 2 0 1k\n.tran 1u 10u\n"
    sens = sensitivity_tran(parse_netlist(net), "2", ["V1"])
    np.testing.assert_allclose(sens["V1"], 0.5, rtol=1e-12)


def test_sensitivity_through_nonlinear_tran():
    """Diode rectifier: AD must flow through the Newton companion; check
    against central finite differences."""
    net = ("t\n.model dm d\nV1 in 0 PULSE(0 5 0 1u 1u 48u 100u)\n"
           "D1 in out dm\nR1 out 0 1k\n.tran 1u 100u\n")
    ckt = parse_netlist(net)
    sens = sensitivity_tran(ckt, "out", ["R1"], nr="converged")
    h = 0.5
    a = simulate_tran(parse_netlist(net.replace("R1 out 0 1k",
                                                f"R1 out 0 {1000 + h}")),
                      nr="converged")
    b = simulate_tran(parse_netlist(net.replace("R1 out 0 1k",
                                                f"R1 out 0 {1000 - h}")),
                      nr="converged")
    fd = (np.asarray(a.node_voltages["out"])
          - np.asarray(b.node_voltages["out"])) / (2 * h)
    scale = np.max(np.abs(fd)) + 1e-30
    assert np.max(np.abs(sens["R1"] - fd)) < 1e-3 * scale


def test_sensitivity_unknown_target_raises():
    with pytest.raises(ValueError, match="unknown sensitivity target"):
        sensitivity_ac(parse_netlist(RC_AC), "2", ["nope"])
