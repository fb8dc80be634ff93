"""Transient engine tests.

Three verification modes mirroring the reference's strategy (SURVEY.md §4):
  1. oracle comparison — the compiled scan vs the NumPy executable spec
     (tests/oracle.py) on every fixture topology (linear RC, RLC, switch,
     diode+switch boost converter);
  2. analytic cross-checks — closed-form RC/RL responses;
  3. behavioral sample assertions copied from the reference's tests
     (switch-vt-vh.test.ts:61-70, vswitch-pwl.test.ts:58-76,
      two-probes.test.ts:25-40, case-insensitive-nodes.test.ts:23-44).
"""

import numpy as np
import pytest

from spicey_tpu import format_tran_result, parse_netlist, simulate, simulate_tran
from tests.fixtures import netlists
from tests.oracle import oracle_tran


def run_both(netlist: str):
    ckt = parse_netlist(netlist)
    engine = simulate_tran(ckt)
    times, nv, ec = oracle_tran(ckt)
    return engine, times, nv, ec


def assert_matches_oracle(netlist: str, rtol=1e-9, atol=1e-12):
    engine, times, nv, ec = run_both(netlist)
    np.testing.assert_allclose(engine.times, times, rtol=0, atol=0)
    assert list(engine.node_voltages.keys()) == list(nv.keys())
    for name in nv:
        np.testing.assert_allclose(
            engine.node_voltages[name], nv[name], rtol=rtol, atol=atol,
            err_msg=f"node {name}",
        )
    assert list(engine.element_currents.keys()) == list(ec.keys())
    for name in ec:
        np.testing.assert_allclose(
            engine.element_currents[name], ec[name], rtol=rtol, atol=atol,
            err_msg=f"element {name}",
        )
    return engine


def test_rc_pulse_matches_oracle():
    eng = assert_matches_oracle(netlists.RC_PULSE)
    assert len(eng.times) == 201  # .tran 0.1u 20u -> 200 steps + 1


def test_two_probes():
    # two-probes.test.ts:23-40
    ckt = parse_netlist(netlists.TWO_PROBES)
    assert ckt.tran_probes == ["1", "2"]
    tran = simulate_tran(ckt)
    assert sorted(tran.node_voltages.keys()) == ["1", "2"]
    assert len(tran.node_voltages["1"]) > 10
    assert tran.node_voltages["1"][0] == pytest.approx(0.0, abs=1e-9)
    assert tran.node_voltages["2"][0] == pytest.approx(0.0, abs=1e-9)
    out = format_tran_result(tran)
    assert "t(s), 1:V, 2:V" in out


def test_case_insensitive_nodes_end_to_end():
    # case-insensitive-nodes.test.ts:23-44
    r = simulate(netlists.CASE_INSENSITIVE)
    nv = r.tran.node_voltages
    assert sorted(nv.keys()) == sorted(["nOdE1", "nOde2"])
    out = format_tran_result(r.tran)
    assert "nOdE1:V" in out and "nOde2:V" in out


def test_rc_analytic_charging():
    """DC step into RC: v(t) follows the backward-Euler recurrence, which
    converges to the analytic exponential."""
    net = "The t\nV1 1 0 DC 5\nR1 1 2 1k\nC1 2 0 1u\n.tran 10u 5m\n.end\n"
    eng = assert_matches_oracle(net)
    t = np.asarray(eng.times)
    v2 = np.asarray(eng.node_voltages["2"])
    # BE discretization of dv/dt = (5 - v)/(RC): exact geometric series
    tau = 1e-3
    dt = t[1] - t[0]
    a = 1.0 / (1.0 + dt / tau)
    # NOTE: the t=0 record is already one BE step (quasi-DC solve with the C
    # companion stamped from vPrev=0, simulateTRAN.ts:149), so step k holds
    # the (k+1)-th iterate of the recurrence
    v_be = 5.0 * (1.0 - a ** (np.arange(len(t)) + 1))
    np.testing.assert_allclose(v2, v_be, rtol=1e-9, atol=1e-12)
    # and the converged analytic value at 5*tau is ~5V within BE error
    assert v2[-1] == pytest.approx(5.0 * (1 - np.exp(-5)), rel=2e-2)


def test_rl_matches_oracle():
    net = "The t\nV1 1 0 DC 1\nR1 1 2 10\nL1 2 0 1m\n.tran 1u 1m\n.end\n"
    eng = assert_matches_oracle(net)
    # inductor ramps toward V/R = 0.1 A
    assert eng.element_currents["L1"][-1] == pytest.approx(0.1, rel=1e-3)


def test_series_rlc_matches_oracle():
    assert_matches_oracle(netlists.SERIES_RLC)


def test_switch_vt_vh_behavior():
    # switch-vt-vh.test.ts:46-70
    ckt = parse_netlist(netlists.SWITCH_VT_VH)
    tran = simulate_tran(ckt)
    times = np.asarray(tran.times)
    v_out = np.asarray(tran.node_voltages["N2"])

    def sample(target):
        return v_out[np.abs(times - target).argmin()]

    assert sample(0.0002) > 4.9   # pulse high -> switch ON
    assert sample(0.0007) < 0.1   # pulse low -> OFF
    assert sample(0.0012) > 4.9   # ON again
    assert sample(0.0017) < 0.1   # OFF again


def test_switch_vt_vh_matches_oracle():
    assert_matches_oracle(netlists.SWITCH_VT_VH)


def test_vswitch_pwl_behavior():
    # vswitch-pwl.test.ts:30-76
    ckt = parse_netlist(netlists.VSWITCH_PWL)
    tran = simulate_tran(ckt)
    assert len(tran.times) == 1001  # dt=0 -> default 1000 steps
    times = np.asarray(tran.times)
    v_out = np.asarray(tran.node_voltages["OUT"])
    v_ctrl = np.asarray(tran.node_voltages["CTRL"])

    def sample(target):
        i = np.abs(times - target).argmin()
        return v_out[i], v_ctrl[i]

    out, ctrl = sample(0.0005)
    assert ctrl > 2 and abs(out) < 0.02
    out, ctrl = sample(0.0035)
    assert ctrl < 1 and out > 2
    out, ctrl = sample(0.0045)
    assert ctrl < 2 and out > 4
    out, ctrl = sample(0.0085)
    assert ctrl > 1 and abs(out) < 0.02
    out, ctrl = sample(0.0095)
    assert ctrl == pytest.approx(0, abs=1e-9) and out > 2


def test_vswitch_pwl_matches_oracle():
    assert_matches_oracle(netlists.VSWITCH_PWL)


def test_boost_converter_matches_oracle():
    # the diode+switch+L topology of boost-converter-probe.test.ts with the
    # probe filter active
    eng = assert_matches_oracle(netlists.BOOST_CONVERTER, rtol=1e-7, atol=1e-9)
    assert len(eng.times) == 101
    assert list(eng.node_voltages.keys()) == ["N1", "N3"]
    # element currents are NOT probe-filtered (simulateTRAN.ts:240-249)
    assert "LL1" in eng.element_currents and "DD1" in eng.element_currents


def test_diode_switch_runs():
    # diode-switch.test.ts:38-44
    r = simulate(netlists.DIODE_SWITCH)
    out = format_tran_result(r.tran)
    assert "t(s)," in out
    assert len(out.split("\n")) > 10


def test_diode_rectifier_matches_oracle():
    net = (
        "The t\n.model dm d(is=1e-12 n=1.2)\n"
        "V1 in 0 PULSE(-5 5 0 1u 1u 48u 100u)\n"
        "D1 in out dm\nR1 out 0 1k\nC1 out 0 1u\n"
        ".tran 1u 300u\n.end\n"
    )
    eng = assert_matches_oracle(net, rtol=1e-6, atol=1e-9)
    v_out = np.asarray(eng.node_voltages["out"])
    # half-wave rectifier: output stays (mostly) non-negative and clamps
    # below the 5V peak minus a diode drop
    assert v_out.max() < 5.0
    assert v_out.max() > 3.0
    assert v_out.min() > -0.5


def test_t0_is_quasi_dc_solve():
    """At step 0 companions are stamped with zero state — NOT a DC operating
    point (simulateTRAN.ts:149 + SURVEY §2.10). A charged-source RC divider
    shows the C acting as a huge conductance at t=0."""
    net = "The t\nV1 1 0 DC 5\nR1 1 2 1k\nC1 2 0 1u\n.tran 1u 10u\n.end\n"
    eng = assert_matches_oracle(net)
    v2 = np.asarray(eng.node_voltages["2"])
    # Gc = 1u/1u = 1 S >> 1/1k -> node 2 starts near 0, NOT at the DC value 5
    assert v2[0] < 0.01


def test_singular_tran_raises():
    net = "The t\nV1 1 0 DC 5\nV2 1 0 DC 3\nR1 1 0 1k\n.tran 1u 10u\n.end\n"
    ckt = parse_netlist(net)
    with pytest.raises(ValueError, match="Singular"):
        simulate_tran(ckt)


def test_no_tran_returns_none():
    ckt = parse_netlist("The t\nr1 1 0 1k\nv1 1 0 5\n.ac lin 2 1 10\n")
    assert simulate_tran(ckt) is None
    assert format_tran_result(None) == "No TRAN analysis.\n"


def test_lax_method_matches_gj():
    ckt = parse_netlist(netlists.RC_PULSE)
    a = simulate_tran(ckt, method="gj")
    b = simulate_tran(ckt, method="lax")
    for name in a.node_voltages:
        np.testing.assert_allclose(
            a.node_voltages[name], b.node_voltages[name], rtol=1e-9, atol=1e-12
        )
