"""Extended-dialect tests: independent current sources (I elements), which
the reference drops into `skipped` (parseNetlist.ts:444-446). Default
dialect must keep the reference behavior."""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate_ac, simulate_tran
from spicey_tpu.analysis.batch import simulate_tran_batch


def test_default_dialect_skips_current_sources():
    ckt = parse_netlist("The t\nI1 1 0 5m\nr1 1 0 1k\n.tran 1u 1m\n")
    assert len(ckt.I) == 0
    assert any("I1" in s for s in ckt.skipped)


def test_extended_parses_current_source():
    ckt = parse_netlist(
        "The t\nI1 0 out 5m\nIac 0 out ac 2m 45\n"
        "Ipulse 0 out PULSE(0 1m 0 1u 1u 10u 20u)\nr1 out 0 1k\n",
        dialect="extended",
    )
    assert [s.name for s in ckt.I] == ["I1", "Iac", "Ipulse"]
    assert ckt.I[0].dc == pytest.approx(5e-3)
    assert ckt.I[1].ac_mag == pytest.approx(2e-3)
    assert ckt.I[1].ac_phase_deg == 45.0
    assert ckt.I[2].waveform is not None


def test_dc_current_source_tran():
    """5 mA into 1 kOhm -> 5 V (current flows n1 -> n2 through the source)."""
    ckt = parse_netlist(
        "The t\nI1 0 out 5m\nR1 out 0 1k\n.tran 1u 10u\n", dialect="extended"
    )
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["out"], 5.0, rtol=1e-12)
    np.testing.assert_allclose(tran.element_currents["I1"], 5e-3)
    np.testing.assert_allclose(tran.element_currents["R1"], 5e-3, rtol=1e-12)


def test_ac_current_source():
    """Norton source: I into R||C gives V = I * Z."""
    ckt = parse_netlist(
        "The t\nI1 0 out ac 1m\nR1 out 0 1k\nC1 out 0 1u\n"
        ".ac dec 10 10 10k\n", dialect="extended"
    )
    ac = simulate_ac(ckt)
    w = 2 * np.pi * ac.freqs
    z = 1.0 / (1e-3 + 1j * w * 1e-6)
    np.testing.assert_allclose(ac.node_voltages["out"], 1e-3 * z, rtol=1e-9)
    np.testing.assert_allclose(ac.element_currents["I1"], 1e-3)


def test_pulse_current_source_tran():
    ckt = parse_netlist(
        "The t\nI1 0 out PULSE(0 1m 0 1n 1n 50u 100u)\nR1 out 0 1k\n"
        ".tran 1u 200u\n", dialect="extended"
    )
    tran = simulate_tran(ckt)
    v = np.asarray(tran.node_voltages["out"])
    t = np.asarray(tran.times)
    assert v[np.abs(t - 25e-6).argmin()] == pytest.approx(1.0, rel=1e-6)
    assert v[np.abs(t - 75e-6).argmin()] == pytest.approx(0.0, abs=1e-9)


def test_current_source_batch_override():
    B = 3
    dcs = np.array([1e-3, 2e-3, 5e-3])
    res = simulate_tran_batch(
        parse_netlist("The t\nI1 0 out dc 1m\nR1 out 0 1k\n.tran 1u 10u\n",
                      dialect="extended"),
        {"I1": dcs},
    )
    np.testing.assert_allclose(res.node_voltage("out")[:, -1], dcs * 1e3,
                               rtol=1e-12)


def test_rc_with_current_source_matches_analytic():
    """Step current into RC: v = IR(1 - exp(-t/RC)) with the engine's
    one-step-advanced t=0 semantics."""
    ckt = parse_netlist(
        "The t\nI1 0 out dc 1m\nR1 out 0 1k\nC1 out 0 1u\n.tran 10u 5m\n",
        dialect="extended",
    )
    tran = simulate_tran(ckt, integration="trap")
    t = np.asarray(tran.times)
    dt = t[1] - t[0]
    exact = 1.0 * (1 - np.exp(-(t + dt) / 1e-3))
    np.testing.assert_allclose(
        np.asarray(tran.node_voltages["out"])[3:], exact[3:], rtol=2e-3
    )


def test_invalid_dialect():
    with pytest.raises(ValueError, match="dialect"):
        parse_netlist("The t\n", dialect="ngspice")


# --- controlled sources (G = VCCS, E = VCVS), extended dialect ---

VCCS_AMP = """amp built from controlled sources
v1 1 0 dc 1 ac 1
g1 2 0 1 0 2m
r2 2 0 5k
e1 3 0 2 0 -2
r3 3 0 1k
"""


def test_default_dialect_skips_controlled_sources():
    ckt = parse_netlist(VCCS_AMP + ".tran 1u 10u\n")
    assert not ckt.G and not ckt.E
    assert any(s.startswith("g1") for s in ckt.skipped)
    assert any(s.startswith("e1") for s in ckt.skipped)


def test_vccs_vcvs_op():
    """gm=2mS into 5k from a 1V control: v(2) = -gm*R*v(1) = -10 V; the
    VCVS doubles and inverts: v(3) = -2 * v(2) = +20 V."""
    from spicey_tpu.analysis.op import simulate_op

    ckt = parse_netlist(VCCS_AMP + ".op\n", dialect="extended")
    op = simulate_op(ckt)
    assert op.node_voltages["2"] == pytest.approx(-10.0, rel=1e-12)
    assert op.node_voltages["3"] == pytest.approx(20.0, rel=1e-12)
    # VCCS current = gm * v(1); VCVS branch current = -v(3)/r3
    assert op.element_currents["g1"] == pytest.approx(2e-3, rel=1e-12)
    assert op.element_currents["e1"] == pytest.approx(-20.0 / 1e3, rel=1e-12)


def test_vccs_vcvs_ac():
    """Resistive amp: flat frequency response, 180-degree phase flips."""
    ckt = parse_netlist(VCCS_AMP + ".ac lin 5 10 1000\n", dialect="extended")
    ac = simulate_ac(ckt)
    v2 = ac.node_voltages["2"]
    v3 = ac.node_voltages["3"]
    np.testing.assert_allclose(np.abs(v2), 10.0, rtol=1e-12)
    np.testing.assert_allclose(np.real(v2), -10.0, rtol=1e-12)
    np.testing.assert_allclose(np.abs(v3), 20.0, rtol=1e-12)
    np.testing.assert_allclose(np.real(v3), 20.0, rtol=1e-12)
    np.testing.assert_allclose(ac.element_currents["g1"], 2e-3, rtol=1e-12)


def test_vcvs_tran_matches_scaled_source():
    """An E-buffered RC must trace the same waveform as directly driving
    the RC with a pulse of gain-scaled amplitude."""
    buffered = parse_netlist(
        "the buffered rc\nV1 1 0 PULSE(0 5 0 1n 1n 5u 10u)\ne1 2 0 1 0 2\n"
        "r1 2 3 1k\nc1 3 0 1u\n.tran 0.1u 20u\n",
        dialect="extended",
    )
    direct = parse_netlist(
        "plain rc\nV1 2 0 PULSE(0 10 0 1n 1n 5u 10u)\n"
        "r1 2 3 1k\nc1 3 0 1u\n.tran 0.1u 20u\n"
    )
    tb = simulate_tran(buffered)
    td = simulate_tran(direct)
    np.testing.assert_allclose(
        tb.node_voltages["3"], td.node_voltages["3"], rtol=1e-12, atol=1e-12
    )
    # the E branch current follows the V-source branch convention, so it
    # matches the direct drive's V1 current exactly
    np.testing.assert_allclose(
        tb.element_currents["e1"], td.element_currents["V1"],
        rtol=1e-9, atol=1e-15,
    )


def test_vccs_tran_dc():
    ckt = parse_netlist(
        "t\nv1 1 0 dc 2\ng1 2 0 1 0 1m\nr2 2 0 1k\n.tran 1u 5u\n",
        dialect="extended",
    )
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["2"], -2.0, rtol=1e-12)
    np.testing.assert_allclose(tran.element_currents["g1"], 2e-3, rtol=1e-12)


def test_controlled_sources_batch():
    """Batched R sweep through a VCCS amp: v(2) = -gm*R*v(1) per variant."""
    B = 8
    r = 5e3 * (1 + 0.2 * np.arange(B) / B)
    res = simulate_tran_batch(
        parse_netlist(
            "t\nv1 1 0 dc 1\ng1 2 0 1 0 2m\nr2 2 0 5k\n.tran 1u 5u\n",
            dialect="extended",
        ),
        {"r2": r},
    )
    expect = -2e-3 * r
    np.testing.assert_allclose(
        res.node_voltage("2")[:, -1], expect, rtol=1e-12
    )


def test_gm_batch_override():
    """Sweeping the VCCS transconductance across the batch: v(2) = -gm*R."""
    from spicey_tpu.analysis.batch import simulate_ac_batch

    B = 8
    gm = 2e-3 * (1 + 0.5 * np.arange(B) / B)
    ckt = parse_netlist(
        "t\nv1 1 0 dc 0 ac 1\ng1 2 0 1 0 2m\nr2 2 0 5k\n.ac lin 3 10 100\n",
        dialect="extended",
    )
    res = simulate_ac_batch(ckt, {"g1": gm})
    np.testing.assert_allclose(
        np.abs(res.node_voltage("2")),
        np.broadcast_to((gm * 5e3)[:, None], (B, 3)), rtol=1e-12,
    )
    tr = simulate_tran_batch(
        parse_netlist(
            "t\nv1 1 0 dc 1\ng1 2 0 1 0 2m\nr2 2 0 5k\n.tran 1u 5u\n",
            dialect="extended",
        ),
        {"g1": gm},
    )
    np.testing.assert_allclose(
        tr.node_voltage("2")[:, -1], -(gm * 5e3), rtol=1e-12
    )


CCCS_NET = """amp built from current-controlled sources
v1 1 0 dc 1
r1 1 0 100
f1 0 2 v1 10
r2 2 0 50
h1 3 0 v1 -200
r3 3 0 1k
"""


def test_cccs_ccvs_op():
    """Branch convention: x[j] is the current entering v1's + terminal, so
    i(v1) = -v1/r1 = -10 mA. F mirrors 10x with the same n1->n2 direction
    convention as I sources: gain*i = -0.1 A flows 2 -> 0, so
    v(2) = -5 V. H gives v(3) = -200 * i(v1) = +2 V."""
    from spicey_tpu.analysis.op import simulate_op

    ckt = parse_netlist(CCCS_NET + ".op\n", dialect="extended")
    op = simulate_op(ckt)
    assert op.node_voltages["2"] == pytest.approx(-5.0, rel=1e-12)
    assert op.node_voltages["3"] == pytest.approx(2.0, rel=1e-12)
    assert op.element_currents["f1"] == pytest.approx(-0.1, rel=1e-12)
    assert op.element_currents["v1"] == pytest.approx(-0.01, rel=1e-12)


def test_cccs_ccvs_tran_and_ac():
    ckt = parse_netlist(CCCS_NET + ".tran 1u 5u\n", dialect="extended")
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["2"], -5.0, rtol=1e-12)
    np.testing.assert_allclose(tran.node_voltages["3"], 2.0, rtol=1e-12)
    ac_ckt = parse_netlist(
        "t\nv1 1 0 dc 0 ac 1\nr1 1 0 100\nf1 0 2 v1 10\nr2 2 0 50\n"
        ".ac lin 3 10 100\n",
        dialect="extended",
    )
    ac = simulate_ac(ac_ckt)
    np.testing.assert_allclose(np.real(ac.node_voltages["2"]), -5.0,
                               rtol=1e-12)
    np.testing.assert_allclose(ac.element_currents["f1"], -0.1, rtol=1e-12)


def test_ccvs_batch_override():
    from spicey_tpu.analysis.batch import simulate_ac_batch

    B = 4
    rr = -200.0 * (1 + 0.5 * np.arange(B) / B)
    ckt = parse_netlist(
        "t\nv1 1 0 dc 0 ac 1\nr1 1 0 100\nh1 3 0 v1 -200\nr3 3 0 1k\n"
        ".ac lin 2 10 100\n",
        dialect="extended",
    )
    res = simulate_ac_batch(ckt, {"h1": rr})
    # i(v1) = -1/100 A -> v(3) = rr * i(v1)
    np.testing.assert_allclose(
        np.real(res.node_voltage("3")),
        np.broadcast_to((rr * -0.01)[:, None], (B, 2)), rtol=1e-12,
    )


def test_unknown_control_source_raises():
    with pytest.raises(ValueError, match="Unknown controlling source"):
        parse_netlist("t\nf1 0 2 vmissing 10\nr2 2 0 50\n",
                      dialect="extended")


# --- .ic initial conditions (extended dialect) ---

def test_ic_parsing():
    ckt = parse_netlist(
        "t\nv1 1 0 dc 5\nr1 1 2 1k\nc1 2 0 1u\n.ic v(2)=3 v(1)=5\n"
        ".tran 1u 1m\n", dialect="extended")
    assert ckt.initial_conditions == {"2": 3.0, "1": 5.0}
    strict = parse_netlist(
        "t\nv1 1 0 dc 5\nr1 1 2 1k\nc1 2 0 1u\n.ic v(2)=3\n.tran 1u 1m\n")
    assert strict.initial_conditions == {}
    assert any(s.startswith(".ic") for s in strict.skipped)
    with pytest.raises(ValueError, match="malformed .ic"):
        parse_netlist("t\nr1 1 0 1k\n.ic bogus\n", dialect="extended")


def test_ic_rc_discharge_analytic():
    """Capacitor starts at 3 V and discharges: v = 3*e^{-t/RC} (with the
    engine's step-k = (k+1)dt record convention)."""
    net = ("t\nv1 1 0 dc 0\nr1 1 2 1k\nc1 2 0 1u\n.ic v(2)=3\n"
           ".tran 10u 5m\n")
    tr = simulate_tran(parse_netlist(net, dialect="extended"))
    t = np.asarray(tr.times)
    exact = 3.0 * np.exp(-(t + t[1]) / 1e-3)
    assert np.max(np.abs(np.asarray(tr.node_voltages["2"]) - exact)) < 2e-2
    assert tr.node_voltages["2"][0] == pytest.approx(3.0, rel=2e-2)


def test_ic_default_rest_unchanged():
    """Without .ic, extended-dialect transients keep the from-rest start."""
    net = "t\nv1 1 0 dc 5\nr1 1 2 1k\nc1 2 0 1u\n.tran 10u 1m\n"
    a = simulate_tran(parse_netlist(net, dialect="extended"))
    b = simulate_tran(parse_netlist(net))
    np.testing.assert_array_equal(a.node_voltages["2"], b.node_voltages["2"])
