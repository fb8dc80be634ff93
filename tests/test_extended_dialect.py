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
