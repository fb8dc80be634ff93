"""AC engine tests. The centerpiece is character-exact reproduction of the
reference's basics01 golden snapshot (tests/basics/basics01.test.ts:18-221),
which pins the full numeric + formatting contract to 6 significant figures
over a 201-point sweep."""

import os

import numpy as np
import pytest

from spicey_tpu import format_ac_result, parse_netlist, simulate, simulate_ac
from spicey_tpu.utils.logspace import logspace
from tests.fixtures import netlists


def test_basics01_golden_exact(fixtures_dir):
    golden = open(os.path.join(fixtures_dir, "basics01_golden.txt")).read()
    result = simulate(netlists.BASICS01_AC)
    assert result.tran is None
    out = format_ac_result(result.ac)
    assert out == golden


def test_basics01_lax_method_matches_too(fixtures_dir):
    golden = open(os.path.join(fixtures_dir, "basics01_golden.txt")).read()
    ckt = parse_netlist(netlists.BASICS01_AC)
    ac = simulate_ac(ckt, method="lax")
    assert format_ac_result(ac) == golden


def test_no_ac_returns_none():
    ckt = parse_netlist("t\nr1 1 0 1k\nv1 1 0 5\n.tran 1u 1m\n")
    assert simulate_ac(ckt) is None
    assert format_ac_result(None) == "No AC analysis.\n"


def test_logspace_overshoots_f2():
    # logspace.ts:7-12: n = ceil(decades*N) points of f1*10^(i/N); the last
    # point OVERSHOOTS f2 when decades*N is fractional (the f2-append at
    # :13 only fires on fp underestimation of the ceil).
    grid = logspace(1.0, 250.0, 10)
    assert grid[0] == 1.0
    assert len(grid) == 25
    assert grid[-1] == pytest.approx(10 ** 2.4)  # 251.19, past 250
    # interior points are f1 * 10^(i/N)
    assert grid[1] == pytest.approx(10 ** 0.1)
    # exact-decade sweep ends exactly at f2 with no append (basics01: 201 pts)
    grid2 = logspace(1.0, 100.0, 100)
    assert len(grid2) == 201 and grid2[-1] == 100.0


def test_logspace_swaps_reversed_bounds():
    grid = logspace(100.0, 1.0, 100)
    assert grid[0] == 1.0 and grid[-1] == pytest.approx(100.0)


def test_logspace_rejects_nonpositive():
    with pytest.raises(ValueError):
        logspace(0.0, 10.0, 10)


def test_lin_mode():
    ckt = parse_netlist("t\nv1 1 0 ac 1\nr1 1 2 1k\nc1 2 0 1u\n.ac lin 5 10 50\n")
    ac = simulate_ac(ckt)
    np.testing.assert_allclose(ac.freqs, [10, 20, 30, 40, 50])
    # lin clamps to at least 2 points (simulateAC.ts:18)
    ckt2 = parse_netlist("t\nv1 1 0 ac 1\nr1 1 2 1k\nc1 2 0 1u\n.ac lin 1 10 50\n")
    assert len(simulate_ac(ckt2).freqs) == 2


def test_rc_analytic_transfer():
    """|V2| and phase match the analytic RC low-pass response."""
    ckt = parse_netlist(netlists.BASICS01_AC)
    ac = simulate_ac(ckt)
    rc = 30.0 * 100e-6
    w = 2 * np.pi * ac.freqs
    h = 1.0 / (1.0 + 1j * w * rc)
    np.testing.assert_allclose(ac.node_voltages["2"], h, rtol=1e-12)
    np.testing.assert_allclose(ac.node_voltages["1"], np.ones_like(h), rtol=1e-12)


def test_element_currents():
    ckt = parse_netlist(netlists.BASICS01_AC)
    ac = simulate_ac(ckt)
    # KCL: resistor current == capacitor current == -source branch current
    np.testing.assert_allclose(
        ac.element_currents["r1"], ac.element_currents["c1"], rtol=1e-9
    )
    np.testing.assert_allclose(
        ac.element_currents["r1"], -np.asarray(ac.element_currents["v1"]),
        rtol=1e-9,
    )


def test_inductor_ac_and_eps_guard():
    """RL divider: L admittance -j/(wL); DC-ish point stays finite."""
    ckt = parse_netlist("t\nv1 1 0 ac 1\nr1 1 2 100\nl1 2 0 1m\n.ac dec 10 1k 100k\n")
    ac = simulate_ac(ckt)
    w = 2 * np.pi * ac.freqs
    zl = 1j * w * 1e-3
    h = zl / (100.0 + zl)
    np.testing.assert_allclose(ac.node_voltages["2"], h, rtol=1e-9)


def test_nonpositive_resistor_raises():
    ckt = parse_netlist("t\nv1 1 0 ac 1\nr1 1 0 0\n.ac dec 10 1 10\n")
    with pytest.raises(ValueError, match="must be > 0"):
        simulate_ac(ckt)


def test_ac_phase_source():
    ckt = parse_netlist("t\nv1 1 0 ac 2 90\nr1 1 0 1k\n.ac lin 2 1 10\n")
    ac = simulate_ac(ckt)
    v = ac.node_voltages["1"]
    np.testing.assert_allclose(v.real, 0.0, atol=1e-12)
    np.testing.assert_allclose(v.imag, 2.0, rtol=1e-12)


def test_singular_ac_raises():
    # two ideal V-sources in parallel -> duplicated branch rows -> singular;
    # the reference throws in solveComplex (solveComplex.ts:29)
    ckt = parse_netlist("t\nv1 1 0 ac 1\nv2 1 0 ac 2\nr1 1 0 1k\n.ac lin 2 1 10\n")
    with pytest.raises(ValueError, match="Singular"):
        simulate_ac(ckt)


def test_ac_oct_mode_extended():
    """Extended-dialect .ac oct: points at f1*2^(i/N); exact stop when the
    span is a whole number of octaves. The reference dialect throws."""
    ckt = parse_netlist("t\nv1 1 0 ac 1\nr1 1 2 30\nc1 2 0 100u\n"
                        ".ac oct 4 100 1600\n", dialect="extended")
    ac = simulate_ac(ckt)
    expect = 100.0 * 2.0 ** (np.arange(17) / 4.0)
    np.testing.assert_allclose(ac.freqs, expect, rtol=1e-12)
    # non-integral octave span: ceil(octaves*N) intervals, so the grid
    # overshoots f2 rather than appending it — the same semantics as the
    # reference's dec grid (utils/logspace.ts:7-14)
    ckt2 = parse_netlist("t\nv1 1 0 ac 1\nr1 1 0 1k\n.ac oct 2 100 500\n",
                         dialect="extended")
    ac2 = simulate_ac(ckt2)
    np.testing.assert_allclose(ac2.freqs,
                               100.0 * 2.0 ** (np.arange(6) / 2.0),
                               rtol=1e-12)
    with pytest.raises(ValueError, match="dec.*lin"):
        parse_netlist("t\nv1 1 0 ac 1\nr1 1 0 1k\n.ac oct 2 1 10\n")


def test_noise_oct_mode():
    from spicey_tpu import simulate
    from spicey_tpu.constants import K_BOLTZMANN, T_NOISE

    r = simulate("t\nv1 in 0 dc 0 ac 1\nr1 in out 1k\nr2 out 0 1k\n"
                 ".noise v(out) v1 oct 2 100 800\n", dialect="extended")
    np.testing.assert_allclose(r.noise.freqs[:-1],
                               100.0 * 2.0 ** (np.arange(6) / 2.0),
                               rtol=1e-12)
    np.testing.assert_allclose(r.noise.output_psd,
                               4 * K_BOLTZMANN * T_NOISE * 500.0, rtol=1e-9)


def test_options_acop_linearizes_from_deck():
    """.options acop: deck-level opt-in for op-linearized AC (the CLI path
    to small-signal amplifier analysis)."""
    from spicey_tpu import simulate

    net = """x
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vg gt 0 dc 2 ac 1
rd vdd d 1k
m1 d gt 0 mn
.ac lin 3 10 1000
{opt}"""
    r0 = simulate(net.format(opt=""), dialect="extended")
    r1 = simulate(net.format(opt=".options acop\n"), dialect="extended")
    np.testing.assert_allclose(r0.ac.node_voltages["d"], 0.0, atol=1e-15)
    np.testing.assert_allclose(np.real(r1.ac.node_voltages["d"]), -2.0,
                               rtol=1e-6)
