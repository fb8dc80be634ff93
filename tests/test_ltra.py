"""LTRA lossy transmission lines (O elements, extended dialect).

The O element lowers in the parser post-pass onto existing primitives
(netlist.OLine docstring): one exact lossless T for LC lines, cascaded
R/2 - T - R/2 sections (+ split shunt G) for lossy RLC, the URC-style
ladder for RC diffusion lines, and exact series R(+L) chains when the
shunt side is absent. Checks: exactness where the lowering is exact,
convergence to the analytic hyperbolic two-port where it is an
approximation, and the parse-time guard rails.
"""

import numpy as np
import pytest

from spicey_tpu import simulate
from spicey_tpu.parsing.netlist import parse_netlist


def _hyper_vb(freqs, R, L, G, C, length, rs=50.0, rl=50.0):
    """Analytic |V(load)| of a 1 V source behind ``rs`` driving the RLGC
    line terminated by ``rl`` (ABCD of the distributed line)."""
    w = 2j * np.pi * np.asarray(freqs)
    gam = np.sqrt((R + w * L) * (G + w * C)) * length
    zc = np.sqrt((R + w * L) / np.where(G + w * C == 0, 1, (G + w * C)))
    A = np.cosh(gam)
    B = zc * np.sinh(gam)
    Cm = np.sinh(gam) / zc
    D = np.cosh(gam)
    return rl / ((A * rl + B) + rs * (Cm * rl + D))


def test_lc_line_equals_t_element_exactly():
    deck_o = """a lossless ltra deck
V1 in 0 ac 1 PULSE(0 1 0 1n 1n 50n 200n)
R1 in a 50
O1 a 0 b 0 LL
.model LL ltra(l=250n c=100p len=1)
R2 b 0 50
.ac lin 20 1e6 1e8
.tran 1n 200n
.end"""
    deck_t = deck_o.replace("O1 a 0 b 0 LL", "T1 a 0 b 0 Z0=50 TD=5n") \
                   .replace(".model LL ltra(l=250n c=100p len=1)\n", "")
    ro = simulate(deck_o, dialect="extended")
    rt = simulate(deck_t, dialect="extended")
    for k in ("a", "b"):
        np.testing.assert_allclose(
            np.abs(ro.ac.node_voltages[k]), np.abs(rt.ac.node_voltages[k]),
            rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(
            ro.tran.node_voltages[k], rt.tran.node_voltages[k],
            rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("nseg,tol", [(12, 5e-4), (24, 1.3e-4)])
def test_rlc_ac_converges_to_hyperbolic(nseg, tol):
    R, L, C = 25.0, 250e-9, 100e-12
    r = simulate(f"""a lossy ltra deck
V1 in 0 ac 1
R1 in a 50
O1 a 0 b 0 LM
.model LM ltra(r=25 l=250n c=100p len=1 nseg={nseg})
R2 b 0 50
.ac lin 10 1e6 2e8
.end""", dialect="extended")
    vb = np.asarray(r.ac.node_voltages["b"])
    vb_exact = _hyper_vb(r.ac.freqs, R, L, 0.0, C, 1.0)
    err = np.abs(vb - vb_exact).max() / np.abs(vb_exact).min()
    assert err < tol  # second-order in 1/nseg (4x per doubling)


def test_rc_diffusion_line_matches_hyperbolic():
    # L=0: the lowering is the uniform R/C ladder; the analytic limit is
    # the same ABCD formula with gamma = sqrt(R*jwC)
    R, C = 1e4, 1e-9
    r = simulate("""a diffusion ltra deck
V1 in 0 ac 1
R1 in a 50
O1 a 0 b 0 RCM
.model RCM ltra(r=10k c=1n len=1 nseg=60)
R2 b 0 1e6
.ac dec 5 1e3 1e6
.end""", dialect="extended")
    vb = np.asarray(r.ac.node_voltages["b"])
    vb_exact = _hyper_vb(r.ac.freqs, R, 0.0, 0.0, C, 1.0, rs=50.0, rl=1e6)
    np.testing.assert_allclose(np.abs(vb), np.abs(vb_exact), rtol=5e-3)


def test_lossy_line_dc_and_attenuation():
    """.op sees the exact series DC resistance (the T sections are DC
    differential shorts), and the transient pulse arrives one delay
    later attenuated by ~exp(-R_tot/(2*Z0)) into a matched load."""
    r = simulate("""a matched lossy deck
V1 in 0 dc 1 PULSE(0 1 0 0.1n 0.1n 80n 200n)
R1 in a 50
O1 a 0 b 0 LM
.model LM ltra(r=20 l=250n c=100p len=1)
R2 b 0 50
.op
.tran 0.25n 15n
.end""", dialect="extended")
    # DC: divider 50 + 20 + 50
    assert r.op.node_voltages["b"] == pytest.approx(50.0 / 120.0, rel=1e-9)
    t = np.asarray(r.tran.times)
    vb = np.asarray(r.tran.node_voltages["b"])
    # before the 5 ns delay the load is quiet; after settling, the
    # incident 0.5 V arrives attenuated by ~exp(-20/(2*50)) = 0.819
    assert np.abs(vb[t < 4.5e-9]).max() < 1e-6
    assert vb[t > 9e-9].mean() == pytest.approx(0.5 * np.exp(-0.2),
                                                rel=0.03)


def test_series_rl_line_exact():
    # C=0, G=0: exact series R+L equivalent
    r = simulate("""a series rl ltra deck
V1 in 0 ac 1
O1 in 0 b 0 RLM
.model RLM ltra(r=100 l=1u len=2)
R2 b 0 100
.ac dec 10 1e3 1e8
.end""", dialect="extended")
    w = 2j * np.pi * np.asarray(r.ac.freqs)
    vb_exact = 100.0 / (100.0 + 200.0 + w * 2e-6)
    np.testing.assert_allclose(np.asarray(r.ac.node_voltages["b"]),
                               vb_exact, rtol=1e-9)


def test_rg_only_line_dc_divider():
    # R and G only: converges to the resistive hyperbolic two-port
    r = simulate("""a rg ltra deck
V1 in 0 dc 1
O1 in 0 b 0 RGM
.model RGM ltra(r=1k g=1m len=1 nseg=60)
R2 b 0 1e9
.op
.end""", dialect="extended")
    # open-ish far end: V(b)/V(in) = 1/cosh(sqrt(R*G)) = 1/cosh(1)
    assert r.op.node_voltages["b"] == pytest.approx(1.0 / np.cosh(1.0),
                                                    rel=2e-3)


def test_ltra_parse_guards():
    with pytest.raises(ValueError, match="Unknown .model"):
        simulate("a deck\nO1 a 0 b 0 NOPE\nR1 a 0 1k\n.op\n.end",
                 dialect="extended")
    with pytest.raises(ValueError, match="len must be > 0"):
        parse_netlist("a deck\n.model M1 ltra(r=1 len=0)\n",
                      dialect="extended")
    with pytest.raises(ValueError, match="zero series impedance"):
        simulate("a deck\nV1 in 0 dc 1\nO1 in 0 b 0 M1\nR2 b 0 1k\n"
                 ".model M1 ltra(c=1n len=1)\n.op\n.end",
                 dialect="extended")
    with pytest.raises(ValueError, match="not supported"):
        parse_netlist("a deck\n.model M1 ltra(l=1u g=1m len=1)\n",
                      dialect="extended")
    # reference dialect: O lines land in skipped (parseNetlist.ts:444-446)
    ckt = parse_netlist("a deck\nR1 a 0 1k\nO1 a 0 b 0 M1\n")
    assert any("O1" in s for s in ckt.skipped)


def test_ltra_inside_subckt():
    """O cards in .subckt bodies get their four nodes scope-mapped (the
    flattener's node-count table); the lowered T/R elements carry the
    instance-scoped names."""
    r = simulate("""a hierarchical ltra deck
.subckt seg p1 p2
O1 p1 0 p2 0 LM
.ends
V1 in 0 ac 1
R1 in a 50
X1 a b seg
R2 b 0 50
.model LM ltra(l=250n c=100p len=1)
.ac lin 5 1e6 1e7
.end""", dialect="extended")
    vb = np.abs(np.asarray(r.ac.node_voltages["b"]))
    np.testing.assert_allclose(vb, 0.5, rtol=1e-9)  # matched lossless line
    # instance-scoped lowered element (name.scope convention)
    assert "O1.X1#t0" in r.ac.element_currents


def test_ltra_batch_and_interp_consistency(monkeypatch):
    """The lowered elements ride every engine: interp vs compiled AC on
    a lossy line agree (the expansion happens at parse time, upstream of
    any tier choice)."""
    net = """a lossy ltra deck
V1 in 0 ac 1
R1 in a 50
O1 a 0 b 0 LM
.model LM ltra(r=25 l=250n c=100p len=1 nseg=8)
R2 b 0 50
.ac lin 15 1e6 1e8
.end"""
    monkeypatch.setenv("SPICEY_TPU_INTERP", "1")
    ri = simulate(net, dialect="extended")
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate(net, dialect="extended")
    np.testing.assert_allclose(np.abs(ri.ac.node_voltages["b"]),
                               np.abs(re_.ac.node_voltages["b"]),
                               rtol=1e-10)
