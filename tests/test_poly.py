"""SPICE2 POLY(n) controlled sources (extended dialect).

Classic vendor macromodels (the Boyle opamp and its descendants) are
written with POLY sources; the extended dialect lowers them onto
behavioral (B) sources — the polynomial compiles to an expression over
v(a,b)/i(vname) references and converges under the shared Newton
machinery. The reference drops E/G/F/H lines entirely.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate

BASE = """x
v1 in 0 dc 2
r0 in 0 1k
{src}
rl out 0 1k
.op
"""


def test_poly1_linear_matches_native_sources():
    r_plain = simulate(BASE.format(src="e1 out 0 in 0 3"),
                       dialect="extended")
    r_poly = simulate(BASE.format(src="e1 out 0 POLY(1) in 0 0 3"),
                      dialect="extended")
    assert r_poly.op.node_voltages["out"] == pytest.approx(
        r_plain.op.node_voltages["out"], rel=1e-12)
    g_plain = simulate(BASE.format(src="g1 0 out in 0 2m"),
                       dialect="extended")
    g_poly = simulate(BASE.format(src="g1 0 out POLY(1) in 0 0 2m"),
                      dialect="extended")
    assert g_poly.op.node_voltages["out"] == pytest.approx(
        g_plain.op.node_voltages["out"], rel=1e-12)


def test_poly1_quadratic():
    """i = 1m*v(in)^2 = 4 mA into 1k: v(out) = 4."""
    r = simulate(BASE.format(src="g1 0 out POLY(1) in 0 0 0 1m"),
                 dialect="extended")
    assert r.op.node_voltages["out"] == pytest.approx(4.0, rel=1e-9)


def test_poly2_sum_and_product():
    r = simulate("""x
va a 0 dc 1.5
vb b 0 dc 2.5
e1 out 0 POLY(2) a 0 b 0 0 1 1
rl out 0 1k
.op
""", dialect="extended")
    assert r.op.node_voltages["out"] == pytest.approx(4.0, rel=1e-9)
    # SPICE2 quadratic ordering: p3*x1^2, p4*x2*x1, p5*x2^2
    r2 = simulate("""x
va a 0 dc 1.5
vb b 0 dc 2.5
e1 out 0 POLY(2) a 0 b 0 0 0 0 0 1 0
rl out 0 1k
.op
""", dialect="extended")
    assert r2.op.node_voltages["out"] == pytest.approx(1.5 * 2.5, rel=1e-9)


def test_poly_current_controlled():
    """F POLY(1): i(v1) = -2 mA, f = -2*i(v1) = 4 mA -> 4 V."""
    r = simulate("""x
v1 in 0 dc 2
r0 in 0 1k
f1 0 out POLY(1) v1 0 -2
rl out 0 1k
.op
""", dialect="extended")
    assert r.op.node_voltages["out"] == pytest.approx(4.0, rel=1e-9)


def test_poly_h_source():
    """H POLY(1) with p0 + p1*i: v = 1 + 500*i(v1)."""
    r = simulate("""x
v1 in 0 dc 2
r0 in 0 1k
h1 out 0 POLY(1) v1 1 500
rl out 0 1k
.op
""", dialect="extended")
    assert r.op.node_voltages["out"] == pytest.approx(
        1.0 + 500 * (-2e-3), rel=1e-9)


def test_poly_errors():
    # tokens are counted, not typed (SPICE semantics), so a short line
    # surfaces as missing coefficients
    with pytest.raises(ValueError, match="control node|coefficients"):
        parse_netlist("x\ne1 out 0 POLY(2) a 0 1 2\n", dialect="extended")
    with pytest.raises(ValueError, match="beyond second order"):
        parse_netlist(
            "x\ne1 out 0 POLY(2) a 0 b 0 1 1 1 1 1 1 1 1 1\nva a 0 1\n"
            "vb b 0 1\nrl out 0 1k\n", dialect="extended")
    with pytest.raises(ValueError, match="coefficients"):
        parse_netlist("x\ne1 out 0 POLY(1) a 0\nva a 0 1\n",
                      dialect="extended")


def test_poly_in_subcircuit():
    r = simulate("""x
.subckt dbl in out
e1 out 0 POLY(1) in 0 0 2
rl out 0 10k
.ends
v1 a 0 dc 1.5
x1 a b dbl
.op
""", dialect="extended")
    assert r.op.node_voltages["b"] == pytest.approx(3.0, rel=1e-9)


# --- flagship: a Boyle-style opamp macromodel, closed loop ---

OPAMP = """* two-pole opamp macromodel with tanh output limiting
.subckt opamp inp inn out
* input stage: differential transconductance into the dominant pole
rin inp inn 1meg
g1 0 p1 POLY(1) inp inn 0 1m
r1 p1 0 100k
c1 p1 0 15.9n
* second pole
g2 0 p2 POLY(1) p1 0 0 10m
r2 p2 0 100k
c2 p2 0 0.159p
* output stage: +-10 V tanh limiter, low output impedance
b1 o1 0 v=10*tanh(0.1*v(p2))
ro o1 out 75
.ends
"""


def test_opamp_macromodel_closed_loop_gain():
    """Non-inverting x10: closed-loop DC gain 10, and the open-loop gain
    (gm1*R1*gm2*R2 = 100*1000 = 100 dB) rolls off through the dominant
    pole so the closed-loop bandwidth ~ GBW/10."""
    r = simulate(OPAMP + """
vin in 0 dc 0.01 ac 1
xo1 in fb out opamp
rf out fb 9k
rg fb 0 1k
.op
.ac dec 10 10 10meg
""", dialect="extended", ac_linearize="op")
    # DC: 0.01 V * 10 = 0.1 V (loop gain huge at DC)
    assert r.op.node_voltages["out"] == pytest.approx(0.1, rel=1e-3)
    h = np.abs(np.asarray(r.ac.node_voltages["out"]))
    f = np.asarray(r.ac.freqs)
    # flat gain-of-10 passband
    assert h[0] == pytest.approx(10.0, rel=1e-3)
    # rolls off by the top of the sweep
    assert h[-1] < 2.0
    # -3 dB crossing ~ GBW/gain: A0 = gm1*R1*gm2*R2 = 100*1000 = 1e5,
    # f_p1 = 1/(2 pi R1 C1) ~ 100 Hz -> GBW ~ 10 MHz
    gbw = 100.0 * 1000.0 * (1 / (2 * np.pi * 100e3 * 15.9e-9))
    k = np.argmax(h < 10.0 / np.sqrt(2))
    f3 = np.interp(10 / np.sqrt(2), [h[k], h[k - 1]], [f[k], f[k - 1]])
    assert f3 == pytest.approx(gbw / 10.0, rel=0.25)


def test_opamp_macromodel_output_limits():
    """Driven past the rails the tanh limiter clamps near +-10 V."""
    r = simulate(OPAMP + """
vin in 0 dc 2
xo1 in fb out opamp
rf out fb 9k
rg fb 0 1k
.op
""", dialect="extended")
    assert 9.0 < r.op.node_voltages["out"] < 10.5


def test_ua741_vendor_macromodel_unmodified():
    """The industry-standard uA741 Boyle macromodel (tests/fixtures/
    ua741.py) runs UNMODIFIED: POLY(2)/POLY(5) sources with paren control
    pairs, BJT input pair, diode rail clamps, numeric nodes. Inverting
    x10 on +-15 V rails: DC gain -10 (within the 741's finite open-loop
    gain) and the closed-loop -3 dB near GBW/10 ~ 100 kHz."""
    from tests.fixtures.ua741 import UA741

    deck = UA741 + """
vcc vcc 0 dc 15
vee vee 0 dc -15
vin in 0 dc 0.1 ac 1
rin in minus 1k
rfb minus out 10k
xamp 0 minus vcc vee out ua741
.op
.ac dec 10 1 10meg
"""
    r = simulate(deck, dialect="extended", ac_linearize="op")
    assert r.op.node_voltages["out"] == pytest.approx(-1.0, rel=5e-3)
    h = np.abs(np.asarray(r.ac.node_voltages["out"]))
    f = np.asarray(r.ac.freqs)
    assert h[0] == pytest.approx(10.0, rel=1e-2)
    k = np.argmax(h < 10.0 / np.sqrt(2))
    f3 = np.interp(10 / np.sqrt(2), [h[k], h[k - 1]], [f[k], f[k - 1]])
    assert 50e3 < f3 < 300e3   # the 741's GBW/10 ballpark
    assert h[-1] < 0.1          # fully rolled off at 10 MHz
