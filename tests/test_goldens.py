"""Independent goldens for the extended dialect (VERDICT r4 #9).

The reference validates its transient engine against a LIVE independent
oracle (ngspice-WASM at test time, tests/fixtures/ngspice-transient.ts:78).
No JS runtime or ngspice binary exists in this environment, so the
extended-dialect devices — which the reference does not implement at all —
are validated here against *independently derived* goldens: datasheet
numbers, textbook closed forms, and independent numerical routes (e.g. a
Lambert-W evaluation of the diode equation implemented in this file from
the mathematical definition, not from engine code). Each check documents
its source and its tolerance rationale.

This file complements the analytic checks that already live with their
device families: thermal/shot/flicker noise closed forms (test_noise.py),
the transformer mesh-equation solution (test_coupling.py), quarter/half
wave and reflection coefficients (test_tline.py), LTRA hyperbolic
convergence (test_ltra.py), and URC Elmore delay (test_tline.py).
"""

import numpy as np
import pytest

from spicey_tpu import simulate
from spicey_tpu.analysis.op import simulate_op
from spicey_tpu.analysis.tf import simulate_tf
from spicey_tpu.parsing.netlist import parse_netlist
from tests.fixtures.ua741 import UA741


# ---------------------------------------------------------------------------
# uA741 Boyle macromodel vs the TI datasheet (SLOS094; typ values)
# ---------------------------------------------------------------------------


def test_ua741_slew_rate_datasheet():
    """Datasheet slew rate: 0.5 V/us typ. The Boyle macromodel realizes
    SR = Iee/C2 = 15.16 uA / 30 pF = 0.505 V/us by construction, so the
    simulated large-signal follower edge must land on the datasheet
    number. Tolerance 10%: the edge is measured between 20% and 80% of a
    10 V swing on a fixed 0.25 us grid (grid quantization ~2%), and the
    input stage adds a small settling tail."""
    deck = f"""a ua741 follower slew deck
{UA741}
vcc vcc 0 15
vee vee 0 -15
vin in 0 PWL(0 0 5u 0 5.05u 5 60u 5)
xamp in out vcc vee out ua741
rl out 0 10k
.tran 0.25u 25u
.end
"""
    r = simulate(deck, dialect="extended")
    t = np.asarray(r.tran.times)
    v = np.asarray(r.tran.node_voltages["out"])
    # rising edge 0 -> 5 V after the settle window; slew 20%..80%
    i20 = int(np.argmax((t > 5e-6) & (v > 1.0)))
    i80 = int(np.argmax((t > 5e-6) & (v > 4.0)))
    assert i80 > i20 > 0, "edge not found"
    sr = 3.0 / (t[i80] - t[i20])  # V/s
    assert sr == pytest.approx(0.5e6, rel=0.10)


def test_ua741_inverting_amp_closed_loop_gain():
    """Textbook inverting amplifier: G = -R2/R1 / (1 + (1 + R2/R1)/A).
    With R2/R1 = 10 and the 741's A0 ~ 2e5 the ideal -10 is accurate to
    ~5.5e-5 relative; assert 0.1% (covers the model's finite output
    resistance and input currents). Source: any op-amp text (e.g.
    Sedra-Smith, inverting configuration)."""
    deck = f"""a ua741 inverting amp deck
{UA741}
vcc vcc 0 15
vee vee 0 -15
vin in 0 dc 0 ac 1
r1 in minus 1k
r2 minus out 10k
xamp 0 minus vcc vee out ua741
rl out 0 10k
.ac lin 2 10 20
.end
"""
    r = simulate(deck, dialect="extended", ac_linearize="op")
    gain = r.ac.node_voltages["out"][0]
    assert abs(gain) == pytest.approx(10.0, rel=1e-3)
    # inverting: phase ~180 degrees at 10 Hz
    assert abs(np.angle(gain, deg=True)) == pytest.approx(180.0, abs=1.0)


def test_ua741_output_swing_clamps_near_rails():
    """Datasheet output voltage swing: +-14 V typ at +-15 V rails with
    RL = 10k. The Boyle model clamps through dc/de + vc/ve (one diode
    drop past Vcc-1), so an overdriven INVERTING stage (gain -2, 10 V
    drive — the common mode stays at the virtual ground; a follower
    driven past the rails phase-reverses, a genuine 741 artifact) must
    flat-top between 13 V and 14.9 V — the datasheet's typ region, wide
    tolerance because the clamp diodes' Rs=1 shifts with load current."""
    deck = f"""a ua741 swing deck
{UA741}
vcc vcc 0 15
vee vee 0 -15
vin in 0 dc 0 SIN(0 10 1k)
r1 in minus 10k
r2 minus out 20k
xamp 0 minus vcc vee out ua741
rl out 0 10k
.tran 5u 2m
.end
"""
    r = simulate(deck, dialect="extended")
    v = np.asarray(r.tran.node_voltages["out"])
    assert 13.0 <= v.max() <= 14.9
    assert -14.9 <= v.min() <= -13.0


# ---------------------------------------------------------------------------
# Device physics closed forms
# ---------------------------------------------------------------------------


def _lambert_w(x: np.ndarray, iters: int = 50) -> np.ndarray:
    """Principal-branch Lambert W by Halley iteration from the defining
    equation w*e^w = x — an implementation from the mathematical
    definition, sharing no code with the engine."""
    w = np.log1p(np.asarray(x, dtype=np.float64))
    for _ in range(iters):
        ew = np.exp(w)
        f = w * ew - x
        w = w - f / (ew * (w + 1.0) - (w + 2.0) * f / (2.0 * w + 2.0))
    return w


def test_diode_series_r_lambert_w():
    """V-R-D loop: the Shockley + KCL system has the closed form
    I = (n*VT/R) * W( (Is*R)/(n*VT) * exp((V + Is*R)/(n*VT)) ) - Is
    (standard result, e.g. Banwell & Jayakumar 2000). The engine's .op
    must hit it to 1e-9 — an independent *mathematical route* to the
    operating point, not a re-run of Newton on the same equations."""
    V, R, Is, n = 3.3, 2200.0, 2.5e-14, 1.35
    vt = n * 0.02585
    x = (Is * R / vt) * np.exp((V + Is * R) / vt)
    i_an = (vt / R) * _lambert_w(x) - Is
    vd_an = V - i_an * R
    deck = f"""a lambert-w diode deck
vin in 0 dc {V}
r1 in d {R}
d1 d 0 dm
.model dm d(is={Is} n={n})
.op
.end
"""
    r = simulate(deck, dialect="extended")
    assert r.op.node_voltages["d"] == pytest.approx(vd_an, rel=1e-9)
    assert r.op.element_currents["d1"] == pytest.approx(i_an, rel=1e-9)


def test_bjt_ce_transresistance():
    """Common-emitter stage driven by a base current source: in forward
    active the Ebers-Moll collector current is exactly Bf*Ib (the
    reverse diode term is ~Is/Br ~ 1e-18 A), so the .tf transfer
    d v(c)/d i(b) = -Bf*Rc — the textbook current-gain relation, exact
    for this model. Tolerance 1e-6 covers the finite reverse term."""
    deck = """a bjt transresistance deck
.model qn npn(is=1e-16 bf=137)
vcc vcc 0 12
ib 0 b 20u
rc vcc c 2.2k
q1 c b 0 qn
.tf v(c) ib
.end
"""
    r = simulate(deck, dialect="extended")
    assert r.tf.transfer_function == pytest.approx(-137 * 2.2e3, rel=1e-6)


def test_mosfet_saturation_self_consistent():
    """NMOS with a drain resistor: the operating point solves
    Vdd - Vd = Rd * (Kp/2)(Vgs-Vto)^2 (1 + lambda*Vd) — a scalar fixed
    point iterated HERE from the square-law formula (Shichman-Hodges,
    any VLSI text), independently of the engine's Newton. 1e-9."""
    vdd, rd, kp, vto, lam, vgs = 5.0, 1.8e3, 2.4e-3, 0.9, 0.04, 2.1
    vd = vdd
    for _ in range(200):
        i_d = 0.5 * kp * (vgs - vto) ** 2 * (1.0 + lam * vd)
        vd = vdd - rd * i_d
    assert vd > vgs - vto, "fixture must sit in saturation"
    deck = f"""a mosfet square-law deck
.model mn nmos(vto={vto} kp={kp} lambda={lam})
vdd vdd 0 {vdd}
vg g 0 {vgs}
rd vdd d {rd}
m1 d g 0 mn
.op
.end
"""
    r = simulate(deck, dialect="extended")
    assert r.op.node_voltages["d"] == pytest.approx(vd, rel=1e-9)


# ---------------------------------------------------------------------------
# Distributed lines: analytic two-ports at (R, L, G, C) corners
# ---------------------------------------------------------------------------


def _abcd_transfer(freqs, R, L, G, C, length, rs, rl):
    """Analytic V(load)/V(source) of the distributed RLGC line between
    source impedance rs and load rl — telegrapher's-equation ABCD
    two-port (Pozar, Microwave Engineering, ch. 2). Written from the
    formula; shares nothing with the engine's lumped lowering."""
    w = 2j * np.pi * np.asarray(freqs, dtype=np.float64)
    z = R + w * L
    y = G + w * C
    gam = np.sqrt(z * y) * length
    zc = np.sqrt(z / y)
    A = np.cosh(gam)
    B = zc * np.sinh(gam)
    Cm = np.sinh(gam) / zc
    D = np.cosh(gam)
    return rl / ((A * rl + B) + rs * (Cm * rl + D))


def test_ltra_heaviside_distortionless_corner():
    """Heaviside condition R/L = G/C: the line is distortionless —
    |H| = e^(-R*len/Z0) at EVERY frequency into a matched load
    (classic result, Heaviside 1887). Corner: R=20, L=250n, G=R*C/L,
    C=100p, len=1, Z0=50. Tolerance 2e-3: the engine lowers the lossy
    line onto cascaded lumped sections (test_ltra docstring), and the
    auto lump count bounds the sectioning error at about this level
    across the swept band."""
    R, L, C, length = 20.0, 250e-9, 100e-12, 1.0
    G = R * C / L
    z0 = np.sqrt(L / C)
    deck = f"""a distortionless ltra deck
v1 in 0 ac 1
r1 in a {z0}
o1 a 0 b 0 LT
.model LT ltra(r={R} l={L:.3g} g={G:.6g} c={C:.3g} len={length})
r2 b 0 {z0}
.ac lin 12 1e6 5e7
.end
"""
    r = simulate(deck, dialect="extended")
    h = np.abs(np.asarray(r.ac.node_voltages["b"]))
    expect = np.abs(_abcd_transfer(r.ac.freqs, R, L, G, C, length,
                                   z0, z0))
    np.testing.assert_allclose(h, expect, rtol=2e-3)
    # the defining property: flat attenuation e^(-R*len/Z0) / 2 (divider)
    flat = 0.5 * np.exp(-R * length / z0)
    np.testing.assert_allclose(h, flat, rtol=2e-3)


def test_ltra_general_rlgc_corner():
    """All four line constants nonzero (lossy, leaky, dispersive):
    R=30, L=400n, G=1e-4, C=80p against the ABCD closed form at spot
    frequencies. Tolerance 5e-3 (lumped-section error at the default
    auto lump count; the Heaviside test pins the tighter corner)."""
    R, L, G, C, length = 30.0, 400e-9, 1e-4, 80e-12, 1.0
    deck = f"""a general rlgc ltra deck
v1 in 0 ac 1
r1 in a 75
o1 a 0 b 0 LT
.model LT ltra(r={R} l={L:.3g} g={G} c={C:.3g} len={length})
r2 b 0 120
.ac lin 8 1e6 4e7
.end
"""
    r = simulate(deck, dialect="extended")
    h = np.asarray(r.ac.node_voltages["b"])
    expect = _abcd_transfer(r.ac.freqs, R, L, G, C, length, 75.0, 120.0)
    np.testing.assert_allclose(np.abs(h), np.abs(expect), rtol=5e-3)
    np.testing.assert_allclose(np.angle(h), np.angle(expect), atol=5e-3)


def test_urc_open_line_input_impedance():
    """Open-ended uniform RC line: Zin = sqrt(R/(jwC)) * coth(sqrt(jwRC))
    (per unit values folded in; standard diffusion-line result, e.g.
    Ghausi & Kelly, Introduction to Distributed-Parameter Networks).
    Measured through a known series resistor as a divider. Tolerance
    2%: the URC element IS a lumped approximation by definition (the
    SPICE URC model is the same ladder); the lump count set by fmax
    bounds the error at about this level."""
    rtot, ctot = 10e3, 1e-9
    rs = 5e3
    deck = f"""a urc input impedance deck
v1 in 0 ac 1
rs in a {rs}
u1 a end 0 um l=1 n=24
.model um urc(k=1.5 rperl={rtot} cperl={ctot})
.ac lin 6 1e4 1e6
.end
"""
    r = simulate(deck, dialect="extended")
    w = 2j * np.pi * np.asarray(r.ac.freqs)
    srct = np.sqrt(w * rtot * ctot)
    zin = np.sqrt(rtot / (w * ctot)) / np.tanh(srct)
    expect = zin / (rs + zin)
    np.testing.assert_allclose(np.abs(r.ac.node_voltages["a"]),
                               np.abs(expect), rtol=0.02)


# ---------------------------------------------------------------------------
# Fourier analysis vs the analytic series
# ---------------------------------------------------------------------------


def test_four_rc_filtered_square_harmonics():
    """A 50%-duty square wave has the odd-harmonic series 4/(pi*k); each
    harmonic then scales by the RC lowpass |H(kf0)| = 1/sqrt(1+(k w0 RC)^2)
    (superposition — any signals text). The .four harmonic magnitudes on
    the filtered node must match that product. Tolerance 3%: the square's
    finite 1% rise/fall time rolls off the 9th harmonic by ~1.3%, and the
    BE integrator adds first-order phase lag at 2000 steps/period."""
    f0, rr, cc = 1e3, 1e3, 20e-9
    deck = f"""a fourier golden deck
v1 in 0 PULSE(-1 1 0 5u 5u 495u 1000u)
r1 in out {rr}
c1 out 0 {cc}
.tran 1u 3000u
.four {f0} v(out)
.end
"""
    r = simulate(deck, dialect="extended")
    mags = np.asarray(r.four.probes["out"].magnitude)
    w0 = 2 * np.pi * f0
    for k in (1, 3, 5):
        expect = (4 / (np.pi * k)) / np.sqrt(1 + (k * w0 * rr * cc) ** 2)
        assert mags[k] == pytest.approx(expect, rel=0.03), f"harmonic {k}"
    for k in (2, 4):  # even harmonics of a 50% square vanish
        assert mags[k] < 0.01 * mags[1]


def test_ua741_integrator_frequency_response():
    """Op-amp integrator: |H(f)| = 1/(2 pi f R C) while loop gain is
    high (textbook). With R=10k, C=10n the unity-gain crossover sits at
    1.59 kHz, two decades below the 741's ~1 MHz GBW, so the ideal law
    holds to well under 1% there; assert 2% across 200 Hz - 2 kHz."""
    R, C = 10e3, 10e-9
    deck = f"""a ua741 integrator deck
{UA741}
vcc vcc 0 15
vee vee 0 -15
vin in 0 dc 0 ac 1
r1 in minus {R}
c1 minus out {C}
rdc minus out 10meg
xamp 0 minus vcc vee out ua741
rl out 0 10k
.ac dec 5 200 2000
.end
"""
    r = simulate(deck, dialect="extended", ac_linearize="op")
    h = np.abs(np.asarray(r.ac.node_voltages["out"]))
    expect = 1.0 / (2 * np.pi * np.asarray(r.ac.freqs) * R * C)
    np.testing.assert_allclose(h, expect, rtol=0.02)
