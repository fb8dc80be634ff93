"""Extended-dialect .noise small-signal noise analysis.

The reference has no noise analysis (SURVEY §2.9). Expectations are
closed-form: resistor thermal noise 4kT/R, diode shot noise 2q*Id,
RC noise bandwidth integral kT/C.
"""

import numpy as np
import pytest

from spicey_tpu import format_noise_result, parse_netlist, simulate
from spicey_tpu.analysis.noise import simulate_noise
from spicey_tpu.constants import K_BOLTZMANN, Q_ELECTRON, T_NOISE, VT_300K

FOUR_KT = 4.0 * K_BOLTZMANN * T_NOISE


def test_single_resistor_thermal_noise():
    """Output noise across a lone resistor = its own 4kTR."""
    r = simulate(
        """the lone resistor
v1 in 0 dc 0 ac 1
r1 in out 1k
r2 out 0 1k
.noise v(out) v1 dec 10 1k 1meg
""",
        dialect="extended",
    )
    n = r.noise
    # two 1k resistors in parallel as seen from out (v1 is an AC short):
    # S_out = 4kT * (R1 || R2) = 4kT * 500
    np.testing.assert_allclose(n.output_psd, FOUR_KT * 500.0, rtol=1e-9)
    # gain = 0.5 -> input-referred = S_out / 0.25
    np.testing.assert_allclose(np.abs(n.gain), 0.5, rtol=1e-12)
    np.testing.assert_allclose(n.input_psd, FOUR_KT * 2000.0, rtol=1e-9)
    # both resistors contribute equally
    np.testing.assert_allclose(n.contributions["r1"],
                               n.contributions["r2"], rtol=1e-9)


def test_rc_noise_rolloff_and_ktc():
    """RC lowpass: S_out(f) = 4kTR/(1+(2pi f R C)^2); integral over all
    f = kT/C (the classic kT/C limit)."""
    R, C = 10e3, 1e-9
    r = simulate(
        f"""the rc noise
v1 in 0 dc 0 ac 1
r1 in out {R}
c1 out 0 {C}
.noise v(out) v1 dec 40 1 1g
""",
        dialect="extended",
    )
    n = r.noise
    fc = 1.0 / (2 * np.pi * R * C)
    expected = FOUR_KT * R / (1.0 + (n.freqs / fc) ** 2)
    np.testing.assert_allclose(n.output_psd, expected, rtol=1e-9)
    # integrated rms^2 ~ kT/C (band 1 Hz..1 GHz covers essentially all of it)
    ktc = K_BOLTZMANN * T_NOISE / C
    assert n.total_output_rms ** 2 == pytest.approx(ktc, rel=0.02)


def test_diode_shot_noise():
    """Forward-biased diode: shot noise 2q*Id through rd || R."""
    r = simulate(
        """the diode shot
v1 in 0 dc 5
r1 in out 1k
d1 out 0 dm
.model dm d(is=1e-14)
.noise v(out) v1 dec 5 1k 100k
""",
        dialect="extended",
    )
    n = r.noise
    from spicey_tpu import simulate_op

    op = simulate_op(r.circuit)
    i_d = abs(op.element_currents["d1"])
    gd = 1e-14 / VT_300K * np.exp(op.node_voltages["out"] / VT_300K)
    r_par = 1.0 / (gd + 1e-3)  # rd || 1k
    expected = (2.0 * Q_ELECTRON * i_d + FOUR_KT / 1000.0) * r_par ** 2
    np.testing.assert_allclose(n.output_psd, expected, rtol=1e-4)
    assert "d1" in n.contributions


def test_noise_differential_output_and_current_input():
    ckt = parse_netlist(
        """the norton noise
i1 0 a 1m
r1 a 0 1k
r2 a b 1k
r3 b 0 1k
.noise v(a,b) i1 lin 5 10 50
""",
        dialect="extended",
    )
    n = simulate_noise(ckt)
    assert n.freqs.shape == (5,)
    assert n.out_spec == "v(a,b)"
    assert np.all(n.output_psd > 0)
    # transresistance gain a-b for unit input current
    assert np.abs(n.gain[0]) > 0


def test_noise_formatter():
    r = simulate(
        "the fmt\nv1 in 0 dc 0 ac 1\nr1 in out 1k\nr2 out 0 1k\n"
        ".noise v(out) v1 lin 3 100 300\n",
        dialect="extended",
    )
    txt = format_noise_result(r.noise)
    assert "Noise analysis at v(out), input v1" in txt
    assert "onoise" in txt
    assert len(txt.splitlines()) == 2 + 3
    assert format_noise_result(None) == "No NOISE analysis.\n"


def test_noise_unknown_source_raises():
    with pytest.raises(ValueError, match="Unknown source"):
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.noise v(1) vx dec 5 1 10\n",
                 dialect="extended")


def test_noise_bad_mode_raises():
    with pytest.raises(ValueError, match="dec.*lin|lin.*dec"):
        parse_netlist("t\n.noise v(1) v1 log 5 1 10\n", dialect="extended")


def test_noise_skipped_in_spicey_dialect():
    ckt = parse_netlist("t\nv1 1 0 dc 1\nr1 1 0 1k\n"
                        ".noise v(1) v1 dec 5 1 10\n")
    assert ckt.noise is None
    assert any(".noise" in s for s in ckt.skipped)


def test_flicker_noise_slope():
    """Diode KF: at low f the 1/f term dominates, so f * S_contrib(f) is
    ~flat across the flicker-dominated decades."""
    net = """* flicker
.model dn d(is=1e-14 kf=1e-16 af=1)
v1 a 0 dc 5 ac 1
r1 a b 1k
dx b 0 dn
.noise v(b) v1 dec 10 1 1e6
.end
"""
    r = simulate(net, dialect="extended")
    c = r.noise.contributions["dx"]
    f = r.noise.freqs
    fs = f * c
    # flat within 5% over the first two decades (shot floor is ~1e-5 of
    # the flicker level at 1 Hz with these numbers)
    assert abs(fs[10] / fs[0] - 1.0) < 0.05
    # and without kf the contribution is white (flat S, growing f*S)
    r0 = simulate(net.replace(" kf=1e-16 af=1", ""), dialect="extended")
    c0 = r0.noise.contributions["dx"]
    assert abs(c0[10] / c0[0] - 1.0) < 1e-6


def test_mosfet_channel_noise_regions():
    """ngspice-style region forms: 4kT*gds in triode, (8/3)kT*gm in
    saturation, zero in cutoff (ADVICE r1: the old code always used the
    saturation formula and floored gm at GMIN)."""
    net = """* mos noise
.model mn nmos(vto=1 kp=1m)
vdd vdd 0 {VD}
vg g 0 {VG}
rload vdd d 1k
m1 d g 0 mn
.noise v(d) vg lin 2 1k 2k
.end
"""
    tri = simulate(net.format(VD="1", VG="5"), dialect="extended")
    sat = simulate(net.format(VD="30", VG="5"), dialect="extended")
    cut = simulate(net.format(VD="8", VG="0"), dialect="extended")
    c_tri = tri.noise.contributions["m1"][0]
    c_sat = sat.noise.contributions["m1"][0]
    c_cut = cut.noise.contributions["m1"][0]
    assert c_cut == 0.0
    assert c_tri > 0.0 and c_sat > 0.0
    assert c_sat != c_tri
