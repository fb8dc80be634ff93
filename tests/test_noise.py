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
        parse_netlist("t\n.noise v(1) v1 oct 5 1 10\n", dialect="extended")


def test_noise_skipped_in_spicey_dialect():
    ckt = parse_netlist("t\nv1 1 0 dc 1\nr1 1 0 1k\n"
                        ".noise v(1) v1 dec 5 1 10\n")
    assert ckt.noise is None
    assert any(".noise" in s for s in ckt.skipped)
