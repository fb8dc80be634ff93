"""Extended-dialect .four Fourier analysis of transient waveforms.

The reference has no post-processing analyses (SURVEY §5); `.four` mirrors
ngspice's harmonic decomposition of the final fundamental period.
"""

import numpy as np
import pytest

from spicey_tpu import format_four_result, parse_netlist, simulate
from spicey_tpu.analysis.four import fourier_of_waveform


def test_fourier_of_pure_sine():
    t = np.linspace(0.0, 2e-3, 4001)
    y = 0.5 + 2.0 * np.sin(2 * np.pi * 1000.0 * t + np.pi / 6)
    mag, phase, normalized, thd = fourier_of_waveform(t, y, 1000.0)
    assert mag[0] == pytest.approx(0.5, abs=1e-6)
    assert mag[1] == pytest.approx(2.0, rel=1e-6)
    # sin(x + pi/6) = cos(x - pi/3): angle convention is vs cosine
    assert phase[1] == pytest.approx(-60.0, abs=1e-3)
    assert normalized[1] == pytest.approx(1.0)
    assert thd < 1e-4
    assert np.all(mag[2:] < 1e-5)


def test_fourier_square_wave_harmonics():
    """Square wave: odd harmonics at 1/k, ~48% THD over 9 harmonics."""
    t = np.linspace(0.0, 1e-3, 20001)
    y = np.sign(np.sin(2 * np.pi * 5000.0 * t))
    mag, _phase, normalized, thd = fourier_of_waveform(t, y, 5000.0)
    assert mag[1] == pytest.approx(4 / np.pi, rel=1e-2)
    assert normalized[3] == pytest.approx(1 / 3, rel=1e-2)
    assert normalized[5] == pytest.approx(1 / 5, rel=1e-2)
    assert normalized[2] < 1e-2 and normalized[4] < 1e-2
    assert thd == pytest.approx(41.9, abs=3.0)


def test_four_through_simulate():
    r = simulate(
        """the sine probe
v1 in 0 SIN(0 1 1k)
r1 in out 1k
r2 out 0 1k
.tran 1u 5m
.four 1k v(out) v(in)
""",
        dialect="extended",
    )
    assert r.four is not None
    p_out = r.four.probes["out"]
    p_in = r.four.probes["in"]
    assert p_in.magnitude[1] == pytest.approx(1.0, rel=1e-3)
    assert p_out.magnitude[1] == pytest.approx(0.5, rel=1e-3)
    assert p_out.thd_percent < 0.5
    txt = format_four_result(r.four)
    assert "Fourier analysis for v(out)" in txt
    assert "harmonic, f(Hz), magnitude" in txt
    assert format_four_result(None) == "No FOUR analysis.\n"


def test_four_nonlinear_distortion():
    """A diode clipper distorts a sine; THD must be clearly nonzero."""
    r = simulate(
        """the clipper
v1 in 0 SIN(0 2 1k)
r1 in out 1k
d1 out 0 dm
.model dm d(is=1e-12)
.tran 2u 4m
.four 1k v(out)
""",
        dialect="extended",
    )
    assert r.four.probes["out"].thd_percent > 5.0


def test_four_requires_tran():
    with pytest.raises(ValueError, match="requires a .tran"):
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.four 1k v(1)\n",
                 dialect="extended")


def test_four_window_too_short_raises():
    with pytest.raises(ValueError, match="full period"):
        simulate("t\nv1 1 0 SIN(0 1 100)\nr1 1 0 1k\n.tran 1u 1m\n"
                 ".four 100 v(1)\n", dialect="extended")


def test_four_unknown_node_raises():
    with pytest.raises(ValueError, match="Unknown node"):
        simulate("t\nv1 1 0 SIN(0 1 1k)\nr1 1 0 1k\n.tran 1u 2m\n"
                 ".four 1k v(zz)\n", dialect="extended")


def test_four_probe_parsing():
    ckt = parse_netlist(
        "t\nv1 1 0 dc 1\n.tran 1u 1m\n.four 2k v(1) v(2) V(1)\n",
        dialect="extended")
    assert ckt.four.f0 == 2000.0
    assert ckt.four.probes == ["1", "2"]


def test_four_skipped_in_spicey_dialect():
    ckt = parse_netlist("t\nv1 1 0 dc 1\n.four 1k v(1)\n")
    assert ckt.four is None
    assert any(".four" in s for s in ckt.skipped)
