"""Unit tests for PULSE/PWL waveforms (contract:
/root/reference/lib/parsing/{parsePulseArgs,pulseValue,parsePwlArgs,pwlValue}.ts)."""

import math

import numpy as np
import pytest

from spicey_tpu.parsing.waveforms import (
    PulseWaveform,
    PwlWaveform,
    parse_pulse_args,
    parse_pwl_args,
    pulse_value,
    pwl_value,
)


def test_parse_pulse():
    p = parse_pulse_args("PULSE(0 5 0 1n 1n 5u 10u)")
    assert (p.v1, p.v2, p.td) == (0.0, 5.0, 0.0)
    # units multiply: 5u -> 5*1e-6 (not the 5e-6 literal; same fp value JS gets)
    assert p.tr == p.tf == 1 * 1e-9
    assert p.ton == 5 * 1e-6 and p.period == 10 * 1e-6
    assert p.ncycles == math.inf


def test_parse_pulse_ncycles_and_commas():
    p = parse_pulse_args("pulse(1, 2, 3, 4, 5, 6, 7, 8)")
    assert p.ncycles == 8.0


def test_parse_pulse_errors():
    with pytest.raises(ValueError):
        parse_pulse_args("PULSE(1 2 3)")
    with pytest.raises(ValueError):
        parse_pulse_args("PULSE(1 2 3 4 5 6 xx)")


def test_pulse_value_shape():
    p = parse_pulse_args("PULSE(0 5 1u 1u 1u 5u 10u)")
    assert pulse_value(p, 0.0) == 0.0          # before delay
    assert pulse_value(p, 1.5e-6) == pytest.approx(2.5)  # mid-rise
    assert pulse_value(p, 3e-6) == 5.0         # on
    assert pulse_value(p, 7.5e-6) == pytest.approx(2.5)  # mid-fall
    assert pulse_value(p, 9e-6) == 0.0         # off
    assert pulse_value(p, 13e-6) == 5.0        # next cycle on


def test_pulse_ncycles_expiry():
    p = parse_pulse_args("PULSE(0 5 0 1n 1n 5u 10u 2)")
    assert pulse_value(p, 2e-6) == 5.0
    assert pulse_value(p, 12e-6) == 5.0   # 2nd cycle
    assert pulse_value(p, 22e-6) == 0.0   # expired -> v1


def test_pulse_vectorized_matches_scalar():
    p = parse_pulse_args("PULSE(-1 3 2u 1u 2u 4u 10u 3)")
    wf = PulseWaveform(p)
    t = np.linspace(0, 5e-5, 1777)
    vec = wf.sample(t)
    ref = np.array([pulse_value(p, float(x)) for x in t])
    np.testing.assert_allclose(vec, ref, rtol=0, atol=0)


def test_parse_pwl():
    pairs = parse_pwl_args("PWL(0 0   1m 5   3m 0)")
    assert pairs == [(0.0, 0.0), (1e-3, 5.0), (3e-3, 0.0)]
    with pytest.raises(ValueError):
        parse_pwl_args("PWL(0 0 1m)")
    with pytest.raises(ValueError):
        parse_pwl_args("PWL()")


def test_pwl_value_clamps_and_interpolates():
    pairs = [(0.0, 0.0), (1e-3, 5.0), (3e-3, 0.0)]
    assert pwl_value(pairs, -1.0) == 0.0
    assert pwl_value(pairs, 0.5e-3) == pytest.approx(2.5)
    assert pwl_value(pairs, 2e-3) == pytest.approx(2.5)
    assert pwl_value(pairs, 10.0) == 0.0
    assert pwl_value([], 1.0) == 0.0


def test_pwl_vectorized_matches_scalar():
    pairs = [(0.0, 0.0), (1e-3, 5.0), (3e-3, 0.0), (7e-3, 5.0), (9e-3, 0.0)]
    wf = PwlWaveform(pairs)
    t = np.linspace(-1e-3, 12e-3, 997)
    vec = wf.sample(t)
    ref = np.array([pwl_value(pairs, float(x)) for x in t])
    np.testing.assert_array_equal(vec, ref)  # bit-exact same formula


def test_pwl_duplicate_knots_use_scalar_path():
    pairs = [(0.0, 0.0), (1e-3, 5.0), (1e-3, 2.0), (2e-3, 2.0)]
    wf = PwlWaveform(pairs)
    t = np.array([0.5e-3, 1e-3, 1.5e-3])
    ref = np.array([pwl_value(pairs, float(x)) for x in t])
    np.testing.assert_allclose(wf.sample(t), ref)


# --- extended-dialect SIN/EXP sources ---

def test_sin_waveform_sampling():
    from spicey_tpu.parsing.waveforms import SinWaveform, parse_sin_args

    w = SinWaveform(parse_sin_args("SIN(1 2 1k 0 0 90)"))
    assert w(0.0) == pytest.approx(3.0)            # phase 90 -> peak
    assert w(1e-3) == pytest.approx(3.0)           # full cycle later
    assert w(0.5e-3) == pytest.approx(-1.0)        # half cycle: trough
    assert w(0.25e-3) == pytest.approx(1.0, abs=1e-12)
    # delay: flat at VO before TD
    wd = SinWaveform(parse_sin_args("SIN(0 1 1k 1m)"))
    assert wd(0.5e-3) == 0.0
    # damping decays the envelope
    wt = SinWaveform(parse_sin_args("SIN(0 1 1k 0 500)"))
    quarter = 0.25e-3
    assert abs(wt(quarter + 1e-3)) < abs(wt(quarter))


def test_exp_waveform_sampling():
    from spicey_tpu.parsing.waveforms import ExpWaveform, parse_exp_args

    w = ExpWaveform(parse_exp_args("EXP(0 5 1u 2u 10u 2u)"))
    assert w(0.0) == 0.0
    assert w(1e-6) == 0.0                         # rise starts at TD1
    assert w(5e-6) == pytest.approx(5 * (1 - np.exp(-2.0)), rel=1e-12)
    assert w(1.0) == pytest.approx(0.0, abs=1e-9)  # returns to V1


def test_sin_source_transient_end_to_end():
    from spicey_tpu import parse_netlist, simulate_tran

    net = "t\nv1 1 0 SIN(0 1 10k)\nr1 1 2 1k\nr2 2 0 1k\n.tran 2.5u 200u\n"
    tr = simulate_tran(parse_netlist(net, dialect="extended"))
    t = np.asarray(tr.times)
    expect = 0.5 * np.sin(2 * np.pi * 1e4 * t)
    np.testing.assert_allclose(tr.node_voltages["2"], expect,
                               rtol=1e-12, atol=1e-12)


def test_sin_exp_skipped_in_reference_dialect():
    from spicey_tpu import parse_netlist

    c = parse_netlist("t\nv1 1 0 SIN(0 1 1k)\nr1 1 0 1k\n")
    assert c.V[0].waveform is None  # unknown keyword skipped (parity)
    c = parse_netlist("t\nv1 1 0 EXP(0 5 1u 1u)\nr1 1 0 1k\n")
    assert c.V[0].waveform is None


def test_malformed_sin_raises():
    from spicey_tpu import parse_netlist

    with pytest.raises(ValueError, match="SIN"):
        parse_netlist("t\nv1 1 0 SIN(1)\nr1 1 0 1k\n", dialect="extended")


def test_sffm_waveform():
    """SFFM(VO VA FC MDI FS): ngspice single-frequency FM."""
    import numpy as np

    from spicey_tpu.parsing.waveforms import SffmWaveform, parse_sffm_args

    w = SffmWaveform(parse_sffm_args("SFFM(0.5 2 10k 5 1k)"))
    t = np.linspace(0, 1e-3, 257)
    exp = 0.5 + 2 * np.sin(2 * np.pi * 10e3 * t
                           + 5 * np.sin(2 * np.pi * 1e3 * t))
    np.testing.assert_allclose(w.sample(t), exp, atol=1e-12)
    import pytest

    with pytest.raises(ValueError, match="SFFM"):
        parse_sffm_args("SFFM(1 2)")


def test_am_waveform():
    """AM(VA VO MF FC TD): ngspice amplitude modulation, 0 before TD."""
    import numpy as np

    from spicey_tpu.parsing.waveforms import AmWaveform, parse_am_args

    w = AmWaveform(parse_am_args("AM(2 0.5 1k 10k 1m)"))
    t = np.linspace(0, 3e-3, 301)
    d = t - 1e-3
    exp = np.where(
        d >= 0,
        2 * (0.5 + np.sin(2 * np.pi * 1e3 * d)) * np.sin(2 * np.pi * 10e3 * d),
        0.0)
    np.testing.assert_allclose(w.sample(t), exp, atol=1e-12)


def test_sffm_am_through_source_scanner():
    """SFFM/AM parse on V and I lines in the extended dialect; in the
    reference dialect the tokens are skipped like any unknown keyword."""
    from spicey_tpu import parse_netlist
    from spicey_tpu.parsing.waveforms import AmWaveform, SffmWaveform

    net = ("t\nv1 a 0 SFFM(0 1 10k 5 1k)\ni1 a 0 AM(1 0 1k 10k)\n"
           "r1 a 0 1k\n.end\n")
    ckt = parse_netlist(net, dialect="extended")
    assert isinstance(ckt.V[0].waveform, SffmWaveform)
    assert isinstance(ckt.I[0].waveform, AmWaveform)
    ref = parse_netlist("t\nv1 a 0 SFFM(0 1 10k 5 1k)\nr1 a 0 1k\n.end\n")
    assert ref.V[0].waveform is None  # reference dialect: skipped token
