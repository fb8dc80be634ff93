"""Extended-dialect .meas tran measurement directives.

The reference has no measurement post-processing (SURVEY §5); `.meas tran`
implements the core of ngspice's grammar with analytic expectations.
"""

import math

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate

RC = """the rc step for measures
v1 in 0 PWL(0 0 1u 1 10m 1)
r1 in out 1k
c1 out 0 1u
.tran 10u 10m
.meas tran vmax max v(out)
.meas tran vavg avg v(out) from=5m to=10m
.meas tran t63 when v(out)=0.632
.meas tran vat find v(out) at=1m
.meas tran d50 trig v(in)=0.5 rise=1 targ v(out)=0.5 rise=1
"""


def test_meas_rc_step():
    r = simulate(RC, dialect="extended")
    m = r.meas
    tau = 1e-3  # R*C
    assert m["vmax"] == pytest.approx(1.0, abs=1e-3)
    assert m["vavg"] == pytest.approx(1.0, abs=2e-3)
    # v(t) = 1 - exp(-t/tau): crosses 0.632 at ~tau
    assert m["t63"] == pytest.approx(tau, rel=0.02)
    assert m["vat"] == pytest.approx(1 - math.exp(-1.0), rel=0.02)
    # 50% input-to-output delay = tau*ln(2)
    assert m["d50"] == pytest.approx(tau * math.log(2), rel=0.02)


def test_meas_sine_stats():
    r = simulate(
        """the sine stats
v1 out 0 SIN(1 2 1k)
r1 out 0 1k
.tran 1u 2m
.meas tran vpp pp v(out)
.meas tran vrms rms v(out) from=0 to=2m
.meas tran varea integ v(out) from=0 to=1m
.meas tran vmin min v(out)
""",
        dialect="extended",
    )
    m = r.meas
    assert m["vpp"] == pytest.approx(4.0, rel=1e-3)
    # rms of offset sine: sqrt(1^2 + 2^2/2)
    assert m["vrms"] == pytest.approx(math.sqrt(1 + 2.0), rel=1e-3)
    # integral over whole cycles: offset * duration
    assert m["varea"] == pytest.approx(1e-3, rel=1e-2)
    assert m["vmin"] == pytest.approx(-1.0, rel=1e-3)


def test_meas_cross_counts():
    r = simulate(
        """the crossing counter
v1 out 0 SIN(0 1 1k)
r1 out 0 1k
.tran 1u 3m
.meas tran t2rise when v(out)=0 rise=2
.meas tran t2cross when v(out)=0 cross=2
.meas tran tfall when v(out)=0 fall=1
""",
        dialect="extended",
    )
    m = r.meas
    assert m["t2rise"] == pytest.approx(2e-3, rel=1e-2)
    # crossings (the t=0 touch is not one): 0.5m fall, 1.0m rise, ...
    assert m["t2cross"] == pytest.approx(1.0e-3, rel=1e-2)
    assert m["tfall"] == pytest.approx(0.5e-3, rel=1e-2)


def test_meas_missing_crossing_is_nan():
    r = simulate(
        "t\nv1 out 0 dc 1\nr1 out 0 1k\n.tran 1u 1m\n"
        ".meas tran tx when v(out)=5\n",
        dialect="extended",
    )
    assert math.isnan(r.meas["tx"])


def test_meas_val_keyword_spelling():
    ckt = parse_netlist(
        "t\nv1 out 0 dc 1\nr1 out 0 1k\n.tran 1u 1m\n"
        ".measure tran tx when v(out) val=0.5 cross=3\n",
        dialect="extended",
    )
    spec = ckt.meas[0]
    assert spec.kind == "when" and spec.val == 0.5
    assert spec.edge == "cross" and spec.k == 3


def test_meas_malformed_raises():
    with pytest.raises(ValueError, match="malformed .meas"):
        parse_netlist("t\n.meas tran x bogus v(1)\n", dialect="extended")
    # .meas ac/dc parse since the round-4 widening
    ckt = parse_netlist("t\n.meas ac x max vdb(1)\n", dialect="extended")
    assert ckt.meas[0].analysis == "ac" and ckt.meas[0].acc == "vdb"


def test_meas_requires_tran():
    with pytest.raises(ValueError, match="requires a .tran"):
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.meas tran x max v(1)\n",
                 dialect="extended")


def test_meas_unknown_node_raises():
    with pytest.raises(ValueError, match="Unknown node"):
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.tran 1u 1m\n"
                 ".meas tran x max v(zz)\n", dialect="extended")


def test_meas_skipped_in_spicey_dialect():
    ckt = parse_netlist("t\nv1 1 0 dc 1\n.meas tran x max v(1)\n")
    assert ckt.meas == []
    assert any(".meas" in s for s in ckt.skipped)


def test_meas_batch_matches_single():
    """Batched measurement distributions agree with per-variant evaluation."""
    from spicey_tpu import meas_batch, simulate_tran_batch
    from spicey_tpu.analysis.meas import evaluate_meas

    text = """the mc rise time
v1 in 0 PWL(0 0 1u 1 10m 1)
r1 in out 1k
c1 out 0 1u
.tran 10u 10m
.meas tran trise trig v(in)=0.5 rise=1 targ v(out)=0.5 rise=1
.meas tran vrms rms v(out) from=1m to=10m
.meas tran tcross when v(out)=0.5 rise=1
.meas tran vmax max v(out)
.meas tran vat find v(out) at=2.5m
"""
    ckt = parse_netlist(text, dialect="extended")
    r_vals = np.array([0.5e3, 1e3, 2e3, 4e3])
    batch = simulate_tran_batch(ckt, {"r1": r_vals})
    dist = meas_batch(ckt, batch)
    assert all(v.shape == (4,) for v in dist.values())
    # tau scales linearly with R: 50% delay = tau*ln2
    np.testing.assert_allclose(dist["trise"], r_vals * 1e-6 * math.log(2),
                               rtol=0.02)
    # cross-check every spec against the scalar path on one variant
    single = simulate(text.replace("r1 in out 1k", "r1 in out 2k"),
                      dialect="extended")
    for spec in ckt.meas:
        np.testing.assert_allclose(dist[spec.name][2],
                                   single.meas[spec.name], rtol=1e-9,
                                   err_msg=spec.name)


def test_meas_batch_nan_for_missing_crossings():
    from spicey_tpu import meas_batch, simulate_tran_batch

    text = """the threshold yield
v1 in 0 PWL(0 0 1u 1 2m 1)
r1 in out 1k
c1 out 0 1u
.tran 10u 2m
.meas tran thit when v(out)=0.8 rise=1
"""
    ckt = parse_netlist(text, dialect="extended")
    # tau = 1 ms and 10 ms: fast lane crosses 0.8 at ~1.6 ms; slow lane never does
    batch = simulate_tran_batch(ckt, {"c1": np.array([1e-6, 1e-5])})
    dist = meas_batch(ckt, batch)
    assert np.isfinite(dist["thit"][0])
    assert math.isnan(dist["thit"][1])


def test_meas_delay_targ_searched_after_trig():
    """targ crossings BEFORE the trig event must be ignored (review
    regression): out crosses 0.5 first, in crosses later."""
    r = simulate(
        """the out-leads-in delay
v1 out 0 PWL(0 0 1m 1 10m 1)
v2 in 0 PWL(0 0 5m 0 6m 1 10m 1)
r1 out 0 1k
r2 in 0 1k
.tran 10u 10m
.meas tran d trig v(in)=0.5 rise=1 targ v(out)=0.5 rise=1
""",
        dialect="extended",
    )
    # in crosses 0.5 at 5.5m; out's only 0.5-crossing (0.5m) precedes it
    assert math.isnan(r.meas["d"])


def test_meas_zero_cross_count_raises():
    with pytest.raises(ValueError, match="must be >= 1"):
        parse_netlist("t\n.meas tran x when v(1)=0.5 cross=0\n",
                      dialect="extended")


def test_meas_window_edges_interpolated():
    """from/to boundaries interpolate instead of snapping to samples
    (review regression): integral of a ramp over a half-open window."""
    r = simulate(
        """the coarse ramp
v1 out 0 PWL(0 0 4m 4)
r1 out 0 1k
.tran 1m 4m
.meas tran a integ v(out) from=0.5m to=1.5m
.meas tran m avg v(out) from=0.5m to=1.5m
""",
        dialect="extended",
    )
    # v(t) = 1000*t: integral over [0.5m, 1.5m] = (0.5+1.5)/2 * 1m = 1e-3
    assert r.meas["a"] == pytest.approx(1e-3, rel=1e-9)
    assert r.meas["m"] == pytest.approx(1.0, rel=1e-9)


def test_meas_delay_simultaneous_crossing_is_zero():
    """A targ event mathematically coincident with the trig must yield a
    ~0 delay, not NaN from interpolation round-off (review follow-up)."""
    r = simulate(
        """the instantaneous amplifier
v1 src 0 PWL(0 0 1m 1 10m 1)
e1 hi 0 src 0 10
rl hi 0 1k
.tran 10u 10m
.meas tran d trig v(src)=0.5 rise=1 targ v(hi)=5 rise=1
""",
        dialect="extended",
    )
    assert abs(r.meas["d"]) < 1e-9


def test_meas_ac_corner_frequency_and_accessors():
    """.meas ac: the RC lowpass -3 dB corner lands at 1/(2*pi*R*C), and
    the vm/vdb/vp/vr/vi accessors read the right phasor components."""
    import numpy as np

    r = simulate(
        """the rc lowpass for ac measures
v1 in 0 ac 1
r1 in out 1k
c1 out 0 159.154943092n
.ac dec 100 10 100k
.meas ac f3db when vdb(out)=-3.0102999566398
.meas ac gmax max vm(out)
.meas ac gmin min v(out)
.meas ac p3db find vp(out) at=1k
.meas ac re1 find vr(out) at=1k
.meas ac im1 find vi(out) at=1k
""",
        dialect="extended",
    )
    # R*C = 1k * 159.1549n -> f_c = 1/(2*pi*R*C) = 1000 Hz
    assert r.meas["f3db"] == pytest.approx(1000.0, rel=2e-3)
    assert r.meas["gmax"] == pytest.approx(1.0, rel=1e-4)  # |H| at 10 Hz
    assert r.meas["gmin"] < 0.02  # two decades above the corner
    assert r.meas["p3db"] == pytest.approx(-45.0, rel=1e-3)
    z = r.meas["re1"] + 1j * r.meas["im1"]
    assert abs(z) == pytest.approx(1 / np.sqrt(2), rel=1e-6)


def test_meas_dc_threshold_crossing():
    """.meas dc: sweep-axis measures — the diode divider crosses 0.6 V at
    the sweep value where (Vin - 0.6)/1k = Is*(e^(0.6/VT)-1)."""
    import numpy as np

    r = simulate(
        """the diode dc measure deck
V1 in 0 dc 0
R1 in a 1k
D1 a 0 DD
.model DD d(is=1e-14)
.dc V1 0 5 0.05
.meas dc von when v(a)=0.6
.meas dc vmax max v(a)
""",
        dialect="extended",
    )
    i_at = 1e-14 * (np.exp(0.6 / 0.02585) - 1.0)
    expected = 0.6 + 1e3 * i_at
    assert r.meas["von"] == pytest.approx(expected, rel=1e-2)
    assert r.meas["vmax"] == pytest.approx(
        float(np.asarray(r.dc.node_voltages["a"]).max()), rel=1e-12)


def test_meas_accessor_gating():
    """vdb() etc. are AC accessors; tran/dc measures reject them, and a
    .meas ac without .ac raises."""
    with pytest.raises(ValueError, match="AC accessor"):
        simulate(
            "the bad accessor deck\nv1 a 0 dc 1\nr1 a 0 1k\n"
            ".tran 1m 10m\n.meas tran x max vdb(a)\n",
            dialect="extended")
    with pytest.raises(ValueError, match="requires a .ac"):
        simulate(
            "the missing ac deck\nv1 a 0 dc 1\nr1 a 0 1k\n"
            ".tran 1m 10m\n.meas ac x max v(a)\n",
            dialect="extended")
