"""Integration showcase: a complete AC-to-DC power supply.

Transformer (K-coupled inductors), full diode bridge, reservoir capacitor,
load — the classic first real circuit. Exercises coupled-inductor
companions, four interacting diodes, and the transient scan together, with
closed-form checks on turns ratio, rectified level, and ripple.
"""

import numpy as np
import pytest

from spicey_tpu import simulate

SUPPLY = """* 10:1 transformer bridge rectifier supply
.model dr d(is=1e-12)
vin in 0 SIN(0 20 50)
rs in p1 0.5
lp p1 0 10
ls s1 s2 0.1
k1 lp ls 0.999
* bridge: s1/s2 -> out+/0
d1 s1 outp dr
d2 s2 outp dr
d3 0 s1 dr
d4 0 s2 dr
cf outp 0 2000u
rl outp 0 100
.tran 0.2m 100m
"""


def test_bridge_rectifier_supply():
    r = simulate(SUPPLY, dialect="extended")
    t = np.asarray(r.tran.times)
    vo = np.asarray(r.tran.node_voltages["outp"])
    vs = (np.asarray(r.tran.node_voltages["s1"])
          - np.asarray(r.tran.node_voltages["s2"]))
    late = t > 60e-3

    # turns ratio sqrt(Ls/Lp) = 1/10: ~2 V peak on the secondary
    assert np.abs(vs[late]).max() == pytest.approx(2.0, rel=0.15)
    # rectified DC ~ secondary peak minus two diode drops
    vdc = vo[late].mean()
    assert 0.5 < vdc < 1.6
    # DC output: ripple well below the level (2000u on 100 ohm at 100 Hz)
    ripple = vo[late].max() - vo[late].min()
    assert ripple < 0.25 * vdc
    # full-wave: ripple fundamental at 2x the line frequency
    seg = vo[late] - vo[late].mean()
    tt = t[late]
    f = np.fft.rfftfreq(len(seg), d=float(tt[1] - tt[0]))
    mag = np.abs(np.fft.rfft(seg))
    assert f[np.argmax(mag)] == pytest.approx(100.0, abs=15.0)
    # output never reverses
    assert vo[late].min() > 0.0


def test_bridge_rectifier_meas_and_four():
    """The post-analyses read the same supply: .meas statistics and .four
    harmonic content of the ripple (dominated by the 2nd harmonic of the
    50 Hz line — full-wave rectification)."""
    r = simulate(SUPPLY + """.meas tran vavg avg v(outp) from=60m to=100m
.meas tran vpp pp v(outp) from=60m to=100m
.four 50 v(outp)
""", dialect="extended")
    assert 0.5 < r.meas["vavg"] < 1.6
    assert r.meas["vpp"] < 0.25 * r.meas["vavg"]
    probe = r.four.probes["outp"]
    mags = np.asarray(probe.magnitude)
    # harmonic 2 (100 Hz) dominates every other AC component
    assert mags[2] == pytest.approx(np.max(mags[1:]), rel=1e-9)
