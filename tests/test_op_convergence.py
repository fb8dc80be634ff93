"""DC convergence machinery: pnjlim junction limiting and the
gmin/source-stepping homotopy (extended .op).

The reference has no DC analysis at all; its transient diode handling
clamps junction voltages to an absolute [-1, +0.8] window
(simulateTRAN.ts:89-91), which is kept there for parity but would create
WRONG stationary points in a to-convergence .op (a power diode at ~1000 A
drops ~1.01 V > 0.8). The .op Newton therefore uses SPICE3's pnjlim
(relative logarithmic limiting) plus ngspice-style convergence aids.
"""

import numpy as np
import pytest

from spicey_tpu import simulate
from spicey_tpu.constants import VT_300K


def test_power_diode_stack_exact():
    """100 V through 0.1 ohm and 3 diodes: the true solution has ~1.01 V
    per junction (ABOVE the transient clamp window) at ~970 A. pnjlim
    reaches it; an absolute clamp would converge to ~24.8 V per diode."""
    r = simulate("""x
.model dm d(is=1e-14)
v1 a 0 dc 100
r1 a b 0.1
d1 b c dm
d2 c d dm
d3 d 0 dm
.op
""", dialect="extended")
    i_r = r.op.element_currents["r1"]
    vd = r.op.node_voltages["b"] - r.op.node_voltages["c"]
    # self-consistency: I = (100 - 3 vd)/0.1 and vd = VT ln(I/Is)
    assert i_r == pytest.approx((100 - 3 * vd) / 0.1, rel=1e-9)
    assert vd == pytest.approx(VT_300K * np.log(i_r / 1e-14), rel=1e-6)
    assert 0.9 < vd < 1.1 and 900 < i_r < 1050


def test_small_signal_bias_unchanged():
    """pnjlim must not perturb an ordinary bias point."""
    r = simulate("""x
.model dm d(is=1e-14)
v1 a 0 dc 5
r1 a b 1k
d1 b 0 dm
.op
""", dialect="extended")
    vb = r.op.node_voltages["b"]
    i = (5 - vb) / 1e3
    assert vb == pytest.approx(VT_300K * np.log(i / 1e-14 + 1), rel=1e-9)


def test_gmin_stepping_rescues_oscillating_newton():
    """A stiff tanh behavioral load makes plain Newton cycle between the
    two sides of the knee forever; gmin stepping walks it in. Fixed point:
    (1 - v)/1 = 0.5 tanh(50 (v - 0.5)) + 0.5 v."""
    r = simulate("""x
v1 a 0 dc 1
r1 a b 1
b1 b 0 i=0.5*tanh(50*(v(b)-0.5))+0.5*v(b)
.op
""", dialect="extended")
    v = r.op.node_voltages["b"]
    lhs = (1.0 - v) / 1.0
    rhs = 0.5 * np.tanh(50 * (v - 0.5)) + 0.5 * v
    assert lhs == pytest.approx(rhs, abs=1e-9)


def test_truly_singular_still_raises():
    """The aids must not mask genuinely unsolvable systems: two parallel
    ideal V sources at different values stay singular at every gmin."""
    with pytest.raises(ValueError, match="did not converge|Singular"):
        simulate("x\nv1 a 0 dc 1\nv2 a 0 dc 2\nr1 a 0 1k\n.op\n",
                 dialect="extended")


def test_power_bjt_high_current_bias():
    """20 mA base drive, bf=100: the device saturates against the 5 ohm
    collector load. True vbe ~ 0.97 V exceeds the transient clamp window;
    pnjlim reaches it and the recorded ic satisfies collector KCL."""
    r = simulate("""x
.model qn npn(is=1e-16 bf=100)
vcc p 0 dc 10
rc p c 5
ib 0 b dc 20m
q1 c b 0 qn
.op
""", dialect="extended")
    vb = r.op.node_voltages["b"]
    vc = r.op.node_voltages["c"]
    ic = r.op.element_currents["q1"]
    assert vb == pytest.approx(VT_300K * np.log(20e-3 * 100 / 1e-16),
                               rel=1e-3)
    assert ic == pytest.approx((10 - vc) / 5, rel=1e-9)  # collector KCL
    assert vc < vb  # saturated


def test_bjt_active_region_exact():
    """1 mA base drive with head-room: ic = bf*ib exactly, vbe closed
    form."""
    r = simulate("""x
.model qn npn(is=1e-16 bf=100)
vcc p 0 dc 10
rc p c 5
ib 0 b dc 1m
q1 c b 0 qn
.op
""", dialect="extended")
    assert r.op.element_currents["q1"] == pytest.approx(0.1, rel=1e-9)
    assert r.op.node_voltages["b"] == pytest.approx(
        VT_300K * np.log(1e-3 * 100 / 1e-16), rel=1e-9)
