"""MOSFET (level-1) and BJT (Ebers-Moll) device tests — the extended-dialect
stretch families (BASELINE.json configs: CMOS ring oscillator / BJT
amplifier). Reference parity: M and Q lines land in `skipped` under the
default dialect (parseNetlist.ts:444-446)."""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate_tran
from spicey_tpu.analysis.batch import simulate_tran_batch
from spicey_tpu.analysis.op import simulate_op

NMOS_CS = """t
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vg gt 0 2
rd vdd d 1k
m1 d gt 0 mn
"""

BJT_CE = """t
.model qn npn(is=1e-16 bf=100)
vcc vcc 0 5
ib 0 bs 10u
rc vcc c 1k
q1 c bs 0 qn
"""

INVERTER = """t
.model mn nmos(vto=1 kp=2m)
.model mp pmos(vto=-1 kp=2m)
vdd vdd 0 5
vin in 0 PWL(0 0 1m 5)
mn1 out in 0 mn
mp1 out in vdd mp
cl out 0 1p
.tran 10u 1m
"""

RING = """t
.model mn nmos(vto=1 kp=2m)
.model mp pmos(vto=-1 kp=2m)
vdd vdd 0 5
mn1 n1 n3 0 mn
mp1 n1 n3 vdd mp
c1 n1 0 1n
mn2 n2 n1 0 mn
mp2 n2 n1 vdd mp
c2 n2 0 1n
mn3 n3 n2 0 mn
mp3 n3 n2 vdd mp
c3 n3 0 1n
ikick 0 n1 PULSE(0 2m 0 1n 1n 3u 1)
.tran 0.05u 60u
"""


def test_default_dialect_skips_m_q():
    ckt = parse_netlist(NMOS_CS + ".tran 1u 5u\n")
    assert not ckt.M and not ckt.mos_models
    assert any(s.startswith("m1") for s in ckt.skipped)
    ckt = parse_netlist(BJT_CE + ".tran 1u 5u\n")
    assert not ckt.Q and not ckt.bjt_models


def test_unknown_device_model_raises():
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("t\nm1 d gt 0 nomodel\n", dialect="extended")
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("t\nq1 c b 0 nomodel\n", dialect="extended")


def test_nmos_saturation_analytic():
    """Common source in saturation: id = Kp/2*(Vgs-Vto)^2 = 1 mA with
    Kp=2m, Vgs=2, Vto=1 -> v(d) = 5 - 1k*1m = 4 V exactly (lambda=0)."""
    op = simulate_op(parse_netlist(NMOS_CS + ".op\n", dialect="extended"))
    assert op.node_voltages["d"] == pytest.approx(4.0, abs=1e-9)
    assert op.element_currents["m1"] == pytest.approx(1e-3, rel=1e-9)
    tran = simulate_tran(
        parse_netlist(NMOS_CS + ".tran 1u 10u\n", dialect="extended"))
    np.testing.assert_allclose(tran.node_voltages["d"], 4.0, atol=1e-9)
    np.testing.assert_allclose(tran.element_currents["m1"], 1e-3, rtol=1e-9)


def test_nmos_triode_analytic():
    """Vgs=5, Rd huge -> device in deep triode; solve the quadratic
    id = beta*((vgs-vto)*vds - vds^2/2) = (5-vds)/Rd."""
    net = """t
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vg gt 0 5
rd vdd d 10k
m1 d gt 0 mn
.op
"""
    op = simulate_op(parse_netlist(net, dialect="extended"))
    vd = op.node_voltages["d"]
    beta, vov, rd = 2e-3, 4.0, 1e4
    assert vd < vov  # triode region
    np.testing.assert_allclose(
        beta * (vov * vd - vd * vd / 2), (5.0 - vd) / rd, rtol=1e-9
    )


def test_pmos_source_follower_region():
    """PMOS mirror of the NMOS saturation test: Vto=-1, gate at 3 below
    a 5 V source rail -> |id| = 1 mA pulled from the output node."""
    net = """t
.model mp pmos(vto=-1 kp=2m)
vdd vdd 0 5
vg gt 0 3
rd d 0 1k
m1 d gt vdd mp
.op
"""
    op = simulate_op(parse_netlist(net, dialect="extended"))
    # vgs = 3-5 = -2, vov' = 2-1 = 1, id' = 1 mA into the 1k -> v(d) = 1
    assert op.node_voltages["d"] == pytest.approx(1.0, abs=1e-9)


def test_bjt_current_gain_analytic():
    """10 uA base drive, Bf=100 -> ic ~ 1 mA -> v(c) ~ 4 V; vbe from the
    Shockley relation vt*ln(ib*bf/is)."""
    op = simulate_op(parse_netlist(BJT_CE + ".op\n", dialect="extended"))
    assert op.node_voltages["c"] == pytest.approx(4.0, rel=1e-5)
    vbe_expect = 0.02585 * np.log(10e-6 * 100 / 1e-16)
    assert op.node_voltages["bs"] == pytest.approx(vbe_expect, rel=1e-3)
    assert op.element_currents["q1"] == pytest.approx(1e-3, rel=1e-5)
    tran = simulate_tran(
        parse_netlist(BJT_CE + ".tran 1u 10u\n", dialect="extended"))
    np.testing.assert_allclose(tran.node_voltages["c"], 4.0, rtol=1e-5)


def test_pnp_mirror():
    net = """t
.model qp pnp(is=1e-16 bf=100)
vee vee 0 -5
ib bs 0 10u
rc c vee 1k
q1 c bs 0 qp
.op
"""
    op = simulate_op(parse_netlist(net, dialect="extended"))
    # mirror of the NPN case: ic = -1 mA into rc from -5 rail -> v(c) = -4
    assert op.node_voltages["c"] == pytest.approx(-4.0, rel=1e-5)


def test_cmos_inverter_transfer():
    tran = simulate_tran(parse_netlist(INVERTER, dialect="extended"))
    v = tran.node_voltages["out"]
    assert v[0] == pytest.approx(5.0, abs=1e-3)   # vin=0 -> rail high
    assert v[-1] == pytest.approx(0.0, abs=1e-3)  # vin=5 -> rail low
    # monotone falling transfer after the initial cap charge-up step
    assert np.all(np.diff(v)[1:] < 1e-6)


def test_cmos_ring_oscillator():
    """3-stage CMOS ring with a startup kick must oscillate rail-to-rail
    with a stable period (the BASELINE.json stretch config)."""
    tran = simulate_tran(parse_netlist(RING, dialect="extended"))
    v1 = np.asarray(tran.node_voltages["n1"])
    t = np.asarray(tran.times)
    assert v1.min() < 1.0 and v1.max() > 4.0  # rail-to-rail swing
    cross_t = t[1:][np.diff(np.sign(v1 - 2.5)) != 0]
    assert len(cross_t) > 20  # sustained oscillation
    half_periods = np.diff(cross_t[-8:])
    assert np.std(half_periods) / np.mean(half_periods) < 0.1  # steady


def test_mosfet_batch_beta_sweep():
    """Batch-sweeping an M element name sweeps its beta: in saturation
    v(d) = 5 - Rd*beta/2*(Vgs-Vto)^2 per variant."""
    B = 8
    beta = 2e-3 * (1 + 0.3 * np.arange(B) / B)
    ckt = parse_netlist(NMOS_CS + ".tran 1u 5u\n", dialect="extended")
    res = simulate_tran_batch(ckt, {"m1": beta})
    expect = 5.0 - 1e3 * beta / 2 * 1.0
    np.testing.assert_allclose(res.node_voltage("d")[:, -1], expect,
                               rtol=1e-9)


def test_ring_mc_stats():
    """Monte-Carlo over the ring's load caps through the fused stats path."""
    from spicey_tpu.analysis.mc import mc_tran_stats

    B = 4
    rng = np.random.default_rng(2)
    ov = {"c1": 1e-9 * (1 + 0.05 * rng.standard_normal(B))}
    st = mc_tran_stats(RING, ov, "n1", dialect="extended")
    assert st.n_valid == B
    # every lane oscillates: the late-time min/max envelope spans the rails
    assert float(st.max[-200:].max()) > 4.0
    assert float(st.min[-200:].min()) < 1.0


def test_small_signal_ac_mosfet_gain():
    """linearize="op": common-source gain = -gm*Rd = -2 exactly
    (lambda=0); the default (reference-parity) AC leaves the device open."""
    from spicey_tpu.analysis.ac import simulate_ac

    net = """t
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vg gt 0 dc 2 ac 1
rd vdd d 1k
m1 d gt 0 mn
.ac lin 3 10 1000
"""
    ckt = parse_netlist(net, dialect="extended")
    ac = simulate_ac(ckt, linearize="op")
    np.testing.assert_allclose(np.real(ac.node_voltages["d"]), -2.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.imag(ac.node_voltages["d"]), 0.0,
                               atol=1e-12)
    ac0 = simulate_ac(ckt)
    np.testing.assert_allclose(ac0.node_voltages["d"], 0.0, atol=1e-15)


def test_small_signal_ac_bjt_gain():
    """1 uA AC base drive through the current gain: |v(c)| = Bf*Rc*1u."""
    from spicey_tpu.analysis.ac import simulate_ac

    net = """t
.model qn npn(is=1e-16 bf=100)
vcc vcc 0 5
ib 0 bs dc 10u ac 1u
rc vcc c 1k
q1 c bs 0 qn
.ac lin 3 10 1000
"""
    ac = simulate_ac(parse_netlist(net, dialect="extended"), linearize="op")
    np.testing.assert_allclose(np.real(ac.node_voltages["c"]), -0.1,
                               rtol=1e-4)


def test_small_signal_ac_diode():
    """A diode biased at Id has small-signal conductance gd = Id'/(N*Vt);
    check the divider against the host-computed gd."""
    from spicey_tpu.analysis.ac import simulate_ac
    from spicey_tpu.analysis.op import simulate_op
    from spicey_tpu.constants import VT_300K

    net = """t
.model dm d(is=1e-14)
v1 a 0 dc 5 ac 1
r1 a k 10k
d1 k 0 dm
.ac lin 2 10 100
"""
    ckt = parse_netlist(net, dialect="extended")
    op = simulate_op(ckt)
    vd0 = op.node_voltages["k"]
    gd = 1e-14 / VT_300K * np.exp(vd0 / VT_300K)
    expect = (1.0 / 1e4) / (1.0 / 1e4 + gd)  # divider ac gain
    ac = simulate_ac(ckt, linearize="op")
    np.testing.assert_allclose(np.real(ac.node_voltages["k"]), expect,
                               rtol=1e-9)
