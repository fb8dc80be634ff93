"""Extended-dialect diode charge storage (TT transit time, CJO/VJ/M/FC
junction capacitance).

The reference diode is memoryless (simulateTRAN.ts:72-101 has no charge
terms); all-zero TT/CJO defaults preserve that exactly. With charge, the
transient scan carries q_prev per diode and stamps the BE companion
C(v)/dt; op-linearized AC/noise/.pz stamp C(v_op) as extra capacitor rows.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.ir.circuit import build_tensors
from spicey_tpu.models.devices import diode_charge_cap


def test_defaults_are_memoryless():
    t = build_tensors(parse_netlist(
        "x\n.model dm d\nv1 a 0 1\nd1 a 0 dm\n", dialect="extended"))
    assert not t.has_d_charge
    t2 = build_tensors(parse_netlist(
        "x\n.model dm d(tt=10n)\nv1 a 0 1\nd1 a 0 dm\n",
        dialect="extended"))
    assert t2.has_d_charge


def test_charge_model_continuity_at_breakpoint():
    """q and C are continuous at v = FC*VJ (SPICE's linearized extension)."""
    cjo, vj, m, fc = 10e-12, 0.8, 0.5, 0.5
    eps = 1e-9
    for v in (fc * vj - eps, fc * vj + eps):
        q, c = diode_charge_cap(np.float64(v), 0.0, 0.0, 0.0,
                                cjo, vj, m, fc)
        if v < fc * vj:
            q_b, c_b = float(q), float(c)
        else:
            assert float(q) == pytest.approx(q_b, rel=1e-7)
            assert float(c) == pytest.approx(c_b, rel=1e-6)
    # closed form below the breakpoint
    v = -3.0
    q, c = diode_charge_cap(np.float64(v), 0.0, 0.0, 0.0, cjo, vj, m, fc)
    assert float(c) == pytest.approx(cjo * (1 - v / vj) ** (-m), rel=1e-12)


def test_varactor_smallsignal_pole():
    """Reverse-biased junction as a varactor: the R-C(v) lowpass pole in
    linearize="op" AC sits at 1/(2 pi R C(-VR)) with
    C = CJO*(1+VR/VJ)^-M."""
    CJ0, VJ, M, VR, R = 10e-12, 0.8, 0.5, 5.0, 10e3
    r = simulate(f"""x
.model dv d(is=1e-14 cjo={CJ0} vj={VJ} m={M})
vb b 0 dc -{VR} ac 1
r1 b a {R}
d1 a 0 dv
.ac dec 80 100k 100meg
""", dialect="extended", ac_linearize="op")
    h = np.abs(np.asarray(r.ac.node_voltages["a"]))
    f = np.asarray(r.ac.freqs)
    fc = 1 / (2 * np.pi * R * CJ0 * (1 + VR / VJ) ** (-M))
    # interpolate the -3 dB crossing
    k = np.argmax(h < 1 / np.sqrt(2))
    f3 = np.interp(1 / np.sqrt(2), [h[k], h[k - 1]], [f[k], f[k - 1]])
    assert f3 == pytest.approx(fc, rel=0.02)


def test_reverse_recovery_with_tt():
    """Transit-time charge: switching a conducting diode to reverse drive
    pulls a large negative recovery current before settling to -Is —
    impossible with the memoryless reference model."""
    r = simulate("""x
.model dr d(is=1e-14 tt=100n)
vs in 0 PWL(0 2 1u 2 1.01u -2)
rs in a 100
dr1 a 0 dr
.tran 10n 3u
""", dialect="extended")
    t = np.asarray(r.tran.times)
    i_d = np.asarray(r.tran.element_currents["dr1"])
    fwd = i_d[(t > 0.5e-6) & (t < 0.9e-6)].mean()
    assert fwd == pytest.approx(0.0128, rel=0.05)
    # recovery: more negative than any resistive-only response could be
    assert i_d[(t > 1.0e-6) & (t < 1.5e-6)].min() < -0.015
    # and the memoryless model shows NO recovery
    r0 = simulate(r"""x
.model dr d(is=1e-14)
vs in 0 PWL(0 2 1u 2 1.01u -2)
rs in a 100
dr1 a 0 dr
.tran 10n 3u
""", dialect="extended")
    i_0 = np.asarray(r0.tran.element_currents["dr1"])
    assert i_0.min() > -1e-10
    # both settle to the leakage floor
    assert i_d[t > 2.8e-6].mean() == pytest.approx(-1e-14, rel=1e-3)


def test_junction_cap_slows_switching():
    """A big CJO across the diode slows the RC charging of its node."""
    base = """x
.model dc1 d(is=1e-14{extra})
v1 in 0 PULSE(0 0.4 0 1n 1n 5u 20u)
r1 in a 10k
dc1 a 0 dc1
.tran 10n 4u
"""
    fast = simulate(base.format(extra=""), dialect="extended")
    slow = simulate(base.format(extra=" cjo=100p"), dialect="extended")
    t = np.asarray(fast.tran.times)
    k = np.argmin(np.abs(t - 0.5e-6))
    va_f = np.asarray(fast.tran.node_voltages["a"])[k]
    va_s = np.asarray(slow.tran.node_voltages["a"])[k]
    # 0.4 V drive keeps the diode essentially off (a ~50 nA trickle drops
    # ~0.5 mV across the 10k); RC = 10k * ~100p = 1 us
    assert va_f == pytest.approx(0.4, rel=5e-3)   # instantaneous w/o charge
    assert va_s < 0.35                            # still charging


def test_pz_sees_junction_cap():
    """.pz's C pencil includes C(v_op): the varactor pole shows up."""
    CJ0, VJ, M, VR, R = 10e-12, 0.8, 0.5, 5.0, 10e3
    r = simulate(f"""x
.model dv d(is=1e-14 cjo={CJ0} vj={VJ} m={M})
vb b 0 dc -{VR} ac 1
r1 b a {R}
d1 a 0 dv
.pz b 0 a 0 vol pol
""", dialect="extended")
    w_expect = -1 / (R * CJ0 * (1 + VR / VJ) ** (-M))
    # the diode's small-signal gd adds a tiny parallel conductance; the
    # pole is dominated by 1/(R C)
    assert r.pz.poles.real.min() == pytest.approx(w_expect, rel=0.01)


def test_batch_sweep_with_charge():
    """The charge companion runs inside the batched scan (lane axis)."""
    from spicey_tpu import simulate_tran_batch

    B = 4
    ckt = parse_netlist("""x
.model dr d(is=1e-14 tt=50n)
vs in 0 PWL(0 2 1u 2 1.01u -2)
rs in a {r}
dr1 a 0 dr
.tran 10n 2u
""".replace("{r}", "100"), dialect="extended")
    res = simulate_tran_batch(ckt, {"rs": 100.0 * (1 + 0.2 * np.arange(B))})
    assert res.valid.all()
    va = res.node_voltage("a")
    t = res.times
    # forward drop roughly one diode drop in every lane
    mask = (t > 0.5e-6) & (t < 0.9e-6)
    assert np.all(va[:, mask] > 0.5) and np.all(va[:, mask] < 0.9)


# --- BJT junction charge (TF/TR/CJE/CJC) ---

def test_bjt_charge_defaults_memoryless():
    t = build_tensors(parse_netlist(
        "x\n.model qn npn\nvc c 0 1\nib 0 b 1u\nq1 c b 0 qn\n",
        dialect="extended"))
    assert not t.has_q_charge
    t2 = build_tensors(parse_netlist(
        "x\n.model qn npn(cjc=1p)\nvc c 0 1\nib 0 b 1u\nq1 c b 0 qn\n",
        dialect="extended"))
    assert t2.has_q_charge


def test_bjt_miller_bandwidth():
    """CE stage: without junction caps the op-linearized gain is flat to
    1 GHz; cjc+tf give a finite Miller-limited bandwidth."""
    net = """x
.model qn npn(is=1e-16 bf=100{extra})
vcc p 0 dc 10
rc p c 10k
ib 0 b dc 2u ac 1u
q1 c b 0 qn
.ac dec 20 1k 1g
"""
    r0 = simulate(net.format(extra=""), dialect="extended",
                  ac_linearize="op")
    r1 = simulate(net.format(extra=" cjc=2p tf=1n"), dialect="extended",
                  ac_linearize="op")
    h0 = np.abs(np.asarray(r0.ac.node_voltages["c"]))
    h1 = np.abs(np.asarray(r1.ac.node_voltages["c"]))
    assert h0[-1] == pytest.approx(h0[0], rel=1e-6)      # flat w/o caps
    assert h1[-1] < 0.01 * h1[0]                         # rolls off
    assert h1[0] == pytest.approx(h0[0], rel=1e-3)       # same low-f gain


def test_bjt_charge_slows_switching():
    """Inverter edge: junction charge slows the collector transition."""
    net = """x
.model qn npn(is=1e-16 bf=100{extra})
vcc p 0 dc 5
rc p c 10k
vb bb 0 PULSE(0 0.8 0.1u 1n 1n 1u 3u)
rb bb b 10k
q1 c b 0 qn
.tran 2n 0.6u
"""
    t0 = simulate(net.format(extra=""), dialect="extended")
    t1 = simulate(net.format(extra=" cjc=5p cje=5p tf=5n"),
                  dialect="extended")
    t = np.asarray(t0.tran.times)
    k = np.argmin(np.abs(t - 0.12e-6))
    vc0 = np.asarray(t0.tran.node_voltages["c"])[k]
    vc1 = np.asarray(t1.tran.node_voltages["c"])[k]
    assert vc1 > vc0 + 0.5   # with charge the fall is visibly slower
    # the charged stage keeps falling monotonically TOWARD the memoryless
    # settled level (the Miller time constant outlives this window)
    vc0_end = np.asarray(t0.tran.node_voltages["c"])[-1]
    vc1_end = np.asarray(t1.tran.node_voltages["c"])[-1]
    assert vc0_end < vc1_end < vc1
    assert vc0_end == pytest.approx(vc0, abs=0.05)  # memoryless settles fast


# --- ohmic series resistances (RS / RB / RC / RE), lowered to resistors ---

def test_diode_rs_series_drop():
    """v(anode) = v_junction + I*RS, to machine precision (the junction is
    rewired behind a real <name>#rs resistor)."""
    from spicey_tpu.constants import VT_300K

    r = simulate("""x
.model dm d(is=1e-14 rs=2)
v1 a 0 dc 5
r1 a b 10
d1 b 0 dm
.op
""", dialect="extended")
    vb = r.op.node_voltages["b"]
    i = r.op.element_currents["d1"]
    vj = VT_300K * np.log(i / 1e-14 + 1)
    assert vb == pytest.approx(vj + i * 2.0, rel=1e-12)
    # KCL through the lowered resistor
    assert r.op.element_currents["d1#rs"] == pytest.approx(i, rel=1e-12)


def test_bjt_ohmic_resistances():
    """RB/RC/RE lower to <name>#rb/rc/re resistors; active-region ic is
    unchanged (ohmic drops only shift node voltages)."""
    net = """x
.model qn npn(is=1e-16 bf=100{extra})
vcc p 0 dc 10
rc p c 1k
ib 0 b dc 10u
q1 c b 0 qn
.op
"""
    r0 = simulate(net.format(extra=""), dialect="extended")
    r1 = simulate(net.format(extra=" rb=1k rc=10 re=1"),
                  dialect="extended")
    # active region (ic = 1 mA, vc = 9 V): ic = bf*ib regardless of the
    # ohmic parasitics
    assert r1.op.element_currents["q1"] == pytest.approx(
        r0.op.element_currents["q1"], rel=1e-6)
    # base node rises by ib*rb + (ib+ic)*re relative to the bare device
    dv = r1.op.node_voltages["b"] - r0.op.node_voltages["b"]
    assert dv == pytest.approx(10e-6 * 1e3 + 1.01e-3 * 1.0, rel=0.02)


def test_rs_ignored_in_spicey_dialect():
    """The reference d-model parse reads only is/n — rs stays inert."""
    from spicey_tpu import parse_netlist

    ckt = parse_netlist("t\n.model dm d(is=1e-14 rs=2)\nv1 a 0 5\n"
                        "d1 a 0 dm\n")
    assert not any(r.name.endswith("#rs") for r in ckt.R)


def test_mosfet_rd_ohmic():
    """MOSFET RD lowers to a <name>#rd resistor: triode-region current
    drops by the extra series resistance."""
    net = """x
.model mn nmos(vto=1 kp=10m{extra})
vdd d 0 dc 0.2
vg g 0 dc 5
m1 d g 0 mn
.op
"""
    r0 = simulate(net.format(extra=""), dialect="extended")
    r1 = simulate(net.format(extra=" rd=50"), dialect="extended")
    i0 = -r0.op.element_currents["vdd"]
    i1 = -r1.op.element_currents["vdd"]
    assert i1 < 0.8 * i0  # deep triode: ~ ron || (ron + 50) effect
    assert "m1#rd" in r1.op.element_currents
