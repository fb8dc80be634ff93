"""Extended-dialect J (JFET) elements.

The reference drops J lines into `skipped` (it has no JFETs anywhere —
/root/reference/lib/parsing/parseNetlist.ts:444-446). The extended dialect
adds SPICE level-1 JFETs by LOWERING them onto existing companion
primitives (ir/circuit.py:build_tensors): one square-law channel entry in
the MOSFET arrays (beta_mos = 2*Beta, and vto_mos = polarity*Vto to match
SPICE's reflected-frame PJF convention) plus two gate-junction diode
entries (g-s / g-d). Expectations are closed-form square-law algebra.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.ir.circuit import build_tensors

NJF_CS = """n-channel common source
.model jm njf(vto=-2 beta=1e-4 lambda=0)
vdd p 0 dc 10
rd p d 10k
j1 d g 0 jm
vg g 0 dc 0
"""


# --- parsing ---

def test_parse_jfet_and_model_defaults():
    ckt = parse_netlist(
        "t\nj1 d g s jm\n.model jm njf\nvd d 0 1\nvg g 0 0\nvs s 0 0\n",
        dialect="extended")
    assert len(ckt.J) == 1
    j = ckt.J[0]
    assert (j.name, j.model_name) == ("j1", "jm")
    m = j.model
    assert (m.polarity, m.Vto, m.Beta, m.Lambda, m.Is) == (
        1.0, -2.0, 1e-4, 0.0, 1e-14)


def test_parse_pjf_params():
    ckt = parse_netlist(
        "t\nj1 d g s jm\n.model jm pjf(vto=-1.5 beta=2m lambda=0.01 "
        "is=1e-15)\nvd d 0 1\nvg g 0 0\nvs s 0 0\n",
        dialect="extended")
    m = ckt.J[0].model
    assert m.polarity == -1.0
    assert (m.Vto, m.Beta, m.Lambda, m.Is) == (-1.5, 2e-3, 0.01, 1e-15)


def test_unknown_jfet_model_raises():
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("t\nj1 d g s nope\nvd d 0 1\n", dialect="extended")


def test_default_dialect_skips_j():
    ckt = parse_netlist("t\nj1 d g s jm\nr1 d 0 1k\n")
    assert not hasattr(ckt, "J") or len(ckt.J) == 0
    assert any(line.startswith("j1") for line in ckt.skipped)


def test_jfet_lowering_shapes():
    """J lowers to one MOS-array row (2x beta) + two gate-diode rows."""
    t = build_tensors(parse_netlist(NJF_CS + ".op\n", dialect="extended"))
    assert t.n_m == 1 and t.m_names == ("j1",)
    np.testing.assert_allclose(t.m_beta, [2e-4])
    np.testing.assert_allclose(t.m_beta_scale, [2.0])
    np.testing.assert_allclose(t.m_vto, [-2.0])
    assert t.n_d == 2 and t.d_names == ("j1#gs", "j1#gd")
    np.testing.assert_allclose(t.d_is, [1e-14, 1e-14])


# --- .op ---

def test_njf_saturation_op():
    """vgs=0, saturation: Id = Beta*Vto^2 = 0.4 mA -> v(d) = 10 - 4 = 6."""
    res = simulate(NJF_CS + ".op\n", dialect="extended")
    assert res.op.node_voltages["d"] == pytest.approx(6.0, abs=1e-6)
    assert res.op.element_currents["j1"] == pytest.approx(4e-4, rel=1e-6)


def test_pjf_saturation_op():
    """Mirror circuit: p-channel, v(d) = -10 + 4 = -6."""
    res = simulate(
        """p-channel common source
.model jm pjf(vto=-2 beta=1e-4 lambda=0)
vss p 0 dc -10
rd p d 10k
j1 d 0 0 jm
.op
""",
        dialect="extended")
    assert res.op.node_voltages["d"] == pytest.approx(-6.0, abs=1e-6)


def test_njf_triode_op():
    """Forced vds=0.5 < vov=2: Id = Beta*(2*vov - vds)*vds = 0.175 mA."""
    res = simulate(
        """triode bias
.model jm njf(vto=-2 beta=1e-4 lambda=0)
vds d 0 dc 0.5
j1 d 0 0 jm
.op
""",
        dialect="extended")
    # source delivering Id reports -Id into its + terminal
    assert res.op.element_currents["vds"] == pytest.approx(
        -1e-4 * (2 * 2 - 0.5) * 0.5, rel=1e-6)


def test_njf_cutoff_op():
    """vgs = -3 < Vto: channel off, v(d) pulled to the 10 V rail."""
    net = NJF_CS.replace("vg g 0 dc 0", "vg g 0 dc -3")
    res = simulate(net + ".op\n", dialect="extended")
    assert res.op.node_voltages["d"] == pytest.approx(10.0, abs=1e-6)


def test_gate_junction_clamps_forward_gate_drive():
    """+5 V gate drive through 10k: the g-s junction clamps vgs to ~one
    diode drop and conducts the rest — the lowered gate diodes are live."""
    res = simulate(
        """the gate clamp
.model jm njf(vto=-2 beta=1e-4 lambda=0 is=1e-14)
vg gd 0 dc 5
rg gd g 10k
j1 0 g 0 jm
.op
""",
        dialect="extended")
    vg = res.op.node_voltages["g"]
    assert 0.4 < vg < 1.0
    i_rg = (5.0 - vg) / 10e3
    i_gates = (res.op.element_currents["j1#gs"]
               + res.op.element_currents["j1#gd"])
    assert i_gates == pytest.approx(i_rg, rel=1e-6)


def test_dc_sweep_square_law():
    """.dc sweep of vg from -2 to 0: Id(vgs) = Beta*(vgs - Vto)^2."""
    res = simulate(NJF_CS + ".dc vg -2 0 0.25\n", dialect="extended")
    vgs = res.dc.sweep
    vd = res.dc.node_voltages["d"]
    expect = 10.0 - 10e3 * 1e-4 * (vgs + 2.0) ** 2
    np.testing.assert_allclose(vd, expect, atol=2e-5)


# --- transient ---

def test_jfet_switching_tran():
    """PULSE gate drive -3 V (cutoff) -> 0 V (on): v(d) swings 10 -> 6."""
    net = NJF_CS.replace(
        "vg g 0 dc 0",
        "vg g 0 PULSE(-3 0 5u 1n 1n 10u 30u)") + ".tran 0.5u 14u\n"
    res = simulate(net, dialect="extended")
    t = np.asarray(res.tran.times)
    vd = np.asarray(res.tran.node_voltages["d"])
    assert vd[t < 4e-6].max() == pytest.approx(10.0, abs=1e-6)
    assert vd[t > 8e-6].min() == pytest.approx(6.0, abs=1e-3)


# --- small-signal AC ---

def test_small_signal_ac_jfet_gain():
    """linearize="op": common-source gain = -gm*Rd with
    gm = 2*Beta*(vgs - Vto) = 4e-4 S -> gain = -4 exactly (lambda=0)."""
    from spicey_tpu.analysis.ac import simulate_ac

    ckt = parse_netlist(
        NJF_CS.replace("vg g 0 dc 0", "vg g 0 dc 0 ac 1")
        + ".ac lin 3 10 1000\n",
        dialect="extended")
    ac = simulate_ac(ckt, linearize="op")
    np.testing.assert_allclose(np.real(ac.node_voltages["d"]), -4.0,
                               rtol=1e-6)
    # reference-parity AC leaves the device unstamped -> d floats at 0
    ac0 = simulate_ac(ckt)
    np.testing.assert_allclose(ac0.node_voltages["d"], 0.0, atol=1e-12)


# --- noise ---

def test_jfet_channel_noise():
    """Saturation channel noise (8/3)kT*gm dominates the 10k drain load."""
    from spicey_tpu.constants import K_BOLTZMANN, T_NOISE

    res = simulate(
        NJF_CS.replace("vg g 0 dc 0", "vg g 0 dc 0 ac 1")
        + ".noise v(d) vg lin 3 100 1000\n",
        dialect="extended")
    n = res.noise
    gm = 4e-4
    expect_j1 = (8.0 / 3.0) * K_BOLTZMANN * T_NOISE * gm * (10e3) ** 2
    np.testing.assert_allclose(n.contributions["j1"], expect_j1, rtol=1e-4)
    assert float(np.max(n.contributions["j1"]
                        / n.contributions["rd"])) > 1.0


# --- batch / Monte-Carlo ---

def test_jfet_batch_beta_sweep():
    """Overriding a J name sweeps its MODEL Beta (the 2x lowering scale is
    undone for user values): v(d) = 10 - Rd*Beta*Vto^2 per variant."""
    from spicey_tpu import simulate_tran_batch

    B = 6
    beta = 1e-4 * (1 + 0.5 * np.arange(B) / B)
    ckt = parse_netlist(NJF_CS + ".tran 1u 5u\n", dialect="extended")
    res = simulate_tran_batch(ckt, {"j1": beta})
    expect = 10.0 - 10e3 * beta * 4.0
    np.testing.assert_allclose(res.node_voltage("d")[:, -1], expect,
                               rtol=1e-6)


def test_jfet_in_subcircuit():
    """J elements flatten through .subckt with node/model scoping intact."""
    res = simulate(
        """the hierarchy
.subckt csamp in out vdd
rd vdd out 10k
j1 out in 0 jm
.model jm njf(vto=-2 beta=1e-4 lambda=0)
.ends
vdd p 0 dc 10
vg g 0 dc 0
x1 g d p csamp
.op
""",
        dialect="extended")
    assert res.op.node_voltages["d"] == pytest.approx(6.0, abs=1e-6)


def test_gate_caps_lowered_to_c_entries():
    """MOSFET CGSO/CGDO (per width) and JFET CGS/CGD (absolute) lower onto
    linear C entries named <dev>#cgs / <dev>#cgd."""
    t = build_tensors(parse_netlist(
        "x\n.model mn nmos(vto=1 kp=2m cgso=10u cgdo=2u)\n"
        "vdd d 0 5\nvg g 0 2\nm1 d g 0 mn w=200u l=100u\n",
        dialect="extended"))
    assert t.c_names == ("m1#cgs", "m1#cgd")
    np.testing.assert_allclose(t.c_vals, [10e-6 * 200e-6, 2e-6 * 200e-6])
    t2 = build_tensors(parse_netlist(
        "x\n.model jm njf(cgs=1p cgd=0.5p)\nvd d 0 1\nj1 d g 0 jm\n"
        "vg g 0 0\n", dialect="extended"))
    assert t2.c_names == ("j1#cgs", "j1#cgd")
    np.testing.assert_allclose(t2.c_vals, [1e-12, 0.5e-12])


def test_ring_oscillates_on_intrinsic_gate_caps():
    """3-stage CMOS ring with NO explicit load caps: the CGSO/CGDO-lowered
    gate capacitance alone sets the period."""
    res = simulate("""a ring on gate caps
.model mn nmos(vto=1 kp=2m cgso=10u cgdo=2u)
.model mp pmos(vto=-1 kp=2m cgso=10u cgdo=2u)
vdd vdd 0 5
mn1 n1 n3 0 mn
mp1 n1 n3 vdd mp
mn2 n2 n1 0 mn
mp2 n2 n1 vdd mp
mn3 n3 n2 0 mn
mp3 n3 n2 vdd mp
ikick 0 n1 PULSE(0 2m 0 1n 1n 3u 1)
.tran 0.2u 60u
""", dialect="extended")
    v1 = np.asarray(res.tran.node_voltages["n1"])
    assert v1.min() < 1.0 and v1.max() > 4.0


def test_mesfet_z_element_lowers_to_jfet():
    """Z MESFETs (nmf/pmf) share the square law: same bias point as the
    equivalent njf."""
    res = simulate("""x
.model zm nmf(vto=-2 beta=1e-4 lambda=0)
vdd p 0 dc 10
rd p d 10k
z1 d 0 0 zm
.op
""", dialect="extended")
    assert res.op.node_voltages["d"] == pytest.approx(6.0, abs=1e-6)
    assert res.op.element_currents["z1"] == pytest.approx(4e-4, rel=1e-6)
