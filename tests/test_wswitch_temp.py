"""W current-controlled switch and .temp tests (extended dialect).

W switches fold into the S-switch arrays at IR level: the control pair is
[ctrl_V_branch, dump], so vctrl = x[branch] IS the controlling current and
every engine (tran scan, .op, small-signal) drives both switch families
through one code path (ir/circuit.py build_tensors).

.temp folds into the IR as d_n_eff = N*(T/300) (so v_th = d_n*VT_300K is
temperature-correct everywhere), nl["vt"]/tensors.vt for BJTs, and a
T/300-scaled diode clamp window.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.constants import VT_300K

CSW_NET = """* current switch
.model cs csw(ron=1 roff=1e9 it=0.5m ih=0.1m)
i1 0 a PULSE(0 1m 0 1m 1m 1m 10m)
vsense a b 0
rload b 0 1k
v2 c 0 5
w1 c out vsense cs
rout out 0 1k
.tran 50u 3m
.end
"""


def test_w_switch_hysteresis_timing():
    """Ramp 0->1mA over 1ms: closes when i > it+ih = 0.6mA (t~0.6ms),
    stays closed through the plateau, opens when i < it-ih = 0.4mA on the
    1ms down-ramp (t~2.6ms)."""
    r = simulate(CSW_NET, dialect="extended")
    t = np.asarray(r.tran.times)
    on = np.asarray(r.tran.node_voltages["out"]) > 2.0
    t_on = t[np.argmax(on)]
    t_off = t[len(on) - 1 - np.argmax(on[::-1])]
    assert 0.55e-3 < t_on < 0.70e-3, t_on
    assert 2.55e-3 < t_off < 2.70e-3, t_off
    # current through the switch is recorded under its name
    assert "w1" in r.tran.element_currents


def test_w_switch_model_defaults():
    ckt = parse_netlist("* t\n.model cs csw\nv1 a 0 1\nvs b 0 0\n"
                        "w1 a c vs cs\nrc c 0 1k\n.end\n",
                        dialect="extended")
    m = ckt.cswitch_models["cs"]
    assert (m.Ron, m.Roff, m.It, m.Ih) == (1.0, 1e12, 0.0, 0.0)
    t = __import__("spicey_tpu").build_tensors(ckt)
    # encoded as an S row with control = [branch of vs, dump]
    assert t.s_names == ("w1",)
    assert t.s_idx[0, 2] == ckt.V[1].index
    assert t.s_idx[0, 3] == t.nvar


def test_w_switch_errors():
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("* t\nv1 a 0 1\nvs b 0 0\nw1 a c vs nomodel\n.end\n",
                      dialect="extended")
    with pytest.raises(ValueError, match="Unknown controlling source"):
        parse_netlist("* t\n.model cs csw\nv1 a 0 1\nw1 a c vmissing cs\n"
                      ".end\n", dialect="extended")


def test_w_switch_op_state():
    """DC operating point reports the W switch state by name."""
    net = """* w op
.model cs csw(it=0.5m)
i1 0 a dc 1m
vsense a 0 0
v2 c 0 5
w1 c out vsense cs
rout out 0 1k
.op
.end
"""
    r = simulate(net, dialect="extended")
    assert r.op.switch_states["w1"] is np.True_ or r.op.switch_states["w1"]
    assert abs(r.op.node_voltages["out"] - 5 * 1e3 / (1e3 + 1.0)) < 1e-6


DIODE_NET = """* temp test
.model d1 d(is=1e-14)
v1 a 0 5
r1 a b 1k
d1x b 0 d1
.op
{T}.end
"""


@pytest.mark.parametrize("temp_c,temp_k", [(None, 300.0), (126.85, 400.0),
                                           (-73.15, 200.0)])
def test_temp_diode_kcl_self_consistent(temp_c, temp_k):
    """The .op diode solution satisfies its own nonlinear KCL at every
    temperature: (5-vd)/R == Is(T)*(exp(vd/(N*vt(T)))-1) within NR tol,
    with the SPICE Is(T) EG/XTI law (defaults eg=1.11, xti=3)."""
    t_line = "" if temp_c is None else f".temp {temp_c}\n"
    r = simulate(DIODE_NET.format(T=t_line), dialect="extended")
    vd = r.op.node_voltages["b"]
    ratio = temp_k / 300.0
    vt = VT_300K * ratio
    is_t = 1e-14 * ratio ** 3 * np.exp(-1.11 / vt * (1.0 - ratio))
    lhs = (5 - vd) / 1e3
    rhs = is_t * (np.exp(vd / vt) - 1)
    assert abs(lhs - rhs) / lhs < 5e-3, (vd, lhs, rhs)


def test_temp_default_matches_no_directive():
    """Parity guard: omitting .temp must bit-match the pre-.temp engine
    (temp_k = 300 exactly, vt = VT_300K exactly)."""
    ckt = parse_netlist(DIODE_NET.format(T=""), dialect="extended")
    t = __import__("spicey_tpu").build_tensors(ckt)
    assert t.temp_k == 300.0
    assert t.vt == VT_300K
    np.testing.assert_array_equal(t.d_n, [1.0])


def test_temp_bjt_vbe_shift():
    """vbe at constant bias current DROPS with temperature (the Is(T)
    growth outruns the VT increase — the classic ~-1.8 mV/K)."""
    net = """* bjt temp
.model qn npn(is=1e-16 bf=100)
vcc c 0 5
ib 0 b dc 10u
q1 c b 0 qn
.op
{T}.end
"""
    r300 = simulate(net.format(T=""), dialect="extended")
    r360 = simulate(net.format(T=".temp 86.85\n"), dialect="extended")
    vbe300 = r300.op.node_voltages["b"]
    vbe360 = r360.op.node_voltages["b"]
    dvdt = (vbe360 - vbe300) / 60.0
    assert -0.0025 < dvdt < -0.0012, (vbe300, vbe360)


def test_temp_scales_resistor_noise():
    net = """* r noise
v1 a 0 dc 0 ac 1
r1 a b 1k
r2 b 0 1k
.noise v(b) v1 lin 3 1k 3k
{T}.end
"""
    r300 = simulate(net.format(T=""), dialect="extended")
    r600 = simulate(net.format(T=".temp 326.85\n"), dialect="extended")
    np.testing.assert_allclose(
        r600.noise.output_psd / r300.noise.output_psd, 2.0, rtol=1e-9)


def test_temp_tran_diode_waveform_shifts():
    """A rectifier passes MORE of the waveform at higher temperature
    (the forward drop shrinks with Is(T)) — end-to-end tran with .temp."""
    net = """* rectifier
.model d1 d
v1 in 0 SIN(0 2 1k)
d1x in out d1
rl out 0 1k
.tran 10u 2m
{T}.end
"""
    r300 = simulate(net.format(T=""), dialect="extended")
    r400 = simulate(net.format(T=".temp 126.85\n"), dialect="extended")
    p300 = np.asarray(r300.tran.node_voltages["out"]).max()
    p400 = np.asarray(r400.tran.node_voltages["out"]).max()
    assert p300 < p400 < 2.0


def test_resistor_tc_scales_with_temp():
    """Extended tc1=/tc2=: R(T) = R*(1 + tc1*dT + tc2*dT^2), folded into
    the IR so every engine sees R(T); no .temp -> exact parity."""
    net = "* tc\nv1 a 0 1\nr1 a 0 1k tc1=1m tc2=1u\n.op\n{T}.end\n"
    r300 = simulate(net.format(T=""), dialect="extended")
    assert abs(r300.op.element_currents["r1"] - 1e-3) < 1e-15
    r400 = simulate(net.format(T=".temp 126.85\n"), dialect="extended")
    r_eff = 1e3 * (1 + 1e-3 * 100 + 1e-6 * 100**2)
    assert abs(r400.op.element_currents["r1"] - 1 / r_eff) < 1e-12
    # tc tokens are inert in the reference dialect (trailing tokens ignored)
    ref = parse_netlist("* tc\nv1 a 0 1\nr1 a 0 1k tc1=1m\n.end\n")
    assert ref.R[0].R == 1e3 and ref.R[0].tc1 == 0.0


def test_diode_is_temperature_scaling():
    """Extended .temp scales the saturation current with the SPICE EG/XTI
    law, so the forward drop DECREASES ~1.7 mV/K (VT-only scaling would
    wrongly increase it)."""
    import numpy as np

    from spicey_tpu.constants import VT_300K

    net = ("x\n.model dm d(is=1e-14)\nv1 a 0 dc 5\nr1 a b 1k\n"
           "d1 b 0 dm\n.op\n{t}")
    r27 = simulate(net.format(t=".temp 26.85\n"), dialect="extended")
    r75 = simulate(net.format(t=".temp 75\n"), dialect="extended")
    v27 = r27.op.node_voltages["b"]
    v75 = r75.op.node_voltages["b"]
    dvdt = (v75 - v27) / (348.15 - 300.0)
    assert -0.0022 < dvdt < -0.0012
    # closed form at 348.15 K
    T = 75 + 273.15
    ratio = T / 300.0
    vt = VT_300K * ratio
    is_t = 1e-14 * ratio ** 3 * np.exp(-1.11 / vt * (1.0 - ratio))
    i = r75.op.element_currents["d1"]
    assert v75 == pytest.approx(vt * np.log(i / is_t + 1.0), abs=1e-9)


def test_bjt_is_temperature_scaling():
    """BJT vbe drops with temperature under .temp (Is(T) with N=1)."""
    net = ("x\n.model qn npn(is=1e-16 bf=100)\nvcc p 0 dc 10\n"
           "rc p c 1k\nib 0 b dc 10u\nq1 c b 0 qn\n.op\n{t}")
    vb_cold = simulate(net.format(t=""),
                       dialect="extended").op.node_voltages["b"]
    vb_hot = simulate(net.format(t=".temp 75\n"),
                      dialect="extended").op.node_voltages["b"]
    assert vb_hot < vb_cold - 0.05   # ~ -1.8 mV/K * 48 K
