"""Extended-dialect .sens DC sensitivity analysis (adjoint method).

The reference has no sensitivity analysis (`.sens` lines land in
`skipped`). Expectations: closed-form divider algebra plus central
finite-difference cross-checks re-running .op with perturbed values.
"""

import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.analysis.op import simulate_op
from spicey_tpu.analysis.sens import format_sens_result

DIVIDER = """the divider
v1 in 0 dc 10
r1 in out 6k
r2 out 0 4k
.sens v(out)
"""


def test_sens_skipped_in_spicey_dialect():
    ckt = parse_netlist("t\nv1 a 0 dc 1\nr1 a 0 1k\n.sens v(a)\n")
    assert ckt.sens is None
    assert any(".sens" in s for s in ckt.skipped)


def test_divider_closed_form():
    """v(out) = V*R2/(R1+R2): dv/dV = 0.4, dv/dR1 = -V*R2/(R1+R2)^2,
    dv/dR2 = +V*R1/(R1+R2)^2."""
    res = simulate(DIVIDER, dialect="extended")
    s = res.sens
    v, r1, r2 = 10.0, 6e3, 4e3
    assert s.values["v1"] == pytest.approx(r2 / (r1 + r2), rel=1e-9)
    assert s.values["r1"] == pytest.approx(-v * r2 / (r1 + r2) ** 2,
                                           rel=1e-9)
    assert s.values["r2"] == pytest.approx(v * r1 / (r1 + r2) ** 2,
                                           rel=1e-9)
    # per-1% normalization: value * p / 100
    assert s.normalized["r2"] == pytest.approx(
        s.values["r2"] * r2 / 100.0, rel=1e-12)
    txt = format_sens_result(s)
    assert "dc sensitivities of v(out)" in txt and "r1" in txt


def _fd_check(net, out_node, elem, base, rel=1e-6, **parse_kw):
    """Central finite difference of v(out) w.r.t. one element value."""
    def solve(value):
        text = net.replace(f"{{{elem}}}", repr(value))
        ckt = parse_netlist(text, dialect="extended")
        return simulate_op(ckt).node_voltages[out_node]

    h = base * rel
    return (solve(base + h) - solve(base - h)) / (2 * h)


def test_fd_cross_check_rdiode():
    """Diode + resistor bias: adjoint sens matches finite differences for
    the resistor and the source."""
    net = """the diode bias
.model dm d(is=1e-14)
v1 in 0 dc {v1}
r1 in out {r1}
d1 out 0 dm
.sens v(out)
"""
    res = simulate(net.replace("{v1}", "5.0").replace("{r1}", "1e3"),
                   dialect="extended")
    s = res.sens
    fd_r = _fd_check(net.replace("{v1}", "5.0"), "out", "r1", 1e3)
    fd_v = _fd_check(net.replace("{r1}", "1e3"), "out", "v1", 5.0)
    assert s.values["r1"] == pytest.approx(fd_r, rel=1e-4)
    assert s.values["v1"] == pytest.approx(fd_v, rel=1e-4)
    # diode Is sensitivity: more Is -> lower forward drop
    assert s.values["d1:is"] < 0
    assert "d1:n" in s.values


def test_fd_cross_check_controlled_sources():
    """VCCS gm and CCCS gain sensitivities vs finite differences."""
    net = """the ctl
v1 in 0 dc 2
vm m 0 dc 0
r0 in m 1k
g1 0 out in 0 {g1}
f1 0 out vm {f1}
r1 out 0 2k
.sens v(out)
"""
    res = simulate(net.replace("{g1}", "1e-3").replace("{f1}", "0.5"),
                   dialect="extended")
    s = res.sens
    fd_g = _fd_check(net.replace("{f1}", "0.5"), "out", "g1", 1e-3)
    fd_f = _fd_check(net.replace("{g1}", "1e-3"), "out", "f1", 0.5)
    assert s.values["g1"] == pytest.approx(fd_g, rel=1e-6)
    assert s.values["f1"] == pytest.approx(fd_f, rel=1e-6)


def test_fd_cross_check_mosfet_and_bjt():
    net = """the active
.model mn nmos(vto=1 kp={kp})
.model qn npn(is=1e-16 bf={bf})
vdd vdd 0 dc 5
vg g 0 dc 2
rd vdd d 1k
m1 d g 0 mn
rc vdd c 10k
ib 0 b dc 10u
q1 c b 0 qn
.sens v(d)
"""
    res = simulate(net.replace("{kp}", "2e-3").replace("{bf}", "100.0"),
                   dialect="extended")
    s = res.sens
    # beta = kp*W/L with W=L -> d v(d)/d beta; fd over kp equals it
    fd_kp = _fd_check(net.replace("{bf}", "100.0"), "d", "kp", 2e-3)
    assert s.values["m1:beta"] == pytest.approx(fd_kp, rel=1e-4)
    # the BJT leg doesn't load v(d): its sensitivities ~ 0 there
    assert abs(s.values["q1:bf"]) < 1e-12
    # vto: raising vto lowers Id -> v(d) rises
    assert s.values["m1:vto"] > 0


def test_jfet_beta_reported_in_model_units():
    """J rows carry the 2x lowering scale; .sens must report d/d(BETA)."""
    net = """the jfet sens
.model jm njf(vto=-2 beta={beta} lambda=0)
vdd p 0 dc 10
rd p d 10k
j1 d 0 0 jm
.sens v(d)
"""
    res = simulate(net.replace("{beta}", "1e-4"), dialect="extended")
    s = res.sens
    fd = _fd_check(net, "d", "beta", 1e-4)
    assert s.values["j1:beta"] == pytest.approx(fd, rel=1e-6)
    assert s.params["j1:beta"] == pytest.approx(1e-4)
    # closed form: v(d) = 10 - Rd*Beta*Vto^2 -> d/dBeta = -Rd*4
    assert s.values["j1:beta"] == pytest.approx(-10e3 * 4.0, rel=1e-6)
    # vto reported against the model's Vto = -2
    assert s.params["j1:vto"] == pytest.approx(-2.0)
    # v(d) = 10 - Rd*Beta*vto^2 (vgs=0) -> d/dvto = -Rd*Beta*2*vto = 4
    assert s.values["j1:vto"] == pytest.approx(
        -10e3 * 1e-4 * 2 * (-2.0), rel=1e-6)


def test_pjf_vto_sign_convention():
    """PJF rows store m_vto = -Vto; .sens must still report d/d(model Vto).
    v(d) = -10 + Rd*Beta*Vto^2 -> d/dVto = Rd*Beta*2*Vto = -4."""
    res = simulate("""the pjf sens
.model jm pjf(vto=-2 beta=1e-4 lambda=0)
vss p 0 dc -10
rd p d 10k
j1 d 0 0 jm
.sens v(d)
""", dialect="extended")
    assert res.sens.values["j1:vto"] == pytest.approx(
        10e3 * 1e-4 * 2 * (-2.0), rel=1e-6)
    assert res.sens.params["j1:vto"] == pytest.approx(-2.0)
