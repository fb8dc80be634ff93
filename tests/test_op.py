"""DC operating-point (.op) tests — extension feature (the reference has no
.op at all; SURVEY §2.9)."""

import numpy as np
import pytest

from spicey_tpu import parse_netlist
from spicey_tpu.analysis.op import simulate_op
from spicey_tpu.constants import VT_300K


def test_resistive_divider():
    ckt = parse_netlist("The t\nV1 1 0 DC 10\nR1 1 2 1k\nR2 2 0 3k\n")
    op = simulate_op(ckt)
    assert op.node_voltages["1"] == pytest.approx(10.0)
    assert op.node_voltages["2"] == pytest.approx(7.5)
    assert op.element_currents["R1"] == pytest.approx(2.5e-3)
    assert op.element_currents["V1"] == pytest.approx(-2.5e-3)


def test_capacitor_open_at_dc():
    ckt = parse_netlist("The t\nV1 1 0 DC 5\nR1 1 2 1k\nC1 2 0 1u\nR2 2 0 1k\n")
    op = simulate_op(ckt)
    assert op.node_voltages["2"] == pytest.approx(2.5)
    assert op.element_currents["C1"] == 0.0


def test_inductor_short_at_dc():
    """L shorts node 2 to node 3; current flows through it."""
    ckt = parse_netlist(
        "The t\nV1 1 0 DC 6\nR1 1 2 1k\nL1 2 3 10m\nR2 3 0 2k\n"
    )
    op = simulate_op(ckt)
    assert op.node_voltages["2"] == pytest.approx(op.node_voltages["3"])
    assert op.node_voltages["3"] == pytest.approx(4.0)
    assert op.element_currents["L1"] == pytest.approx(2e-3)


def test_diode_forward_op():
    """Converged diode OP must satisfy nonlinear KCL exactly."""
    ckt = parse_netlist("The t\n.model dm d\nV1 1 0 DC 5\nR1 1 2 1k\nD1 2 0 dm\n")
    op = simulate_op(ckt)
    vd = op.node_voltages["2"]
    i_r = (5.0 - vd) / 1e3
    i_d = 1e-14 * (np.exp(vd / VT_300K) - 1.0)
    assert i_r == pytest.approx(i_d, rel=1e-9)
    assert 0.5 < vd < 0.8  # silicon-ish forward drop
    assert op.element_currents["D1"] == pytest.approx(i_r, rel=1e-6)


def test_diode_reverse_op():
    ckt = parse_netlist("The t\n.model dm d\nV1 1 0 DC -5\nR1 1 2 1k\nD1 2 0 dm\n")
    op = simulate_op(ckt)
    # reverse-biased: only the tiny saturation current flows
    assert abs(op.element_currents["D1"]) < 1e-11
    assert op.node_voltages["2"] == pytest.approx(-5.0, rel=1e-6)


def test_switch_op_states():
    ckt_on = parse_netlist(
        "The t\n.model sm sw(ron=1 roff=1e9 von=2 voff=1)\n"
        "V1 1 0 DC 5\nVc c 0 DC 5\nR1 1 2 1k\nS1 2 0 c 0 sm\n"
    )
    op = simulate_op(ckt_on)
    assert abs(op.node_voltages["2"]) < 0.01  # switch ON pulls node down
    ckt_off = parse_netlist(
        "The t\n.model sm sw(ron=1 roff=1e9 von=2 voff=1)\n"
        "V1 1 0 DC 5\nVc c 0 DC 0\nR1 1 2 1k\nS1 2 0 c 0 sm\n"
    )
    op2 = simulate_op(ckt_off)
    assert op2.node_voltages["2"] == pytest.approx(5.0, rel=1e-3)


def test_current_source_op():
    ckt = parse_netlist("The t\nI1 0 out dc 2m\nR1 out 0 1k\n",
                        dialect="extended")
    op = simulate_op(ckt)
    assert op.node_voltages["out"] == pytest.approx(2.0)
    assert op.element_currents["I1"] == pytest.approx(2e-3)


def test_nonconvergent_raises():
    # two parallel ideal V sources with different values -> singular
    ckt = parse_netlist("The t\nV1 1 0 DC 5\nV2 1 0 DC 3\nR1 1 0 1k\n")
    with pytest.raises(ValueError):
        simulate_op(ckt)


def test_op_directive_extended_dialect():
    from spicey_tpu import simulate

    net = "The t\nV1 1 0 DC 10\nR1 1 2 1k\nR2 2 0 1k\n.op\n"
    res = simulate(net, dialect="extended")
    assert res.op is not None
    assert res.op.node_voltages["2"] == pytest.approx(5.0)
    # default dialect: .op is skipped, no OP result (reference behavior)
    res2 = simulate(net)
    assert res2.op is None
    assert any(".op" in s for s in res2.circuit.skipped)


# --- .dc sweep + op_batch (extended dialect) ---

def test_dc_sweep_resistive_divider():
    from spicey_tpu import simulate

    res = simulate(
        "t\nv1 1 0 dc 1\nr1 1 2 1k\nr2 2 0 1k\n.dc v1 0 5 0.5\n",
        dialect="extended",
    )
    dc = res.dc
    np.testing.assert_allclose(dc.sweep, np.arange(0, 5.01, 0.5))
    np.testing.assert_allclose(dc.node_voltages["2"], dc.sweep / 2,
                               rtol=1e-12, atol=1e-15)
    assert dc.valid.all()


def test_dc_sweep_mosfet_transfer():
    """NMOS common-source transfer curve in one batched Newton solve:
    cutoff at vg<=vto, the square law in saturation."""
    from spicey_tpu import simulate

    res = simulate("""t
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vg gt 0 1
rd vdd d 1k
m1 d gt 0 mn
.dc vg 0 3 0.25
""", dialect="extended")
    dc = res.dc
    vd = dc.node_voltages["d"]
    np.testing.assert_allclose(vd[dc.sweep <= 1.0], 5.0, atol=1e-9)
    sat = (dc.sweep > 1) & (5 - (dc.sweep - 1) ** 2 > dc.sweep - 1)
    expect = 5.0 - 1e3 * 1e-3 * (dc.sweep - 1) ** 2
    np.testing.assert_allclose(vd[sat], expect[sat], rtol=1e-9)
    # drain current recorded per sweep point
    np.testing.assert_allclose(dc.element_currents["m1"][sat],
                               1e-3 * (dc.sweep[sat] - 1) ** 2, rtol=1e-9)


def test_dc_sweep_current_source():
    from spicey_tpu import simulate

    res = simulate(
        "t\ni1 0 out 1m\nr1 out 0 1k\n.dc i1 0 5m 1m\n",
        dialect="extended",
    )
    np.testing.assert_allclose(res.dc.node_voltages["out"],
                               res.dc.sweep * 1e3, rtol=1e-12, atol=1e-15)


def test_dc_unknown_source_raises():
    from spicey_tpu import simulate

    with pytest.raises(ValueError, match="Unknown .dc source"):
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.dc vmissing 0 1 0.1\n",
                 dialect="extended")


def test_op_batch_matches_dc_sweep():
    from spicey_tpu import op_batch, parse_netlist, simulate

    net = """t
.model qn npn(is=1e-16 bf=100)
vcc vcc 0 5
ib 0 bs 10u
rc vcc c 1k
q1 c bs 0 qn
"""
    ckt = parse_netlist(net + ".dc ib 2u 20u 2u\n", dialect="extended")
    res = simulate(net + ".dc ib 2u 20u 2u\n", dialect="extended")
    ob = op_batch(ckt, {"ib": res.dc.sweep})
    np.testing.assert_allclose(ob.node_voltage("c"),
                               res.dc.node_voltages["c"], rtol=1e-12)
    assert ob.valid.all()


def test_dc_2d_sweep_mosfet_output_characteristics():
    """Nested .dc (vds inner, vgs outer): the classic curve-trace family,
    all corners in one batched Newton call, exact vs the square law."""
    from spicey_tpu import simulate

    res = simulate("""t
.model mn nmos(vto=1 kp=2m lambda=0.02)
vds d 0 1
vgs gt 0 1
m1 d gt 0 mn
.dc vds 0 5 0.5 vgs 1 3 1
""", dialect="extended")
    dc = res.dc
    assert dc.shape2d == (3, 11)
    assert dc.valid.all()
    i_d = dc.element_currents["m1"].reshape(dc.shape2d)
    # vgs = 3 V, vds = 5 V is saturation: id = kp/2*(vgs-vto)^2*(1+lam*vds)
    assert i_d[-1, -1] == pytest.approx(1e-3 * 4 * 1.1, rel=1e-9)
    # vgs = 1 V row: cutoff
    np.testing.assert_allclose(i_d[0], 0.0, atol=1e-11)
    # outer axis values repeat per inner row
    np.testing.assert_allclose(dc.sweep2.reshape(dc.shape2d)[:, 0],
                               [1.0, 2.0, 3.0])


def test_dc_1d_sweep_has_no_2d_fields():
    from spicey_tpu import simulate

    res = simulate(
        "t\nv1 1 0 dc 1\nr1 1 2 1k\nr2 2 0 1k\n.dc v1 0 2 1\n",
        dialect="extended",
    )
    assert res.dc.sweep2 is None and res.dc.shape2d is None


def test_nodeset_selects_latch_state():
    """.nodeset seeds the .op Newton iterate: a cross-coupled NMOS latch
    has two stable DC states, and the seed picks the basin."""
    latch = """* latch
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
r1 vdd q 10k
r2 vdd qb 10k
m1 q qb 0 mn
m2 qb q 0 mn
.op
{NS}.end
"""
    from spicey_tpu import simulate

    ra = simulate(latch.format(NS=".nodeset v(q)=5 v(qb)=0\n"),
                  dialect="extended")
    rb = simulate(latch.format(NS=".nodeset v(q)=0 v(qb)=5\n"),
                  dialect="extended")
    assert ra.op.node_voltages["q"] > 4.5 > 1.0 > ra.op.node_voltages["qb"]
    assert rb.op.node_voltages["qb"] > 4.5 > 1.0 > rb.op.node_voltages["q"]


def test_nodeset_parse_errors():
    import pytest

    from spicey_tpu import parse_netlist

    with pytest.raises(ValueError, match="malformed .nodeset"):
        parse_netlist("t\nv1 a 0 1\nr1 a 0 1\n.nodeset garbage\n.end\n",
                      dialect="extended")
    ckt = parse_netlist("t\nv1 a 0 1\nr1 a 0 1\n.nodeset v(a)=2.5\n.end\n",
                        dialect="extended")
    assert ckt.nodeset == {"a": 2.5}
