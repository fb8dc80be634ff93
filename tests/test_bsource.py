"""Behavioral (B) source tests — extended dialect, no reference analog.

The Newton linearization of a behavioral source decomposes into existing
stamp patterns: each reference partial dI/d(vref) stamps as a VCCS row,
the zeroth-order residual as a current injection (V-kind adds its branch
row). Partials come from jax.jvp through the compiled expression
(parsing/bexpr.py), so any expressible nonlinearity converges under the
same iterate-to-convergence Newton the MOSFET/BJT devices use.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.parsing.bexpr import compile_bexpr


def test_compile_bexpr_refs_and_eval():
    import jax.numpy as jnp

    refs, fn = compile_bexpr("5*tanh(2*v(in)) + 1m*i(vs)*time - v(a,b)")
    assert refs == [("v", "in", None), ("i", "vs", None), ("v", "a", "b")]
    vals = jnp.asarray([0.1, 2.0, 0.5])
    got = float(fn(vals, 3.0))
    assert got == pytest.approx(5 * np.tanh(0.2) + 1e-3 * 2.0 * 3.0 - 0.5)


def test_compile_bexpr_errors():
    with pytest.raises(ValueError, match="malformed"):
        compile_bexpr("v(a,b,c)")
    with pytest.raises(ValueError, match="unknown name"):
        compile_bexpr("foo + 1")
    with pytest.raises(ValueError, match="unsupported|malformed"):
        compile_bexpr("__import__('os').system('x')")


def test_bi_nonlinear_load_op():
    """i = 1m*v^2 load behind 1k from 5V: KCL gives v^2 + v - 5 = 0."""
    r = simulate("* b\nv1 in 0 5\nr1 in a 1k\nbload a 0 I=1m*v(a)**2\n"
                 ".op\n.end\n", dialect="extended")
    exact = (-1 + np.sqrt(21)) / 2
    assert r.op.node_voltages["a"] == pytest.approx(exact, rel=1e-10)
    assert r.op.element_currents["bload"] == pytest.approx(
        1e-3 * exact ** 2, rel=1e-9)


def test_bv_tanh_amp_transient():
    """V-kind: v(out) = 2*tanh(5*v(in)) tracked exactly at every step."""
    r = simulate("* bv\nv1 in 0 SIN(0 0.2 1k)\nrb in 0 1k\n"
                 "bamp out 0 V=2*tanh(5*v(in))\nrl out 0 1k\n"
                 ".tran 10u 1m\n.end\n", dialect="extended")
    vin = np.asarray(r.tran.node_voltages["in"])
    vout = np.asarray(r.tran.node_voltages["out"])
    np.testing.assert_allclose(vout, 2 * np.tanh(5 * vin), atol=1e-12)
    # branch current = -v(out)/rl (flows through the load)
    np.testing.assert_allclose(
        np.asarray(r.tran.element_currents["bamp"]), -vout / 1e3,
        atol=1e-12)


def test_time_dependent_bsource():
    r = simulate("* tb\nbsrc a 0 I=-1m*(1+sin(6283.185307179586*time))\n"
                 "r1 a 0 1k\n.tran 10u 1m\n.end\n", dialect="extended")
    t = np.asarray(r.tran.times)
    va = np.asarray(r.tran.node_voltages["a"])
    np.testing.assert_allclose(va, 1 + np.sin(2 * np.pi * 1e3 * t),
                               atol=1e-12)


def test_current_ref_bsource():
    """i(vname) reference: a behavioral current mirror doubling the sensed
    current."""
    net = """* mirror
v1 in 0 5
r1 in a 1k
vsense a 0 0
bmir out 0 I=-2*i(vsense)
rload out 0 100
.op
.end
"""
    r = simulate(net, dialect="extended")
    # i(vsense) = 5 mA; mirror drives 10 mA into rload (100) -> 1 V
    assert r.op.node_voltages["out"] == pytest.approx(1.0, rel=1e-9)


def test_bsource_dc_sweep():
    """.dc sweeps solve B sources per lane (batched Newton)."""
    net = """* b dc
v1 in 0 5
r1 in a 1k
bload a 0 I=1m*v(a)**2
.dc v1 0 5 1
.end
"""
    r = simulate(net, dialect="extended")
    vs = r.dc.sweep
    va = r.dc.node_voltages["a"]
    for v, a in zip(vs, va):
        assert a ** 2 * 1e-3 == pytest.approx((v - a) / 1e3, abs=1e-9)


def test_bv_is_short_in_ac_and_bi_open():
    """AC policy mirrors the reference's nonlinear-device treatment:
    V-kind behavioral sources stamp as 0V small-signal shorts, I-kind are
    open (unless linearize='op')."""
    net = """* b ac
v1 in 0 dc 1 ac 1
r1 in out 1k
bamp out 0 V=2*tanh(5*v(in))
.ac lin 2 1k 2k
.end
"""
    r = simulate(net, dialect="extended")
    np.testing.assert_allclose(np.abs(r.ac.node_voltages["out"]), 0.0,
                               atol=1e-12)

    net2 = """* bi ac linearized
v1 in 0 dc 2 ac 1
bload in 0 I=1m*v(in)**2
.ac lin 2 1k 2k
.end
"""
    from spicey_tpu import parse_netlist
    from spicey_tpu.analysis.ac import simulate_ac
    from spicey_tpu.ir.circuit import build_tensors

    ckt = parse_netlist(net2, dialect="extended")
    ac = simulate_ac(ckt, tensors=build_tensors(ckt), linearize="op")
    # the small-signal conductance at v=2 is g = dI/dv = 2m*v = 4 mS; the
    # source current is i = v(branch current) of the ideal source = -g*1V
    i_v1 = ac.element_currents["v1"]
    np.testing.assert_allclose(np.abs(i_v1), 4e-3, rtol=1e-9)


def test_bsource_parse_and_path_errors():
    with pytest.raises(ValueError, match="V=<expr> or I=<expr>"):
        parse_netlist("t\nb1 a 0 5\nr1 a 0 1\n.end\n", dialect="extended")
    with pytest.raises(ValueError, match="Unknown node"):
        parse_netlist("t\nb1 a 0 I=v(nope)\nr1 a 0 1\n.end\n",
                      dialect="extended")
    # B inside .subckt now expands with scope-rewritten references
    ckt_sub = parse_netlist("t\n.subckt s a\nb1 a 0 I=1m*v(a)\n.ends\n"
                            "v1 n 0 1\nx1 n s\n.end\n", dialect="extended")
    assert ckt_sub.B[0].name == "b1.x1"
    assert ckt_sub.B[0].refs == [("v", "n", None)]
    # round 3: sensitivity/fit accept B sources (full coverage in
    # tests/test_feature_interactions.py); smoke the path here
    from spicey_tpu.analysis.sensitivity import sensitivity_tran

    sens = sensitivity_tran(parse_netlist(
        "t\nv1 in 0 1\nbl a 0 I=v(a)\nr1 in a 1\n.tran 1u 10u\n.end\n",
        dialect="extended"), node="a", wrt=["r1"], nr="converged")
    assert np.isfinite(sens["r1"]).all()
    # reference dialect: B lines land in `skipped`
    ckt = parse_netlist("the title\nb1 a 0 I=5\nv1 a 0 1\nr1 a 0 1\n.end\n")
    assert any(line.startswith("b1") for line in ckt.skipped)


def test_bv_amp_tf_gain():
    """.tf linearizes B sources at the op point: the tanh amp's DC
    small-signal gain is 10*sech^2(5*v_in0) = 10 at v_in0 = 0."""
    net = """* tf bamp
v1 in 0 dc 0
rb in 0 1k
bamp out 0 V=2*tanh(5*v(in))
rl out 0 1k
.tf v(out) v1
.end
"""
    r = simulate(net, dialect="extended")
    assert r.tf.transfer_function == pytest.approx(10.0, rel=1e-9)
    # biased away from zero the gain drops by sech^2
    net_b = net.replace("v1 in 0 dc 0", "v1 in 0 dc 0.2")
    rb_ = simulate(net_b, dialect="extended")
    assert rb_.tf.transfer_function == pytest.approx(
        10.0 / np.cosh(1.0) ** 2, rel=1e-9)



def test_bsource_batched_paths():
    """Behavioral sources run in the batched sweep and Monte-Carlo paths:
    the nonlinear-load quadratic holds per variant."""
    from spicey_tpu.analysis.batch import simulate_tran_batch
    from spicey_tpu.analysis.mc import mc_tran_stats

    net = """* b batch
v1 in 0 5
r1 in a 1k
bload a 0 I=1m*v(a)**2
.tran 10u 100u
.end
"""
    rs = np.array([1e3, 2e3])
    rt = simulate_tran_batch(net, {"r1": rs}, dialect="extended")
    assert bool(rt.valid.all())
    va = rt.node_voltage("a")[:, -1]
    for r_ohm, a in zip(rs, va):
        assert 1e-3 * a ** 2 == pytest.approx((5 - a) / r_ohm, rel=1e-6)

    st = mc_tran_stats(net, {"r1": np.linspace(1e3, 2e3, 8)}, node="a",
                       dialect="extended")
    assert st.n_valid == 8
    assert va.min() - 1e-6 <= st.mean[-1] <= va.max() + 1e-6

    # AC batch: V-kind branch rows stay regular (0 V shorts)
    from spicey_tpu.analysis.batch import simulate_ac_batch

    net_ac = """* b ac batch
v1 in 0 dc 1 ac 1
r1 in out 1k
bamp out 0 V=2*tanh(5*v(in))
.ac lin 2 1k 2k
.end
"""
    ra = simulate_ac_batch(net_ac, {"r1": np.array([1e3, 2e3])},
                           dialect="extended")
    assert bool(ra.valid.all())
    out_col = [n.upper() for n in ra.node_names].index("OUT")
    np.testing.assert_allclose(np.abs(ra.x[:, :, out_col]), 0.0, atol=1e-12)



def test_bsource_adaptive_and_noise():
    """Adaptive stepping and .noise handle behavioral sources: the
    LTE-controlled run tracks the tanh limiter, and the noise gain sees
    the op-point gradient of an I-kind source."""
    from spicey_tpu.analysis.adaptive import simulate_tran_adaptive

    ckt = parse_netlist(
        "* ad b\nv1 in 0 SIN(0 0.2 1k)\nrb in 0 1k\n"
        "bamp out 0 V=2*tanh(5*v(in))\nrl out 0 1k\n.tran 10u 1m\n.end\n",
        dialect="extended")
    r = simulate_tran_adaptive(ckt)
    t = np.asarray(r.times)
    vout = np.asarray(r.node_voltages["out"])
    exp = 2 * np.tanh(5 * 0.2 * np.sin(2 * np.pi * 1e3 * t))
    assert np.abs(vout - exp).max() < 5e-3

    # noise: behavioral conductance g = 2m*v at v=2 -> 4 mS in parallel
    # with r1; the output PSD equals the r1 thermal noise through the
    # divider formed with the behavioral conductance
    net = """* b noise
v1 in 0 dc 5
r1 in a 1k
bload a 0 I=1m*v(a)**2
.noise v(a) v1 lin 2 1k 2k
.end
"""
    r2 = simulate(net, dialect="extended")
    from spicey_tpu.constants import K_BOLTZMANN, T_NOISE

    va = (-1 + np.sqrt(21)) / 2
    g_b = 2e-3 * va             # dI/dv at the op point
    g1 = 1e-3
    # r1's current noise 4kT/R through the node-a impedance 1/(g1+g_b)
    s_exp = 4 * K_BOLTZMANN * T_NOISE / 1e3 / (g1 + g_b) ** 2
    np.testing.assert_allclose(r2.noise.output_psd, s_exp, rtol=1e-6)
