"""Tests for the transient improvement toggles (integration="trap",
nr="converged") — features the reference lacks (SURVEY §7 step 8); defaults
must stay reference-exact (covered by tests/test_tran.py's oracle suite)."""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate_tran
from spicey_tpu.constants import VT_300K
from tests.fixtures import netlists

RC_DC = "The t\nV1 1 0 DC 5\nR1 1 2 1k\nC1 2 0 1u\n.tran 20u 5m\n.end\n"


def test_trap_is_second_order_on_rc():
    """Trap error vs the exact exponential must be far below BE error.

    Both traces inherit the reference's t=0 semantics (the step-0 record is
    already one full step from rest, simulateTRAN.ts:147-149), so the
    physical solution at record k is exact((k+1)*dt); compare against that.
    """
    ckt = parse_netlist(RC_DC)
    be = simulate_tran(ckt)
    trap = simulate_tran(ckt, integration="trap")
    t = np.asarray(be.times)
    dt = t[1] - t[0]
    exact = 5.0 * (1.0 - np.exp(-(t + dt) / 1e-3))
    err_be = np.abs(np.asarray(be.node_voltages["2"]) - exact)[3:].max()
    err_trap = np.abs(np.asarray(trap.node_voltages["2"]) - exact)[3:].max()
    assert err_trap < err_be / 15
    assert err_trap < 1e-3


def test_trap_rlc_energy_behavior():
    """Series RLC: trapezoidal is A-stable and non-dissipative; the ringing
    amplitude must decay no faster than the analytic envelope (BE
    overdamps)."""
    net = ("The t\nV1 in 0 DC 1\nR1 in n1 10\nL1 n1 n2 10m\nC1 n2 0 1u\n"
           ".tran 5u 5m\n.end\n")
    ckt = parse_netlist(net)
    be = simulate_tran(ckt)
    trap = simulate_tran(ckt, integration="trap")
    t = np.asarray(be.times)
    dt = t[1] - t[0]
    ts = t + dt  # reference t=0 record semantics (see RC test above)
    # analytic underdamped response: alpha = R/2L = 500, w0^2 = 1/LC = 1e8
    alpha, w0 = 500.0, 1e4
    wd = np.sqrt(w0**2 - alpha**2)
    exact = 1.0 - np.exp(-alpha * ts) * (
        np.cos(wd * ts) + alpha / wd * np.sin(wd * ts)
    )
    err_be = np.abs(np.asarray(be.node_voltages["n2"]) - exact)[5:].max()
    err_trap = np.abs(np.asarray(trap.node_voltages["n2"]) - exact)[5:].max()
    assert err_trap < err_be / 5


def test_trap_element_current_recurrence():
    """Trap C/L currents recovered post-scan must satisfy KCL: in the RC
    series loop i_R == i_C at every step."""
    ckt = parse_netlist(RC_DC)
    trap = simulate_tran(ckt, integration="trap")
    i_r = np.asarray(trap.element_currents["R1"])
    i_c = np.asarray(trap.element_currents["C1"])
    np.testing.assert_allclose(i_r[1:], i_c[1:], rtol=1e-6, atol=1e-12)


def test_converged_nr_diode_satisfies_kcl():
    """With nr='converged' the diode node must satisfy nonlinear KCL to the
    tolerance (the reference's single Newton step leaves a residual)."""
    net = (
        "The t\n.model dm d\n"
        "V1 in 0 PULSE(0 5 0 1u 1u 48u 100u)\n"
        "D1 in out dm\nR1 out 0 1k\n"
        ".tran 1u 100u\n.end\n"
    )
    ckt = parse_netlist(net)

    def kcl_residual(res):
        v_in = np.asarray(res.node_voltages["in"])
        v_out = np.asarray(res.node_voltages["out"])
        vd = v_in - v_out
        i_d = 1e-14 * (np.exp(np.clip(vd, -np.inf, 0.9) / VT_300K) - 1.0)
        i_r = v_out / 1e3
        return np.abs(i_d - i_r).max()

    spicey_mode = simulate_tran(ckt)
    converged = simulate_tran(ckt, nr="converged", nr_tol=1e-12)
    assert kcl_residual(converged) < 1e-9
    assert kcl_residual(converged) < kcl_residual(spicey_mode) / 10


def test_converged_nr_still_handles_switches():
    ckt = parse_netlist(netlists.VSWITCH_PWL)
    res = simulate_tran(ckt, nr="converged")
    times = np.asarray(res.times)
    v_out = np.asarray(res.node_voltages["OUT"])

    def sample(target):
        return v_out[np.abs(times - target).argmin()]

    assert abs(sample(0.0005)) < 0.02  # switch ON shorts the output
    assert sample(0.0035) > 2          # OFF -> recharges


def test_trap_plus_converged_compose():
    net = (
        "The t\n.model dm d\n"
        "V1 in 0 PULSE(0 5 0 1u 1u 48u 100u)\n"
        "D1 in out dm\nR1 out 0 1k\nC1 out 0 100n\n"
        ".tran 1u 200u\n.end\n"
    )
    ckt = parse_netlist(net)
    res = simulate_tran(ckt, integration="trap", nr="converged")
    v_out = np.asarray(res.node_voltages["out"])
    assert np.isfinite(v_out).all()
    assert v_out.max() > 3.0 and v_out.min() > -0.6


def test_invalid_toggles_rejected():
    ckt = parse_netlist(RC_DC)
    with pytest.raises(ValueError, match="integration"):
        simulate_tran(ckt, integration="euler")
    with pytest.raises(ValueError, match="nr"):
        simulate_tran(ckt, nr="newton")


# --- checkpoint / resume (segmented long horizons) ---

def _segment_netlist(tstop):
    return (f"t\nV1 1 0 PULSE(0 5 0 1n 1n 5u 10u)\nR1 1 2 1k\nC1 2 0 1u\n"
            f"L1 2 3 1m\nR2 3 0 100\n.tran 0.1u {tstop}\n")


def test_tran_segments_match_single_run():
    """Two resumed 10us segments must reproduce a single 20us run exactly
    (node voltages AND companion-recovered element currents)."""
    from spicey_tpu import parse_netlist, simulate_tran

    full = simulate_tran(parse_netlist(_segment_netlist("20u")))
    seg_ckt = parse_netlist(_segment_netlist("10u"))
    a = simulate_tran(seg_ckt, return_state=True)
    b = simulate_tran(seg_ckt, state=a.state)
    times = np.concatenate([a.times, b.times])
    np.testing.assert_allclose(times, full.times, rtol=1e-12, atol=1e-18)
    for node in ("2", "3"):
        joined = np.concatenate([a.node_voltages[node],
                                 b.node_voltages[node]])
        np.testing.assert_allclose(joined, full.node_voltages[node],
                                   rtol=1e-12, atol=1e-15)
    for el in ("R1", "C1", "L1"):
        joined = np.concatenate([a.element_currents[el],
                                 b.element_currents[el]])
        np.testing.assert_allclose(joined, full.element_currents[el],
                                   rtol=1e-9, atol=1e-18)


def test_tran_segments_trap_and_nonlinear():
    """Resume composes with trapezoidal integration and diode state."""
    from spicey_tpu import parse_netlist, simulate_tran
    from tests.fixtures import netlists

    net = netlists.BOOST_CONVERTER.replace(".tran 0.001 0.1 uic",
                                           ".tran 0.001 0.1")
    full = simulate_tran(parse_netlist(net))
    seg = net.replace(".tran 0.001 0.1", ".tran 0.001 0.05")
    ckt = parse_netlist(seg)
    a = simulate_tran(ckt, return_state=True)
    b = simulate_tran(ckt, state=a.state)
    joined = np.concatenate([a.node_voltages["N3"], b.node_voltages["N3"]])
    np.testing.assert_allclose(joined, full.node_voltages["N3"],
                               rtol=1e-12, atol=1e-15)
    # trap toggle on the linear RLC segments
    fullt = simulate_tran(parse_netlist(_segment_netlist("20u")),
                          integration="trap")
    ckt2 = parse_netlist(_segment_netlist("10u"))
    at = simulate_tran(ckt2, integration="trap", return_state=True)
    bt = simulate_tran(ckt2, integration="trap", state=at.state)
    joined = np.concatenate([at.node_voltages["2"], bt.node_voltages["2"]])
    np.testing.assert_allclose(joined, fullt.node_voltages["2"],
                               rtol=1e-12, atol=1e-15)
    jl = np.concatenate([at.element_currents["L1"], bt.element_currents["L1"]])
    np.testing.assert_allclose(jl, fullt.element_currents["L1"],
                               rtol=1e-9, atol=1e-18)


def test_tran_resume_dt_mismatch_raises():
    from spicey_tpu import parse_netlist, simulate_tran
    import pytest

    ckt = parse_netlist(_segment_netlist("10u"))
    a = simulate_tran(ckt, return_state=True)
    other = parse_netlist("t\nV1 1 0 dc 1\nR1 1 2 1k\nC1 2 0 1u\n"
                          "L1 2 3 1m\nR2 3 0 100\n.tran 0.2u 10u\n")
    with pytest.raises(ValueError, match="resume dt"):
        simulate_tran(other, state=a.state)


# --- gear2 (BDF2) integration toggle ---

def test_gear2_is_second_order_on_rc():
    """BDF2 error must be far below BE on the RC exponential (same record
    semantics note as the trap test)."""
    ckt = parse_netlist(RC_DC)
    be = simulate_tran(ckt)
    g2 = simulate_tran(ckt, integration="gear2")
    t = np.asarray(be.times)
    dt = t[1] - t[0]
    exact = 5.0 * (1.0 - np.exp(-(t + dt) / 1e-3))
    err_be = np.abs(np.asarray(be.node_voltages["2"]) - exact)[3:].max()
    err_g2 = np.abs(np.asarray(g2.node_voltages["2"]) - exact)[3:].max()
    assert err_g2 < err_be / 5
    assert err_g2 < 5e-3


def test_gear2_damps_rlc():
    """BDF2 is numerically damping: the under-damped RLC envelope must
    decay at least as fast as the physical solution (no trap-style
    sustained numerical ringing)."""
    net = ("t\nV1 1 0 dc 5\nR1 1 2 10\nL1 2 3 1m\nC1 3 0 1u\n"
           ".tran 5u 5m\n")
    tr = simulate_tran(parse_netlist(net), integration="gear2")
    v = np.asarray(tr.node_voltages["3"])
    # physical damping: alpha = R/2L = 5000 -> envelope e^{-alpha t}
    late = np.abs(v[-200:] - 5.0)
    assert late.max() < 0.05  # fully settled, no residual oscillation


def test_gear2_segments_match_full_run():
    from spicey_tpu import parse_netlist as pn

    full = simulate_tran(pn(_segment_netlist("20u")), integration="gear2")
    ckt = pn(_segment_netlist("10u"))
    a = simulate_tran(ckt, integration="gear2", return_state=True)
    b = simulate_tran(ckt, integration="gear2", state=a.state)
    for key in ("2", "3"):
        j = np.concatenate([a.node_voltages[key], b.node_voltages[key]])
        np.testing.assert_allclose(j, full.node_voltages[key],
                                   rtol=1e-12, atol=1e-15)
    for el in ("C1", "L1"):
        j = np.concatenate([a.element_currents[el], b.element_currents[el]])
        np.testing.assert_allclose(j, full.element_currents[el],
                                   rtol=1e-9, atol=1e-18)


def test_options_vntol_abstol_mixed_criterion():
    """.options vntol/abstol: ngspice's per-unknown convergence floors.
    The result matches the scalar-criterion converged run to tight
    tolerance on a diode circuit."""
    import numpy as np

    from spicey_tpu import simulate

    base = """x
.model dm d(is=1e-14)
v1 in 0 PULSE(0 2 1u 1n 1n 5u 20u)
r1 in a 100
d1 a 0 dm
.tran 0.1u 10u
{opt}"""
    r_opt = simulate(base.format(
        opt=".options reltol=1e-6 vntol=1e-9 abstol=1e-15\n"),
        dialect="extended")
    r_ref = simulate(base.format(opt=".options reltol=1e-6\n"),
                     dialect="extended")
    np.testing.assert_allclose(
        np.asarray(r_opt.tran.node_voltages["a"]),
        np.asarray(r_ref.tran.node_voltages["a"]), rtol=1e-6, atol=1e-9)
    # loose floors also converge (fewer iterations, same trajectory shape)
    r_loose = simulate(base.format(opt=".options vntol=1m\n"),
                       dialect="extended")
    va = np.asarray(r_loose.tran.node_voltages["a"])
    assert 0.5 < va.max() < 1.0


def test_element_level_ic():
    """Extended ic= on C and L elements: a pre-charged cap discharges from
    its ic, a pre-fluxed inductor rings an LC tank from its current."""
    import numpy as np

    from spicey_tpu import simulate

    # RC discharge from ic=5 (no sources at all)
    r = simulate("""x
rdummy a 0 1k
c1 a 0 1u ic=5
.tran 0.05m 5m
""", dialect="extended")
    t = np.asarray(r.tran.times)
    va = np.asarray(r.tran.node_voltages["a"])
    # t=0 is the BE bootstrap solve with the companion at ic:
    # v0 = ic * (C/dt) / (C/dt + 1/R) = 5 * 20/21
    assert va[0] == pytest.approx(5.0 * (1e-6 / 5e-5)
                                  / (1e-6 / 5e-5 + 1e-3), rel=1e-9)
    # source-free BE decay is exactly geometric: each step multiplies by
    # 1/(1 + dt/RC) = 1/1.05
    k = np.arange(len(t))
    np.testing.assert_allclose(va, va[0] / 1.05 ** k, rtol=1e-9)

    # LC tank rung by an initial inductor current: amplitude = i0*sqrt(L/C)
    L, C, i0 = 1e-3, 1e-8, 2e-3
    r2 = simulate(f"""x
l1 a 0 {L} ic={i0}
c1 a 0 {C}
.tran 0.05u 60u
""", dialect="extended")
    t2 = np.asarray(r2.tran.times)
    va2 = np.asarray(r2.tran.node_voltages["a"])
    amp = i0 * np.sqrt(L / C)  # 0.632 V at 50.3 kHz (period ~19.9 us)
    assert np.abs(va2[t2 < 15e-6]).max() == pytest.approx(amp, rel=0.05)
    assert (np.diff(np.sign(va2)) != 0).sum() >= 4


@pytest.mark.parametrize("integration", ["be", "trap", "gear2"])
def test_ic_element_currents_kcl(integration):
    """Element-current recovery must honor the FRESH-run .ic companion
    state (regression: the recurrences started from zero, flipping the
    sign of i(L1) below and offsetting every step by the ic). KCL pins
    it: with only two elements on one node, i(L1) = -i(R1) exactly."""
    import numpy as np

    from spicey_tpu.analysis.tran import simulate_tran
    from spicey_tpu.parsing.netlist import parse_netlist

    ckt_l = parse_netlist(
        "* L discharging through R\n"
        "L1 1 0 1m ic=1\nR1 1 0 1k\n.tran 1u 10u\n", dialect="extended")
    r = simulate_tran(ckt_l, integration=integration)
    i_l = np.asarray(r.element_currents["L1"])
    i_r = np.asarray(r.element_currents["R1"])
    np.testing.assert_allclose(i_l, -i_r, rtol=1e-9, atol=1e-15)
    # decaying from ic=1 A: first recorded point is positive, not -0.5
    assert i_l[0] == pytest.approx(0.5, rel=1e-9)

    ckt_c = parse_netlist(
        "* C discharging through R\n"
        "C1 1 0 1u ic=5\nR1 1 0 1k\n.tran 0.1m 1m\n", dialect="extended")
    r2 = simulate_tran(ckt_c, integration=integration)
    i_c = np.asarray(r2.element_currents["C1"])
    i_r2 = np.asarray(r2.element_currents["R1"])
    np.testing.assert_allclose(i_c, -i_r2, rtol=1e-9, atol=1e-15)
