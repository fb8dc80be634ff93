"""K coupled-inductor tests (extended dialect).

The reference has no K element (parseNetlist.ts regex has no 'k'); this is
an extension. The companion model generalizes the scalar L stamp to the
matrix companion Gamma = c * M^{-1} with M = diag(L) + k*sqrt(L_a L_b)
off-diagonals (analysis/tran._mutual_inv, ops/stamps.stamp_mutual).
Validation is against direct analytic solutions of the coupled ODEs —
not a re-derivation of the engine's own algorithm.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.analysis.batch import simulate_ac_batch, simulate_tran_batch
from spicey_tpu.analysis.tran import simulate_tran

TRANSFORMER_AC = """* transformer
v1 in 0 dc 0 ac 1
r1 in p 10
l1 p 0 1
l2 s 0 4
k1 l1 l2 0.9
rload s 0 100
.ac lin 5 1k 5k
.end
"""


def _analytic_transformer(freqs, L1=1.0, L2=4.0, k=0.9, Rs=10.0, Rl=100.0):
    """Direct nodal solution of the coupled pair in complex arithmetic."""
    M = k * np.sqrt(L1 * L2)
    out = []
    for f in freqs:
        w = 2 * np.pi * f
        Z = 1j * w * np.array([[L1, M], [M, L2]])
        Y = np.linalg.inv(Z)
        A = np.array([[1 / Rs + Y[0, 0], Y[0, 1]],
                      [Y[1, 0], Y[1, 1] + 1 / Rl]], complex)
        out.append(np.linalg.solve(A, np.array([1 / Rs, 0], complex)))
    return np.array(out)  # (F, [p, s])


def test_ac_transformer_matches_analytic():
    r = simulate(TRANSFORMER_AC, dialect="extended")
    ref = _analytic_transformer(r.ac.freqs)
    np.testing.assert_allclose(r.ac.node_voltages["p"], ref[:, 0],
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(r.ac.node_voltages["s"], ref[:, 1],
                               rtol=1e-12, atol=1e-14)


def test_ac_element_currents_satisfy_kcl():
    r = simulate(TRANSFORMER_AC, dialect="extended")
    il2 = r.ac.element_currents["l2"]
    # the secondary inductor current must return through the load
    np.testing.assert_allclose(
        il2, -np.asarray(r.ac.node_voltages["s"]) / 100.0,
        rtol=1e-10, atol=1e-16)


TRANSFORMER_TRAN = """* transformer tran
v1 in 0 dc 0 ac 1 SIN(0 1 1k)
r1 in p 10
l1 p 0 1m
l2 s 0 4m
{K}rload s 0 100
.tran 2u 5m
.end
"""


def test_tran_transformer_steady_state_amplitude():
    """Settled sine amplitude on the secondary vs the phasor solution
    (trap and gear2 are 2nd order and must land within 0.1%; BE is 1st
    order at 500 steps/cycle -> ~0.5%)."""
    ckt = parse_netlist(TRANSFORMER_TRAN.format(K="k1 l1 l2 0.9\n"),
                        dialect="extended")
    ref = abs(_analytic_transformer(
        np.array([1e3]), L1=1e-3, L2=4e-3)[0, 1])
    for integration, rtol in (("be", 6e-3), ("trap", 1e-3), ("gear2", 1e-3)):
        r = simulate_tran(ckt, integration=integration)
        t = np.asarray(r.times)
        amp = np.abs(np.asarray(r.node_voltages["s"])[t > 4e-3]).max()
        assert abs(amp - ref) / ref < rtol, (integration, amp, ref)


def test_tran_k_zero_limit_equals_uncoupled():
    """k -> 0 reduces to the uncoupled scalar path. The residual coupling
    leaks O(k)-scale voltage onto the (otherwise dead) secondary, so the
    tolerance tracks k."""
    r0 = simulate(TRANSFORMER_TRAN.format(K="k1 l1 l2 1e-9\n"),
                  dialect="extended")
    rn = simulate(TRANSFORMER_TRAN.format(K=""), dialect="extended")
    for node in ("p", "s"):
        np.testing.assert_allclose(
            np.asarray(r0.tran.node_voltages[node]),
            np.asarray(rn.tran.node_voltages[node]), atol=5e-9)


def test_tran_element_currents_kcl():
    r = simulate(TRANSFORMER_TRAN.format(K="k1 l1 l2 0.9\n"),
                 dialect="extended")
    il2 = np.asarray(r.tran.element_currents["l2"])
    vs = np.asarray(r.tran.node_voltages["s"])
    np.testing.assert_allclose(il2, -vs / 100.0, atol=1e-12)


def test_perfect_coupling_is_flagged_singular():
    """k=1 makes M = [[L1, sqrt(L1 L2)], [., L2]] exactly singular; the
    engine must refuse (the batched analog of throw-on-singular)."""
    with pytest.raises(ValueError, match="[Ss]ingular"):
        simulate(TRANSFORMER_TRAN.format(K="k1 l1 l2 1\n"),
                 dialect="extended")


def test_batch_apis_support_coupling():
    net = TRANSFORMER_TRAN.format(K="k1 l1 l2 0.9\n")
    over = {"rload": np.array([100.0, 200.0])}
    rt = simulate_tran_batch(net, over, dialect="extended")
    assert rt.xs.shape[0] == 2 and bool(rt.valid.all())
    # variant 0 must equal the single-circuit run
    r1 = simulate(net, dialect="extended")
    np.testing.assert_allclose(
        rt.node_voltage("s")[0], np.asarray(r1.tran.node_voltages["s"]),
        atol=1e-9)

    ra = simulate_ac_batch(TRANSFORMER_AC, {"rload": np.array([100.0, 50.0])},
                           dialect="extended")
    assert bool(ra.valid.all())
    r2 = simulate(TRANSFORMER_AC, dialect="extended")
    s_col = [n.upper() for n in ra.node_names].index("S")
    np.testing.assert_allclose(ra.x[0, :, s_col],
                               r2.ac.node_voltages["s"], rtol=1e-10)


def test_parser_errors():
    base = "* t\nv1 a 0 1\nl1 a 0 1m\nr1 a 0 1k\n{K}.end\n"
    with pytest.raises(ValueError, match="Unknown inductor"):
        parse_netlist(base.format(K="k1 l1 lmissing 0.5\n"),
                      dialect="extended")
    with pytest.raises(ValueError, match="0 < |k| <= 1"):
        parse_netlist(base.format(K="k1 l1 l1 1.5\n"), dialect="extended")
    with pytest.raises(ValueError, match="twice"):
        parse_netlist(base.format(K="k1 l1 l1 0.5\n"), dialect="extended")
    # spicey dialect: K lines land in `skipped` (reference regex has no k).
    # A title line must come first or the K line becomes the title (the
    # reference's title heuristic).
    ckt = parse_netlist("the title\n" + base.format(K="k1 l1 l1 0.5\n"))
    assert any(line.startswith("k1") for line in ckt.skipped)


def test_subckt_coupling_scopes():
    """K inside a .subckt couples the instance's own inductors."""
    net = """* coupled sub
.subckt xfmr pin sout
l1 pin 0 1m
l2 sout 0 4m
k1 l1 l2 0.9
.ends
v1 in 0 dc 0 ac 1 SIN(0 1 1k)
r1 in p 10
x1 p s xfmr
rload s 0 100
.tran 2u 5m
.end
"""
    r = simulate(net, dialect="extended")
    flat = simulate(TRANSFORMER_TRAN.format(K="k1 l1 l2 0.9\n"),
                    dialect="extended")
    np.testing.assert_allclose(
        np.asarray(r.tran.node_voltages["s"]),
        np.asarray(flat.tran.node_voltages["s"]), atol=1e-12)


def test_three_winding_coupling():
    """Three pairwise-coupled windings solve and conserve energy flow
    (power delivered to both secondaries sums below source power)."""
    net = """* three winding
v1 in 0 dc 0 ac 1
r1 in p 10
l1 p 0 1m
l2 s1 0 1m
l3 s2 0 1m
k12 l1 l2 0.6
k13 l1 l3 0.6
k23 l2 l3 0.3
ra s1 0 50
rb s2 0 50
.ac lin 3 1k 3k
.end
"""
    r = simulate(net, dialect="extended")
    vs1 = np.abs(r.ac.node_voltages["s1"])
    vs2 = np.abs(r.ac.node_voltages["s2"])
    assert (vs1 > 1e-3).all() and (vs2 > 1e-3).all()
    # symmetric secondaries see identical magnitudes
    np.testing.assert_allclose(vs1, vs2, rtol=1e-10)


def test_mc_stats_support_coupling():
    """The fused on-device Monte-Carlo stats paths thread the coupling."""
    from spicey_tpu.analysis.mc import mc_ac_stats, mc_tran_stats

    B = 8
    rng = np.random.default_rng(0)
    over = {"rload": 100.0 * (0.9 + 0.2 * rng.random(B))}  # brackets 100
    st = mc_tran_stats(TRANSFORMER_TRAN.format(K="k1 l1 l2 0.9\n"), over,
                       node="s", dialect="extended")
    assert st.n_valid == B
    assert np.isfinite(st.mean).all()
    sa = mc_ac_stats(TRANSFORMER_AC, over, node="s", dialect="extended")
    assert sa.n_valid == B
    # the mean |V(s)| must bracket the nominal single-circuit response
    r = simulate(TRANSFORMER_AC, dialect="extended")
    nominal = np.abs(r.ac.node_voltages["s"])
    assert (sa.min <= nominal + 1e-9).all() and (sa.max >= nominal - 1e-9).all()


def test_sensitivity_through_coupling():
    """Autodiff sensitivity differentiates through M^{-1}: d|V(s)|/dRload
    matches finite differences."""
    from spicey_tpu.analysis.sensitivity import sensitivity_ac

    ckt = parse_netlist(TRANSFORMER_AC, dialect="extended")
    sens = sensitivity_ac(ckt, node="s", wrt=["rload"])
    eps = 1e-3
    hi = simulate(TRANSFORMER_AC.replace("rload s 0 100",
                                         f"rload s 0 {100 + eps}"),
                  dialect="extended")
    lo = simulate(TRANSFORMER_AC.replace("rload s 0 100",
                                         f"rload s 0 {100 - eps}"),
                  dialect="extended")
    fd = (np.abs(hi.ac.node_voltages["s"])
          - np.abs(lo.ac.node_voltages["s"])) / (2 * eps)
    np.testing.assert_allclose(sens["rload"], fd, rtol=1e-5, atol=1e-12)


def test_batched_k_override():
    """Overriding a K element name sweeps its coupling coefficient across
    the batch in both batch APIs."""
    ks = np.array([0.3, 0.9])
    rt = simulate_tran_batch(TRANSFORMER_TRAN.format(K="k1 l1 l2 0.9\n"),
                             {"k1": ks}, dialect="extended")
    assert bool(rt.valid.all())
    # stronger coupling -> larger secondary amplitude
    amp = np.abs(rt.node_voltage("s")).max(axis=1)
    assert amp[1] > 2 * amp[0]
    # variant 1 equals the single-circuit k=0.9 run
    r1 = simulate(TRANSFORMER_TRAN.format(K="k1 l1 l2 0.9\n"),
                  dialect="extended")
    np.testing.assert_allclose(
        rt.node_voltage("s")[1], np.asarray(r1.tran.node_voltages["s"]),
        atol=1e-9)

    ra = simulate_ac_batch(TRANSFORMER_AC, {"k1": ks}, dialect="extended")
    assert bool(ra.valid.all())
    s_col = [n.upper() for n in ra.node_names].index("S")
    r2 = simulate(TRANSFORMER_AC, dialect="extended")
    np.testing.assert_allclose(ra.x[1, :, s_col],
                               r2.ac.node_voltages["s"], rtol=1e-10)
    ref03 = _analytic_transformer(r2.ac.freqs, k=0.3)
    np.testing.assert_allclose(ra.x[0, :, s_col], ref03[:, 1], rtol=1e-10)
