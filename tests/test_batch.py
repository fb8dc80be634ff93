"""Batched Monte-Carlo API tests: batched-vs-single consistency (the key
invariant — one compiled batched call must reproduce N independent runs) and
sharded execution on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from spicey_tpu import parse_netlist, simulate_ac, simulate_tran
from spicey_tpu.analysis.batch import simulate_ac_batch, simulate_tran_batch
from spicey_tpu.parallel.mesh import make_mesh, sharder
from tests.fixtures import netlists

AC_NET = netlists.BASICS01_AC
TRAN_NET = netlists.RC_PULSE


def _edit_netlist(net, name, value):
    out = []
    for line in net.split("\n"):
        toks = line.split()
        if toks and toks[0].lower() == name.lower():
            toks[-1] = repr(float(value))
            line = " ".join(toks)
        out.append(line)
    return "\n".join(out)


def test_ac_batch_matches_single_runs():
    B = 5
    rng = np.random.default_rng(42)
    r_vals = 30.0 * (1 + 0.2 * rng.standard_normal(B))
    c_vals = 100e-6 * (1 + 0.1 * rng.standard_normal(B))
    res = simulate_ac_batch(AC_NET, {"r1": r_vals, "c1": c_vals})
    assert res.x.shape[0] == B
    assert bool(res.valid.all())
    for b in range(B):
        net_b = _edit_netlist(_edit_netlist(AC_NET, "r1", r_vals[b]),
                              "c1", c_vals[b])
        single = simulate_ac(parse_netlist(net_b))
        np.testing.assert_allclose(
            res.node_voltage("2")[b], single.node_voltages["2"],
            rtol=1e-9, atol=1e-12,
        )


def test_tran_batch_matches_single_runs():
    B = 4
    rng = np.random.default_rng(7)
    r_vals = 1e3 * (1 + 0.3 * rng.random(B))
    res = simulate_tran_batch(TRAN_NET, {"R1": r_vals})
    assert res.xs.shape[0] == B
    assert bool(res.valid.all())
    for b in range(B):
        net_b = _edit_netlist(TRAN_NET, "R1", r_vals[b])
        single = simulate_tran(parse_netlist(net_b))
        np.testing.assert_allclose(
            res.node_voltage("2")[b], single.node_voltages["2"],
            rtol=1e-9, atol=1e-12,
        )


def test_tran_batch_dc_override():
    B = 3
    net = "The t\nV1 1 0 DC 5\nR1 1 2 1k\nC1 2 0 1u\n.tran 10u 1m\n.end\n"
    dcs = np.array([1.0, 5.0, -2.0])
    res = simulate_tran_batch(net, {"V1": dcs})
    finals = res.node_voltage("2")[:, -1]
    # RC settles toward each DC value (~63% at 1*tau)
    np.testing.assert_allclose(finals, dcs * (1 - np.exp(-1)), rtol=1e-2)


def test_waveform_source_override_rejected():
    with pytest.raises(ValueError, match="waveform-driven"):
        simulate_tran_batch(TRAN_NET, {"V1": np.ones(2)})


def test_unknown_override_rejected():
    with pytest.raises(ValueError, match="unknown elements"):
        simulate_ac_batch(AC_NET, {"nope": np.ones(2)})


def test_inconsistent_batch_rejected():
    with pytest.raises(ValueError, match="inconsistent"):
        simulate_ac_batch(AC_NET, {"r1": np.ones(2), "c1": np.ones(3)})


def test_nonpositive_batched_r_rejected():
    with pytest.raises(ValueError, match="must be > 0"):
        simulate_ac_batch(AC_NET, {"r1": np.array([30.0, -1.0])})


def test_batched_singular_flags_not_raises():
    """Batched runs report validity per variant instead of throwing
    (SURVEY §7 hard part (d))."""
    net = "The t\nv1 1 0 ac 1\nv2 1 0 ac 2\nr1 1 0 1k\n.ac lin 2 1 10\n"
    res = simulate_ac_batch(net, {"r1": np.array([1e3, 2e3])})
    assert not res.valid.any()


def test_ac_batch_sharded_over_cpu_mesh():
    cpus = jax.devices("cpu")
    mesh = make_mesh({"batch": 8}, devices=cpus)
    B = 16
    rng = np.random.default_rng(0)
    r_vals = 30.0 * (1 + 0.1 * rng.random(B))
    res_sharded = simulate_ac_batch(
        AC_NET, {"r1": r_vals}, device_put=sharder(mesh)
    )
    res_local = simulate_ac_batch(AC_NET, {"r1": r_vals})
    np.testing.assert_allclose(
        res_sharded.x.view(np.float64), res_local.x.view(np.float64),
        rtol=1e-12, atol=1e-15,
    )


def test_ac_batch_2d_mesh_batch_by_freq():
    cpus = jax.devices("cpu")
    mesh = make_mesh({"batch": 4, "freq": 2}, devices=cpus)
    B = 8
    r_vals = np.linspace(10, 50, B)
    net = "The t\nv1 1 0 ac 1\nr1 1 2 30\nc1 2 0 100u\n.ac lin 16 1 100\n.end\n"
    res = simulate_ac_batch(net, {"r1": r_vals}, device_put=sharder(mesh))
    res_ref = simulate_ac_batch(net, {"r1": r_vals})
    np.testing.assert_allclose(
        res.x.view(np.float64), res_ref.x.view(np.float64),
        rtol=1e-12, atol=1e-15,
    )


def test_tran_batch_sharded_over_cpu_mesh():
    cpus = jax.devices("cpu")
    mesh = make_mesh({"batch": 8}, devices=cpus)
    B = 8
    r_vals = 1e3 * (1 + 0.2 * np.linspace(0, 1, B))
    res_sharded = simulate_tran_batch(
        TRAN_NET, {"R1": r_vals}, device_put=sharder(mesh)
    )
    res_local = simulate_tran_batch(TRAN_NET, {"R1": r_vals})
    np.testing.assert_allclose(
        res_sharded.xs, res_local.xs, rtol=1e-12, atol=1e-15
    )


def test_tran_batch_nonlinear_matches_single_runs(monkeypatch):
    """Batch-native scan (per-lane Newton/switch masking) must be bit-exact
    against independent single-circuit runs on the diode+switch converter.

    Bit-exactness is a same-program contract: disable the tiny-workload
    compile-latency variant (backend-opt 0 reorders fusions at rounding
    level) so the single runs execute the same fully-optimized core the
    batch engine builds on."""
    from spicey_tpu.parsing.netlist import parse_netlist

    monkeypatch.setenv("SPICEY_TPU_CPU_THRESHOLD", "0")
    B = 6
    rng = np.random.default_rng(9)
    r = 1e3 * (1 + 0.3 * rng.random(B))
    res = simulate_tran_batch(netlists.BOOST_CONVERTER, {"RR1": r})
    for k in (0, 3, 5):
        ckt = parse_netlist(netlists.BOOST_CONVERTER)
        for e in ckt.R:
            if e.name.upper() == "RR1":
                e.R = float(r[k])
        single = simulate_tran(ckt)
        np.testing.assert_array_equal(
            res.node_voltage("N3")[k], single.node_voltages["N3"]
        )


def test_ac_batch_pallas_interpret_close_to_gj():
    B = 8
    rng = np.random.default_rng(10)
    overrides = {"r1": 30.0 * (1 + 0.2 * rng.random(B))}
    ref = simulate_ac_batch(netlists.BASICS01_AC, overrides)
    pal = simulate_ac_batch(netlists.BASICS01_AC, overrides,
                            method="pallas", interpret=True)
    np.testing.assert_allclose(pal.x, ref.x, rtol=1e-9)


def test_tran_batch_time_parallel_full_trajectories():
    """simulate_tran_batch routes linear circuits in the parallel-in-time
    regime through the affine-map core (full trajectories, not just
    stats); results match the sequential scan bit-closely, including
    per-variant K-coupling overrides (the matrix companion rides the
    affine maps)."""
    from spicey_tpu.analysis.batch import simulate_tran_batch

    net = ("x rlc batch tp\nV1 in 0 PULSE(0 5 0 1n 1n 5u 10u)\n"
           "R1 in a 100\nL1 a b 1m\nC1 b 0 1u\nR2 b 0 2k\n"
           ".tran 0.2u 30u\n.end\n")
    B = 12
    rng = np.random.default_rng(0)
    over = {"R1": 100.0 * (1 + 0.2 * rng.random(B))}

    import spicey_tpu.analysis.mc as mc
    called = []
    orig = mc._tran_tp_full_core

    def spy(*a, **k):
        called.append(1)
        return orig(*a, **k)

    mc._tran_tp_full_core = spy
    try:
        tp = simulate_tran_batch(net, over)
    finally:
        mc._tran_tp_full_core = orig
    assert called, "linear long-horizon batch did not take the tp path"
    seq = simulate_tran_batch(net, over, time_parallel="never")
    assert tp.valid.all() and seq.valid.all()
    np.testing.assert_allclose(tp.xs, seq.xs, rtol=1e-9, atol=1e-12)

    xnet = ("x xfmr batch\nV1 in 0 PULSE(0 5 0 1n 1n 20u 40u)\n"
            "R1 in p 10\nL1 p 0 1m\nL2 s 0 4m\nK1 L1 L2 0.9\n"
            "RLOAD s 0 100\nC2 s 0 10n\n.tran 0.2u 60u\n.end\n")
    kover = {"K1": np.array([0.5, 0.7, 0.9, 0.95])}
    tpx = simulate_tran_batch(xnet, kover, dialect="extended")
    sqx = simulate_tran_batch(xnet, kover, dialect="extended",
                              time_parallel="never")
    np.testing.assert_allclose(tpx.xs, sqx.xs, rtol=1e-9, atol=1e-12)
