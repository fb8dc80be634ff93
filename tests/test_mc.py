"""Monte-Carlo on-device statistics tests: fused solve+reduce must agree with
host-side statistics over the raw batched solutions."""

import numpy as np
import pytest

from spicey_tpu.analysis.batch import simulate_ac_batch, simulate_tran_batch
from spicey_tpu.analysis.mc import mc_ac_stats, mc_tran_stats
from tests.fixtures import netlists


def test_mc_ac_stats_matches_raw_batch():
    B = 64
    rng = np.random.default_rng(3)
    overrides = {
        "r1": 30.0 * (1 + 0.2 * rng.random(B)),
        "c1": 100e-6 * (1 + 0.2 * rng.random(B)),
    }
    stats = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2")
    raw = simulate_ac_batch(netlists.BASICS01_AC, overrides)
    mag = np.abs(raw.node_voltage("2"))  # (B, F)
    np.testing.assert_allclose(stats.mean, mag.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(stats.std, mag.std(axis=0), rtol=1e-9, atol=1e-15)
    np.testing.assert_allclose(stats.min, mag.min(axis=0), rtol=1e-12)
    np.testing.assert_allclose(stats.max, mag.max(axis=0), rtol=1e-12)
    np.testing.assert_allclose(
        stats.quantiles[50.0], np.percentile(mag, 50, axis=0), rtol=1e-9
    )
    assert stats.n_valid == B and stats.n_total == B


def test_mc_ac_stats_analytic():
    B = 128
    rng = np.random.default_rng(0)
    r = 30.0 * (1 + 0.1 * rng.random(B))
    c = 100e-6 * (1 + 0.1 * rng.random(B))
    stats = mc_ac_stats(netlists.BASICS01_AC, {"r1": r, "c1": c}, node="2")
    w = 2 * np.pi * stats.grid
    h = np.abs(1.0 / (1.0 + 1j * w[None, :] * (r * c)[:, None]))
    np.testing.assert_allclose(stats.mean, h.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(stats.max, h.max(axis=0), rtol=1e-9)


def test_mc_tran_stats_matches_raw_batch():
    B = 16
    rng = np.random.default_rng(1)
    overrides = {"R1": 1e3 * (1 + 0.3 * rng.random(B))}
    stats = mc_tran_stats(netlists.RC_PULSE, overrides, node="2")
    raw = simulate_tran_batch(netlists.RC_PULSE, overrides)
    v = raw.node_voltage("2")  # (B, S+1)
    np.testing.assert_allclose(stats.mean, v.mean(axis=0), rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(stats.min, v.min(axis=0), rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(stats.max, v.max(axis=0), rtol=1e-12, atol=1e-15)
    assert stats.n_valid == B


def test_mc_ac_f32_pallas_tier_close_to_f64():
    """Fast tier (f32 assembly + batch-major Pallas kernel, interpret mode
    on CPU) must agree with the f64 tier to f32-appropriate accuracy."""
    B = 32
    rng = np.random.default_rng(5)
    overrides = {
        "r1": 30.0 * (1 + 0.2 * rng.random(B)),
        "c1": 100e-6 * (1 + 0.2 * rng.random(B)),
    }
    f64 = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2")
    f32 = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2",
                      precision="f32", method="pallas", interpret=True)
    np.testing.assert_allclose(f32.mean, f64.mean, rtol=2e-5)
    np.testing.assert_allclose(f32.max, f64.max, rtol=2e-5)
    np.testing.assert_allclose(f32.std, f64.std, rtol=5e-3, atol=1e-7)
    assert f32.n_valid == B


def test_mc_ac_pallas_f64_refined():
    B = 8
    rng = np.random.default_rng(6)
    overrides = {"r1": 30.0 * (1 + 0.1 * rng.random(B))}
    f64 = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2")
    pal = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2",
                      method="pallas", interpret=True)
    np.testing.assert_allclose(pal.mean, f64.mean, rtol=1e-10)


def test_mc_requires_analysis():
    with pytest.raises(ValueError, match="no .ac analysis"):
        mc_ac_stats(netlists.RC_PULSE, {"R1": np.ones(2)}, node="2")
    with pytest.raises(ValueError, match="no .tran analysis"):
        mc_tran_stats(netlists.BASICS01_AC, {"r1": np.ones(2)}, node="2")


def test_mc_tran_f32_tier_close_to_f64():
    """f32 transient scan tier must track the f64 tier to single-precision
    accuracy on the RC pulse fixture."""
    B = 32
    rng = np.random.default_rng(7)
    overrides = {"R1": 1e3 * (1 + 0.2 * rng.random(B))}
    f64 = mc_tran_stats(netlists.RC_PULSE, overrides, node="2")
    f32 = mc_tran_stats(netlists.RC_PULSE, overrides, node="2",
                        precision="f32")
    scale = np.max(np.abs(f64.mean))
    assert np.max(np.abs(f32.mean - f64.mean)) < 1e-5 * scale
    assert np.max(np.abs(f32.max - f64.max)) < 1e-5 * scale
    assert f32.n_valid == B


def test_mc_tran_pallas_tier_interpret():
    """Batch-major Pallas kernel inside the transient scan (interpret mode
    on CPU): f32 tier vs the f64 gj reference path."""
    B = 16
    rng = np.random.default_rng(8)
    overrides = {"R1": 1e3 * (1 + 0.2 * rng.random(B))}
    f64 = mc_tran_stats(netlists.RC_PULSE, overrides, node="2")
    pal = mc_tran_stats(netlists.RC_PULSE, overrides, node="2",
                        precision="f32", method="pallas", interpret=True)
    scale = np.max(np.abs(f64.mean))
    assert np.max(np.abs(pal.mean - f64.mean)) < 1e-5 * scale
    assert pal.n_valid == B


def test_mc_ac_chunked_matches_unchunked():
    """chunk= bounds device memory via lax.map over batch blocks; results
    (incl. pad-lane exclusion when B % chunk != 0) must be identical."""
    B = 37  # deliberately not a multiple of the chunk size
    rng = np.random.default_rng(11)
    overrides = {
        "r1": 30.0 * (1 + 0.2 * rng.random(B)),
        "c1": 100e-6 * (1 + 0.2 * rng.random(B)),
    }
    a = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2")
    b = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2", chunk=8)
    np.testing.assert_allclose(b.mean, a.mean, rtol=1e-13)
    np.testing.assert_allclose(b.std, a.std, rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(b.min, a.min, rtol=1e-13)
    np.testing.assert_allclose(b.max, a.max, rtol=1e-13)
    np.testing.assert_allclose(b.quantiles[50.0], a.quantiles[50.0],
                               rtol=1e-10)
    assert b.n_valid == B and b.n_total == B


def test_mc_ac_larger_circuit_ladder():
    """20-stage RC ladder (Nvar=22): larger dense systems through the full
    MC pipeline."""
    rng = np.random.default_rng(12)
    lines = ["a 20-stage rc ladder", "v1 n0 0 dc 0 ac 1"]
    for i in range(20):
        lines.append(f"r{i} n{i} n{i+1} 100")
        lines.append(f"c{i} n{i+1} 0 1u")
    lines.append(".ac dec 5 1 1k")
    from spicey_tpu import parse_netlist

    lad = parse_netlist("\n".join(lines))
    B = 16
    st = mc_ac_stats(lad, {"r0": 100 * (1 + 0.1 * rng.random(B))},
                     node="n20", chunk=8)
    assert st.n_valid == B
    # low-frequency limit: near-unity transfer through the ladder
    np.testing.assert_allclose(st.mean[0], 1.0, rtol=1e-2)


def test_mc_stats_sharded_over_cpu_mesh():
    """The fused solve+reduction runs SPMD when the variants axis is
    sharded; results must equal the single-device run exactly."""
    import jax

    from spicey_tpu.parallel.mesh import make_mesh, sharder

    mesh = make_mesh({"batch": 8}, devices=jax.devices("cpu"))
    B = 32
    rng = np.random.default_rng(13)
    overrides = {"r1": 30.0 * (1 + 0.2 * rng.random(B))}
    a = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2")
    b = mc_ac_stats(netlists.BASICS01_AC, overrides, node="2",
                    device_put=sharder(mesh))
    np.testing.assert_allclose(b.mean, a.mean, rtol=1e-13)
    np.testing.assert_allclose(b.quantiles[95.0], a.quantiles[95.0],
                               rtol=1e-10)
    ovt = {"R1": 1e3 * (1 + 0.2 * rng.random(B))}
    at = mc_tran_stats(netlists.RC_PULSE, ovt, node="2")
    bt = mc_tran_stats(netlists.RC_PULSE, ovt, node="2",
                       device_put=sharder(mesh))
    np.testing.assert_allclose(bt.mean, at.mean, rtol=1e-13)
    assert bt.n_valid == B


def test_mc_ac_sampled_matches_host_draws():
    """On-device sampled MC must equal host-side stats computed from the
    identical PRNG draws."""
    import jax

    from spicey_tpu.analysis.mc import mc_ac_sampled

    B = 512
    st = mc_ac_sampled(netlists.BASICS01_AC, {"r1": 0.1, "c1": 0.1}, B, "2",
                       key=3)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (B, 2)))
    rv = 30.0 * np.exp(0.1 * z[:, 0])
    cv = 100e-6 * np.exp(0.1 * z[:, 1])
    ref = mc_ac_stats(netlists.BASICS01_AC, {"r1": rv, "c1": cv}, node="2")
    np.testing.assert_allclose(st.mean, ref.mean, rtol=1e-12)
    np.testing.assert_allclose(st.quantiles[95.0], ref.quantiles[95.0],
                               rtol=1e-10)
    assert st.n_valid == B and st.n_total == B
    # chunked path identical too (non-multiple B exercises pad masking)
    st_c = mc_ac_sampled(netlists.BASICS01_AC, {"r1": 0.1, "c1": 0.1}, B,
                         "2", key=3, chunk=100)
    np.testing.assert_allclose(st_c.mean, st.mean, rtol=1e-13)
    assert st_c.n_valid == B


def test_mc_ac_sampled_unknown_element_raises():
    from spicey_tpu.analysis.mc import mc_ac_sampled

    with pytest.raises(ValueError, match="unknown sampled element"):
        mc_ac_sampled(netlists.BASICS01_AC, {"nope": 0.1}, 8, "2")


def test_mc_tran_sampled_matches_host_draw_stats():
    """mc_tran_sampled (on-device draws + batch-native scan) must agree
    with mc_tran_stats fed the SAME draws from the host side."""
    import jax
    import jax.numpy as jnp

    from spicey_tpu.analysis.mc import (_sampled_values, mc_tran_sampled,
                                        mc_tran_stats)
    from spicey_tpu import build_tensors, parse_netlist

    net = ("x sampled tran\n"
           "V1 1 0 PULSE(0 5 0 1n 1n 5u 10u)\n"
           "R1 1 2 1k\n"
           "C1 2 0 1u\n"
           ".tran 0.2u 20u\n"
           ".end\n")
    B = 64
    st = mc_tran_sampled(net, {"R1": 0.1, "C1": 0.1}, B, "2", key=3)
    assert st.n_valid == B

    ckt = parse_netlist(net)
    t = build_tensors(ckt)
    vals = _sampled_values(t, {"R1": 0.1, "C1": 0.1}, B, 3, "lognormal")
    ref = mc_tran_stats(net, {"R1": np.asarray(vals["r"][:, 0]),
                              "C1": np.asarray(vals["c"][:, 0])}, "2")
    np.testing.assert_allclose(st.mean, ref.mean, rtol=1e-9)
    np.testing.assert_allclose(st.max, ref.max, rtol=1e-9)


def test_mc_tran_sampled_chunked_matches_unchunked():
    net = ("x sampled tran chunk\n"
           "V1 1 0 PULSE(0 5 0 1n 1n 5u 10u)\n"
           "R1 1 2 1k\n"
           "C1 2 0 1u\n"
           ".tran 0.2u 20u\n"
           ".end\n")
    from spicey_tpu.analysis.mc import mc_tran_sampled

    full = mc_tran_sampled(net, {"R1": 0.1}, 60, "2", key=5)
    chk = mc_tran_sampled(net, {"R1": 0.1}, 60, "2", key=5, chunk=16)
    assert chk.n_valid == 60
    np.testing.assert_allclose(chk.mean, full.mean, rtol=1e-12)
    np.testing.assert_allclose(chk.std, full.std, rtol=1e-9, atol=1e-15)


def test_mc_ac_batchlast_stamps_all_controlled_sources():
    """The lane-major (batch-last) f32 assembly re-implements every stamp
    pattern; drive G/E/F/H/I elements through it and require agreement
    with the general-path f64 tier."""
    from spicey_tpu.analysis.mc import mc_ac_stats

    net = ("x controlled-source zoo\n"
           "v1 in 0 dc 0 ac 1\n"
           "r1 in a 1k\n"
           "c1 a 0 100n\n"
           "g1 a 0 in 0 0.5m\n"          # VCCS load
           "e1 b 0 a 0 2\n"              # VCVS x2 buffer
           "rb b c 2k\n"
           "f1 0 c v1 0.1\n"             # CCCS from v1's branch
           "h1 d 0 v1 100\n"             # CCVS sense
           "rd d 0 1k\n"
           "i1 0 a ac 1m\n"              # independent AC current source
           ".ac dec 5 10 10k\n"
           ".end\n")
    B = 24
    rng = np.random.default_rng(11)
    over = {"r1": 1e3 * (1 + 0.2 * rng.random(B)),
            "g1": 0.5e-3 * (1 + 0.2 * rng.random(B)),
            "e1": 2.0 * (1 + 0.1 * rng.random(B)),
            "f1": 0.1 * (1 + 0.1 * rng.random(B)),
            "h1": 100.0 * (1 + 0.1 * rng.random(B))}
    for node in ("a", "b", "c", "d"):
        fast = mc_ac_stats(net, over, node=node, dialect="extended",
                           precision="f32", method="pallas",
                           interpret=True)
        ref = mc_ac_stats(net, over, node=node, dialect="extended")
        assert fast.n_valid == B
        np.testing.assert_allclose(fast.mean, ref.mean, rtol=2e-4)
        np.testing.assert_allclose(fast.max, ref.max, rtol=2e-4)


def test_mc_ac_sampled_with_tline():
    """Regression (round-3 review): mc_ac_sampled on a T-line circuit must
    tile z0/td to (B, nT) for the vmapped tl axes, chunked or not."""
    from spicey_tpu.analysis.mc import mc_ac_sampled

    net = ("x matched line sampled\n"
           "v1 in 0 dc 0 ac 1\n"
           "rs in a 50\n"
           "t1 a 0 b 0 z0=50 td=5n\n"
           "rl b 0 50\n"
           ".ac lin 10 1meg 100meg\n"
           ".end\n")
    st = mc_ac_sampled(net, {"rs": 0.05}, 8, "b", dialect="extended")
    assert st.n_valid == 8
    np.testing.assert_allclose(st.mean, 0.5, rtol=0.1)  # ~matched
    st_c = mc_ac_sampled(net, {"rs": 0.05}, 8, "b", dialect="extended",
                         chunk=4)
    np.testing.assert_allclose(st_c.mean, st.mean, rtol=1e-12)


def test_approx_quantiles_close_to_exact():
    """quantile_method='approx' (CDF bisection) must track the exact sort
    to within the local order-statistic spacing."""
    from spicey_tpu.analysis.mc import mc_ac_stats

    B = 4000
    rng = np.random.default_rng(2)
    over = {"r1": 30.0 * (1 + 0.2 * rng.random(B)),
            "c1": 100e-6 * (1 + 0.2 * rng.random(B))}
    net = ("x q\nv1 1 0 dc 0 ac 1\nr1 1 2 30\nc1 2 0 100u\n"
           ".ac dec 10 1 100\n.end\n")
    exact = mc_ac_stats(net, over, node="2")
    hist = mc_ac_stats(net, over, node="2", quantile_method="approx")
    assert hist.n_valid == B
    for q in (5.0, 50.0, 95.0):
        # bisection converges to an order-statistic boundary; the exact
        # path linearly interpolates between adjacent order statistics,
        # so the difference is bounded by the local spacing of the B
        # order statistics — allow a few times the MEAN spacing, which
        # covers the sparser tails for this smooth distribution
        tol = 5.0 * (exact.max - exact.min) / B + 1e-12
        assert np.all(np.abs(hist.quantiles[q] - exact.quantiles[q]) <= tol)


def test_time_parallel_matches_sequential_scan():
    """The parallel-in-time affine-map core must reproduce the sequential
    BE scan bit-closely on a linear RLC Monte-Carlo (same recurrence,
    different association order)."""
    from spicey_tpu.analysis.mc import mc_tran_stats

    net = ("x rlc mc\n"
           "V1 in 0 PULSE(0 5 0 1n 1n 5u 10u)\n"
           "R1 in a 100\n"
           "L1 a b 1m\n"
           "C1 b 0 1u\n"
           "R2 b 0 2k\n"
           "g1 0 b in 0 0.1m\n"
           ".tran 0.2u 30u\n"
           ".end\n")
    B = 48
    rng = np.random.default_rng(9)
    over = {"R1": 100.0 * (1 + 0.2 * rng.random(B)),
            "C1": 1e-6 * (1 + 0.2 * rng.random(B))}
    tp = mc_tran_stats(net, over, node="b", dialect="extended")
    seq = mc_tran_stats(net, over, node="b", dialect="extended",
                        time_parallel="never")
    assert tp.n_valid == B
    np.testing.assert_allclose(tp.mean, seq.mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(tp.max, seq.max, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(tp.std, seq.std, rtol=1e-7, atol=1e-12)

    # f32 pallas tier (inverse kernel) agrees at f32 level
    tp32 = mc_tran_stats(net, over, node="b", dialect="extended",
                         precision="f32", method="pallas", interpret=True)
    scale = float(np.max(np.abs(seq.mean)))
    np.testing.assert_allclose(tp32.mean, seq.mean, rtol=2e-3,
                               atol=2e-4 * scale)


def test_time_parallel_dc_source_override():
    """DC overrides on waveform-less sources batch the source grid; the
    time-parallel path consumes the batched (S+1, B, m) grid directly."""
    from spicey_tpu.analysis.mc import mc_tran_stats

    net = ("x rc dc sweep\nV1 in 0 DC 5\nR1 in a 1k\nC1 a 0 1u\n"
           ".tran 0.5u 20u\n.end\n")
    vs = np.array([1.0, 2.0, 4.0, 8.0])
    tp = mc_tran_stats(net, {"V1": vs}, node="a")
    seq = mc_tran_stats(net, {"V1": vs}, node="a", time_parallel="never")
    np.testing.assert_allclose(tp.mean, seq.mean, rtol=1e-9)
    np.testing.assert_allclose(tp.max, seq.max, rtol=1e-9)
    # physics (BE discretization, incl. the reference's step-0 bootstrap
    # solve): after S+1 = 41 applications of v' = (v + h*V)/(1+h) with
    # h = dt/tau = 5e-4, v = V*(1 - (1+h)^-(S+1))
    expect = 8.0 * (1 - (1 + 0.5e-6 / 1e-3) ** -41)
    assert tp.max[-1] == pytest.approx(expect, rel=1e-9)


def test_time_parallel_regime_guard():
    """worthwhile() must reject both the throughput-saturated regime
    (short S, huge B) and memory-infeasible long-horizon runs."""
    from types import SimpleNamespace

    from spicey_tpu.analysis.timeparallel import worthwhile

    small = SimpleNamespace(n_c=1, n_l=1)
    # long horizon, modest batch: the measured-win regime
    assert worthwhile(small, steps=100_000, B=16, itemsize=8)
    # short horizon, huge batch: sequential scan already saturates
    assert not worthwhile(small, steps=200, B=10_000, itemsize=8)
    # admissible flops regime but the composed maps would blow memory
    many_reactive = SimpleNamespace(n_c=4, n_l=1)
    assert not worthwhile(many_reactive, steps=5_000, B=100_000,
                          itemsize=8)


def test_time_parallel_regime_guard_tunable(monkeypatch):
    """The crossover factor and memory budget are per-hardware knobs:
    explicit kwargs and env vars must both override the v5e defaults."""
    from types import SimpleNamespace

    from spicey_tpu.analysis import timeparallel as tp

    small = SimpleNamespace(n_c=1, n_l=1)
    # default crossover rejects short-S/huge-B ...
    assert not tp.worthwhile(small, steps=200, B=10_000, itemsize=8)
    # ... a larger explicit crossover admits it
    assert tp.worthwhile(small, steps=200, B=10_000, itemsize=8,
                         crossover=2000.0)
    # memory-infeasible by default, admitted under an explicit huge budget
    many = SimpleNamespace(n_c=4, n_l=1)
    assert not tp.worthwhile(many, steps=5_000, B=100_000, itemsize=8)
    assert tp.worthwhile(many, steps=5_000, B=100_000, itemsize=8,
                         mem_budget_bytes=1e15)
    # env-var overrides feed the defaults
    monkeypatch.setenv("SPICEY_TPU_TP_CROSSOVER", "2000")
    monkeypatch.setenv("SPICEY_TPU_TP_MEM_BUDGET", "1e15")
    assert tp.default_crossover() == 2000.0
    assert tp.default_mem_budget() == 1e15
    assert tp.worthwhile(small, steps=200, B=10_000, itemsize=8)
    assert tp.worthwhile(many, steps=5_000, B=100_000, itemsize=8)


def test_time_parallel_large_n_avoids_inverse_kernel(monkeypatch):
    """nvar > _INV_KERNEL_MAX_N must NOT dispatch the Pallas inverse kernel
    (its VMEM blocks don't fit at large N — on hardware that is a Mosaic
    compile error); the tp core takes the vmapped gj inverse instead."""
    import spicey_tpu.ops.pallas_gj as pg
    from spicey_tpu.analysis.mc import mc_tran_stats

    stages = pg._INV_KERNEL_MAX_N + 6  # nvar = stages + 2 > max N
    lines = ["x big ladder", "V1 n0 0 PULSE(0 5 0 1n 1n 5u 10u)"]
    for i in range(stages):
        lines.append(f"R{i} n{i} n{i+1} 100")
        lines.append(f"C{i} n{i+1} 0 1n")
    lines += [".tran 0.5u 5u", ".end"]
    net = "\n".join(lines) + "\n"

    def boom(*a, **k):
        raise AssertionError("inverse kernel dispatched at large N")

    monkeypatch.setattr(pg, "_inverse_real_f32", boom)
    B = 4
    rng = np.random.default_rng(2)
    over = {"R0": 100.0 * (1 + 0.1 * rng.random(B))}
    tp = mc_tran_stats(net, over, node="n1", precision="f32",
                       method="pallas", interpret=True)
    seq = mc_tran_stats(net, over, node="n1", time_parallel="never")
    assert tp.n_valid == B
    scale = float(np.max(np.abs(seq.mean))) + 1e-30
    np.testing.assert_allclose(tp.mean, seq.mean, rtol=5e-3,
                               atol=5e-4 * scale)


def test_mc_tran_chunked_rejects_batched_closures():
    """The chunked mc_tran tier closes over ext/nl/tl/vs_grid whole; a
    batched source grid with chunk set must fail with a clear error, not
    an opaque shape mismatch inside the scan."""
    import jax.numpy as jnp

    from spicey_tpu.analysis.mc import _mc_tran_stats_core
    from spicey_tpu.ir.circuit import (bsrc_static, build_tensors,
                                       dchg_arrays, effective_time_step,
                                       ext_arrays, lk_arrays, nl_arrays,
                                       qchg_arrays, sample_source_values)
    from spicey_tpu.parsing.netlist import parse_netlist

    ckt = parse_netlist(netlists.RC_PULSE)
    t = build_tensors(ckt)
    dt, steps = effective_time_step(ckt.tran.dt, ckt.tran.tstop)
    times = np.arange(steps + 1) * dt
    vs = sample_source_values(ckt, times)
    B = 8
    vs_batched = jnp.broadcast_to(
        jnp.asarray(vs)[:, None, :], (vs.shape[0], B, vs.shape[1]))
    ext = ext_arrays(t)
    nl = nl_arrays(t)
    rv = jnp.broadcast_to(jnp.asarray(t.r_vals), (B,) + t.r_vals.shape)
    cv = jnp.broadcast_to(jnp.asarray(t.c_vals), (B,) + t.c_vals.shape)
    lv = jnp.broadcast_to(jnp.asarray(t.l_vals), (B,) + t.l_vals.shape)
    with pytest.raises(ValueError, match="unbatched"):
        _mc_tran_stats_core(
            vs_batched, jnp.asarray(dt),
            jnp.asarray(t.r_idx), rv, jnp.asarray(t.c_idx), cv,
            jnp.asarray(t.l_idx), lv, jnp.asarray(t.v_idx),
            jnp.asarray(t.s_idx), jnp.asarray(t.s_ron),
            jnp.asarray(t.s_roff), jnp.asarray(t.s_von),
            jnp.asarray(t.s_voff), jnp.asarray(t.d_idx),
            jnp.asarray(t.d_is), jnp.asarray(t.d_n), ext, nl,
            nvar=t.nvar, node_idx=0, method="gj", qs=(), nr="spicey",
            lk=lk_arrays(t), bsrc=bsrc_static(ckt, t.nvar), tl=None,
            hist_len=0, dchg=dchg_arrays(t), qchg=qchg_arrays(t),
            chunk=4,
        )


_RLC_TP_NET = ("x rlc tp\n"
               "V1 in 0 PULSE(0 5 0 1n 1n 5u 10u)\n"
               "R1 in a 100\n"
               "L1 a b 1m\n"
               "C1 b 0 1u\n"
               "R2 b 0 2k\n"
               ".tran 0.2u 30u\n"
               ".end\n")

_XFMR_TP_NET = ("x transformer tp\n"
                "V1 in 0 PULSE(0 5 0 1n 1n 20u 40u)\n"
                "R1 in p 10\n"
                "L1 p 0 1m\n"
                "L2 s 0 4m\n"
                "K1 L1 L2 0.9\n"
                "RLOAD s 0 100\n"
                "C2 s 0 10n\n"
                ".tran 0.2u 60u\n"
                ".end\n")


def test_time_parallel_trap_matches_sequential():
    """Trapezoidal integration through the parallel-in-time core: the
    doubled companion state [v_C | i_C | i_L | v_L] plus the BE bootstrap
    step must reproduce the sequential trap scan (same recurrence,
    different association order)."""
    from spicey_tpu.analysis.mc import mc_tran_stats

    B = 24
    rng = np.random.default_rng(11)
    over = {"R1": 100.0 * (1 + 0.2 * rng.random(B)),
            "C1": 1e-6 * (1 + 0.2 * rng.random(B))}
    tp = mc_tran_stats(_RLC_TP_NET, over, node="b", integration="trap")
    seq = mc_tran_stats(_RLC_TP_NET, over, node="b", integration="trap",
                        time_parallel="never")
    assert tp.n_valid == B
    np.testing.assert_allclose(tp.mean, seq.mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(tp.max, seq.max, rtol=1e-9, atol=1e-12)
    # trap is genuinely 2nd-order: it must differ from BE on this
    # underdamped RLC (guards against both paths silently running BE)
    be = mc_tran_stats(_RLC_TP_NET, over, node="b")
    assert np.max(np.abs(np.asarray(tp.mean) - np.asarray(be.mean))) > 1e-4


def test_time_parallel_k_coupling_matches_sequential():
    """K-coupled inductors are linear: the affine-map core carries the
    matrix companion Gamma = dt * M^{-1} and must match the sequential
    engine on a transformer transient, for BE and trap alike."""
    from spicey_tpu.analysis.mc import mc_tran_stats

    B = 16
    rng = np.random.default_rng(12)
    over = {"RLOAD": 100.0 * (1 + 0.2 * rng.random(B))}
    for integ in ("be", "trap"):
        tp = mc_tran_stats(_XFMR_TP_NET, over, node="s",
                           dialect="extended", integration=integ)
        seq = mc_tran_stats(_XFMR_TP_NET, over, node="s",
                            dialect="extended", integration=integ,
                            time_parallel="never")
        assert tp.n_valid == B, integ
        scale = float(np.max(np.abs(np.asarray(seq.mean)))) + 1e-30
        np.testing.assert_allclose(tp.mean, seq.mean, rtol=1e-9,
                                   atol=1e-11 * scale, err_msg=integ)
        np.testing.assert_allclose(tp.max, seq.max, rtol=1e-9,
                                   atol=1e-11 * scale, err_msg=integ)


def test_time_parallel_sharded_over_cpu_mesh():
    """The parallel-in-time core is SPMD over the variants axis: sharding
    it over a mesh must reproduce the single-device run (the associative
    scan and the batched matmuls are batch-parallel throughout)."""
    import jax

    from spicey_tpu.analysis.mc import mc_tran_stats
    from spicey_tpu.analysis.timeparallel import eligible, worthwhile
    from spicey_tpu.ir.circuit import build_tensors, effective_time_step
    from spicey_tpu.parallel.mesh import make_mesh, sharder
    from spicey_tpu.parsing.netlist import parse_netlist

    # regime sanity: this workload must actually take the tp path
    ckt = parse_netlist(_RLC_TP_NET)
    t = build_tensors(ckt)
    _, steps = effective_time_step(ckt.tran.dt, ckt.tran.tstop)
    B = 32
    assert eligible(t, ckt, "spicey", "be")
    assert worthwhile(t, steps, B, 8)

    mesh = make_mesh({"batch": 8}, devices=jax.devices("cpu"))
    rng = np.random.default_rng(13)
    over = {"R1": 100.0 * (1 + 0.2 * rng.random(B)),
            "C1": 1e-6 * (1 + 0.2 * rng.random(B))}
    a = mc_tran_stats(_RLC_TP_NET, over, node="b")
    b = mc_tran_stats(_RLC_TP_NET, over, node="b",
                      device_put=sharder(mesh))
    assert b.n_valid == B
    np.testing.assert_allclose(b.mean, a.mean, rtol=1e-12)
    np.testing.assert_allclose(b.quantiles[95.0], a.quantiles[95.0],
                               rtol=1e-10)
    # approx-quantile CDF bisection sharded: pure count-reductions, SPMD
    c = mc_tran_stats(_RLC_TP_NET, over, node="b",
                      device_put=sharder(mesh), quantile_method="approx")
    tol = 5.0 * float(np.max(a.max - a.min)) / B + 1e-12
    assert np.max(np.abs(np.asarray(c.quantiles[50.0])
                         - np.asarray(a.quantiles[50.0]))) <= tol


def test_time_parallel_trap_worthwhile_doubles_state():
    """worthwhile() must budget trap's doubled companion state."""
    from types import SimpleNamespace

    from spicey_tpu.analysis.timeparallel import worthwhile

    t = SimpleNamespace(n_c=2, n_l=2)
    # sized between BE's padded map area (k=4 -> k_pad=8: ~307 MB) and
    # trap's doubled-state one (k=8: ~553 MB)
    budget = 4.0e8
    assert worthwhile(t, 5000, 64, 8, mem_budget_bytes=budget)
    assert not worthwhile(t, 5000, 64, 8, mem_budget_bytes=budget,
                          integration="trap")
