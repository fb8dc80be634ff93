"""Structured bordered-block-diagonal (Schur) solver tier tests.

Covers ops/schur.py three ways: (i) the device solvers against dense
LAPACK on synthetic permuted-BBD systems, (ii) the connectivity-based
partition planner on flattened `.subckt` circuits (including the
structurally-singular-branch promotion), and (iii) end to end — a
64-instance subcircuit ladder's AC sweep through method="schur" matching
the dense path at 1e-9 (VERDICT r4 #1's fixture bar).
"""

import numpy as np
import pytest

import spicey_tpu as st
from spicey_tpu.ir.circuit import build_tensors
from spicey_tpu.ops.schur import (SchurPlan, plan_partition, schur_solve,
                                  schur_solve_planes)

import jax.numpy as jnp


def _synthetic_bbd(rng, sizes, n_i, complex_=False):
    """Random permuted BBD system + its plan arrays."""
    nvar = sum(sizes) + n_i
    perm = rng.permutation(nvar)
    pos = 0
    blocks = []
    for s in sizes:
        blocks.append(np.sort(perm[pos:pos + s]))
        pos += s
    if_ix = np.sort(perm[pos:]).astype(np.int32)

    def one_plane(border_scale):
        A = np.zeros((nvar, nvar))
        for s, ix in zip(sizes, blocks):
            A[np.ix_(ix, ix)] += rng.normal(size=(s, s)) + 3 * np.eye(s)
            A[np.ix_(ix, if_ix)] += rng.normal(size=(s, n_i)) * border_scale
            A[np.ix_(if_ix, ix)] += rng.normal(size=(n_i, s)) * border_scale
        A[np.ix_(if_ix, if_ix)] += (rng.normal(size=(n_i, n_i))
                                    + 3 * np.eye(n_i))
        return A

    A = one_plane(0.3)
    Ai = one_plane(0.2) - 3 * np.eye(nvar) if complex_ else None
    b = rng.normal(size=nvar)
    bi = rng.normal(size=nvar) if complex_ else None

    n_max = max(sizes)
    blk_ix = np.zeros((len(sizes), n_max), np.int32)
    blk_mask = np.zeros((len(sizes), n_max), bool)
    for k, ix in enumerate(blocks):
        blk_ix[k, :len(ix)] = ix
        blk_mask[k, :len(ix)] = True
    return A, Ai, b, bi, blk_ix, blk_mask, if_ix


def test_schur_solve_real_matches_dense():
    rng = np.random.default_rng(7)
    A, _, b, _, blk_ix, blk_mask, if_ix = _synthetic_bbd(
        rng, [9, 7, 5, 9, 3, 8], 13)
    x, valid = schur_solve(jnp.asarray(A), jnp.asarray(b),
                           jnp.asarray(blk_ix), jnp.asarray(blk_mask),
                           jnp.asarray(if_ix))
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=0, atol=1e-10)


def test_schur_solve_planes_matches_dense():
    rng = np.random.default_rng(8)
    A, Ai, b, bi, blk_ix, blk_mask, if_ix = _synthetic_bbd(
        rng, [6, 6, 6, 6], 9, complex_=True)
    xr, xi, valid = schur_solve_planes(
        jnp.asarray(A), jnp.asarray(Ai), jnp.asarray(b), jnp.asarray(bi),
        jnp.asarray(blk_ix), jnp.asarray(blk_mask), jnp.asarray(if_ix))
    assert bool(valid)
    xc = np.linalg.solve(A + 1j * Ai, b + 1j * bi)
    np.testing.assert_allclose(np.asarray(xr) + 1j * np.asarray(xi), xc,
                               rtol=0, atol=1e-10)


def test_schur_solve_flags_singular_block():
    """A structurally-zero block row must flag invalid, not mis-solve."""
    rng = np.random.default_rng(9)
    A, _, b, _, blk_ix, blk_mask, if_ix = _synthetic_bbd(rng, [5, 5], 4)
    u = int(blk_ix[0, 2])
    A[u, :] = 0.0
    A[:, u] = 0.0
    x, valid = schur_solve(jnp.asarray(A), jnp.asarray(b),
                           jnp.asarray(blk_ix), jnp.asarray(blk_mask),
                           jnp.asarray(if_ix))
    assert not bool(valid)


# ---------------------------------------------------------------------------
# Planner on real flattened circuits
# ---------------------------------------------------------------------------


def _ladder_netlist(n_stages: int, inner: int = 4,
                    analysis: str = ".ac dec 5 1 1e6",
                    source: str = "vsrc in 0 dc 1 ac 1",
                    stage_extra: tuple = ()) -> str:
    """RC low-pass chain of identical subckt stages with VCVS buffers.

    Each stage has ``inner`` internal nodes (an RC chain) plus a unity
    VCVS output buffer — one branch unknown per stage that couples
    interior to interface, exercising the border logic. ``stage_extra``
    lines (e.g. a clamp diode) are appended inside the stage body.
    """
    body = [source, analysis]
    sub = [".subckt stage a y"]
    prev = "a"
    for i in range(1, inner + 1):
        sub.append(f"r{i} {prev} m{i} 1k")
        sub.append(f"c{i} m{i} 0 1n")
        prev = f"m{i}"
    sub.extend(stage_extra)
    sub.append(f"ebuf y 0 {prev} 0 1")
    sub.append(".ends")
    lines = ["* schur ladder fixture"] + sub + body
    prev = "in"
    for s in range(1, n_stages + 1):
        lines.append(f"x{s} {prev} o{s} stage")
        prev = f"o{s}"
    lines.append(f"rload {prev} 0 10k")
    lines.append(".end")
    return "\n".join(lines)


def test_plan_partition_ladder_structure():
    ckt = st.parse_netlist(_ladder_netlist(16), dialect="extended")
    tensors = build_tensors(ckt)
    plan = plan_partition(ckt, tensors)
    assert plan is not None
    assert plan.n_blocks == 16
    # interior per stage: 4 internal nodes; the VCVS branch couples to an
    # interface output node AND interior control -> row/col both fill via
    # the interior control column, so it may stay interior; interface
    # holds at least in + 16 stage outputs + source branch
    assert plan.n_interface >= 18
    # partition covers every unknown exactly once
    seen = set(plan.if_ix.tolist())
    for k in range(plan.n_blocks):
        for i in range(plan.n_max):
            if plan.blk_mask[k, i]:
                u = int(plan.blk_ix[k, i])
                assert u not in seen
                seen.add(u)
    assert seen == set(range(tensors.nvar))


def test_plan_promotes_port_to_port_branch():
    """A V source between two PORT nodes inside a subckt has a block row
    with no interior entries — the planner must promote it to the
    interface instead of leaving a structurally singular block."""
    lines = ["* promo fixture",
             ".subckt lift p q",
             "v1 p q dc 0",
             "r1 p m 1k",
             "r2 m q 2k",
             "rg m 0 10k",
             ".ends",
             "vin in 0 dc 1 ac 1"]
    prev = "in"
    for i in range(1, 13):
        lines.append(f"x{i} {prev} o{i} lift")
        prev = f"o{i}"
    lines += [f"rload {prev} 0 1k", ".ac dec 2 1 1e3", ".end"]
    net = "\n".join(lines)
    ckt = st.parse_netlist(net, dialect="extended")
    tensors = build_tensors(ckt)
    plan = plan_partition(ckt, tensors, min_speedup=0.0)
    assert plan is not None
    # every V branch between two ports must be interface
    names = {n: i for i, n in enumerate(tensors.v_names)}
    for nm, (i1, i2, br) in zip(tensors.v_names, tensors.v_idx):
        if nm.startswith("v1."):
            assert int(br) in set(plan.if_ix.tolist())


def test_plan_interface_cap_scales_with_nvar():
    """At 128 stages the border holds ~2 unknowns/stage (258 > 256); the
    default ``max_interface`` must scale as max(256, nvar // 2) so big
    boards don't fall back to the O(N^3) dense tier just for being big —
    the flop model remains the profitability guard."""
    ckt = st.parse_netlist(_ladder_netlist(128, inner=6),
                           dialect="extended")
    tensors = build_tensors(ckt)
    assert tensors.nvar > 1000
    plan = plan_partition(ckt, tensors)
    assert plan is not None
    assert plan.n_blocks == 128
    assert plan.n_interface > 256  # would have been rejected by a flat cap
    # explicit caps still honored
    assert plan_partition(ckt, tensors, max_interface=100) is None


def test_plan_rejects_flat_circuit():
    net = ["* flat", "vin in 0 ac 1", ".ac dec 2 1 1e3"]
    prev = "in"
    for i in range(40):
        net.append(f"r{i} {prev} n{i} 1k")
        net.append(f"c{i} n{i} 0 1n")
        prev = f"n{i}"
    net.append(".end")
    ckt = st.parse_netlist("\n".join(net), dialect="extended")
    tensors = build_tensors(ckt)
    assert plan_partition(ckt, tensors) is None


# ---------------------------------------------------------------------------
# End to end
# ---------------------------------------------------------------------------


def test_ac_schur_matches_dense_64_stage_ladder():
    """VERDICT r4 #1 fixture: 64-instance subckt ladder, structured vs
    dense at 1e-9. nvar = 64*(4 interior + maybe branch) + interface —
    well past the N=128 dense fast-tier ceiling."""
    net = _ladder_netlist(64, inner=3)
    ckt = st.parse_netlist(net, dialect="extended")
    tensors = build_tensors(ckt)
    assert tensors.nvar > 256
    plan = plan_partition(ckt, tensors)
    assert plan is not None

    res_s = st.simulate_ac(st.parse_netlist(net, dialect="extended"), method="schur")
    res_d = st.simulate_ac(st.parse_netlist(net, dialect="extended"), method="lax")
    assert res_s is not None and res_d is not None
    for node in ("o1", "o32", "o64"):
        a = res_s.node_voltages[node]
        d = res_d.node_voltages[node]
        np.testing.assert_allclose(a, d, rtol=1e-9, atol=1e-12)


def test_mc_ac_schur_matches_dense():
    """MC batch support (VERDICT r4 #1): batched variants through the
    structured tier match the dense batched solver."""
    from spicey_tpu.analysis.mc import mc_ac_stats

    net = _ladder_netlist(16, inner=3)
    rng = np.random.default_rng(3)
    B = 8
    overrides = {"r1.x1": 1e3 * (1 + 0.2 * rng.standard_normal(B)),
                 "c1.x5": 1e-9 * (1 + 0.2 * rng.standard_normal(B))}
    kw = dict(node="o16", quantiles=(50.0,), dialect="extended")
    s_schur = mc_ac_stats(net, overrides, method="schur", **kw)
    s_dense = mc_ac_stats(net, overrides, method="lax", **kw)
    assert s_schur.n_valid == B == s_dense.n_valid
    np.testing.assert_allclose(
        s_schur.quantiles[50.0], s_dense.quantiles[50.0],
        rtol=1e-9, atol=1e-12)


def test_ac_schur_forced_on_flat_circuit_raises():
    net = "* flat\nvin in 0 ac 1\nr1 in out 1k\nc1 out 0 1n\n.ac dec 2 1 1e3\n.end"
    with pytest.raises(ValueError, match="schur"):
        st.simulate_ac(st.parse_netlist(net), method="schur")


# ---------------------------------------------------------------------------
# Transient through the structured tier (round 5): the tran Newton loop
# re-solves the dense-assembled companion system every iteration; the SAME
# SchurPlan routes those solves through ops/schur.schur_solve
# (analysis/tran.py plan threading; reference hot loop simulateTRAN.ts:152).
# ---------------------------------------------------------------------------

_TRAN_KW = dict(analysis=".tran 1u 50u",
                source="vsrc in 0 PULSE(0 5 0 1n 1n 50u 100u)")


def test_tran_schur_matches_dense_linear():
    """Linear subckt board past N=128: structured vs dense at 1e-9. The
    linear path factors once (inv_of) — the plan threads through the
    column solves too."""
    net = _ladder_netlist(24, inner=5, **_TRAN_KW)
    ckt = st.parse_netlist(net, dialect="extended")
    tensors = build_tensors(ckt)
    assert tensors.nvar > 128
    assert plan_partition(ckt, tensors) is not None
    r_s = st.simulate_tran(st.parse_netlist(net, dialect="extended"),
                           method="schur")
    r_d = st.simulate_tran(st.parse_netlist(net, dialect="extended"),
                           method="lax")
    for node in ("o1", "o12", "o24"):
        a = np.asarray(r_s.node_voltages[node])
        d = np.asarray(r_d.node_voltages[node])
        scale = np.max(np.abs(d)) + 1e-30
        np.testing.assert_allclose(a, d, rtol=0, atol=1e-9 * scale)


def test_tran_schur_nonlinear_diode_clamps():
    """Clamp diodes inside every stage: the per-step Newton re-assembles
    and re-solves through the structured tier; must match dense."""
    net = _ladder_netlist(
        24, inner=4,
        stage_extra=(".model dd d(is=1e-14)", "dcl m2 0 dd"),
        **_TRAN_KW)
    ckt = st.parse_netlist(net, dialect="extended")
    tensors = build_tensors(ckt)
    assert tensors.nvar > 128 and tensors.n_d == 24
    r_s = st.simulate_tran(st.parse_netlist(net, dialect="extended"),
                           method="schur")
    r_d = st.simulate_tran(st.parse_netlist(net, dialect="extended"),
                           method="lax")
    a = np.asarray(r_s.node_voltages["o24"])
    d = np.asarray(r_d.node_voltages["o24"])
    scale = np.max(np.abs(d)) + 1e-30
    np.testing.assert_allclose(a, d, rtol=0, atol=1e-9 * scale)


def test_tran_schur_auto_dispatch_default_method():
    """method='gj' (the default) auto-routes nvar>128 subckt boards
    through the plan; results must equal the dense reference path."""
    net = _ladder_netlist(24, inner=5, **_TRAN_KW)
    r_a = st.simulate_tran(st.parse_netlist(net, dialect="extended"))
    r_d = st.simulate_tran(st.parse_netlist(net, dialect="extended"),
                           method="lax")
    a = np.asarray(r_a.node_voltages["o24"])
    d = np.asarray(r_d.node_voltages["o24"])
    scale = np.max(np.abs(d)) + 1e-30
    np.testing.assert_allclose(a, d, rtol=0, atol=1e-9 * scale)


def test_mc_tran_schur_matches_dense():
    """Batched variants through the structured transient tier."""
    from spicey_tpu.analysis.mc import mc_tran_stats

    net = _ladder_netlist(
        24, inner=4,
        stage_extra=(".model dd d(is=1e-14)", "dcl m2 0 dd"),
        **_TRAN_KW)
    rng = np.random.default_rng(5)
    B = 8
    overrides = {"r1.x1": 1e3 * (1 + 0.2 * rng.random(B))}
    kw = dict(node="o24", quantiles=(50.0,), dialect="extended")
    s_schur = mc_tran_stats(net, overrides, method="schur", **kw)
    s_dense = mc_tran_stats(net, overrides, method="lax", **kw)
    assert s_schur.n_valid == B == s_dense.n_valid
    scale = np.max(np.abs(s_dense.quantiles[50.0])) + 1e-30
    np.testing.assert_allclose(
        s_schur.quantiles[50.0], s_dense.quantiles[50.0],
        rtol=0, atol=1e-9 * scale)


def test_tran_schur_forced_on_flat_circuit_raises():
    net = ("* flat\nvin in 0 PULSE(0 1 0 1n 1n 5u 10u)\nr1 in out 1k\n"
           "c1 out 0 1n\n.tran 1u 10u\n.end")
    with pytest.raises(ValueError, match="schur"):
        st.simulate_tran(st.parse_netlist(net), method="schur")


# ---------------------------------------------------------------------------
# Operating point / DC sweep / .tf / .noise through the structured tier
# (round 5). The op system appends one 0V L-short branch per inductor
# after the shared unknowns; plan_partition_op extends the base plan with
# those branches and relies on the valid-flag fallback for DC structural
# holes (C open). .tf reuses the op plan; .noise runs the AC-space plan on
# forward AND adjoint solves (transpose of BBD is BBD, same partition).
# ---------------------------------------------------------------------------


def _op_board(stages: int, inner: int = 4, tail: str = "") -> str:
    """Nonlinear DC board: each stage carries an interior inductor (an op
    L-short branch) and a clamp diode, driven by a DC source."""
    sub = [".subckt stage a y", ".model dd d(is=1e-14)"]
    prev = "a"
    for i in range(1, inner + 1):
        sub.append(f"r{i} {prev} m{i} 1k")
        sub.append(f"c{i} m{i} 0 1n")
        prev = f"m{i}"
    sub += ["l1 m1 m2 1m", "dcl m2 0 dd", f"ebuf y 0 {prev} 0 1", ".ends"]
    lines = ["* op schur board"] + sub + ["vsrc in 0 dc 2"]
    prev = "in"
    for s in range(1, stages + 1):
        lines.append(f"x{s} {prev} o{s} stage")
        prev = f"o{s}"
    lines += [f"rload {prev} 0 10k", tail, ".end"]
    return "\n".join(lines) + "\n"


def test_op_schur_matches_dense_with_l_short_branches():
    from spicey_tpu.analysis.op import simulate_op
    from spicey_tpu.ops.schur import plan_partition_op

    ckt = st.parse_netlist(_op_board(28), dialect="extended")
    tensors = build_tensors(ckt)
    plan = plan_partition_op(ckt, tensors)
    assert plan is not None
    # plan covers the appended L-short branches exactly once
    assert plan.nvar == tensors.nvar + tensors.n_l
    covered = set(plan.if_ix.tolist())
    for k in range(plan.n_blocks):
        covered.update(plan.blk_ix[k, plan.blk_mask[k]].tolist())
    assert covered == set(range(plan.nvar))
    r_s = simulate_op(ckt, tensors=tensors, method="schur")
    r_d = simulate_op(ckt, tensors=tensors, method="lax")
    for k, v in r_d.node_voltages.items():
        assert abs(r_s.node_voltages[k] - v) < 1e-9
    # inductor currents ride the appended branch unknowns
    l_names = [n for n in r_d.element_currents if n.startswith("l1.")]
    assert l_names
    for n in l_names:
        assert abs(r_s.element_currents[n]
                   - r_d.element_currents[n]) < 1e-9


def test_dc_sweep_schur_matches_dense():
    from spicey_tpu.analysis.op import simulate_dc

    net = _op_board(28, tail=".dc vsrc 0 3 0.5")
    ckt = st.parse_netlist(net, dialect="extended")
    d_s = simulate_dc(ckt, method="schur")
    d_d = simulate_dc(ckt, method="lax")
    assert d_s.valid.all() and d_d.valid.all()
    np.testing.assert_allclose(d_s.node_voltages["o28"],
                               d_d.node_voltages["o28"],
                               rtol=0, atol=1e-9)


def test_tf_schur_matches_dense():
    from spicey_tpu.analysis.tf import simulate_tf

    net = _op_board(28, tail=".tf v(o28) vsrc")
    ckt = st.parse_netlist(net, dialect="extended")
    t_s = simulate_tf(ckt, method="schur")
    t_d = simulate_tf(ckt, method="lax")
    assert t_s.transfer_function == pytest.approx(
        t_d.transfer_function, rel=1e-9)
    assert t_s.output_impedance == pytest.approx(
        t_d.output_impedance, rel=1e-6)


def test_noise_schur_matches_dense():
    from spicey_tpu.analysis.noise import simulate_noise

    net = _op_board(28, tail=".noise v(o28) vsrc dec 5 1k 1meg")
    ckt = st.parse_netlist(net, dialect="extended")
    n_s = simulate_noise(ckt, method="schur")
    n_d = simulate_noise(ckt, method="lax")
    np.testing.assert_allclose(n_s.output_psd, n_d.output_psd,
                               rtol=1e-8, atol=0)
