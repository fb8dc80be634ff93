"""Randomized cross-validation: random RCLV topologies must agree across
every independent compute path (solver methods, single vs batch, AC vs
analytic superposition). Fixed seeds keep runs deterministic."""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate_ac, simulate_tran
from spicey_tpu.analysis.batch import simulate_ac_batch, simulate_tran_batch


def _random_netlist(rng, n_nodes=5, directives=".ac dec 5 10 10k\n"):
    """A connected random ladder/mesh of R/C/L driven by one AC source.

    Every node k gets an R to a random earlier node (connectivity), plus
    random extra C/L edges. Values span decades.
    """
    lines = ["a fuzz circuit", "v1 n1 0 dc 0 ac 1"]
    idx = 0
    for k in range(2, n_nodes + 1):
        tgt = rng.integers(0, k - 1)
        tgt_name = "0" if tgt == 0 else f"n{tgt}"
        lines.append(f"r{idx} n{k} {tgt_name} {10 ** rng.uniform(1, 5):.6g}")
        idx += 1
    for _ in range(n_nodes):
        a, b = rng.integers(0, n_nodes, 2) + 1
        if a == b:
            continue
        kind = rng.choice(["c", "l", "r"])
        if kind == "c":
            val = 10 ** rng.uniform(-9, -5)
        elif kind == "l":
            val = 10 ** rng.uniform(-5, -2)
        else:
            val = 10 ** rng.uniform(1, 5)
        lines.append(f"{kind}{idx} n{a} n{b} {val:.6g}")
        idx += 1
    # ensure every node also leaks to ground so L-only hangs can't float
    for k in range(1, n_nodes + 1):
        lines.append(f"rg{k} n{k} 0 1e6")
    return "\n".join(lines) + "\n" + directives


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_fuzz_ac_solver_methods_agree(seed):
    rng = np.random.default_rng(seed)
    ckt = parse_netlist(_random_netlist(rng))
    a = simulate_ac(ckt, method="gj")
    b = simulate_ac(ckt, method="lax")
    for node in a.node_voltages:
        np.testing.assert_allclose(
            a.node_voltages[node], b.node_voltages[node],
            rtol=1e-8, atol=1e-12,
        )


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_fuzz_ac_batch_matches_singles(seed):
    rng = np.random.default_rng(seed)
    net = _random_netlist(rng)
    ckt = parse_netlist(net)
    B = 4
    r_name = ckt.R[0].name
    vals = ckt.R[0].R * (1 + 0.5 * rng.random(B))
    batch = simulate_ac_batch(ckt, {r_name: vals})
    for k in range(B):
        ck = parse_netlist(net)
        ck.R[0].R = float(vals[k])
        single = simulate_ac(ck)
        for i, node in enumerate(single.node_voltages):
            np.testing.assert_allclose(
                batch.x[k, :, i], single.node_voltages[node],
                rtol=1e-9, atol=1e-13,
            )


@pytest.mark.parametrize("seed", [8, 9, 10])
def test_fuzz_tran_batch_matches_singles(seed):
    rng = np.random.default_rng(seed)
    net = _random_netlist(
        rng, directives=".tran 1u 200u\n"
    ).replace("dc 0 ac 1", "PULSE(0 5 0 1n 1n 50u 100u)")
    ckt = parse_netlist(net)
    B = 3
    r_name = ckt.R[0].name
    vals = ckt.R[0].R * (1 + 0.5 * rng.random(B))
    batch = simulate_tran_batch(ckt, {r_name: vals})
    for k in range(B):
        ck = parse_netlist(net)
        ck.R[0].R = float(vals[k])
        single = simulate_tran(ck)
        for i, node in enumerate(single.node_voltages):
            np.testing.assert_array_equal(
                batch.xs[k, :, i], single.node_voltages[node]
            )


@pytest.mark.parametrize("seed", [11, 12])
def test_fuzz_tran_integrations_converge_to_same_settle(seed):
    """BE / trap / gear2 must agree on the DC settle point of a random
    dissipative network (they differ only in transient truncation error)."""
    rng = np.random.default_rng(seed)
    net = _random_netlist(rng, directives=".tran 5u 5m\n").replace(
        "dc 0 ac 1", "dc 5")
    ckt = parse_netlist(net)
    finals = []
    for integ in ("be", "trap", "gear2"):
        res = simulate_tran(ckt, integration=integ)
        finals.append(
            np.asarray([res.node_voltages[n][-1]
                        for n in res.node_voltages]))
    np.testing.assert_allclose(finals[0], finals[1], rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(finals[0], finals[2], rtol=1e-4, atol=1e-7)
