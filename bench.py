"""Headline benchmark: batched Monte-Carlo AC throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.md): the reference README RC low-pass, `.ac dec 100 1 100`
(201 frequency points, Nvar=3), swept over B parameter variants.

  - baseline: the reference's execution model — one netlist per call, a
    serial per-variant loop over single-circuit `simulate_ac` calls (each
    itself already a fully compiled whole-grid solve, i.e. the baseline is
    generous: the TS reference additionally loops per-frequency in
    interpreted JS).
  - headline: all B variants in ONE compiled batched call
    (`simulate_ac_batch`), end-to-end including host result conversion.

vs_baseline = batched variants/sec / per-variant-loop variants/sec on the
same hardware (the ">=100x on a 10k-variant sweep" north star).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    from spicey_tpu import parse_netlist, simulate_ac
    from spicey_tpu.analysis.batch import simulate_ac_batch
    from spicey_tpu.ir.circuit import build_tensors

    net = (
        "AC bench\n"
        "v1 1 0 dc 0 ac 1\n"
        "r1 1 2 30\n"
        "c1 2 0 100u\n"
        ".ac dec 100 1 100\n"
        ".end\n"
    )
    ckt = parse_netlist(net)
    tensors = build_tensors(ckt)
    B = 10_000
    rng = np.random.default_rng(0)
    r_vals = 30.0 * (1 + 0.2 * rng.random(B))
    c_vals = 100e-6 * (1 + 0.2 * rng.random(B))

    # --- baseline: serial per-variant loop (reference execution model) ---
    K = 20
    simulate_ac(ckt, tensors=tensors)  # warm up compile
    t0 = time.perf_counter()
    for k in range(K):
        ckt.R[0].R = float(r_vals[k])
        ckt.C[0].C = float(c_vals[k])
        t_k = build_tensors(ckt)
        simulate_ac(ckt, tensors=t_k)
    baseline_vps = K / (time.perf_counter() - t0)
    ckt.R[0].R, ckt.C[0].C = 30.0, 100e-6

    # --- headline: one batched compiled call ---
    overrides = {"r1": r_vals, "c1": c_vals}
    simulate_ac_batch(ckt, overrides, tensors=tensors)  # warm up compile
    t0 = time.perf_counter()
    res = simulate_ac_batch(ckt, overrides, tensors=tensors)
    batched_elapsed = time.perf_counter() - t0
    assert bool(res.valid.all())
    # spot-check correctness against the analytic transfer function
    w = 2 * np.pi * res.freqs
    h = 1.0 / (1.0 + 1j * w[None, :] * (r_vals * c_vals)[:, None])
    idx = [n.upper() for n in res.node_names].index("2")
    err = np.abs(res.x[:, :, idx] - h).max()
    assert err < 1e-9, f"correctness check failed: {err}"

    batched_vps = B / batched_elapsed
    print(json.dumps({
        "metric": "mc_ac_variants_per_sec",
        "value": round(batched_vps, 2),
        "unit": "variants/s (201-pt AC sweep each)",
        "vs_baseline": round(batched_vps / baseline_vps, 2),
    }))


if __name__ == "__main__":
    main()
