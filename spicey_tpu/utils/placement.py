"""Tiny-workload host-CPU execution: win interactive single-circuit latency.

The reference answers its headline use case — ONE small netlist, answer
now — in milliseconds (`/root/reference/lib/analysis/simulate.ts:5`: parse
+ 201 tiny solves, interpreted, no compile step). The TPU path cannot: the
remote device claims a ~30 ms round trip per blocking call even when warm,
and the first call pays XLA compile + the device-claim handshake
(BASELINE.md round-3 diagnosis). For workloads whose total arithmetic is
small change next to that round trip, the right device is the HOST CPU:
same jitted programs, no transfer, sub-millisecond dispatch.

``exec_device(work)`` returns a context manager that pins JAX's default
device to the host CPU when

  - the session's default backend is an accelerator,
  - a CPU backend exists, and
  - ``work`` (an operation-count estimate, ~flops) is below the
    crossover threshold,

and otherwise does nothing. The threshold is the work level where host
compute time ~ the accelerator's warm round trip (~30 ms); it can be
overridden with ``SPICEY_TPU_CPU_THRESHOLD`` (set ``0`` to disable the
CPU path entirely, e.g. for benchmarking the accelerator on tiny shapes).

Batched Monte-Carlo / sweep entry points do NOT use this gate — their
workloads are sized for the accelerator by construction.
"""

from __future__ import annotations

import os
from contextlib import nullcontext

import jax

# ~30 ms of host-CPU arithmetic at the few-GFLOP/s XLA:CPU sustains on
# these small batched eliminations (measured: the basics01 grid runs in
# ~1 ms, a 51-freq N=64 ladder in ~40 ms — the crossover sits near 1e8
# ops; kept conservative so only clearly-tiny work stays on the host)
_DEFAULT_THRESHOLD = 3e7

_cpu_device: object | None = None


def _threshold() -> float:
    try:
        return float(os.environ.get("SPICEY_TPU_CPU_THRESHOLD",
                                    _DEFAULT_THRESHOLD))
    except ValueError:
        return _DEFAULT_THRESHOLD


def _cpu() -> object | None:
    global _cpu_device
    if _cpu_device is None:
        try:
            _cpu_device = jax.devices("cpu")[0]
        except RuntimeError:
            _cpu_device = False
    return _cpu_device or None


def is_tiny_work(work: float) -> bool:
    """Threshold-only tiny check — touches NO jax API, so callers (the
    NumPy interp tier, analysis/interp.py) can gate on it without
    triggering backend initialization (``jax.devices`` initializes every
    registered platform, including the remote accelerator handshake)."""
    thr = _threshold()
    return thr > 0 and work < thr


def is_tiny(work: float) -> bool:
    """Is ``work`` under the tiny-workload threshold (and a host CPU
    available to run it)? Callers use this to pick the compile-latency-
    first program variant (``TINY_COMPILER_OPTIONS``) alongside
    ``exec_device``'s placement decision."""
    return is_tiny_work(work) and _cpu() is not None


def exec_device(work: float):
    """Context manager: host CPU for tiny work, default device otherwise.

    Deliberately never asks what the default backend IS: ``jax.devices()``
    would force creation of the accelerator client, and on the remote
    relay that is the multi-second (worst-case multi-minute) device-claim
    handshake — the exact cost the tiny path exists to avoid. Pinning to
    the host CPU when the session's default already is the CPU is a
    semantic no-op, so the check is unnecessary as well as harmful.
    """
    if not is_tiny(work):
        return nullcontext()
    return jax.default_device(_cpu())


# XLA:CPU spends ~1 s of LLVM optimization on the tiny AC program whose
# runtime is ~1 ms — for the interactive one-netlist path, compile
# LATENCY is the product metric, not steady-state throughput. Opt level
# 0 compiles the same program ~4x faster (measured: lower+compile
# 1.82 s -> 0.76 s, run 1.0 -> 1.6 ms on the basics01 sweep). Results
# are numerically equivalent but NOT bit-identical to the full-opt
# build (fusion reordering at rounding level) — same-program bit-exact
# contracts in the tests disable this variant via
# SPICEY_TPU_CPU_THRESHOLD=0. Applied ONLY to the tiny-path variants
# picked via is_tiny(); batched/accelerator programs keep full
# optimization.
TINY_COMPILER_OPTIONS = {"xla_backend_optimization_level": 0}
