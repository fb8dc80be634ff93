"""spicey_tpu — a TPU-native SPICE circuit-simulation engine.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities and netlist-in /
results-out contract of tscircuit/spicey (reference at /root/reference;
public surface mirrored from lib/index.ts:1-12): ``parse_netlist``,
``simulate``, ``simulate_ac``, ``simulate_tran``, ``format_ac_result``,
``format_tran_result``, ``spicey_tran_to_vgraphs``,
``eec_engine_tran_to_vgraphs``. camelCase aliases are provided for drop-in
familiarity.

Architecture (see SURVEY.md §7): netlists parse once into a static tensorized
IR; MNA assembly is vectorized scatter-add stamping; AC sweeps are one
batched complex solve vmapped over the frequency grid; transients are a
``lax.scan`` over timesteps; Monte-Carlo parameter sweeps batch along a
leading variants axis and shard over TPU meshes (spicey_tpu.parallel).

float64 is required for SPICE-grade conditioning (the reference computes in
JS doubles), so importing this package enables JAX x64 mode.
"""

from __future__ import annotations

import os as _os

import jax as _jax

# Single source of truth for the package version (the analog of the
# reference's package.json:3 "version" field). pyproject.toml must carry the
# same string — tests/test_version.py pins the two together, and the release
# workflow's wheel smoke test prints this attribute.
__version__ = "0.7.0"

_jax.config.update("jax_enable_x64", True)

# Persistent compile cache: OPT-IN via SPICEY_TPU_COMPILE_CACHE=<dir>.
# Deliberately NOT on by default: XLA:CPU AOT cache entries are keyed
# without the exact host-feature set the writer detected, and loading an
# entry written by a process with different feature detection can SIGSEGV
# (observed in this repo's round-3 CI hardening: a segfault inside
# jax compilation_cache.get_executable_and_time during a suite run; the
# cpu_aot_loader logs the feature mismatch as "could lead to execution
# errors such as SIGILL" right before). A round-4 attempt to re-enable it
# behind a host-feature-keyed directory (hash of /proc/cpuinfo flags +
# jax/jaxlib versions) REPRODUCED the mismatch on a single machine: the
# loader complained about `+prefer-no-scatter`/`+prefer-no-gather` —
# XLA-internal tuning features that never appear in /proc/cpuinfo, so no
# host-side key can discriminate them. Homogeneous single-process
# environments (CI runners, dedicated TPU hosts) can and should opt in —
# the repo's own CI does. Interactive cold-start latency does NOT need
# this cache: reference-dialect single-circuit calls run on the NumPy
# interp tier with no compile step at all (analysis/interp.py), and the
# remaining compiled programs build in single-digit seconds.
_cache_dir = _os.environ.get("SPICEY_TPU_COMPILE_CACHE")
if _cache_dir and _cache_dir != "0":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # low floor on purpose: the tiny-path programs compile in ~0.9 s
        # (placement.py opt level 0) — a 1.0 s floor would exclude
        # exactly the programs whose compile latency a user feels
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.1)
    except OSError:
        pass  # read-only home: run without a persistent cache


def warmup(full: bool = False) -> float:
    """Establish the device session before latency-sensitive work.

    On remote-tunnel TPU backends the FIRST blocking device round trip in a
    process pays a device-claim handshake whose cost is set by the far end
    (measured 4-600 s on a shared axon relay; every later round trip is
    ~30 ms). Nothing about that cost belongs to any particular analysis, so
    interactive users and benchmarks should pay it here, up front, where it
    is visible. Returns the handshake wall time in seconds.

    ``full=True`` additionally compiles-and-runs a minimal AC + TRAN deck so
    the flagship program shapes land in the persistent compile cache.
    """
    import time as _time

    import numpy as _np

    t0 = _time.perf_counter()
    _np.asarray(_jax.numpy.zeros((1,)))
    dt = _time.perf_counter() - t0
    if full:
        simulate(
            "warmup deck\n"
            "v1 1 0 dc 0 ac 1 PULSE(0 1 0 1n 1n 5u 10u)\n"
            "r1 1 2 1k\n"
            "c1 2 0 1u\n"
            ".ac dec 10 1 100\n"
            ".tran 1u 10u\n"
            ".end\n"
        )
    return dt

from .analysis.ac import simulate_ac
from .analysis.results import (ACResult, SimulationResult, StepResult,
                               TranResult)
from .analysis.simulate import simulate
from .analysis.tran import TranState, simulate_tran
from .constants import EPS, VT_300K
from .formatting.compare import compare_voltage_levels
from .formatting.svg import convert_simulation_graphs_to_svg
from .formatting.jsnum import to_precision
from .formatting.text import (
    format_ac_result,
    format_dc_result,
    format_four_result,
    format_noise_result,
    format_op_result,
    format_tf_result,
    format_tran_result,
)
from .formatting.rawfile import format_rawfile, read_rawfile, write_rawfile
from .formatting.vgraph import eec_engine_tran_to_vgraphs, spicey_tran_to_vgraphs
from .ir.circuit import CircuitTensors, build_tensors
from .math_complex import Complex
from .analysis.batch import (
    BatchACResult,
    BatchTranResult,
    simulate_ac_batch,
    simulate_tran_batch,
)
from .analysis.mc import (MCStats, mc_ac_sampled, mc_ac_stats,
                          mc_tran_sampled, mc_tran_stats)
from .analysis.sensitivity import sensitivity_ac, sensitivity_tran
from .analysis.fit import FitResult, fit_ac, fit_tran
from .analysis.adaptive import AdaptiveTranResult, simulate_tran_adaptive
from .analysis.op import (
    BatchOPResult,
    DCResult,
    OPResult,
    op_batch,
    simulate_dc,
    simulate_op,
)
from .analysis.four import FourierProbe, FourierResult, simulate_four
from .analysis.meas import (MeasSpec, evaluate_meas, evaluate_meas_batch,
                            meas_batch, simulate_meas)
from .analysis.noise import NoiseResult, simulate_noise
from .analysis.pz import PZResult, format_pz_result, simulate_pz
from .analysis.sens import SensResult, format_sens_result, simulate_sens
from .analysis.tf import TFResult, simulate_tf
from .parallel.mesh import make_mesh, sharder
from .parsing.netlist import ParsedCircuit, parse_netlist
from .parsing.numbers import parse_number_with_units
from .utils.profiling import count, profiled, report, span
from .parsing.waveforms import (
    PulseSpec,
    parse_pulse_args,
    parse_pwl_args,
    pulse_value,
    pwl_value,
)

# camelCase aliases matching the reference's npm surface (lib/index.ts:1-12)
parseNetlist = parse_netlist
simulateAC = simulate_ac
simulateTRAN = simulate_tran
formatAcResult = format_ac_result
formatTranResult = format_tran_result
spiceyTranToVGraphs = spicey_tran_to_vgraphs
eecEngineTranToVGraphs = eec_engine_tran_to_vgraphs

__all__ = [
    "ACResult",
    "BatchACResult",
    "BatchTranResult",
    "CircuitTensors",
    "Complex",
    "EPS",
    "ParsedCircuit",
    "PulseSpec",
    "SimulationResult",
    "TranResult",
    "VT_300K",
    "build_tensors",
    "compare_voltage_levels",
    "convert_simulation_graphs_to_svg",
    "eec_engine_tran_to_vgraphs",
    "format_ac_result",
    "format_tf_result",
    "format_tran_result",
    "make_mesh",
    "mc_ac_sampled",
    "mc_ac_stats",
    "mc_tran_sampled",
    "mc_tran_stats",
    "MCStats",
    "parse_netlist",
    "parse_number_with_units",
    "parse_pulse_args",
    "parse_pwl_args",
    "pulse_value",
    "pwl_value",
    "sharder",
    "simulate",
    "warmup",
    "simulate_ac",
    "simulate_op",
    "OPResult",
    "simulate_tf",
    "TFResult",
    "simulate_four",
    "FourierResult",
    "format_four_result",
    "simulate_noise",
    "NoiseResult",
    "format_noise_result",
    "simulate_pz",
    "PZResult",
    "format_pz_result",
    "format_rawfile",
    "read_rawfile",
    "write_rawfile",
    "simulate_sens",
    "SensResult",
    "format_sens_result",
    "simulate_meas",
    "meas_batch",
    "MeasSpec",
    "simulate_ac_batch",
    "simulate_tran",
    "simulate_tran_batch",
    "spicey_tran_to_vgraphs",
    "to_precision",
]
