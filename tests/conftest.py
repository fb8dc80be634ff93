"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding paths compile and execute without TPU hardware (the driver's
dryrun_multichip uses the same mechanism). This must run before JAX
initializes its backends, hence the env mutation at module import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The NumPy interp tier (analysis/interp.py) is the DEFAULT path for tiny
# reference-dialect circuits — which describes most test fixtures. Disable
# it suite-wide (unconditionally: an inherited shell export must not
# silently defeat the engine-coverage guarantee) so every end-to-end test
# keeps exercising the compiled engine; tests/test_interp.py re-enables it
# per-test via monkeypatch to cover the interp tier itself.
os.environ["SPICEY_TPU_INTERP"] = "0"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# Long-running tests (>= ~3 s warm on a dev box; several times that on a
# cold 2-vCPU CI runner) excluded from the PR-blocking gate via
# ``-m "not slow"`` (pyproject.toml registers the marker; nightly.yml runs
# the full suite). Centralized here so test files stay decorator-free and
# the gate's contents are reviewable in one place. The core contract
# checks (basics01 golden, dryrun_multichip) stay in the fast gate on
# purpose. Parametrized cases inherit the mark via the base name.
_SLOW = {
    "test_adaptive_switch_circuit",
    "test_ac_batch_2d_mesh_batch_by_freq",
    "test_ac_batch_sharded_over_cpu_mesh",
    "test_bsource_adaptive_and_noise",
    "test_bsource_batched_paths",
    "test_bv_amp_tf_gain",
    "test_mc_stats_support_coupling",
    "test_tran_transformer_steady_state_amplitude",
    "test_bjt_charge_slows_switching",
    "test_fit_ac_recovers_rc_product",
    "test_fuzz_poly1_matches_explicit_bsource",
    "test_fuzz_tran_integrations_converge_to_same_settle",
    "test_mc_ac_chunked_matches_unchunked",
    "test_mc_ac_f32_pallas_tier_close_to_f64",
    "test_mc_ac_pallas_f64_refined",
    "test_mc_ac_sampled_matches_host_draws",
    "test_mosfet_channel_noise_regions",
    "test_noise_differential_output_and_current_input",
    "test_dc_sweep_mosfet_transfer",
    "test_op_batch_matches_dc_sweep",
    "test_refinement_guard_complex",
    "test_switch_circuit_pallas_matches_gj",
    "test_poly1_linear_matches_native_sources",
    "test_ua741_vendor_macromodel_unmodified",
    "test_step_sweeps_all_analyses",
    "test_step_sweeps_ua741_gain",
    "test_tf_differential_output",
    "test_tf_vcvs_amplifier",
    "test_matched_line_ac_delay_phase",
    "test_matched_line_pure_delay",
    "test_quarter_wave_transformer",
    "test_gear2_segments_match_full_run",
    "test_options_vntol_abstol_mixed_criterion",
    "test_tran_segments_match_single_run",
    "test_tran_segments_trap_and_nonlinear",
    "test_trap_rlc_energy_behavior",
    # round-3 additions
    "test_mc_ac_batchlast_stamps_all_controlled_sources",
    "test_mc_tran_sampled_matches_host_draw_stats",
    "test_mc_tran_sampled_chunked_matches_unchunked",
    "test_sensitivity_tran_with_bsource",
    "test_sensitivity_tran_with_tline",
    "test_fit_ac_with_tline_recovers_source_resistor",
    "test_fit_tran_with_bsource_recovers_resistor",
    "test_sensitivity_with_poly_source",
    # round-5 additions
    "test_fuzz_nonlinear_fused_kernel_matches_scan_extended",
    "test_ua741_slew_rate_datasheet",
    "test_ua741_inverting_amp_closed_loop_gain",
    "test_ua741_output_swing_clamps_near_rails",
    "test_ua741_integrator_frequency_response",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW:
            item.add_marker(pytest.mark.slow)


_TESTS_RUN = 0


@pytest.fixture(autouse=True)
def _bound_compile_state():
    """Clear JAX's executable caches every 64 tests.

    A full-suite run accumulates hundreds of compiled programs in one
    process; twice (round 3) the 480th-ish XLA:CPU compile then
    segfaulted inside ``backend_compile_and_load`` while the same test
    passed in isolation — a state-dependent compiler crash, not a test
    bug. Periodic cache clearing bounds the accumulated state (and the
    suite also runs fine under pytest-xdist workers, which bounds it
    per-process)."""
    global _TESTS_RUN
    yield
    _TESTS_RUN += 1
    if _TESTS_RUN % 64 == 0:
        jax.clear_caches()


@pytest.fixture(scope="session", autouse=True)
def _cpu_default_device():
    """Force all test computation onto the host CPU backend.

    The environment pins ``jax_platforms="axon,cpu"`` (TPU-by-default via the
    axon plugin); tests must be fast and hardware-independent.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        yield


FIXTURES_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir() -> str:
    return FIXTURES_DIR
