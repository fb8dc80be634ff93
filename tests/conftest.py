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

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


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
