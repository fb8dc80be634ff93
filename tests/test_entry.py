"""Driver entry-point tests: entry() compile-checks and dryrun_multichip
executes on the virtual 8-device CPU mesh (same mechanism the driver uses)."""

import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    x_re, x_im, valid = jax.jit(fn)(*args)
    assert x_re.shape == (32, 201, 3)
    assert bool(valid.all())
    # node 1 is the ideal source: |V| = 1 for every variant/frequency
    v1 = np.asarray(x_re)[..., 0] + 1j * np.asarray(x_im)[..., 0]
    np.testing.assert_allclose(np.abs(v1), 1.0, rtol=1e-12)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_dryrun_is_hermetic_to_cpu_backend(monkeypatch):
    """The dryrun must never touch the default (possibly broken) backend.

    Round-1 regression: MULTICHIP_r01 failed with a libtpu version mismatch
    raised from a device_put onto the default TPU client. The dryrun now
    re-execs into a child whose env forces JAX_PLATFORMS=cpu and strips the
    TPU plugin bootstrap var, so the broken client cannot even register.
    This test (a) captures the child env to assert that contract, and
    (b) runs the dryrun with plugin-bootstrap env vars present to prove the
    parent path never needs the default backend.
    """
    import subprocess

    import __graft_entry__ as g

    captured = {}
    real_run = subprocess.run

    def spy_run(cmd, **kw):
        captured.update(kw["env"])
        return real_run(cmd, **kw)

    monkeypatch.setattr(subprocess, "run", spy_run)
    monkeypatch.delenv(g._DRYRUN_CHILD_MARKER, raising=False)
    # simulate a TPU-plugin environment in the parent
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    g.dryrun_multichip(2)
    assert captured["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in captured
    assert "--xla_force_host_platform_device_count=2" in captured["XLA_FLAGS"]
    assert captured[g._DRYRUN_CHILD_MARKER] == "1"
