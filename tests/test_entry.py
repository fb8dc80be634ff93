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
