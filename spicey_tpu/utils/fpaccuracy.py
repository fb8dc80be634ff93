"""Measured floating-point accuracy of the execution backend, and the
``accurate_exp`` wrapper for a TPU lowering quirk.

TPUs emulate float64 (double-double arithmetic on f32 hardware). The
emulation's exp() is accurate (~1e-14 relative, measured on v5e) for any
operand with >= 2 total elements — but XLA:TPU lowers a SINGLE-element
(or 0-d) f64 exp through a scalar path with ~3.8e-8 RELATIVE error
(~1e8 ulps), measured identically eager and under jit, while XLA:CPU
matches host libm to the last ulp at every shape.

A one-diode MNA companion is exactly a (1,)-shaped exp. The 3.8e-8 noise
injects ~eps_exp * scale into every Newton iterate, so the iterate
limit-cycles below that amplitude: with the op engine's default
tol=1e-12, a plain V-R-diode deck walked the entire gmin/source-stepping
homotopy ladder and still reported "DC operating point did not converge"
on the TPU backend (and converged-mode transients silently burned
max_nr passes per step). Two defenses, both applied:

  - ``accurate_exp``: pad total-size-1 operands to 2 lanes and slice
    back — the accurate vectorized expansion at zero real cost; identity
    for every other shape. Used at every junction-exponential call site
    (op/tran/adaptive companions, Ebers-Moll, behavioral expressions),
    which keeps strict 1e-12 tolerances honest on TPU.
  - ``newton_tol_floor``: floors Newton relative tolerances at 16 ulps
    of the working dtype and 8x the MEASURED exp accuracy of the
    execution backend (probed once per (platform, dtype) on the same
    >= 2-element path the engines use). On backends where exp is exact
    this is inert — strict defaults are preserved bit-for-bit.

The reference never meets this problem: it runs scalar libm doubles
(/root/reference/lib/analysis/simulateTRAN.ts:93 calls Math.exp) and has
no op analysis at all. This is a TPU-hardware-model concern, the f64
sibling of the fused kernel's "16 f32 ulps" tolerance floor lesson
(ops/pallas_mc_tran.py).
"""

from __future__ import annotations

import numpy as np

_cache: dict[tuple[str, str], float] = {}

# pn-junction Newton operating range: vd/vt for vd in ~[0.01, 0.9] V at
# room temperature (plus margin). This is where op/tran Newton loops live.
_PROBE_ARGS = np.linspace(0.5, 34.5, 18)


def accurate_exp(x):
    """``jnp.exp`` with the TPU single-element lowering quirk neutralized.

    Total-size-1 operands are padded to 2 lanes and sliced back so they
    take the accurate vectorized expansion (~1e-14 relative on v5e)
    instead of the scalar path (~3.8e-8). Identity for all other shapes;
    shape is static under jit, so the branch costs nothing at trace time.
    """
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.size != 1:
        return jnp.exp(x)
    flat = jnp.reshape(x, (1,))
    return jnp.reshape(jnp.exp(jnp.concatenate([flat, flat]))[:1], x.shape)


def _current_platform() -> str:
    import jax

    dev = jax.config.jax_default_device
    if dev is None:
        dev = jax.devices()[0]
    return dev.platform


def exp_rel_error(dtype=np.float64) -> float:
    """Max relative error of the engines' exp path (``accurate_exp``,
    i.e. the >= 2-element lowering) at ``dtype`` on the CURRENT default
    execution device, against host-libm float64. Cached per (platform,
    dtype); the probe is one tiny eager dispatch."""
    import jax.numpy as jnp

    key = (_current_platform(), str(np.dtype(dtype)))
    hit = _cache.get(key)
    if hit is not None:
        return hit
    got = np.asarray(jnp.exp(jnp.asarray(_PROBE_ARGS, dtype=dtype)),
                     dtype=np.float64)
    want = np.exp(_PROBE_ARGS)
    err = float(np.max(np.abs(got / want - 1.0)))
    _cache[key] = err
    return err


def newton_tol_floor(tol: float, dtype=np.float64) -> float:
    """Floor a Newton RELATIVE tolerance at what the execution backend can
    actually resolve: 16 ulps of the working dtype (representability) and
    8x the measured exp() accuracy (junction-exponential noise injects
    ~eps_exp * scale into every iterate; 8x covers the observed stall
    amplitudes with margin). Exact backends keep ``tol`` unchanged; on
    v5e the measured f64 exp error is ~1e-14, so the floor is inert there
    too now that ``accurate_exp`` keeps engines off the scalar path."""
    eps = float(np.finfo(np.dtype(dtype)).eps)
    return max(float(tol), 16.0 * eps, 8.0 * exp_rel_error(dtype))
