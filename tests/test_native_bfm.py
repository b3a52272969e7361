"""Native C++ BFM solver (native/bfm2d.cpp) parity vs the JAX solver.

The native library is the in-process equivalent of the reference's
``QW2D/bin/bfm2d`` subprocess binary + ``w2`` extension
(``misfit/bfm.py:1,145-192``); the JAX solver is the TPU production path.
Both implement the same back-and-forth iteration, so loss and gradient
must agree to float32 rounding.
"""
import numpy as np
import pytest

from devito_fwi_tpu.misfit import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native bfm2d library unavailable")


def _wavelet(dt, n, freq, delay):
    t = (np.arange(0, n) - delay) * dt
    tmp = np.pi * np.pi * freq * freq * t * t
    return ((1. - 2. * tmp) * np.exp(-tmp)).reshape(n, 1)


def _gathers(shape=(200, 64), d1=60, d2=100):
    f = np.tile(_wavelet(0.002, shape[0], 5, d1), (1, shape[1]))
    g = np.tile(_wavelet(0.002, shape[0], 5, d2), (1, shape[1]))
    c = -min(f.min(), g.min()) * 1.01
    return (f + c).astype(np.float32), (g + c).astype(np.float32)


def test_native_matches_jax():
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import bfm_jax
    f, g = _gathers()
    ln, gn = native.bfm_gradient(f, g, num_steps=10, step_scale=1.0)
    lj, gj = bfm_jax(jnp.asarray(f), jnp.asarray(g), num_steps=10,
                     step_scale=1.0)
    gj = np.asarray(gj)
    assert abs(ln - float(lj)) < 1e-5 * abs(float(lj))
    assert np.abs(gn - gj).max() < 1e-4 * np.abs(gj).max()


def test_native_identical_inputs_near_zero():
    f, g = _gathers(d1=80, d2=80)
    loss, grad = native.bfm_gradient(f, g, num_steps=10, step_scale=1.0)
    assert abs(loss) < 1e-8


def test_ctransform_convexification_identity():
    n2, n1 = 32, 40
    xs = (np.arange(n1) + 0.5) / n1
    ys = (np.arange(n2) + 0.5) / n2
    quad = (0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)).astype(np.float32)
    # quad is already convex: double Legendre transform is the identity
    ct = native.ctransform(native.ctransform(quad))
    assert np.abs(ct - quad).max() < 1e-6


def test_pushforward_matches_jax():
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import (_pushforward_map,
                                           _sampling_pushforward)
    rng = np.random.RandomState(0)
    n2, n1 = 48, 40
    mu = rng.rand(n2, n1).astype(np.float32) + 0.5
    mu /= mu.mean()
    xs = (np.arange(n1) + 0.5) / n1
    ys = (np.arange(n2) + 0.5) / n2
    dual = (0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)).astype(np.float32)
    rho = native.pushforward(mu, dual)
    assert np.isclose(rho.mean(), 1.0, atol=1e-5)  # unit-mean preserved
    xm, ym = _pushforward_map(jnp.asarray(dual), n1, n2)
    rho_j = np.asarray(_sampling_pushforward(jnp.asarray(mu), xm, ym,
                                             n1, n2, 2))
    assert np.abs(rho - rho_j).max() < 1e-3


def test_batch_matches_single():
    f1, g1 = _gathers(d1=60, d2=100)
    f2, g2 = _gathers(d1=50, d2=120)
    fb = np.stack([f1, f2])
    gb = np.stack([g1, g2])
    losses, grads = native.bfm_gradient_batch(fb, gb, num_steps=8,
                                              step_scale=1.0)
    l1, gr1 = native.bfm_gradient(f1, g1, num_steps=8, step_scale=1.0)
    l2, gr2 = native.bfm_gradient(f2, g2, num_steps=8, step_scale=1.0)
    assert np.isclose(losses[0], l1, rtol=1e-6)
    assert np.isclose(losses[1], l2, rtol=1e-6)
    assert np.allclose(grads[0], gr1, atol=1e-7)
    assert np.allclose(grads[1], gr2, atol=1e-7)


def test_qwasserstein_native_backend():
    from devito_fwi_tpu.misfit import qWasserstein
    f, g = _gathers()
    wn = qWasserstein(gamma=1.01, method="2d", num_steps=10, step_scale=1.,
                      bfm_backend="native")
    wj = qWasserstein(gamma=1.01, method="2d", num_steps=10, step_scale=1.)
    ln, gn = wn(f, g)
    lj, gj = wj(f, g)
    assert np.isclose(ln, lj, rtol=1e-4)
    assert np.abs(gn - gj).max() < 1e-4 * np.abs(gj).max()


def test_phase_timing_breakdown():
    """The timed variant returns the reference solver's 4-phase clock
    breakdown (fot2d.c:530-534,599-602) as data, with identical
    numerics to the untimed call."""
    from devito_fwi_tpu.misfit import native
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(0)
    f = np.abs(rng.randn(64, 48)).astype(np.float32) + 0.1
    g = np.abs(rng.randn(64, 48)).astype(np.float32) + 0.1
    l0, g0 = native.bfm_gradient(f, g, num_steps=5)
    l1, g1, phases = native.bfm_gradient(f, g, num_steps=5,
                                         return_phases=True)
    assert l1 == l0
    np.testing.assert_array_equal(g1, g0)
    assert set(phases) == {"update", "legendre", "pushforward", "total"}
    assert all(v >= 0 for v in phases.values())
    assert phases["total"] > 0
    parts = phases["update"] + phases["legendre"] + phases["pushforward"]
    assert parts <= phases["total"] + 1e-9
