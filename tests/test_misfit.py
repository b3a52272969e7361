"""Misfit layer tests: L2, W2-1d trace-wise, and the 2-D BFM solver.

The BFM is validated analytically (quadratic-OT cost of a translated blob
is .5*|delta|^2) and for self-consistency (W2(f,f) ~ 0, gradient descent
direction reduces the distance) — mirroring the intent of the reference's
``test_misfit.py`` comparison script.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from devito_fwi_tpu.misfit import least_square, qWasserstein, bfm_jax


def _ricker(t, f0=5.0, t0=0.25):
    r = np.pi * f0 * (t - t0)
    return (1 - 2 * r**2) * np.exp(-(r**2))


def test_least_square():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 7)).astype(np.float32)
    y = rng.normal(size=(100, 7)).astype(np.float32)
    fval, res = least_square(x, y)
    assert np.isclose(fval, 0.5 * np.sum((x - y) ** 2), rtol=1e-6)
    np.testing.assert_allclose(res, x - y)


def test_w2_1d_identical_zero():
    t = np.linspace(0, 1, 200)
    f = np.float64(_ricker(t) + 2.0)  # positive
    w2 = qWasserstein(trans_type='linear', method='1d')
    loss, grad = w2(f, f)
    assert loss < 1e-12


def test_w2_1d_shift_quadratic():
    # W2^2 between a density and its translate grows ~ shift^2
    t = np.linspace(0, 1, 400)
    base = np.exp(-((t - 0.4) / 0.05) ** 2)
    w2 = qWasserstein(trans_type='linear', method='1d')
    losses = []
    for shift in (0.05, 0.1):
        g = np.exp(-((t - 0.4 - shift) / 0.05) ** 2)
        loss, _ = w2(base, g)
        losses.append(loss)
    assert losses[1] / losses[0] == pytest.approx(4.0, rel=0.1)


def test_w2_1d_gradient_descent_direction():
    t = np.linspace(0, 1, 300)
    f = _ricker(t, t0=0.3)
    g = _ricker(t, t0=0.5)
    w2 = qWasserstein(trans_type='linear', gamma=1.01, method='1d')
    loss, grad = w2(f[:, None], g[:, None])
    assert loss > 0
    # first-order decrease check
    eps = 1e-3 / (np.abs(grad).max() + 1e-30)
    loss2, _ = w2(f[:, None] - eps * grad, g[:, None])
    assert loss2 < loss


def test_bfm_identical_near_zero():
    rng = np.random.default_rng(1)
    x = np.linspace(0, 1, 64)
    y = np.linspace(0, 1, 96)
    f = (np.exp(-((y[:, None] - 0.5) ** 2 + (x[None, :] - 0.5) ** 2) / 0.02)
         + 0.05).astype(np.float32)
    loss, grad = bfm_jax(f, f, num_steps=10, step_scale=1.0)
    assert abs(loss) < 1e-4


def test_bfm_translation_cost():
    # translated blob: optimal transport cost = .5 * delta^2 per unit mass
    n = 128
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x)
    delta = 0.15
    f = np.exp(-((X - 0.35) ** 2 + (Y - 0.5) ** 2) / 0.005).astype(np.float64)
    g = np.exp(-((X - 0.35 - delta) ** 2 + (Y - 0.5) ** 2) / 0.005).astype(np.float64)
    loss, grad = bfm_jax(f, g, num_steps=30, step_scale=1.0)
    # converged BFM is within 1.9% of the analytic cost (the residual is
    # pure discretization: the blob has finite width; running 100+ steps
    # moves the value by <0.3%)
    assert loss == pytest.approx(0.5 * delta ** 2, rel=0.03)
    loss_conv, _ = bfm_jax(f, g, num_steps=100, step_scale=1.0)
    assert loss == pytest.approx(loss_conv, rel=5e-3)
    # gradient must push f toward g: descent reduces the distance
    eps = 0.02 / np.abs(np.asarray(grad)).max()
    loss2, _ = bfm_jax(f - eps * np.asarray(grad) * f.mean(), g,
                       num_steps=30, step_scale=1.0)
    assert loss2 < loss


def _gather_batch(B=3, nt=160, ntr=24, seed=2):
    """Small positive shot-gather-like stack with per-shot time shifts."""
    t = np.linspace(0, 1, nt)
    out = []
    for b in range(B):
        tr = _ricker(t, t0=0.3 + 0.03 * b)[:, None] * np.ones((1, ntr))
        tr = tr + 0.002 * np.sin(7 * t)[:, None] * (b + 1)
        out.append(tr + 1.05 * abs(tr.min()))  # positive
    return np.stack(out).astype(np.float64)


def test_bfm_banded_pushforward_matches_scatter():
    """The local-base banded-matmul pushforward must reproduce the exact
    scatter (same additions) across non-multiple-of-row_block heights,
    batched shots, and LARGE absolute displacements (the local window
    re-bases per row block, so a 40-row uniform shift must still take
    the fast path); a local variation wider than the window must be
    detected, not silently truncated."""
    import importlib

    import jax
    B = importlib.import_module("devito_fwi_tpu.misfit.bfm")

    rng = np.random.default_rng(3)
    n1, n2, nsub, Bb = 24, 90, 2, 3
    mu = jnp.asarray(rng.uniform(0.2, 2.0, size=(Bb, n2, n1)))
    # smooth random potentials -> smooth maps with small displacements
    pot = rng.normal(size=(Bb, n2, n1)) * 1e-3
    from scipy.ndimage import gaussian_filter
    pot = np.stack([gaussian_filter(p, 4) for p in pot])
    xs = (np.arange(n1) + 0.5) / n1
    ys = (np.arange(n2) + 0.5) / n2
    quad = 0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)
    pot = jnp.asarray(pot + quad)

    xMap, yMap = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(pot)
    for shift in (0, 40):   # uniform extra y displacement, in rows
        yM = yMap + shift / n2
        out = jax.vmap(lambda m, xm, ym: B._pushforward_subsamples(
            m, xm, ym, n1, n2, nsub))(mu, xMap, yM)
        subs = out[:7]
        rho_scat = B._scatter_pushforward_batch(subs, n1, n2)
        assert bool(B._local_band_ok(subs, G_local=24, margin=128))
        for cb in (16, 32):
            rho_loc = B._local_banded_pushforward_batch(
                subs, n1, n2, G_local=24, dxmax=7, margin=128,
                col_block=cb)
            np.testing.assert_allclose(np.asarray(rho_loc),
                                       np.asarray(rho_scat),
                                       rtol=1e-12, atol=1e-12)
    # local variation wider than the window: rough potential
    rough = jnp.asarray(quad[None] + rng.normal(size=(Bb, n2, n1)) * 2e-3)
    xM2, yM2 = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(rough)
    out2 = jax.vmap(lambda m, xm, ym: B._pushforward_subsamples(
        m, xm, ym, n1, n2, nsub))(mu, xM2, yM2)
    assert not bool(B._local_band_ok(out2[:7], G_local=2, margin=128))
    assert not bool(B._dx_inband_predicate(out2[:7], 0))


def test_bfm_batch_matches_scatter_path_end_to_end():
    """bfm_jax_batch with the banded fast path (large dmax) must agree
    with the forced-scatter fallback (dmax too small for the maps)."""
    from devito_fwi_tpu.misfit.bfm import bfm_jax_batch

    fb = _gather_batch()
    gb = np.roll(fb, 5, axis=1)
    l_fast, g_fast = bfm_jax_batch(fb, gb, num_steps=8, step_scale=1.0,
                                   dmax=31)
    l_slow, g_slow = bfm_jax_batch(fb, gb, num_steps=8, step_scale=1.0,
                                   dmax=0)
    np.testing.assert_allclose(np.asarray(l_fast), np.asarray(l_slow),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                               rtol=1e-8, atol=1e-10)


def test_bfm_batch_matches_single():
    """Batch solver rows == single-gather solver on each row."""
    from devito_fwi_tpu.misfit.bfm import bfm_jax_batch

    fb = _gather_batch()
    gb = np.roll(fb, 4, axis=1)
    lb, gradb = bfm_jax_batch(fb, gb, num_steps=10, step_scale=1.0)
    for i in range(fb.shape[0]):
        li, gi = bfm_jax(fb[i], gb[i], num_steps=10, step_scale=1.0)
        assert float(lb[i]) == pytest.approx(float(li), rel=1e-10)
        np.testing.assert_allclose(np.asarray(gradb[i]), np.asarray(gi),
                                   rtol=1e-8, atol=1e-12)


def test_qwasserstein_jax_batch_matches_vmap():
    """qWasserstein.jax_batch (batch-native BFM route) == vmapped
    per-shot qWasserstein.jax, for both 2d and 1d methods."""
    import jax

    fb = jnp.asarray(_gather_batch() - 1.0)   # signed traces
    gb = jnp.roll(fb, 3, axis=1)
    for method in ("2d", "1d"):
        w2 = qWasserstein(trans_type='linear', gamma=1.01, method=method,
                          num_steps=6, step_scale=1.0)
        lb, rb = w2.jax_batch(fb, gb)
        lv, rv = jax.vmap(w2.jax)(fb, gb)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(lv),
                                   rtol=1e-8)
        np.testing.assert_allclose(np.asarray(rb), np.asarray(rv),
                                   rtol=1e-7, atol=1e-11)


def test_qwasserstein_2d_dispatch():
    t = np.linspace(0, 1, 120)
    f = _ricker(t, t0=0.3)[:, None] * np.ones((1, 48))
    g = _ricker(t, t0=0.4)[:, None] * np.ones((1, 48))
    w2 = qWasserstein(trans_type='linear', gamma=1.01, method='2d',
                      num_steps=10, step_scale=1.0)
    loss, grad = w2(f.astype(np.float32), g.astype(np.float32))
    assert np.isfinite(loss) and loss > 0
    assert grad.shape == f.shape
    with pytest.raises(ValueError):
        w2(f[:, 0], g[:, 0])


def test_fwi_obj_single_resample_path():
    """Host objective path with trace resampling to a coarser misfit dt
    (reference fwi.py:139-159 + --resample flag)."""
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
    from devito_fwi_tpu.misfit import least_square

    shape, spacing = (41, 41), (10., 10.)
    tm = demo_model('circle-isotropic', vp_circle=3.2, vp_background=3.0,
                    r=8, origin=(0., 0.), shape=shape, spacing=spacing,
                    space_order=4, nbl=10, dt=1.2)
    im = demo_model('circle-isotropic', vp_circle=3.0, vp_background=3.0,
                    r=8, origin=(0., 0.), shape=shape, spacing=spacing,
                    space_order=4, nbl=10, dt=1.2)
    src = np.stack([np.full(2, 20.0), np.linspace(50, 350, 2)], axis=1)
    rec = np.stack([np.full(11, 380.0), np.linspace(0, 400, 11)], axis=1)
    g1 = AcquisitionGeometry(tm, rec, src, 0., 200., f0=0.010,
                             src_type='Ricker')
    g0 = AcquisitionGeometry(im, rec, src, 0., 200., f0=0.010,
                             src_type='Ricker')
    obs = fm_multi(g1)
    f_ref, grad_ref, _ = fwi_obj_multi(g0, obs, least_square,
                                       calc_grad=True)
    # coarser misfit sampling: value differs but gradient stays aligned
    f_rs, grad_rs, _ = fwi_obj_multi(g0, obs, least_square,
                                     calc_grad=True, resample_dt=3.0)
    assert np.isfinite(f_rs) and f_rs > 0
    gr = grad_ref / np.abs(grad_ref).max()
    gs = grad_rs / np.abs(grad_rs).max()
    corr = np.corrcoef(gr.ravel(), gs.ravel())[0, 1]
    assert corr > 0.95


def test_host_misfit_path_matches_fused():
    """The batched host-misfit objective (native BFM / numpy misfits) must
    match the fused on-device path."""
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
    from devito_fwi_tpu.misfit import qWasserstein, native

    shape, spacing = (41, 41), (10., 10.)
    tm = demo_model('circle-isotropic', vp_circle=3.2, vp_background=3.0,
                    r=8, origin=(0., 0.), shape=shape, spacing=spacing,
                    space_order=4, nbl=10, dt=1.2)
    im = demo_model('circle-isotropic', vp_circle=3.0, vp_background=3.0,
                    r=8, origin=(0., 0.), shape=shape, spacing=spacing,
                    space_order=4, nbl=10, dt=1.2)
    src = np.stack([np.full(3, 20.0), np.linspace(50, 350, 3)], axis=1)
    rec = np.stack([np.full(21, 380.0), np.linspace(0, 400, 21)], axis=1)
    g1 = AcquisitionGeometry(tm, rec, src, 0., 300., f0=0.010,
                             src_type='Ricker')
    g0 = AcquisitionGeometry(im, rec, src, 0., 300., f0=0.010,
                             src_type='Ricker')
    obs = fm_multi(g1)

    wj = qWasserstein(gamma=1.01, method="2d", num_steps=8, step_scale=1.)
    f_j, grad_j, _ = fwi_obj_multi(g0, obs, wj, calc_grad=True)

    if native.available():
        wn = qWasserstein(gamma=1.01, method="2d", num_steps=8,
                          step_scale=1., bfm_backend="native")
        f_n, grad_n, _ = fwi_obj_multi(g0, obs, wn, calc_grad=True)
        assert np.isclose(f_n, f_j, rtol=1e-3)
        scale = np.abs(grad_j).max()
        assert np.abs(grad_n - grad_j).max() < 1e-2 * scale



def test_bfm_batch_dead_shot_no_nan():
    """A muted (all-zero) gather in the batch must yield loss 0 / grad 0
    for that shot and leave the live shots' results untouched —
    regression for sigma0 = step_scale/0 = inf poisoning the summed
    objective with NaN."""
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import bfm_jax_batch
    rng = np.random.RandomState(3)
    n1, n2 = 16, 60
    f = rng.rand(2, n2, n1).astype(np.float32) + 0.1
    g = rng.rand(2, n2, n1).astype(np.float32) + 0.1
    f[1] = 0.0
    g[1] = 0.0
    losses, grads = bfm_jax_batch(jnp.asarray(f), jnp.asarray(g),
                                  num_steps=5)
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[1]) == 0.0
    assert np.all(np.asarray(grads[1]) == 0.0)
    l_solo, g_solo = bfm_jax_batch(jnp.asarray(f[:1]), jnp.asarray(g[:1]),
                                   num_steps=5)
    assert np.allclose(float(losses[0]), float(l_solo[0]), rtol=1e-6)
    # batch composition changes which (exact) pushforward branch the
    # batch-wide cond picks -> f32 association noise only
    assert np.allclose(np.asarray(grads[0]), np.asarray(g_solo[0]),
                       rtol=1e-4, atol=1e-6)


def test_bfm_batch_explicit_backend_args():
    """push_backend/legendre_banded are call-time static args: explicit
    values must select the variants without env vars (and thus retrace
    rather than reuse a stale cache entry)."""
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import bfm_jax_batch
    rng = np.random.RandomState(4)
    n1, n2 = 20, 72
    f = rng.rand(1, n2, n1).astype(np.float32) + 0.1
    g = np.roll(f, 4, axis=1)
    base = bfm_jax_batch(jnp.asarray(f), jnp.asarray(g), num_steps=4,
                         push_backend="xla", legendre_banded=False)
    # banded legendre is exact (certificate-guarded)
    alt = bfm_jax_batch(jnp.asarray(f), jnp.asarray(g), num_steps=4,
                        push_backend="xla", legendre_banded=True)
    assert np.allclose(np.asarray(base[0]), np.asarray(alt[0]), rtol=1e-5)
    assert np.allclose(np.asarray(base[1]), np.asarray(alt[1]),
                       rtol=1e-4, atol=1e-6)


def test_softplus_chain_factor_is_true_derivative():
    """The softplus chain-rule factor must be the TRUE derivative
    d(mu)/df = gamma*sigmoid(gamma*f) — the reference's
    gamma*exp(gamma*f) is unbounded and makes the gradient point the
    wrong way at large amplitudes (documented divergence). Checked by
    FD on the transform itself, plus a descent check on the misfit."""
    from devito_fwi_tpu.misfit.w2 import transform_jax
    import jax.numpy as jnp
    rng = np.random.RandomState(5)
    f = jnp.asarray(rng.randn(40, 6) * 2.0)
    g = jnp.asarray(rng.randn(40, 6))
    gamma, h = 1.3, 1e-6
    _, _, d = transform_jax(f, g, "softplus", gamma)
    mu_p = transform_jax(f + h, g, "softplus", gamma)[0]
    mu_m = transform_jax(f - h, g, "softplus", gamma)[0]
    fd = np.asarray((mu_p - mu_m) / (2 * h))
    np.testing.assert_allclose(np.asarray(d), fd, rtol=1e-4)
    # and the full softplus misfit gradient is a descent direction
    fh = rng.randn(80, 7)
    gh = np.roll(fh, 4, axis=0)
    w2 = qWasserstein(trans_type='softplus', gamma=1.0, method='1d')
    loss0, grad = w2(fh, gh)
    eps = 1e-3 / (np.abs(grad).max() + 1e-30)
    loss1, _ = w2(fh - eps * grad, gh)
    assert loss1 < loss0


def test_w2_1d_dead_trace_no_nan():
    """An all-zero trace must contribute loss 0 / grad 0, not NaN."""
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.w2 import w2_1d_jax
    f = jnp.zeros(50, jnp.float32)
    g = jnp.zeros(50, jnp.float32)
    loss, grad = w2_1d_jax(f, g)
    assert float(loss) == 0.0 and np.all(np.asarray(grad) == 0.0)


def test_qwasserstein_gamma_mutation_retraces():
    """Mutating attributes between calls must not silently reuse the
    jitted function traced with the old constants."""
    rng = np.random.RandomState(6)
    f = np.abs(rng.randn(40, 5)) + 0.5
    g = np.roll(f, 2, axis=0)
    w2 = qWasserstein(trans_type='exp', gamma=0.5, method='1d')
    l1, _ = w2(f, g)
    w2.gamma = 2.0
    l2, _ = w2(f, g)
    w2b = qWasserstein(trans_type='exp', gamma=2.0, method='1d')
    l2_ref, _ = w2b(f, g)
    # a stale cache hit would return l1 BIT-identically; a retrace gives
    # exactly the fresh instance's value
    assert l2 == pytest.approx(l2_ref, rel=1e-12)
    assert l2 != l1

def test_legendre_anchor_exact_and_certificate():
    """The anchored block-banded Legendre transform matches the full
    transform to within FMA contraction (<= 1 ulp of s_i*s_j, i.e.
    ~6e-8 absolute) whenever its sampled-argmax certificate passes, and
    ``_legendre_last_anchor_fast`` is BIT-exact on certificate failure
    (it takes the full-transform lax.cond branch)."""
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import (
        _legendre_last, _legendre_last_anchored, _legendre_last_anchor_fast)
    rng = np.random.RandomState(7)
    # smooth near-quadratic potential: small displacement, certificate holds
    n = 640
    s = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    x = np.asarray(s)
    u_s = np.stack([0.5 * x ** 2 + 1e-3 * np.sin(40 * x + p)
                    for p in rng.uniform(0, 6, 5)]).astype(np.float32)
    ref = _legendre_last(jnp.asarray(u_s), s)
    out, ok = _legendre_last_anchored(jnp.asarray(u_s), s)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # adversarial potential: huge displacement, certificate must fail
    # and the fast wrapper must still be exact via the fallback
    u_r = rng.randn(5, n).astype(np.float32)
    _, ok_r = _legendre_last_anchored(jnp.asarray(u_r), s)
    assert not bool(ok_r)
    fast = _legendre_last_anchor_fast(jnp.asarray(u_r), s)
    assert np.array_equal(np.asarray(fast),
                          np.asarray(_legendre_last(jnp.asarray(u_r), s)))
    # leading batch dims + non-multiple-of-block lengths
    u3 = rng.randn(2, 3, 333).astype(np.float32)
    s3 = (jnp.arange(333, dtype=jnp.float32) + 0.5) / 333
    assert np.array_equal(
        np.asarray(_legendre_last_anchor_fast(jnp.asarray(u3), s3)),
        np.asarray(_legendre_last(jnp.asarray(u3), s3)))


def test_bfm_batch_legendre_anchor_end_to_end():
    """legendre_banded='anchor' is a supported static mode of the batch
    BFM and matches the full-transform solver."""
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import bfm_jax_batch
    rng = np.random.RandomState(11)
    n1, n2 = 20, 144
    f = rng.rand(2, n2, n1).astype(np.float32) + 0.1
    g = np.roll(f, 3, axis=1)
    base = bfm_jax_batch(jnp.asarray(f), jnp.asarray(g), num_steps=4,
                         push_backend="xla", legendre_banded="full")
    alt = bfm_jax_batch(jnp.asarray(f), jnp.asarray(g), num_steps=4,
                        push_backend="xla", legendre_banded="anchor")
    assert np.allclose(np.asarray(base[0]), np.asarray(alt[0]), rtol=1e-5)
    assert np.allclose(np.asarray(base[1]), np.asarray(alt[1]),
                       rtol=1e-4, atol=1e-6)


def test_qwasserstein_2d_dead_gather_no_nan():
    """The 2-D qWasserstein's grad/mass division must not resurrect the
    BFM's zero dead-gather gradient as 0/0 = NaN (all four mass sites:
    jax, jax_batch, __call__, batch)."""
    rng = np.random.RandomState(7)
    n1, n2 = 16, 60
    f = rng.rand(2, n2, n1).astype(np.float32) + 0.1
    g = rng.rand(2, n2, n1).astype(np.float32) + 0.1
    f[1] = 0.0
    g[1] = 0.0
    w2 = qWasserstein(method="2d", num_steps=4)
    losses, grads = w2.jax_batch(jnp.asarray(f), jnp.asarray(g))
    assert np.isfinite(np.asarray(losses)).all()
    assert np.isfinite(np.asarray(grads)).all()
    assert float(losses[1]) == 0.0
    assert np.all(np.asarray(grads[1]) == 0.0)
    loss1, grad1 = w2.jax(jnp.asarray(f[1]), jnp.asarray(g[1]))
    assert float(loss1) == 0.0
    assert np.all(np.isfinite(np.asarray(grad1)))
    loss_h, grad_h = w2(f[1], g[1])
    assert loss_h == 0.0
    assert np.all(np.isfinite(grad_h))


def test_misfit_config_key_tracks_mutation_and_env(monkeypatch):
    """fwi's _TraceableMisfit wrapper must change its jit static key when
    the misfit's scalar config mutates or a BFM backend env var toggles
    (the bound-method staleness footgun)."""
    from devito_fwi_tpu.fwi import _TraceableMisfit
    w2 = qWasserstein(method="1d", gamma=1.0)
    k1 = _TraceableMisfit(w2.jax)
    k2 = _TraceableMisfit(w2.jax)
    assert k1 == k2 and hash(k1) == hash(k2)
    w2.gamma = 2.0
    k3 = _TraceableMisfit(w2.jax)
    assert k3 != k1
    # an equal-config distinct instance shares the key (cache reuse)
    w2b = qWasserstein(method="1d", gamma=2.0)
    assert _TraceableMisfit(w2b.jax) == k3
    # BFM env toggles enter the key only for the 2d/jax configuration
    w2c = qWasserstein(method="2d", bfm_backend="jax")
    ka = _TraceableMisfit(w2c.jax_batch)
    monkeypatch.setenv("DEVITO_FWI_TPU_BFM_PUSH", "xla")
    kb = _TraceableMisfit(w2c.jax_batch)
    assert ka != kb


def test_fused_objective_misfit_mutation_retraces():
    """End-to-end: mutating the misfit between fwi_obj_multi calls must
    retrace the fused objective, not reuse the stale trace."""
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
    model = demo_model("layers-isotropic", shape=(41, 31),
                       spacing=(10., 10.), nbl=10, space_order=4,
                       nlayers=2, dt=1.5)
    model0 = demo_model("layers-isotropic", shape=(41, 31),
                        spacing=(10., 10.), nbl=10, space_order=4,
                        nlayers=1, dt=1.5)
    src = np.array([[200.0, 20.0]])
    rec = np.stack([np.linspace(0, model.domain_size[0], 21),
                    np.full(21, 20.0)], 1)
    geo = AcquisitionGeometry(model, rec, src, 0.0, 200.0, f0=0.015,
                              src_type="Ricker")
    geo0 = AcquisitionGeometry(model0, rec, src, 0.0, 200.0, f0=0.015,
                               src_type="Ricker")
    obs = fm_multi(geo)
    w2 = qWasserstein(trans_type="exp", gamma=0.01, method="1d")
    f1, _, _ = fwi_obj_multi(geo0, obs, w2)
    w2.gamma = 0.05
    f2, _, _ = fwi_obj_multi(geo0, obs, w2)
    w2_fresh = qWasserstein(trans_type="exp", gamma=0.05, method="1d")
    f2_ref, _, _ = fwi_obj_multi(geo0, obs, w2_fresh)
    assert f2 == pytest.approx(f2_ref, rel=1e-12)
    assert f2 != f1
