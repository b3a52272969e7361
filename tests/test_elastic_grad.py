"""Elastic FWI gradient gates (the reference has NO elastic adjoint —
its elastic solver is forward-only, ``seismic/elastic/wavesolver.py:25``
— so these follow the reference's gradient-test *style*: the f64 dot
test and FD convergence discipline of
``seismic/self_adjoint/test_wavesolver_iso.py:265-311``).

Covers: segmented forward == plain forward; vjp == finite differences
in f64 for all three parameters (vp, vs, rho); the adjoint dot test
``<J dm, dr> == <dm, J^T dr>``; remat invariance of the gradient to the
checkpoint count; and an end-to-end minimize() smoke that reduces the
misfit with the ElasticFwiLoss adapter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
from devito_fwi_tpu.elastic_fwi import (ElasticFwiLoss, elastic_fm_multi,
                                        elastic_fwi_obj_multi,
                                        model_vp_vs_rho)
from devito_fwi_tpu.misfit import least_square
from devito_fwi_tpu.ops import staggered as st
from devito_fwi_tpu.ops.interp import interp_table


def _setup(dtype=np.float64, shape=(41, 36), tn=160., nbl=8, nsrc=1,
           dt=1.0):
    vp = np.full(shape, 2.0, dtype)
    vp[:, 18:] = 2.4
    vs = (vp / 2.0).astype(dtype)
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(dtype)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, vs=vs, b=(1.0 / rho), nbl=nbl,
                         bcs="mask", dtype=dtype, dt=dt)
    src = np.stack([np.linspace(80., 320., nsrc),
                    np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., tn, f0=0.015,
                               src_type="Ricker")
    return model, geom


def _tables(model, geom):
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    return s_idx, s_w, r_idx, r_w


def test_seg_forward_matches_plain():
    """elastic_forward_seg must reproduce elastic_forward exactly (same
    step function, only the scan nesting differs)."""
    model, geom = _setup(dtype=np.float32)
    s_idx, s_w, r_idx, r_w = _tables(model, geom)
    lam, mu = np.asarray(model.lam), np.asarray(model.mu)
    b = np.asarray(model.b)
    damp = np.ones(model.padded_shape, np.float32)
    wav = geom.src.data
    args = (jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(b),
            jnp.asarray(damp), jnp.asarray(wav), jnp.asarray(s_idx),
            jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w),
            float(model.critical_dt))
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4)
    r1, r2 = st.elastic_forward(*args, **kw)
    r1s, r2s, illum = jax.jit(
        lambda *a: st.elastic_forward_seg(*a, **kw, n_checkpoints=5))(*args)
    for a, b_ in ((r1, r1s), (r2, r2s)):
        a = np.asarray(a)
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(np.asarray(b_) - a).max() < 1e-6 * scale
    assert np.all(np.asarray(illum) >= 0)
    assert np.asarray(illum).max() > 0


def _loss_pieces(model, geom, obs=None):
    s_idx, s_w, r_idx, r_w = _tables(model, geom)
    damp = np.ones(model.padded_shape, model.dtype)
    wav = geom.src.data
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4,
              n_checkpoints=6)

    def loss(vp, vs, rho):
        lam = rho * (vp * vp - 2.0 * vs * vs)
        mu = rho * vs * vs
        rec1, _, _ = st.elastic_forward_seg(
            lam, mu, 1.0 / rho, jnp.asarray(damp), jnp.asarray(wav),
            jnp.asarray(s_idx), jnp.asarray(s_w), jnp.asarray(r_idx),
            jnp.asarray(r_w), float(model.critical_dt), **kw)
        if obs is None:
            return 0.5 * jnp.sum(rec1 * rec1)
        return 0.5 * jnp.sum((rec1 - obs) ** 2)

    return loss


def test_gradient_matches_fd_f64():
    """Central-difference check of d(loss)/d(vp, vs, rho) in f64 —
    the FWI-math gate (reference-style discipline, tolerance per the
    self-adjoint suite's gradient tests)."""
    model, geom = _setup(dtype=np.float64, tn=140.)
    vp, vs, rho = model_vp_vs_rho(model)
    loss = _loss_pieces(model, geom)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho))
    rng = np.random.RandomState(7)
    # smooth interior perturbation (keeps the CFL and the mask region
    # meaningful)
    from scipy.ndimage import gaussian_filter
    for i, (name, base) in enumerate((("vp", vp), ("vs", vs),
                                      ("rho", rho))):
        d = gaussian_filter(rng.randn(*base.shape), 3).astype(np.float64)
        d *= 1e-3 * np.abs(base).mean() / np.abs(d).max()
        eps = 1.0
        args = [jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho)]
        ap = list(args)
        am = list(args)
        ap[i] = jnp.asarray(base + eps * d)
        am[i] = jnp.asarray(base - eps * d)
        fd = (float(loss(*ap)) - float(loss(*am))) / (2 * eps)
        an = float(jnp.sum(g[i] * d))
        assert abs(fd - an) <= 2e-5 * max(abs(fd), abs(an), 1e-12), \
            (name, fd, an)


def test_adjoint_dot_f64():
    """<J dm, dr> == <dm, J^T dr> through the rematted scan (f64),
    the reference's adjoint gate (test_wavesolver_iso.py:265-311)."""
    model, geom = _setup(dtype=np.float64, tn=120.)
    vp, vs, rho = model_vp_vs_rho(model)
    s_idx, s_w, r_idx, r_w = _tables(model, geom)
    damp = np.ones(model.padded_shape, np.float64)
    wav = geom.src.data
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4,
              n_checkpoints=5)

    def fwd(vp_):
        lam = jnp.asarray(rho) * (vp_ * vp_ - 2.0 * jnp.asarray(vs) ** 2)
        mu = jnp.asarray(rho) * jnp.asarray(vs) ** 2
        rec1, _, _ = st.elastic_forward_seg(
            lam, mu, 1.0 / jnp.asarray(rho), jnp.asarray(damp),
            jnp.asarray(wav), jnp.asarray(s_idx), jnp.asarray(s_w),
            jnp.asarray(r_idx), jnp.asarray(r_w),
            float(model.critical_dt), **kw)
        return rec1

    rng = np.random.RandomState(3)
    dm = jnp.asarray(rng.randn(*vp.shape) * 1e-3)
    rec1, jvp_out = jax.jvp(fwd, (jnp.asarray(vp),), (dm,))
    dr = jnp.asarray(rng.randn(*np.asarray(rec1).shape))
    _, vjp_fn = jax.vjp(fwd, jnp.asarray(vp))
    (vjp_out,) = vjp_fn(dr)
    lhs = float(jnp.sum(jvp_out * dr))
    rhs = float(jnp.sum(vjp_out * dm))
    assert abs(lhs - rhs) <= 1e-11 * max(abs(lhs), abs(rhs), 1e-30)


def test_gradient_invariant_to_checkpoint_count():
    """Rematerialization must not change the gradient (same ops,
    recomputed) — checkpoint-count sweep agrees to f64 roundoff."""
    model, geom = _setup(dtype=np.float64, tn=100.)
    vp, vs, rho = model_vp_vs_rho(model)
    s_idx, s_w, r_idx, r_w = _tables(model, geom)
    damp = np.ones(model.padded_shape, np.float64)
    wav = geom.src.data

    def grad_with(nck):
        def loss(vp_):
            lam = jnp.asarray(rho) * (vp_ ** 2 - 2.0 * jnp.asarray(vs) ** 2)
            mu = jnp.asarray(rho) * jnp.asarray(vs) ** 2
            rec1, _, _ = st.elastic_forward_seg(
                lam, mu, 1.0 / jnp.asarray(rho), jnp.asarray(damp),
                jnp.asarray(wav), jnp.asarray(s_idx), jnp.asarray(s_w),
                jnp.asarray(r_idx), jnp.asarray(r_w),
                float(model.critical_dt), nt=geom.nt,
                spacing=model.spacing, space_order=4, n_checkpoints=nck)
            return 0.5 * jnp.sum(rec1 * rec1)
        return np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(vp)))

    g1 = grad_with(1)
    g5 = grad_with(5)
    g13 = grad_with(13)
    scale = np.abs(g1).max()
    assert np.abs(g5 - g1).max() <= 1e-12 * scale
    assert np.abs(g13 - g1).max() <= 1e-12 * scale


def test_obj_multi_fd_consistency():
    """elastic_fwi_obj_multi's gradient (precond/fix/mask off) is the
    gradient of its own fval — FD check through the full public path,
    including the squared-slowness chain rule in ElasticFwiLoss."""
    model, geom = _setup(dtype=np.float64, tn=140., nsrc=2)
    vp, vs, rho = model_vp_vs_rho(model)
    obs1, _ = elastic_fm_multi(geom)
    # perturb the model so the residual is nonzero
    vp0 = np.asarray(model_vp_vs_rho(model)[0]) * 1.02
    crop = tuple(slice(lo, lo + n) for (lo, _), n in
                 zip(model.padsizes, model.shape))
    x0 = (1.0 / vp0[crop] ** 2).reshape(-1)
    loss = ElasticFwiLoss(vs=vs, rho=rho, shot_chunk=2, n_checkpoints=6)

    def f_only(x):
        f, _, _ = elastic_fwi_obj_multi(
            geom, obs1, least_square, precond=False, illum_fix=False,
            calc_grad=False, vp=(1.0 / np.sqrt(x.reshape(model.shape))),
            vs=vs, rho=rho, shot_chunk=2, n_checkpoints=6)
        return f

    f0, g, _ = elastic_fwi_obj_multi(
        geom, obs1, least_square, precond=False, illum_fix=False,
        calc_grad=True, vp=(1.0 / np.sqrt(x0.reshape(model.shape))),
        vs=vs, rho=rho, shot_chunk=2, n_checkpoints=6)
    gm = g["vp"].reshape(-1) * (-0.5 / np.sqrt(x0) ** 3)
    rng = np.random.RandomState(11)
    from scipy.ndimage import gaussian_filter
    d = gaussian_filter(rng.randn(*model.shape), 3).reshape(-1)
    d *= 1e-4 * np.abs(x0).mean() / np.abs(d).max()
    fd = (f_only(x0 + d) - f_only(x0 - d)) / 2.0
    an = float(np.sum(gm * d))
    assert abs(fd - an) <= 5e-5 * max(abs(fd), abs(an), 1e-16), (fd, an)
    # the adapter applies the same chain rule
    fl, gl, _ = loss(x0, geom, obs1, least_square, precond=False,
                     calc_grad=True)
    assert fl == pytest.approx(f0)


def test_elastic_fwi_minimize_smoke():
    """Three steepest-descent iterations on a two-shot toy reduce the
    misfit through minimize(loss_fn=ElasticFwiLoss) — the end-to-end
    elastic-inversion wiring."""
    import tempfile
    from devito_fwi_tpu.optimize import SteepestDescent, minimize

    shape = (41, 36)
    dtype = np.float32
    vp_true = np.full(shape, 2.0, dtype)
    vp_true[14:26, 14:24] = 2.3
    vs = (vp_true * 0 + 1.0).astype(dtype)
    rho = np.ones(shape, dtype)

    def mk(vpa):
        return SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                            shape=shape, space_order=4, vp=vpa, vs=vs,
                            b=1.0 / rho, nbl=8, bcs="mask", dtype=dtype,
                            dt=1.5)

    mt = mk(vp_true)
    m0 = mk(np.full(shape, 2.0, dtype))
    src = np.stack([np.array([100., 300.]), np.full(2, 20.0)], 1)
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 330.0)], 1)
    gt = AcquisitionGeometry(mt, rec, src, 0., 260., f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0., 260., f0=0.015,
                             src_type="Ricker")
    obs1, _ = elastic_fm_multi(gt)
    x0 = (1.0 / np.full(shape, 2.0) ** 2).reshape(-1)
    loss = ElasticFwiLoss(vs=vs, rho=rho, shot_chunk=2, n_checkpoints=6)
    f_init = loss(x0, g0, obs1, least_square, calc_grad=False)[0]
    with tempfile.TemporaryDirectory() as td:
        opt = SteepestDescent(ls_method="Bracket", step_len_init=0.05,
                              max_ls=4, log_path=td)
        m = minimize(opt, maxIter=3, ftol=1e-12, log_path=td,
                     loss_fn=loss).run(
            x0, g0, obs1, least_square, None, None, True,
            [1 / 2.6 ** 2, 1 / 1.6 ** 2])
    f_fin = loss(m, g0, obs1, least_square, calc_grad=False)[0]
    assert f_fin < 0.7 * f_init, (f_init, f_fin)


def test_elastic_3d_forward_and_gradient_fd():
    """3-D velocity-stress forward propagates finite nonzero data and
    the vjp gradient FD-checks in f64 (the step builder is
    dimension-generic; this pins the ndim==3 branch)."""
    shape = (17, 15, 13)
    dtype = np.float64
    vp = np.full(shape, 2.0, dtype)
    vp[:, :, 6:] = 2.3
    vs = (vp / 2.0).astype(dtype)
    rho = np.ones(shape, dtype)
    model = SeismicModel(origin=(0., 0., 0.), spacing=(10., 10., 10.),
                         shape=shape, space_order=4, vp=vp, vs=vs,
                         b=1.0 / rho, nbl=4, bcs="mask", dtype=dtype,
                         dt=1.0)
    src = np.array([[80.0, 70.0, 20.0]])
    rec = np.stack([np.linspace(0., 160., 9), np.full(9, 70.0),
                    np.full(9, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 60., f0=0.02,
                               src_type="Ricker")
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    lam = jnp.asarray(np.asarray(model.lam))
    mu0 = jnp.asarray(np.asarray(model.mu))
    damp = jnp.asarray(np.ones(model.padded_shape, dtype))
    wav = jnp.asarray(geom.src.data)
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4)
    r1, r2 = st.elastic_forward(lam, mu0, jnp.asarray(1.0 / rho.mean())
                                * jnp.ones_like(lam), damp, wav,
                                jnp.asarray(s_idx), jnp.asarray(s_w),
                                jnp.asarray(r_idx), jnp.asarray(r_w),
                                float(model.critical_dt), **kw)
    assert np.isfinite(np.asarray(r1)).all()
    assert np.abs(np.asarray(r1)).max() > 0

    def loss(lam_):
        rec1, _, _ = st.elastic_forward_seg(
            lam_, mu0, jnp.ones_like(lam), damp, wav, jnp.asarray(s_idx),
            jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w),
            float(model.critical_dt), n_checkpoints=4, **kw)
        return 0.5 * jnp.sum(rec1 * rec1)

    g = jax.jit(jax.grad(loss))(lam)
    rng = np.random.RandomState(5)
    from scipy.ndimage import gaussian_filter
    d = gaussian_filter(rng.randn(*model.padded_shape), 2)
    d *= 1e-3 * float(jnp.abs(lam).mean()) / np.abs(d).max()
    fd = (float(loss(lam + d)) - float(loss(lam - d))) / 2.0
    an = float(jnp.sum(g * jnp.asarray(d)))
    assert abs(fd - an) <= 5e-5 * max(abs(fd), abs(an), 1e-16), (fd, an)


def test_saved_gradient_matches_vjp():
    """The hand-written adjoint sweep over the saved history
    (ops.staggered_grad, the TPU fast path) must reproduce the rematted
    jax.vjp gradient to f64 roundoff — fval and all three parameter
    gradients, through the full public objective."""
    model, geom = _setup(dtype=np.float64, tn=140., nsrc=2)
    vp, vs, rho = model_vp_vs_rho(model)
    obs1, _ = elastic_fm_multi(geom)
    vp0 = np.asarray(vp) * 1.02
    common = dict(misfit_func=least_square, precond=False,
                  illum_fix=False, calc_grad=True, vp=vp0, vs=vs,
                  rho=rho, shot_chunk=2, n_checkpoints=6)
    f_v, g_v, _ = elastic_fwi_obj_multi(geom, obs1, grad_route="vjp",
                                        **common)
    f_s, g_s, _ = elastic_fwi_obj_multi(geom, obs1, grad_route="saved",
                                        **common)
    assert abs(f_v - f_s) <= 1e-12 * abs(f_v)
    for k in ("vp", "vs", "rho"):
        scale = np.abs(g_v[k]).max()
        assert np.abs(g_v[k] - g_s[k]).max() <= 1e-12 * scale, k


def test_saved_gradient_matches_vjp_3d_and_fixes():
    """ndim==3 branch of the saved adjoint + the default path with
    illumination fix and precondition on: saved == vjp."""
    shape = (17, 15, 13)
    dtype = np.float64
    vp = np.full(shape, 2.0, dtype)
    vp[:, :, 6:] = 2.3
    vs = (vp / 2.0).astype(dtype)
    rho = np.ones(shape, dtype)
    model = SeismicModel(origin=(0., 0., 0.), spacing=(10., 10., 10.),
                         shape=shape, space_order=4, vp=vp, vs=vs,
                         b=1.0 / rho, nbl=4, bcs="mask", dtype=dtype,
                         dt=1.0)
    src = np.array([[80.0, 70.0, 20.0], [60.0, 50.0, 20.0]])
    rec = np.stack([np.linspace(0., 160., 9), np.full(9, 70.0),
                    np.full(9, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 60., f0=0.02,
                               src_type="Ricker")
    obs1, _ = elastic_fm_multi(geom)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in
                 zip(model.padsizes, model.shape))
    vp0 = np.asarray(model_vp_vs_rho(model)[0])[crop] * 1.02
    common = dict(misfit_func=least_square, precond=True,
                  illum_fix=True, calc_grad=True, vp=vp0,
                  shot_chunk=2, n_checkpoints=4)
    f_v, g_v, _ = elastic_fwi_obj_multi(geom, obs1, grad_route="vjp",
                                        **common)
    f_s, g_s, _ = elastic_fwi_obj_multi(geom, obs1, grad_route="saved",
                                        **common)
    assert abs(f_v - f_s) <= 1e-12 * abs(f_v)
    for k in ("vp", "vs", "rho"):
        scale = np.abs(g_v[k]).max()
        assert np.abs(g_v[k] - g_s[k]).max() <= 1e-12 * scale, k


def test_forward_hist_matches_plain_forward():
    """elastic_forward_hist's receivers are byte-stable vs the plain
    forward (same step builder), and its history carries the quantities
    the adjoint needs (finite, right shape)."""
    from devito_fwi_tpu.ops import staggered_grad as sg

    model, geom = _setup(dtype=np.float32)
    s_idx, s_w, r_idx, r_w = _tables(model, geom)
    lam, mu = np.asarray(model.lam), np.asarray(model.mu)
    b = np.asarray(model.b)
    damp = np.ones(model.padded_shape, np.float32)
    wav = geom.src.data
    args = (jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(b),
            jnp.asarray(damp), jnp.asarray(wav), jnp.asarray(s_idx),
            jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w),
            float(model.critical_dt))
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4)
    r1, _ = st.elastic_forward(*args, **kw)
    r1h, illum, hist = jax.jit(
        lambda *a: sg.elastic_forward_hist(*a, **kw))(*args)
    assert np.array_equal(np.asarray(r1), np.asarray(r1h))
    assert np.asarray(illum).max() > 0
    assert len(hist) == 4
    for h in hist:
        assert h.shape == (geom.nt - 1,) + model.padded_shape
        assert np.isfinite(np.asarray(h)).all()


def test_avg_to_T_and_pad_fold_are_exact_transposes():
    """<A x, y> == <x, A^T y> for the staggered-average and edge-pad
    operators the saved route transposes by hand."""
    from devito_fwi_tpu.ops import staggered_grad as sg

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(9, 11))
    y = jnp.asarray(rng.randn(9, 11))
    for dims in ((0,), (1,), (0, 1)):
        lhs = float(jnp.sum(st.avg_to(x, dims, 2) * y))
        rhs = float(jnp.sum(x * sg.avg_to_T(y, dims, 2)))
        # scale roundoff by the summand magnitude, not the (cancelling)
        # inner product
        assert abs(lhs - rhs) <= 1e-12 * max(abs(lhs), 1.0), dims
    pads = ((3, 2), (1, 4))
    xp = jnp.asarray(rng.randn(9, 11))
    yp = jnp.asarray(rng.randn(9 + 5, 11 + 5))
    lhs = float(jnp.sum(jnp.pad(xp, pads, mode="edge") * yp))
    rhs = float(jnp.sum(xp * sg.pad_fold(yp, pads)))
    assert abs(lhs - rhs) <= 1e-12 * max(abs(lhs), 1.0)


def test_pallas_gradient_matches_saved_interpret():
    """The streamed-history Pallas elastic gradient (grad_route=
    'pallas', interpreter mode off-TPU) reproduces the XLA saved route
    to f32 roundoff through the full public objective — fval and all
    three gradients, with illumination fix on."""
    model, geom = _setup(dtype=np.float32, tn=140., nsrc=2)
    vp, _, _ = model_vp_vs_rho(model)
    obs1, _ = elastic_fm_multi(geom)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in
                 zip(model.padsizes, model.shape))
    vp0 = np.asarray(vp)[crop] * 1.02
    common = dict(misfit_func=least_square, precond=False,
                  illum_fix=True, calc_grad=True, vp=vp0, shot_chunk=2)
    f_s, g_s, _ = elastic_fwi_obj_multi(geom, obs1, grad_route="saved",
                                        **common)
    f_p, g_p, _ = elastic_fwi_obj_multi(geom, obs1, grad_route="pallas",
                                        **common)
    assert abs(f_s - f_p) <= 1e-5 * abs(f_s)
    for k in ("vp", "vs", "rho"):
        scale = np.abs(g_s[k]).max()
        assert np.abs(g_s[k] - g_p[k]).max() <= 1e-4 * scale, k


def test_elastic_obj_with_w2_1d_misfit():
    """The elastic objective composes with the W2-1d optimal-transport
    misfit through the same .jax hook as the acoustic path (misfit
    residual becomes the vjp cotangent)."""
    from devito_fwi_tpu.misfit import qWasserstein

    model, geom = _setup(dtype=np.float32, tn=160., nsrc=2)
    obs1, _ = elastic_fm_multi(geom)
    vp, vs, rho = model_vp_vs_rho(model)
    w1 = qWasserstein(gamma=1.01, method="1d")
    f, grads, _ = elastic_fwi_obj_multi(
        geom, obs1, w1, calc_grad=True,
        vp=np.asarray(vp) * 1.03, vs=vs, rho=rho, shot_chunk=2,
        n_checkpoints=5)
    assert np.isfinite(f) and f > 0
    for k in ("vp", "vs", "rho"):
        assert np.isfinite(grads[k]).all()
        assert np.abs(grads[k]).max() > 0, k


def test_elastic_born_linearization_and_adjoint_dot():
    """Born (jvp) elastic linearization: error of F(m + h dm) - F(m)
    against h J(dm) converges at O(h^2), and <J dm, dr> equals the
    hand-written saved-history adjoint's <dm, J^T dr> — forward-mode AD
    vs the explicit reverse sweep, two fully independent derivative
    paths (the reference has no elastic linearization at all)."""
    from devito_fwi_tpu.ops import staggered_grad as sg
    from scipy.ndimage import gaussian_filter

    model, geom = _setup(dtype=np.float64, tn=140.)
    vp, vs, rho = model_vp_vs_rho(model)
    s_idx, s_w, r_idx, r_w = _tables(model, geom)
    damp = np.ones(model.padded_shape, np.float64)
    wav = geom.src.data
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4)
    rng = np.random.RandomState(9)
    dvp = gaussian_filter(rng.randn(*vp.shape), 3)
    dvp *= 1e-2 * np.abs(vp).mean() / np.abs(dvp).max()
    args = (jnp.asarray(damp), jnp.asarray(wav), jnp.asarray(s_idx),
            jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w),
            float(model.critical_dt))

    (rec1, _), (drec1, _) = sg.elastic_born(
        jnp.asarray(vp), jnp.asarray(vs), jnp.asarray(rho),
        jnp.asarray(dvp), None, None, *args, **kw)

    def fwd_rec1(vp_):
        lam = jnp.asarray(rho) * (vp_ ** 2 - 2.0 * jnp.asarray(vs) ** 2)
        mu = jnp.asarray(rho) * jnp.asarray(vs) ** 2
        from devito_fwi_tpu.ops import staggered as st_
        r1, _ = st_.elastic_forward(lam, mu, 1.0 / jnp.asarray(rho),
                                    *args, **kw)
        return r1

    errs = []
    hs = [1.0, 0.5, 0.25]
    for h in hs:
        pert = np.asarray(fwd_rec1(jnp.asarray(vp + h * dvp)))
        lin = np.asarray(rec1) + h * np.asarray(drec1)
        errs.append(np.linalg.norm(pert - lin))
    slopes = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for sl in slopes:
        assert 1.8 < sl < 2.2, (slopes, errs)

    # adjoint dot test against the HAND reverse sweep
    dr = rng.randn(*np.asarray(rec1).shape)
    lam = jnp.asarray(rho * (vp ** 2 - 2.0 * vs ** 2))
    mu = jnp.asarray(rho * vs ** 2)
    _, _, hist = sg.elastic_forward_hist(
        lam, mu, jnp.asarray(1.0 / rho), *args, **kw)
    glam, gmu, gb = sg.elastic_adjoint_from_hist(
        lam, mu, jnp.asarray(1.0 / rho), jnp.asarray(damp),
        jnp.asarray(r_idx), jnp.asarray(r_w), jnp.asarray(dr), hist,
        float(model.critical_dt), **kw)
    # chain rule to vp (vs, rho fixed): g_vp = 2 rho vp glam
    g_vp = np.asarray(2.0 * jnp.asarray(rho) * jnp.asarray(vp) * glam)
    lhs = float(np.sum(np.asarray(drec1) * dr))
    rhs = float(np.sum(g_vp * dvp))
    assert abs(lhs - rhs) <= 1e-11 * max(abs(lhs), abs(rhs), 1e-30)


def test_elastic_obj_with_w2_2d_misfit():
    """The elastic objective composes with the W2-2d optimal-transport
    misfit (jittable batch BFM) — the misfit residual becomes the
    adjoint sweep's receiver injection, across whichever gradient route
    the backend picks."""
    from devito_fwi_tpu.misfit import qWasserstein

    model, geom = _setup(dtype=np.float32, tn=160., nsrc=2)
    obs1, _ = elastic_fm_multi(geom)
    vp, vs, rho = model_vp_vs_rho(model)
    w2 = qWasserstein(gamma=1.01, method="2d", num_steps=4,
                      bfm_backend="jax")
    f, grads, _ = elastic_fwi_obj_multi(
        geom, obs1, w2, calc_grad=True,
        vp=np.asarray(vp) * 1.03, vs=vs, rho=rho, shot_chunk=2)
    assert np.isfinite(f) and f > 0
    for k in ("vp", "vs", "rho"):
        assert np.isfinite(grads[k]).all()
        assert np.abs(grads[k]).max() > 0, k
