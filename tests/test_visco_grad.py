"""Viscoacoustic FWI gradient gates (the reference has NO viscoacoustic
gradient — its stack stops at fwd+adjoint operators,
``seismic/viscoacoustic/wavesolver.py:60-206``). Same discipline as the
elastic suite: seg==plain forward parity, f64 FD checks for BOTH vp and
qp (attenuation inversion), and objective-level FD consistency through
the public path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
from devito_fwi_tpu.misfit import least_square
from devito_fwi_tpu.ops import viscoacoustic as va
from devito_fwi_tpu.ops.interp import interp_table
from devito_fwi_tpu.visco_fwi import (ViscoFwiLoss, visco_fm_multi,
                                      visco_fwi_obj_multi)


def _setup(dtype=np.float64, shape=(41, 36), tn=140., nbl=8, nsrc=1,
           dt=1.0):
    vp = np.full(shape, 2.0, dtype)
    vp[:, 18:] = 2.4
    qp = np.full(shape, 60.0, dtype)
    qp[:, 18:] = 90.0
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(dtype)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, qp=qp, b=(1.0 / rho),
                         nbl=nbl, bcs="mask", dtype=dtype, dt=dt)
    src = np.stack([np.linspace(80., 320., nsrc), np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., tn, f0=0.015,
                               src_type="Ricker")
    return model, geom


def _args(model, geom):
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    b = np.asarray(model.b, model.dtype)
    damp = np.asarray(model.damp, model.dtype)
    return (jnp.asarray(b), jnp.asarray(damp), jnp.asarray(geom.src.data),
            jnp.asarray(s_idx), jnp.asarray(s_w), jnp.asarray(r_idx),
            jnp.asarray(r_w))


@pytest.mark.parametrize("kernel,to", [("sls", 2), ("sls", 1),
                                       ("ren", 2), ("deng_mcmechan", 2)])
def test_seg_forward_matches_plain(kernel, to):
    model, geom = _setup(dtype=np.float32)
    b, damp, wav, si, sw, ri, rw = _args(model, geom)
    kw = dict(kernel=kernel, time_order=to, nt=geom.nt,
              spacing=model.spacing, space_order=4)
    vp = jnp.asarray(np.asarray(model.vp, np.float32))
    qp = jnp.asarray(np.asarray(model.qp, np.float32))
    dt = float(model.critical_dt)
    rec, _ = va.forward(vp, b, qp, damp, wav, si, sw, ri, rw, dt,
                        geom.f0, **kw)
    rec_s, illum = jax.jit(lambda *a: va.forward_seg(
        *a, dt, geom.f0, n_checkpoints=5, **kw))(vp, b, qp, damp, wav,
                                                 si, sw, ri, rw)
    a = np.asarray(rec)
    scale = max(np.abs(a).max(), 1e-12)
    assert np.abs(np.asarray(rec_s) - a).max() < 1e-6 * scale
    assert np.asarray(illum).max() > 0


def test_gradient_matches_fd_f64_vp_and_qp():
    """Central-difference check of d(loss)/d(vp) AND d(loss)/d(qp)
    through the rematted sls/2 scan in f64 — the Q-FWI gate."""
    model, geom = _setup(dtype=np.float64)
    b, damp, wav, si, sw, ri, rw = _args(model, geom)
    kw = dict(kernel="sls", time_order=2, nt=geom.nt,
              spacing=model.spacing, space_order=4, n_checkpoints=6)
    dt = float(model.critical_dt)
    vp = np.asarray(model.vp)
    qp = np.asarray(model.qp)

    def loss(vp_, qp_):
        rec, _ = va.forward_seg(vp_, b, qp_, damp, wav, si, sw, ri, rw,
                                dt, geom.f0, **kw)
        return 0.5 * jnp.sum(rec * rec)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))(jnp.asarray(vp),
                                                jnp.asarray(qp))
    rng = np.random.RandomState(9)
    from scipy.ndimage import gaussian_filter
    for i, (name, base) in enumerate((("vp", vp), ("qp", qp))):
        d = gaussian_filter(rng.randn(*base.shape), 3)
        d *= 1e-3 * np.abs(base).mean() / np.abs(d).max()
        args = [jnp.asarray(vp), jnp.asarray(qp)]
        ap, am = list(args), list(args)
        ap[i] = jnp.asarray(base + d)
        am[i] = jnp.asarray(base - d)
        fd = (float(loss(*ap)) - float(loss(*am))) / 2.0
        an = float(jnp.sum(g[i] * jnp.asarray(d)))
        assert abs(fd - an) <= 5e-5 * max(abs(fd), abs(an), 1e-16), \
            (name, fd, an)
        assert abs(an) > 0, name


def test_obj_multi_fd_consistency():
    """visco_fwi_obj_multi's vp gradient (precond/fix off) is the
    gradient of its own fval (FD through the public path)."""
    model, geom = _setup(dtype=np.float64, nsrc=2)
    obs = visco_fm_multi(geom)
    vp0 = np.asarray(model.vp)[tuple(
        slice(lo, lo + n) for (lo, _), n in zip(model.padsizes,
                                                model.shape))] * 1.02

    def f_only(v):
        f, _, _ = visco_fwi_obj_multi(
            geom, obs, least_square, precond=False, illum_fix=False,
            calc_grad=False, vp=v, shot_chunk=2, n_checkpoints=6)
        return f

    f0, g, _ = visco_fwi_obj_multi(
        geom, obs, least_square, precond=False, illum_fix=False,
        calc_grad=True, vp=vp0, shot_chunk=2, n_checkpoints=6)
    rng = np.random.RandomState(13)
    from scipy.ndimage import gaussian_filter
    d = gaussian_filter(rng.randn(*model.shape), 3)
    d *= 1e-4 * np.abs(vp0).mean() / np.abs(d).max()
    fd = (f_only(vp0 + d) - f_only(vp0 - d)) / 2.0
    an = float(np.sum(g["vp"] * d))
    assert abs(fd - an) <= 5e-5 * max(abs(fd), abs(an), 1e-16), (fd, an)
    assert np.abs(g["qp"]).max() > 0  # attenuation gradient flows too

    # the loss adapter applies the squared-slowness chain rule
    x0 = (1.0 / vp0 ** 2).reshape(-1)
    loss = ViscoFwiLoss(shot_chunk=2, n_checkpoints=6)
    fl, gl, _ = loss(x0, geom, obs, least_square, precond=False,
                     calc_grad=True)
    assert np.isfinite(gl).all()


def test_viscoelastic_seg_and_gradient_fd():
    """Viscoelastic: seg forward == plain forward, and the f64 FD check
    of d(loss)/d(vp, vs, rho, qp, qs) through the rematted scan — the
    reference models this system forward-only."""
    from devito_fwi_tpu.ops import staggered as st

    shape = (41, 36)
    vp = np.full(shape, 2.0, np.float64)
    vp[:, 18:] = 2.4
    vs = vp / 2.0
    rho = 0.31 * (1e3 * vp) ** 0.25
    qp = np.full(shape, 60.0, np.float64)
    qs = np.full(shape, 40.0, np.float64)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, vs=vs, b=1.0 / rho, qp=qp,
                         qs=qs, nbl=8, bcs="mask", dtype=np.float64,
                         dt=0.8)
    src = np.array([[200.0, 20.0]])
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 120., f0=0.015,
                               src_type="Ricker")
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    damp = jnp.asarray(np.asarray(model.damp))
    wav = jnp.asarray(geom.src.data)
    dt = float(model.critical_dt)
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4)
    ja = jnp.asarray

    def fields(vp_, vs_, rho_):
        lam = rho_ * (vp_ * vp_ - 2.0 * vs_ * vs_)
        mu = rho_ * vs_ * vs_
        return lam, mu, 1.0 / rho_

    pads = tuple(tuple(p) for p in model.padsizes)

    def pad(x):
        return jnp.pad(x, pads, mode="edge")

    # seg == plain parity on the padded model fields
    args_pl = (ja(np.asarray(model.lam)), ja(np.asarray(model.mu)),
               ja(np.asarray(model.b)), ja(np.asarray(model.qp)),
               ja(np.asarray(model.qs)), damp, geom.f0, wav, ja(s_idx),
               ja(s_w), ja(r_idx), ja(r_w), dt)
    r1, r2 = st.viscoelastic_forward(*args_pl, **kw)
    r1s, r2s, illum = jax.jit(lambda *a: st.viscoelastic_forward_seg(
        *a, n_checkpoints=5, **kw))(*args_pl)
    for a, b_ in ((r1, r1s), (r2, r2s)):
        a = np.asarray(a)
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(np.asarray(b_) - a).max() < 1e-9 * scale
    assert np.asarray(illum).max() > 0

    # FD gate over all five physical parameters
    def loss(vp_, vs_, rho_, qp_, qs_):
        lam, mu, b = fields(pad(vp_), pad(vs_), pad(rho_))
        rec1, _, _ = st.viscoelastic_forward_seg(
            lam, mu, b, pad(qp_), pad(qs_), damp, geom.f0, wav, ja(s_idx),
            ja(s_w), ja(r_idx), ja(r_w), dt, n_checkpoints=5, **kw)
        return 0.5 * jnp.sum(rec1 * rec1)

    base = [ja(np.asarray(x)) for x in (vp, vs, rho, qp, qs)]
    g = jax.jit(jax.grad(loss, argnums=tuple(range(5))))(*base)
    rng = np.random.RandomState(17)
    from scipy.ndimage import gaussian_filter
    names = ("vp", "vs", "rho", "qp", "qs")
    for i in (0, 1, 3):  # vp, vs, qp (rho/qs analogous; keep runtime lean)
        bx = np.asarray(base[i])
        d = gaussian_filter(rng.randn(*bx.shape), 3)
        d *= 1e-3 * np.abs(bx).mean() / np.abs(d).max()
        ap, am = list(base), list(base)
        ap[i] = ja(bx + d)
        am[i] = ja(bx - d)
        fd = (float(loss(*ap)) - float(loss(*am))) / 2.0
        an = float(jnp.sum(g[i] * ja(d)))
        assert abs(fd - an) <= 5e-5 * max(abs(fd), abs(an), 1e-16), \
            (names[i], fd, an)
        assert abs(an) > 0, names[i]


def test_saved_gradient_matches_vjp_visco():
    """The hand-written sls/2 adjoint over the saved (L, rn) history
    (ops/visco_grad.py, the fast path) reproduces the rematted jax.vjp
    (vp, qp) gradient to f64 roundoff through the public objective —
    including the 2nd-order source scale's vp^2 dependence."""
    from devito_fwi_tpu.visco_fwi import (visco_fm_multi,
                                          visco_fwi_obj_multi, _field)
    from devito_fwi_tpu.misfit import least_square

    model, geom = _setup(dtype=np.float64, tn=140., nsrc=2)
    obs = visco_fm_multi(geom)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in
                 zip(model.padsizes, model.shape))
    vp0 = np.asarray(_field(model, "vp"))[crop] * 1.02
    common = dict(misfit_func=least_square, precond=False,
                  illum_fix=True, calc_grad=True, vp=vp0, shot_chunk=2)
    f_v, g_v, _ = visco_fwi_obj_multi(geom, obs, grad_route="vjp",
                                      **common)
    f_s, g_s, _ = visco_fwi_obj_multi(geom, obs, grad_route="saved",
                                      **common)
    assert abs(f_v - f_s) <= 1e-12 * abs(f_v)
    for k in ("vp", "qp"):
        scale = np.abs(g_v[k]).max()
        assert np.abs(g_v[k] - g_s[k]).max() <= 1e-12 * scale, k


def test_visco_born_linearization_and_adjoint_dot():
    """Born (jvp) viscoacoustic sls/2 linearization in (vp, qp): O(h^2)
    convergence and the adjoint dot test against the hand-written
    saved-history sweep (forward-mode AD vs the explicit reverse
    recursion)."""
    from devito_fwi_tpu.ops import visco_grad as vg
    from devito_fwi_tpu.ops import viscoacoustic as va
    from scipy.ndimage import gaussian_filter

    model, geom = _setup(dtype=np.float64, tn=140.)
    b, damp, wav, s_idx, s_w, r_idx, r_w = _args(model, geom)
    vp = jnp.asarray(np.asarray(model.vp, np.float64))
    qp = jnp.asarray(np.asarray(model.qp, np.float64))
    dt = float(model.critical_dt)
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4)
    rng = np.random.RandomState(4)
    dvp = gaussian_filter(rng.randn(*vp.shape), 3)
    dvp *= 1e-2 * float(jnp.abs(vp).mean()) / np.abs(dvp).max()
    dqp = gaussian_filter(rng.randn(*qp.shape), 3)
    dqp *= 1e-2 * float(jnp.abs(qp).mean()) / np.abs(dqp).max()

    rec, drec = vg.visco_born(vp, b, qp, jnp.asarray(dvp),
                              jnp.asarray(dqp), damp, wav, s_idx, s_w,
                              r_idx, r_w, dt, geom.f0, **kw)
    errs = []
    for h in (1.0, 0.5, 0.25):
        pert, _ = va.forward(vp + h * jnp.asarray(dvp), b,
                             qp + h * jnp.asarray(dqp), damp, wav,
                             s_idx, s_w, r_idx, r_w, dt, geom.f0,
                             kernel="sls", time_order=2, **kw)
        lin = np.asarray(rec) + h * np.asarray(drec)
        errs.append(np.linalg.norm(np.asarray(pert) - lin))
    slopes = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for sl in slopes:
        assert 1.8 < sl < 2.2, (slopes, errs)

    dr = rng.randn(*np.asarray(rec).shape)
    _, _, hist = vg.visco_sls2_forward_hist(vp, b, qp, damp, wav, s_idx,
                                            s_w, r_idx, r_w, dt, geom.f0,
                                            **kw)
    g_vp, g_qp = vg.visco_sls2_adjoint_from_hist(
        vp, b, qp, damp, wav, s_idx, s_w, r_idx, r_w, jnp.asarray(dr),
        hist, dt, geom.f0, **kw)
    lhs = float(jnp.sum(jnp.asarray(drec) * jnp.asarray(dr)))
    rhs = float(jnp.sum(g_vp * jnp.asarray(dvp)) +
                jnp.sum(g_qp * jnp.asarray(dqp)))
    assert abs(lhs - rhs) <= 1e-11 * max(abs(lhs), abs(rhs), 1e-30)


def test_viscoelastic_saved_matches_vjp():
    """The hand-written SLS viscoelastic adjoint over the saved
    (vn, dtau, rdn, ron) history reproduces the rematted jax.vjp
    gradient for ALL FIVE parameters (vp, vs, rho, qp, qs) to f64
    roundoff — including the relaxation-time chain rules, which go
    through a pointwise vjp of the coefficient map."""
    from devito_fwi_tpu.elastic_fwi import model_vp_vs_rho
    from devito_fwi_tpu.ops import staggered as st
    from devito_fwi_tpu.ops import staggered_grad as sg

    shape, dtype = (41, 36), np.float64
    vp = np.full(shape, 2.0, dtype)
    vp[:, 18:] = 2.4
    vs = (vp / 2).astype(dtype)
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(dtype)
    qp = np.full(shape, 60.0, dtype)
    qs = np.full(shape, 40.0, dtype)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                         shape=shape, space_order=4, vp=vp, vs=vs,
                         b=(1.0 / rho), qp=qp, qs=qs, nbl=8, bcs="mask",
                         dtype=dtype, dt=1.0)
    src = np.array([[200., 20.0]])
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 140., f0=0.015,
                               src_type="Ricker")
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=dtype)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=dtype)
    damp = jnp.asarray(np.asarray(model.damp, dtype))
    wav = jnp.asarray(geom.src.data)
    dt = float(model.critical_dt)
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4)
    mvp, mvs, mrho = model_vp_vs_rho(model)
    pvp, pvs, prho = jnp.asarray(mvp), jnp.asarray(mvs), jnp.asarray(mrho)
    pqp = jnp.asarray(np.asarray(model.qp))
    pqs = jnp.asarray(np.asarray(model.qs))
    si, swt = jnp.asarray(s_idx), jnp.asarray(s_w)
    ri, rw = jnp.asarray(r_idx), jnp.asarray(r_w)
    res = jnp.asarray(np.random.RandomState(0).randn(geom.nt, 21))

    def fwd(vp_, vs_, rho_, qp_, qs_):
        lam = rho_ * (vp_ * vp_ - 2 * vs_ * vs_)
        mu = rho_ * vs_ * vs_
        r1, _, _ = st.viscoelastic_forward_seg(
            lam, mu, 1.0 / rho_, qp_, qs_, damp, geom.f0, wav, si, swt,
            ri, rw, dt, **kw)
        return jnp.sum(r1 * res)

    g_ref = jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3, 4)))(
        pvp, pvs, prho, pqp, pqs)
    lam = prho * (pvp ** 2 - 2 * pvs ** 2)
    mu = prho * pvs ** 2
    _, _, hist = sg.viscoelastic_forward_hist(
        lam, mu, 1.0 / prho, pqp, pqs, damp, geom.f0, wav, si, swt, ri,
        rw, dt, **kw)
    g_sav = sg.viscoelastic_adjoint_from_hist(
        pvp, pvs, prho, pqp, pqs, damp, geom.f0, ri, rw, res, hist, dt,
        **kw)
    for name, a, b in zip(("vp", "vs", "rho", "qp", "qs"), g_ref, g_sav):
        sc = max(np.abs(np.asarray(a)).max(), 1e-30)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 1e-12 * sc, \
            name


def test_pallas_visco_gradient_matches_saved_interpret():
    """The streamed-history Pallas sls/2 gradient (grad_route='pallas',
    interpreter mode off-TPU) reproduces the XLA saved route to f32
    roundoff through the public objective."""
    from devito_fwi_tpu.visco_fwi import (visco_fm_multi,
                                          visco_fwi_obj_multi, _field)
    from devito_fwi_tpu.misfit import least_square

    model, geom = _setup(dtype=np.float32, tn=140., nsrc=2)
    obs = visco_fm_multi(geom)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in
                 zip(model.padsizes, model.shape))
    vp0 = np.asarray(_field(model, "vp"))[crop] * 1.02
    common = dict(misfit_func=least_square, precond=False,
                  illum_fix=True, calc_grad=True, vp=vp0, shot_chunk=2)
    f_s, g_s, _ = visco_fwi_obj_multi(geom, obs, grad_route="saved",
                                      **common)
    f_p, g_p, _ = visco_fwi_obj_multi(geom, obs, grad_route="pallas",
                                      **common)
    assert abs(f_s - f_p) <= 1e-4 * abs(f_s)
    for k in ("vp", "qp"):
        scale = np.abs(g_s[k]).max()
        assert np.abs(g_s[k] - g_p[k]).max() <= 5e-4 * scale, k


def test_visco_obj_with_w2_misfits():
    """The viscoacoustic objective composes with both optimal-transport
    misfits (W2-1d closed form and the W2-2d batch BFM) on the default
    gradient route."""
    from devito_fwi_tpu.misfit import qWasserstein
    from devito_fwi_tpu.visco_fwi import visco_fm_multi, \
        visco_fwi_obj_multi, _field

    model, geom = _setup(dtype=np.float32, tn=160., nsrc=2)
    obs = visco_fm_multi(geom)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in
                 zip(model.padsizes, model.shape))
    vp0 = np.asarray(_field(model, "vp"))[crop] * 1.03
    for mf in (qWasserstein(gamma=1.01, method="1d"),
               qWasserstein(gamma=1.01, method="2d", num_steps=4,
                            bfm_backend="jax")):
        f, grads, _ = visco_fwi_obj_multi(geom, obs, mf, calc_grad=True,
                                          vp=vp0, shot_chunk=2)
        assert np.isfinite(f) and f > 0
        for k in ("vp", "qp"):
            assert np.isfinite(grads[k]).all()
            assert np.abs(grads[k]).max() > 0, k
