"""On-chip (real TPU) parity drives for the Pallas fast paths.

These encode the manual verification runs as tests: they execute only
when the session's default backend is a real TPU (they are skipped on
the CPU test mesh, where the interpreter-mode tests in test_pallas.py
cover the same numerics) and are marked slow because each compiles a
handful of Mosaic programs (~1-2 min total).
"""
import os

import numpy as np
import pytest
import jax

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs a real TPU chip"),
]


@pytest.fixture(scope="module")
def workload():
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi

    shape, spacing = (150, 80), (20.0, 20.0)
    z = np.linspace(1.6, 3.8, shape[1])[None, :]
    v_true = np.broadcast_to(z, shape).astype(np.float32).copy()
    v_true[60:90, 30:50] += 0.4
    v_init = np.broadcast_to(z, shape).astype(np.float32).copy()
    m1 = SeismicModel(origin=(0., 0.), spacing=spacing, shape=shape,
                      space_order=8, vp=v_true, nbl=40, dt=2.0, bcs="damp")
    m0 = SeismicModel(origin=(0., 0.), spacing=spacing, shape=shape,
                      space_order=8, vp=v_init, nbl=40, dt=2.0, bcs="damp")
    nsrc, nrec = 6, shape[0]
    src = np.stack([np.linspace(0, m1.domain_size[0], nsrc),
                    np.full(nsrc, 40.0)], 1)
    rec = np.stack([np.linspace(0, m1.domain_size[0], nrec),
                    np.full(nrec, 40.0)], 1)
    g1 = AcquisitionGeometry(m1, rec, src, 0., 1500., f0=0.008,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0., 1500., f0=0.008,
                             src_type="Ricker")
    obs = fm_multi(g1)
    return g0, obs


def _grad(g0, obs, misfit, **env):
    from devito_fwi_tpu.fwi import fwi_obj_multi, invalidate_device_caches
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        f, g, _ = fwi_obj_multi(g0, obs, misfit, None, None, True,
                                calc_grad=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return f, np.asarray(g)


def test_streamed_matches_recompute_on_chip(workload):
    from devito_fwi_tpu.misfit import least_square
    g0, obs = workload
    f_r, g_r = _grad(g0, obs, least_square, DEVITO_FWI_TPU_STREAM="0")
    # f32 history: same arithmetic as the recompute path
    f_s, g_s = _grad(g0, obs, least_square, DEVITO_FWI_TPU_STREAM="1",
                     DEVITO_FWI_TPU_HIST="f32")
    assert np.isclose(f_r, f_s, rtol=1e-5)
    scale = np.abs(g_r).max()
    assert np.abs(g_s - g_r).max() < 1e-4 * scale
    # bf16 history (the default): ~0.4% per-sample dt2 rounding
    f_b, g_b = _grad(g0, obs, least_square, DEVITO_FWI_TPU_STREAM="1",
                     DEVITO_FWI_TPU_HIST="bf16")
    assert np.isclose(f_r, f_b, rtol=1e-5)
    assert np.abs(g_b - g_r).max() < 2e-3 * scale


def test_pallas_matches_xla_objective_on_chip(workload):
    """Mosaic vs XLA:TPU — f values agree tightly; gradients only
    loosely (near-source f32 cancellation noise, see
    docs/04_performance.md)."""
    from devito_fwi_tpu.misfit import least_square
    g0, obs = workload
    f_x, _ = _grad(g0, obs, least_square, DEVITO_FWI_TPU_PALLAS="0")
    f_p, _ = _grad(g0, obs, least_square, DEVITO_FWI_TPU_PALLAS="1")
    assert np.isclose(f_x, f_p, rtol=1e-4)


def test_saved3d_slab_matches_ckpt_on_chip():
    """The 3-D slab-saved gradient route (pad-fused residual slabs +
    bf16 history + fused illumination — the round-3 default) matches
    the XLA segment-checkpointed route on the real chip."""
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu import AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi
    from devito_fwi_tpu.misfit import least_square

    kw = dict(shape=(40, 40, 40), spacing=(15.,) * 3, space_order=8,
              nbl=12, dt=1.5)
    m1 = demo_model("layers-isotropic", nlayers=3, **kw)
    m0 = demo_model("layers-isotropic", nlayers=1, **kw)
    ext = m1.domain_size[0]
    nsrc, nrec = 2, 24
    src = np.stack([np.linspace(0, ext, nsrc), np.full(nsrc, ext / 2),
                    np.full(nsrc, 30.0)], 1)
    rec = np.stack([np.linspace(0, ext, nrec), np.full(nrec, ext / 2),
                    np.full(nrec, 30.0)], 1)
    g1 = AcquisitionGeometry(m1, rec, src, 0.0, 300.0, f0=0.012,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0.0, 300.0, f0=0.012,
                             src_type="Ricker")
    obs = fm_multi(g1)
    # ckpt reference: both fast 3-D routes disabled
    f_c, g_c = _grad(g0, obs, least_square, DEVITO_FWI_TPU_SAVED3="0",
                     DEVITO_FWI_TPU_PALLAS3D="0")
    # the default (slab-saved, bf16 history)
    f_s, g_s = _grad(g0, obs, least_square)
    assert np.isclose(f_c, f_s, rtol=1e-4)
    scale = np.abs(g_c).max()
    # interior cells (the objective returns the gradient flattened):
    # near-source f32 cancellation dominates any cross-path comparison
    # (docs/04_performance.md); bf16 history adds ~1e-3
    d = np.abs(g_s - g_c).reshape(m0.shape)
    assert d[2:-2, 2:-2, 2:-2].max() < 5e-3 * scale


def test_tti_pallas_matches_xla_on_chip():
    """Mosaic TTI segment kernels vs the XLA ckpt pair on the real
    chip (the interpreter twin is tests/test_pallas_tti.py)."""
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.models.geometry import AcquisitionGeometry
    from devito_fwi_tpu.ops.interp import interp_table
    from devito_fwi_tpu.ops import tti
    from devito_fwi_tpu.ops import pallas_tti as pt

    model = demo_model("layers-tti", shape=(120, 80), spacing=(10., 10.),
                       nbl=20, space_order=8, dtype=np.float32)
    nsrc, nrec = 2, 80
    srcs = np.stack([np.linspace(100, 900, nsrc), np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0, model.domain_size[0], nrec),
                    np.full(nrec, 20.0)], 1)
    geom = AcquisitionGeometry(model, rec, srcs, 0.0, 400.0, f0=0.010,
                               src_type="Ricker")
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    assert pt.tti_supported(model, r_idx)
    s_idx_b, s_w_b = jnp.asarray(s_idx)[:, None], jnp.asarray(s_w)[:, None]
    r_idx_j, r_w_j = jnp.asarray(r_idx), jnp.asarray(r_w)
    args = (jnp.asarray(model.vp), jnp.asarray(model.damp),
            jnp.asarray(model.epsilon), jnp.asarray(model.delta),
            jnp.asarray(model.theta), None)
    wav = jnp.asarray(geom.src.data[:, :1])
    dt = float(model.critical_dt)
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=8,
              n_checkpoints=12)

    def per(a, b):
        rec0, starts = tti.forward_ckpt(*args, wav, a, b, r_idx_j, r_w_j,
                                        dt, **kw)
        g, _ = tti.jacobian_adjoint_from_ckpt(
            *args, wav, a, b, starts, rec0 * 0.3, r_idx_j, r_w_j, dt, **kw)
        return g, rec0

    g_ref, rec_ref = jax.vmap(per)(s_idx_b, s_w_b)
    g_p = pt.tti_gradient_batched_pallas(
        args[0], args[1], args[2], args[3], args[4], wav, s_idx_b, s_w_b,
        r_idx_j, r_w_j, rec_ref * 0.7, dt, **kw)
    ref = np.asarray(jax.block_until_ready(g_ref))
    got = np.asarray(jax.block_until_ready(g_p))
    scale = np.abs(ref).max()
    # f32 near-source cancellation dominates across differently-fused
    # paths (CLAUDE.md); compare interior cells at a loose tolerance
    assert np.abs(got - ref)[:, 8:-8, 8:-8].max() < 1e-3 * scale


def test_host_misfit_matches_fused_on_chip(workload):
    from devito_fwi_tpu.misfit import least_square
    g0, obs = workload

    def np_l2(syn, ob):
        res = np.asarray(syn) - np.asarray(ob)
        return 0.5 * float((res ** 2).sum()), res

    f_d, g_d = _grad(g0, obs, least_square)
    f_h, g_h = _grad(g0, obs, np_l2)
    assert np.isclose(f_d, f_h, rtol=1e-5)
    scale = np.abs(g_d).max()
    assert np.abs(g_h - g_d).max() < 1e-4 * scale


def test_w2_bfm_fast_paths_match_xla_on_chip(workload):
    """The W2-2d BFM's default TPU fast paths (Pallas pushforward slab
    kernel + anchored block-banded Legendre) vs the exact XLA baseline
    (push=xla, legendre=full) on the real chip, through the full fused
    gradient objective. Both fast paths are certificate-guarded exact
    rewrites, so the objective values must agree to f32 fusion noise;
    the gradients run the SAME propagation kernels and differ only via
    the adjoint source, so interior parity is tight (the interpreter
    twins are tests/test_pallas_bfm.py)."""
    from devito_fwi_tpu.misfit import qWasserstein

    g0, obs = workload
    w2 = qWasserstein(trans_type="linear", gamma=1.01, method="2d",
                      num_steps=10, step_scale=1.0, bfm_backend="jax")
    f_x, g_x = _grad(g0, obs, w2, DEVITO_FWI_TPU_BFM_PUSH="xla",
                     DEVITO_FWI_TPU_BFM_LEGENDRE="full")
    f_p, g_p = _grad(g0, obs, w2, DEVITO_FWI_TPU_BFM_PUSH="pallas",
                     DEVITO_FWI_TPU_BFM_LEGENDRE="anchor")
    assert np.isfinite(f_x) and f_x > 0
    assert np.isclose(f_x, f_p, rtol=1e-4)
    scale = np.abs(g_x).max()
    d = np.abs(g_p - g_x).reshape(g0.model.shape)
    assert d[4:-4, 4:-4].max() < 1e-3 * scale


def test_unaligned_receiver_offset_on_chip():
    """2-D Pallas kernels at a receiver z-plane with z0 % 8 = 5 (an
    in-tile sublane offset the 3-D kernels could NOT lower — see the
    CLAUDE.md Mosaic rule). The 2-D kernels' 2-wide value slices and
    scratch read-modify-writes DO lower at every offset (verified on
    chip at offsets 3/5/6/7); this pins that so a Mosaic regression or
    a kernel rewrite that breaks unaligned offsets is caught."""
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu import AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi, _pallas_z0
    from devito_fwi_tpu.misfit import least_square

    kw = dict(shape=(120, 80), spacing=(10., 10.), nbl=40, space_order=8,
              dt=1.2)
    m1 = demo_model("layers-isotropic", nlayers=3, **kw)
    m0 = demo_model("layers-isotropic", nlayers=1, **kw)
    nsrc, nrec = 2, 60
    src = np.stack([np.linspace(0, m1.domain_size[0], nsrc),
                    np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0, m1.domain_size[0], nrec),
                    np.full(nrec, 130.0)], 1)  # z0 = 40 + 13 -> offset 5
    g1 = AcquisitionGeometry(m1, rec, src, 0.0, 400.0, f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0.0, 400.0, f0=0.015,
                             src_type="Ricker")
    assert _pallas_z0(g1) is not None and _pallas_z0(g1) % 8 == 5
    obs = fm_multi(g1)
    f, g, _ = fwi_obj_multi(g0, obs, least_square, None, None, True,
                            calc_grad=True)
    assert np.isfinite(f) and f > 0
    assert np.isfinite(g).all()


def test_elastic_pallas_matches_xla_on_chip():
    """Elastic velocity-stress Pallas segment kernel vs the XLA scan on
    the REAL chip (VERDICT r3 weak #1: the route is default-on on TPU
    but was only ever interpreter-validated; the interpreter cannot
    catch Mosaic lowering bugs — see CLAUDE.md)."""
    import jax.numpy as jnp
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.ops import staggered as st
    from devito_fwi_tpu.ops import pallas_staggered as ps
    from devito_fwi_tpu.ops.interp import interp_table

    shape = (121, 91)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 45:] = 2.5
    vs = vp / 2.0
    rho = 0.31 * (1e3 * vp) ** 0.25
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, vs=vs, b=1.0 / rho, nbl=20,
                         bcs="mask", dtype=np.float32)
    src = np.array([[600.0, 20.0]])
    rec = np.stack([np.linspace(0., 1200., 61), np.full(61, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 600., f0=0.012,
                               src_type="Ricker")
    lam = np.asarray(model.lam, np.float32)
    mu = np.asarray(model.mu, np.float32)
    b = np.asarray(model.b, np.float32)
    damp = np.asarray(model.damp, np.float32)
    dt = model.critical_dt
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    wav = geom.src.data
    assert ps.elastic_supported(model, s_idx, r_idx)

    r1_x, r2_x = st.elastic_forward(
        jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(b),
        jnp.asarray(damp), jnp.asarray(wav), jnp.asarray(s_idx),
        jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w), float(dt),
        nt=geom.nt, spacing=model.spacing, space_order=4)
    r1_p, r2_p = ps.elastic_forward_pallas(
        lam, mu, b, damp, wav, s_idx, s_w, r_idx, r_w, float(dt),
        nt=geom.nt, spacing=model.spacing, space_order=4)
    for name, a, b_ in (("rec1", r1_x, r1_p), ("rec2", r2_x, r2_p)):
        a = np.asarray(a)
        scale = max(np.abs(a).max(), 1e-12)
        d = np.abs(np.asarray(b_) - a).max()
        assert d < 2e-5 * scale, (name, d / scale)


def test_visco_sls2_pallas_matches_xla_on_chip():
    """Viscoacoustic SLS-2 Pallas segment kernel vs the XLA scan on the
    REAL chip (same rationale as the elastic on-chip test)."""
    import jax.numpy as jnp
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.ops import viscoacoustic as va
    from devito_fwi_tpu.ops import pallas_staggered as ps
    from devito_fwi_tpu.ops.interp import interp_table

    shape = (117, 85)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 40:] = 2.7
    qp = np.full(shape, 60.0, np.float32)
    rho = 0.31 * (1e3 * vp) ** 0.25
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, qp=qp, b=1.0 / rho, nbl=20,
                         bcs="mask", dtype=np.float32)
    src = np.array([[580.0, 20.0]])
    rec = np.stack([np.linspace(0., 1160., 59), np.full(59, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 560., f0=0.012,
                               src_type="Ricker")
    b = np.asarray(model.b, np.float32)
    qp_f = np.asarray(model.qp, np.float32)
    damp = np.asarray(model.damp, np.float32)
    vp_f = np.asarray(model.vp, np.float32)
    dt = model.critical_dt
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    wav = geom.src.data
    assert ps.visco_sls2_supported(model, "sls", 2, s_idx, r_idx)

    rec_x, p_x = va.forward(
        jnp.asarray(vp_f), jnp.asarray(b), jnp.asarray(qp_f),
        jnp.asarray(damp), jnp.asarray(wav), jnp.asarray(s_idx),
        jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w), float(dt),
        geom.f0, kernel="sls", time_order=2, nt=geom.nt,
        spacing=model.spacing, space_order=4)
    rec_p, p_p = ps.visco_sls2_forward_pallas(
        vp_f, b, qp_f, damp, wav, s_idx, s_w, r_idx, r_w, float(dt),
        geom.f0, nt=geom.nt, spacing=model.spacing, space_order=4)
    a = np.asarray(rec_x)
    scale = max(np.abs(a).max(), 1e-12)
    assert np.abs(np.asarray(rec_p) - a).max() < 2e-5 * scale
    pa = np.asarray(p_x)
    pscale = max(np.abs(pa).max(), 1e-12)
    assert np.abs(np.asarray(p_p) - pa).max() < 2e-5 * pscale


def test_elastic_gradient_routes_match_on_chip():
    """Elastic GRADIENT parity on the real chip (VERDICT r4 #9: the
    ONCHIP suite pinned staggered forwards only): the streamed-history
    Pallas route and the XLA saved route must both match the rematted
    vjp gradient with an f32 history (bit-comparable histories; the
    production bf16 history's ~4e-4 deviation is covered by the
    elastic A/B tool)."""
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.elastic_fwi import (elastic_fm_multi,
                                            elastic_fwi_obj_multi)
    from devito_fwi_tpu.misfit import least_square

    shape = (121, 91)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 45:] = 2.5
    vs = (vp / 2.0).astype(np.float32)
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                         shape=shape, space_order=4, vp=vp, vs=vs,
                         b=1.0 / rho, nbl=20, bcs="mask",
                         dtype=np.float32)
    src = np.stack([np.array([400.0, 800.0]), np.full(2, 20.0)], 1)
    rec = np.stack([np.linspace(0., 1200., 61), np.full(61, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 600., f0=0.012,
                               src_type="Ricker")
    obs1, _ = elastic_fm_multi(geom)
    # RAW gradients: the 1/sqrt(illum) precondition amplifies f32
    # noise ~1e4x where illumination vanishes (measured: raw cross-
    # route dev 2e-6, preconditioned 1e-2 — same numerics); the
    # preconditioned path is exercised by the driver-level runs
    common = dict(misfit_func=least_square, precond=False,
                  illum_fix=False, calc_grad=True,
                  vp=(vp * 1.02).astype(np.float32), shot_chunk=2)
    os.environ["DEVITO_FWI_TPU_HIST"] = "f32"
    try:
        f_v, g_v, _ = elastic_fwi_obj_multi(geom, obs1,
                                            grad_route="vjp", **common)
        f_s, g_s, _ = elastic_fwi_obj_multi(geom, obs1,
                                            grad_route="saved", **common)
        f_p, g_p, _ = elastic_fwi_obj_multi(geom, obs1,
                                            grad_route="pallas",
                                            **common)
    finally:
        os.environ.pop("DEVITO_FWI_TPU_HIST", None)
    assert abs(f_s - f_v) <= 1e-5 * abs(f_v)
    assert abs(f_p - f_v) <= 1e-5 * abs(f_v)
    for k in ("vp", "vs", "rho"):
        scale = np.abs(g_v[k]).max()
        assert np.abs(g_s[k] - g_v[k]).max() <= 5e-5 * scale, ("saved", k)
        assert np.abs(g_p[k] - g_v[k]).max() <= 2e-4 * scale, ("pallas", k)


def test_visco_gradient_routes_match_on_chip():
    """Viscoacoustic sls/2 (vp, qp) gradient parity on the real chip:
    the saved-history hand adjoint vs the rematted vjp, f32 history."""
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.misfit import least_square
    from devito_fwi_tpu.visco_fwi import visco_fm_multi, visco_fwi_obj_multi

    shape = (121, 91)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 45:] = 2.5
    qp = (3.516 * ((vp * 1000.0) ** 2.2) * 1e-6).astype(np.float32)
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                         shape=shape, space_order=4, vp=vp, qp=qp,
                         b=1.0 / rho, nbl=20, bcs="mask",
                         dtype=np.float32)
    src = np.stack([np.array([400.0, 800.0]), np.full(2, 20.0)], 1)
    rec = np.stack([np.linspace(0., 1200., 61), np.full(61, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 600., f0=0.012,
                               src_type="Ricker")
    obs = visco_fm_multi(geom)
    common = dict(misfit_func=least_square, precond=False,
                  illum_fix=False, calc_grad=True,
                  vp=(vp * 1.02).astype(np.float32), shot_chunk=2)
    os.environ["DEVITO_FWI_TPU_HIST"] = "f32"
    try:
        f_v, g_v, _ = visco_fwi_obj_multi(geom, obs, grad_route="vjp",
                                          **common)
        f_s, g_s, _ = visco_fwi_obj_multi(geom, obs, grad_route="saved",
                                          **common)
        f_p, g_p, _ = visco_fwi_obj_multi(geom, obs, grad_route="pallas",
                                          **common)
    finally:
        os.environ.pop("DEVITO_FWI_TPU_HIST", None)
    assert abs(f_s - f_v) <= 1e-5 * abs(f_v)
    assert abs(f_p - f_v) <= 1e-5 * abs(f_v)
    for k in ("vp", "qp"):
        scale = np.abs(g_v[k]).max()
        assert np.abs(g_s[k] - g_v[k]).max() <= 5e-5 * scale, ("saved", k)
        assert np.abs(g_p[k] - g_v[k]).max() <= 2e-4 * scale, \
            ("pallas", k)
