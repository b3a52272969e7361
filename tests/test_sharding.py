"""Mesh-parallel execution tests on the virtual 8-device CPU mesh:
shot sharding (dask replacement) and spatial domain decomposition
(devito-MPI replacement) both reproduce single-device results."""
import numpy as np
import jax

from devito_fwi_tpu import demo_model, AcquisitionGeometry
from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
from devito_fwi_tpu.misfit import least_square
from devito_fwi_tpu.parallel.sharding import (shot_mesh, fwi_obj_sharded,
                                              fm_multi_sharded, domain_mesh,
                                              forward_domain_sharded,
                                              gradient_domain_sharded)


def _setup(nsrc=5):
    shape, spacing = (49, 49), (10., 10.)
    true_model = demo_model("circle-isotropic", vp_circle=3.2,
                            vp_background=3.0, r=10, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=10, dt=1.2)
    init_model = demo_model("circle-isotropic", vp_circle=3.0,
                            vp_background=3.0, r=10, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=10, dt=1.2)
    src = np.stack([np.full(nsrc, 20.0),
                    np.linspace(0, 480, nsrc)], axis=1)
    rec = np.stack([np.full(21, 460.0), np.linspace(0, 480, 21)], axis=1)
    g1 = AcquisitionGeometry(true_model, rec, src, 0., 200., f0=0.010,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(init_model, rec, src, 0., 200., f0=0.010,
                             src_type="Ricker")
    return g1, g0


def test_shot_sharded_objective_matches_single_device():
    g1, g0 = _setup()
    obs = fm_multi(g1)
    f_ref, grad_ref, _ = fwi_obj_multi(g0, obs, least_square,
                                       calc_grad=True)
    f_sh, grad_sh = fwi_obj_sharded(g0, obs, least_square, calc_grad=True,
                                    mesh=shot_mesh())
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    ref = grad_ref.reshape(g0.model.shape)
    scale = np.abs(ref).max()
    assert np.abs(grad_sh - ref).max() < 1e-5 * scale


def test_fm_sharded_matches_serial():
    g1, _ = _setup()
    obs = fm_multi(g1)
    obs_sh = fm_multi_sharded(g1)
    for a, b in zip(obs, obs_sh):
        assert np.allclose(a.data, b.data, atol=1e-6)


def test_domain_sharded_forward_matches():
    g1, _ = _setup()
    obs = fm_multi(g1)
    for axes in [(8, 1), (2, 4)]:
        mesh = domain_mesh(axes)
        rec = forward_domain_sharded(g1, mesh=mesh)
        scale = np.abs(obs[0].data).max()
        assert np.abs(rec - obs[0].data).max() < 1e-5 * scale


def test_domain_sharded_gradient_matches():
    """The devito-MPI gradient analog: segment-checkpointed reverse sweep
    with the grid sharded (2,4) over 8 devices == unsharded gradient."""
    import jax.numpy as jnp
    from devito_fwi_tpu.fwi import _batched_tables, _solver_dt
    from devito_fwi_tpu.ops import acoustic as _ac

    g1, g0 = _setup()
    obs = fm_multi(g1)
    syn = fm_multi(g0)
    residual = (syn[0].data - obs[0].data).astype(g0.model.dtype)

    model = g0.model
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(g0)
    static = dict(nt=g0.nt, spacing=model.spacing,
                  space_order=model.space_order, kernel="OT2", fs=model.fs,
                  n_checkpoints=12)
    dt = _solver_dt(g0)
    _, seg_starts, _ = _ac.forward_ckpt(
        jnp.asarray(model.vp), jnp.asarray(model.damp),
        jnp.asarray(src_wav), jnp.asarray(s_idx[0]), jnp.asarray(s_w[0]),
        jnp.asarray(r_idx), jnp.asarray(r_w), dt, **static)
    grad_ref, _ = _ac.gradient_from_ckpt(
        jnp.asarray(model.vp), jnp.asarray(model.damp),
        jnp.asarray(src_wav), jnp.asarray(s_idx[0]), jnp.asarray(s_w[0]),
        seg_starts, jnp.asarray(residual), jnp.asarray(r_idx),
        jnp.asarray(r_w), dt, **static)
    grad_ref = np.asarray(grad_ref)

    for axes in [(8, 1), (2, 4)]:
        mesh = domain_mesh(axes)
        grad_sh = gradient_domain_sharded(g0, residual, mesh=mesh,
                                          n_checkpoints=12)
        scale = np.abs(grad_ref).max()
        assert grad_sh.shape == grad_ref.shape
        assert np.abs(grad_sh - grad_ref).max() < 1e-5 * scale


def test_shot_sharded_host_misfit_objective():
    """Sharded objective with a NON-traceable misfit: propagation/adjoint
    sharded over the shots mesh, misfit on the host — must match the
    single-device host-misfit path."""
    from devito_fwi_tpu.misfit import qWasserstein, native

    g1, g0 = _setup()
    obs = fm_multi(g1)
    backend = "native" if native.available() else "jax"
    qw = qWasserstein(gamma=1.01, method="2d", num_steps=6, step_scale=1.,
                      bfm_backend=backend)
    if backend == "jax":
        # hide the traceable entry point so the host path is exercised
        class HostOnly:
            method = "2d"
            bfm_backend = "host"

            def __call__(self, f, g):
                return qw(f, g)
        qw_host = HostOnly()
    else:
        qw_host = qw
    f_ref, grad_ref, _ = fwi_obj_multi(g0, obs, qw_host, calc_grad=True)
    f_sh, grad_sh = fwi_obj_sharded(g0, obs, qw_host, calc_grad=True,
                                    mesh=shot_mesh())
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    ref = grad_ref.reshape(g0.model.shape)
    scale = np.abs(ref).max()
    assert np.abs(grad_sh - ref).max() < 1e-5 * scale


def test_domain_sharded_3d_forward_and_gradient():
    """3-D grid under a 2-D ('dx','dz') mesh over the leading axes (the
    trailing axis stays unsharded): forward and checkpointed gradient
    match the single-device results — the big-3D use case the devito-MPI
    analog exists for."""
    import jax.numpy as jnp
    from devito_fwi_tpu.fwi import _batched_tables, _solver_dt
    from devito_fwi_tpu.ops import acoustic as _ac

    model = demo_model("layers-isotropic", shape=(25, 25, 25),
                       spacing=(15., 15., 15.), nlayers=2, space_order=4,
                       nbl=6)
    src = np.array([[180., 180., 30.]])
    rec = np.stack([np.linspace(0., 360., 15), np.full(15, 180.),
                    np.full(15, 30.)], axis=1)
    geom = AcquisitionGeometry(model, rec, src, 0., 120., f0=0.015,
                               src_type="Ricker")
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geom)
    dt = _solver_dt(geom)
    static = dict(nt=geom.nt, spacing=model.spacing,
                  space_order=model.space_order, kernel="OT2", fs=model.fs,
                  n_checkpoints=6)

    rec_ref, _ = _ac.forward(
        jnp.asarray(model.vp), jnp.asarray(model.damp),
        jnp.asarray(src_wav), jnp.asarray(s_idx[0]), jnp.asarray(s_w[0]),
        jnp.asarray(r_idx), jnp.asarray(r_w), dt, save=False,
        **{k: v for k, v in static.items() if k != "n_checkpoints"})
    rec_ref = np.asarray(rec_ref)
    residual = (0.5 * rec_ref).astype(model.dtype)
    _, seg_starts, _ = _ac.forward_ckpt(
        jnp.asarray(model.vp), jnp.asarray(model.damp),
        jnp.asarray(src_wav), jnp.asarray(s_idx[0]), jnp.asarray(s_w[0]),
        jnp.asarray(r_idx), jnp.asarray(r_w), dt, **static)
    grad_ref, _ = _ac.gradient_from_ckpt(
        jnp.asarray(model.vp), jnp.asarray(model.damp),
        jnp.asarray(src_wav), jnp.asarray(s_idx[0]), jnp.asarray(s_w[0]),
        seg_starts, jnp.asarray(residual), jnp.asarray(r_idx),
        jnp.asarray(r_w), dt, **static)
    grad_ref = np.asarray(grad_ref)

    mesh = domain_mesh((4, 2))
    rec_sh = forward_domain_sharded(geom, mesh=mesh)
    scale = np.abs(rec_ref).max()
    assert np.abs(rec_sh - rec_ref).max() < 1e-5 * scale
    grad_sh = gradient_domain_sharded(geom, residual, mesh=mesh,
                                      n_checkpoints=6)
    gscale = np.abs(grad_ref).max()
    assert grad_sh.shape == grad_ref.shape
    assert np.abs(grad_sh - grad_ref).max() < 1e-5 * gscale


def test_hierarchical_shots_domain_objective_matches():
    """Shots x domain 2-D mesh (GSPMD): 4 shot groups x 2-way grid split
    over the 8 virtual devices reproduces the single-device objective +
    gradient."""
    from devito_fwi_tpu.parallel.sharding import hier_mesh, fwi_obj_sharded2d
    g1, g0 = _setup()
    obs = fm_multi(g1)
    f_ref, grad_ref, _ = fwi_obj_multi(g0, obs, least_square,
                                       calc_grad=True)
    for axes in [(4, 2), (2, 4)]:
        mesh = hier_mesh(axes)
        f_sh, grad_sh = fwi_obj_sharded2d(g0, obs, least_square,
                                          calc_grad=True, mesh=mesh)
        assert np.isclose(f_sh, f_ref, rtol=1e-5)
        ref = grad_ref.reshape(g0.model.shape)
        scale = np.abs(ref).max()
        assert np.abs(grad_sh - ref).max() < 1e-5 * scale


def test_shot_sharded_pallas_path_matches(monkeypatch):
    """The per-shard Pallas fast path of fwi_obj_sharded (validated here
    in interpreter mode on the virtual CPU mesh) == the XLA scan path."""
    nsrc = 5
    shape, spacing = (49, 49), (10., 10.)
    true_model = demo_model("circle-isotropic", vp_circle=3.2,
                            vp_background=3.0, r=10, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=10, dt=1.2)
    init_model = demo_model("circle-isotropic", vp_circle=3.0,
                            vp_background=3.0, r=10, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=10, dt=1.2)
    # horizontal receiver line (two z-planes) so the Pallas gate opens
    src = np.stack([np.linspace(0, 480, nsrc), np.full(nsrc, 20.0)], axis=1)
    rec = np.stack([np.linspace(0, 480, 21), np.full(21, 30.0)], axis=1)
    g1 = AcquisitionGeometry(true_model, rec, src, 0., 200., f0=0.010,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(init_model, rec, src, 0., 200., f0=0.010,
                             src_type="Ricker")
    obs = fm_multi(g1)
    # reference: XLA paths only
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS", "0")
    f_ref, grad_ref, _ = fwi_obj_multi(g0, obs, least_square,
                                       calc_grad=True)
    f0_ref = fwi_obj_sharded(g0, obs, least_square, calc_grad=False,
                             mesh=shot_mesh())[0]
    # sharded objective through the per-shard Pallas kernels (interpret)
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS", "1")
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    from devito_fwi_tpu.fwi import _pallas_z0
    assert _pallas_z0(g0) is not None
    f_sh, grad_sh = fwi_obj_sharded(g0, obs, least_square, calc_grad=True,
                                    mesh=shot_mesh())
    assert np.isclose(f_sh, f_ref, rtol=1e-4)
    ref = grad_ref.reshape(g0.model.shape)
    scale = np.abs(ref).max()
    assert np.abs(grad_sh - ref).max() < 1e-4 * scale
    f0_sh = fwi_obj_sharded(g0, obs, least_square, calc_grad=False,
                            mesh=shot_mesh())[0]
    assert np.isclose(f0_sh, f0_ref, rtol=1e-4)


def test_shot_sharded_host_misfit_pallas_matches(monkeypatch):
    """The sharded host-misfit objective routed through the Pallas cores
    (interpret mode), with the shot batch chunked (stream_max_shots
    forced to 1 shot/device -> 2 chunks for 9 shots on 8 devices) ==
    the single-device host-misfit path."""
    from devito_fwi_tpu.misfit import qWasserstein
    import devito_fwi_tpu.ops.pallas_acoustic as pa

    nsrc = 9
    shape, spacing = (49, 49), (10., 10.)
    true_model = demo_model("circle-isotropic", vp_circle=3.2,
                            vp_background=3.0, r=10, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=10, dt=1.2)
    init_model = demo_model("circle-isotropic", vp_circle=3.0,
                            vp_background=3.0, r=10, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=10, dt=1.2)
    src = np.stack([np.linspace(0, 480, nsrc), np.full(nsrc, 20.0)], axis=1)
    rec = np.stack([np.linspace(0, 480, 21), np.full(21, 30.0)], axis=1)
    g1 = AcquisitionGeometry(true_model, rec, src, 0., 200., f0=0.010,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(init_model, rec, src, 0., 200., f0=0.010,
                             src_type="Ricker")
    obs = fm_multi(g1)

    qw = qWasserstein(gamma=1.01, method="2d", num_steps=6, step_scale=1.,
                      bfm_backend="jax")

    class HostOnly:  # hide the traceable entry point
        method = "2d"
        bfm_backend = "host"

        def __call__(self, f, g):
            return qw(f, g)

    qw_host = HostOnly()
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS", "0")
    f_ref, grad_ref, _ = fwi_obj_multi(g0, obs, qw_host, calc_grad=True)

    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS", "1")
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    real_sms = pa.stream_max_shots
    monkeypatch.setattr(pa, "stream_max_shots",
                        lambda *a, **k: min(1, real_sms(*a, **k)))
    from devito_fwi_tpu.fwi import _pallas_z0
    assert _pallas_z0(g0) is not None
    f_sh, grad_sh = fwi_obj_sharded(g0, obs, qw_host, calc_grad=True,
                                    mesh=shot_mesh())
    assert np.isclose(f_sh, f_ref, rtol=1e-4)
    ref = grad_ref.reshape(g0.model.shape)
    scale = np.abs(ref).max()
    assert np.abs(grad_sh - ref).max() < 1e-4 * scale
    # objective-only (no gradient) path
    f0_ref = fwi_obj_multi(g0, obs, qw_host, calc_grad=False)[0]
    f0_sh = fwi_obj_sharded(g0, obs, qw_host, calc_grad=False,
                            mesh=shot_mesh())[0]
    assert np.isclose(f0_sh, f0_ref, rtol=1e-4)


def test_fm_sharded_pallas_path_matches(monkeypatch):
    """fm_multi_sharded's per-shard Pallas forward (interpreter mode on
    the CPU mesh) == the XLA sharded forward."""
    nsrc = 3
    shape, spacing = (49, 49), (10., 10.)
    m = demo_model("circle-isotropic", vp_circle=3.2, vp_background=3.0,
                   r=10, origin=(0., 0.), shape=shape, spacing=spacing,
                   space_order=4, nbl=10, dt=1.2)
    src = np.stack([np.linspace(0, 480, nsrc), np.full(nsrc, 20.0)], axis=1)
    rec = np.stack([np.linspace(0, 480, 21), np.full(21, 30.0)], axis=1)
    g = AcquisitionGeometry(m, rec, src, 0., 200., f0=0.010,
                            src_type="Ricker")
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS", "0")
    ref = fm_multi_sharded(g)
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS", "1")
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    out = fm_multi_sharded(g)
    scale = max(np.abs(np.stack([o.data for o in ref])).max(), 1e-12)
    for a, b in zip(ref, out):
        assert np.abs(a.data - b.data).max() < 1e-5 * scale


def test_sharded_objective_chunks_match_single_pass(monkeypatch):
    """With the per-device cap shrunk to 1, the sharded objective runs
    multiple sequential chunks — results must match the one-chunk run
    (guards the chunking added so large surveys cannot OOM a device)."""
    from devito_fwi_tpu.parallel import sharding as sh
    gt, g0 = _setup(nsrc=10)
    obs = fm_multi(gt)
    f1, g1 = sh.fwi_obj_sharded(g0, obs, least_square, calc_grad=True)
    monkeypatch.setattr(sh, "_PER_DEV_CAP", 1)
    f2, g2 = sh.fwi_obj_sharded(g0, obs, least_square, calc_grad=True)
    # chunked host-side accumulation reorders the f32 sums
    assert np.isclose(f1, f2, rtol=1e-6)
    scale = np.abs(g1).max()
    assert np.abs(g2 - g1).max() < 1e-6 * scale


def test_fwi_obj_shot_indices_matches_subgeometry():
    """Random-batch hook: fwi_obj_multi(shot_indices=sel) must equal the
    objective of a geometry built from just those shots (the device path
    gathers the cached stacks on device)."""
    gt, g0 = _setup(nsrc=6)
    obs = fm_multi(gt)
    sel = [1, 3, 4]
    f_sub, g_sub, _ = fwi_obj_multi(g0, obs, least_square,
                                    calc_grad=True, shot_indices=sel)

    from devito_fwi_tpu.fwi import _subset_geometry
    g0s = _subset_geometry(g0, sel)
    obs_s = [obs[i] for i in sel]
    f_ref, g_ref, _ = fwi_obj_multi(g0s, obs_s, least_square,
                                    calc_grad=True)
    assert np.isclose(f_sub, f_ref, rtol=1e-6)
    scale = np.abs(g_ref).max()
    assert np.abs(g_sub - g_ref).max() < 1e-6 * scale


def test_fwi_obj_shot_indices_w2_batch_path():
    """shot_indices composes with the batch-native W2-2d misfit (the
    device path gathers obs/table subsets before the fused program)."""
    from devito_fwi_tpu.misfit import qWasserstein
    gt, g0 = _setup(nsrc=4)
    obs = fm_multi(gt)
    qw = qWasserstein(gamma=1.01, method="2d", num_steps=4,
                      step_scale=1., bfm_backend="jax")
    sel = [0, 2]
    f_sub, g_sub, _ = fwi_obj_multi(g0, obs, qw, calc_grad=True,
                                    shot_indices=sel)
    from devito_fwi_tpu.fwi import _subset_geometry
    g0s = _subset_geometry(g0, sel)
    f_ref, g_ref, _ = fwi_obj_multi(g0s, [obs[i] for i in sel], qw,
                                    calc_grad=True)
    assert np.isfinite(f_sub) and f_sub > 0
    assert np.isclose(f_sub, f_ref, rtol=1e-5)
    scale = np.abs(g_ref).max()
    assert np.abs(g_sub - g_ref).max() < 1e-5 * scale


def test_tti_sharded_gradient_matches_serial():
    """TTI shot-sharded gradient (VERDICT r3 next-step #3; BASELINE.json
    config 5) == the serial per-shot ckpt pair on the 8-device mesh."""
    import jax.numpy as jnp
    from devito_fwi_tpu.fwi import (_batched_tables, _solver_dt, _crop,
                                    _fix_illum_jax, _pads)
    from devito_fwi_tpu.misfit.w2 import least_square_jax
    from devito_fwi_tpu.ops import tti
    from devito_fwi_tpu.parallel.sharding import tti_fwi_obj_sharded

    nsrc = 5  # deliberately not a multiple of 8: exercises shot padding
    model = demo_model("layers-tti", shape=(41, 41), spacing=(10., 10.),
                       nbl=8, space_order=4, dtype=np.float32)
    src = np.stack([np.linspace(0, 400, nsrc), np.full(nsrc, 20.0)],
                   axis=1)
    rec = np.stack([np.linspace(0, 400, 21), np.full(21, 30.0)], axis=1)
    geom = AcquisitionGeometry(model, rec, src, 0., 200., f0=0.012,
                               src_type="Ricker")

    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geom)
    dt = float(_solver_dt(geom))
    args = (jnp.asarray(model.vp), jnp.asarray(model.damp),
            jnp.asarray(model.epsilon), jnp.asarray(model.delta),
            jnp.asarray(model.theta), None)
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4,
              n_checkpoints=7)
    # synthetic observations: zero traces, so the residual is the
    # modeled data itself
    obs = np.zeros((nsrc, geom.nt, 21), np.float32)

    # serial reference, same per-shot conventions as the sharded body
    pads, shape, spacing = _pads(model), model.shape, model.spacing
    f_ref, g_ref, il_ref = 0.0, 0.0, 0.0
    for i in range(nsrc):
        rec_i, starts, illum = tti.forward_ckpt(
            *args, jnp.asarray(src_wav), jnp.asarray(s_idx[i]),
            jnp.asarray(s_w[i]), jnp.asarray(r_idx), jnp.asarray(r_w),
            dt, with_illum=True, **kw)
        f_i, res = least_square_jax(rec_i, jnp.asarray(obs[i]))
        g_i, _ = tti.jacobian_adjoint_from_ckpt(
            *args, jnp.asarray(src_wav), jnp.asarray(s_idx[i]),
            jnp.asarray(s_w[i]), starts, res, jnp.asarray(r_idx),
            jnp.asarray(r_w), dt, **kw)
        sp = jnp.asarray(geom.src_positions[i], dtype=model.dtype)
        rp = jnp.asarray(geom.rec_positions, dtype=model.dtype)
        g_i = _fix_illum_jax(_crop(g_i, pads, shape), sp, rp, spacing,
                             shape)
        il_i = _fix_illum_jax(_crop(illum, pads, shape), sp, rp, spacing,
                              shape)
        f_ref += float(f_i)
        g_ref = g_ref + np.asarray(g_i, np.float64)
        il_ref = il_ref + np.asarray(il_i, np.float64)
    g_ref = g_ref / np.sqrt(il_ref + 1e-30)

    f_sh, g_sh = tti_fwi_obj_sharded(geom, obs, least_square,
                                     calc_grad=True, n_checkpoints=7)
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    scale = np.abs(g_ref).max()
    assert np.abs(g_sh - g_ref).max() < 1e-5 * scale


def test_viscoacoustic_fm_sharded_matches_serial():
    """Viscoacoustic shot-sharded forward == the serial vmapped forward
    (BASELINE.json config 5's second propagator on the mesh)."""
    import jax.numpy as jnp
    from devito_fwi_tpu.fwi import _batched_tables, _solver_dt
    from devito_fwi_tpu.ops import viscoacoustic as va
    from devito_fwi_tpu.parallel.sharding import viscoacoustic_fm_sharded
    from devito_fwi_tpu import SeismicModel

    nsrc = 5
    shape = (41, 41)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 20:] = 2.6
    qp = np.full(shape, 80.0, np.float32)
    rho = 0.31 * (1e3 * vp) ** 0.25
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, qp=qp, b=1.0 / rho, nbl=8,
                         bcs="mask", dtype=np.float32)
    src = np.stack([np.linspace(0, 400, nsrc), np.full(nsrc, 20.0)],
                   axis=1)
    rec = np.stack([np.linspace(0, 400, 21), np.full(21, 30.0)], axis=1)
    geom = AcquisitionGeometry(model, rec, src, 0., 200., f0=0.012,
                               src_type="Ricker")

    rec_sh = viscoacoustic_fm_sharded(geom, kernel="sls", time_order=2)

    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geom)
    dt = float(_solver_dt(geom))
    ref = []
    for i in range(nsrc):
        r, _ = va.forward(
            jnp.asarray(model.vp), jnp.asarray(model.b),
            jnp.asarray(model.qp), jnp.asarray(model.damp),
            jnp.asarray(src_wav), jnp.asarray(s_idx[i]),
            jnp.asarray(s_w[i]), jnp.asarray(r_idx), jnp.asarray(r_w),
            dt, geom.f0, kernel="sls", time_order=2, nt=geom.nt,
            spacing=model.spacing, space_order=4)
        ref.append(np.asarray(r))
    ref = np.stack(ref)
    scale = np.abs(ref).max()
    assert rec_sh.shape == ref.shape
    assert np.abs(rec_sh - ref).max() < 1e-5 * scale


def test_elastic_sharded_gradient_matches_serial():
    """Elastic shot-sharded (vp, vs, rho) gradients == the single-chip
    elastic objective on the 8-device mesh."""
    from devito_fwi_tpu.elastic_fwi import (elastic_fm_multi,
                                            elastic_fwi_obj_multi)
    from devito_fwi_tpu.parallel.sharding import elastic_fwi_obj_sharded
    from devito_fwi_tpu import SeismicModel

    nsrc = 3
    shape = (41, 36)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 18:] = 2.4
    vs = (vp / 2.0).astype(np.float32)
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)

    def mk(vpa):
        return SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                            shape=shape, space_order=4, vp=vpa, vs=vs,
                            b=1.0 / rho, nbl=8, bcs="mask", dt=1.0)

    mt = mk(vp)
    m0 = mk(np.full(shape, 2.2, np.float32))
    src = np.stack([np.linspace(50., 350., nsrc), np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 30.0)], 1)
    gt = AcquisitionGeometry(mt, rec, src, 0., 200., f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0., 200., f0=0.015,
                             src_type="Ricker")
    obs1, _ = elastic_fm_multi(gt)
    from devito_fwi_tpu.misfit import least_square
    f_ref, g_ref, _ = elastic_fwi_obj_multi(g0, obs1, least_square,
                                            calc_grad=True, shot_chunk=3,
                                            n_checkpoints=5)
    f_sh, g_sh = elastic_fwi_obj_sharded(g0, obs1, least_square,
                                         calc_grad=True, n_checkpoints=5)
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    for k in ("vp", "vs", "rho"):
        scale = max(np.abs(g_ref[k]).max(), 1e-20)
        assert np.abs(g_sh[k] - g_ref[k]).max() < 1e-5 * scale, k


def test_tti3d_sharded_gradient_matches_serial_with_phi():
    """3-D TTI sharded gradient with a CONSTANT scalar azimuth: the
    scalar phi must reach the kernels (review r4: a non-ndarray phi was
    silently dropped to None = phi=0) — parity vs the serial pair which
    passes phi explicitly."""
    import jax.numpy as jnp
    from devito_fwi_tpu.fwi import (_batched_tables, _solver_dt, _crop,
                                    _fix_illum_jax, _pads)
    from devito_fwi_tpu.misfit.w2 import least_square_jax
    from devito_fwi_tpu.ops import tti
    from devito_fwi_tpu.parallel.sharding import tti_fwi_obj_sharded
    from devito_fwi_tpu import SeismicModel

    nsrc = 2
    shape = (17, 15, 13)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, :, 6:] = 2.4
    f = np.full(shape, 0.1, np.float32)
    model = SeismicModel(origin=(0., 0., 0.), spacing=(15., 15., 15.),
                         shape=shape, space_order=4, vp=vp, epsilon=f,
                         delta=0.5 * f, theta=0.4 * f, phi=0.3,
                         nbl=4, bcs="damp")
    assert not isinstance(model.phi, np.ndarray)  # the scalar case
    src = np.stack([np.linspace(40., 200., nsrc), np.full(nsrc, 100.0),
                    np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0., 240., 9), np.full(9, 100.0),
                    np.full(9, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 100., f0=0.015,
                               src_type="Ricker")

    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geom)
    dt = float(_solver_dt(geom))
    args = (jnp.asarray(model.vp), jnp.asarray(model.damp),
            jnp.asarray(model.epsilon), jnp.asarray(model.delta),
            jnp.asarray(model.theta), jnp.asarray(model.phi))
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4,
              n_checkpoints=4)
    obs = np.zeros((nsrc, geom.nt, 9), np.float32)

    pads, shape_, spacing = _pads(model), model.shape, model.spacing
    f_ref, g_ref, il_ref = 0.0, 0.0, 0.0
    for i in range(nsrc):
        rec_i, starts, illum = tti.forward_ckpt(
            *args, jnp.asarray(src_wav), jnp.asarray(s_idx[i]),
            jnp.asarray(s_w[i]), jnp.asarray(r_idx), jnp.asarray(r_w),
            dt, with_illum=True, **kw)
        f_i, res = least_square_jax(rec_i, jnp.asarray(obs[i]))
        g_i, _ = tti.jacobian_adjoint_from_ckpt(
            *args, jnp.asarray(src_wav), jnp.asarray(s_idx[i]),
            jnp.asarray(s_w[i]), starts, res, jnp.asarray(r_idx),
            jnp.asarray(r_w), dt, **kw)
        sp = jnp.asarray(geom.src_positions[i], dtype=model.dtype)
        rp = jnp.asarray(geom.rec_positions, dtype=model.dtype)
        g_i = _fix_illum_jax(_crop(g_i, pads, shape_), sp, rp, spacing,
                             shape_)
        il_i = _fix_illum_jax(_crop(illum, pads, shape_), sp, rp,
                              spacing, shape_)
        f_ref += float(f_i)
        g_ref = g_ref + np.asarray(g_i, np.float64)
        il_ref = il_ref + np.asarray(il_i, np.float64)
    g_ref = g_ref / np.sqrt(il_ref + 1e-30)

    f_sh, g_sh = tti_fwi_obj_sharded(geom, obs, least_square,
                                     calc_grad=True, n_checkpoints=4)
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    scale = np.abs(g_ref).max()
    assert np.abs(g_sh - g_ref).max() < 1e-5 * scale


def test_visco_sharded_gradient_matches_serial():
    """Viscoacoustic shot-sharded (vp, qp) GRADIENT (round 5; r4 had
    only the sharded forward) == the single-chip objective on the
    8-device mesh."""
    from devito_fwi_tpu import SeismicModel
    from devito_fwi_tpu.parallel.sharding import \
        viscoacoustic_fwi_obj_sharded
    from devito_fwi_tpu.visco_fwi import visco_fm_multi, \
        visco_fwi_obj_multi

    nsrc = 3
    shape = (41, 36)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 18:] = 2.4
    qp = np.full(shape, 60.0, np.float32)
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)

    def mk(vpa):
        return SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                            shape=shape, space_order=4, vp=vpa, qp=qp,
                            b=1.0 / rho, nbl=8, bcs="mask", dt=1.0)

    mt = mk(vp)
    m0 = mk(np.full(shape, 2.2, np.float32))
    src = np.stack([np.linspace(50., 350., nsrc), np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 30.0)], 1)
    gt = AcquisitionGeometry(mt, rec, src, 0., 200., f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0., 200., f0=0.015,
                             src_type="Ricker")
    obs = visco_fm_multi(gt)
    f_ref, g_ref, _ = visco_fwi_obj_multi(g0, obs, least_square,
                                          calc_grad=True, shot_chunk=3)
    f_sh, g_sh = viscoacoustic_fwi_obj_sharded(g0, obs, least_square,
                                               calc_grad=True)
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    for k in ("vp", "qp"):
        scale = max(np.abs(g_ref[k]).max(), 1e-20)
        assert np.abs(g_sh[k] - g_ref[k]).max() < 1e-5 * scale, k


def test_viscoelastic_sharded_gradient_runs_and_matches_vjp():
    """Viscoelastic shot-sharded 5-parameter gradient == a serial vjp
    reference through the same forward."""
    import jax.numpy as jnp
    from devito_fwi_tpu import SeismicModel
    from devito_fwi_tpu.fwi import _batched_tables, _crop, \
        _fix_illum_jax, _pads
    from devito_fwi_tpu.ops import staggered as st
    from devito_fwi_tpu.parallel.sharding import \
        viscoelastic_fwi_obj_sharded

    nsrc = 2
    shape = (33, 29)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 14:] = 2.4
    vs = (vp / 2.0).astype(np.float32)
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)
    qp = np.full(shape, 60.0, np.float32)
    qs = np.full(shape, 40.0, np.float32)

    def mk(vpa):
        return SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                            shape=shape, space_order=4, vp=vpa, vs=vs,
                            b=1.0 / rho, qp=qp, qs=qs, nbl=6,
                            bcs="mask", dt=1.0)

    mt = mk(vp)
    m0 = mk(np.full(shape, 2.2, np.float32))
    src = np.stack([np.linspace(60., 260., nsrc), np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0., 320., 17), np.full(17, 30.0)], 1)
    gt = AcquisitionGeometry(mt, rec, src, 0., 160., f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0., 160., f0=0.015,
                             src_type="Ricker")

    # observed data through the plain forward on the true model
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(gt)
    dt = float(mt.critical_dt)
    kw = dict(nt=gt.nt, spacing=mt.spacing, space_order=4)
    obs = []
    for i in range(nsrc):
        r1, _ = st.viscoelastic_forward(
            jnp.asarray(np.asarray(mt.lam)), jnp.asarray(np.asarray(mt.mu)),
            jnp.asarray(np.asarray(mt.b)), jnp.asarray(np.asarray(mt.qp)),
            jnp.asarray(np.asarray(mt.qs)), jnp.asarray(np.asarray(mt.damp)),
            gt.f0, jnp.asarray(src_wav), jnp.asarray(s_idx[i]),
            jnp.asarray(s_w[i]), jnp.asarray(r_idx), jnp.asarray(r_w),
            dt, **kw)
        obs.append(np.asarray(r1))
    obs = np.stack(obs)

    f_sh, g_sh = viscoelastic_fwi_obj_sharded(g0, obs, least_square,
                                              calc_grad=True,
                                              precond=False)

    # serial vjp reference with the same per-shot conventions
    import jax as _jax
    pads, shp = _pads(m0), m0.shape
    crop_slc = tuple(slice(lo, lo + n) for (lo, _), n in
                     zip(m0.padsizes, shp))
    from devito_fwi_tpu.elastic_fwi import model_vp_vs_rho
    mvp, mvs, mrho = model_vp_vs_rho(m0)
    vp0 = jnp.asarray(np.asarray(mvp)[crop_slc])
    vs0 = jnp.asarray(np.asarray(mvs)[crop_slc])
    rho0 = jnp.asarray(np.asarray(mrho)[crop_slc])
    qp0 = jnp.asarray(qp)
    qs0 = jnp.asarray(qs)
    damp = jnp.asarray(np.asarray(m0.damp))
    s_idx0, s_w0, r_idx0, r_w0, src_wav0 = _batched_tables(g0)
    dt0 = float(m0.critical_dt)
    f_ref = 0.0
    g_ref = None
    il_ref = None
    for i in range(nsrc):
        def fwd(vp_, vs_, rho_, qp_, qs_):
            vpp = jnp.pad(vp_, pads, mode="edge")
            vsp = jnp.pad(vs_, pads, mode="edge")
            rhp = jnp.pad(rho_, pads, mode="edge")
            qpp = jnp.pad(qp_, pads, mode="edge")
            qsp = jnp.pad(qs_, pads, mode="edge")
            lam = rhp * (vpp * vpp - 2.0 * vsp * vsp)
            mu = rhp * vsp * vsp
            rec1, _, illum = st.viscoelastic_forward_seg(
                lam, mu, 1.0 / rhp, qpp, qsp, damp, g0.f0,
                jnp.asarray(src_wav0), jnp.asarray(s_idx0[i]),
                jnp.asarray(s_w0[i]), jnp.asarray(r_idx0),
                jnp.asarray(r_w0), dt0, nt=g0.nt, spacing=m0.spacing,
                space_order=4)
            return rec1, _crop(illum, pads, shp)

        (rec1, illum), vjp = _jax.vjp(fwd, vp0, vs0, rho0, qp0, qs0)
        f_i = 0.5 * jnp.sum((rec1 - jnp.asarray(obs[i])) ** 2)
        res = rec1 - jnp.asarray(obs[i])
        grads = vjp((res, jnp.zeros_like(illum)))
        sp = jnp.asarray(g0.src_positions[i], m0.dtype)
        rp = jnp.asarray(g0.rec_positions, m0.dtype)
        fixed = tuple(np.asarray(_fix_illum_jax(g, sp, rp, m0.spacing,
                                                shp), np.float64)
                      for g in grads)
        f_ref += float(f_i)
        g_ref = fixed if g_ref is None else \
            tuple(a + b for a, b in zip(g_ref, fixed))
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    for k, g in zip(("vp", "vs", "rho", "qp", "qs"), g_ref):
        scale = max(np.abs(g).max(), 1e-20)
        assert np.abs(g_sh[k] - g).max() < 1e-4 * scale, k


def test_sa_sharded_gradient_matches_serial():
    """Self-adjoint shot-sharded gradient == the per-shot
    forward(save) + jacobian_adjoint loop."""
    import jax.numpy as jnp
    from devito_fwi_tpu import SeismicModel
    from devito_fwi_tpu.fwi import _batched_tables, _crop, \
        _fix_illum_jax, _pads
    from devito_fwi_tpu.ops import self_adjoint as sa
    from devito_fwi_tpu.parallel.sharding import sa_fwi_obj_sharded

    nsrc = 3
    shape = (41, 36)
    nbl = 8
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 18:] = 2.4

    def mk(vpa):
        m = SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                         shape=shape, space_order=8, vp=vpa,
                         b=np.ones(shape, np.float32), nbl=nbl,
                         bcs="damp", dt=0.8)
        woq = sa.setup_w_over_q(m.padded_shape, w=2 * np.pi * 0.015,
                                qmin=0.1, qmax=100.0, npad=nbl,
                                dtype=np.float32)
        m.damp[:] = woq
        return m

    mt, m0 = mk(vp), mk(np.full(shape, 2.2, np.float32))
    src = np.stack([np.linspace(50., 350., nsrc), np.full(nsrc, 20.0)], 1)
    rec = np.stack([np.linspace(0., 400., 21), np.full(21, 30.0)], 1)
    gt = AcquisitionGeometry(mt, rec, src, 0., 160., f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0., 160., f0=0.015,
                             src_type="Ricker")
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(gt)
    dt = float(mt.critical_dt)
    kw = dict(nt=gt.nt, spacing=mt.spacing, space_order=8)
    obs = []
    for i in range(nsrc):
        r, _ = sa.forward(jnp.asarray(np.asarray(mt.vp)),
                          jnp.asarray(np.asarray(mt.b)),
                          jnp.asarray(np.asarray(mt.damp)),
                          jnp.asarray(src_wav), jnp.asarray(s_idx[i]),
                          jnp.asarray(s_w[i]), jnp.asarray(r_idx),
                          jnp.asarray(r_w), dt, **kw)
        obs.append(np.asarray(r))
    obs = np.stack(obs)

    # the sharded objective reads dt from g0's model
    assert abs(float(m0.critical_dt) - dt) < 1e-12

    f_sh, g_sh = sa_fwi_obj_sharded(g0, obs, least_square,
                                    calc_grad=True, precond=False)

    pads, shp = _pads(m0), m0.shape
    f_ref, g_ref = 0.0, None
    vp0 = jnp.asarray(np.asarray(m0.vp))
    b0 = jnp.asarray(np.asarray(m0.b))
    woq0 = jnp.asarray(np.asarray(m0.damp))
    for i in range(nsrc):
        rec_i, u0 = sa.forward(vp0, b0, woq0, jnp.asarray(src_wav),
                               jnp.asarray(s_idx[i]), jnp.asarray(s_w[i]),
                               jnp.asarray(r_idx), jnp.asarray(r_w), dt,
                               save=True, **kw)
        res = rec_i - jnp.asarray(obs[i])
        f_ref += float(0.5 * jnp.sum(res * res))
        dm, _ = sa.jacobian_adjoint(vp0, b0, woq0, u0, res,
                                    jnp.asarray(r_idx), jnp.asarray(r_w),
                                    dt, **kw)
        sp = jnp.asarray(g0.src_positions[i], m0.dtype)
        rp = jnp.asarray(g0.rec_positions, m0.dtype)
        g_i = np.asarray(_fix_illum_jax(_crop(dm, pads, shp), sp, rp,
                                        m0.spacing, shp), np.float64)
        g_ref = g_i if g_ref is None else g_ref + g_i
    assert np.isclose(f_sh, f_ref, rtol=1e-5)
    scale = max(np.abs(g_ref).max(), 1e-20)
    assert np.abs(g_sh - g_ref).max() < 1e-5 * scale
