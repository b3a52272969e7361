"""Golden-number regression tests against the reference implementation.

Values from reference ``seismic/inversion/fwi.py:95-97,121`` (camembert FWI,
float32) and ``seismic/acoustic/acoustic_example.py:75-79`` (forward norms).
These anchor the discretization-parity decisions documented in
``ops/acoustic.py`` (forward-difference damping, uniform t=1..nt-2 bounds).
"""
import numpy as np
import pytest

from devito_fwi_tpu import demo_model, AcquisitionGeometry, AcousticWaveSolver


def _camembert_setup(nshots=9, nrec=101):
    shape, spacing, origin = (101, 101), (10., 10.), (0., 0.)
    model = demo_model('circle-isotropic', vp_circle=3.0, vp_background=2.5,
                       origin=origin, shape=shape, spacing=spacing, nbl=40)
    model0 = demo_model('circle-isotropic', vp_circle=2.5, vp_background=2.5,
                        origin=origin, shape=shape, spacing=spacing, nbl=40)
    src_coordinates = np.empty((1, 2))
    src_coordinates[0, :] = np.array(model.domain_size) * .5
    src_coordinates[0, 0] = 20.
    rec_coordinates = np.empty((nrec, 2))
    rec_coordinates[:, 1] = np.linspace(0, model.domain_size[0], num=nrec)
    rec_coordinates[:, 0] = 980.
    geometry = AcquisitionGeometry(model, rec_coordinates, src_coordinates,
                                   0., 1000., f0=0.010, src_type='Ricker')
    solver = AcousticWaveSolver(model, geometry, space_order=4)
    source_locations = np.empty((nshots, 2), dtype=np.float32)
    source_locations[:, 0] = 20.
    source_locations[:, 1] = np.linspace(0., 1000, num=nshots)
    return model, model0, solver, source_locations


def _fwi_gradient(model, solver, source_locations, vp_in, nshots):
    grad = np.zeros(model.padded_shape, dtype=np.float64)
    objective = 0.
    for i in range(nshots):
        solver.geometry.src_positions[0, :] = source_locations[i, :]
        d_obs, _, _ = solver.forward(vp=model.vp)
        d_syn, u0, _ = solver.forward(vp=vp_in, save=True,
                                      rec=solver.geometry.rec)
        residual = solver.geometry.rec
        residual.data[:] = d_syn.data - d_obs.data
        objective += .5 * np.linalg.norm(residual.data) ** 2
        g, _ = solver.jacobian_adjoint(residual, u0, vp=vp_in)
        grad += np.asarray(g, dtype=np.float64)
    return objective, grad


def test_camembert_iteration1_golden():
    # reference seismic/inversion/fwi.py:93-97: 39113 / -821 / 2442 (atol 10)
    nshots = 9
    model, model0, solver, source_locations = _camembert_setup(nshots)
    ff, update = _fwi_gradient(model, solver, source_locations, model0.vp,
                               nshots)
    assert np.isclose(ff, 39113, atol=1e1, rtol=0), ff
    assert np.isclose(update.min(), -821, atol=1e1, rtol=0), update.min()
    assert np.isclose(update.max(), 2442, atol=1e1, rtol=0), update.max()


@pytest.mark.slow
def test_camembert_5_iterations_golden():
    # reference seismic/inversion/fwi.py:99-121: misfit 3828 (atol 10) after
    # 5 gradient-descent iterations with alpha = .05/max(g) and box [2.0,3.5]
    nshots = 9
    model, model0, solver, source_locations = _camembert_setup(nshots)
    vp = np.array(model0.vp)
    history = []
    for _ in range(5):
        phi, direction = _fwi_gradient(model, solver, source_locations, vp,
                                       nshots)
        history.append(phi)
        alpha = .05 / direction.max()
        vp = np.clip(vp + alpha * direction, 2.0, 3.5).astype(np.float32)
    assert np.isclose(history[-1], 3828, atol=1e1, rtol=0), history


@pytest.mark.slow
def test_acoustic_forward_norm_f64():
    # reference acoustic_example.py:75-79, fs=False dtype=f64: 459.1678
    from devito_fwi_tpu import setup_geometry
    model = demo_model('layers-isotropic', space_order=4, shape=(50, 50, 50),
                       nbl=40, dtype=np.float64, spacing=(20., 20., 20.),
                       fs=False)
    geometry = setup_geometry(model, 1000.0)
    solver = AcousticWaveSolver(model, geometry, kernel='OT2', space_order=4)
    rec, _, _ = solver.forward()
    assert np.isclose(np.linalg.norm(rec.data), 459.1678, rtol=1e-3, atol=0)


def test_acoustic_forward_norm_fs_f32():
    # reference acoustic_example.py:75-79, fs=True dtype=f32: 369.955
    from devito_fwi_tpu import setup_geometry
    model = demo_model('layers-isotropic', space_order=4, shape=(50, 50, 50),
                       nbl=40, dtype=np.float32, spacing=(20., 20., 20.),
                       fs=True)
    geometry = setup_geometry(model, 1000.0)
    solver = AcousticWaveSolver(model, geometry, kernel='OT2', space_order=4)
    rec, _, _ = solver.forward()
    assert np.isclose(np.linalg.norm(rec.data), 369.955, rtol=1e-3, atol=0)


def test_fwi_gradient_matches_finite_differences():
    """Directional-derivative check of the full FWI objective (the
    driver `--check-gradient` made quantitative): for a perturbation of
    squared slowness supported away from the source/receiver Gaussian
    masks (which fwi_obj_multi always applies, reference fwi.py:166-171),
    <grad, dm> matches the central finite difference of the objective.
    The ~0.2% residual is the continuous-adjoint discretization gap of
    the reference's gradient operator design (-u.dt2 * v), not noise:
    it is stable across eps."""
    import numpy as np
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
    from devito_fwi_tpu.misfit import least_square

    shape, spacing = (41, 41), (10., 10.)
    kw = dict(origin=(0., 0.), shape=shape, spacing=spacing, space_order=4,
              nbl=10, dt=1.0, dtype=np.float64)
    mt = demo_model("circle-isotropic", vp_circle=3.1, vp_background=2.9,
                    r=8, **kw)
    m0 = demo_model("circle-isotropic", vp_circle=2.9, vp_background=2.9,
                    r=8, **kw)
    nsrc, nrec = 3, 21
    src = np.stack([np.linspace(0, 400, nsrc), np.full(nsrc, 20.)], 1)
    rec = np.stack([np.linspace(0, 400, nrec), np.full(nrec, 380.)], 1)
    g1 = AcquisitionGeometry(mt, rec, src, 0., 250., f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0., 250., f0=0.015,
                             src_type="Ricker")
    obs = fm_multi(g1)

    def f_of_vp(vp_phys):
        m0.update("vp", vp_phys.reshape(shape))
        f, g, _ = fwi_obj_multi(g0, obs, least_square, precond=False,
                                calc_grad=True)
        return f, g

    vphys0 = np.array(m0.vp)[10:-10, 10:-10].copy()
    _, grad = f_of_vp(vphys0)
    rng = np.random.RandomState(3)
    dm = rng.randn(*shape)
    mask = np.zeros(shape)
    mask[6:35, 12:27] = 1.0        # > 5 sigma from every source/receiver
    dm = dm * mask
    dm /= np.abs(dm).max()
    m_sq = 1.0 / vphys0 ** 2
    eps = 1e-6
    fp, _ = f_of_vp(1.0 / np.sqrt(m_sq + eps * dm))
    fm_, _ = f_of_vp(1.0 / np.sqrt(m_sq - eps * dm))
    fd = (fp - fm_) / (2 * eps)
    an = float(np.dot(grad.ravel(), dm.ravel()))
    assert abs(fd - an) / abs(an) < 0.01
