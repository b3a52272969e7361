"""Optimizer / line-search / outer-loop tests.

Validates the direction engines on quadratic objectives and the full
minimize loop on a small camembert FWI (3 iterations, L2 + bracket line
search) — the reference's structural test is running circle_fwi.py.
"""
import os
import numpy as np
import pytest

from devito_fwi_tpu.optimize import SteepestDescent, NLCG, LBFGS, minimize
from devito_fwi_tpu.optimize.optimizers import _LBFGS, _NLCG
from devito_fwi_tpu.optimize.line_search import Bracket, Backtrack


def quad(x, A, b):
    return 0.5 * x @ A @ x - b @ x, A @ x - b


def _minimize_quad(opt_engine, n=8, iters=60, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.normal(size=(n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.normal(size=n)
    x = np.zeros(n)
    xstar = np.linalg.solve(A, b)
    for _ in range(iters):
        f, g = quad(x, A, b)
        p, restarted = opt_engine.compute_direction(x, g)
        # exact line search for quadratics
        denom = p @ A @ p
        alpha = -(g @ p) / denom if denom > 0 else 0.0
        x = x + alpha * p
    return np.linalg.norm(x - xstar) / np.linalg.norm(xstar)


def test_nlcg_quadratic_convergence():
    # CG on an SPD quadratic converges in ~n steps
    err = _minimize_quad(_NLCG(beta_type='FR', thresh=np.inf), n=8, iters=12)
    assert err < 1e-6


def test_lbfgs_quadratic_convergence():
    err = _minimize_quad(_LBFGS(memory=8), n=8, iters=30)
    assert err < 1e-5


def test_lbfgs_secant_is_gradient_difference():
    # guards the deliberate fix of reference optimizer/LBFGS.py:58
    eng = _LBFGS(memory=3)
    g0 = np.array([1.0, 2.0]); m0 = np.array([0.0, 0.0])
    eng.compute_direction(m0, g0)
    # positive-curvature pair: y.s > 0
    g1 = np.array([1.2, 2.3]); m1 = np.array([0.1, 0.2])
    eng.compute_direction(m1, g1)
    np.testing.assert_allclose(eng.Y[:, 0], g1 - g0)
    np.testing.assert_allclose(eng.S[:, 0], m1 - m0)


def test_bracket_line_search_minimizes_parabola(tmp_path):
    ls = Bracket(step_count_max=20, path=str(tmp_path))
    f = lambda a: (a - 2.0) ** 2 + 1.0
    gtg, gtp = 4.0, -4.0  # g = -4 at a=0 along p
    alpha, status = ls.initialize(0.0, f(0.0), gtg, gtp)
    for _ in range(30):
        alpha, status = ls.update(alpha, f(alpha))
        if status != 0:
            break
    assert status > 0
    x, fv = ls.search_history()[0:2]
    assert abs(x[fv.argmin()] - 2.0) < 0.5
    assert os.path.exists(os.path.join(str(tmp_path), "optim_info"))


def test_backtrack_accepts_unit_step(tmp_path):
    ls = Backtrack(step_count_max=10, path=str(tmp_path))
    # simulate second iteration (update_count>0 requires a zero step in history)
    ls.initialize(0.0, 5.0, 1.0, -1.0)
    ls.clear_history()
    ls.step_lens = [0.0, 1.0, 0.0]
    ls.func_vals = [5.0, 4.0, 4.0]
    ls.gtg = [1.0, 1.0]
    ls.gtp = [-1.0, -1.0]
    ls.step_count = 0
    alpha, status = ls.calculate_step()
    assert alpha == 1.0 and status == 0


def test_minimize_camembert_small(tmp_path):
    # end-to-end: 3 LBFGS iterations reduce the misfit on a small camembert
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi
    from devito_fwi_tpu.misfit import least_square

    shape, spacing = (61, 61), (10., 10.)
    nbl, nsrc = 20, 3
    true_model = demo_model('circle-isotropic', vp_circle=3.3,
                            vp_background=3.0, r=15, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=nbl, dt=1.2)
    init_model = demo_model('circle-isotropic', vp_circle=3.0,
                            vp_background=3.0, r=15, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=nbl, dt=1.2)
    src_coordinates = np.empty((nsrc, 2))
    src_coordinates[:, 1] = np.linspace(0, true_model.domain_size[0], nsrc)
    src_coordinates[:, 0] = 20.
    rec_coordinates = np.empty((31, 2))
    rec_coordinates[:, 1] = np.linspace(0, true_model.domain_size[0], 31)
    rec_coordinates[:, 0] = 580.
    geometry1 = AcquisitionGeometry(true_model, rec_coordinates,
                                    src_coordinates, 0., 400., f0=0.010,
                                    src_type='Ricker')
    geometry0 = AcquisitionGeometry(init_model, rec_coordinates,
                                    src_coordinates, 0., 400., f0=0.010,
                                    src_type='Ricker')
    obs = fm_multi(geometry1)

    v0 = init_model.crop(init_model.vp)
    m0 = 1.0 / (v0.reshape(-1).astype(np.float64)) ** 2
    bounds = [1.0 / 4.0 ** 2, 1.0 / 2.5 ** 2]
    optimizer = LBFGS(memory=5, ls_method='Bracket', step_len_init=0.05,
                      max_ls=5, log_path=str(tmp_path))
    minimizer = minimize(optimizer, maxIter=3, ftol=1e-6,
                         log_path=str(tmp_path))
    m = minimizer.run(m0, geometry0, obs, least_square, None, None, True,
                      bounds)
    misfits = np.loadtxt(os.path.join(str(tmp_path), 'misfit'))
    assert misfits.shape[0] == 3
    assert misfits[-1, 0] < misfits[0, 0]  # misfit decreased
    # log files written with the reference formats
    for name in ('optim_info', 'fval', 'step_length', 'sim_count'):
        assert os.path.exists(os.path.join(str(tmp_path), name))


def _camembert_setup():
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.fwi import fm_multi
    shape, spacing = (61, 61), (10., 10.)
    nbl, nsrc = 20, 3
    true_model = demo_model('circle-isotropic', vp_circle=3.3,
                            vp_background=3.0, r=15, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=nbl, dt=1.2)
    init_model = demo_model('circle-isotropic', vp_circle=3.0,
                            vp_background=3.0, r=15, origin=(0., 0.),
                            shape=shape, spacing=spacing, space_order=4,
                            nbl=nbl, dt=1.2)
    src_coordinates = np.empty((nsrc, 2))
    src_coordinates[:, 1] = np.linspace(0, true_model.domain_size[0], nsrc)
    src_coordinates[:, 0] = 20.
    rec_coordinates = np.empty((31, 2))
    rec_coordinates[:, 1] = np.linspace(0, true_model.domain_size[0], 31)
    rec_coordinates[:, 0] = 580.
    geometry1 = AcquisitionGeometry(true_model, rec_coordinates,
                                    src_coordinates, 0., 400., f0=0.010,
                                    src_type='Ricker')
    geometry0 = AcquisitionGeometry(init_model, rec_coordinates,
                                    src_coordinates, 0., 400., f0=0.010,
                                    src_type='Ricker')
    obs = fm_multi(geometry1)
    v0 = init_model.crop(init_model.vp)
    m0 = 1.0 / (v0.reshape(-1).astype(np.float64)) ** 2
    return geometry0, obs, m0


def test_minimize_checkpoint_resume(tmp_path):
    """An inversion interrupted after 1 iteration and resumed must produce
    the same model as an uninterrupted 3-iteration run (the reference has
    no resume at all — SURVEY.md §5)."""
    from devito_fwi_tpu.misfit import least_square
    geometry0, obs, m0 = _camembert_setup()
    bounds = [1.0 / 4.0 ** 2, 1.0 / 2.5 ** 2]

    def run(path, maxiter, resume=False):
        optimizer = LBFGS(memory=5, ls_method='Bracket', step_len_init=0.05,
                          max_ls=5, log_path=path)
        minimizer = minimize(optimizer, maxIter=maxiter, ftol=1e-9,
                             log_path=path, resume=resume)
        return minimizer.run(np.array(m0), geometry0, obs, least_square,
                             None, None, True, bounds)

    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    m_full = run(pa, 3)
    m_part = run(pb, 1)
    m_resumed = run(pb, 3, resume=True)
    assert np.allclose(m_resumed, m_full, rtol=1e-6, atol=1e-12)
    assert not np.allclose(m_part, m_full)
    # the resume must have APPENDED to the pre-interrupt logs, not wiped
    # them: optim_info keeps its iteration-1 row and the scalar metric
    # files carry one value per completed iteration
    import os
    with open(os.path.join(pb, "optim_info")) as f:
        rows = [ln.split() for ln in f if ln.strip() and not
                ln.lstrip().startswith(("I", "=", "-"))]
    # iteration rows have 3 columns (trial rows within an iteration
    # omit ITER — reference optim_info format)
    iters = sorted({int(r[0]) for r in rows if len(r) == 3})
    assert iters[0] == 1 and iters[-1] >= 3
    with open(os.path.join(pb, "fval")) as f:
        assert len(f.readlines()) >= 3


def test_nlcg_default_thresh_keeps_conjugate_direction():
    """Default-constructed NLCG must act as CG, not silently restart to
    steepest descent every iteration (the reference's thresh=0 default
    does exactly that — documented divergence, optimizers.py)."""
    from devito_fwi_tpu.optimize.optimizers import _NLCG
    o = _NLCG()
    g1 = np.array([1.0, 0.0])
    p1, r1 = o.compute_direction(None, g1)
    assert r1 == 0 and np.allclose(p1, -g1)
    g2 = np.array([0.1, 0.4])
    p2, r2 = o.compute_direction(None, g2)
    assert r2 == 0
    assert not np.allclose(p2, -g2)        # conjugate, not SD
    assert np.dot(p2, g2) < 0              # still a descent direction


def test_minimize_random_batch_converges(tmp_path):
    """Random-batch FWI (batch_size < nsrc): each iteration runs on a
    seeded random shot subset; the inversion must still reduce the
    full-batch misfit."""
    from devito_fwi_tpu.misfit import least_square
    from devito_fwi_tpu.fwi import fwi_obj_multi
    geometry0, obs, m0 = _camembert_setup()
    bounds = [1.0 / 4.0 ** 2, 1.0 / 2.5 ** 2]
    f_start, _, _ = fwi_obj_multi(geometry0, obs, least_square)

    optimizer = LBFGS(memory=5, ls_method='Bracket', step_len_init=0.05,
                      max_ls=4, log_path=str(tmp_path))
    minimizer = minimize(optimizer, maxIter=4, ftol=1e-12,
                         log_path=str(tmp_path), batch_size=2,
                         batch_seed=7)
    m = minimizer.run(np.array(m0), geometry0, obs, least_square,
                      None, None, True, bounds)
    geometry0.model.update("vp", 1.0 / np.sqrt(
        m.reshape(geometry0.model.shape)))
    f_end, _, _ = fwi_obj_multi(geometry0, obs, least_square)
    assert f_end < 0.7 * f_start


def test_writer_resume_continues_iter_numbering(tmp_path):
    """A preserved optim_info must continue ITER numbering on resume
    instead of restarting at 1."""
    from devito_fwi_tpu.optimize.line_search import Writer
    w = Writer(str(tmp_path))
    w(0.0, 10.0)          # ITER 1
    w(0.5, 9.0)           # continuation row
    w(0.0, 8.0)           # ITER 2
    w2 = Writer(str(tmp_path), preserve=True)
    assert w2.iter == 2
    w2(0.0, 7.0)          # must be ITER 3
    rows = [r for r in open(w2.filename)
            if r[:10].strip().isdigit()]
    assert [int(r[:10]) for r in rows] == [1, 2, 3]


class _FakeGeom:
    nsrc = 1


def test_line_search_survives_nonfinite_trials():
    """A trial objective that blows up to NaN above a step threshold
    (e.g. a bounded model beyond the pinned dt's CFL limit) must be
    backtracked through — never accepted, never looped on (round-5
    elastic driver bug: the search produced 2000+ NaN rows)."""
    import tempfile
    from devito_fwi_tpu.optimize import SteepestDescent, minimize

    n = 8
    m_star = np.linspace(1.0, 2.0, n)

    calls = {"n": 0}

    def loss(x, geometry, obs, misfit_func, direct_wave=None, mask=None,
             precond=True, calc_grad=True, shot_indices=None):
        calls["n"] += 1
        d = x - m_star
        f = 0.5 * float(d @ d)
        # blow up past the minimizer (NaN region beyond alpha ~1.1)
        if np.abs(x - 1.5).max() > 0.55:
            f = float("nan")
        if not calc_grad:
            return f, None, []
        return f, d.astype(np.float64), []

    x0 = np.full(n, 1.5)
    with tempfile.TemporaryDirectory() as td:
        opt = SteepestDescent(ls_method="Bracket", step_len_init=None,
                              max_ls=8, log_path=td)
        mm = minimize(opt, maxIter=4, ftol=1e-12, log_path=td,
                      loss_fn=loss).run(
            x0, _FakeGeom(), None, None, None, None, True, None)
    # the contract: terminate with a FINITE model in bounded calls —
    # no NaN ever accepted, no infinite retry loop — AND make real
    # progress: after the blown-up first proposal, the guard's
    # shrink/bisect lets a bracket form inside the stable region
    f0 = 0.5 * float((x0 - m_star) @ (x0 - m_star))
    f1 = 0.5 * float((mm - m_star) @ (mm - m_star))
    assert np.isfinite(mm).all()
    assert f1 < 0.5 * f0
    assert calls["n"] < 150  # bounded — no infinite NaN retry loop


def test_minimize_aborts_on_nonfinite_gradient_objective():
    """If the objective at the CURRENT model is non-finite, minimize
    must return the last model instead of restart-looping forever."""
    import tempfile
    from devito_fwi_tpu.optimize import SteepestDescent, minimize

    def loss(x, *a, calc_grad=True, **k):
        return float("nan"), np.ones_like(x), []

    x0 = np.ones(5)
    with tempfile.TemporaryDirectory() as td:
        opt = SteepestDescent(ls_method="Bracket", log_path=td)
        mm = minimize(opt, maxIter=3, ftol=1e-12, log_path=td,
                      loss_fn=loss).run(
            x0, _FakeGeom(), None, None, None, None, True, None)
    assert np.array_equal(mm, x0)
