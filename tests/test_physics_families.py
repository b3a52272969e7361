"""Golden-norm + stability tests for elastic / viscoelastic / viscoacoustic.

Reference baselines (BASELINE.md / SURVEY.md §6):

* elastic rec1 (tau_zz) norm 19.25636 atol 1e-3
  (``seismic/elastic/elastic_example.py:36-41``)
* viscoelastic rec1 norm 12.28040 atol 1e-3
  (``seismic/viscoelastic/viscoelastic_example.py:38-43``)
* viscoacoustic rec norms sls2/sls1/ren2/ren1/deng2/deng1 =
  684.385 / 18.774 / 677.673 / 17.995 / 673.041 / 18.488, atol 1e-2
  (``seismic/viscoacoustic/viscoacoustic_example.py:39-50``)

The rec2 = div(v) traces follow devito's expression-interpolation
convention for staggered fields, reverse-engineered against the
reference goldens (0.627606 elastic / 0.312461 viscoelastic): each
``v[i].d{i}`` is the centered first derivative on the component's own
staggered grid, gathered with node-index bilinear weights (see
``ops/staggered.py`` module docstring). This reproduces the elastic
golden to 3e-6; seven other candidate conventions (node D-/D+
divergence, receiver half-cell shifts, staggered-weight gathers) land
0.52-0.82 and were rejected.
"""
import numpy as np
import pytest

from devito_fwi_tpu.models.presets import demo_model
from devito_fwi_tpu.models.geometry import setup_geometry
from devito_fwi_tpu.ops.elastic_wavesolver import (ElasticWaveSolver,
                                                   ViscoelasticWaveSolver)
from devito_fwi_tpu.ops.viscoacoustic_wavesolver import ViscoacousticWaveSolver


def _run_elastic(shape=(50, 50), spacing=(20., 20.), tn=1000., nbl=40,
                 so=4, preset="layers-elastic"):
    model = demo_model(preset, space_order=so, shape=shape, nbl=nbl,
                       dtype=np.float32, spacing=spacing)
    geometry = setup_geometry(model, tn)
    solver = ElasticWaveSolver(model, geometry, space_order=so)
    rec1, rec2, _, _, _ = solver.forward()
    return rec1, rec2


def test_elastic_golden():
    rec1, rec2 = _run_elastic()
    assert np.isclose(np.linalg.norm(rec1.data), 19.25636, atol=1e-3, rtol=0)
    assert np.isclose(np.linalg.norm(rec2.data), 0.627606, atol=1e-3, rtol=0)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_elastic_stability(ndim):
    shape = tuple([11] * ndim)
    spacing = tuple([20.] * ndim)
    rec1, _ = _run_elastic(shape=shape, spacing=spacing, tn=20000.0, nbl=0)
    assert np.isfinite(np.linalg.norm(rec1.data))


def test_viscoelastic_golden():
    model = demo_model("layers-viscoelastic", space_order=4, shape=(50, 50),
                       nbl=40, dtype=np.float32, spacing=(20., 20.))
    # geometry is built before the solver rescales dt, like the reference
    # (viscoelastic_example.py:10-22 -> wavesolver.py:35)
    geometry = setup_geometry(model, 1000.)
    solver = ViscoelasticWaveSolver(model, geometry, space_order=4)
    rec1, rec2, _, _, _ = solver.forward()
    assert np.isclose(np.linalg.norm(rec1.data), 12.28040, atol=1e-3, rtol=0)
    assert np.isclose(np.linalg.norm(rec2.data), 0.312461, atol=1e-3, rtol=0)


def test_viscoelastic_stability():
    model = demo_model("layers-viscoelastic", space_order=4, shape=(11, 11),
                       nbl=0, dtype=np.float32, spacing=(20., 20.))
    geometry = setup_geometry(model, 20000.)
    solver = ViscoelasticWaveSolver(model, geometry, space_order=4)
    rec1, _, _, _, _ = solver.forward()
    assert np.isfinite(np.linalg.norm(rec1.data))


VA_GOLDEN = [("sls", 2, 684.385), ("sls", 1, 18.774), ("ren", 2, 677.673),
             ("ren", 1, 17.995), ("deng_mcmechan", 2, 673.041),
             ("deng_mcmechan", 1, 18.488)]


def _va_setup(shape=(50, 50), spacing=(20., 20.), tn=1000., nbl=40, so=4):
    model = demo_model("layers-viscoacoustic", space_order=so, shape=shape,
                       nbl=nbl, dtype=np.float32, spacing=spacing)
    geometry = setup_geometry(model, tn)
    return model, geometry


@pytest.mark.parametrize("kernel, time_order, normrec", VA_GOLDEN)
def test_viscoacoustic_golden(kernel, time_order, normrec):
    model, geometry = _va_setup()
    solver = ViscoacousticWaveSolver(model, geometry, space_order=4,
                                     kernel=kernel, time_order=time_order)
    rec, _, _, _ = solver.forward()
    assert np.isclose(np.linalg.norm(rec.data), normrec, atol=1e-2, rtol=0)


@pytest.mark.parametrize("kernel", ["sls", "ren", "deng_mcmechan"])
@pytest.mark.parametrize("time_order", [1, 2])
def test_viscoacoustic_stability(kernel, time_order):
    model, geometry = _va_setup(shape=(11, 11), tn=20000.0, nbl=0)
    solver = ViscoacousticWaveSolver(model, geometry, space_order=4,
                                     kernel=kernel, time_order=time_order)
    rec, _, _, _ = solver.forward()
    assert np.isfinite(np.linalg.norm(rec.data))


def test_viscoacoustic_3d_smoke():
    model = demo_model("layers-viscoacoustic", space_order=4,
                       shape=(21, 21, 21), nbl=5, dtype=np.float32,
                       spacing=(20., 20., 20.))
    geometry = setup_geometry(model, 200.)
    solver = ViscoacousticWaveSolver(model, geometry, space_order=4)
    rec, _, _, _ = solver.forward()
    assert np.isfinite(rec.data).all() and np.abs(rec.data).max() > 0


def test_viscoacoustic_adjoint_smoke():
    model, geometry = _va_setup(tn=500.)
    for kernel, to in [("sls", 1), ("sls", 2)]:
        solver = ViscoacousticWaveSolver(model, geometry, space_order=4,
                                         kernel=kernel, time_order=to)
        rec, _, _, _ = solver.forward()
        srca, _, _, _ = solver.adjoint(rec)
        assert np.isfinite(srca.data).all()
        assert np.abs(srca.data).max() > 0


@pytest.mark.parametrize("kernel", ["sls", "ren", "deng_mcmechan"])
@pytest.mark.parametrize("time_order", [1, 2])
def test_viscoacoustic_adjoint_dot(kernel, time_order):
    """f64 dot test <F(s), r> = <s, F^T(r)> for every viscoacoustic kernel
    (reference AdjointOperators,
    ``seismic/viscoacoustic/operators.py:456-543``): the time-reversed
    adjoint recursions are exact discrete transposes of the forward maps."""
    import jax.numpy as jnp
    from devito_fwi_tpu.ops import viscoacoustic as va
    from devito_fwi_tpu.ops.interp import interp_table

    model = demo_model("layers-viscoacoustic", space_order=4, shape=(41, 41),
                       nbl=10, dtype=np.float64, spacing=(10., 10.))
    geometry = setup_geometry(model, 300.)
    src_idx, src_w = interp_table(geometry.src_positions, model.origin_pml,
                                  model.spacing, dtype=model.dtype)
    rec_idx, rec_w = interp_table(geometry.rec_positions, model.origin_pml,
                                  model.spacing, dtype=model.dtype)
    src_wav = geometry.src.data.astype(np.float64)
    dt, nt = model.critical_dt, geometry.nt
    vp, b, qp, damp = (jnp.asarray(model.vp), jnp.asarray(model.b),
                       jnp.asarray(model.qp), jnp.asarray(model.damp))
    rec, _ = va.forward(vp, b, qp, damp, jnp.asarray(src_wav), src_idx,
                        src_w, rec_idx, rec_w, dt, geometry.f0,
                        kernel=kernel, time_order=time_order, nt=nt,
                        spacing=model.spacing, space_order=4)
    r = jnp.asarray(np.random.RandomState(7).randn(*rec.shape))
    srca, _ = va.adjoint(vp, b, qp, damp, r, rec_idx, rec_w, src_idx,
                         src_w, dt, geometry.f0, kernel=kernel,
                         time_order=time_order, nt=nt,
                         spacing=model.spacing, space_order=4)
    lhs = float(jnp.sum(rec * r))
    rhs = float(jnp.sum(jnp.asarray(src_wav) * srca))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-10
