"""Real-data Marmousi (SMARMN) regression tests.

The reference's flagship drivers run on the vendored binary velocity
models (`/root/reference/marmousi_fwi.py:62-96` loading
`model_data/SMARMN/vp.true` + `vp.smooth_20`). These tests pin golden
numbers produced by this framework on the true data at the reference
acquisition constants (dx=30m, so=8, nbl=40, dt=2.95ms, tn=4000ms,
f0=7Hz) so the end-to-end Marmousi pipeline — forward modeling,
direct-wave subtraction, bathy mask, preconditioned gradient, all three
misfits — is locked against regressions.

Goldens recorded on the CPU backend (the test platform), nsrc=3 — the
3-shot source positions coincide with shots {0, 14, 28} of the 29-shot
driver layout, and the per-shot gather norms were verified identical on
the real TPU chip (f32, rtol < 1e-5).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "drivers"))

import _marmousi_common as mc  # noqa: E402
from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi  # noqa: E402
from devito_fwi_tpu.misfit import least_square, qWasserstein  # noqa: E402


def _have_data():
    return os.path.exists(os.path.join(mc.default_data_dir(),
                                       "SMARMN", "vp.true"))


needs_data = pytest.mark.skipif(not _have_data(),
                                reason="vendored model_data absent")


@needs_data
def test_real_data_loads():
    true_vp, smooth_vp = mc.load_models(mc.SMARMN, mc.default_data_dir())
    assert true_vp.shape == (300, 106)
    # water layer rows 0-6 at 1.5 km/s; full range 1.5-5.2 km/s
    assert np.allclose(true_vp[:, :7], 1.5)
    assert np.isclose(true_vp.min(), 1.5) and np.isclose(true_vp.max(), 5.2)
    assert smooth_vp.shape == (300, 106)
    assert np.isclose(smooth_vp.min(), 1.5)
    # the smooth model is genuinely the vendored vp.smooth_20, not a
    # gaussian_filter fallback of the truth
    ref = np.fromfile(os.path.join(mc.default_data_dir(), "SMARMN",
                                   "vp.smooth_20"),
                      dtype=np.float32).reshape(300, 106) / 1000
    assert np.array_equal(smooth_vp, ref)


@needs_data
def test_marmousi2_data_loads():
    true_vp, smooth_vp = mc.load_models(mc.SMARM2, mc.default_data_dir())
    assert true_vp.shape == (340, 140)
    assert np.allclose(true_vp[:, :15], 1.5)


@pytest.fixture(scope="module")
def marmousi3():
    """3-shot SMARMN setup + obs/direct-wave gathers (reference
    marmousi_fwi.py:62-128 flow at reduced shot count)."""
    if not _have_data():
        pytest.skip("vendored model_data absent")
    args = mc.make_parser(mc.SMARMN).parse_args([])
    models, geoms, vps, bathy_mask = mc.setup(mc.SMARMN, args, 3)
    g1, g0, g2 = geoms
    obs = fm_multi(g1)
    dw = fm_multi(g2)
    return g0, obs, dw, bathy_mask


@pytest.mark.slow
@needs_data
def test_marmousi_forward_gather_norms(marmousi3):
    _, obs, dw, _ = marmousi3
    norms = [float(np.linalg.norm(o.data)) for o in obs]
    assert np.allclose(norms, [2159.8604, 2834.301, 2263.0217], rtol=1e-3)
    # direct wave is water-only: much weaker late energy than obs
    assert float(np.linalg.norm(dw[0].data)) < norms[0]


@pytest.mark.slow
@needs_data
def test_marmousi_l2_gradient_golden(marmousi3):
    g0, obs, dw, bathy_mask = marmousi3
    f, g, _ = fwi_obj_multi(g0, obs, least_square, dw, bathy_mask,
                            precond=True, calc_grad=True)
    assert np.isclose(f, 2143569.0, rtol=5e-3)
    assert np.isclose(g.min(), -248.897, rtol=5e-3)
    assert np.isclose(g.max(), 156.910, rtol=5e-3)
    assert np.isclose(np.abs(g).sum(), 446466.45, rtol=5e-3)
    # bathy mask: gradient zero in the water rows
    gm = g.reshape(300, 106)
    assert np.all(gm[:, :7] == 0.0)


@pytest.mark.slow
@needs_data
def test_marmousi_w2_1d_gradient_golden(marmousi3):
    g0, obs, dw, bathy_mask = marmousi3
    qw = qWasserstein(gamma=1.01, method="1d")
    f, g, _ = fwi_obj_multi(g0, obs, qw, dw, bathy_mask,
                            precond=True, calc_grad=True)
    assert np.isclose(f, 0.00017015195, rtol=5e-3)
    assert np.isclose(g.min(), -2.176789e-05, rtol=5e-3)
    assert np.isclose(g.max(), 1.0790977e-05, rtol=5e-3)


@pytest.mark.slow
@needs_data
def test_marmousi_w2_2d_native_gather_golden(marmousi3):
    """Native C++ BFM on one real Marmousi gather at the driver's W2
    config (num_steps=15, step_scale=1 — marmousi_fwi.py:131-132)."""
    g0, obs, dw, _ = marmousi3
    syn = fm_multi(g0)
    qw = qWasserstein(gamma=1.01, method="2d", num_steps=15,
                      step_scale=1.0, bfm_backend="native")
    loss, grad = qw(syn[1].data - dw[1].data, obs[1].data - dw[1].data)
    assert np.isclose(loss, 1.2750385e-07, rtol=1e-2)
    # grad scaling: bfm grad / mean(mu) per reference misfit.py:73 (mu is
    # the linearly-shifted density, so mean(mu) >> mean(raw traces))
    assert np.isclose(grad.min(), -6.928444e-08, rtol=1e-2)
    assert np.isclose(grad.max(), 1.1225869e-07, rtol=1e-2)
