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
