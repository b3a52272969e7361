"""Interpreter-mode parity for the 3-D Pallas per-step stencil core
(ops/pallas_acoustic3.py): the kernel must reproduce the XLA
lap+update EXACTLY (same association), standalone and hooked into the
full forward/checkpointed-gradient machinery."""
import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ac = importlib.import_module("devito_fwi_tpu.ops.acoustic")
p3 = importlib.import_module("devito_fwi_tpu.ops.pallas_acoustic3")


def _rand_fields(nx, ny, nz, seed=0):
    rng = np.random.RandomState(seed)
    u = jnp.asarray(rng.randn(nx, ny, nz), jnp.float32)
    up = jnp.asarray(rng.randn(nx, ny, nz), jnp.float32)
    vp = jnp.asarray(1.5 + rng.rand(nx, ny, nz), jnp.float32)
    m = 1.0 / (vp * vp)
    hd = jnp.asarray(0.05 * rng.rand(nx, ny, nz), jnp.float32)
    return u, up, m, hd


@pytest.mark.parametrize("so,XB", [(4, 8), (8, 16), (8, 12)])
def test_step3_matches_xla_update(so, XB):
    nx, ny, nz = 48, 20, 36
    u, up, m, hd = _rand_fields(nx, ny, nz)
    spacing = (10.0, 12.0, 14.0)
    dt = 1.1
    w_full = ac.second_derivative_weights(so)
    w = jnp.asarray(w_full[so // 2:], jnp.float32)
    inv_h2 = [jnp.float32(1.0 / h ** 2) for h in spacing]
    s2 = jnp.float32(dt * dt)
    inv_mhd = 1.0 / (m + hd)
    lap = ac.laplacian_parts(u, w, inv_h2, False)
    ref = ac._update(u, up, lap, 0.0, m, hd, s2, inv_mhd)

    wt = tuple(float(x) for x in np.asarray(w))
    ih = tuple(float(1.0 / h ** 2) for h in spacing)
    out = p3.step3(u, up, m, hd, s2, w=wt, inv_h2=ih, XB=XB,
                   interpret=True)
    d = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert d < 1e-6 * max(np.abs(np.asarray(ref)).max(), 1e-30), d


def test_pick_xb():
    assert p3.pick_xb(96, 4) == 16
    assert p3.pick_xb(96, 2) == 16
    assert p3.pick_xb(97, 4) is None          # prime-ish: no blocking
    assert p3.pick_xb(64, 4) == 16


def _geom3(nt_ms=300.0):
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.models.geometry import AcquisitionGeometry

    kw = dict(shape=(32, 28, 24), spacing=(15., 15., 15.), space_order=4,
              nbl=8, dt=1.5, dtype=np.float32)
    model1 = demo_model("layers-isotropic", nlayers=3, **kw)
    model0 = demo_model("layers-isotropic", nlayers=1, **kw)
    nsrc, nrec = 2, 12
    ext = model1.domain_size[0]
    src = np.stack([np.linspace(0, ext, nsrc), np.full(nsrc, ext / 2),
                    np.full(nsrc, 30.0)], 1)
    rec = np.stack([np.linspace(0, ext, nrec), np.full(nrec, ext / 2),
                    np.full(nrec, 30.0)], 1)
    g1 = AcquisitionGeometry(model1, rec, src, 0.0, nt_ms, f0=0.015,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(model0, rec, src, 0.0, nt_ms, f0=0.015,
                             src_type="Ricker")
    return g0, g1


def test_forward3_and_gradient_match_xla(monkeypatch):
    """Full 3-D L2 gradient objective with the Pallas step core
    (interpret) == the XLA path. The padded x extent must admit a
    blocking for the fast path to engage — asserted, so a regression
    that silently falls back fails loudly."""
    from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
    from devito_fwi_tpu.misfit import least_square

    g0, g1 = _geom3()
    nx_p = g0.model.padded_shape[0]
    assert p3.pick_xb(nx_p, 2) is not None

    obs = fm_multi(g1)
    f_ref, grad_ref, _ = fwi_obj_multi(g0, obs, least_square, None, None,
                                       True, calc_grad=True)

    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS3", "1")
    # pin the objective to the XLA machinery + step3 hook: the streaming
    # 3-D route (pallas_acoustic3d, default-on under interpret) would
    # otherwise take the geometry first and this test would no longer
    # exercise the per-step kernel's integration
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS3D", "0")
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    jax.clear_caches()            # the env gate is read at trace time
    assert p3.enabled()
    obs2 = fm_multi(g1)
    f_p, grad_p, _ = fwi_obj_multi(g0, obs2, least_square, None, None,
                                   True, calc_grad=True)
    jax.clear_caches()

    assert np.isclose(f_p, f_ref, rtol=1e-5)
    scale = np.abs(np.asarray(grad_ref)).max()
    d = np.abs(np.asarray(grad_p) - np.asarray(grad_ref)).max()
    assert d < 1e-4 * scale, d / scale
