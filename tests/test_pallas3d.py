"""Interpreter-mode parity for the streamed 3-D Pallas segment kernels
(ops/pallas_acoustic3d.py): forward traces / dt2 history / illumination
and the reverse-sweep gradient must match the XLA saved-history path
(ops.acoustic forward(save=True) + gradient) on a layered 3-D model,
with and without the free surface. Mirrors tests/test_pallas.py's 2-D
streamed test structure."""
import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ac = importlib.import_module("devito_fwi_tpu.ops.acoustic")
p3d = importlib.import_module("devito_fwi_tpu.ops.pallas_acoustic3d")

from devito_fwi_tpu.fwi import _batched_tables, _solver_dt  # noqa: E402
from devito_fwi_tpu.models.geometry import AcquisitionGeometry  # noqa: E402
from devito_fwi_tpu.models.presets import demo_model  # noqa: E402


def _geom3(fs=False, tn=150.0, rec_depth=37.0):
    kw = dict(shape=(24, 20, 16), spacing=(15., 15., 15.), space_order=4,
              nbl=8, dt=1.5, dtype=np.float32, fs=fs)
    model = demo_model("layers-isotropic", nlayers=3, **kw)
    nsrc, nrec = 2, 12
    ext = model.domain_size[0]
    eyt = model.domain_size[1]
    src = np.stack([np.linspace(0, ext, nsrc),
                    np.linspace(eyt * 0.3, eyt * 0.7, nsrc),
                    np.full(nsrc, 30.0)], 1)
    rec = np.stack([np.linspace(0, ext, nrec),
                    np.linspace(0, eyt, nrec),
                    np.full(nrec, rec_depth)], 1)  # off-node z: two planes
    return AcquisitionGeometry(model, rec, src, 0.0, tn, f0=0.015,
                               src_type="Ricker")


def _operands(geom):
    model = geom.model
    s_idx, s_w, r_idx, r_w, wav = (jnp.asarray(a)
                                   for a in _batched_tables(geom))
    dt, nt = float(_solver_dt(geom)), geom.nt
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    m = 1.0 / (vp * vp)
    nx, ny, nz = model.padded_shape
    return s_idx, s_w, r_idx, r_w, wav, dt, nt, vp, damp, m, nx, ny, nz


@pytest.mark.parametrize("fs", [False, True])
# rec_depth 107 puts the receiver pair at z0=15 — sublane-tile offset 7,
# the straddling L=16 band of the aligned zpair helpers (a bare 2-wide
# window at offsets 3..7 aborts the Mosaic compiler on chip)
@pytest.mark.parametrize("R,rec_depth", [(8, 37.0), (16, 107.0)])
def test_stream3_forward_and_gradient_match_xla(fs, R, rec_depth):
    geom = _geom3(fs, rec_depth=rec_depth)
    model = geom.model
    assert p3d.geometry_supported3(geom)
    (s_idx, s_w, r_idx, r_w, wav, dt, nt, vp, damp, m,
     nx, ny, nz) = _operands(geom)
    so = model.space_order
    statics = dict(nt=nt, spacing=model.spacing, space_order=so,
                   kernel="OT2", fs=fs)

    # ---- XLA reference: saved-history forward + gradient ----
    recs, u_hist = jax.vmap(
        lambda a, b: ac.forward(vp, damp, wav, a, b, r_idx, r_w, dt,
                                save=True, **statics))(s_idx, s_w)
    illum_ref = np.asarray(jnp.sum(u_hist * u_hist, axis=1))
    rng = np.random.RandomState(0)
    res = jnp.asarray((np.asarray(recs) * 0.1 + 0.01 * rng.randn(
        *recs.shape)).astype(np.float32))
    gref = np.asarray(jax.vmap(
        lambda u, r: ac.gradient(vp, damp, u, r, r_idx, r_w, dt,
                                 **statics)[0])(u_hist, res))

    # ---- Pallas streamed kernels (interpret) ----
    nsteps = nt - 2
    s2 = dt * dt
    nyp = -(-ny // R) * R
    nzp, nxp = p3d.pad_shape3(nz, nx)
    pads = ((0, nyp - ny), (0, nzp - nz), (0, nxp - nx))
    m3 = jnp.pad(m.transpose(1, 2, 0), pads, constant_values=1.0)
    hd3 = jnp.pad(jnp.broadcast_to(dt * damp, vp.shape).transpose(1, 2, 0),
                  pads)
    injp, iy = p3d.source_planes3(s_idx, s_w, m, s2)
    wav_pad = jnp.broadcast_to(wav[1:nt - 1, 0],
                               (s_idx.shape[0], nsteps))
    z0 = int(np.asarray(r_idx)[..., 2].min())
    rec_slab, dt2, illum = p3d.forward_dt2_stream3(
        m3, hd3, wav_pad, injp, iy, dt, nt=nt, ny=ny, nz=nz, nx=nx,
        space_order=so, spacing=model.spacing, z0=z0, R=R, fs=fs,
        interpret=True)
    rec_p = np.asarray(p3d.traces_from_slabs3(
        rec_slab, r_idx, r_w, m, z0, nt, nsteps, vp.dtype))
    scale = np.abs(np.asarray(recs)).max()
    assert np.abs(rec_p - np.asarray(recs)).max() < 1e-5 * scale

    illum_p = np.asarray(illum)[:, :ny, :nz, :nx].transpose(0, 3, 1, 2)
    assert np.abs(illum_p - illum_ref).max() < 1e-4 * \
        max(illum_ref.max(), 1e-9)

    res_slab = p3d.residual_slabs3(res, r_idx, r_w, m, s2, z0, nsteps,
                                   nyp)
    grad = p3d.gradient_stream3(m3, hd3, dt2, res_slab, dt, nt=nt, ny=ny,
                                nz=nz, nx=nx, space_order=so,
                                spacing=model.spacing, z0=z0, R=R, fs=fs,
                                interpret=True)
    gp = np.asarray(grad)[:, :ny, :nz, :nx].transpose(0, 3, 1, 2)
    gscale = np.abs(gref).max()
    assert np.abs(gp - gref).max() < 1e-5 * gscale

    # forward-only variant reproduces the same receiver slabs
    rec_only = p3d.forward_rec3(
        m3, hd3, wav_pad, injp, iy, dt, nt=nt, ny=ny, nz=nz, nx=nx,
        space_order=so, spacing=model.spacing, z0=z0, R=R, fs=fs,
        interpret=True)
    d = np.abs(np.asarray(rec_only) - np.asarray(rec_slab)).max()
    assert d < 1e-6 * max(scale, 1e-30)


def test_stream3_bf16_history_gradient_close():
    """bf16-compressed dt2 history: gradient within 1% of the f32 one
    (same contract as the 2-D streamed path)."""
    geom = _geom3(False)
    model = geom.model
    (s_idx, s_w, r_idx, r_w, wav, dt, nt, vp, damp, m,
     nx, ny, nz) = _operands(geom)
    so, R = model.space_order, 16
    nsteps, s2 = nt - 2, dt * dt
    nyp = -(-ny // R) * R
    nzp, nxp = p3d.pad_shape3(nz, nx)
    pads = ((0, nyp - ny), (0, nzp - nz), (0, nxp - nx))
    m3 = jnp.pad(m.transpose(1, 2, 0), pads, constant_values=1.0)
    hd3 = jnp.pad(jnp.broadcast_to(dt * damp, vp.shape).transpose(1, 2, 0),
                  pads)
    injp, iy = p3d.source_planes3(s_idx, s_w, m, s2)
    wav_pad = jnp.broadcast_to(wav[1:nt - 1, 0], (s_idx.shape[0], nsteps))
    z0 = int(np.asarray(r_idx)[..., 2].min())
    kw = dict(nt=nt, ny=ny, nz=nz, nx=nx, space_order=so,
              spacing=model.spacing, z0=z0, R=R, fs=False, interpret=True)
    rec_slab, dt2_f32, _ = p3d.forward_dt2_stream3(
        m3, hd3, wav_pad, injp, iy, dt, **kw)
    _, dt2_bf, _ = p3d.forward_dt2_stream3(
        m3, hd3, wav_pad, injp, iy, dt, hist_dtype="bfloat16", **kw)
    assert dt2_bf.dtype == jnp.bfloat16
    rng = np.random.RandomState(1)
    res = jnp.asarray(0.01 * rng.randn(s_idx.shape[0], nt,
                                       r_idx.shape[0]).astype(np.float32))
    res_slab = p3d.residual_slabs3(res, r_idx, r_w, m, s2, z0, nsteps, nyp)
    g32 = np.asarray(p3d.gradient_stream3(m3, hd3, dt2_f32, res_slab, dt,
                                          **kw))
    gbf = np.asarray(p3d.gradient_stream3(m3, hd3, dt2_bf, res_slab, dt,
                                          **kw))
    rel = np.abs(gbf - g32).max() / max(np.abs(g32).max(), 1e-30)
    assert rel < 1e-2, rel


def test_fused_objective3_routes_and_matches_xla(monkeypatch):
    """End-to-end: a supported 3-D geometry routes fwi_obj_multi through
    the streaming Pallas kernels (interpret mode) and matches the XLA
    path's objective/gradient; fm_multi takes the forward-only kernel."""
    from devito_fwi_tpu.fwi import (fm_multi, fwi_obj_multi,
                                    _pallas3_route,
                                    invalidate_device_caches)
    from devito_fwi_tpu.misfit import least_square

    geom = _geom3(False)          # true model: obs + route support
    kw = dict(shape=(24, 20, 16), spacing=(15., 15., 15.), space_order=4,
              nbl=8, dt=1.5, dtype=np.float32)
    model0 = demo_model("layers-isotropic", nlayers=1, **kw)
    geom0 = AcquisitionGeometry(model0, geom.rec_positions,
                                geom.src_positions, 0.0, 150.0, f0=0.015,
                                src_type="Ricker")
    obs = fm_multi(geom)
    f_ref, grad_ref, _ = fwi_obj_multi(geom0, obs, least_square, None,
                                       None, True, calc_grad=True)

    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    jax.clear_caches()
    invalidate_device_caches()
    info, cap = _pallas3_route(geom0, "OT2", calc_grad=True)
    assert info is not None and cap >= 1
    obs2 = fm_multi(geom)
    d_obs = np.abs(np.stack([o.data for o in obs2])
                   - np.stack([o.data for o in obs])).max()
    scale_obs = np.abs(np.stack([o.data for o in obs])).max()
    assert d_obs < 1e-5 * scale_obs
    f_p, grad_p, _ = fwi_obj_multi(geom0, obs, least_square, None, None,
                                   True, calc_grad=True)
    jax.clear_caches()
    invalidate_device_caches()

    assert np.isclose(f_p, f_ref, rtol=1e-5)
    scale = np.abs(np.asarray(grad_ref)).max()
    d = np.abs(np.asarray(grad_p) - np.asarray(grad_ref)).max()
    assert d < 1e-4 * scale, d / scale


def test_routing_helpers3():
    # bench-config-sized padded grid fits a block
    assert p3d.pick_blocks3(96, 96, 128) is not None
    # something enormous does not (nz*nx plane alone blows VMEM)
    assert p3d.pick_blocks3(400, 1200, 1300) is None
    assert p3d.stream_max_shots3(500, 96, 96, 128) >= 1
    geom = _geom3(False)
    assert p3d.geometry_supported3(geom)
    # receivers spread across non-adjacent z-planes are unsupported
    model = geom.model
    ext = model.domain_size[0]
    rec = np.stack([np.linspace(0, ext, 8), np.full(8, ext / 2),
                    np.linspace(10.0, 100.0, 8)], 1)
    g2 = AcquisitionGeometry(model, rec, geom.src_positions, 0.0, 150.0,
                             f0=0.015, src_type="Ricker")
    assert not p3d.geometry_supported3(g2)


def test_zpair_band_helpers_all_offsets():
    """The aligned-band zpair helpers reproduce the plain 2-row slice /
    2-row add at EVERY sublane-tile offset — Mosaic aborts on a bare
    2-wide sublane window at in-tile offsets 3..7 (measured on chip:
    'Check failed: d >> 32 == 0 (-1 vs. 0)'), so the kernels must only
    ever touch aligned whole tiles."""
    rng = np.random.RandomState(3)
    nz = 32
    u = jnp.asarray(rng.randn(4, nz, 8).astype(np.float32))
    res = jnp.asarray(rng.randn(4, 2, 8).astype(np.float32))
    for z0 in range(0, nz - 2):
        zb, o, L = p3d._zpair_band(z0)
        assert zb % 8 == 0 and zb + L <= nz and zb + o == z0
        assert o + 2 <= L
        got = np.asarray(p3d._extract_zpair(u, z0))
        np.testing.assert_allclose(got, np.asarray(u)[:, z0:z0 + 2, :],
                                   rtol=0, atol=0)
        zb2, L2, addend = p3d._zpair_addend(res, z0)
        full = np.zeros((4, nz, 8), np.float32)
        full[:, zb2:zb2 + L2, :] = np.asarray(addend)
        want = np.zeros_like(full)
        want[:, z0:z0 + 2, :] = np.asarray(res)
        np.testing.assert_allclose(full, want, rtol=0, atol=0)
