"""Pallas VMEM-resident acoustic kernel: numerics parity vs the XLA scan
(interpret mode on CPU; the real-TPU benchmark and parity check are
documented in ops/pallas_acoustic.py: 21.5 vs 17.9 Gcell-steps/s, 2e-6
relative trace agreement at Marmousi scale)."""
import numpy as np
import pytest

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
from devito_fwi_tpu.fwi import fm_multi, _batched_tables
from devito_fwi_tpu.ops import pallas_acoustic as pa
from devito_fwi_tpu.ops import pallas_legacy as pleg


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
def test_pallas_forward_matches_xla_interpret(monkeypatch):
    import jax.numpy as jnp
    shape = (61, 41)
    v = np.full(shape, 2.0, np.float32)
    v[:, 20:] = 2.5
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=8, vp=v, nbl=10, bcs="damp",
                         dtype=np.float32)
    nsrc = 3
    src = np.stack([np.linspace(50, 550, nsrc), np.full(nsrc, 20.0)], axis=1)
    rec = np.stack([np.linspace(10, 590, 31), np.full(31, 25.0)], axis=1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.012,
                               src_type="Ricker")
    assert pa.geometry_supported(geom)
    obs = fm_multi(geom)
    ref = np.stack([o.data for o in obs])

    # run forward_traces with the kernel in interpreter mode
    orig = pleg.forward_rows

    def rows_interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pleg, "forward_rows", rows_interp)
    tr = pleg.forward_traces(geom)
    scale = np.abs(ref).max()
    assert np.abs(tr - ref).max() < 1e-5 * scale


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
@pytest.mark.parametrize("fs", [False, True])
def test_pallas_forward_ckpt_matches_xla_interpret(fs):
    """Segment-grid checkpointed forward kernel == XLA forward_ckpt
    (receiver rows -> traces, segment starts, illumination), with and
    without the free surface."""
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.fwi import _solver_dt
    from devito_fwi_tpu.ops import acoustic as ac
    from devito_fwi_tpu.ops.acoustic import _ckpt_layout

    model = demo_model("circle-isotropic", vp_circle=3.0, vp_background=2.5,
                       origin=(0., 0.), shape=(61, 61), spacing=(10., 10.),
                       nbl=10, space_order=4, fs=fs)
    nsrc, nrec = 2, 41
    # under fs, place the source within the first cell so its bilinear
    # corners land on the z = 0 surface row (regression for the fs
    # correction's w[0] term)
    zsrc = 2.0 if fs else 20.0
    src = np.stack([np.linspace(0., 600., nsrc), np.full(nsrc, zsrc)], 1)
    rec = np.stack([np.linspace(0., 600., nrec), np.full(nrec, 20.)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.010,
                               src_type="Ricker")
    s_idx, s_w, r_idx, r_w, wav = _batched_tables(geom)
    dt, nt, nck = float(_solver_dt(geom)), geom.nt, 7
    statics = dict(nt=nt, spacing=model.spacing, space_order=4,
                   kernel="OT2", fs=fs)
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    recs, seg_ref, illum_ref = jax.vmap(
        lambda a, b: ac.forward_ckpt(vp, damp, jnp.asarray(wav), a, b,
                                     jnp.asarray(r_idx), jnp.asarray(r_w),
                                     dt, n_checkpoints=nck, **statics))(
        jnp.asarray(s_idx), jnp.asarray(s_w))

    nsteps, seg, nseg = _ckpt_layout(nt, nck)
    nx, nz = model.padded_shape
    m_pad = 1.0 / (np.asarray(model.vp, np.float32) ** 2)
    hd = dt * np.asarray(model.damp, np.float32)
    s2 = dt * dt
    s_idx_n, s_w_n = np.asarray(s_idx), np.asarray(s_w)
    inj = np.zeros((nsrc, nx, nz), np.float32)
    for b in range(nsrc):
        for c in range(s_idx_n.shape[2]):
            xi, zi = s_idx_n[b, 0, c]
            inj[b, xi, zi] += s_w_n[b, 0, c] * s2 / m_pad[xi, zi]
    r_idx_n = np.asarray(r_idx)
    z0 = int(r_idx_n[..., 1].min())
    wav_pad = np.zeros((nseg * seg,), np.float32)
    wav_pad[:nsteps] = np.asarray(wav)[1:nt - 1, 0]
    rec_rows, segT, illumT = pa.forward_ckpt_segments(
        jnp.asarray(m_pad.T), jnp.asarray(hd.T), jnp.asarray(wav_pad),
        jnp.swapaxes(jnp.asarray(inj), -1, -2), dt, nt=nt, nx=nx, nz=nz,
        space_order=4, spacing=model.spacing, z0=z0, n_checkpoints=nck,
        fs=fs, interpret=True)
    seg_p = np.swapaxes(np.asarray(segT), -1, -2)
    illum_p = np.swapaxes(np.asarray(illumT), -1, -2)
    assert np.abs(seg_p - np.asarray(seg_ref)).max() < 1e-5 * \
        max(np.abs(np.asarray(seg_ref)).max(), 1e-9)
    assert np.abs(illum_p - np.asarray(illum_ref)).max() < 1e-4 * \
        max(np.abs(np.asarray(illum_ref)).max(), 1e-9)
    # receiver rows -> traces
    rows = np.asarray(rec_rows).reshape(nsrc, nseg * seg, 2, nx)[:, :nsteps]
    rxi = r_idx_n[:, :, 0]
    rplane = (r_idx_n[:, :, 1] != z0).astype(np.int32)
    tr = np.sum(rows[:, :, rplane, rxi] * np.asarray(r_w)[None, None], -1)
    rec_p = np.zeros((nsrc, nt, nrec), np.float32)
    rec_p[:, 1:nsteps + 1] = tr
    scale = np.abs(np.asarray(recs)).max()
    assert np.abs(rec_p - np.asarray(recs)).max() < 1e-5 * scale


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
@pytest.mark.parametrize("fs", [False, True])
def test_pallas_forward_rec_matches_xla_interpret(fs):
    """Receiver-rows-only segment kernel (the fm_multi fast path) == XLA
    forward traces."""
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.fwi import (_solver_dt, _pallas_operands,
                                    _traces_from_rows)
    from devito_fwi_tpu.ops import acoustic as ac
    from devito_fwi_tpu.ops.acoustic import _ckpt_layout

    model = demo_model("circle-isotropic", vp_circle=3.0, vp_background=2.5,
                       origin=(0., 0.), shape=(61, 61), spacing=(10., 10.),
                       nbl=10, space_order=4, fs=fs)
    nsrc, nrec = 2, 41
    zsrc = 2.0 if fs else 20.0
    src = np.stack([np.linspace(0., 600., nsrc), np.full(nsrc, zsrc)], 1)
    rec = np.stack([np.linspace(0., 600., nrec), np.full(nrec, 20.)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.010,
                               src_type="Ricker")
    s_idx, s_w, r_idx, r_w, wav = _batched_tables(geom)
    dt, nt, nck = float(_solver_dt(geom)), geom.nt, 7
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    recs, _ = jax.vmap(lambda a, b: ac.forward(
        vp, damp, jnp.asarray(wav), a, b, jnp.asarray(r_idx),
        jnp.asarray(r_w), dt, nt=nt, spacing=model.spacing, space_order=4,
        kernel="OT2", fs=fs, save=False))(jnp.asarray(s_idx),
                                          jnp.asarray(s_w))
    nsteps, seg, nseg = _ckpt_layout(nt, nck)
    nx, nz = model.padded_shape
    r_idx_n = np.asarray(r_idx)
    z0 = int(r_idx_n[..., 1].min())
    _, mT, hdT, injT, wav_pad = _pallas_operands(
        vp, damp, jnp.asarray(wav), jnp.asarray(s_idx), jnp.asarray(s_w),
        dt, nt, nseg * seg)
    rows = pa.forward_rec_segments(
        mT, hdT, wav_pad, injT, dt, nt=nt, nx=nx, nz=nz, space_order=4,
        spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=fs,
        interpret=True)
    rec_p = np.asarray(_traces_from_rows(rows, jnp.asarray(r_idx),
                                         jnp.asarray(r_w), z0, nt, nsteps,
                                         vp.dtype))
    scale = np.abs(np.asarray(recs)).max()
    assert np.abs(rec_p - np.asarray(recs)).max() < 1e-5 * scale


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
@pytest.mark.parametrize("fs", [False, True])
def test_pallas_gradient_matches_xla_interpret(fs):
    """Reverse-sweep segment-recompute gradient kernel == XLA
    gradient_from_ckpt (interpret mode), with and without the free
    surface."""
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.fwi import _solver_dt
    from devito_fwi_tpu.ops import acoustic as ac

    model = demo_model("circle-isotropic", vp_circle=3.0, vp_background=2.5,
                       origin=(0., 0.), shape=(61, 61), spacing=(10., 10.),
                       nbl=10, space_order=4, fs=fs)
    nsrc, nrec = 2, 41
    # under fs, place the source within the first cell so its bilinear
    # corners land on the z = 0 surface row (regression for the fs
    # correction's w[0] term)
    zsrc = 2.0 if fs else 20.0
    src = np.stack([np.linspace(0., 600., nsrc), np.full(nsrc, zsrc)], 1)
    rec = np.stack([np.linspace(0., 600., nrec), np.full(nrec, 20.)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.010,
                               src_type="Ricker")
    s_idx, s_w, r_idx, r_w, wav = _batched_tables(geom)
    dt, nt, nck = _solver_dt(geom), geom.nt, 7
    statics = dict(nt=nt, spacing=model.spacing, space_order=4,
                   kernel="OT2", fs=fs)
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    recs, seg_starts, _ = jax.vmap(
        lambda a, b: ac.forward_ckpt(vp, damp, jnp.asarray(wav), a, b,
                                     jnp.asarray(r_idx), jnp.asarray(r_w),
                                     dt, n_checkpoints=nck, **statics))(
        jnp.asarray(s_idx), jnp.asarray(s_w))
    rng = np.random.RandomState(0)
    res = jnp.asarray((np.asarray(recs) * 0.1
                       + 0.01 * rng.randn(*recs.shape)).astype(np.float32))
    gref = np.asarray(jax.vmap(
        lambda a, b, sg, r: ac.gradient_from_ckpt(
            vp, damp, jnp.asarray(wav), a, b, sg, r, jnp.asarray(r_idx),
            jnp.asarray(r_w), dt, n_checkpoints=nck, **statics)[0])(
        jnp.asarray(s_idx), jnp.asarray(s_w), seg_starts, res))
    gp = np.asarray(pa.gradient_from_ckpt_pallas(
        np.asarray(model.vp), np.asarray(model.damp), wav, s_idx, s_w,
        seg_starts, res, r_idx, jnp.asarray(r_w), dt, nt=nt,
        spacing=model.spacing, space_order=4, n_checkpoints=nck, fs=fs,
        interpret=True))
    scale = np.abs(gref).max()
    assert np.abs(gp - gref).max() < 1e-5 * scale

@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
@pytest.mark.parametrize("fs", [False, True])
def test_pallas_streamed_gradient_matches_xla_interpret(fs):
    """Streamed-history path (forward_dt2_segments + gradient_stream_
    segments) == XLA gradient_from_ckpt, and its forward outputs ==
    forward_ckpt_segments (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.fwi import (_solver_dt, _pallas_operands,
                                    _traces_from_rows)
    from devito_fwi_tpu.ops import acoustic as ac
    from devito_fwi_tpu.ops.acoustic import _ckpt_layout

    model = demo_model("circle-isotropic", vp_circle=3.0, vp_background=2.5,
                       origin=(0., 0.), shape=(61, 61), spacing=(10., 10.),
                       nbl=10, space_order=4, fs=fs)
    nsrc, nrec = 2, 41
    zsrc = 2.0 if fs else 20.0
    src = np.stack([np.linspace(0., 600., nsrc), np.full(nsrc, zsrc)], 1)
    rec = np.stack([np.linspace(0., 600., nrec), np.full(nrec, 20.)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.010,
                               src_type="Ricker")
    s_idx, s_w, r_idx, r_w, wav = _batched_tables(geom)
    dt, nt, nck = float(_solver_dt(geom)), geom.nt, 7
    statics = dict(nt=nt, spacing=model.spacing, space_order=4,
                   kernel="OT2", fs=fs)
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    recs, seg_starts, illum_ref = jax.vmap(
        lambda a, b: ac.forward_ckpt(vp, damp, jnp.asarray(wav), a, b,
                                     jnp.asarray(r_idx), jnp.asarray(r_w),
                                     dt, n_checkpoints=nck, **statics))(
        jnp.asarray(s_idx), jnp.asarray(s_w))
    rng = np.random.RandomState(0)
    res = jnp.asarray((np.asarray(recs) * 0.1
                       + 0.01 * rng.randn(*recs.shape)).astype(np.float32))
    gref = np.asarray(jax.vmap(
        lambda a, b, sg, r: ac.gradient_from_ckpt(
            vp, damp, jnp.asarray(wav), a, b, sg, r, jnp.asarray(r_idx),
            jnp.asarray(r_w), dt, n_checkpoints=nck, **statics)[0])(
        jnp.asarray(s_idx), jnp.asarray(s_w), seg_starts, res))

    nsteps, seg, nseg = _ckpt_layout(nt, nck)
    nx, nz = model.padded_shape
    r_idx_n = np.asarray(r_idx)
    z0 = int(r_idx_n[..., 1].min())
    m, mT, hdT, injT, wav_pad = _pallas_operands(
        vp, damp, jnp.asarray(wav), jnp.asarray(s_idx), jnp.asarray(s_w),
        dt, nt, nseg * seg)
    rec_rows, dt2T, illumT = pa.forward_dt2_segments(
        mT, hdT, wav_pad, injT, dt, nt=nt, nx=nx, nz=nz, space_order=4,
        spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=fs,
        interpret=True)
    # forward outputs match the XLA checkpointed forward
    rec_p = np.asarray(_traces_from_rows(rec_rows, jnp.asarray(r_idx),
                                         jnp.asarray(r_w), z0, nt, nsteps,
                                         vp.dtype))
    scale = np.abs(np.asarray(recs)).max()
    assert np.abs(rec_p - np.asarray(recs)).max() < 1e-5 * scale
    illum_p = np.swapaxes(np.asarray(illumT), -1, -2)
    assert np.abs(illum_p - np.asarray(illum_ref)).max() < 1e-4 * \
        max(np.abs(np.asarray(illum_ref)).max(), 1e-9)

    rows = pa.residual_rows(res, jnp.asarray(r_idx), jnp.asarray(r_w),
                            m, dt * dt, z0, nsteps, seg, nseg)
    gradT = pa.gradient_stream_segments(
        mT, hdT, dt2T, rows, dt, nt=nt, nx=nx, nz=nz, space_order=4,
        spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=fs,
        interpret=True)
    gp = np.swapaxes(np.asarray(gradT), -1, -2)
    gscale = np.abs(gref).max()
    assert np.abs(gp - gref).max() < 1e-5 * gscale

    # and matches the recompute-path Pallas kernel to f32 fusion
    # noise (same arithmetic; XLA contracts FMAs differently per program)
    grT = pa.gradient_segments(
        mT, hdT, wav_pad, injT, np.swapaxes(np.asarray(seg_starts), -1, -2),
        rows, dt, nt=nt, nx=nx, nz=nz, space_order=4,
        spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=fs,
        interpret=True)
    d = np.abs(np.asarray(gradT) - np.asarray(grT)).max()
    assert d < 1e-6 * max(np.abs(np.asarray(grT)).max(), 1e-30)

    # bf16-compressed history (DEVITO_FWI_TPU_HIST=bf16): halves the
    # streamed HBM traffic at ~0.4% per-sample dt2 rounding; gradient
    # stays within 1% of the f32-history result on this model
    _, dt2_bf, _ = pa.forward_dt2_segments(
        mT, hdT, wav_pad, injT, dt, nt=nt, nx=nx, nz=nz, space_order=4,
        spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=fs,
        hist_dtype="bfloat16", interpret=True)
    assert dt2_bf.dtype == jnp.bfloat16
    g_bf = np.swapaxes(np.asarray(pa.gradient_stream_segments(
        mT, hdT, dt2_bf, rows, dt, nt=nt, nx=nx, nz=nz, space_order=4,
        spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=fs,
        interpret=True)), -1, -2)
    rel = np.abs(g_bf - gref).max() / gscale
    assert rel < 1e-2, rel
