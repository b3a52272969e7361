"""Pallas VMEM-resident acoustic kernel: numerics parity vs the XLA scan
(interpret mode on CPU; the real-TPU benchmark and parity check are
documented in ops/pallas_acoustic.py: 21.5 vs 17.9 Gcell-steps/s, 2e-6
relative trace agreement at Marmousi scale)."""
import numpy as np
import pytest

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
from devito_fwi_tpu.fwi import fm_multi, _batched_tables
from devito_fwi_tpu.ops import pallas_acoustic as pa


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
    orig = pa.forward_rows

    def rows_interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pa, "forward_rows", rows_interp)
    tr = pa.forward_traces(geom)
    scale = np.abs(ref).max()
    assert np.abs(tr - ref).max() < 1e-5 * scale


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
def test_pallas_gradient_matches_xla_interpret():
    """Reverse-sweep segment-recompute gradient kernel == XLA
    gradient_from_ckpt (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.fwi import _solver_dt
    from devito_fwi_tpu.ops import acoustic as ac

    model = demo_model("circle-isotropic", vp_circle=3.0, vp_background=2.5,
                       origin=(0., 0.), shape=(61, 61), spacing=(10., 10.),
                       nbl=10, space_order=4)
    nsrc, nrec = 2, 41
    src = np.stack([np.linspace(0., 600., nsrc), np.full(nsrc, 20.)], 1)
    rec = np.stack([np.linspace(0., 600., nrec), np.full(nrec, 20.)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.010,
                               src_type="Ricker")
    s_idx, s_w, r_idx, r_w, wav = _batched_tables(geom)
    dt, nt, nck = _solver_dt(geom), geom.nt, 7
    statics = dict(nt=nt, spacing=model.spacing, space_order=4,
                   kernel="OT2", fs=False)
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
        spacing=model.spacing, space_order=4, n_checkpoints=nck,
        interpret=True))
    scale = np.abs(gref).max()
    assert np.abs(gp - gref).max() < 1e-5 * scale
