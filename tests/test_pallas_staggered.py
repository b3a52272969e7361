"""Elastic Pallas segment kernel: interpreter-mode parity vs the XLA
scan (ops.staggered.elastic_forward)."""
import numpy as np
import pytest

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
from devito_fwi_tpu.ops import pallas_acoustic as pa


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
def test_elastic_pallas_matches_xla_interpret():
    import jax.numpy as jnp
    from devito_fwi_tpu.ops import staggered as st
    from devito_fwi_tpu.ops import pallas_staggered as ps
    from devito_fwi_tpu.ops.interp import interp_table

    shape = (61, 51)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 25:] = 2.5
    vs = vp / 2.0
    rho = 0.31 * (1e3 * vp) ** 0.25
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, vs=vs, b=1.0 / rho, nbl=10,
                         bcs="mask", dtype=np.float32)
    src = np.array([[300.0, 20.0]])
    rec = np.stack([np.linspace(0., 600., 33), np.full(33, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.012,
                               src_type="Ricker")
    lam = np.asarray(model.lam, np.float32)
    mu = np.asarray(model.mu, np.float32)
    b = np.asarray(model.b, np.float32)
    damp = np.asarray(model.damp, np.float32)
    dt = model.critical_dt
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    wav = geom.src.data
    assert ps.elastic_supported(model, s_idx, r_idx)

    r1_x, r2_x = st.elastic_forward(
        jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(b),
        jnp.asarray(damp), jnp.asarray(wav), jnp.asarray(s_idx),
        jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w), float(dt),
        nt=geom.nt, spacing=model.spacing, space_order=4)
    r1_p, r2_p = ps.elastic_forward_pallas(
        lam, mu, b, damp, wav, s_idx, s_w, r_idx, r_w, float(dt),
        nt=geom.nt, spacing=model.spacing, space_order=4, interpret=True)
    for a, b_ in ((r1_x, r1_p), (r2_x, r2_p)):
        a = np.asarray(a)
        scale = max(np.abs(a).max(), 1e-12)
        assert np.abs(np.asarray(b_) - a).max() < 1e-5 * scale


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
def test_visco_sls2_pallas_matches_xla_interpret():
    """Viscoacoustic SLS 2nd-order Pallas segment kernel == the XLA scan
    (ops.viscoacoustic.forward, the reference's default kernel)."""
    import jax.numpy as jnp
    from devito_fwi_tpu.ops import viscoacoustic as va
    from devito_fwi_tpu.ops import pallas_staggered as ps
    from devito_fwi_tpu.ops.interp import interp_table

    shape = (57, 49)
    vp = np.full(shape, 2.0, np.float32)
    vp[:, 24:] = 2.7
    qp = np.full(shape, 60.0, np.float32)
    rho = 0.31 * (1e3 * vp) ** 0.25
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, qp=qp, b=1.0 / rho, nbl=10,
                         bcs="mask", dtype=np.float32)
    src = np.array([[280.0, 20.0]])
    rec = np.stack([np.linspace(0., 560., 29), np.full(29, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 280., f0=0.012,
                               src_type="Ricker")
    b = np.asarray(model.b, np.float32)
    qp_f = np.asarray(model.qp, np.float32)
    damp = np.asarray(model.damp, np.float32)
    vp_f = np.asarray(model.vp, np.float32)
    dt = model.critical_dt
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    wav = geom.src.data
    assert ps.visco_sls2_supported(model, "sls", 2, s_idx, r_idx)

    rec_x, p_x = va.forward(
        jnp.asarray(vp_f), jnp.asarray(b), jnp.asarray(qp_f),
        jnp.asarray(damp), jnp.asarray(wav), jnp.asarray(s_idx),
        jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w), float(dt),
        geom.f0, kernel="sls", time_order=2, nt=geom.nt,
        spacing=model.spacing, space_order=4)
    rec_p, p_p = ps.visco_sls2_forward_pallas(
        vp_f, b, qp_f, damp, wav, s_idx, s_w, r_idx, r_w, float(dt),
        geom.f0, nt=geom.nt, spacing=model.spacing, space_order=4,
        interpret=True)
    a = np.asarray(rec_x)
    scale = max(np.abs(a).max(), 1e-12)
    assert np.abs(np.asarray(rec_p) - a).max() < 1e-5 * scale
    # final-p contract parity (the wavesolver returns it as the
    # wavefield on both paths)
    pa = np.asarray(p_x)
    pscale = max(np.abs(pa).max(), 1e-12)
    assert np.abs(np.asarray(p_p) - pa).max() < 1e-5 * pscale


def test_supported_gates_reject_nonadjacent_zplanes():
    """Receivers on two SEPARATED z-planes must be rejected by every
    Pallas fast-path gate: the kernels record exactly rows (z0, z0+1)
    and a second plane elsewhere would silently read the wrong row
    (review r5)."""
    import numpy as np
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.ops import pallas_staggered as ps
    from devito_fwi_tpu.ops import pallas_tti as pt
    from devito_fwi_tpu.ops.interp import interp_table

    shape = (61, 51)
    vp = np.full(shape, 2.0, np.float32)
    vs = vp / 2.0
    rho = np.ones(shape, np.float32)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.),
                         shape=shape, space_order=4, vp=vp, vs=vs,
                         b=1.0 / rho, nbl=10, bcs="mask",
                         dtype=np.float32)
    src = np.array([[300.0, 20.0]])
    # one line at z=30 m, another at z=200 m: two NON-adjacent planes
    xs = np.linspace(0., 600., 16)
    rec = np.concatenate([
        np.stack([xs, np.full(16, 30.0)], 1),
        np.stack([xs, np.full(16, 200.0)], 1)])
    s_idx, _ = interp_table(src, model.origin_pml, model.spacing,
                            dtype=np.float32)
    r_idx, _ = interp_table(rec, model.origin_pml, model.spacing,
                            dtype=np.float32)
    assert not ps.elastic_supported(model, s_idx, r_idx)
    assert not pt.tti_supported(model, r_idx)
    # an adjacent two-plane geometry (single depth, fractional z)
    # stays supported
    rec_ok = np.stack([xs, np.full(16, 35.0)], 1)
    r_ok, _ = interp_table(rec_ok, model.origin_pml, model.spacing,
                           dtype=np.float32)
    assert ps.elastic_supported(model, s_idx, r_ok)
