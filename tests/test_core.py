"""Core container tests: FD weights, CFL, damping, time axis, geometry.

Ports the semantics of the reference's seismic/test_seismic_utils.py plus
checks of the exact constants the reference derives through sympy/devito.
"""
import numpy as np
import pytest

from devito_fwi_tpu.utils.fd import (fd_weights, second_derivative_weights,
                                     cfl_coefficient, damping_profile)
from devito_fwi_tpu import TimeAxis, demo_model, setup_geometry, SeismicModel
from devito_fwi_tpu.models.sources import ricker_wavelet


def test_fd_weights_second_derivative():
    # classic 4th-order central weights
    w = second_derivative_weights(4)
    np.testing.assert_allclose(w, [-1/12, 4/3, -5/2, 4/3, -1/12], atol=1e-12)
    w8 = second_derivative_weights(8)
    np.testing.assert_allclose(w8[4], -205/72, atol=1e-12)


def test_cfl_matches_reference_formula():
    # model space_order=2 -> 5-point full stencil, sum|w| = 16/3
    assert np.isclose(cfl_coefficient(2, 2), np.sqrt(4 / (2 * 16 / 3)), atol=1e-12)
    # reference seismic/model.py:352 uses range(-so, so+1)
    w = fd_weights(2, np.arange(-4, 5), 0.0)
    assert np.isclose(cfl_coefficient(4, 2),
                      np.sqrt(4 / (2 * np.sum(np.abs(w)))), atol=1e-12)


def test_critical_dt_camembert():
    # the camembert inversion example: so=2 model, vp max 3.0, h=10
    model = demo_model('circle-isotropic', vp_circle=3.0, vp_background=2.5,
                       origin=(0., 0.), shape=(101, 101),
                       spacing=(10., 10.), nbl=40)
    assert model.critical_dt == np.float32("%.3e" % (np.sqrt(0.375) * 10 / 3.0))
    ta = TimeAxis(start=0.0, stop=1000.0, step=model.critical_dt)
    assert ta.num == 491


def test_timeaxis_three_of_four():
    a = TimeAxis(start=0.0, step=2.0, num=6)
    assert a.stop == 10.0
    b = TimeAxis(start=0.0, stop=10.0, num=6)
    assert b.step == 2.0
    c = TimeAxis(start=0.0, stop=10.0, step=3.0)
    assert c.num == 5 and np.isclose(c.stop, 12.0)
    with pytest.raises(ValueError):
        TimeAxis(start=0.0, stop=10.0, step=3.0, num=5)


@pytest.mark.parametrize('nbl', [20, 0])
def test_damp_layer_bounds(nbl):
    # damp: 0 inside, >0 in layer; mask: 1 inside, <1 in layer
    # (reference seismic/test_seismic_utils.py:12-36)
    model = demo_model('layers-isotropic', shape=(51, 51), nbl=nbl)
    if nbl == 0:
        assert model.damp == 0.0
        return
    damp = model.damp
    interior = damp[nbl:-nbl, nbl:-nbl]
    np.testing.assert_allclose(interior, 0.0)
    assert damp[0, damp.shape[1] // 2] > 0
    model._initialize_bcs(bcs="mask")
    mask = model.damp
    np.testing.assert_allclose(mask[nbl:-nbl, nbl:-nbl], 1.0)
    assert mask[0, mask.shape[1] // 2] < 1


def test_damp_fs_skips_top():
    model = demo_model('layers-isotropic', shape=(51, 51), nbl=10, fs=True)
    assert model.padded_shape == (71, 61)
    # top z rows (interior x) must be undamped
    np.testing.assert_allclose(model.damp[10:-10, 0], 0.0)
    assert model.damp[10, -1] > 0


@pytest.mark.parametrize('ndim', [1, 2, 3])
def test_geometry_defaults(ndim):
    # (reference seismic/test_seismic_utils.py:39-97)
    shape = tuple([21] * ndim)
    model = demo_model('layers-isotropic', shape=shape, nbl=5,
                       spacing=tuple([15.] * ndim))
    geometry = setup_geometry(model, 300.)
    assert geometry.nsrc == 1
    assert geometry.nrec == 21 ** (max(ndim - 1, 1))
    assert geometry.src_type == 'Ricker'
    assert geometry.src.data.shape == (geometry.nt, 1)
    assert geometry.rec.data.shape == (geometry.nt, geometry.nrec)
    # resample changes dt and nt
    nt0 = geometry.nt
    geometry.resample(geometry.dt / 2)
    assert geometry.nt >= 2 * nt0 - 2


def test_ricker_wavelet():
    t = np.linspace(0, 1000, 501)
    w = ricker_wavelet(t, 0.010)
    assert np.isclose(w[np.argmin(np.abs(t - 100.0))], 1.0)  # peak at t0=1/f0
    assert abs(w[0]) < 1e-3 and abs(w[-1]) < 1e-10


def test_model_update_and_m():
    model = demo_model('circle-isotropic', shape=(51, 51), nbl=10)
    v = np.full((51, 51), 2.0, dtype=np.float32)
    model.update('vp', v)
    assert model.vp.shape == (71, 71)
    np.testing.assert_allclose(model.m, 0.25)
    np.testing.assert_allclose(model.crop(model.vp), 2.0)


def test_edge_padding():
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=(11, 11),
                         space_order=4, vp=np.linspace(1.5, 3.5, 121)
                         .reshape(11, 11).astype(np.float32), nbl=4)
    assert model.vp.shape == (19, 19)
    np.testing.assert_allclose(model.vp[0, 4:-4], model.vp[4, 4:-4])


def test_filters_suite():
    """Filter-family coverage (reference seismic/filter/filter.py):
    band/lowpass attenuation, FIR variants, decimation, cheby2."""
    from devito_fwi_tpu.utils import filters as F
    df = 1000.0
    t = np.arange(2048) / df
    low = np.sin(2 * np.pi * 5 * t)
    high = np.sin(2 * np.pi * 200 * t)
    sig = low + high

    def band_energy(x, f_lo, f_hi):
        X = np.abs(np.fft.rfft(x))
        fr = np.fft.rfftfreq(x.shape[0], 1 / df)
        return np.sum(X[(fr >= f_lo) & (fr <= f_hi)] ** 2)

    out = F.lowpass(sig, 20, df, corners=8)
    assert band_energy(out, 150, 250) < 1e-4 * band_energy(out, 0, 20)
    out = F.highpass(sig, 50, df, corners=8)
    assert band_energy(out, 0, 20) < 1e-4 * band_energy(out, 150, 250)
    out = F.bandstop(sig, 150, 250, df, corners=6)
    assert band_energy(out, 190, 210) < 1e-3 * band_energy(out, 0, 20)
    out = F.lowpass_cheby_2(sig, 50, df)
    assert band_energy(out, 150, 250) < 1e-4 * band_energy(out, 0, 20)
    out, wp = F.lowpass_cheby_2(sig, 50, df, freq_passband=True)
    assert 0 < wp <= 50
    out = F.remez_fir(sig, 100, 300, df)
    assert out.shape[0] == sig.shape[0] + 49  # full convolution
    out = F.lowpass_fir(sig, 20, df, winlen=256)
    assert np.isfinite(out).all()
    dec = F.integer_decimation(sig, 4)
    assert dec.shape[0] == sig.shape[0] // 4
    import pytest as _pytest
    with _pytest.raises(TypeError):
        F.integer_decimation(sig, 2.0)
    env = F.envelope(low)
    assert np.abs(env[200:-200] - 1.0).max() < 0.15


def test_wavelet_sources():
    """Gabor/DGauss wavelets and the sources registry
    (reference seismic/source.py:248-351, utils.py:192)."""
    from devito_fwi_tpu.models.sources import (RickerSource, GaborSource,
                                               DGaussSource, sources)
    from devito_fwi_tpu.models.timeaxis import TimeAxis
    ta = TimeAxis(start=0., stop=500., step=1.0)
    for cls in (RickerSource, GaborSource, DGaussSource):
        src = cls(name="src", time_range=ta, f0=0.010)
        w = src.data[:, 0]
        assert np.isfinite(w).all() and np.abs(w).max() > 0
    # Ricker/Gabor are band-limited around f0; DGauss with the reference's
    # default a=1 is a narrow broadband pulse (source.py:313-351)
    for cls in (RickerSource, GaborSource):
        w = cls(name="src", time_range=ta, f0=0.010).data[:, 0]
        sp = np.abs(np.fft.rfft(w))
        fr = np.fft.rfftfreq(len(w), 1.0)
        fpk = fr[np.argmax(sp)]
        assert 0.002 < fpk < 0.05
    assert set(sources) >= {"Ricker", "Gabor"}


def test_nmo_correction_flattens_hyperbola():
    """NMO correction (reference tutorials/10_nmo_correction.ipynb):
    a hyperbolic event at t0 with the true velocity flattens to t0."""
    from devito_fwi_tpu.utils.nmo import nmo_correction
    nt, dt, ntr = 800, 0.004, 40
    offsets = np.linspace(0.0, 2000.0, ntr)
    t = np.arange(nt) * dt
    t0, v = 0.9, 2200.0
    gather = np.zeros((nt, ntr), np.float32)
    for j, x in enumerate(offsets):
        tx = np.sqrt(t0 ** 2 + (x / v) ** 2)
        a = (np.pi * 20.0 * (t - tx)) ** 2
        gather[:, j] = (1 - 2 * a) * np.exp(-a)
    out = nmo_correction(gather, dt, offsets, np.full(nt, v))
    peaks = np.argmax(out, axis=0)
    assert np.ptp(peaks) <= 1
    assert abs(int(peaks[0]) - int(round(t0 / dt))) <= 1
    # far-offset samples beyond the trace end are muted, not wrapped
    assert np.all(out[-1, -5:] == 0.0)


def test_pickle_roundtrip():
    """Sources/geometry pickle cleanly (reference Pickable support,
    seismic/source.py:172-174, utils.py:188-189 — needed there for dask
    workers; here it keeps user workflows like result caching working)."""
    import pickle
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.models.sources import PointSource, RickerSource
    from devito_fwi_tpu.models.timeaxis import TimeAxis
    ta = TimeAxis(start=0., stop=100., step=1.0)
    src = RickerSource(name="src", time_range=ta, f0=0.010)
    assert np.allclose(pickle.loads(pickle.dumps(src)).data, src.data)
    p = PointSource(name="rec", time_range=ta, coordinates=np.zeros((3, 2)))
    p.data[:] = 1.5
    assert np.allclose(pickle.loads(pickle.dumps(p)).data, p.data)
    m = demo_model("circle-isotropic", shape=(21, 21), spacing=(10., 10.),
                   nbl=5)
    g = AcquisitionGeometry(m, np.zeros((3, 2)), np.zeros((1, 2)), 0.,
                            100., f0=0.01, src_type="Ricker")
    g2 = pickle.loads(pickle.dumps(g))
    assert g2.nt == g.nt and np.allclose(g2.src.data, g.src.data)


def test_stream_hist_dtype_env(monkeypatch):
    """DEVITO_FWI_TPU_HIST selects the streamed-history element type;
    default bf16 on TPU, f32 elsewhere (CI runs off-TPU)."""
    from devito_fwi_tpu.ops.pallas_acoustic import stream_hist_dtype
    monkeypatch.delenv("DEVITO_FWI_TPU_HIST", raising=False)
    assert stream_hist_dtype() == "float32"        # off-TPU default
    monkeypatch.setenv("DEVITO_FWI_TPU_HIST", "bf16")
    assert stream_hist_dtype() == "bfloat16"
    monkeypatch.setenv("DEVITO_FWI_TPU_HIST", "f32")
    assert stream_hist_dtype() == "float32"
    monkeypatch.setenv("DEVITO_FWI_TPU_HIST", " F32 ")   # whitespace/case
    assert stream_hist_dtype() == "float32"
    monkeypatch.setenv("DEVITO_FWI_TPU_HIST", "fp32")    # typo must raise,
    with pytest.raises(ValueError):                      # not silently bf16
        stream_hist_dtype()


def test_pallas_cliff_warning_fires_once(monkeypatch):
    """TPU geometries that fall off the Pallas fast path warn once per
    reason (the XLA fallback is ~4x slower)."""
    import warnings
    from devito_fwi_tpu import fwi as fwi_mod

    fwi_mod._pallas_cliff_warn.seen.clear()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fwi_mod._pallas_cliff_warn("dim=3; need float32 2-D")
        fwi_mod._pallas_cliff_warn("dim=3; need float32 2-D")
        fwi_mod._pallas_cliff_warn("receivers not on <=2 z-planes")
    msgs = [str(w.message) for w in rec]
    assert len(msgs) == 2
    assert any("dim=3" in m for m in msgs)
    assert any("z-planes" in m for m in msgs)
    fwi_mod._pallas_cliff_warn.seen.clear()


def test_seismic_filter_case_insensitive():
    """'Bandpass' must filter, not silently return None (the assert
    normalized case but the branches compared the raw string)."""
    from devito_fwi_tpu.fwi import seismic_filter
    rng = np.random.default_rng(0)
    sig = rng.normal(size=(400,)).astype(np.float64)
    out = seismic_filter(sig, "Bandpass", freqmin=5, freqmax=40, df=250)
    assert out is not None and np.isfinite(out).all()


def test_pallas_geometry_rejects_z_edge_receivers():
    """Receivers whose bilinear corners touch the padded-grid z edge
    must stay on the XLA path — the Pallas kernels' static 2-row slice
    would clamp to one row and crash the trace."""
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.models.geometry import AcquisitionGeometry
    from devito_fwi_tpu.ops.pallas_acoustic import geometry_supported

    model = demo_model('layers-isotropic', shape=(31, 31), nbl=10,
                       space_order=4, spacing=(10., 10.),
                       dtype=np.float32)
    nz_pad = model.padded_shape[1]
    # z at the LAST padded row: corners {nz-1, nz}
    z_edge = model.origin_pml[1] + (nz_pad - 1) * model.spacing[1]
    rec = np.array([[100.0, z_edge], [150.0, z_edge]])
    src = np.array([[150.0, 20.0]])
    geom = AcquisitionGeometry(model, rec, src, 0.0, 100.0, f0=0.015,
                               src_type="Ricker")
    assert not geometry_supported(geom)
    # interior receivers still pass
    rec_ok = np.array([[100.0, 20.0], [150.0, 20.0]])
    geom_ok = AcquisitionGeometry(model, rec_ok, src, 0.0, 100.0,
                                  f0=0.015, src_type="Ricker")
    assert geometry_supported(geom_ok)


def test_residual_rows_drops_oob_corners():
    """An x corner at nx (out of grid) must contribute nothing — it
    used to alias plane 1, x 0 through the plane*nx fold."""
    import jax.numpy as jnp
    from devito_fwi_tpu.ops.pallas_acoustic import residual_rows

    nx, nz, nrec, nt = 8, 6, 2, 6
    z0 = 2
    m = jnp.ones((nx, nz), jnp.float32)
    # receiver 0: in-grid corners; receiver 1: one corner at x == nx
    r_idx = jnp.asarray([[[3, z0], [4, z0], [3, z0 + 1], [4, z0 + 1]],
                         [[nx - 1, z0], [nx, z0],
                          [nx - 1, z0 + 1], [nx, z0 + 1]]], jnp.int32)
    r_w = jnp.full((nrec, 4), 0.25, jnp.float32)
    res = jnp.ones((1, nt, nrec), jnp.float32)
    nsteps, seg, nseg = nt - 2, 2, 2
    rows = residual_rows(res, r_idx, r_w, m, 1.0, z0, nsteps, seg, nseg)
    flat = np.asarray(rows).reshape(1, nseg * seg, 2, nx)
    # plane 1 (z0+1), x = 0 must be exactly zero — no aliased mass
    assert np.all(flat[:, :nsteps, 1, 0] == 0.0)
    # the OOB corners' weight is dropped: receiver 1 contributes only
    # its two in-grid corners (0.25 each on x = nx-1 of both planes)
    assert np.allclose(flat[0, 0, 0, nx - 1], 0.25)
    assert np.allclose(flat[0, 0, 1, nx - 1], 0.25)


def test_subset_and_shot_geometry_preserve_wavelet_params():
    """_subset_geometry/_shot_geometry must carry the full source
    signature (a, t0w, src_data) and a resampled dt — dropping them made
    the random-batch/per-shot wavelet differ from the full geometry's."""
    from devito_fwi_tpu import demo_model, AcquisitionGeometry
    from devito_fwi_tpu.fwi import _subset_geometry, _shot_geometry
    model = demo_model("layers-isotropic", shape=(31, 21),
                       spacing=(10., 10.), nbl=10, space_order=4)
    src = np.stack([np.linspace(0, model.domain_size[0], 3),
                    np.full(3, 20.0)], 1)
    rec = np.stack([np.linspace(0, model.domain_size[0], 5),
                    np.full(5, 20.0)], 1)
    wav = np.linspace(0., 1., 7)
    geo = AcquisitionGeometry(model, rec, src, 0.0, 200.0, f0=0.015,
                              src_type="Ricker", a=2.5, t0w=0.08,
                              src_data=wav)
    geo.resample(geo.dt * 0.5)
    for sub in (_subset_geometry(geo, [0, 2]), _shot_geometry(geo, 1)):
        assert sub._a == geo._a
        assert sub._t0w == geo._t0w
        assert sub._src_data is wav
        # propagation geometries stay on the solver's critical-dt axis;
        # a resampled parent dt must NOT leak into the source wavelet
        assert sub.dt == model.critical_dt
    # the custom-amplitude wavelet actually differs from the default one
    base = AcquisitionGeometry(model, rec, src[:1], 0.0, 200.0, f0=0.015,
                               src_type="Ricker")
    assert not np.allclose(_shot_geometry(geo, 0).src.data, base.src.data)


def test_model_vp_device_guard_and_mask_digest():
    """r4 glue-path regressions: (a) _model_vp_device ships the cropped
    vp only when re-padding reproduces the model's padded field exactly
    — a hand-edited halo must fall back to the full upload; (b)
    _mask_device revalidates by content digest so in-place mask edits
    are seen."""
    import jax.numpy as jnp
    from devito_fwi_tpu import SeismicModel
    from devito_fwi_tpu.fwi import (_finalize_grad_device, _mask_device,
                                    _model_vp_device)

    shape = (21, 17)
    vp = np.linspace(1.5, 3.0, shape[0] * shape[1]).reshape(shape) \
        .astype(np.float32)
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=4, vp=vp, nbl=4, bcs="damp")
    dev = np.asarray(_model_vp_device(model))
    np.testing.assert_array_equal(dev, np.asarray(model.vp))
    # poke the halo so it is NOT an edge replication anymore
    model.vp[0, 0] += 0.5
    dev2 = np.asarray(_model_vp_device(model))
    np.testing.assert_array_equal(dev2, np.asarray(model.vp))

    mask = np.ones(shape, np.float32)
    d1 = np.array(_mask_device(mask), copy=True)  # snapshot (CPU jax
    # may alias the numpy buffer, so a view would follow the edit)
    mask[:, :5] = 0.0   # in-place edit, same ndarray object
    d2 = np.asarray(_mask_device(mask))
    np.testing.assert_array_equal(d2, mask)
    assert not np.array_equal(d1, d2)

    g = jnp.asarray(np.full(shape, 2.0, np.float32))
    il = jnp.asarray(np.full(shape, 4.0, np.float32))
    out = np.asarray(_finalize_grad_device(g, il, jnp.asarray(mask),
                                           precond=True, with_mask=True))
    np.testing.assert_allclose(out, (2.0 / np.sqrt(4.0 + 1e-30)) * mask,
                               rtol=1e-6)
