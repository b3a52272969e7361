"""DRP (dispersion-reduced) custom FD coefficients — the TPU-native analog
of devito's ``coefficients='symbolic'`` study
(``seismic/tutorials/07_DRP_schemes.ipynb``): optimized weights via
``utils.fd.drp_second_derivative_weights`` fed through the acoustic
solver's ``w_override``."""
import numpy as np
import pytest

from devito_fwi_tpu.utils.fd import (second_derivative_weights,
                                     drp_second_derivative_weights)


def _dispersion(w, theta):
    r = len(w) // 2
    return (w[r] + 2.0 * sum(w[r + j] * np.cos(j * theta)
                             for j in range(1, r + 1)) + theta ** 2)


def test_drp_weights_consistency():
    for so in (4, 8, 10, 16):
        w = drp_second_derivative_weights(so)
        r = so // 2
        assert len(w) == 2 * r + 1
        assert np.allclose(w, w[::-1])                       # symmetric
        assert abs(np.sum(w)) < 1e-12                        # W(0) = 0
        j = np.arange(-r, r + 1)
        # full-stencil second moment is 2 (e.g. [1,-2,1]): exact 2nd order
        assert abs(np.sum(w * j * j) - 2.0) < 1e-12


def test_drp_matches_tutorial_table():
    # the reference tutorial's published order-10 upper-layer weights
    table = np.array([2.00462e-03, -1.63274e-02, 7.72781e-02,
                      -3.15476e-01, 1.77768e+00, -3.05033e+00,
                      1.77768e+00, -3.15476e-01, 7.72781e-02,
                      -1.63274e-02, 2.00462e-03])
    w = drp_second_derivative_weights(10)
    assert np.allclose(w, table, atol=1e-2)


def test_drp_band_error_beats_taylor():
    theta = np.linspace(0.0, 2.2, 1000)
    for so in (8, 10, 16):
        wt = second_derivative_weights(so)
        wd = drp_second_derivative_weights(so, 2.2)
        et = np.sqrt(np.mean(_dispersion(wt, theta) ** 2))
        ed = np.sqrt(np.mean(_dispersion(wd, theta) ** 2))
        assert ed < 0.1 * et


@pytest.mark.parametrize("dtype", [np.float64])
def test_drp_modeling_less_dispersion(dtype):
    """Coarse-grid (5 points/wavelength) wholespace propagation over 10
    wavelengths: the DRP stencil's trace error vs the analytic Hankel
    solution must beat the Taylor stencil of the same width."""
    from scipy.special import hankel2
    from devito_fwi_tpu import (SeismicModel, AcquisitionGeometry,
                                AcousticWaveSolver)

    so = 10
    shape, spacing = (161, 161), (20.0, 20.0)
    vp, f0, dt_ms, tn = 1.5, 0.015, 1.0, 1100.0
    offset = 1000.0

    nt = int(tn / dt_ms) + 1
    t = np.arange(nt) * dt_ms / 1000.0
    srcw = (1 - 2 * (np.pi * f0 * 1000 * (t - 1.0 / (f0 * 1000))) ** 2) * \
        np.exp(-(np.pi * f0 * 1000 * (t - 1.0 / (f0 * 1000))) ** 2)
    S = np.fft.rfft(srcw)
    freq = np.fft.rfftfreq(nt, dt_ms / 1000.0)
    k = 2 * np.pi * freq / (vp * 1000)
    G = np.zeros(len(freq), complex)
    G[1:] = -1j * np.pi * hankel2(0, k[1:] * offset) / 4.0
    ref = np.fft.irfft(S * G, nt)

    model = SeismicModel(origin=(0., 0.), spacing=spacing, shape=shape,
                         space_order=so, vp=np.full(shape, vp), nbl=60,
                         bcs="damp", dt=dt_ms, dtype=dtype)
    src = np.array([[600.0, 1600.0]])
    rec = np.array([[600.0 + offset, 1600.0]])
    geom = AcquisitionGeometry(model, rec, src, 0., tn, f0=f0,
                               src_type="Ricker")
    solver = AcousticWaveSolver(model, geom, space_order=so)

    def err(w_override):
        trace, _, _ = solver.forward(w_override=w_override)
        num = np.asarray(trace.data)[:, 0]
        return np.linalg.norm(num / np.abs(num).max()
                              - ref / np.abs(ref).max())

    e_taylor = err(None)
    e_drp = err(drp_second_derivative_weights(so, 2.0))
    assert e_drp < 0.7 * e_taylor
