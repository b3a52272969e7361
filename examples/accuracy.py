#!/usr/bin/env python
"""Accuracy study (reference ``seismic/acoustic/accuracy.ipynb``).

Compares the acoustic solver against the analytic 2-D wholespace
solution (Hankel-function frequency response to a Ricker source, the
same oracle as the self-adjoint test suite) across space orders,
printing the far-field L2 error — demonstrating higher-order stencils
buy accuracy at fixed grid spacing.

Run with JAX_PLATFORMS=cpu for float64.
"""
import os
import sys

import numpy as np
from scipy.special import hankel2

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry  # noqa: E402
from devito_fwi_tpu import AcousticWaveSolver  # noqa: E402


def analytic_trace(vp, f0, dt, nt, offset):
    """Analytic 2-D wholespace response at `offset` for a Ricker source
    (frequency domain: -i pi H0^2(k r) / 4, cf. reference
    self_adjoint/test_wavesolver_iso.py:360-462)."""
    nf = nt // 2 + 1
    freq = np.fft.rfftfreq(nt, dt)
    t = (np.arange(nt) * dt)
    src = (1 - 2 * (np.pi * f0 * (t - 1.0 / f0)) ** 2) * \
        np.exp(-(np.pi * f0 * (t - 1.0 / f0)) ** 2)
    S = np.fft.rfft(src)
    k = 2 * np.pi * freq / vp
    G = np.zeros(nf, complex)
    G[1:] = -1j * np.pi * hankel2(0, k[1:] * offset) / 4.0
    return np.fft.irfft(S * G, nt)


shape, spacing = (301, 301), (10., 10.)
vp = 1.5
dt_ms = 1.0
tn = 800.0
f0 = 0.010  # kHz
offset = 500.0

ref = analytic_trace(vp * 1000, f0 * 1000, dt_ms / 1000,
                     int(tn / dt_ms) + 1, offset)
for so in (2, 4, 8):
    model = SeismicModel(origin=(0., 0.), spacing=spacing, shape=shape,
                         space_order=so, vp=np.full(shape, vp), nbl=40,
                         bcs="damp", dt=dt_ms,
                         dtype=np.float64)
    src = np.array([[1500.0, 1500.0]])
    rec = np.array([[1500.0 + offset, 1500.0]])
    geom = AcquisitionGeometry(model, rec, src, 0., tn, f0=f0,
                               src_type="Ricker")
    solver = AcousticWaveSolver(model, geom, space_order=so)
    trace, _, _ = solver.forward()
    num = np.asarray(trace.data)[:, 0]
    # compare over the arrival window, normalized amplitudes
    err = np.linalg.norm(num / np.abs(num).max()
                         - ref / np.abs(ref).max()) / np.sqrt(len(ref))
    print("space_order=%d: normalized L2 error vs analytic = %.4f"
          % (so, err))
