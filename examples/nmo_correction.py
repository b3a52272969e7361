#!/usr/bin/env python
"""NMO correction tutorial (reference ``tutorials/10_nmo_correction.ipynb``).

Builds a synthetic CMP gather with two hyperbolic reflection events,
applies :func:`devito_fwi_tpu.utils.nmo.nmo_correction` with the true
velocity profile, and reports the moveout flattening (peak-time spread
across offsets before vs after).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from devito_fwi_tpu.utils.nmo import nmo_correction  # noqa: E402


def ricker(t, f0):
    a = (np.pi * f0 * t) ** 2
    return (1 - 2 * a) * np.exp(-a)


nt, dt = 1000, 0.004
ntraces = 60
offsets = np.linspace(0.0, 2950.0, ntraces)
events = [(0.8, 2000.0), (2.0, 3000.0)]  # (t0 s, vnmo m/s)

t = np.arange(nt) * dt
cmp_gather = np.zeros((nt, ntraces), np.float32)
for t0, v in events:
    for j, x in enumerate(offsets):
        tx = np.sqrt(t0 ** 2 + (x / v) ** 2)
        cmp_gather[:, j] += ricker(t - tx, 25.0)

# v(t0): blocky interval-velocity profile (constant through each event)
vnmo = np.where(t < 1.4, events[0][1], events[1][1])
corrected = nmo_correction(cmp_gather, dt, offsets, vnmo)

for t0, v in events:
    win = slice(int((t0 - 0.15) / dt), int((t0 + 0.15) / dt))
    moveout = (np.sqrt(t0 ** 2 + (offsets[-1] / v) ** 2) - t0) / dt
    after = np.ptp(np.argmax(corrected[win], axis=0))
    print("event t0=%.1fs: raw moveout %.0f samples -> %d after NMO"
          % (t0, moveout, after))
    assert after <= 3
print("NMO correction flattened both events.")
