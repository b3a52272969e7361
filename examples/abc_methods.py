"""Absorbing-boundary methods study — sponge damping vs PML vs HABC.

Runnable equivalent of the reference's ``seismic/abc_methods/`` notebook
series (01_introduction, 02_damping, 03_pml, 04_habc): a point Ricker
source in a homogeneous medium, truncated at the interior box, with each
boundary treatment compared against a boundary-free big-domain reference
trace.

Usage: python examples/abc_methods.py
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from devito_fwi_tpu.models.sources import TimeAxis, RickerSource
from devito_fwi_tpu.ops.interp import interp_table
from devito_fwi_tpu.ops.abc import (pml_acoustic_forward,
                                    habc_acoustic_forward, extend_velocity)

H = 10.0          # m
V0 = 1.5          # km/s
NPTI = 101        # interior grid points per dim (1 km x 1 km)
TN = 800.0        # ms
F0 = 0.015        # kHz
NPML = 20


def run(margin, method, **kw):
    v = extend_velocity(np.full((NPTI, NPTI), V0, np.float32), margin)
    dt = 0.4 * H / V0
    time_range = TimeAxis(start=0.0, stop=TN, step=dt)
    src = RickerSource(name="src", f0=F0, time_range=time_range,
                       coordinates=np.array([[NPTI // 2 * H, 3 * H]]))
    rec_coords = np.stack([np.linspace(0, (NPTI - 1) * H, 51),
                           np.full(51, 20.0)], axis=-1)
    origin = (-margin * H, 0.0)
    s_idx, s_w = interp_table(src.coordinates, origin, (H, H))
    r_idx, r_w = interp_table(rec_coords, origin, (H, H))
    args = (v, jnp.asarray(src.data), jnp.asarray(s_idx), jnp.asarray(s_w),
            jnp.asarray(r_idx), jnp.asarray(r_w), dt)
    kwargs = dict(nt=time_range.num, spacing=(H, H), npml=margin)
    if method == "pml":
        rec, _ = pml_acoustic_forward(*args, **kwargs, **kw)
    else:
        rec, _ = habc_acoustic_forward(*args, **kwargs, **kw)
    return np.asarray(rec)


def main():
    ref = run(200, "pml", quibar=0.0)        # boundary-free reference
    hard = run(NPML, "pml", quibar=0.0)      # hard Dirichlet truncation

    def err(rec):
        return np.linalg.norm(rec - ref) / np.linalg.norm(ref)

    print(f"{'method':<28s} relative reflection error")
    print(f"{'hard truncation':<28s} {err(hard):.2e}")
    print(f"{'PML (quibar=0.05)':<28s} {err(run(NPML, 'pml', quibar=0.05)):.2e}")
    for name, t in [("HABC Clayton A1", 1), ("HABC Clayton A2", 2),
                    ("HABC Higdon", 3)]:
        print(f"{name:<28s} {err(run(NPML, 'habc', habctype=t)):.2e}")


if __name__ == "__main__":
    main()
