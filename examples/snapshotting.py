#!/usr/bin/env python
"""Wavefield snapshotting (reference ``tutorials/08_snapshotting.ipynb``).

Three ways to get wavefield snapshots out of the TPU-native solvers:

1. full history: ``solver.forward(save=True)`` returns the (nt, *grid)
   wavefield (the devito ``save=geometry.nt`` analog);
2. strided snapshots without the full-history memory: slice the saved
   history on device before fetching (the ``ConditionalDimension``
   time-subsampling analog — XLA fuses the slice into the scan output,
   only the kept frames reach the host);
3. memory-lean: the segment-checkpoint states from ``forward_ckpt`` are
   themselves nseg evenly spaced snapshots.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax.numpy as jnp  # noqa: E402

from devito_fwi_tpu import demo_model, AcquisitionGeometry  # noqa: E402
from devito_fwi_tpu import AcousticWaveSolver  # noqa: E402
from devito_fwi_tpu.fwi import _batched_tables, _solver_dt  # noqa: E402
from devito_fwi_tpu.ops import acoustic as ac  # noqa: E402

model = demo_model("layers-isotropic", shape=(101, 101), spacing=(10., 10.),
                   nlayers=3, space_order=4, nbl=40)
src = np.array([[500.0, 20.0]])
rec = np.stack([np.linspace(0, 1000, 101), np.full(101, 20.0)], axis=1)
geometry = AcquisitionGeometry(model, rec, src, 0., 600., f0=0.015,
                               src_type="Ricker")
solver = AcousticWaveSolver(model, geometry, space_order=4)

# 1. full history
_, u, _ = solver.forward(save=True)
print("full history:", u.data.shape)

# 2. strided snapshots, sliced on device (factor-10 subsampling)
factor = 10
snaps = np.asarray(jnp.asarray(u.data)[::factor])
print("strided snapshots:", snaps.shape)
os.makedirs("result", exist_ok=True)
snaps.astype(np.float32).tofile("result/snaps.bin")

# 3. segment-checkpoint states double as snapshots
s_idx, s_w, r_idx, r_w, wav = _batched_tables(geometry)
_, seg_starts, _ = ac.forward_ckpt(
    jnp.asarray(model.vp), jnp.asarray(model.damp), jnp.asarray(wav),
    jnp.asarray(s_idx[0]), jnp.asarray(s_w[0]), jnp.asarray(r_idx),
    jnp.asarray(r_w), _solver_dt(geometry), nt=geometry.nt,
    spacing=model.spacing, space_order=4, n_checkpoints=12)
print("checkpoint snapshots:", seg_starts.shape[0], "states of",
      seg_starts.shape[2:])
for arr, name in [(snaps, "strided"), (np.asarray(seg_starts), "ckpt")]:
    assert np.isfinite(arr).all()
print("wrote result/snaps.bin")
