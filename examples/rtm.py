#!/usr/bin/env python
"""Reverse-time migration (RTM) example.

Mirrors the reference tutorial ``seismic/tutorials/03_rtm.ipynb``: model
observed data in the true model, then for each shot cross-correlate the
smooth-model forward wavefield with the receiver-residual adjoint field
(our ``jacobian_adjoint``) to image reflectivity. Uses the checkpointed
gradient so no full wavefield is ever stored.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from devito_fwi_tpu import (demo_model, AcquisitionGeometry,  # noqa: E402
                            AcousticWaveSolver)

nshots, nreceivers = 21, 101
shape, spacing = (101, 101), (10., 10.)

model = demo_model("layers-isotropic", shape=shape, spacing=spacing,
                   nlayers=4, space_order=4, nbl=40)
model0 = demo_model("layers-isotropic", shape=shape, spacing=spacing,
                    nlayers=4, space_order=4, nbl=40)
model0.smooth("vp", sigma=4)

src_coordinates = np.empty((1, 2))
src_coordinates[0, :] = [500., 20.]
rec_coordinates = np.empty((nreceivers, 2))
rec_coordinates[:, 0] = np.linspace(0, model.domain_size[0], nreceivers)
rec_coordinates[:, 1] = 20.
geometry = AcquisitionGeometry(model, rec_coordinates, src_coordinates,
                               0., 1000., f0=0.015, src_type="Ricker")
solver = AcousticWaveSolver(model, geometry, space_order=4)

source_locations = np.empty((nshots, 2))
source_locations[:, 0] = np.linspace(0., model.domain_size[0], nshots)
source_locations[:, 1] = 20.

if __name__ == "__main__":
    image = np.zeros(model.padded_shape, dtype=np.float64)
    for i in range(nshots):
        solver.geometry.src_positions[0, :] = source_locations[i, :]
        d_obs, _, _ = solver.forward(vp=model.vp)
        residual = solver.geometry.rec
        d_obs_data = d_obs.data.copy()
        d_syn, _, _ = solver.forward(vp=model0.vp)
        residual.data[:] = d_syn.data - d_obs_data
        # imaging condition: sum_t u0.dt2 * v (checkpointed, no saved field)
        g, _ = solver.jacobian_adjoint(residual, None, vp=model0.vp,
                                       checkpointing=True)
        image += np.asarray(g, dtype=np.float64)

    img = model.crop(image)
    # simple laplacian filter to remove low-wavenumber backscatter
    from devito_fwi_tpu.optimize.math import nabla2
    img_f = nabla2(img)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "rtm_image.bin")
    img_f.astype(np.float32).tofile(out)
    print("RTM image written to", out,
          "| energy below first interface: %.3e" % np.abs(img_f[:, 30:]).max())
    assert np.isfinite(img_f).all() and np.abs(img_f).max() > 0
