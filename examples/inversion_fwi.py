#!/usr/bin/env python
"""Standalone camembert FWI example with hard regression asserts.

Port of the reference ``seismic/inversion/fwi.py``: 2-D circle anomaly,
9 shots, acoustic modeling, L2 misfit, adjoint-state gradient, 5 plain
gradient-descent iterations with a box constraint. Golden values
(reference :95-97,121): first objective ~39113, gradient min/max
~-821/+2442, misfit after 5 iterations ~3828 (atol 10).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from devito_fwi_tpu import (demo_model, AcquisitionGeometry,  # noqa: E402
                            AcousticWaveSolver, compute_residual,
                            update_with_box)

nshots = 9
nreceivers = 101
fwi_iterations = 5

shape, spacing, origin = (101, 101), (10., 10.), (0., 0.)
model = demo_model('circle-isotropic', vp_circle=3.0, vp_background=2.5,
                   origin=origin, shape=shape, spacing=spacing, nbl=40)
model0 = demo_model('circle-isotropic', vp_circle=2.5, vp_background=2.5,
                    origin=origin, shape=shape, spacing=spacing, nbl=40)

src_coordinates = np.empty((1, 2))
src_coordinates[0, :] = np.array(model.domain_size) * .5
src_coordinates[0, 0] = 20.
rec_coordinates = np.empty((nreceivers, 2))
rec_coordinates[:, 1] = np.linspace(0, model.domain_size[0], num=nreceivers)
rec_coordinates[:, 0] = 980.
geometry = AcquisitionGeometry(model, rec_coordinates, src_coordinates,
                               0., 1000., f0=0.010, src_type='Ricker')
solver = AcousticWaveSolver(model, geometry, space_order=4)

source_locations = np.empty((nshots, 2), dtype=np.float32)
source_locations[:, 0] = 20.
source_locations[:, 1] = np.linspace(0., 1000, num=nshots)


def fwi_gradient(vp_in):
    grad = np.zeros(model.padded_shape, dtype=np.float64)
    objective = 0.
    for i in range(nshots):
        solver.geometry.src_positions[0, :] = source_locations[i, :]
        d_obs, _, _ = solver.forward(vp=model.vp)
        d_obs_data = d_obs.data.copy()
        d_syn, u0, _ = solver.forward(vp=vp_in, save=True)
        residual = solver.geometry.rec
        residual.data[:] = d_syn.data - d_obs_data
        objective += .5 * np.linalg.norm(residual.data) ** 2
        g, _ = solver.jacobian_adjoint(residual, u0, vp=vp_in)
        grad += np.asarray(g, dtype=np.float64)
    return objective, grad


if __name__ == "__main__":
    ff, update = fwi_gradient(model0.vp)
    print("objective %f  grad min %f max %f"
          % (ff, update.min(), update.max()))
    assert np.isclose(ff, 39113, atol=1e1, rtol=0)
    assert np.isclose(update.min(), -821, atol=1e1, rtol=0)
    assert np.isclose(update.max(), 2442, atol=1e1, rtol=0)

    history = np.zeros((fwi_iterations, 1))
    for i in range(fwi_iterations):
        phi, direction = fwi_gradient(model0.vp)
        history[i] = phi
        alpha = .05 / direction.max()
        update_with_box(model0.vp, alpha, direction)
        print('Objective value is %f at iteration %d' % (phi, i + 1))
    assert np.isclose(history[-1], 3828, atol=1e1, rtol=0)
    print("camembert inversion regression PASSED")
