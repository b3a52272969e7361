#!/usr/bin/env python
"""Camembert (circle) FWI driver.

CLI/flow parity with reference ``circle_fwi.py``: 201x201 grid, 11 shots,
Ricker 10 Hz, tn=1000 ms, L-BFGS + bracketing line search, misfit selected
from {0: L2, 1: W2-1d, 2: W2-2d}. Shots run as one batched TPU program
(sharded over the mesh when more than one device is attached).
"""
import argparse
import os
import sys
from time import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from devito_fwi_tpu import demo_model, AcquisitionGeometry
from devito_fwi_tpu.fwi import Filter, fm_multi, fwi_obj_multi
from devito_fwi_tpu.misfit import least_square, qWasserstein
from devito_fwi_tpu.optimize import LBFGS, NLCG, SteepestDescent, minimize

parser = argparse.ArgumentParser(description="Full waveform inversion")
parser.add_argument("--misfit", type=int, default=0, choices=[0, 1, 2],
                    help="misfit function type:0=least square/1=1d W2/2=2d W2")
parser.add_argument("--precond", type=int, default=1,
                    help="apply precondition")
parser.add_argument("--odir", type=str, default="./result/circle",
                    help="directory to output result")
parser.add_argument("--bathy", type=int, default=0, help="apply bathy mask")
parser.add_argument("--check-gradient", type=int, default=0,
                    help="check the gradient at 1st iteration")
parser.add_argument("--filter", type=int, default=0, help="filtering data")
parser.add_argument("--resample", type=float, default=0.,
                    help="resample dt, default 0 will not resample")
parser.add_argument("--ftol", type=float, default=1e-2,
                    help="Optimizing loss tolerance")
parser.add_argument("--gtol", type=float, default=1e-4,
                    help="Optimizing gradient norm tolerance")
parser.add_argument("--nsrc", type=int, default=11, help="number of shots")
parser.add_argument("--maxiter", type=int, default=50, help="FWI iteration")
parser.add_argument("--steplen", type=float, default=0.05,
                    help="initial step length for line search")
parser.add_argument("--maxls", type=int, default=5,
                    help="max number of line search in each iteration")
parser.add_argument("--batch-size", type=int, default=0,
                    help="random shot subset per iteration (0 = all shots;"
                         " random-batch FWI, not in the reference)")
parser.add_argument("--optimizer", type=str, default="LBFGS",
                    choices=["LBFGS", "NLCG", "SteepestDescent"])
parser.add_argument("--resume", type=int, default=0,
                    help="resume from the latest checkpoint under the log "
                         "dir (appends to the same metric files; not in "
                         "the reference)")
parser.add_argument("--checkpoint-freq", type=int, default=1,
                    help="write an optimizer-state checkpoint every N "
                         "iterations (0 disables)")

if __name__ == "__main__":
    args = parser.parse_args()
    result_dir = args.odir
    os.makedirs(result_dir, exist_ok=True)
    misfit_type = args.misfit
    precond = args.precond
    use_bathy = args.bathy
    use_filter = args.filter
    resample_dt = args.resample
    nsources = args.nsrc

    print("---------------- Parameter Setting ------------\n",
          "\t Result dir: %s \t Misfit function: %d \t Precondition: %d\n"
          % (result_dir, misfit_type, precond),
          "\t Use mask: %d \t Filtering source: %d \t Resample rate: %.2f\n"
          % (use_bathy, use_filter, resample_dt),
          "\t ftol: %e \t gtol: %e \t nsrc: %d\n"
          % (args.ftol, args.gtol, nsources),
          "\t maxiter:%d \t maxls: %d \t init step length: %.3f\n"
          % (args.maxiter, args.maxls, args.steplen),
          "-------------------------------------------------")

    # Velocity models (reference circle_fwi.py:62-78)
    shape = (201, 201)
    spacing = (10., 10.)
    origin = (0, 0)
    space_order = 6
    nbl = 40
    dt = 1.
    radius = 60
    true_model = demo_model("circle-isotropic", vp_circle=3.6,
                            vp_background=3, r=radius, origin=origin,
                            shape=shape, spacing=spacing,
                            space_order=space_order, nbl=nbl, dt=dt)
    init_model = demo_model("circle-isotropic", vp_circle=3,
                            vp_background=3, r=radius, origin=origin,
                            shape=shape, spacing=spacing,
                            space_order=space_order, nbl=nbl, dt=dt)

    bathy_mask = np.ones(shape, dtype=np.float32) if use_bathy else None

    # Acquisition (reference circle_fwi.py:81-98)
    t0, tn, f0 = 0., 1000., 0.010
    src_coordinates = np.empty((nsources, 2))
    src_coordinates[:, 1] = np.linspace(0, true_model.domain_size[0],
                                        num=nsources)
    src_coordinates[:, 0] = 20.
    nreceivers = shape[0]
    rec_coordinates = np.empty((nreceivers, 2))
    rec_coordinates[:, 1] = np.linspace(spacing[0],
                                        true_model.domain_size[0]
                                        - spacing[0], num=nreceivers)
    rec_coordinates[:, 0] = 1980.

    filt_func = None
    if use_filter:
        filt_func = Filter(filter_type="highpass", freqmin=2, corners=6,
                           df=1000 / dt)
    geometry1 = AcquisitionGeometry(true_model, rec_coordinates,
                                    src_coordinates, t0, tn, f0=f0,
                                    src_type="Ricker", filter=filt_func)
    geometry0 = AcquisitionGeometry(init_model, rec_coordinates,
                                    src_coordinates, t0, tn, f0=f0,
                                    src_type="Ricker", filter=filt_func)
    if resample_dt == 0:
        resample_dt = dt
    geometry1.resample(resample_dt)
    geometry0.resample(resample_dt)

    obs = fm_multi(geometry1, save=False)

    qWmetric1d = qWasserstein(gamma=1.01, method="1d")
    qWmetric2d = qWasserstein(gamma=1.01, method="2d", num_steps=10,
                              step_scale=1.)
    misfit_func = [least_square, qWmetric1d, qWmetric2d][misfit_type]

    if args.check_gradient:
        f, g, _ = fwi_obj_multi(geometry0, obs, misfit_func, None,
                                bathy_mask, precond, True)
        g.tofile(os.path.join(result_dir,
                              "circle_1st_grad_" + str(misfit_type)))
        print("check-gradient: f=%.6e |g|=%.3e" % (f, np.abs(g).max()))

    # Box constraints in slowness-squared (reference circle_fwi.py:142-151)
    vmin, vmax = 2.5, 4.0
    bounds = [1.0 / vmax ** 2, 1.0 / vmin ** 2]
    v0 = init_model.crop(init_model.vp)
    m0 = 1.0 / (v0.reshape(-1).astype(np.float64)) ** 2

    tic = time()
    opt_cls = {"LBFGS": LBFGS, "NLCG": NLCG,
               "SteepestDescent": SteepestDescent}[args.optimizer]
    kwargs = dict(ls_method="Bracket", step_len_init=args.steplen,
                  max_ls=args.maxls,
                  log_path=os.path.join(result_dir, "log" + str(misfit_type)))
    if args.optimizer == "LBFGS":
        kwargs["memory"] = 10
    optimizer = opt_cls(**kwargs)
    minimizer = minimize(optimizer, maxIter=args.maxiter, ftol=args.ftol,
                         gtol=args.gtol, batch_size=args.batch_size or None,
                         checkpoint_freq=args.checkpoint_freq,
                         resume=bool(args.resume),
                         log_path=os.path.join(result_dir,
                                               "log" + str(misfit_type)))
    m = minimizer.run(m0, geometry0, obs, misfit_func, None, bathy_mask,
                      precond, bounds)
    print(f"\n Elapsed time: {time() - tic:.2f}s")

    vp = 1.0 / np.sqrt(m.reshape(true_model.shape))
    vp.astype(np.float32).tofile(
        os.path.join(result_dir, "circle_result_misfit_" + str(misfit_type)))
    print("final model range: %.3f %.3f km/s" % (vp.min(), vp.max()))
