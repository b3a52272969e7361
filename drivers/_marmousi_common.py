"""Shared Marmousi driver logic (SMARMN and SMARM2 configurations).

CLI/flow parity with the reference ``marmousi_fwi.py`` / ``marmousi2_fwi.py``
/ ``marmousi_fm.py`` / ``marmousi2_fm.py`` drivers: same flags, same model
and acquisition constants, same misfit selection, same result-file layout.
Execution is TPU-native (batched shots, fused objective).

The raw velocity models (float32 LE binaries) are looked up in
``--data-dir`` (default: $DEVITO_FWI_TPU_DATA, else the vendored
``model_data/`` at the repo root); when no data is available a synthetic
layered stand-in with the same dimensions is generated so the drivers
stay runnable end-to-end.
"""
import argparse
import os
import sys
from dataclasses import dataclass
from time import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry  # noqa: E402
from devito_fwi_tpu.fwi import Filter, fm_multi, fwi_obj_multi  # noqa: E402
from devito_fwi_tpu.misfit import least_square, qWasserstein  # noqa: E402
from devito_fwi_tpu.optimize import LBFGS, minimize  # noqa: E402


@dataclass
class MarmousiConfig:
    name: str           # 'SMARMN' | 'SMARM2'
    shape: tuple        # (nx, nz)
    dt: float
    tn: float
    nsrc_default: int
    bathy_rows: int     # water rows zeroed by the bathy mask
    w2_step_scale: float
    spacing: tuple = (30., 30.)
    f0: float = 0.007
    space_order: int = 8
    nbl: int = 40
    w2_num_steps: int = 15


SMARMN = MarmousiConfig(name="SMARMN", shape=(300, 106), dt=2.95, tn=4000.,
                        nsrc_default=29, bathy_rows=7, w2_step_scale=1.)
SMARM2 = MarmousiConfig(name="SMARM2", shape=(340, 140), dt=3., tn=4500.,
                        nsrc_default=31, bathy_rows=15, w2_step_scale=4.)


def make_parser(cfg, fm=False):
    p = argparse.ArgumentParser(description="Full waveform inversion"
                                if not fm else "Forward modeling")
    if not fm:
        p.add_argument("--misfit", type=int, default=0, choices=[0, 1, 2],
                       help="misfit function type:"
                            "0=least square/1=1d W2/2=2d W2")
        p.add_argument("--precond", type=int, default=1,
                       help="apply precondition")
        p.add_argument("--check-gradient", type=int, default=0,
                       help="check the gradient at 1st iteration")
        p.add_argument("--resample", type=float, default=0.,
                       help="resample dt, default 0 will not resample")
        p.add_argument("--ftol", type=float, default=1e-5,
                       help="Optimizing loss tolerance")
        p.add_argument("--gtol", type=float, default=1e-10,
                       help="Optimizing gradient norm tolerance")
        p.add_argument("--maxiter", type=int, default=200,
                       help="FWI iteration")
        p.add_argument("--steplen", type=float, default=0.1,
                       help="initial step length for line search")
        p.add_argument("--maxls", type=int, default=5,
                       help="max number of line search in each iteration")
        p.add_argument("--batch-size", type=int, default=0,
                       help="random shot subset per iteration (0 = all "
                            "shots; random-batch FWI, not in the "
                            "reference)")
        p.add_argument("--physics", type=str, default="acoustic",
                       choices=["acoustic", "elastic", "viscoacoustic"],
                       help="propagator: acoustic (reference parity), "
                            "elastic staggered-grid Vp/Vs/rho FWI "
                            "(BASELINE.json north-star config), or "
                            "viscoacoustic SLS (Q-compensated FWI) — "
                            "the reference has no gradients for the "
                            "latter two")
        p.add_argument("--resume", type=int, default=0,
                       help="resume from the latest checkpoint under the "
                            "log dir (appends to the same metric files; "
                            "not in the reference)")
        p.add_argument("--checkpoint-freq", type=int, default=1,
                       help="write an optimizer-state checkpoint every N "
                            "iterations (0 disables)")
    p.add_argument("--odir", type=str, default="./result/" + cfg.name,
                   help="directory to output result")
    p.add_argument("--bathy", type=int, default=1, help="apply bathy mask")
    p.add_argument("--filter", type=int, default=0, help="filtering data")
    p.add_argument("--nsrc", type=int,
                   default=cfg.nsrc_default if not fm else 21,
                   help="number of shots")
    p.add_argument("--data-dir", type=str, default=default_data_dir(),
                   help="directory holding %s/vp.true etc." % cfg.name)
    return p


def default_data_dir():
    """$DEVITO_FWI_TPU_DATA, else the vendored repo-root model_data/."""
    env = os.environ.get("DEVITO_FWI_TPU_DATA")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "model_data")


def _synthetic_vp(shape, water_rows=7, seed=0):
    """Layered stand-in with a water column, same value range as Marmousi."""
    rng = np.random.RandomState(seed)
    nx, nz = shape
    depth = np.linspace(1.5, 4.5, nz)[None, :]
    wob = 0.3 * np.sin(np.linspace(0, 6 * np.pi, nx))[:, None] \
        * np.linspace(0, 1, nz)[None, :]
    v = (depth + wob + 0.1 * rng.randn(nx, nz) * np.linspace(0, 1, nz))
    v[:, :water_rows] = 1.5
    return np.asarray(v, dtype=np.float32)


def load_models(cfg, data_dir):
    """Returns (true_vp, smooth_vp) in km/s."""
    base = os.path.join(data_dir, cfg.name)
    tpath = os.path.join(base, "vp.true")
    spath = os.path.join(base, "vp.smooth_20")
    if os.path.exists(tpath):
        true_vp = np.fromfile(tpath, dtype=np.float32).reshape(cfg.shape) \
            / 1000
        if os.path.exists(spath):
            smooth_vp = np.fromfile(spath, dtype=np.float32) \
                .reshape(cfg.shape) / 1000
        else:
            from scipy.ndimage import gaussian_filter
            smooth_vp = gaussian_filter(true_vp, sigma=20).astype(np.float32)
    else:
        print("WARNING: %s not found - using a synthetic stand-in model"
              % tpath)
        from scipy.ndimage import gaussian_filter
        # keep the stand-in's water column consistent with the driver's
        # bathymetry configuration (SMARM2 masks 15 rows, not 7)
        true_vp = _synthetic_vp(cfg.shape, water_rows=cfg.bathy_rows)
        smooth_vp = gaussian_filter(true_vp, sigma=20).astype(np.float32)
        smooth_vp[:, :cfg.bathy_rows] = 1.5
    return true_vp, smooth_vp


def setup(cfg, args, nsources):
    """Build (true, init, constant-water) models + geometries + bathy mask
    (reference marmousi_fwi.py:62-117)."""
    origin = (0, 0)
    true_vp, smooth_vp = load_models(cfg, args.data_dir)
    constant_vp = np.ones(cfg.shape) * 1.5

    bathy_mask = np.ones(cfg.shape, dtype=np.float32)
    bathy_mask[:, :cfg.bathy_rows] = 0
    if not args.bathy:
        bathy_mask = None

    def model(vp):
        return SeismicModel(origin=origin, spacing=cfg.spacing,
                            shape=cfg.shape, space_order=cfg.space_order,
                            vp=vp, nbl=cfg.nbl, fs=False, dt=cfg.dt,
                            bcs="damp")

    true_model = model(true_vp)
    init_model = model(smooth_vp)
    constant_model = model(constant_vp)

    src_coordinates = np.empty((nsources, 2))
    src_coordinates[:, 0] = np.linspace(0, true_model.domain_size[0],
                                        num=nsources)
    src_coordinates[:, -1] = 2 * cfg.spacing[0]
    nreceivers = cfg.shape[0]
    rec_coordinates = np.empty((nreceivers, 2))
    rec_coordinates[:, 0] = np.linspace(cfg.spacing[0],
                                        true_model.domain_size[0]
                                        - cfg.spacing[0], num=nreceivers)
    rec_coordinates[:, 1] = 2 * cfg.spacing[0]

    filt_func = None
    if args.filter:
        filt_func = Filter(filter_type="highpass", freqmin=3, corners=6,
                           df=1000 / cfg.dt)
    geoms = [AcquisitionGeometry(m, rec_coordinates, src_coordinates, 0.,
                                 cfg.tn, f0=cfg.f0, src_type="Ricker",
                                 filter=filt_func)
             for m in (true_model, init_model, constant_model)]
    return (true_model, init_model, constant_model), geoms, \
        (true_vp, smooth_vp), bathy_mask


def elastic_fields(cfg, vp):
    """Derive (vs, rho) for an elastic Marmousi run: vs = vp/sqrt(3)
    (Poisson solid) with a fluid water column (vs = 0), rho from
    Gardner's relation 0.31 (1000 vp)^0.25 g/cc (the reference's
    empirical preset relation, ``seismic/preset_models.py:349-351``)
    with water at 1.0 g/cc."""
    vs = (vp / np.sqrt(3.0)).astype(np.float32)
    vs[:, :cfg.bathy_rows] = 0.0
    rho = (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)
    rho[:, :cfg.bathy_rows] = 1.0
    return vs, rho


def setup_elastic(cfg, args, nsources):
    """Elastic twin of ``setup``: (true, init, water) models carry
    (vs, b) so the staggered propagator drives them; one pinned dt
    (the true model's elastic CFL) keeps all time axes aligned."""
    origin = (0, 0)
    true_vp, smooth_vp = load_models(cfg, args.data_dir)
    constant_vp = np.ones(cfg.shape, dtype=np.float32) * 1.5

    bathy_mask = np.ones(cfg.shape, dtype=np.float32)
    bathy_mask[:, :cfg.bathy_rows] = 0
    if not args.bathy:
        bathy_mask = None

    vs_t, rho_t = elastic_fields(cfg, true_vp)
    vs_0, rho_0 = elastic_fields(cfg, smooth_vp)
    vs_w = np.zeros(cfg.shape, np.float32)
    rho_w = np.ones(cfg.shape, np.float32)

    def model(vp, vs, rho, dt=None):
        return SeismicModel(origin=origin, spacing=cfg.spacing,
                            shape=cfg.shape, space_order=cfg.space_order,
                            vp=vp, vs=vs, b=(1.0 / rho), nbl=cfg.nbl,
                            fs=False, dt=dt, bcs="mask")

    # CFL-safe for the INVERSION BOUND ceiling (5.2 km/s), not just the
    # true model: line-search trials are free to push bounded vp above
    # the true maximum, and a step beyond the pinned dt's CFL limit
    # blows the staggered forward up to NaN (hit in round 5 — the
    # bracket search's step-len-max clamp accepts an unevaluated step)
    vmax_bound = 5.2
    dt_e = float(model(true_vp, vs_t, rho_t).critical_dt)
    dt_e *= min(1.0, float(true_vp.max()) / vmax_bound)
    true_model = model(true_vp, vs_t, rho_t, dt=dt_e)
    init_model = model(smooth_vp, vs_0, rho_0, dt=dt_e)
    water_model = model(constant_vp, vs_w, rho_w, dt=dt_e)

    src_coordinates = np.empty((nsources, 2))
    src_coordinates[:, 0] = np.linspace(0, true_model.domain_size[0],
                                        num=nsources)
    src_coordinates[:, -1] = 2 * cfg.spacing[0]
    nreceivers = cfg.shape[0]
    rec_coordinates = np.empty((nreceivers, 2))
    rec_coordinates[:, 0] = np.linspace(cfg.spacing[0],
                                        true_model.domain_size[0]
                                        - cfg.spacing[0], num=nreceivers)
    rec_coordinates[:, 1] = 2 * cfg.spacing[0]

    geoms = [AcquisitionGeometry(m, rec_coordinates, src_coordinates, 0.,
                                 cfg.tn, f0=cfg.f0, src_type="Ricker")
             for m in (true_model, init_model, water_model)]
    return (true_model, init_model, water_model), geoms, \
        (true_vp, smooth_vp, vs_0, rho_0), bathy_mask


def run_fwi_elastic(cfg, args):
    """Elastic Marmousi FWI: velocity-stress propagator, vp inversion in
    squared slowness with vs/rho pinned at the smooth-model fields (the
    BASELINE.json "Marmousi2 elastic FWI" workload; no reference
    counterpart exists — its elastic solver has no adjoint)."""
    from devito_fwi_tpu.elastic_fwi import ElasticFwiLoss, elastic_fm_multi

    result_dir = args.odir
    misfit_type = args.misfit
    models, geoms, fields, bathy_mask = setup_elastic(cfg, args, args.nsrc)
    geometry1, geometry0, geometry2 = geoms
    _, smooth_vp, vs_0, rho_0 = fields

    obs, _ = elastic_fm_multi(geometry1)
    direct_wave, _ = elastic_fm_multi(geometry2)

    qW1d = qWasserstein(gamma=1.01, method="1d")
    qW2d = qWasserstein(gamma=1.01, method="2d",
                        num_steps=cfg.w2_num_steps,
                        step_scale=cfg.w2_step_scale)
    misfit_func = [least_square, qW1d, qW2d][misfit_type]

    loss = ElasticFwiLoss(vs=vs_0, rho=rho_0, shot_chunk=4)
    vmin, vmax = 1.5, 5.2
    bounds = [1.0 / vmax ** 2, 1.0 / vmin ** 2]
    m0 = 1. / (smooth_vp.reshape(-1).astype(np.float64)) ** 2

    if args.check_gradient:
        f, g, _ = loss(m0, geometry0, obs, misfit_func, direct_wave,
                       bathy_mask, args.precond, calc_grad=True)
        np.asarray(g, np.float32).tofile(
            os.path.join(result_dir, "marmousi_elastic_1st_grad_"
                         + str(misfit_type)))
        print("check-gradient: f=%.6e |g|max=%.3e" % (f, np.abs(g).max()))

    tic = time()
    optimizer = LBFGS(memory=10, ls_method="Bracket",
                      step_len_init=args.steplen, max_ls=args.maxls,
                      log_path=os.path.join(result_dir,
                                            "log_el" + str(misfit_type)))
    minimizer = minimize(optimizer, maxIter=args.maxiter, ftol=args.ftol,
                         gtol=args.gtol,
                         batch_size=getattr(args, "batch_size", 0) or None,
                         checkpoint_freq=args.checkpoint_freq,
                         resume=bool(args.resume), loss_fn=loss,
                         log_path=os.path.join(result_dir,
                                               "log_el" + str(misfit_type)))
    m = minimizer.run(m0, geometry0, obs, misfit_func, direct_wave,
                      bathy_mask, args.precond, bounds)
    print(f"\n Elapsed time: {time() - tic:.2f}s")

    vp = 1.0 / np.sqrt(m.reshape(cfg.shape))
    vp.astype(np.float32).tofile(
        os.path.join(result_dir,
                     "marmousi_elastic_result_misfit_" + str(misfit_type)))
    print("final model range: %.3f %.3f km/s" % (vp.min(), vp.max()))
    return m


def setup_visco(cfg, args, nsources):
    """Viscoacoustic twin of ``setup``: qp from Li's empirical formula
    (reference ``preset_models.py:349``), rho from Gardner, one pinned
    dt."""
    origin = (0, 0)
    true_vp, smooth_vp = load_models(cfg, args.data_dir)
    constant_vp = np.ones(cfg.shape, dtype=np.float32) * 1.5

    bathy_mask = np.ones(cfg.shape, dtype=np.float32)
    bathy_mask[:, :cfg.bathy_rows] = 0
    if not args.bathy:
        bathy_mask = None

    def qp_of(vp):
        return (3.516 * ((vp * 1000.0) ** 2.2) * 1e-6).astype(np.float32)

    def rho_of(vp):
        rho = (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)
        rho[:, :cfg.bathy_rows] = 1.0
        return rho

    def model(vp, dt=None):
        return SeismicModel(origin=origin, spacing=cfg.spacing,
                            shape=cfg.shape, space_order=cfg.space_order,
                            vp=vp, qp=qp_of(vp), b=(1.0 / rho_of(vp)),
                            nbl=cfg.nbl, fs=False, dt=dt, bcs="mask")

    dt_v = float(model(true_vp).critical_dt)
    true_model = model(true_vp, dt=dt_v)
    init_model = model(smooth_vp, dt=dt_v)
    water_model = model(constant_vp, dt=dt_v)

    src_coordinates = np.empty((nsources, 2))
    src_coordinates[:, 0] = np.linspace(0, true_model.domain_size[0],
                                        num=nsources)
    src_coordinates[:, -1] = 2 * cfg.spacing[0]
    nreceivers = cfg.shape[0]
    rec_coordinates = np.empty((nreceivers, 2))
    rec_coordinates[:, 0] = np.linspace(cfg.spacing[0],
                                        true_model.domain_size[0]
                                        - cfg.spacing[0], num=nreceivers)
    rec_coordinates[:, 1] = 2 * cfg.spacing[0]

    geoms = [AcquisitionGeometry(m, rec_coordinates, src_coordinates, 0.,
                                 cfg.tn, f0=cfg.f0, src_type="Ricker")
             for m in (true_model, init_model, water_model)]
    return (true_model, init_model, water_model), geoms, smooth_vp, \
        bathy_mask


def run_fwi_visco(cfg, args):
    """Viscoacoustic (SLS) Marmousi FWI: vp inversion in squared
    slowness with qp/rho pinned at the smooth-model fields — the
    Q-compensated-FWI CLI entry (no reference counterpart: its
    viscoacoustic stack has no gradient)."""
    from devito_fwi_tpu.visco_fwi import ViscoFwiLoss, visco_fm_multi

    result_dir = args.odir
    misfit_type = args.misfit
    models, geoms, smooth_vp, bathy_mask = setup_visco(cfg, args,
                                                       args.nsrc)
    geometry1, geometry0, geometry2 = geoms

    obs = visco_fm_multi(geometry1)
    direct_wave = visco_fm_multi(geometry2)

    qW1d = qWasserstein(gamma=1.01, method="1d")
    qW2d = qWasserstein(gamma=1.01, method="2d",
                        num_steps=cfg.w2_num_steps,
                        step_scale=cfg.w2_step_scale)
    misfit_func = [least_square, qW1d, qW2d][misfit_type]

    loss = ViscoFwiLoss(shot_chunk=4)
    vmin, vmax = 1.5, 5.2
    bounds = [1.0 / vmax ** 2, 1.0 / vmin ** 2]
    m0 = 1. / (smooth_vp.reshape(-1).astype(np.float64)) ** 2

    tic = time()
    optimizer = LBFGS(memory=10, ls_method="Bracket",
                      step_len_init=args.steplen, max_ls=args.maxls,
                      log_path=os.path.join(result_dir,
                                            "log_va" + str(misfit_type)))
    minimizer = minimize(optimizer, maxIter=args.maxiter, ftol=args.ftol,
                         gtol=args.gtol,
                         batch_size=getattr(args, "batch_size", 0) or None,
                         checkpoint_freq=args.checkpoint_freq,
                         resume=bool(args.resume), loss_fn=loss,
                         log_path=os.path.join(result_dir,
                                               "log_va" + str(misfit_type)))
    m = minimizer.run(m0, geometry0, obs, misfit_func, direct_wave,
                      bathy_mask, args.precond, bounds)
    print(f"\n Elapsed time: {time() - tic:.2f}s")

    vp = 1.0 / np.sqrt(m.reshape(cfg.shape))
    vp.astype(np.float32).tofile(
        os.path.join(result_dir,
                     "marmousi_visco_result_misfit_" + str(misfit_type)))
    print("final model range: %.3f %.3f km/s" % (vp.min(), vp.max()))
    return m


def run_fwi(cfg):
    args = make_parser(cfg).parse_args()
    result_dir = args.odir
    os.makedirs(result_dir, exist_ok=True)
    physics = getattr(args, "physics", "acoustic")
    if physics == "elastic":
        return run_fwi_elastic(cfg, args)
    if physics == "viscoacoustic":
        return run_fwi_visco(cfg, args)
    misfit_type = args.misfit
    print("---------------- Parameter Setting ------------\n",
          "\t Result dir: %s \t Misfit function: %d \t Precondition: %d\n"
          % (result_dir, misfit_type, args.precond),
          "\t Use mask: %d \t Filtering source: %d \t Resample rate: %.2f\n"
          % (args.bathy, args.filter, args.resample),
          "\t ftol: %e \t gtol: %e \t nsrc: %d\n"
          % (args.ftol, args.gtol, args.nsrc),
          "\t maxiter:%d \t maxls: %d \t init step length: %.3f\n"
          % (args.maxiter, args.maxls, args.steplen),
          "-------------------------------------------------")

    models, geoms, vps, bathy_mask = setup(cfg, args, args.nsrc)
    geometry1, geometry0, geometry2 = geoms
    _, smooth_vp = vps
    resample_dt = args.resample or cfg.dt
    geometry0.resample(resample_dt)

    obs = fm_multi(geometry1, save=False)
    direct_wave = fm_multi(geometry2, save=False)

    qW1d = qWasserstein(gamma=1.01, method="1d")
    qW2d = qWasserstein(gamma=1.01, method="2d",
                        num_steps=cfg.w2_num_steps,
                        step_scale=cfg.w2_step_scale)
    misfit_func = [least_square, qW1d, qW2d][misfit_type]

    if args.check_gradient:
        f, g, _ = fwi_obj_multi(geometry0, obs, misfit_func, None,
                                bathy_mask, args.precond, True)
        g.tofile(os.path.join(result_dir, "marmousi_1st_grad_"
                              + str(misfit_type)))
        print("check-gradient: f=%.6e |g|max=%.3e" % (f, np.abs(g).max()))

    vmin, vmax = 1.5, 5.2
    bounds = [1.0 / vmax ** 2, 1.0 / vmin ** 2]
    m0 = 1. / (smooth_vp.reshape(-1).astype(np.float64)) ** 2

    tic = time()
    optimizer = LBFGS(memory=10, ls_method="Bracket",
                      step_len_init=args.steplen, max_ls=args.maxls,
                      log_path=os.path.join(result_dir,
                                            "log" + str(misfit_type)))
    minimizer = minimize(optimizer, maxIter=args.maxiter, ftol=args.ftol,
                         gtol=args.gtol,
                         batch_size=getattr(args, "batch_size", 0) or None,
                         checkpoint_freq=args.checkpoint_freq,
                         resume=bool(args.resume),
                         log_path=os.path.join(result_dir,
                                               "log" + str(misfit_type)))
    m = minimizer.run(m0, geometry0, obs, misfit_func, direct_wave,
                      bathy_mask, args.precond, bounds)
    print(f"\n Elapsed time: {time() - tic:.2f}s")

    vp = 1.0 / np.sqrt(m.reshape(cfg.shape))
    vp.astype(np.float32).tofile(
        os.path.join(result_dir,
                     "marmousi_result_misfit_" + str(misfit_type)))
    print("final model range: %.3f %.3f km/s" % (vp.min(), vp.max()))
    return m


def run_fm(cfg):
    """Forward-modeling driver: dump obs/syn/direct-wave gathers
    (reference marmousi_fm.py:107-118)."""
    args = make_parser(cfg, fm=True).parse_args()
    result_dir = args.odir
    os.makedirs(os.path.join(result_dir, "data"), exist_ok=True)
    nsources = args.nsrc

    models, geoms, _, _ = setup(cfg, args, nsources)
    geometry1, geometry0, geometry2 = geoms

    obs = fm_multi(geometry1, save=False)
    syn = fm_multi(geometry0, save=False)
    direct_wave = fm_multi(geometry2, save=False)
    print(obs[0].data.shape)
    for i in range(nsources):
        obs[i].data[:].astype(np.float32).tofile(
            os.path.join(result_dir, "data/obs" + str(i)))
        syn[i].data[:].astype(np.float32).tofile(
            os.path.join(result_dir, "data/syn" + str(i)))
        direct_wave[i].data[:].astype(np.float32).tofile(
            os.path.join(result_dir, "data/dw" + str(i)))
