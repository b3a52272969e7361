"""One-process A/B of the elastic gradient routes on the bench config.

Runs the round-4 'vjp' route (two-level-rematted autodiff) and the
round-5 'saved' route (hand-written adjoint over a saved bf16 history,
ops/staggered_grad.py) back to back IN ONE PROCESS on the Marmousi2
8-shot elastic_gradient bench config — the only comparison the tunnel
chip's ~20% cross-process spread permits (CLAUDE.md). Also reports the
max-rel gradient deviation between the two routes on chip.

Usage: timeout 1800 python tools/bench_elastic_ab.py
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "drivers"))


def main():
    from _marmousi_common import SMARM2, elastic_fields
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.elastic_fwi import (elastic_fm_multi,
                                            elastic_fwi_obj_multi)
    from devito_fwi_tpu.misfit import least_square
    from devito_fwi_tpu.models.presets import load_velocity
    from scipy.ndimage import gaussian_filter

    cfg = SMARM2
    base = os.path.join(REPO, "model_data", cfg.name)
    v_true = load_velocity(os.path.join(base, "vp.true"), cfg.shape)
    v_init = gaussian_filter(v_true, sigma=20).astype(np.float32)
    vs_t, rho_t = elastic_fields(cfg, v_true)
    vs_0, rho_0 = elastic_fields(cfg, v_init)

    def mk(vp, vs, rho, dt=None):
        return SeismicModel(origin=(0., 0.), spacing=cfg.spacing,
                            shape=cfg.shape, space_order=cfg.space_order,
                            vp=vp, vs=vs, b=(1.0 / rho), nbl=cfg.nbl,
                            dt=dt, bcs="mask")

    dt_e = float(mk(v_true, vs_t, rho_t).critical_dt)
    m1 = mk(v_true, vs_t, rho_t, dt=dt_e)
    m0 = mk(v_init, vs_0, rho_0, dt=dt_e)
    nsrc, nrec = 8, cfg.shape[0]
    src = np.empty((nsrc, 2))
    src[:, 0] = np.linspace(0, m1.domain_size[0], nsrc)
    src[:, 1] = 60.0
    rec = np.empty((nrec, 2))
    rec[:, 0] = np.linspace(cfg.spacing[0],
                            m1.domain_size[0] - cfg.spacing[0], nrec)
    rec[:, 1] = 60.0
    g1 = AcquisitionGeometry(m1, rec, src, 0.0, cfg.tn, f0=cfg.f0,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0.0, cfg.tn, f0=cfg.f0,
                             src_type="Ricker")
    obs, _ = elastic_fm_multi(g1)
    nt = g0.nt
    cells = int(np.prod(m0.padded_shape))
    print(f"config: {nsrc} shots, nt={nt}, padded {m0.padded_shape}, "
          f"{2.0 * nsrc * nt * cells / 1e9:.2f} Gcell-steps (2-sweep)")

    results = {}
    grads = {}
    for route in ("vjp", "saved", "pallas"):
        def one(route=route):
            return elastic_fwi_obj_multi(g0, obs, least_square,
                                         calc_grad=True, shot_chunk=4,
                                         grad_route=route)

        f, g, _ = one()  # compile + correctness capture
        grads[route] = g
        best = float("inf")
        for _ in range(4):
            tic = time.perf_counter()
            one()
            best = min(best, time.perf_counter() - tic)
        rate = 2.0 * nsrc * nt * cells / best / 1e9
        results[route] = (best, rate)
        print(f"{route:6s}: {best:8.3f} s  {rate:6.2f} Gcs/s  "
              f"fval={f:.6e}")

    for other in ("saved", "pallas"):
        for k in ("vp", "vs", "rho"):
            a, b = grads["vjp"][k], grads[other][k]
            sc = np.abs(a).max()
            print(f"grad[{k}] max-rel dev {other}-vs-vjp: "
                  f"{np.abs(a - b).max() / sc:.3e}")
        print(f"speedup {other}: "
              f"{results['vjp'][0] / results[other][0]:.2f}x")


if __name__ == "__main__":
    main()
