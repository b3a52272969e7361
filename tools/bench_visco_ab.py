"""One-process A/B of the viscoacoustic sls/2 gradient routes on the
SMARMN bench config (vjp vs saved vs pallas streamed kernels)."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
    from devito_fwi_tpu.misfit import least_square
    from devito_fwi_tpu.models.presets import load_velocity
    from devito_fwi_tpu.visco_fwi import visco_fm_multi, visco_fwi_obj_multi
    from scipy.ndimage import gaussian_filter

    shape, spacing, tn, f0, nbl = (300, 106), (30., 30.), 4000.0, \
        0.007, 40
    v_true = load_velocity(os.path.join(REPO, "model_data/SMARMN/vp.true"),
                           shape)
    v_init = gaussian_filter(v_true, sigma=20).astype(np.float32)

    def qp_of(vp):
        return (3.516 * ((vp * 1000.0) ** 2.2) * 1e-6).astype(np.float32)

    def rho_of(vp):
        return (0.31 * (1e3 * vp) ** 0.25).astype(np.float32)

    def mk(vp, dt=None):
        return SeismicModel(origin=(0., 0.), spacing=spacing, shape=shape,
                            space_order=8, vp=vp, qp=qp_of(vp),
                            b=(1.0 / rho_of(vp)), nbl=nbl, dt=dt,
                            bcs="mask")

    dt_v = float(mk(v_true).critical_dt)
    m1, m0 = mk(v_true, dt=dt_v), mk(v_init, dt=dt_v)
    nsrc, nrec = 4, shape[0]
    src = np.stack([np.linspace(0, m1.domain_size[0], nsrc),
                    np.full(nsrc, 60.0)], 1)
    rec = np.stack([np.linspace(spacing[0], m1.domain_size[0] - spacing[0],
                                nrec), np.full(nrec, 60.0)], 1)
    g1 = AcquisitionGeometry(m1, rec, src, 0.0, tn, f0=f0,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(m0, rec, src, 0.0, tn, f0=f0,
                             src_type="Ricker")
    obs = visco_fm_multi(g1)
    nt, cells = g0.nt, int(np.prod(m0.padded_shape))
    results, grads = {}, {}
    for route in ("vjp", "saved", "pallas"):
        def one(route=route):
            return visco_fwi_obj_multi(g0, obs, least_square,
                                       calc_grad=True, shot_chunk=4,
                                       grad_route=route)
        f, g, _ = one()
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
        for k in ("vp", "qp"):
            a, c = grads["vjp"][k], grads[other][k]
            sc = np.abs(a).max()
            print(f"grad[{k}] max-rel dev {other}-vs-vjp: "
                  f"{np.abs(a - c).max() / sc:.3e}")
        print(f"speedup {other}: "
              f"{results['vjp'][0] / results[other][0]:.2f}x")


if __name__ == "__main__":
    main()
