#!/usr/bin/env python
"""One-process on-chip A/B of the 3-D saved-route fused objective:
round-2 form (f32 history, per-step receiver scatter, separate
sum(u*u) illumination) vs the round-3 form (bf16 history, pad-fused
slab residual injection, illumination fused into the reverse reads).

Usage: python tools/bench_3d_saved_ab.py [--n 64] [--nsrc 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--nsrc", type=int, default=4)
    ap.add_argument("--tn", type=float, default=500.0)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu import AcquisitionGeometry
    from devito_fwi_tpu.fwi import fwi_obj_multi, fm_multi
    from devito_fwi_tpu.misfit import least_square

    n = args.n
    kw = dict(shape=(n, n, n), spacing=(15., 15., 15.), space_order=8,
              nbl=16, dt=1.5)
    model1 = demo_model("layers-isotropic", nlayers=3, **kw)
    model0 = demo_model("layers-isotropic", nlayers=1, **kw)
    nsrc, nrec = args.nsrc, 48
    ext = model1.domain_size[0]
    src = np.stack([np.linspace(0, ext, nsrc), np.full(nsrc, ext / 2),
                    np.full(nsrc, 30.0)], 1)
    rec = np.stack([np.linspace(0, ext, nrec), np.full(nrec, ext / 2),
                    np.full(nrec, 30.0)], 1)
    g1 = AcquisitionGeometry(model1, rec, src, 0.0, args.tn, f0=0.012,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(model0, rec, src, 0.0, args.tn, f0=0.012,
                             src_type="Ricker")
    obs = fm_multi(g1)
    nt = g0.nt
    cells = int(np.prod(model0.padded_shape))
    out = {"padded": list(model0.padded_shape), "nt": nt, "B": nsrc}

    variants = {
        "default": {},
        "pallas3d": {"DEVITO_FWI_TPU_SAVED3": "0"},
        "old": {"DEVITO_FWI_TPU_PALLAS3D": "0",
                "DEVITO_FWI_TPU_SLAB3": "0", "DEVITO_FWI_TPU_HIST": "f32"},
        "new": {"DEVITO_FWI_TPU_PALLAS3D": "0"},
    }
    # "default" must match "new" — the router prefers the slab-saved
    # route for gradients since the A/B below picked it
    results = {}
    for name, env in variants.items():
        for k, v in env.items():
            os.environ[k] = v
        try:
            def one():
                f, g, r = fwi_obj_multi(g0, obs, least_square, None, None,
                                        True, calc_grad=True)
                return float(f), g
            f0, grad = one()
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                one()
                best = min(best, time.perf_counter() - t0)
            results[name] = (best, f0, np.asarray(grad))
            out[f"{name}_s"] = round(best, 4)
            out[f"{name}_gcs_fwd_adj"] = round(
                2.0 * nsrc * nt * cells / best / 1e9, 2)
        finally:
            for k in env:
                os.environ.pop(k, None)
    if "old" in results and "new" in results:
        out["speedup"] = round(results["old"][0] / results["new"][0], 3)
        go, gn = results["old"][2], results["new"][2]
        out["grad_max_rel_dev"] = float(
            np.abs(gn - go).max() / np.abs(go).max())
        out["fval_rel_dev"] = abs(results["new"][1] - results["old"][1]) \
            / abs(results["old"][1])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
