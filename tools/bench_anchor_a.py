"""One-process A/B of the anchored-Legendre stride A (and window W) on
the live 29-shot SMARMN W2 gradient objective.

The anchor pass costs ~1/A of the full transform and profiling on live
state (tools/profile_w2_components.py) shows the anchored mode at
40.0 ms/call vs 44.5 ms full — far from its op-count bound, so the
anchor pass/banded-eval traffic dominates. Larger A cuts the anchor
pass; the certificate keeps every setting exact (fallback to the full
transform when brackets do not fit the window).

Usage: python tools/bench_anchor_a.py [A:W ...]   (default 16:64 32:64
64:64 32:48)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "drivers"))

import numpy as np
import jax
import jax.numpy as jnp

from _marmousi_common import SMARMN, setup
from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
from devito_fwi_tpu.misfit import least_square, qWasserstein

_fetch = jax.jit(lambda x: jnp.asarray(x).ravel()[0])


def sync(x):
    return float(_fetch(x))


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


class Args:
    bathy = 1
    filter = 0
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "model_data")


def main():
    variants = sys.argv[1:] or ["16:64", "32:64", "64:64", "32:48"]
    models, geoms, vps, bathy_mask = setup(SMARMN, Args(), 29)
    geometry1, geometry0, geometry2 = geoms
    print("modeling obs/dw...")
    obs = fm_multi(geometry1, save=False)
    dw = fm_multi(geometry2, save=False)

    def l2_obj():
        f, _, _ = fwi_obj_multi(geometry0, obs, least_square, dw,
                                bathy_mask, True, calc_grad=True)
        return jnp.float32(f)

    l2_obj()
    t_l2 = best_of(l2_obj, 3)
    print(f"L2 objective (grad):  {t_l2:.3f} s")

    w2 = qWasserstein(trans_type="linear", method="2d",
                      gamma=1.01, num_steps=15,
                      step_scale=SMARMN.w2_step_scale, bfm_backend="jax")

    def w2_obj():
        f, _, _ = fwi_obj_multi(geometry0, obs, w2, dw, bathy_mask, True,
                                calc_grad=True)
        return jnp.float32(f)

    saved = {k: os.environ.get(k) for k in
             ("DEVITO_FWI_TPU_BFM_ANCHOR_A", "DEVITO_FWI_TPU_BFM_ANCHOR_W")}
    results = {}
    vals = {}
    try:
        for spec in variants + variants[:1]:  # re-run first to check drift
            a, w = spec.split(":")
            os.environ["DEVITO_FWI_TPU_BFM_ANCHOR_A"] = a
            os.environ["DEVITO_FWI_TPU_BFM_ANCHOR_W"] = w
            t0 = time.perf_counter()
            v = sync(w2_obj())
            tc = time.perf_counter() - t0
            t = best_of(w2_obj, 2)
            results.setdefault(spec, []).append(t)
            vals[spec] = v
            print(f"A:W={spec}: {t:.3f} s ({t/t_l2:.1f}x L2; first-call "
                  f"{tc:.0f}s; f={v:.6e})")
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    ref = vals.get(variants[0])
    for spec, v in vals.items():
        rel = abs(v - ref) / max(abs(ref), 1e-30)
        print(f"objective rel-diff {spec} vs {variants[0]}: {rel:.2e}")
    for spec, ts in results.items():
        print(f"best A:W={spec}: {min(ts):.3f} s ({min(ts)/t_l2:.1f}x L2)")


if __name__ == "__main__":
    main()
