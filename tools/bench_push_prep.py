"""One-process A/B of the Pallas pushforward PREP layout on the live
29-shot SMARMN W2 gradient objective: "nat" (natural-layout planes,
BlockSpec index maps do the blocking) vs "blocked" (the original six
host-side pad/moveaxis/swapaxes re-layouts, measured ~60 ms of a
~63 ms pushforward call — tools/bench_push_fold.py).

Both variants run push=pallas leg=anchor (the production defaults);
the env toggle retraces via bfm.resolve_backends' backend key.
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

    _env_keys = ("DEVITO_FWI_TPU_BFM_PUSH", "DEVITO_FWI_TPU_BFM_LEGENDRE",
                 "DEVITO_FWI_TPU_BFM_PREP")
    _env_saved = {k: os.environ.get(k) for k in _env_keys}
    results = {}
    vals = {}
    try:
        os.environ["DEVITO_FWI_TPU_BFM_PUSH"] = "pallas"
        os.environ["DEVITO_FWI_TPU_BFM_LEGENDRE"] = "anchor"
        for prep in ("blocked", "nat", "blocked", "nat"):
            os.environ["DEVITO_FWI_TPU_BFM_PREP"] = prep
            jax.clear_caches()
            t0 = time.perf_counter()
            v = sync(w2_obj())
            tc = time.perf_counter() - t0
            t = best_of(w2_obj, 2)
            results.setdefault(prep, []).append(t)
            vals[prep] = v
            print(f"prep={prep}: {t:.3f} s ({t/t_l2:.1f}x L2; "
                  f"compile {tc:.0f}s; f={v:.6e})")
    finally:
        for k, v in _env_saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    if len(vals) == 2:
        rel = abs(vals["nat"] - vals["blocked"]) / max(
            abs(vals["blocked"]), 1e-30)
        print(f"objective value rel diff nat-vs-blocked: {rel:.2e}")
    for prep, ts in results.items():
        print(f"best prep={prep}: {min(ts):.3f} s ({min(ts)/t_l2:.1f}x L2)")


if __name__ == "__main__":
    main()
