"""End-to-end W2-2d objective timings for each BFM backend combination,
in one process (tunnel cross-process spread ~20%).

Variants are selected via the DEVITO_FWI_TPU_BFM_* env vars, which the
dispatch reads at TRACE time — ``jax.clear_caches()`` between variants
forces a retrace. Prints the per-variant objective seconds and the
ratio to the L2 yardstick; run after any BFM kernel change to decide
the production defaults.
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

    # production SMARMN config (gamma=1.01, num_steps=15 — this tool
    # picks the production defaults, so it must measure them)
    w2 = qWasserstein(trans_type="linear", method="2d",
                      gamma=1.01, num_steps=15,
                      step_scale=SMARMN.w2_step_scale, bfm_backend="jax")

    def w2_obj():
        f, _, _ = fwi_obj_multi(geometry0, obs, w2, dw, bathy_mask, True,
                                calc_grad=True)
        return jnp.float32(f)

    # every variant sets BOTH env vars explicitly — the in-repo defaults
    # have changed across rounds (push defaults to "pallas" on TPU now),
    # so an empty env would silently re-measure the default
    variants = [
        ("push=pallas leg=full", {"DEVITO_FWI_TPU_BFM_PUSH": "pallas",
                                  "DEVITO_FWI_TPU_BFM_LEGENDRE": "full"}),
        ("push=pallas leg=anchor", {"DEVITO_FWI_TPU_BFM_PUSH": "pallas",
                                    "DEVITO_FWI_TPU_BFM_LEGENDRE":
                                    "anchor"}),
        ("push=xla leg=full", {"DEVITO_FWI_TPU_BFM_PUSH": "xla",
                               "DEVITO_FWI_TPU_BFM_LEGENDRE": "full"}),
        ("push=xla leg=anchor", {"DEVITO_FWI_TPU_BFM_PUSH": "xla",
                                 "DEVITO_FWI_TPU_BFM_LEGENDRE": "anchor"}),
        ("push=pallas leg=banded", {"DEVITO_FWI_TPU_BFM_PUSH": "pallas",
                                    "DEVITO_FWI_TPU_BFM_LEGENDRE":
                                    "banded"}),
    ]
    results = {}
    for name, env in variants:
        for k in ("DEVITO_FWI_TPU_BFM_PUSH", "DEVITO_FWI_TPU_BFM_LEGENDRE"):
            os.environ.pop(k, None)
        os.environ.update(env)
        jax.clear_caches()
        t0 = time.perf_counter()
        try:
            w2_obj()
        except Exception as e:
            print(f"{name}: FAILED {repr(e)[:120]}")
            continue
        tc = time.perf_counter() - t0
        t = best_of(w2_obj, 2)
        results[name] = t
        print(f"{name}: {t:.3f} s  ({t/t_l2:.1f}x L2; compile {tc:.0f}s)")
    for k in ("DEVITO_FWI_TPU_BFM_PUSH", "DEVITO_FWI_TPU_BFM_LEGENDRE"):
        os.environ.pop(k, None)
    if results:
        bestn = min(results, key=results.get)
        print(f"best: {bestn} at {results[bestn]:.3f} s "
              f"({results[bestn]/t_l2:.1f}x L2)")


if __name__ == "__main__":
    main()
