"""One-process A/B of the W2-2d objective with and without calc_grad
(the line-search objective) across Legendre modes — the demo re-run
slowed 4x after the anchor default flip even though the calc_grad=True
A/B (tools/bench_w2_variants.py) showed anchor 1.7x faster, so measure
BOTH traces per mode, with per-trace compile times."""
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
        sync(fn())
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
    print("modeling obs/dw...", flush=True)
    obs = fm_multi(geometry1, save=False)
    dw = fm_multi(geometry2, save=False)

    w2 = qWasserstein(trans_type="linear", method="2d",
                      gamma=1.01, num_steps=15,
                      step_scale=SMARMN.w2_step_scale, bfm_backend="jax")

    def w2_obj(calc_grad):
        f, _, _ = fwi_obj_multi(geometry0, obs, w2, dw, bathy_mask, True,
                                calc_grad=calc_grad)
        return jnp.float32(f)

    for leg in ("anchor", "full"):
        os.environ["DEVITO_FWI_TPU_BFM_LEGENDRE"] = leg
        jax.clear_caches()
        for cg in (True, False):
            t0 = time.perf_counter()
            w2_obj(cg)
            tc = time.perf_counter() - t0
            t = best_of(lambda: w2_obj(cg), 2)
            print(f"leg={leg} calc_grad={cg}: {t:.3f} s "
                  f"(compile {tc:.0f}s)", flush=True)
    os.environ.pop("DEVITO_FWI_TPU_BFM_LEGENDRE", None)


if __name__ == "__main__":
    main()
