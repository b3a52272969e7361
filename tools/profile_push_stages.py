"""Stage-wise decomposition of the live W2 pushforward call.

profile_w2_components measured the WHOLE pushforward at ~46 ms/call on
the live 29-shot state while its parts look like ~10 ms of traffic and
a ~3 ms kernel. This times each stage separately ON THE LIVE CARRY:
(1) the central-difference map, (2) the lo-pass subsample planes,
(3) the hi-mask, (4) the full _dispatch_push on precomputed subs,
(5) pushforward_slabs_nat alone on fully prepped planes (kernel), and
(6) the fold, to locate the missing milliseconds.
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
from devito_fwi_tpu.fwi import fm_multi
from devito_fwi_tpu.misfit.w2 import transform_jax
import importlib
B = importlib.import_module("devito_fwi_tpu.misfit.bfm")

_fetch = jax.jit(lambda x: jnp.asarray(x).ravel()[0])


def sync(x):
    return float(_fetch(x))


def best_of(fn, n=5):
    sync(fn())
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
    print("modeling obs/syn/dw...")
    obs = fm_multi(geometry1, save=False)
    dw = fm_multi(geometry2, save=False)
    syn = fm_multi(geometry0, save=False)
    obs_b = jnp.stack([jnp.asarray(o.data) for o in obs])
    dw_b = jnp.stack([jnp.asarray(o.data) for o in dw])
    syn_b = jnp.stack([jnp.asarray(o.data) for o in syn])
    mu, nu, _ = jax.vmap(lambda a, b: transform_jax(
        a, b, "linear", 1.01))(syn_b - dw_b, obs_b - dw_b)
    Bb, n2, n1 = mu.shape
    print(f"B={Bb} n2={n2} n1={n1}")
    _, _, carry, (mun, nun) = B.bfm_jax_batch(
        mu, nu, num_steps=5, step_scale=SMARMN.w2_step_scale,
        return_carry=True)
    phi = jax.block_until_ready(carry[0])
    print("captured live carry at iter 5")
    dmax = 127

    # stage 1: map
    map_j = jax.jit(lambda p: jax.vmap(
        lambda q: B._pushforward_map(q, n1, n2))(p))
    xm, ym = jax.block_until_ready(map_j(phi))
    t = best_of(lambda: map_j(phi)[0])
    print(f"1. map:                 {t*1e3:7.1f} ms")

    # stage 2: lo-pass subsample planes (incl. hi-mask inputs)
    @jax.jit
    def subs_lo(m, x, y):
        hi = jax.vmap(lambda a, b: B._adaptive_hi_mask(a, b, n1, n2))(x, y)
        out = jax.vmap(lambda mm, xx, yy, hh: B._pushforward_subsamples(
            mm, xx, yy, n1, n2, 2, level_mask=~hh))(m, x, y, hi)
        return out
    subs = jax.block_until_ready(subs_lo(nun, xm, ym))
    t = best_of(lambda: subs_lo(nun, xm, ym)[6])
    print(f"2. subsample planes:    {t*1e3:7.1f} ms")

    # stage 3: dispatch (prep + kernel + fold) on PRECOMPUTED subs
    disp = jax.jit(lambda s: B._dispatch_push(tuple(s[:7]), n1, n2, dmax))
    t = best_of(lambda: disp(subs))
    print(f"3. dispatch_push:       {t*1e3:7.1f} ms")

    # stage 4: _pallas_push prep+kernel+fold explicitly (nat prep)
    pp = jax.jit(lambda s: B._pallas_push(tuple(s[:7]), n1, n2, G=24,
                                          dxmax=7, margin=128, R=16))
    t = best_of(lambda: pp(subs))
    print(f"4. _pallas_push (all):  {t*1e3:7.1f} ms")

    # stage 5: whole pushforward for reference
    @jax.jit
    def whole(m, p):
        x2, y2 = jax.vmap(lambda q: B._pushforward_map(q, n1, n2))(p)
        return B._sampling_pushforward_batch(m, x2, y2, n1, n2, 2, dmax)
    t = best_of(lambda: whole(nun, phi))
    print(f"5. whole pushforward:   {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
