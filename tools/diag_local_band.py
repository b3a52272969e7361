"""Diagnose the local-base banded pushforward on live Marmousi W2 state:
is the predicate passing, what are the per-block local dy ranges, and
how fast is the banded kernel itself vs the scatter on the same subs?"""
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
from tools.profile_w2_components import run_to_iter, best_of, sync, Args


def main():
    models, geoms, vps, bathy_mask = setup(SMARMN, Args(), 29)
    geometry1, geometry0, geometry2 = geoms
    print("modeling obs/syn/dw...")
    obs = fm_multi(geometry1, save=False)
    dw = fm_multi(geometry2, save=False)
    syn = fm_multi(geometry0, save=False)
    f = jnp.stack([jnp.asarray(o.data) for o in syn]) - \
        jnp.stack([jnp.asarray(o.data) for o in dw])
    g = jnp.stack([jnp.asarray(o.data) for o in obs]) - \
        jnp.stack([jnp.asarray(o.data) for o in dw])
    mu, nu, _ = jax.vmap(lambda a, b: transform_jax(
        a, b, "linear", 1.01))(f, g)
    Bb, n2, n1 = mu.shape

    phi, dual, rho, sigma, mun, nun, xs, ys = jax.block_until_ready(
        run_to_iter(mu, nu, 5))

    @jax.jit
    def subs_of(dens, pot):
        xm, ym = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(pot)
        out = jax.vmap(lambda m, a, b: B._pushforward_subsamples(
            m, a, b, n1, n2, 2))(dens, xm, ym)
        return out[:7]

    subs = jax.block_until_ready(subs_of(nun, phi))

    # predicate + local range stats
    @jax.jit
    def stats(subs):
        _, _, _, yI, yO, _, mass = subs
        Bq, Q, n2s, n1s = mass.shape
        R = 32
        n2p = -(-n2s // R) * R
        act = mass > 0
        r = jnp.arange(n2s).reshape(1, 1, n2s, 1)
        dyI = jnp.where(act, yI - r, 128)
        dyO = jnp.where(act, yO - r, -128)

        def blocks(a, fill):
            a = jnp.pad(a, ((0, 0), (0, 0), (0, n2p - n2s), (0, 0)),
                        constant_values=fill)
            return jnp.moveaxis(a, 1, 2).reshape(Bq, n2p // R, R, Q, n1s)

        lo = jnp.min(blocks(dyI, 128), axis=(2, 3, 4))
        hi = jnp.max(blocks(dyO, -128), axis=(2, 3, 4))
        width = jnp.where(lo == 128, 0, hi - lo)
        return (jnp.max(width), jnp.mean(width.astype(jnp.float32)),
                jnp.sum(width > 23), width.size,
                B._local_band_ok(subs, 24, 7, 128),
                B._dx_inband_predicate(subs, 7))

    w_max, w_mean, n_over, n_tot, ok, dxok = [np.asarray(v)
                                              for v in stats(subs)]
    print(f"local dy width: max={w_max} mean={w_mean:.2f} "
          f"over-23: {n_over}/{n_tot}  local_ok={ok} dx_ok={dxok}")

    # raw kernel timings on the same subs
    for name, fn in (
        ("local-banded G=24", lambda s: B._local_banded_pushforward_batch(
            s, n1, n2, 24, 7, 128)),
        ("local-banded G=40", lambda s: B._local_banded_pushforward_batch(
            s, n1, n2, 40, 7, 128)),
        ("scatter", lambda s: B._scatter_pushforward_batch(s, n1, n2)),
    ):
        jf = jax.jit(lambda s: jnp.sum(fn(s)))
        t0 = time.perf_counter(); sync(jf(subs))
        tc = time.perf_counter() - t0
        t, _ = best_of(lambda: jf(subs), 3)
        print(f"{name}: {t*1e3:8.1f} ms/call  (compile {tc:.0f}s)")


if __name__ == "__main__":
    main()
