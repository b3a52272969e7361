"""Decompose the W2-2d BFM cost on REAL Marmousi residual gathers.

The earlier profiler (tools/profile_w2.py) timed the Legendre/pushforward
components on synthetic inputs whose displacements fall outside the
banded fast paths' certificates — so it reported the slow-path cost and
the split did not add up to the real in-objective time. This one replays
``bfm_jax_batch``'s own loop to iteration 5 on the actual 29-shot
residuals (obs - dw vs syn - dw, linear transform), captures the live
(phi, dual, rho, sigma) state, and times each component ON THAT STATE —
in-band exactly as production sees it.

All timings per CLAUDE.md: chained data-dependently inside one jit,
scalar fetch, best-of-N, one process.
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
from functools import partial

from _marmousi_common import SMARMN, setup
from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi
from devito_fwi_tpu.misfit import least_square, qWasserstein
from devito_fwi_tpu.misfit.w2 import transform_jax
import importlib
B = importlib.import_module("devito_fwi_tpu.misfit.bfm")

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
    return min(ts), out


class Args:
    bathy = 1
    filter = 0
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "model_data")


def run_to_iter(mu, nu, k, step_scale=1.0):
    """Live BFM carry at iteration k via the solver's own return_carry
    hook — the SAME jitted loop production runs (a hand-rolled replay
    here once omitted the adaptive sigma updates and the dead-shot
    guard, so the captured displacements were not the state production
    sees)."""
    _, _, carry, (mun, nun) = B.bfm_jax_batch(
        mu, nu, num_steps=k, step_scale=step_scale, return_carry=True)
    phi, dual, rho, sigma, _ = carry
    n1 = mu.shape[2]
    n2 = mu.shape[1]
    xs = (jnp.arange(n1, dtype=mu.dtype) + 0.5) / n1
    ys = (jnp.arange(n2, dtype=mu.dtype) + 0.5) / n2
    return phi, dual, rho, sigma, mun, nun, xs, ys


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
    f = syn_b - dw_b
    g = obs_b - dw_b
    mu, nu, _ = jax.vmap(lambda a, b: transform_jax(
        a, b, "linear", 1.01))(f, g)
    Bb, n2, n1 = mu.shape
    print(f"real residual gathers: B={Bb} n2={n2} n1={n1}")

    # yardsticks
    def l2_obj():
        fv, _, _ = fwi_obj_multi(geometry0, obs, least_square, dw,
                                 bathy_mask, True, calc_grad=True)
        return jnp.float32(fv)
    t0 = time.perf_counter(); l2_obj()
    print(f"L2 obj compile+run: {time.perf_counter()-t0:.1f}s")
    t_l2, _ = best_of(l2_obj, 3)
    print(f"L2 objective (grad):         {t_l2:.3f} s")

    w2q = qWasserstein(trans_type="linear", method="2d",
                   gamma=1.01, num_steps=SMARMN.w2_num_steps,
                      step_scale=SMARMN.w2_step_scale, bfm_backend="jax")
    def w2_obj():
        fv, _, _ = fwi_obj_multi(geometry0, obs, w2q, dw, bathy_mask, True,
                                 calc_grad=True)
        return jnp.float32(fv)
    t0 = time.perf_counter(); w2_obj()
    print(f"W2 obj compile+run: {time.perf_counter()-t0:.1f}s")
    t_w2, _ = best_of(w2_obj, 2)
    print(f"W2-2d objective (grad):      {t_w2:.3f} s   ({t_w2/t_l2:.1f}x L2)")

    nst = SMARMN.w2_num_steps
    bfb = jax.jit(lambda a, b: jnp.sum(B.bfm_jax_batch(
        a, b, num_steps=nst, step_scale=1.0)[0]))
    t0 = time.perf_counter(); sync(bfb(mu, nu))
    print(f"bfm compile+run: {time.perf_counter()-t0:.1f}s")
    t_bfm, _ = best_of(lambda: bfb(mu, nu), 3)
    print(f"bfm_jax_batch ({nst} iters):    {t_bfm:.3f} s")

    # live state at iteration 5
    phi, dual, rho, sigma, mun, nun, xs, ys = jax.block_until_ready(
        run_to_iter(mu, nu, 5))
    print("captured live carry at iter 5")

    # component: one legendre_2d on the live phi, x20 chained
    @jax.jit
    def leg20(u):
        def body(c, _):
            out = B._legendre_2d(c, xs, ys, 32_000_000)
            return 0.5 * c + 0.5 * out, None   # keep it live & in-band
        c, _ = jax.lax.scan(body, u, None, length=20)
        return jnp.sum(c)
    t, _ = best_of(lambda: leg20(phi), 3)
    print(f"legendre_2d (live phi) x20:  {t:.3f} s  ({t/20*1e3:.1f} ms/call;"
          f" {4*nst} calls/bfm -> {4*nst/20*t:.2f} s)")

    # banded disabled, same input
    @jax.jit
    def leg20_full(u):
        def body(c, _):
            out = B._legendre_2d(c, xs, ys, 32_000_000, banded=False)
            return 0.5 * c + 0.5 * out, None
        c, _ = jax.lax.scan(body, u, None, length=20)
        return jnp.sum(c)
    t, _ = best_of(lambda: leg20_full(phi), 3)
    print(f"  (banded disabled) x20:     {t:.3f} s  ({t/20*1e3:.1f} ms/call)")

    # anchored block-banded mode + its certificates on the live state
    @jax.jit
    def leg20_anchor(u):
        def body(c, _):
            out = B._legendre_2d(c, xs, ys, 32_000_000, banded="anchor")
            return 0.5 * c + 0.5 * out, None
        c, _ = jax.lax.scan(body, u, None, length=20)
        return jnp.sum(c)
    t, _ = best_of(lambda: leg20_anchor(phi), 3)
    print(f"  (anchor mode) x20:         {t:.3f} s  ({t/20*1e3:.1f} ms/call)")

    @jax.jit
    def anchor_ok(u):
        _, ok1 = B._legendre_last_anchored(u, xs, A=8, Wside=32)
        a = B._legendre_last(u, xs, 32_000_000)
        _, ok2 = B._legendre_last_anchored(
            -jnp.swapaxes(a, -1, -2), ys, A=16, Wside=64)
        return jnp.stack([ok1, ok2])
    oks = np.asarray(anchor_ok(phi))
    oks2 = np.asarray(anchor_ok(dual))
    print(f"  anchor certificates (live phi): jx={bool(oks[0])} "
          f"jy={bool(oks[1])}; (live dual): jx={bool(oks2[0])} "
          f"jy={bool(oks2[1])}")

    # component: one pushforward on the live (nu, phi), x10 chained
    @jax.jit
    def push10(dens, pot):
        def body(c, _):
            xm, ym = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(c)
            r = B._sampling_pushforward_batch(dens, xm, ym, n1, n2, 2, 127)
            return c + 1e-7 * r, None
        c, _ = jax.lax.scan(body, pot, None, length=10)
        return jnp.sum(c)
    t, _ = best_of(lambda: push10(nun, phi), 3)
    print(f"pushforward (live) x10:      {t:.3f} s  ({t/10*1e3:.1f} ms/call;"
          f" {2*nst} calls/bfm -> {2*nst/10*t:.2f} s)")

    # fold A/B: vectorized diagonal-fold overlap-add vs the serial
    # fori_loop of dynamic_update_slices (push_backend is a call-time
    # static, so both variants get their own trace in this process)
    @partial(jax.jit, static_argnames=("pb",))
    def push10_pb(dens, pot, pb):
        def body(c, _):
            xm, ym = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(c)
            r = B._sampling_pushforward_batch(dens, xm, ym, n1, n2, 2, 127,
                                              push_backend=pb)
            return c + 1e-7 * r, None
        c, _ = jax.lax.scan(body, pot, None, length=10)
        return jnp.sum(c)
    for pb in ("pallas", "pallas-vecfold"):
        t, _ = best_of(lambda: push10_pb(nun, phi, pb), 3)
        print(f"  push [{pb:15s}] x10:  {t:.3f} s  ({t/10*1e3:.1f} ms/call)")

    # component: one H^-1 update (DCT poisson), x20 chained
    kx = 2.0 * n1 * n1 * (1 - jnp.cos(jnp.pi * jnp.arange(n1) / n1))
    ky = 2.0 * n2 * n2 * (1 - jnp.cos(jnp.pi * jnp.arange(n2) / n2))
    kern = (kx[None, :] + ky[:, None]).at[0, 0].set(1.0)

    def _dctm(n):
        kk = jnp.arange(n, dtype=jnp.float32)[:, None]
        i = jnp.arange(n, dtype=jnp.float32)[None, :]
        C = jnp.sqrt(2.0 / n) * jnp.cos(jnp.pi * (i + 0.5) * kk / n)
        return C.at[0].mul(jnp.sqrt(0.5))
    C1, C2 = _dctm(n1), _dctm(n2)
    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def upd20(r_b):
        def body(c, _):
            w = jnp.einsum("ij,bjk,lk->bil", C2, c, C1, precision=hp) / kern
            w = w.at[:, 0, 0].set(0.0)
            w = jnp.einsum("ji,bjk,kl->bil", C2, w, C1, precision=hp)
            return c + 1e-7 * w, None
        c, _ = jax.lax.scan(body, r_b, None, length=20)
        return jnp.sum(c)
    t, _ = best_of(lambda: upd20(rho), 3)
    print(f"dct_poisson x20:             {t:.3f} s  ({t/20*1e3:.1f} ms/call;"
          f" {2*nst} calls/bfm -> {2*nst/20*t:.2f} s)")


if __name__ == "__main__":
    main()
