"""Decompose the W2-2d (BFM) objective cost on the real TPU chip.

Times, in ONE process (tunnel spread ~20%% across processes):
  1. L2 fused objective (calc_grad=True), Marmousi 29 shots  [the yardstick]
  2. W2-2d jax objective (calc_grad=True) — batch-native BFM path
  3. bfm_jax_batch alone at B=29
  4. banded pushforward alone (20 chained calls = one BFM's worth)
  5. _legendre_2d alone (40 chained = one BFM's worth)
  6. dct2/idct2 alone

All timings follow CLAUDE.md rules: chain data-dependently inside one jit,
fetch a scalar via a tiny jit, subtract dispatch latency, best of N.
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
import importlib
bfm_mod = importlib.import_module("devito_fwi_tpu.misfit.bfm")

_fetch = jax.jit(lambda x: jnp.asarray(x).ravel()[0])


def sync(x):
    return float(_fetch(x))


def dispatch_latency():
    a = jnp.ones((8,))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        sync(a)
        ts.append(time.perf_counter() - t0)
    return min(ts)


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


def main():
    lat = dispatch_latency()
    print(f"dispatch+fetch latency: {lat*1e3:.1f} ms")

    models, geoms, vps, bathy_mask = setup(SMARMN, Args(), 29)
    geometry1, geometry0, geometry2 = geoms
    print("modeling obs...")
    obs = fm_multi(geometry1, save=False)
    dw = fm_multi(geometry2, save=False)
    nt, nrec = obs[0].data.shape
    print(f"gather: nt={nt} nrec={nrec} nsrc={len(obs)}")

    # --- 1. L2 objective -------------------------------------------------
    def l2_obj():
        f, g, r = fwi_obj_multi(geometry0, obs, least_square, dw,
                                bathy_mask, True, calc_grad=True)
        return jnp.float32(f)
    t0 = time.perf_counter(); l2_obj(); print(f"L2 obj compile+run: {time.perf_counter()-t0:.1f}s")
    t_l2, _ = best_of(l2_obj, 3)
    print(f"L2 objective (grad):      {t_l2:.3f} s")

    # --- 2. W2-2d jax objective (batch-native BFM) ------------------------
    w2 = qWasserstein(trans_type="linear", method="2d", num_steps=10,
                      step_scale=SMARMN.w2_step_scale, bfm_backend="jax")
    def w2_obj():
        f, g, r = fwi_obj_multi(geometry0, obs, w2, dw, bathy_mask, True,
                                calc_grad=True)
        return jnp.float32(f)
    t0 = time.perf_counter(); w2_obj(); print(f"W2 obj compile+run: {time.perf_counter()-t0:.1f}s")
    t_w2, _ = best_of(w2_obj, 2)
    print(f"W2-2d objective (grad):   {t_w2:.3f} s   ({t_w2/t_l2:.1f}x L2)")

    # --- 3. bfm_jax_batch alone at full width -----------------------------
    obs_stack = jnp.stack([jnp.asarray(o.data) for o in obs])
    dw_stack = jnp.stack([jnp.asarray(o.data) for o in dw])
    syn = obs_stack * 1.01 - dw_stack
    ref = obs_stack - dw_stack
    mn = jnp.minimum(syn.min(axis=(1, 2)), ref.min(axis=(1, 2)))
    mu_b = syn - mn[:, None, None] + 1e-3
    nu_b = ref - mn[:, None, None] + 1e-3
    B = mu_b.shape[0]

    bfb = jax.jit(lambda a, b: jnp.sum(bfm_mod.bfm_jax_batch(
        a, b, num_steps=10, step_scale=1.0)[0]))
    t0 = time.perf_counter()
    sync(bfb(mu_b, nu_b))
    print(f"bfm_jax_batch B={B} compile+run: {time.perf_counter()-t0:.1f}s")
    t_bfm, _ = best_of(lambda: bfb(mu_b, nu_b), 3)
    print(f"bfm_jax_batch B={B}:       {t_bfm:.3f} s")

    # --- 4/5/6. component benches at full width ---------------------------
    n2, n1 = nt, nrec
    xs = (jnp.arange(n1, dtype=jnp.float32) + 0.5) / n1
    ys = (jnp.arange(n2, dtype=jnp.float32) + 0.5) / n2
    quad = 0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)
    dual0 = jnp.broadcast_to(quad, (B, n2, n1)) + 0.01 * mu_b

    # batch pushforward (banded fast path): 20 chained = one BFM's worth
    @jax.jit
    def push20(mu_b, dual_b):
        def body(c, _):
            xm, ym = jax.vmap(
                lambda p: bfm_mod._pushforward_map(p, n1, n2))(c)
            rho = bfm_mod._sampling_pushforward_batch(mu_b, xm, ym, n1, n2,
                                                      2, 31)
            return c + 1e-6 * rho, None
        c, _ = jax.lax.scan(body, dual_b, None, length=20)
        return jnp.sum(c)

    t, _ = best_of(lambda: push20(mu_b, dual0), 3)
    print(f"batch pushforward x20:     {t:.3f} s "
          f"({t/20*1e3:.1f} ms/call for the whole batch)")

    # legendre: 40 1-D-pair calls (4 _legendre_2d per iter x 10)
    @jax.jit
    def leg40(u_b):
        def body(c, _):
            out = bfm_mod._legendre_2d(c, xs, ys, 32_000_000)
            return 1e-6 * out + c, None
        c, _ = jax.lax.scan(body, u_b, None, length=40)
        return jnp.sum(c)
    t, _ = best_of(lambda: leg40(dual0), 3)
    print(f"legendre_2d x40 B={B}:     {t:.3f} s")

    # dct poisson step: 20 update_potential-equivalents
    def _dct_mat(n):
        k = jnp.arange(n, dtype=jnp.float32)[:, None]
        i = jnp.arange(n, dtype=jnp.float32)[None, :]
        C = jnp.sqrt(2.0 / n) * jnp.cos(jnp.pi * (i + 0.5) * k / n)
        return C.at[0].mul(jnp.sqrt(0.5))
    C1, C2 = _dct_mat(n1), _dct_mat(n2)
    kx = 2.0 * n1 * n1 * (1 - jnp.cos(jnp.pi * jnp.arange(n1) / n1))
    ky = 2.0 * n2 * n2 * (1 - jnp.cos(jnp.pi * jnp.arange(n2) / n2))
    kern = (kx[None, :] + ky[:, None]).at[0, 0].set(1.0)

    def upd(r):
        w = jnp.matmul(C2, r, precision="highest")
        w = jnp.matmul(w, C1.T, precision="highest") / kern
        w = w.at[0, 0].set(0.0)
        w = jnp.matmul(C2.T, w, precision="highest")
        return jnp.matmul(w, C1, precision="highest")

    @jax.jit
    def dct20(r_b):
        def body(c, _):
            return jax.vmap(upd)(c) * 1e-3 + c, None
        c, _ = jax.lax.scan(body, r_b, None, length=20)
        return jnp.sum(c)
    t, _ = best_of(lambda: dct20(mu_b), 3)
    print(f"dct_poisson x20 B={B}:     {t:.3f} s")


if __name__ == "__main__":
    main()
