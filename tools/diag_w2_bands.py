"""Record the pushforward displacement bands the real Marmousi W2-2d
workload exercises, per BFM iteration, on the TPU chip.

Replays the bfm_jax_batch loop on the actual 29-shot residual gathers
(smooth_20 init vs true obs, direct wave subtracted, linear transform)
and reports min/max dy and dx of massive subsamples at each pushforward —
i.e. which tier of the banded dispatch each call takes. All stats are
computed on device; only scalars are fetched.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "drivers"))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from _marmousi_common import SMARMN, setup
from devito_fwi_tpu.fwi import fm_multi
from devito_fwi_tpu.misfit.w2 import transform_jax
import importlib
B = importlib.import_module("devito_fwi_tpu.misfit.bfm")


class Args:
    bathy = 1
    filter = 0
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "model_data")


def _band_stats(subs, n1, n2):
    xI, xO, _, yI, yO, _, mass = subs
    c = jnp.arange(n1).reshape(1, 1, 1, n1)
    r = jnp.arange(n2).reshape(1, 1, n2, 1)
    act = mass > 0
    z = jnp.int32(0)
    return jnp.stack([
        jnp.min(jnp.where(act, yI - r, z)), jnp.max(jnp.where(act, yO - r, z)),
        jnp.min(jnp.where(act, xI - c, z)), jnp.max(jnp.where(act, xO - c, z))])


@partial(jax.jit, static_argnames=("num_steps",))
def band_trace(mu, nu, num_steps=10, step_scale=1.0):
    dtype = mu.dtype
    Bb, n2, n1 = mu.shape
    pcount = n1 * n2
    psum = lambda x: jnp.sum(x, axis=(-2, -1))
    sum1 = psum(mu)[:, None, None] / pcount
    sum2 = psum(nu)[:, None, None] / pcount
    mu = jnp.where(sum1 > 0, mu / sum1, 0.0)
    nu = jnp.where(sum2 > 0, nu / sum2, 0.0)
    sigma0 = step_scale / jnp.maximum(jnp.max(mu, axis=(1, 2)),
                                      jnp.max(nu, axis=(1, 2)))
    xs = (jnp.arange(n1, dtype=dtype) + 0.5) / n1
    ys = (jnp.arange(n2, dtype=dtype) + 0.5) / n2
    quad = 0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)
    quad_b = jnp.broadcast_to(quad, (Bb, n2, n1))
    kx = 2.0 * n1 * n1 * (1 - jnp.cos(jnp.pi * jnp.arange(n1) / n1))
    ky = 2.0 * n2 * n2 * (1 - jnp.cos(jnp.pi * jnp.arange(n2) / n2))
    kernel = (kx[None, :] + ky[:, None]).at[0, 0].set(1.0).astype(dtype)

    def _dctm(n):
        k = jnp.arange(n, dtype=dtype)[:, None]
        i = jnp.arange(n, dtype=dtype)[None, :]
        C = jnp.sqrt(2.0 / n) * jnp.cos(jnp.pi * (i + 0.5) * k / n)
        return C.at[0].mul(jnp.sqrt(0.5))
    C1, C2 = _dctm(n1), _dctm(n2)
    hp = jax.lax.Precision.HIGHEST
    dct2 = lambda a: jnp.einsum("ij,bjk,lk->bil", C2, a, C1, precision=hp)
    idct2 = lambda a: jnp.einsum("ji,bjk,kl->bil", C2, a, C1, precision=hp)

    def upd(phi, rho, target, sigma):
        r = rho - target
        w = dct2(r) / kernel
        w = w.at[:, 0, 0].set(0.0)
        w = idct2(w)
        return phi + sigma[:, None, None] * w

    leg = lambda u: B._legendre_2d(u, xs, ys, 32_000_000)

    def push_stats(dens, potential):
        xm, ym = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(potential)
        out = jax.vmap(lambda m, a, b: B._pushforward_subsamples(
            m, a, b, n1, n2, 2))(dens, xm, ym)
        subs = out[:7]
        st = _band_stats(subs, n1, n2)
        rho = B._sampling_pushforward_batch(dens, xm, ym, n1, n2, 2, 127)
        return rho, st

    def body(carry, _):
        phi, dual, rho, sigma = carry
        phi = upd(phi, rho, nu, sigma)
        dual = leg(phi)
        phi = leg(dual)
        rho, st1 = push_stats(nu, phi)
        dual = upd(dual, rho, mu, sigma)
        phi = leg(dual)
        dual = leg(phi)
        rho, st2 = push_stats(mu, dual)
        return (phi, dual, rho, sigma), jnp.stack([st1, st2])

    init = (quad_b, quad_b, mu, sigma0.astype(dtype))
    _, stats = jax.lax.scan(body, init, None, length=num_steps)
    return stats  # (num_steps, 2, 4)


def main():
    models, geoms, vps, bathy_mask = setup(SMARMN, Args(), 29)
    geometry1, geometry0, geometry2 = geoms
    print("modeling obs/syn...")
    obs = fm_multi(geometry1, save=False)
    dw = fm_multi(geometry2, save=False)
    syn = fm_multi(geometry0, save=False)
    obs_b = jnp.stack([jnp.asarray(o.data) for o in obs])
    dw_b = jnp.stack([jnp.asarray(o.data) for o in dw])
    syn_b = jnp.stack([jnp.asarray(o.data) for o in syn])
    f_b = syn_b - dw_b
    g_b = obs_b - dw_b
    mus, nus, _ = jax.vmap(
        lambda f, g: transform_jax(f, g, "linear", 1.01))(f_b, g_b)
    stats = np.asarray(band_trace(mus, nus, num_steps=10,
                                  step_scale=SMARMN.w2_step_scale))
    print("   iter  half   dy_min  dy_max  dx_min  dx_max   tier")
    for it in range(stats.shape[0]):
        for h in range(2):
            dy0, dy1, dx0, dx1 = stats[it, h]
            dy = max(-dy0, dy1 - 1)
            dx = max(-dx0, dx1 - 1)
            tier = next((t for t in (7, 31, 127) if dy <= t and dx <= 7),
                        "scatter")
            print(f"   {it:4d}  {h}     {dy0:6d} {dy1:6d} {dx0:7d} {dx1:7d}"
                  f"   {tier}")


if __name__ == "__main__":
    main()
