"""One-process A/B of pushforward slab FOLD variants on the live state.

The Pallas slab kernel itself is ~3 ms/call (tools/bench_push_kb.py);
the rest of a ~50 ms `_pallas_push` call is prep (6 plane re-layouts)
and the overlap-add fold — the current fold is a fori_loop of B*nblk
(~2465 on the 29-shot bench) sequential (R+G, lanes)
dynamic_update_slices. Candidates measured here, all verified to
produce identical sums to the production fold on the live state:

  loop    — production fori over B*nblk single-block updates
  rowscat — ONE scatter-add of all (B, nblk, R+G) rows at computed
            row indices (update_window_dims over lanes)
  jloop   — fori over nblk only; each step scatter-adds the (B, R+G)
            rows of one block column across all shots
  none    — prep+kernel only (fold skipped; lower bound)

Timings per CLAUDE.md: one process, chained in-band, scalar fetch,
best-of-N.
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

import importlib
B = importlib.import_module("devito_fwi_tpu.misfit.bfm")
from devito_fwi_tpu.ops import pallas_bfm as _pb

_fetch = jax.jit(lambda x: jnp.asarray(x).ravel()[0])


def sync(x):
    return float(_fetch(x))


def best_of(fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def _prep_planes(subs, n1, n2, G, dxmax, margin, R):
    """The layout half of ``bfm._pallas_push`` (everything before the
    pallas_call), returning the kernel operands + runtime bases."""
    xI, xO, xf, yI, yO, yf, mass = subs
    Bb, Q, n2s, n1s = mass.shape
    lanes = -(-(n1s + dxmax) // 128) * 128
    nblk = -(-n2s // R)
    n2p = nblk * R
    dtype = mass.dtype
    pad = ((0, 0), (0, 0), (0, n2p - n2s), (0, lanes - n1s))
    r = jnp.arange(n2s).reshape(1, 1, n2s, 1)
    c = jnp.arange(n1s).reshape(1, 1, 1, n1s)
    act = mass > 0
    dy = jnp.where(act, yI - r, margin)
    yclip = yO == yI
    wy0 = jnp.where(yclip, mass, (1 - yf) * mass)
    wy1 = jnp.where(yclip, 0.0, yf * mass)
    xclip = xO == xI
    wx0 = jnp.where(xclip, jnp.ones((), dtype), (1 - xf))
    wx1 = jnp.where(xclip, 0.0, xf)
    dxr = jnp.clip(xI - c + dxmax, 0, 2 * dxmax + 1)

    def prep(a, fill=0):
        a = jnp.pad(a, pad, constant_values=fill)
        a = jnp.moveaxis(a, 1, 2).reshape(Bb, nblk, R, Q, lanes)
        return jnp.swapaxes(a, 2, 3)

    dy_b = prep(dy, margin)
    bases = jnp.min(dy_b.reshape(Bb, nblk, -1), axis=-1)
    bases = jnp.clip(jnp.where(bases == margin, 0, bases),
                     -margin, margin - G)
    rel = (dy_b - bases[:, :, None, None, None]).astype(jnp.int32)
    return (rel, prep(dxr).astype(jnp.int32), prep(wy0).astype(dtype),
            prep(wy1).astype(dtype), prep(wx0, 1).astype(dtype),
            prep(wx1).astype(dtype)), bases, lanes, nblk, n2p


def _slabs(subs, n1, n2, G, dxmax, margin, R):
    ops, bases, lanes, nblk, n2p = _prep_planes(subs, n1, n2, G, dxmax,
                                                margin, R)
    slabs = _pb.pushforward_slabs(*ops, G=G, dxmax=dxmax, R=R,
                                  interpret=_pb.env_interpret())
    return slabs, bases, lanes, nblk, n2p


def fold_loop(slabs, bases, n1, n2, G, dxmax, margin, R, lanes, nblk, n2p):
    Bb = slabs.shape[0]
    rho0 = jnp.zeros((Bb, n2p + 2 * margin + G, lanes), slabs.dtype)

    def place(k, acc):
        b = k // nblk
        j = k - b * nblk
        off = j * R + bases[b, j] + margin
        cur = jax.lax.dynamic_slice(acc, (b, off, 0), (1, R + G, lanes))
        return jax.lax.dynamic_update_slice(
            acc, cur + jax.lax.dynamic_slice(
                slabs, (b, j, 0, 0), (1, 1, R + G, lanes))[0],
            (b, off, 0))

    rho = jax.lax.fori_loop(0, Bb * nblk, place, rho0)
    return rho[:, margin:margin + n2, dxmax:dxmax + n1]


def fold_rowscat(slabs, bases, n1, n2, G, dxmax, margin, R, lanes, nblk,
                 n2p):
    """One scatter-add of every slab row at its computed global row."""
    Bb, _, S0, _ = slabs.shape
    t = jnp.arange(S0, dtype=jnp.int32)
    j = jnp.arange(nblk, dtype=jnp.int32)
    rows = (j[None, :, None] * R + bases[:, :, None].astype(jnp.int32)
            + margin + t[None, None, :])                # (B, nblk, S0)
    rho0 = jnp.zeros((Bb, n2p + 2 * margin + G, lanes), slabs.dtype)
    bidx = jnp.broadcast_to(jnp.arange(Bb)[:, None, None], rows.shape)
    rho = rho0.at[bidx, rows].add(slabs)
    return rho[:, margin:margin + n2, dxmax:dxmax + n1]


def fold_jloop(slabs, bases, n1, n2, G, dxmax, margin, R, lanes, nblk,
               n2p):
    """fori over block columns; per step one scatter-add of that
    column's (B, R+G) rows across all shots."""
    Bb, _, S0, _ = slabs.shape
    t = jnp.arange(S0, dtype=jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(Bb)[:, None], (Bb, S0))
    rho0 = jnp.zeros((Bb, n2p + 2 * margin + G, lanes), slabs.dtype)

    def place(j, acc):
        rows = j * R + bases[:, j, None].astype(jnp.int32) + margin \
            + t[None, :]                                  # (B, S0)
        return acc.at[bidx, rows].add(
            jax.lax.dynamic_slice(
                slabs, (0, j, 0, 0), (Bb, 1, S0, lanes))[:, 0])

    rho = jax.lax.fori_loop(0, nblk, place, rho0)
    return rho[:, margin:margin + n2, dxmax:dxmax + n1]


FOLDS = {"loop": fold_loop, "rowscat": fold_rowscat, "jloop": fold_jloop}


def main():
    from profile_w2_components import run_to_iter, Args, SMARMN, setup
    from devito_fwi_tpu.fwi import fm_multi
    from devito_fwi_tpu.misfit.w2 import transform_jax

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
    print(f"live gathers: B={Bb} n2={n2} n1={n1}")
    phi, dual, rho, sigma, mun, nun, xs, ys = jax.block_until_ready(
        run_to_iter(mu, nu, 5))
    print("captured live carry at iter 5")

    G, dxmax, R = 24, 7, 16
    margin = 127 + 1

    @jax.jit
    def subs_of(pot):
        xm, ym = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(pot)
        out = jax.vmap(lambda m, x, y: B._pushforward_subsamples(
            m, x, y, n1, n2, 2))(nun, xm, ym)
        return out[:7]

    subs = jax.block_until_ready(subs_of(phi))

    # reference result for parity (kept on device; errors fetched as
    # scalars — np.asarray of large outputs costs minutes on the tunnel)
    ref = jax.jit(partial(
        B._pallas_push, n1=n1, n2=n2, G=G, dxmax=dxmax, margin=margin,
        R=R))(subs)

    @jax.jit
    def maxrel(a, b):
        return jnp.abs(a - b).max() / jnp.maximum(jnp.abs(b).max(), 1e-30)

    # prep+kernel lower bound
    @jax.jit
    def kernel_only(s):
        slabs, bases, *_ = _slabs(s, n1, n2, G, dxmax, margin, R)
        return jnp.sum(slabs) + jnp.sum(bases)
    t, _ = best_of(lambda: kernel_only(subs), 4)
    print(f"prep+kernel only:   {t*1e3:7.1f} ms")

    for name, fold in FOLDS.items():
        @partial(jax.jit, static_argnames=())
        def full(s, _fold=fold):
            slabs, bases, lanes, nblk, n2p = _slabs(s, n1, n2, G, dxmax,
                                                    margin, R)
            return _fold(slabs, bases, n1, n2, G, dxmax, margin, R,
                         lanes, nblk, n2p)
        err = sync(maxrel(full(subs), ref))
        t, _ = best_of(lambda f=full: jnp.sum(f(subs)), 4)
        print(f"fold[{name:8s}]:     {t*1e3:7.1f} ms   max-rel vs "
              f"production {err:.2e}")


if __name__ == "__main__":
    main()
